"""Run the reference's OWN trainer/eval pipeline end-to-end as a parity oracle.

Module-level parity (core/reference_oracle.py) transplants random weights into
individual reference modules; what it cannot see is the *composition* seam —
dataset -> collator -> DataLoader -> ProtNoteTrainer.evaluate -> metric dict
(batching, padding, masking, thresholding, metric aggregation).  This module
drives the reference's real pipeline on a shared tiny synthetic dataset:

  reference side:  protnote.data.datasets.ProteinDataset
                   (datasets.py:19-507) + create_multiple_loaders
                   (datasets.py:572-661) + collate_variable_sequence_length
                   (collators.py:5-155) + ProtNoteTrainer.evaluate
                   (ProtNoteTrainer.py:449-673)
  our side:        the same FASTA + label-embedding cache through
                   protnote_tpu.cli.main (the real user entry point), loading
                   the SAME weights from a reference-layout .pt checkpoint

and asserts the final metric dicts (loss, mAP micro/macro, F1 micro/macro)
and the decision-threshold sweep agree.

Scalar-metric backends: the reference computes exact mAP with torcheval's
``BinaryAUPRC``/``MultilabelAUPRC`` (ProtNoteTrainer.py:477-489), which is not
installed here.  The stubs below implement them with *scikit-learn*
``average_precision_score`` — a third-party implementation independent of
both this repo's metrics and the reference — so the chain tested is
``ours == reference-loop-composition ∘ sklearn-AP``.  F1 and loss aggregation
use the reference's own code (``calculate_tp_fn_fp``/``calculate_f1``/
``calculate_f1_micro``, ProtNoteTrainer.py:41-84) unmodified.

The reference's ``find_optimal_threshold`` (ProtNoteTrainer.py:378-433)
crashes as written (``all_probabilities`` is used without ever being
assigned, :399-411 — a real reference bug noted in SURVEY.md §7), so the
sweep oracle here repairs ONLY the accumulation (appending each batch's
probabilities/labels, exactly what the surrounding code implies) and keeps
the reference's grid ``np.arange(0.1, 1, 0.01)`` and its F1-micro objective.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import types
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from protnote_tpu.core.reference_oracle import (
    DEFAULT_REFERENCE_ROOT,
    install_reference_stubs,
    randomize_bn_running_stats,
)

# ----------------------------------------------------------------------
# functional stubs (superset of reference_oracle's inert ones)


def _install_functional_bio() -> None:
    """Give ``Bio.SeqIO.parse`` a real FASTA implementation so the
    reference's ``read_fasta`` (utils/data.py:81-96) works."""

    class _Rec:
        __slots__ = ("id", "description", "seq")

        def __init__(self, description: str, seq: str):
            self.description = description
            self.id = description.split(" ")[0]
            self.seq = seq

    def parse(path, fmt):
        assert fmt == "fasta", fmt
        header, chunks = None, []
        with open(path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if header is not None:
                        yield _Rec(header, "".join(chunks))
                    header, chunks = line[1:], []
                elif line:
                    chunks.append(line.strip())
        if header is not None:
            yield _Rec(header, "".join(chunks))

    sys.modules["Bio.SeqIO"].parse = parse


def _install_functional_blosum() -> None:
    """``blosum.BLOSUM(62)`` backed by this repo's real BLOSUM62 table
    (data/blosum.py), matching the blosum package's dict-of-dicts surface
    used at datasets.py:68-76."""
    from protnote_tpu.data.blosum import BLOSUM62

    class _Blosum(dict):
        def __init__(self, n):
            assert n == 62, n
            super().__init__({a: dict(row) for a, row in BLOSUM62.items()})

    sys.modules["blosum"].BLOSUM = _Blosum


def _install_torchmetrics_stub() -> None:
    """Minimal torchmetrics surface: enough to *import* the reference's
    evaluation.py / ProtNoteTrainer.py.  The pipeline oracle passes a
    duck-typed no-op collection to ``evaluate`` (the metric dict under test
    is the one the reference composes ITSELF from tp/fn/fp + AUPRC)."""
    if "torchmetrics" in sys.modules:
        return
    import torch

    class Metric(torch.nn.Module):
        """Subclassable stand-in mirroring the update/compute protocol."""

        def __init__(self, **kw):
            super().__init__()

        def forward(self, *a, **kw):
            return self.update(*a, **kw)

        def update(self, *a, **kw):  # pragma: no cover - inert
            raise NotImplementedError

        def compute(self):  # pragma: no cover - inert
            raise NotImplementedError

        def reset(self):
            pass

    class MetricCollection(dict):
        def __init__(self, metrics=None, **kw):
            super().__init__(metrics or {})

        def copy(self):
            return MetricCollection(dict(self))

    def _inert(*a, **kw):
        raise RuntimeError("torchmetrics stub metric instantiated in "
                           "pipeline parity — unexpected code path")

    tm = types.ModuleType("torchmetrics")
    tm.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]).ModuleSpec(
        "torchmetrics", None)
    tm.Metric = Metric
    tm.MetricCollection = MetricCollection
    cls = types.ModuleType("torchmetrics.classification")
    for name in ("Precision", "Recall", "BinaryPrecision", "BinaryRecall",
                 "F1Score", "AveragePrecision", "BinaryF1Score"):
        setattr(cls, name, _inert)
    # SamplewisePrecision et al. subclass Metric and build BinaryPrecision
    # lazily in __init__ — never instantiated by the pipeline oracle.
    cls.BinaryPrecision = _inert
    tm.classification = cls
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.classification"] = cls


def _install_torcheval_stub() -> None:
    """torcheval.metrics backed by sklearn.average_precision_score.

    The reference's exact-mAP path (ESTIMATE_MAP False,
    ProtNoteTrainer.py:477-480) uses BinaryAUPRC (micro: flattened) and
    MultilabelAUPRC (macro: mean over labels).  sklearn's
    ``average_precision_score`` computes the same sum_n (R_n - R_{n-1}) P_n
    estimator, giving an independent third-party oracle.
    """
    if "torcheval" in sys.modules:
        return
    import torch

    class BinaryAUPRC:
        def __init__(self, device="cpu", **kw):
            self._inputs, self._targets = [], []

        def update(self, inp, tgt):
            self._inputs.append(inp.detach().cpu().reshape(-1))
            self._targets.append(tgt.detach().cpu().reshape(-1))
            return self

        def compute(self):
            from sklearn.metrics import average_precision_score

            y = torch.cat(self._targets).numpy()
            p = torch.cat(self._inputs).numpy()
            return float(average_precision_score(y, p))

    class MultilabelAUPRC:
        def __init__(self, device="cpu", num_labels=None, **kw):
            self.num_labels = num_labels
            self._inputs, self._targets = [], []

        def update(self, inp, tgt):
            self._inputs.append(inp.detach().cpu())
            self._targets.append(tgt.detach().cpu())
            return self

        def compute(self):
            from sklearn.metrics import average_precision_score

            y = torch.cat(self._targets).numpy()
            p = torch.cat(self._inputs).numpy()
            per_label = [
                average_precision_score(y[:, j], p[:, j])
                for j in range(y.shape[1])
            ]
            return float(np.mean(per_label))

    class Mean:
        def __init__(self, device="cpu", **kw):
            self._sum, self._n = 0.0, 0

        def update(self, v):
            v = v.detach().cpu()
            self._sum += float(v.sum())
            self._n += int(v.numel())
            return self

        def compute(self):
            return self._sum / max(self._n, 1)

    def _unexpected(*a, **kw):
        raise RuntimeError("binned AUPRC stub used — pipeline parity runs "
                           "with ESTIMATE_MAP False (exact path)")

    te = types.ModuleType("torcheval")
    te.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]).ModuleSpec(
        "torcheval", None)
    metrics = types.ModuleType("torcheval.metrics")
    metrics.BinaryAUPRC = BinaryAUPRC
    metrics.MultilabelAUPRC = MultilabelAUPRC
    metrics.BinaryBinnedAUPRC = _unexpected
    metrics.MultilabelBinnedAUPRC = _unexpected
    metrics.Mean = Mean
    metrics.BinaryF1Score = _unexpected
    toolkit = types.ModuleType("torcheval.metrics.toolkit")
    toolkit.sync_and_compute = lambda m: (m.compute() if m is not None else None)
    te.metrics = metrics
    metrics.toolkit = toolkit
    sys.modules["torcheval"] = te
    sys.modules["torcheval.metrics"] = metrics
    sys.modules["torcheval.metrics.toolkit"] = toolkit


def _install_wandb_stub() -> None:
    if "wandb" in sys.modules:
        return
    wb = types.ModuleType("wandb")
    wb.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]).ModuleSpec(
        "wandb", None)
    wb.log = wb.save = wb.init = lambda *a, **k: None
    sys.modules["wandb"] = wb


def install_pipeline_stubs(reference_root: str = DEFAULT_REFERENCE_ROOT) -> None:
    install_reference_stubs(reference_root)
    _install_functional_bio()
    _install_functional_blosum()
    _install_torchmetrics_stub()
    _install_torcheval_stub()
    _install_wandb_stub()


# ----------------------------------------------------------------------
# shared synthetic case

AAS = "ACDEFGHIKLMNPQRSTVWY"


def build_shared_case(root: Path, n_seqs: int = 16, n_labels: int = 12,
                      emb_dim: int = 32, seed: int = 0) -> Dict:
    """Tiny synthetic dataset in BOTH container formats.

    One FASTA (every amino acid and every label represented, so vocabularies
    and the represented mask are full on both sides), one random label-
    embedding matrix with 'name' and 'label' description rows per GO id,
    saved as the reference's .pt tensor + .pt pandas index
    (bin/generate_label_embeddings.py:163-164) AND as our .npz cache.
    """
    import pandas as pd
    import torch

    from protnote_tpu.data.fasta import save_to_fasta
    from protnote_tpu.data.label_cache import LabelEmbeddingCache

    root = Path(root)
    # reference index-path derivation splits on the FIRST '.' in the whole
    # path (datasets.py:115-119) — keep the tree dot-free above the filename
    data_dir = root / "data"
    split_dir = data_dir / "swissprot" / "proteinfer_splits" / "random"
    emb_dir = data_dir / "embeddings"
    vocab_dir = data_dir / "vocabularies"
    for d in (split_dir, emb_dir, vocab_dir, root / "outputs"):
        d.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    labels_all = [f"GO:{i:07d}" for i in range(n_labels)]
    recs = []
    for i in range(n_seqs):
        ln = int(rng.integers(30, 90))
        seq = "".join(np.array(list(AAS))[rng.integers(0, 20, ln)])
        if i == 0:
            seq = AAS + seq  # all 20 residues appear -> 20-ch one-hot
        # labels: guarantee every label appears at least once across seqs
        labs = {labels_all[i % n_labels]}
        labs.update(rng.choice(labels_all, size=int(rng.integers(1, 4)),
                               replace=False).tolist())
        recs.append((seq, f"S{i:03d}", sorted(labs)))
    fasta = split_dir / "test_GO.fasta"
    save_to_fasta(recs, str(fasta))

    # two description rows (name, label) per GO id, contiguous per id
    ids, dtypes, texts = [], [], []
    for g in labels_all:
        for dt in ("name", "label"):
            ids.append(g)
            dtypes.append(dt)
            texts.append(f"{dt} description of {g}")
    emb = rng.normal(size=(len(ids), emb_dim)).astype(np.float32)
    token_counts = rng.integers(4, 12, len(ids)).astype(np.int64)

    # reference container: <base>_{NICK}_{pooling}.pt + _index.pt
    ref_emb_path = emb_dir / "frozen_label_embeddings_E5multilingual_mean.pt"
    ref_idx_path = emb_dir / "frozen_label_embeddings_E5multilingual_mean_index.pt"
    torch.save(torch.from_numpy(emb), str(ref_emb_path))
    torch.save(
        pd.DataFrame({"id": ids, "description_type": dtypes,
                      "description": texts, "token_count": token_counts}),
        str(ref_idx_path),
    )

    # our container (same derived filename, .npz)
    LabelEmbeddingCache.save(
        str(emb_dir / "frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dtypes, texts, token_counts.astype(np.int32),
    )

    parenthood = vocab_dir / "parenthood_jul_2024.json"
    parenthood.write_text(json.dumps({}))

    return {
        "root": root,
        "data_dir": data_dir,
        "fasta": fasta,
        "ref_emb_path": ref_emb_path,
        "labels_all": labels_all,
        "n_seqs": n_seqs,
        "emb_dim": emb_dim,
        "parenthood": parenthood,
    }


# tiny-but-nontrivial model dims shared by both sides
TINY = dict(
    enc_channels=48, enc_kernel=5, enc_blocks=2,
    latent_dim=16, proj_layers=2, proj_scale=2, mlp_layers=2, mlp_scale=2,
)

SWEEP_GRID = np.arange(0.1, 1, 0.01)  # the reference's grid (:431)


import contextlib


@contextlib.contextmanager
def _legacy_torch_load():
    """The reference predates torch 2.6's ``weights_only=True`` default; its
    ``torch.load`` of the pandas label-embedding index (datasets.py:120)
    fails under the new default.  Scope-patch the default back for the
    reference call only (the artifacts are our own freshly-written files)."""
    import torch

    orig = torch.load

    def load(*a, **kw):
        kw.setdefault("weights_only", False)
        return orig(*a, **kw)

    torch.load = load
    try:
        yield
    finally:
        torch.load = orig


def _ensure_gloo_world1() -> None:
    import torch.distributed as dist

    if not dist.is_initialized():
        os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
        os.environ.setdefault("MASTER_PORT", "29517")
        dist.init_process_group("gloo", rank=0, world_size=1)


def _make_tiny_reference_model(case: Dict, k_desc: int, seed: int):
    """The shared tiny ProtNote (reference's own modules) used by both the
    eval- and train-loop parity oracles; ``k_desc`` is
    inference_descriptions_per_label (ProtNote.py ensembling)."""
    import torch

    from protnote.models.ProtNote import ProtNote
    from protnote.models.protein_encoders import ProteInfer

    torch.manual_seed(seed)
    sequence_encoder = ProteInfer(
        num_labels=17, input_channels=20,
        output_channels=TINY["enc_channels"], kernel_size=TINY["enc_kernel"],
        activation=torch.nn.ReLU, dilation_base=3,
        num_resnet_blocks=TINY["enc_blocks"], bottleneck_factor=0.5,
    )
    model = ProtNote(
        protein_embedding_dim=TINY["enc_channels"],
        label_embedding_dim=case["emb_dim"],
        latent_dim=TINY["latent_dim"],
        label_embedding_pooling_method="mean",
        sequence_embedding_dropout=0.0,
        label_embedding_dropout=0.0,
        label_embedding_noising_alpha=0.0,
        label_encoder=torch.nn.Linear(4, 4),  # frozen, unused w/ cached emb
        sequence_encoder=sequence_encoder,
        inference_descriptions_per_label=k_desc,
        output_mlp_hidden_dim_scale_factor=TINY["mlp_scale"],
        output_mlp_num_layers=TINY["mlp_layers"],
        output_neuron_bias=None,
        outout_mlp_add_batchnorm=True,
        residual_connection=False,
        projection_head_num_layers=TINY["proj_layers"],
        dropout=0.0,
        projection_head_hidden_dim_scale_factor=TINY["proj_scale"],
        label_encoder_num_trainable_layers=0,
        train_sequence_encoder=False,
        feature_fusion="concatenation",
    )
    randomize_bn_running_stats(model, seed + 1)
    return model


class _NoopCollection:
    """Duck-typed eval_metrics: the reference only needs reset/__call__/
    compute (ProtNoteTrainer.py:475,529,655); the metrics under test are the
    ones ``evaluate`` composes itself."""

    def reset(self):
        pass

    def __call__(self, probas, labels):
        return {}

    def compute(self):
        return {}


def run_reference_pipeline(case: Dict, decision_th: float = 0.5,
                           inference_descriptions: str = "name",
                           batch_size: int = 8, seed: int = 7,
                           reference_root: str = DEFAULT_REFERENCE_ROOT) -> Dict:
    """Build the reference dataset/loader/model/trainer and run its
    ``evaluate`` + (repaired) threshold sweep.  Returns the metric dict, the
    sweep result, and the path of a reference-layout .pt checkpoint holding
    the exact weights used."""
    import torch
    import yaml

    install_pipeline_stubs(reference_root)
    _ensure_gloo_world1()

    from protnote.data.datasets import ProteinDataset, create_multiple_loaders
    from protnote.models import ProtNoteTrainer as trainer_mod
    from protnote.utils.losses import FocalLoss

    with open(Path(reference_root) / "configs" / "base_config.yaml") as fh:
        config = yaml.safe_load(fh)
    params = config["params"]
    params.update(
        TEST_SUBSET_FRACTION=1.0,
        INFERENCE_GO_DESCRIPTIONS=inference_descriptions,
        EXTRACT_VOCABULARIES_FROM=None,
        DEDUPLICATE=True,
        MAX_SEQUENCE_LENGTH=None,
        TEST_BATCH_SIZE=batch_size,
        ESTIMATE_MAP=False,
        DECISION_TH=decision_th,
        DISTRIBUTE_LABELS=False,
        NORMALIZE_PROBABILITIES=False,
        # tiny fusion dims (encoder dims ride embed_sequences_params)
        PROTEIN_EMBEDDING_DIM=TINY["enc_channels"],
        LABEL_EMBEDDING_DIM=case["emb_dim"],
        LATENT_EMBEDDING_DIM=TINY["latent_dim"],
        PROJECTION_HEAD_NUM_LAYERS=TINY["proj_layers"],
        PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR=TINY["proj_scale"],
        OUTPUT_MLP_NUM_LAYERS=TINY["mlp_layers"],
        OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR=TINY["mlp_scale"],
        LABEL_ENCODER_NUM_TRAINABLE_LAYERS=0,
        TRAIN_SEQUENCE_ENCODER=False,
        TRAIN_PROJECTION_HEAD=True,
        LORA=False,
    )
    config["paths"] = {
        "PARENTHOOD_LIB_PATH": str(case["parenthood"]),
        "OUTPUT_MODEL_DIR": str(case["root"] / "outputs" / "ref_ckpt"),
        "RESULTS_DIR": str(case["root"] / "outputs" / "ref_results"),
    }
    config["LABEL_EMBEDDING_PATH"] = str(case["ref_emb_path"])

    logger = logging.getLogger("reference_pipeline_oracle")
    logger.addHandler(logging.NullHandler())

    with _legacy_torch_load():
        ds = ProteinDataset(
            data_paths={"data_path": str(case["fasta"]), "dataset_type": "test"},
            config=config, logger=logger,
        )
    loaders = create_multiple_loaders(
        {"test": [ds]}, params, num_workers=0, pin_memory=False,
    )
    test_loader = loaders["test"][0]

    model = _make_tiny_reference_model(
        case, k_desc=len(inference_descriptions.split("+")), seed=seed)

    # De-degenerate the decision surface: random-init logits sit wholly on
    # one side of DECISION_TH (F1 comparisons would be the vacuous
    # 0.0 == 0.0) — center the output neuron's bias on the median logit of
    # one batch so predictions straddle the threshold and the F1/confusion
    # composition is actually exercised.
    model.eval()
    with torch.no_grad():
        b0 = next(iter(test_loader))
        lg0, _ = model(sequence_onehots=b0["sequence_onehots"],
                       sequence_lengths=b0["sequence_lengths"],
                       label_embeddings=b0["label_embeddings"])
        out_linear = [m for m in model.output_layer.modules()
                      if isinstance(m, torch.nn.Linear)][-1]
        out_linear.bias -= lg0.median()

    ckpt_path = case["root"] / "outputs" / "shared_reference_checkpoint.pt"
    torch.save({"model_state_dict": model.state_dict(), "epoch": 1,
                "best_val_metric": 0.0}, str(ckpt_path))

    trainer = trainer_mod.ProtNoteTrainer(
        model=model, device="cpu", rank=0, config=config, logger=logger,
        timestamp="ts", run_name="pipeline_parity",
        loss_fn=FocalLoss(gamma=params["FOCAL_LOSS_GAMMA"],
                          alpha=params["FOCAL_LOSS_ALPHA"]),
        use_wandb=False, is_master=True,
    )

    metrics = trainer.evaluate(
        data_loader=test_loader, eval_metrics=_NoopCollection(),
        data_loader_name="test",
    )

    # ---- repaired reference threshold sweep (see module docstring) ----
    model.eval()
    all_probs, all_labels = [], []
    with torch.no_grad():
        for batch in test_loader:
            _, logits, multihots, _, _ = trainer.evaluation_step(batch=batch)
            all_probs.append(torch.sigmoid(logits))
            all_labels.append(multihots)
    probs = torch.cat(all_probs)
    labels = torch.cat(all_labels)
    # objective = f1_macro, the reference default DECISION_TH_METRIC_NAME
    # (base_config.yaml:48), via the reference's own calculate_f1
    best_th, best_score = 0.0, 0.0
    for th in SWEEP_GRID:
        tp, fn, fp = trainer_mod.calculate_tp_fn_fp(probs, labels, threshold=th)
        score = float(trainer_mod.calculate_f1(tp, fn, fp).mean())
        if score > best_score:
            best_score, best_th = score, float(th)

    return {
        "metrics": {k: float(v) for k, v in metrics.items()},
        "sweep": {"threshold": best_th, "score": best_score},
        "checkpoint": str(ckpt_path),
        "num_batches": len(test_loader),
    }


def run_our_pipeline(case: Dict, checkpoint: str, decision_th: float = 0.5,
                     inference_descriptions: str = "name",
                     batch_size: int = 8) -> Dict:
    """Score the same case through OUR cli.main entry point (metric dict) and
    our Trainer threshold sweep on the reference grid."""
    import yaml

    import protnote_tpu.cli.main as cli
    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH

    # tiny-dims config on disk — the real user path, no monkeypatching
    with open(DEFAULT_CONFIG_PATH) as fh:
        cfg = yaml.safe_load(fh)
    cfg["params"].update(
        TEST_BATCH_SIZE=batch_size,
        INFERENCE_GO_DESCRIPTIONS=inference_descriptions,
        EXTRACT_VOCABULARIES_FROM=None,
        DECISION_TH=decision_th,
        MIXED_PRECISION=False,
        ESTIMATE_MAP=False,
        PROTEIN_EMBEDDING_DIM=TINY["enc_channels"],
        LABEL_EMBEDDING_DIM=case["emb_dim"],
        LATENT_EMBEDDING_DIM=TINY["latent_dim"],
        PROJECTION_HEAD_NUM_LAYERS=TINY["proj_layers"],
        PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR=TINY["proj_scale"],
        OUTPUT_MLP_NUM_LAYERS=TINY["mlp_layers"],
        OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR=TINY["mlp_scale"],
        SEQUENCE_BUCKETS=[128],
    )
    cfg["embed_sequences_params"].update(
        OUTPUT_CHANNELS=TINY["enc_channels"], KERNEL_SIZE=TINY["enc_kernel"],
        NUM_RESNET_BLOCKS=TINY["enc_blocks"], PROTEINFER_NUM_GO_LABELS=17,
    )
    cfg_path = case["root"] / "our_config.yaml"
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    old_env = dict(os.environ)
    os.environ["PROTNOTE_DATA_DIR"] = str(case["data_dir"])
    os.environ["PROTNOTE_OUTPUT_DIR"] = str(case["root"] / "outputs")
    try:
        args = cli.build_argparser().parse_args([
            "--test-paths-names", "TEST_DATA_PATH",
            "--config", str(cfg_path),
            "--name", "pipeline_parity",
            "--model-file", str(checkpoint),
        ])
        all_metrics = cli.run(args)
        ours = dict(all_metrics["test"])

        # threshold sweep on the reference grid through our Trainer
        sweep = _our_sweep(case, checkpoint, cfg_path, inference_descriptions,
                           batch_size)
    finally:
        os.environ.clear()
        os.environ.update(old_env)
    return {"metrics": ours, "sweep": sweep}


def _our_sweep(case, checkpoint, cfg_path, inference_descriptions, batch_size):
    import jax

    from protnote_tpu.cli._model_setup import build_inference_model
    from protnote_tpu.core.config import get_setup
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.train.losses import get_loss_fn

    config, run_name, log = get_setup(
        config_path=str(cfg_path), run_name="parity_sweep",
        test_paths_names=["TEST_DATA_PATH"],
    )
    params = config["params"]
    cache = LabelEmbeddingCache.load(
        config["LABEL_EMBEDDING_PATH"], config["LABEL_EMBEDDING_INDEX_PATH"]
    )
    ds = ProteinDataset(
        str(case["fasta"]),
        DatasetConfig(
            dataset_type="test",
            inference_go_descriptions=tuple(inference_descriptions.split("+")),
            inference_descriptions_per_label=len(inference_descriptions.split("+")),
        ),
        label_embedding_cache=cache,
    )
    pi_cfg, pn_cfg, trainer = build_inference_model(
        config, params, config["paths_resolved"], cache, run_name,
        model_file=None, mesh=None, log=log,
    )
    # reference-layout .pt: same ingestion as cli/main.py:310-327
    from protnote_tpu.models.convert import load_reference_checkpoint

    p2, s2, enc, _meta = load_reference_checkpoint(str(checkpoint), pn_cfg, pi_cfg)
    trainer.ts["trainable"]["protnote"] = p2
    trainer.ts["model_state"] = s2
    if enc is not None:
        trainer.ts["enc_params"], trainer.ts["enc_state"] = enc
    trainer.loss_fn = get_loss_fn(params)
    k = len(inference_descriptions.split("+"))
    batcher = BucketBatcher(ds, batch_size,
                            buckets=tuple(params["SEQUENCE_BUCKETS"]),
                            descriptions_per_label=k,
                            return_label_multihots=True)
    th, score = trainer.find_optimal_threshold(batcher, thresholds=SWEEP_GRID)
    return {"threshold": float(th), "score": float(score)}


# ----------------------------------------------------------------------
# multi-step TRAINING-loop parity
#
# The eval oracle above cannot see the training seam: optimizer semantics
# (torch.optim.Adam vs optax.adam), clip_grad_norm_ on the ACCUMULATED
# gradient, GradScaler plumbing, loss normalization by
# GRADIENT_ACCUMULATION_STEPS (ProtNoteTrainer.py:732-755), per-epoch
# sampler reshuffling, and multi-step BatchNorm running-stat evolution in
# BOTH towers (model.train() covers the frozen encoder too, :671).  These
# functions drive the reference's own ``train_one_epoch`` for E epochs and
# our ``Trainer.train`` on the IDENTICAL batch membership order, then
# compare per-epoch train metrics and the FINAL weights (params + BN
# running statistics of fusion and encoder).


def run_reference_train(case: Dict, epochs: int = 3, batch_size: int = 2,
                        accum: int = 2, clip: float = 1.0, lr: float = 3e-3,
                        optimizer: str = "SGD",
                        decision_th: float = 0.5, seed: int = 7,
                        resume_at: Optional[int] = None,
                        reference_root: str = DEFAULT_REFERENCE_ROOT) -> Dict:
    """Run the reference's train loop (ProtNoteTrainer.train_one_epoch,
    ProtNoteTrainer.py:675-825) for ``epochs`` epochs on the shared case.

    ``resume_at=k`` exercises the reference's own mid-run checkpoint-resume
    machinery: after epoch ``k-1`` the model+optimizer are saved through
    ``save_checkpoint`` (utils/models.py:304-321), a FRESH differently-seeded
    model+trainer are built, and ``load_model(..., from_checkpoint=True)``
    (utils/models.py:324-374, restoring optimizer state and epoch counter)
    continues epochs ``k..epochs-1`` — the semantics our Trainer.load must
    reproduce for long-horizon runs.

    Returns per-epoch train metric dicts, the init/final reference-layout
    checkpoints, and the captured per-epoch batch membership (sequence ids
    in loader order) so our side can replay the identical schedule."""
    import torch
    import yaml

    install_pipeline_stubs(reference_root)
    _ensure_gloo_world1()

    from protnote.data.datasets import ProteinDataset, create_multiple_loaders
    from protnote.models import ProtNoteTrainer as trainer_mod
    from protnote.utils.losses import FocalLoss

    with open(Path(reference_root) / "configs" / "base_config.yaml") as fh:
        config = yaml.safe_load(fh)
    params = config["params"]
    params.update(
        TRAIN_SUBSET_FRACTION=1.0,
        TRAIN_BATCH_SIZE=batch_size,
        GRADIENT_ACCUMULATION_STEPS=accum,
        CLIP_VALUE=clip,
        LEARNING_RATE=lr,
        OPTIMIZER=optimizer,
        WEIGHT_DECAY=0.0,
        NUM_EPOCHS=epochs,
        WEIGHTED_SAMPLING=False,
        DISTRIBUTE_LABELS=False,
        AUGMENT_RESIDUE_PROBABILITY=0.0,
        # single description type -> the deterministic sorted-embedding path
        # (datasets.py:383-397); >1 would np.random-sample rows per example
        LABEL_AUGMENTATION_DESCRIPTIONS="name",
        EXTRACT_VOCABULARIES_FROM=None,
        DEDUPLICATE=True,
        MAX_SEQUENCE_LENGTH=None,
        DECISION_TH=decision_th,
        NORMALIZE_PROBABILITIES=False,
        ESTIMATE_MAP=False,
        # tiny fusion dims (encoder dims ride embed_sequences_params)
        PROTEIN_EMBEDDING_DIM=TINY["enc_channels"],
        LABEL_EMBEDDING_DIM=case["emb_dim"],
        LATENT_EMBEDDING_DIM=TINY["latent_dim"],
        PROJECTION_HEAD_NUM_LAYERS=TINY["proj_layers"],
        PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR=TINY["proj_scale"],
        OUTPUT_MLP_NUM_LAYERS=TINY["mlp_layers"],
        OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR=TINY["mlp_scale"],
        LABEL_ENCODER_NUM_TRAINABLE_LAYERS=0,
        TRAIN_SEQUENCE_ENCODER=False,
        TRAIN_PROJECTION_HEAD=True,
        LORA=False,
    )
    config["paths"] = {
        "PARENTHOOD_LIB_PATH": str(case["parenthood"]),
        "OUTPUT_MODEL_DIR": str(case["root"] / "outputs" / "ref_train_ckpt"),
        "RESULTS_DIR": str(case["root"] / "outputs" / "ref_train_results"),
    }
    config["LABEL_EMBEDDING_PATH"] = str(case["ref_emb_path"])

    logger = logging.getLogger("reference_train_oracle")
    logger.addHandler(logging.NullHandler())

    with _legacy_torch_load():
        ds = ProteinDataset(
            data_paths={"data_path": str(case["fasta"]),
                        "dataset_type": "train"},
            config=config, logger=logger,
        )
    loaders = create_multiple_loaders(
        {"train": [ds]}, params, num_workers=0, pin_memory=False,
    )
    train_loader = loaders["train"][0]

    model = _make_tiny_reference_model(case, k_desc=1, seed=seed)

    # Capture batch membership per epoch BEFORE training.  With residue
    # augmentation off and a single description type, the dataset is pure,
    # so pre-iteration has no side effects, and the DistributedSampler
    # permutation is a deterministic function of set_epoch
    # (samplers.py:40-63 / torch DistributedSampler semantics).
    model.eval()
    orders = []
    for epoch in range(epochs):
        if hasattr(train_loader.sampler, "set_epoch"):
            train_loader.sampler.set_epoch(epoch)
        ids = []
        for batch in train_loader:
            ids.extend(list(batch["sequence_ids"]))
        orders.append(ids)

    # De-degenerate the decision surface (same trick as the eval oracle):
    # center the output bias on the first train batch's median logit so the
    # train-time F1/confusion composition is actually exercised.
    with torch.no_grad():
        if hasattr(train_loader.sampler, "set_epoch"):
            train_loader.sampler.set_epoch(0)
        b0 = next(iter(train_loader))
        lg0, _ = model(sequence_onehots=b0["sequence_onehots"],
                       sequence_lengths=b0["sequence_lengths"],
                       label_embeddings=b0["label_embeddings"])
        out_linear = [m for m in model.output_layer.modules()
                      if isinstance(m, torch.nn.Linear)][-1]
        out_linear.bias -= lg0.median()

    init_ckpt = case["root"] / "outputs" / "shared_train_init.pt"
    torch.save({"model_state_dict": model.state_dict(), "epoch": 0,
                "best_val_metric": 0.0}, str(init_ckpt))

    def make_trainer(m):
        t = trainer_mod.ProtNoteTrainer(
            model=m, device="cpu", rank=0, config=config, logger=logger,
            timestamp="ts", run_name="train_parity",
            loss_fn=FocalLoss(gamma=params["FOCAL_LOSS_GAMMA"],
                              alpha=params["FOCAL_LOSS_ALPHA"]),
            use_wandb=False, is_master=True,
        )
        # pure logging side effect that requires NVML + torch.cuda on this
        # CPU host (utils/data.py:50-68) — not part of the semantics tested
        trainer_mod.log_gpu_memory_usage = lambda *a, **k: None
        return t

    trainer = make_trainer(model)

    model.train()
    trainer.training_step = 0
    per_epoch = []
    for epoch in range(epochs):
        if resume_at is not None and epoch == resume_at:
            # mid-run resume through the reference's OWN save/load path
            from protnote.utils import models as ref_models_mod
            from protnote.utils.models import load_model, save_checkpoint

            # pure debug print inside load_model (utils/models.py:290-301)
            # crashes on SGD checkpoints: torch SGD without momentum has an
            # EMPTY optimizer state dict and print_checkpoint max()es its
            # keys — a latent reference bug (they only ever resume Adam);
            # not part of the semantics under test
            ref_models_mod.print_checkpoint = lambda *a, **k: None

            mid_ckpt = case["root"] / "outputs" / "shared_train_mid.pt"
            save_checkpoint(model=trainer._get_model(),
                            optimizer=trainer.optimizer, epoch=epoch,
                            best_val_metric=0.0, model_path=str(mid_ckpt))
            # fresh DIFFERENTLY-seeded model: the restore must overwrite it
            model = _make_tiny_reference_model(case, k_desc=1, seed=seed + 1)
            trainer = make_trainer(model)
            with _legacy_torch_load():
                load_model(trainer, str(mid_ckpt), rank=0,
                           from_checkpoint=True)
            assert trainer.starting_epoch == epoch, trainer.starting_epoch
            model.train()
            trainer.training_step = epoch * len(train_loader)
        trainer.epoch = epoch
        # exactly what the reference's train() does per epoch (:866-868)
        if hasattr(train_loader.sampler, "set_epoch"):
            train_loader.sampler.set_epoch(epoch)
        m = trainer.train_one_epoch(train_loader=train_loader,
                                    eval_metrics=_NoopCollection())
        per_epoch.append({k: float(v) for k, v in m.items()})

    final_ckpt = case["root"] / "outputs" / "shared_train_final.pt"
    torch.save({"model_state_dict": model.state_dict(), "epoch": epochs,
                "best_val_metric": 0.0}, str(final_ckpt))
    return {
        "per_epoch": per_epoch,
        "init_checkpoint": str(init_ckpt),
        "final_checkpoint": str(final_ckpt),
        "orders": orders,
        "num_batches": len(train_loader),
    }


def run_our_train(case: Dict, init_checkpoint: str, orders, epochs: int = 3,
                  batch_size: int = 2, accum: int = 2, clip: float = 1.0,
                  lr: float = 3e-3, optimizer: str = "SGD",
                  decision_th: float = 0.5,
                  resume_at: Optional[int] = None) -> Dict:
    """Run OUR Trainer.train for the same schedule: identical initial
    weights (reference-layout .pt through the real converter), identical
    per-epoch batch membership (the reference loader's captured order),
    identical optimizer hyperparameters.  ``resume_at=k`` mirrors the
    reference side's mid-run resume: train epochs ``0..k-1``, checkpoint
    (our format, optimizer state included), rebuild a FRESH trainer, restore
    with ``from_checkpoint=True``, and continue ``k..epochs-1``.  Returns
    per-epoch history and the final state trees."""
    import yaml

    from protnote_tpu.cli._model_setup import build_inference_model
    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, get_setup
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.convert import load_reference_checkpoint
    from protnote_tpu.train.losses import get_loss_fn

    with open(DEFAULT_CONFIG_PATH) as fh:
        cfg = yaml.safe_load(fh)
    cfg["params"].update(
        TRAIN_BATCH_SIZE=batch_size,
        GRADIENT_ACCUMULATION_STEPS=accum,
        CLIP_VALUE=clip,
        LEARNING_RATE=lr,
        OPTIMIZER=optimizer,
        WEIGHT_DECAY=0.0,
        NUM_EPOCHS=epochs,
        EPOCHS_PER_VALIDATION=10_000,
        WEIGHTED_SAMPLING=False,
        AUGMENT_RESIDUE_PROBABILITY=0.0,
        LABEL_AUGMENTATION_DESCRIPTIONS="name",
        LABEL_EMBEDDING_NOISING_ALPHA=0.0,
        EXTRACT_VOCABULARIES_FROM=None,
        DECISION_TH=decision_th,
        MIXED_PRECISION=False,
        # the reference quirk under test: frozen encoder's BN runs on batch
        # statistics during training (ProtNoteTrainer.py:671)
        ENCODER_BN_TRAIN_MODE=True,
        TRAIN_SEQUENCE_ENCODER=False,
        LORA=False,
        PROTEIN_EMBEDDING_DIM=TINY["enc_channels"],
        LABEL_EMBEDDING_DIM=case["emb_dim"],
        LATENT_EMBEDDING_DIM=TINY["latent_dim"],
        PROJECTION_HEAD_NUM_LAYERS=TINY["proj_layers"],
        PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR=TINY["proj_scale"],
        OUTPUT_MLP_NUM_LAYERS=TINY["mlp_layers"],
        OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR=TINY["mlp_scale"],
        SEQUENCE_BUCKETS=[128],
    )
    cfg["embed_sequences_params"].update(
        OUTPUT_CHANNELS=TINY["enc_channels"], KERNEL_SIZE=TINY["enc_kernel"],
        NUM_RESNET_BLOCKS=TINY["enc_blocks"], PROTEINFER_NUM_GO_LABELS=17,
    )
    cfg_path = case["root"] / "our_train_config.yaml"
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    old_env = dict(os.environ)
    os.environ["PROTNOTE_DATA_DIR"] = str(case["data_dir"])
    os.environ["PROTNOTE_OUTPUT_DIR"] = str(case["root"] / "outputs")
    try:
        config, run_name, log = get_setup(
            config_path=str(cfg_path), run_name="train_parity",
            train_path_name="TRAIN_DATA_PATH",
        )
        params = config["params"]
        cache = LabelEmbeddingCache.load(
            config["LABEL_EMBEDDING_PATH"], config["LABEL_EMBEDDING_INDEX_PATH"]
        )
        ds = ProteinDataset(
            str(case["fasta"]), DatasetConfig.from_params(params, "train"),
            label_embedding_cache=cache,
        )
        pi_cfg, pn_cfg, trainer = build_inference_model(
            config, params, config["paths_resolved"], cache, run_name,
            model_file=None, mesh=None, log=log,
            loss_fn=get_loss_fn(params),  # bound into the jitted train step
        )
        p2, s2, enc, _meta = load_reference_checkpoint(
            str(init_checkpoint), pn_cfg, pi_cfg)
        trainer.ts["trainable"]["protnote"] = p2
        trainer.ts["model_state"] = s2
        if enc is not None:
            trainer.ts["enc_params"], trainer.ts["enc_state"] = enc

        id_to_idx = {sid: i for i, sid in enumerate(ds.sequence_ids)}

        class _ReplaySchedule(BucketBatcher):
            """Epoch order injected from the reference loader's captured
            batch membership (the single-bucket plan slices the order into
            consecutive batches, matching the reference DataLoader)."""

            def _epoch_indices(self, epoch):
                return np.asarray(
                    [id_to_idx[s] for s in orders[epoch]], dtype=np.int64)

        batcher = _ReplaySchedule(
            ds, batch_size, buckets=tuple(params["SEQUENCE_BUCKETS"]),
            drop_last=True, return_label_multihots=True,
        )
        if resume_at is None:
            history = trainer.train(batcher)["history"]
        else:
            ckpt_dir = str(case["root"] / "outputs" / "our_train_ckpt")
            os.makedirs(ckpt_dir, exist_ok=True)
            trainer.cfg.checkpoint_dir = ckpt_dir
            trainer.cfg.num_epochs = resume_at
            summary1 = trainer.train(batcher)
            trainer.wait_for_checkpoints()
            mid = trainer._ckpt_path("last_epoch")
            # FRESH trainer (fresh random init): the restore must overwrite
            # params, BN state, AND optimizer state (torch load_model
            # semantics, /root/reference/protnote/utils/models.py:364-371)
            _, _, trainer2 = build_inference_model(
                config, params, config["paths_resolved"], cache, run_name,
                model_file=None, mesh=None, log=log,
                loss_fn=get_loss_fn(params),
            )
            trainer2.cfg.checkpoint_dir = ckpt_dir
            trainer2.cfg.num_epochs = epochs
            trainer2.load(mid, from_checkpoint=True)
            assert trainer2.starting_epoch == resume_at, (
                trainer2.starting_epoch, resume_at)
            summary2 = trainer2.train(batcher)
            history = summary1["history"] + summary2["history"]
            trainer = trainer2
    finally:
        os.environ.clear()
        os.environ.update(old_env)
    return {
        "history": history,
        "trainer": trainer,
        "pn_cfg": pn_cfg,
        "pi_cfg": pi_cfg,
    }


def _tree_max_abs_diff(a, b) -> float:
    import jax

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b), (len(leaves_a), len(leaves_b))
    worst = 0.0
    for la, lb in zip(leaves_a, leaves_b):
        la = np.asarray(la, np.float64)
        lb = np.asarray(lb, np.float64)
        assert la.shape == lb.shape, (la.shape, lb.shape)
        worst = max(worst, float(np.max(np.abs(la - lb))) if la.size else 0.0)
    return worst


def run_train_parity(reference_root: str = DEFAULT_REFERENCE_ROOT,
                     workdir: Optional[str] = None,
                     epochs: int = 3, batch_size: int = 2, accum: int = 2,
                     clip: float = 1.0, lr: float = 3e-3,
                     optimizer: str = "SGD",
                     metric_tol: float = 5e-4,
                     weight_tol: float = 5e-5,
                     compare_weights: Optional[bool] = None,
                     resume_at: Optional[int] = None) -> Dict:
    """Full train-loop comparison; returns a results dict for
    PARITY_RESULTS.json.  ``n_seqs=20`` gives 10 batches/epoch at B=2 (the
    reference's progress logging divides by len(loader)//10, so >=10
    batches are required) and 5 optimizer steps/epoch at accum=2.

    ``optimizer='SGD'`` (default) gives the tight end-to-end gate: SGD
    updates are LINEAR in the gradients, so f32 cross-framework gradient
    noise stays at noise scale through the whole run and final weights must
    match to ``weight_tol``.  ``optimizer='Adam'`` exercises the production
    recipe but is gated on per-epoch losses only (``compare_weights``
    defaults off): Adam's first-step update is ~lr*sign(grad), so any
    component whose true gradient sits at float-noise scale takes a
    +/-lr-sized step whose SIGN differs between frameworks — final weights
    are chaotic there by construction, not by bug.  Adam-vs-torch update
    semantics are pinned exactly by tests/test_optim_parity.py instead."""
    import tempfile

    from protnote_tpu.models.convert import load_reference_checkpoint

    root = Path(workdir) if workdir else Path(tempfile.mkdtemp(
        prefix="train_parity_"))
    case = build_shared_case(root, n_seqs=20)
    # our side selects the dataset via the config's TRAIN_DATA_PATH
    # (swissprot/proteinfer_splits/random/train_GO.fasta)
    import shutil

    shutil.copyfile(case["fasta"], case["fasta"].with_name("train_GO.fasta"))
    case["fasta"] = case["fasta"].with_name("train_GO.fasta")
    ref = run_reference_train(case, epochs=epochs, batch_size=batch_size,
                              accum=accum, clip=clip, lr=lr,
                              optimizer=optimizer, resume_at=resume_at,
                              reference_root=reference_root)
    ours = run_our_train(case, ref["init_checkpoint"], ref["orders"],
                         epochs=epochs, batch_size=batch_size, accum=accum,
                         clip=clip, lr=lr, optimizer=optimizer,
                         resume_at=resume_at)
    if compare_weights is None:
        compare_weights = optimizer != "Adam"

    results: Dict = {}
    for e in range(epochs):
        ref_m = ref["per_epoch"][e]
        our_m = ours["history"][e]
        # the reference logs the accumulation-NORMALIZED loss (loss_i/accum,
        # ProtNoteTrainer.py:730-735); ours logs the raw per-batch loss
        comps = {
            "loss": (float(our_m["loss"]), float(ref_m["train_loss"]) * accum),
        }
        if compare_weights:
            # F1 counts are threshold crossings of the live logits — only
            # meaningful as a gate while the weight trajectories themselves
            # are gated (SGD); under Adam they inherit the sign-chaos
            comps.update(
                f1_micro=(float(our_m["f1_micro"]), float(ref_m["train_f1_micro"])),
                f1_macro=(float(our_m["f1_macro"]), float(ref_m["train_f1_macro"])),
            )
        for k, (a, b) in comps.items():
            diff = abs(a - b)
            results[f"train_epoch{e}_{k}"] = {
                "ours": a, "reference": b, "abs_diff": diff,
                "status": "PASS" if diff <= metric_tol else "FAIL",
            }

    # final weights: reference final ckpt through the real converter vs our
    # live state trees — params AND BatchNorm running statistics of both the
    # fusion MLPs and the (frozen, train-mode-BN) encoder
    trainer = ours["trainer"]
    if not compare_weights:
        return results
    p2, s2, enc, _ = load_reference_checkpoint(
        ref["final_checkpoint"], ours["pn_cfg"], ours["pi_cfg"])
    comparisons = {
        "final_params": (trainer.ts["trainable"]["protnote"], p2),
        "final_bn_state": (trainer.ts["model_state"], s2),
    }
    if enc is not None:
        comparisons["final_encoder_bn_state"] = (trainer.ts["enc_state"], enc[1])
    for name, (a, b) in comparisons.items():
        diff = _tree_max_abs_diff(a, b)
        results[f"train_{name}"] = {
            "max_abs_diff": diff,
            "status": "PASS" if diff <= weight_tol else "FAIL",
        }
    return results


def run_pipeline_parity(reference_root: str = DEFAULT_REFERENCE_ROOT,
                        workdir: Optional[str] = None,
                        tol: float = 2e-4,
                        inference_descriptions: str = "name") -> Dict:
    """Full comparison; returns a results dict for PARITY_RESULTS.json."""
    import tempfile

    root = Path(workdir) if workdir else Path(tempfile.mkdtemp(
        prefix="pipeline_parity_"))
    case = build_shared_case(root)
    ref = run_reference_pipeline(
        case, inference_descriptions=inference_descriptions,
        reference_root=reference_root)
    ours = run_our_pipeline(case, ref["checkpoint"],
                            inference_descriptions=inference_descriptions)

    results: Dict = {}
    key_map = {  # reference prefixes with the loader name
        "loss": "test_loss",
        "map_micro": "test_map_micro",
        "map_macro": "test_map_macro",
        "f1_micro": "test_f1_micro",
        "f1_macro": "test_f1_macro",
    }
    for ours_key, ref_key in key_map.items():
        a, b = float(ours["metrics"][ours_key]), float(ref["metrics"][ref_key])
        diff = abs(a - b)
        results[f"pipeline_{ours_key}"] = {
            "ours": a, "reference": b, "abs_diff": diff,
            "status": "PASS" if diff <= tol else "FAIL",
        }
    # our grid is float32, the oracle's float64 — same 90 grid points
    th_equal = abs(ours["sweep"]["threshold"] - ref["sweep"]["threshold"]) < 1e-6
    score_diff = abs(ours["sweep"]["score"] - ref["sweep"]["score"])
    results["pipeline_threshold_sweep"] = {
        "ours": ours["sweep"], "reference": ref["sweep"],
        "abs_diff": score_diff,
        "status": "PASS" if th_equal and score_diff <= tol else "FAIL",
    }
    return results
