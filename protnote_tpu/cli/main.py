"""Training / inference entry point.

Mirrors the argument surface and behaviour of the reference ``bin/main.py``
(train_validate_test, main.py:34-192): dataset-role selection by config key
name, optional training with weighted sampling, validation-driven
checkpointing, decision-threshold search, multi-test-set evaluation with
metric JSON and prediction export.  The execution model is different by
design: one process drives the whole (dp, label) device mesh via jit — there
is no mp.spawn / process-group setup.

Example (toy end-to-end on synthetic data; see tests/test_train_e2e.py):
  python -m protnote_tpu.cli.main --train-path-name TRAIN_DATA_PATH \
      --validation-path-name VAL_DATA_PATH --test-paths-names TEST_DATA_PATH \
      --name my_run --override NUM_EPOCHS 2
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="ProtNote-TPU train/eval")
    ap.add_argument("--train-path-name", default=None)
    ap.add_argument("--validation-path-name", default=None)
    ap.add_argument("--test-paths-names", nargs="+", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--name", default="ProtNoteTPU")
    ap.add_argument("--override", nargs="*", default=None)
    ap.add_argument("--model-file", default=None,
                    help="checkpoint to load (.ckpt ours, .pt reference)")
    ap.add_argument("--from-checkpoint", action="store_true",
                    help="resume optimizer/epoch state from --model-file")
    ap.add_argument("--annotations-path-name", default="GO_ANNOTATIONS_PATH")
    ap.add_argument("--base-label-embedding-name", default="GO_BASE_LABEL_EMBEDDING_PATH")
    ap.add_argument("--save-prediction-results", action="store_true")
    ap.add_argument("--save-embeddings", action="store_true")
    ap.add_argument("--save-val-test-metrics", action="store_true")
    ap.add_argument("--save-val-test-metrics-file", default="val_test_metrics.json")
    ap.add_argument("--use-wandb", action="store_true")
    ap.add_argument("--profile-dir", default=None,
                    help="write jax.profiler traces here during training")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--only-represented-labels", action="store_true")
    ap.add_argument("--mesh-dp", type=int, default=None)
    ap.add_argument("--mesh-label", type=int, default=None)
    # multi-host (pod) execution: one process per host, rendezvous via the
    # coordinator (reference multi-node env:// path, bin/main.py:185-200)
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-host runtime (auto-detect on TPU pods)")
    ap.add_argument("--coordinator-address", default=None,
                    help="host:port of process 0 (or JAX_COORDINATOR_ADDRESS)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    return ap


def run(args) -> Dict:
    from protnote_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    # must run before any other JAX API touches the devices
    from protnote_tpu.parallel.distributed import (
        initialize_distributed, is_main_process,
    )

    initialize_distributed(
        getattr(args, "coordinator_address", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
        force=getattr(args, "distributed", False),
    )

    import jax
    import jax.numpy as jnp

    from protnote_tpu.cli._model_setup import resolve_label_tile
    from protnote_tpu.core.config import DEFAULT_CONFIG_PATH, get_setup
    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.data.vocab import generate_vocabularies
    from protnote_tpu.models.convert import proteinfer_from_tf_pickle
    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig

    config, run_name, log = get_setup(
        config_path=args.config or DEFAULT_CONFIG_PATH,
        run_name=args.name,
        overrides=args.override,
        train_path_name=args.train_path_name,
        val_path_name=args.validation_path_name,
        test_paths_names=args.test_paths_names,
        annotations_path_name=args.annotations_path_name,
        base_label_embedding_name=args.base_label_embedding_name,
        # full log handlers on rank 0 only — every process writing the same
        # {run_name}.log on shared storage interleaves (the run name is
        # broadcast-synchronized across processes)
        is_master=jax.process_index() == 0,
    )
    params = config["params"]
    if args.seed is not None:
        params["SEED"] = args.seed
    seed = params["SEED"]

    # ---------------- label-embedding cache ----------------
    cache = LabelEmbeddingCache.load(
        config["LABEL_EMBEDDING_PATH"], config["LABEL_EMBEDDING_INDEX_PATH"]
    )

    # ---------------- vocabularies ----------------
    vocab_source = params.get("EXTRACT_VOCABULARIES_FROM")
    vocabularies = None
    if vocab_source:
        vocab_path = config["paths_resolved"].get(vocab_source)
        if not vocab_path or not os.path.exists(vocab_path):
            # fail like the reference (datasets.py:99-103 opens the file):
            # a silent per-dataset-vocab fallback skews amino-acid ids and
            # label column order between splits
            raise FileNotFoundError(
                f"EXTRACT_VOCABULARIES_FROM={vocab_source!r} -> "
                f"{vocab_path!r} does not exist; set the path or override "
                f"EXTRACT_VOCABULARIES_FROM null to derive per-dataset "
                f"vocabularies deliberately"
            )
        vocabularies = generate_vocabularies(file_path=vocab_path)

    # ---------------- datasets ----------------
    datasets: Dict[str, List[ProteinDataset]] = {}
    for role, paths in config["dataset_paths"].items():
        datasets[role] = [
            ProteinDataset(
                p,
                DatasetConfig.from_params(params, role),
                label_embedding_cache=cache,
                vocabularies=vocabularies,
                seed=seed,
            )
            for p in paths
        ]
    if not datasets:
        raise SystemExit("No datasets selected; pass --train-path-name or --test-paths-names")

    any_ds = next(iter(datasets.values()))[0]
    num_aa = len(any_ds.amino_acid_vocabulary)

    # ---------------- models ----------------
    esp = config.get("embed_sequences_params", {})
    pi_cfg = ProteInferConfig(
        input_channels=max(esp.get("INPUT_CHANNELS", 20), num_aa),
        output_channels=esp.get("OUTPUT_CHANNELS", 1100),
        kernel_size=esp.get("KERNEL_SIZE", 9),
        dilation_base=esp.get("DILATION_BASE", 3),
        num_resnet_blocks=esp.get("NUM_RESNET_BLOCKS", 5),
        bottleneck_factor=esp.get("BOTTLENECK_FACTOR", 0.5),
        num_labels=esp.get("PROTEINFER_NUM_GO_LABELS", 32102),
        # reference autocasts the encoder unconditionally
        # (ProtNoteTrainer.py:287,728); MIXED_PRECISION=False keeps the
        # strict-f32 (Precision.HIGHEST) parity path
        compute_dtype=(
            jnp.bfloat16 if params.get("MIXED_PRECISION", True) else None
        ),
    )
    pn_cfg = ProtNoteConfig.from_params(
        params,
        # the fusion head consumes whatever the encoder emits; keep them in
        # lockstep regardless of PROTEIN_EMBEDDING_DIM overrides
        protein_embedding_dim=pi_cfg.output_channels,
        label_embedding_dim=cache.dim,
        inference_descriptions_per_label=len(
            params.get("INFERENCE_GO_DESCRIPTIONS", "name+label").split("+")
        ),
        label_tile=resolve_label_tile(params),
        compute_dtype=jnp.bfloat16 if params.get("MIXED_PRECISION", True) else jnp.float32,
    )

    pi_weights = config["paths_resolved"].get("PROTEINFER_GO_WEIGHTS_PATH")
    if params.get("PRETRAINED_SEQUENCE_ENCODER") and pi_weights and os.path.exists(pi_weights):
        log.info("loading ProteInfer weights from %s", pi_weights)
        pi_params, pi_state = proteinfer_from_tf_pickle(pi_weights, pi_cfg)
    else:
        log.warning("ProteInfer weights unavailable; random init")
        pi_params, pi_state = init_proteinfer(jax.random.PRNGKey(seed), pi_cfg)

    pn_params, pn_state = init_protnote(jax.random.PRNGKey(seed + 1), pn_cfg)

    # ---------------- loss / optimizer / trainer ----------------
    train_ds = datasets.get("train", [None])[0]
    label_weights = label_counts = None
    if train_ds is not None and params.get("LOSS_FN") == "WeightedBCE":
        label_weights = jnp.asarray(
            train_ds.calculate_label_weights(power=params.get("INV_FREQUENCY_POWER", 0.5))
        )
    if train_ds is not None and params.get("LOSS_FN") == "CBLoss":
        # CBLoss takes RAW per-label sample counts (reference
        # bin/main.py:480-489: inv_freq=False, normalize=False) — feeding
        # it inverse-frequency weights inverts the class balancing
        label_counts = jnp.asarray(train_ds.calculate_label_counts())
    bce_pos_weight = params.get("BCE_POS_WEIGHT")
    loss_fn = get_loss_fn(params, label_weights=label_weights,
                          label_counts=label_counts, bce_pos_weight=bce_pos_weight)

    # ---------------- trainable label tower (LABEL_ENCODER_NUM_TRAINABLE_LAYERS,
    # reference models.py:11-50 + ProtNote.py:197-215) ----------------
    n_text_layers = params.get("LABEL_ENCODER_NUM_TRAINABLE_LAYERS", 0) or 0
    text_cfg = text_params = lora_params = label_tokens = None
    trainable_mask_tree = None
    if n_text_layers > 0:
        from protnote_tpu.models.label_encoder import JaxLabelEncoder
        from protnote_tpu.models.text_transformer import init_lora, trainable_mask

        try:
            encoder = JaxLabelEncoder(
                params["LABEL_ENCODER_CHECKPOINT"],
                pooling_method=params["LABEL_EMBEDDING_POOLING_METHOD"],
            )
        except Exception as e:
            raise SystemExit(
                f"LABEL_ENCODER_NUM_TRAINABLE_LAYERS={n_text_layers} requires the "
                f"{params['LABEL_ENCODER_CHECKPOINT']!r} weights locally "
                f"(pre-seed the HF cache in offline environments): {e}"
            ) from e
        text_cfg, text_params = encoder.cfg, encoder.params
        toks = encoder.tokenizer(
            list(cache.descriptions), padding="longest", truncation=True,
            max_length=510, return_tensors="np",
        )
        label_tokens = (
            toks["input_ids"].astype(np.int32),
            toks["attention_mask"].astype(np.int32),
        )
        use_lora = params.get("LORA", False)
        if use_lora:
            import jax as _jax

            lora_params = init_lora(
                _jax.random.PRNGKey(seed + 2), text_cfg,
                rank=params.get("LORA_RANK", 4), last_n_layers=n_text_layers,
            )
        else:
            import jax as _jax

            trainable_mask_tree = {
                "protnote": _jax.tree_util.tree_map(lambda _: True, pn_params),
                "text": trainable_mask(text_params, text_cfg, n_text_layers),
            }

    tx = make_optimizer(params, trainable_mask=trainable_mask_tree)
    ts = init_train_state(
        pn_params, pn_state, pi_params, pi_state, tx,
        train_sequence_encoder=params.get("TRAIN_SEQUENCE_ENCODER", False),
        text_params=text_params,
        train_label_encoder=(n_text_layers > 0 and lora_params is None),
        lora_params=lora_params,
    )

    # ---------------- mesh ----------------
    from protnote_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh_dp = args.mesh_dp if args.mesh_dp is not None else params.get("MESH_DP", -1)
    mesh_label = (
        args.mesh_label if args.mesh_label is not None else params.get("MESH_LABEL", 1)
    )
    if params.get("DISTRIBUTE_LABELS") and mesh_label == 1 and len(jax.devices()) > 1:
        mesh_label = len(jax.devices())  # reference DISTRIBUTE_LABELS mode
        mesh_dp = 1
    mesh = None
    if len(jax.devices()) > 1 or mesh_label > 1:
        mesh = make_mesh(MeshSpec(dp=mesh_dp, label=mesh_label))
        log.info("mesh: dp=%d label=%d", mesh.shape["dp"], mesh.shape["label"])
    label_pad = mesh.shape["label"] if mesh is not None else 1
    # Device-resident label embeddings: the view matrix is uploaded once and
    # per-step batches carry only gather indices (vs the reference collator
    # shipping the gathered matrix every step, collators.py:100-105).
    dev_gather = bool(params.get("DEVICE_RESIDENT_LABEL_EMBEDDINGS", True))
    prefetch_n = int(params.get("PREFETCH_BATCHES", 2) or 0)

    def with_prefetch(batcher):
        if prefetch_n > 0:
            from protnote_tpu.data.batching import PrefetchBatcher

            return PrefetchBatcher(batcher, prefetch=prefetch_n)
        return batcher

    out_dir = config["paths_resolved"].get("OUTPUT_MODEL_DIR", "outputs/checkpoints")
    results_dir = config["paths_resolved"].get("RESULTS_DIR", "outputs/results")
    tcfg = TrainerConfig.from_params(
        params, checkpoint_dir=out_dir, run_name=run_name,
        use_wandb=args.use_wandb, profile_dir=args.profile_dir,
    )
    trainer = Trainer(
        ts, pi_cfg, pn_cfg, loss_fn, tx, tcfg,
        train_sequence_encoder=params.get("TRAIN_SEQUENCE_ENCODER", False),
        encoder_bn_train_mode=params.get("ENCODER_BN_TRAIN_MODE", False),
        mesh=mesh,
        text_cfg=text_cfg,
        label_tokens=label_tokens,
        pooling_method=params.get("LABEL_EMBEDDING_POOLING_METHOD", "mean"),
        lora_alpha=params.get("LORA_ALPHA", 8),
        lora_rank=params.get("LORA_RANK", 4),
    )

    if args.model_file:
        if args.model_file.endswith(".pt"):
            from protnote_tpu.models.convert import load_reference_checkpoint

            p2, s2, enc, meta = load_reference_checkpoint(args.model_file, pn_cfg, pi_cfg)
            trainer.ts["trainable"]["protnote"] = p2
            trainer.ts["model_state"] = s2
            if enc is not None:
                enc_p, enc_s = enc
                if "encoder" in trainer.ts["trainable"]:
                    # TRAIN_SEQUENCE_ENCODER=True: the live encoder slot is
                    # trainable["encoder"] (step.py reads trainable first);
                    # writing enc_params there would silently pair random
                    # encoder weights with the checkpoint's BN statistics
                    trainer.ts["trainable"]["encoder"] = enc_p
                else:
                    trainer.ts["enc_params"] = enc_p
                trainer.ts["enc_state"] = enc_s
        else:
            trainer.load(args.model_file, from_checkpoint=args.from_checkpoint)

    buckets = tuple(params.get("SEQUENCE_BUCKETS",
                               (256, 512, 1024, 2048, 4096, 8192, 12288)))
    # token-budget batching (r5): rows per batch = clip(round8(tokens /
    # bucket_width), 8, batch_size) — bounds encoder-position waste on
    # heavy-tail length distributions (see data/batching.py,
    # SWISSPROT_BUCKETS).  None keeps fixed-row batches.
    tokens_pb = params.get("TOKENS_PER_BATCH")

    # ---------------- train ----------------
    all_metrics: Dict[str, Dict] = {}
    if train_ds is not None:
        sequence_weights = None
        if params.get("WEIGHTED_SAMPLING"):
            lw = train_ds.calculate_label_weights(
                power=params.get("INV_FREQUENCY_POWER", 0.5)
            )
            sequence_weights = train_ds.calculate_sequence_weights(
                lw, params.get("SEQUENCE_WEIGHT_AGG", "sum")
            )
            lo = params.get("SAMPLING_LOWER_CLAMP_BOUND")
            hi = params.get("SAMPLING_UPPER_CLAMP_BOUND")
            if lo is not None or hi is not None:
                sequence_weights = np.clip(sequence_weights, lo, hi)
        grid = params.get("GRID_SAMPLER", False)
        train_batcher = BucketBatcher(
            train_ds, params["TRAIN_BATCH_SIZE"], buckets=buckets,
            shuffle=True, drop_last=True, seed=seed,
            label_sample_size=None if grid else params.get("TRAIN_LABEL_SAMPLE_SIZE"),
            shuffle_labels=params.get("SHUFFLE_LABELS", False),
            in_batch_sampling=params.get("IN_BATCH_SAMPLING", False),
            sequence_weights=sequence_weights,
            label_pad_multiple=label_pad,
            device_label_gather=dev_gather,
            tokens_per_batch=tokens_pb,
        )
        if grid:
            from protnote_tpu.data.batching import GridBatcher

            sample = params.get("TRAIN_LABEL_SAMPLE_SIZE")
            if not sample:
                raise SystemExit("GRID_SAMPLER requires TRAIN_LABEL_SAMPLE_SIZE")
            if label_pad > 1 and sample % label_pad:
                raise SystemExit(
                    "GRID_SAMPLER with a label-sharded mesh requires "
                    f"TRAIN_LABEL_SAMPLE_SIZE divisible by {label_pad}"
                )
            train_batcher = GridBatcher(train_batcher, labels_batch_size=sample)
        train_batcher = with_prefetch(train_batcher)
        val_batcher = None
        if "validation" in datasets:
            val_batcher = with_prefetch(BucketBatcher(
                datasets["validation"][0], params["VALIDATION_BATCH_SIZE"],
                buckets=buckets, seed=seed,
                label_sample_size=params.get("VALIDATION_LABEL_SAMPLE_SIZE"),
                label_pad_multiple=label_pad,
                descriptions_per_label=pn_cfg.inference_descriptions_per_label,
                device_label_gather=dev_gather,
                tokens_per_batch=tokens_pb,
            ))
        summary = trainer.train(train_batcher, val_batcher)
        all_metrics["train_summary"] = {
            "best_val_metric": summary["best_val_metric"],
            "epochs": len(summary["history"]),
            # full per-epoch record (train loss + val metrics when run):
            # downstream convergence checks and users' own learning-curve
            # plots read this instead of scraping logs
            "history": [
                {k: (float(v) if isinstance(v, (int, float, np.floating))
                     else v)
                 for k, v in m.items()}
                for m in summary["history"]
            ],
        }

    # ---------------- decision threshold ----------------
    threshold = params.get("DECISION_TH")
    if threshold is None and "validation" in datasets:
        val_batcher = BucketBatcher(
            datasets["validation"][0], params["VALIDATION_BATCH_SIZE"],
            buckets=buckets, seed=seed, label_pad_multiple=label_pad,
            descriptions_per_label=pn_cfg.inference_descriptions_per_label,
            device_label_gather=dev_gather,
            tokens_per_batch=tokens_pb,
        )
        # one pass over validation: metrics AND the threshold sweep
        # (previously find_optimal_threshold scored the set a second time)
        res = trainer.evaluate(
            val_batcher, data_split_name="validation",
            threshold_sweep=np.arange(0.01, 1.0, 0.01, dtype=np.float32),
        )
        threshold, score = res["threshold"]
        trainer.cfg.decision_threshold = threshold
        all_metrics["decision_threshold"] = {"threshold": threshold, "score": score}
        all_metrics["validation_at_sweep"] = res["metrics"]

    # ---------------- test ----------------
    for i, test_ds in enumerate(datasets.get("test", [])):
        split = f"test_{i}" if len(datasets["test"]) > 1 else "test"
        batcher = with_prefetch(BucketBatcher(
            test_ds, params["TEST_BATCH_SIZE"], buckets=buckets, seed=seed,
            label_pad_multiple=label_pad,
            descriptions_per_label=pn_cfg.inference_descriptions_per_label,
            device_label_gather=dev_gather,
            tokens_per_batch=tokens_pb,
        ))
        parenthood = None
        if params.get("NORMALIZE_PROBABILITIES"):
            pl_path = config["paths_resolved"].get("PARENTHOOD_LIB_PATH")
            if pl_path and os.path.exists(pl_path):
                with open(pl_path) as fh:
                    parenthood = json.load(fh)
        res = trainer.evaluate(
            batcher, save_results=args.save_prediction_results,
            output_dir=results_dir, data_split_name=split,
            only_represented_labels=args.only_represented_labels,
            normalize_probabilities=params.get("NORMALIZE_PROBABILITIES", False),
            parenthood=parenthood,
            save_embeddings=args.save_embeddings,
        )
        all_metrics[split] = res["metrics"]
        log.info("%s metrics: %s", split, json.dumps(res["metrics"], default=float))

    if args.save_val_test_metrics and all_metrics and is_main_process():
        path = args.save_val_test_metrics_file
        existing = []
        if os.path.exists(path):
            with open(path) as fh:
                try:
                    existing = json.load(fh)
                except json.JSONDecodeError:
                    existing = []
        existing.append({"run_name": run_name, "metrics": all_metrics})
        with open(path, "w") as fh:
            json.dump(existing, fh, indent=2, default=float)

    trainer.wandb.finish()
    return all_metrics


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = build_argparser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    main()
