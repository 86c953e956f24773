"""Convergence e2e (VERDICT r4 #5): proof the framework LEARNS over a real
horizon, not just that its losses are finite.

A synthetic task whose labels are deterministic functions of sequence
motifs (label j active iff its 4-mer motif occurs in the sequence) is
trained >= 20 epochs THROUGH THE REAL CLI — Adam, gradient accumulation,
weighted sampling, threshold sweep, best-checkpoint policy, and a mid-run
checkpoint resume — and the learning curve itself is gated:

  * train loss decreases monotonically-ish and ends well below epoch 0,
  * val mAP rises well above chance and above its epoch-0 value,
  * the best-checkpoint policy tracked the best validation epoch,
  * resuming mid-run continues improving rather than resetting.

Reference horizon for scale: 46 epochs x 418k sequences producing the
published checkpoints (/root/reference/model_card.md:79,109-110); every
prior training check here was an equality check at toy scale.
"""

import os

import numpy as np
import pytest

AAS = "ACDEFGHIKLMNPQRSTVWY"
NUM_LABELS = 12
MOTIF_LEN = 4


def _motifs():
    """12 distinct 4-mer motifs, deterministic, mutually non-overlapping
    enough for a small CNN (kernel 5) to separate."""
    rng = np.random.default_rng(1234)
    out = []
    seen = set()
    while len(out) < NUM_LABELS:
        m = "".join(rng.choice(list(AAS), MOTIF_LEN))
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


MOTIFS = _motifs()


def _make_records(rng, n):
    """Sequences with planted motifs; labels = exactly the planted motifs."""
    recs = []
    for i in range(n):
        base_len = int(rng.integers(40, 90))
        seq = list(rng.choice(list(AAS), base_len))
        active = [j for j in range(NUM_LABELS) if rng.random() < 0.3]
        if not active:
            active = [int(rng.integers(0, NUM_LABELS))]
        for j in active:
            pos = int(rng.integers(0, len(seq) - MOTIF_LEN))
            seq[pos:pos + MOTIF_LEN] = list(MOTIFS[j])
        # re-scan: a random stretch may spell another label's motif too —
        # labels must stay a DETERMINISTIC function of the final sequence
        s = "".join(seq)
        labs = [f"GO:{j:07d}" for j in range(NUM_LABELS) if MOTIFS[j] in s]
        recs.append((s, f"M{i}", labs))
    return recs


@pytest.fixture(scope="module")
def motif_root(tmp_path_factory):
    from protnote_tpu.data.fasta import save_to_fasta
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    root = tmp_path_factory.mktemp("conv")
    data_dir = root / "data"
    split = data_dir / "swissprot" / "proteinfer_splits" / "random"
    split.mkdir(parents=True)
    (data_dir / "embeddings").mkdir(parents=True)
    (root / "outputs").mkdir()

    rng = np.random.default_rng(7)
    save_to_fasta(_make_records(rng, 240), str(split / "train_GO.fasta"))
    save_to_fasta(_make_records(rng, 64), str(split / "dev_GO.fasta"))
    save_to_fasta(_make_records(rng, 64), str(split / "test_GO.fasta"))

    enc = HashLabelEncoder(dim=32)
    ids, dtypes, texts = [], [], []
    for j in range(NUM_LABELS):
        ids.append(f"GO:{j:07d}")
        dtypes.append("name")
        texts.append(f"presence of the {MOTIFS[j]} motif")
    emb = enc.embed(texts)
    LabelEmbeddingCache.save(
        str(data_dir / "embeddings" /
            "frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dtypes, texts, enc.token_counts(texts),
    )
    return root


OVERRIDES = [
    "TRAIN_BATCH_SIZE", "8", "VALIDATION_BATCH_SIZE", "32",
    "TEST_BATCH_SIZE", "32", "SEQUENCE_BUCKETS", "[128]",
    "EXTRACT_VOCABULARIES_FROM", "null",
    # tiny-but-learnable model: the encoder must train to detect motifs
    "PROTEIN_EMBEDDING_DIM", "48", "LABEL_EMBEDDING_DIM", "32",
    "LATENT_EMBEDDING_DIM", "32", "PROJECTION_HEAD_NUM_LAYERS", "2",
    "OUTPUT_MLP_NUM_LAYERS", "2", "OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR", "2",
    "PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR", "2",
    "MIXED_PRECISION", "False",
    "TRAIN_SEQUENCE_ENCODER", "True",
    "LEARNING_RATE", "3e-3",
    "GRADIENT_ACCUMULATION_STEPS", "2",
    "WEIGHTED_SAMPLING", "True",
    "DECISION_TH", "null",  # exercise the post-training threshold sweep
    # thresholdless validation (DECISION_TH null) computes the AP family
    # only, so the best-checkpoint policy must track a thresholdless
    # metric — mirrors the reference constraint that f1-based selection
    # needs a fixed threshold
    "OPTIMIZATION_METRIC_NAME", "map_micro",
    "LABEL_EMBEDDING_NOISING_ALPHA", "0",
]

PHASE1_EPOCHS = 20
TOTAL_EPOCHS = 36


def _run_cli(root, extra):
    import protnote_tpu.cli.main as cli
    from protnote_tpu.core import config as cfgmod

    old = dict(os.environ)
    os.environ["PROTNOTE_DATA_DIR"] = str(root / "data")
    os.environ["PROTNOTE_OUTPUT_DIR"] = str(root / "outputs")
    orig_load = cfgmod.load_config

    def load_small(path=cfgmod.DEFAULT_CONFIG_PATH):
        cfg = orig_load(path)
        cfg["embed_sequences_params"].update(
            OUTPUT_CHANNELS=48, KERNEL_SIZE=5, NUM_RESNET_BLOCKS=1,
            PROTEINFER_NUM_GO_LABELS=NUM_LABELS,
        )
        return cfg

    cfgmod.load_config = load_small
    try:
        args = cli.build_argparser().parse_args(extra)
        return cli.run(args)
    finally:
        cfgmod.load_config = orig_load
        os.environ.clear()
        os.environ.update(old)


@pytest.fixture(scope="module")
def converged(motif_root):
    """Phase 1 (epochs 0..PHASE1_EPOCHS-1), then mid-run resume
    (PHASE1_EPOCHS..TOTAL_EPOCHS-1)."""
    m1 = _run_cli(motif_root, [
        "--train-path-name", "TRAIN_DATA_PATH",
        "--validation-path-name", "VAL_DATA_PATH",
        "--test-paths-names", "TEST_DATA_PATH",
        "--name", "conv", "--seed", "11",
        "--override", *OVERRIDES, "NUM_EPOCHS", str(PHASE1_EPOCHS),
    ])
    ckpts = sorted(
        (motif_root / "outputs" / "checkpoints").glob("*last_epoch.ckpt"))
    assert ckpts, "phase-1 last-epoch checkpoint missing"
    m2 = _run_cli(motif_root, [
        "--train-path-name", "TRAIN_DATA_PATH",
        "--validation-path-name", "VAL_DATA_PATH",
        "--test-paths-names", "TEST_DATA_PATH",
        "--name", "conv_resume", "--seed", "11",
        "--model-file", str(ckpts[-1]), "--from-checkpoint",
        "--override", *OVERRIDES, "NUM_EPOCHS", str(TOTAL_EPOCHS),
    ])
    return m1, m2


def test_train_loss_decreases(converged):
    m1, m2 = converged
    h = m1["train_summary"]["history"] + m2["train_summary"]["history"]
    assert len(h) == TOTAL_EPOCHS
    losses = [e["loss"] for e in h]
    assert all(np.isfinite(losses))
    # ends far below the start
    assert losses[-1] < 0.6 * losses[0], losses
    # monotonic-ish: epoch-to-epoch increases are noise, not trend — fewer
    # than 40% of transitions, and the last-5 mean beats the first-5 mean
    increases = sum(1 for a, b in zip(losses, losses[1:]) if b > a)
    assert increases < 0.4 * len(losses), losses
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.75, losses


def test_val_map_rises_above_chance(converged):
    m1, m2 = converged
    h = m1["train_summary"]["history"] + m2["train_summary"]["history"]
    maps = [e["val_map_micro"] for e in h if "val_map_micro" in e]
    assert len(maps) == TOTAL_EPOCHS  # EPOCHS_PER_VALIDATION=1
    # chance level (untrained model / random scores) ~= the positive rate
    # ~0.28 on this task; require a real detector by the end and a clear
    # rise over epoch 0.  The tiny 64-seq val set is noisy epoch-to-epoch,
    # so gate the last-3 mean, not a single epoch.
    tail = float(np.mean(maps[-3:]))
    assert tail > 0.5, maps
    assert tail > maps[0] + 0.2, maps


def test_best_checkpoint_tracked_best_epoch(converged):
    m1, m2 = converged
    h = m1["train_summary"]["history"] + m2["train_summary"]["history"]
    best = m2["train_summary"]["best_val_metric"]
    seen = [e["val_map_micro"] for e in h if "val_map_micro" in e]
    # the policy's best metric equals the max observed across BOTH phases
    # (phase 2 restores best_val_metric from the checkpoint, so the
    # tracking is global across the resume boundary)
    assert abs(best - max(seen)) < 1e-9, (best, max(seen))


def test_resume_continued_not_reset(converged):
    m1, m2 = converged
    assert m1["train_summary"]["epochs"] == PHASE1_EPOCHS
    # phase 2 ran only the REMAINING epochs, not all TOTAL_EPOCHS
    assert m2["train_summary"]["epochs"] == TOTAL_EPOCHS - PHASE1_EPOCHS
    l1 = m1["train_summary"]["history"][-1]["loss"]
    l2_first = m2["train_summary"]["history"][0]["loss"]
    # resumed training starts near where phase 1 ended (no re-init cliff);
    # generous bound — one epoch of drift, not a fresh-init loss
    assert l2_first < 1.5 * l1 + 0.02, (l1, l2_first)
    # and the test-set eval after the full horizon is a real detector
    assert m2["test"]["map_micro"] > 0.5
    # DECISION_TH null: the post-training sweep ran and picked a threshold
    assert "decision_threshold" in m2
    assert 0.0 < m2["decision_threshold"]["threshold"] < 1.0
