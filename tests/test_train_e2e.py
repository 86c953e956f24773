"""End-to-end smoke: synthetic FASTA -> cache -> CLI train -> eval ->
checkpoint resume (the 'tiny train->eval->checkpoint->resume' test proposed
in SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

AAS = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    from protnote_tpu.data.fasta import save_to_fasta
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    root = tmp_path_factory.mktemp("toy")
    data_dir = root / "data"
    (data_dir / "swissprot" / "proteinfer_splits" / "random").mkdir(parents=True)
    (data_dir / "embeddings").mkdir(parents=True)
    (root / "outputs").mkdir()

    rng = np.random.default_rng(0)
    labels_all = [f"GO:{i:07d}" for i in range(10)]

    def make_fasta(name, n):
        recs = []
        for i in range(n):
            L = int(rng.integers(20, 120))
            seq = "".join(rng.choice(list(AAS), L))
            labs = list(rng.choice(labels_all, size=int(rng.integers(1, 4)),
                                   replace=False))
            recs.append((seq, f"{name}{i}", labs))
        save_to_fasta(
            recs, str(data_dir / "swissprot" / "proteinfer_splits" / "random" / name)
        )
        return recs

    make_fasta("train_GO.fasta", 24)
    make_fasta("dev_GO.fasta", 8)
    make_fasta("test_GO.fasta", 8)
    full = make_fasta("full_GO.fasta", 4)

    enc = HashLabelEncoder(dim=32)
    ids, dtypes, texts = [], [], []
    for g in labels_all:
        for dt in ("name", "label"):
            ids.append(g)
            dtypes.append(dt)
            texts.append(f"{dt} description of {g}")
    emb = enc.embed(texts)
    LabelEmbeddingCache.save(
        str(data_dir / "embeddings" / "frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dtypes, texts, enc.token_counts(texts),
    )
    return root


@pytest.fixture(scope="module")
def env(toy_data, ):
    old = dict(os.environ)
    os.environ["PROTNOTE_DATA_DIR"] = str(toy_data / "data")
    os.environ["PROTNOTE_OUTPUT_DIR"] = str(toy_data / "outputs")
    yield toy_data
    os.environ.clear()
    os.environ.update(old)


OVERRIDES = [
    "NUM_EPOCHS", "2", "TRAIN_BATCH_SIZE", "8", "VALIDATION_BATCH_SIZE", "8",
    "TEST_BATCH_SIZE", "8", "SEQUENCE_BUCKETS", "[128]",
    "EXTRACT_VOCABULARIES_FROM", "null",
    # tiny model so the CPU test is fast
    "PROTEIN_EMBEDDING_DIM", "48", "LABEL_EMBEDDING_DIM", "32",
    "LATENT_EMBEDDING_DIM", "16", "PROJECTION_HEAD_NUM_LAYERS", "2",
    "OUTPUT_MLP_NUM_LAYERS", "2", "OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR", "2",
    "PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR", "2",
    "MIXED_PRECISION", "False", "NUM_EPOCHS", "2",
]


def _args(extra):
    from protnote_tpu.cli.main import build_argparser

    return build_argparser().parse_args(extra)


@pytest.fixture(scope="module")
def trained(env):
    """Train 2 epochs via the CLI entry and return (root, metrics)."""
    import protnote_tpu.cli.main as cli

    # shrink the encoder via embed_sequences_params by patching config load
    from protnote_tpu.core import config as cfgmod

    orig_load = cfgmod.load_config

    def load_small(path=cfgmod.DEFAULT_CONFIG_PATH):
        cfg = orig_load(path)
        cfg["embed_sequences_params"].update(
            OUTPUT_CHANNELS=48, KERNEL_SIZE=5, NUM_RESNET_BLOCKS=1,
            PROTEINFER_NUM_GO_LABELS=10,
        )
        return cfg

    cfgmod.load_config = load_small
    cli_load = getattr(cli, "load_config", None)
    try:
        args = _args(
            [
                "--train-path-name", "TRAIN_DATA_PATH",
                "--validation-path-name", "VAL_DATA_PATH",
                "--test-paths-names", "TEST_DATA_PATH",
                "--name", "e2e",
                "--save-prediction-results",
                "--save-val-test-metrics",
                "--save-val-test-metrics-file",
                str(env / "outputs" / "metrics.json"),
                "--override", *OVERRIDES,
            ]
        )
        metrics = cli.run(args)
    finally:
        cfgmod.load_config = orig_load
    return env, metrics


def test_training_ran(trained):
    env, metrics = trained
    assert metrics["train_summary"]["epochs"] == 2
    assert "test" in metrics
    assert np.isfinite(metrics["test"]["loss"])
    assert 0 <= metrics["test"]["map_micro"] <= 1


def test_artifacts_written(trained):
    env, _ = trained
    ckpts = list((env / "outputs" / "checkpoints").glob("*.ckpt"))
    kinds = {c.name.split("_", 3)[-1] for c in ckpts}
    assert any("last_epoch" in k for k in kinds)
    results = list((env / "outputs" / "results").glob("test_logits_*.parquet"))
    assert results, "prediction export missing"
    mfile = env / "outputs" / "metrics.json"
    data = json.loads(mfile.read_text())
    assert data and "metrics" in data[0]


def test_eval_only_from_checkpoint(trained):
    """Inference mode: load the saved checkpoint, skip training."""
    import protnote_tpu.cli.main as cli
    from protnote_tpu.core import config as cfgmod

    env, first_metrics = trained
    # trainer.train() restores best_val_metric before the final test eval, so
    # compare against that same checkpoint
    ckpts = sorted((env / "outputs" / "checkpoints").glob("*best_val_metric.ckpt"))
    if not ckpts:
        ckpts = sorted((env / "outputs" / "checkpoints").glob("*last_epoch.ckpt"))
    ckpt = ckpts[-1]

    orig_load = cfgmod.load_config

    def load_small(path=cfgmod.DEFAULT_CONFIG_PATH):
        cfg = orig_load(path)
        cfg["embed_sequences_params"].update(
            OUTPUT_CHANNELS=48, KERNEL_SIZE=5, NUM_RESNET_BLOCKS=1,
            PROTEINFER_NUM_GO_LABELS=10,
        )
        return cfg

    cfgmod.load_config = load_small
    try:
        args = _args(
            [
                "--test-paths-names", "TEST_DATA_PATH",
                "--name", "e2e_eval",
                "--model-file", str(ckpt),
                "--override", *OVERRIDES,
            ]
        )
        metrics = cli.run(args)
    finally:
        cfgmod.load_config = orig_load
    assert "test" in metrics
    # the reloaded model scores the test set identically (same ckpt, no train)
    assert abs(metrics["test"]["map_micro"] - first_metrics["test"]["map_micro"]) < 5e-3


def test_eval_only_int8_backend(trained):
    """PAIR_BACKEND=tiled_int8 through the real CLI: the quantized eval
    scores the test set close to the exact path."""
    import protnote_tpu.cli.main as cli
    from protnote_tpu.core import config as cfgmod

    env, first_metrics = trained
    ckpts = sorted((env / "outputs" / "checkpoints").glob("*best_val_metric.ckpt"))
    if not ckpts:
        ckpts = sorted((env / "outputs" / "checkpoints").glob("*last_epoch.ckpt"))
    ckpt = ckpts[-1]

    orig_load = cfgmod.load_config

    def load_small(path=cfgmod.DEFAULT_CONFIG_PATH):
        cfg = orig_load(path)
        cfg["embed_sequences_params"].update(
            OUTPUT_CHANNELS=48, KERNEL_SIZE=5, NUM_RESNET_BLOCKS=1,
            PROTEINFER_NUM_GO_LABELS=10,
        )
        return cfg

    cfgmod.load_config = load_small
    try:
        args = _args(
            [
                "--test-paths-names", "TEST_DATA_PATH",
                "--name", "e2e_int8",
                "--model-file", str(ckpt),
                "--override", *OVERRIDES, "PAIR_BACKEND", "tiled_int8",
            ]
        )
        metrics = cli.run(args)
    finally:
        cfgmod.load_config = orig_load
    assert np.isfinite(metrics["test"]["loss"])
    assert abs(metrics["test"]["map_micro"]
               - first_metrics["test"]["map_micro"]) < 2e-2
