"""Zero-shot end-to-end: train on one label subset, score completely unseen
labels through their text embeddings (the framework's headline capability —
reference README.md:75-105 / BASELINE.json configs[1-2])."""

import os

import numpy as np
import pytest

AAS = "ACDEFGHIKLMNPQRSTVWY"

OVERRIDES = [
    "NUM_EPOCHS", "2", "TRAIN_BATCH_SIZE", "8", "VALIDATION_BATCH_SIZE", "8",
    "TEST_BATCH_SIZE", "8", "SEQUENCE_BUCKETS", "[128]",
    "EXTRACT_VOCABULARIES_FROM", "null",
    "OUTPUT_CHANNELS", "32", "KERNEL_SIZE", "5", "NUM_RESNET_BLOCKS", "1",
    "PROTEINFER_NUM_GO_LABELS", "20", "LABEL_EMBEDDING_DIM", "32",
    "LATENT_EMBEDDING_DIM", "16", "PROJECTION_HEAD_NUM_LAYERS", "2",
    "OUTPUT_MLP_NUM_LAYERS", "2", "OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR", "2",
    "PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR", "2", "MIXED_PRECISION", "False",
    "DECISION_TH", "0.3",
]


@pytest.fixture(scope="module")
def zero_shot_env(tmp_path_factory):
    from protnote_tpu.data.builders import make_zero_shot_datasets
    from protnote_tpu.data.fasta import save_to_fasta
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    root = tmp_path_factory.mktemp("zs")
    rand_dir = root / "data" / "swissprot" / "proteinfer_splits" / "random"
    zs_dir = root / "data" / "zero_shot"
    emb_dir = root / "data" / "embeddings"
    for d in (rand_dir, zs_dir, emb_dir, root / "outputs"):
        d.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(0)
    labels = [f"GO:{i:07d}" for i in range(20)]

    def make(n, prefix):
        recs = []
        for i in range(n):
            L = int(rng.integers(20, 100))
            seq = "".join(rng.choice(list(AAS), L))
            recs.append((seq, f"{prefix}{i}",
                         list(rng.choice(labels, 4, replace=False))))
        return recs

    save_to_fasta(make(30, "tr"), str(rand_dir / "train_GO.fasta"))
    save_to_fasta(make(10, "va"), str(rand_dir / "dev_GO.fasta"))
    save_to_fasta(make(10, "te"), str(rand_dir / "test_GO.fasta"))
    save_to_fasta(make(6, "fu"), str(rand_dir / "full_GO.fasta"))

    # label-disjoint fake splits (80/10/10 over the 20 labels)
    out = make_zero_shot_datasets(
        str(rand_dir / "train_GO.fasta"), str(rand_dir / "dev_GO.fasta"),
        str(rand_dir / "test_GO.fasta"), str(rand_dir / "full_GO.fasta"),
        str(rand_dir),
    )
    # the 'unseen label' test set lives at TEST_DATA_PATH_ZERO_SHOT
    import shutil

    shutil.copy(out["fake_test_GO_zero_shot.fasta"],
                str(zs_dir / "GO_swissprot_jul_2024.fasta"))

    enc = HashLabelEncoder(dim=32)
    ids, dts, txts = [], [], []
    for g in labels:
        for dt in ("name", "label"):
            ids.append(g)
            dts.append(dt)
            txts.append(f"{dt} describing term {g} function")
    emb = enc.embed(txts)
    LabelEmbeddingCache.save(
        str(emb_dir / "frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dts, txts, enc.token_counts(txts),
    )
    # the zero-shot cache path (2024 base name)
    LabelEmbeddingCache.save(
        str(emb_dir / "2024_frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dts, txts, enc.token_counts(txts),
    )

    old = dict(os.environ)
    os.environ["PROTNOTE_DATA_DIR"] = str(root / "data")
    os.environ["PROTNOTE_OUTPUT_DIR"] = str(root / "outputs")
    yield root
    os.environ.clear()
    os.environ.update(old)


def test_zero_shot_train_then_unseen_eval(zero_shot_env):
    from protnote_tpu.cli.main import build_argparser, run
    from protnote_tpu.data.fasta import read_fasta

    env = zero_shot_env
    # 1) train on the fake train split (16 of 20 labels)
    m1 = run(build_argparser().parse_args([
        "--train-path-name", "TRAIN_DATA_PATH_ZERO_SHOT",
        "--name", "zs_train",
        "--override", *OVERRIDES,
    ]))
    assert m1["train_summary"]["epochs"] == 2

    ckpts = sorted((env / "outputs" / "checkpoints").glob("*zs_train_last_epoch.ckpt"))
    assert ckpts

    # 2) score the completely unseen label subset via its text embeddings
    m2 = run(build_argparser().parse_args([
        "--test-paths-names", "TEST_DATA_PATH_ZERO_SHOT",
        "--base-label-embedding-name", "GO_2024_BASE_LABEL_EMBEDDING_PATH",
        "--name", "zs_eval",
        "--model-file", str(ckpts[-1]),
        "--override", *OVERRIDES,
    ]))
    assert "test" in m2
    assert np.isfinite(m2["test"]["map_micro"])

    # sanity: the evaluated labels are disjoint from the training labels
    rand = env / "data" / "swissprot" / "proteinfer_splits" / "random"
    train_labels = {
        l for _, _, ls in read_fasta(str(rand / "fake_train_GO_zero_shot.fasta"))
        for l in ls
    }
    zs = env / "data" / "zero_shot" / "GO_swissprot_jul_2024.fasta"
    test_labels = {l for _, _, ls in read_fasta(str(zs)) for l in ls}
    assert train_labels and test_labels
    assert not (train_labels & test_labels)
