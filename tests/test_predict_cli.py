"""predict.py pod-inference CLI on a toy environment (CPU, sharded parquet
output), plus test_proteinfer standalone eval."""

import glob
import json
import os

import numpy as np
import pytest

AAS = "ACDEFGHIKLMNPQRSTVWY"

TINY = [
    "OUTPUT_CHANNELS", "32", "KERNEL_SIZE", "5", "NUM_RESNET_BLOCKS", "1",
    "PROTEINFER_NUM_GO_LABELS", "6", "LABEL_EMBEDDING_DIM", "16",
    "LATENT_EMBEDDING_DIM", "8", "PROJECTION_HEAD_NUM_LAYERS", "2",
    "OUTPUT_MLP_NUM_LAYERS", "2", "OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR", "2",
    "PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR", "2", "MIXED_PRECISION", "False",
    "SEQUENCE_BUCKETS", "[128]",
]


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from protnote_tpu.data.fasta import save_to_fasta
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    root = tmp_path_factory.mktemp("pred")
    (root / "data" / "embeddings").mkdir(parents=True)
    (root / "data" / "swissprot" / "proteinfer_splits" / "random").mkdir(parents=True)
    (root / "outputs").mkdir()
    rng = np.random.default_rng(0)
    labels = [f"GO:{i:07d}" for i in range(6)]
    recs = []
    for i in range(11):
        seq = "".join(rng.choice(list(AAS), int(rng.integers(15, 60))))
        # predict input may carry no labels at all
        recs.append((seq, f"Q{i}", [] if i % 3 == 0 else [labels[i % 6]]))
    save_to_fasta(recs, str(root / "query.fasta"))
    save_to_fasta(
        [r for r in recs if r[2]],
        str(root / "data" / "swissprot" / "proteinfer_splits" / "random" / "test_GO.fasta"),
    )

    enc = HashLabelEncoder(dim=16)
    ids, dts, txts = [], [], []
    for g in labels:
        for dt in ("name", "label"):
            ids.append(g), dts.append(dt), txts.append(f"{dt} {g}")
    emb = enc.embed(txts)
    LabelEmbeddingCache.save(
        str(root / "data" / "embeddings" / "frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dts, txts, enc.token_counts(txts),
    )
    old = dict(os.environ)
    os.environ["PROTNOTE_DATA_DIR"] = str(root / "data")
    os.environ["PROTNOTE_OUTPUT_DIR"] = str(root / "outputs")
    yield root
    os.environ.clear()
    os.environ.update(old)


def test_predict_cli_shards(env, capsys):
    import pandas as pd

    from protnote_tpu.cli.predict import main

    main([
        "--fasta", str(env / "query.fasta"), "--name", "p",
        "--rows-per-shard", "4", "--batch-size", "4",
        "--override", *TINY,
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["sequences"] == 11
    shards = sorted(glob.glob(str(env / "outputs" / "results" / "predict_logits_*p_*.parquet")))
    assert len(shards) >= 2  # 11 rows at >=4/shard
    dfs = [pd.read_parquet(s) for s in shards]
    total = sum(len(d) for d in dfs)
    assert total == 11
    assert dfs[0].shape[1] == 6  # full label vocabulary columns
    all_ids = [i for d in dfs for i in d.index]
    assert len(set(all_ids)) == 11


def test_proteinfer_cli(env):
    from protnote_tpu.cli.test_proteinfer import main

    res = main([
        "--test-path-name", "TEST_DATA_PATH",
        "--only-represented-labels",
        "--batch-size", "4",
        "--override", *TINY,
    ])
    assert 0 <= res["map_micro"] <= 1
    assert np.isfinite(res["f1_macro"])


def test_predict_cli_int8_auto_calibrates(env, capsys):
    """PAIR_BACKEND=tiled_int8 through the predict CLI: static activation
    scales auto-calibrate from the first batch (INT8_CALIBRATE default) and
    the logits stay close to the default backend's."""
    import pandas as pd

    from protnote_tpu.cli.predict import main

    main([
        "--fasta", str(env / "query.fasta"), "--name", "pq",
        "--rows-per-shard", "100", "--batch-size", "4",
        "--override", *TINY, "PAIR_BACKEND", "tiled_int8",
    ])
    main([
        "--fasta", str(env / "query.fasta"), "--name", "pf",
        "--rows-per-shard", "100", "--batch-size", "4",
        "--override", *TINY,
    ])
    capsys.readouterr()
    q = sorted(glob.glob(str(
        env / "outputs" / "results" / "predict_logits_*pq_*.parquet")))
    f = sorted(glob.glob(str(
        env / "outputs" / "results" / "predict_logits_*pf_*.parquet")))
    assert q and f
    dq = pd.concat([pd.read_parquet(s) for s in q]).sort_index()
    df = pd.concat([pd.read_parquet(s) for s in f]).sort_index()
    pq_ = 1 / (1 + np.exp(-dq.to_numpy()))
    pf = 1 / (1 + np.exp(-df.to_numpy()))
    assert np.max(np.abs(pq_ - pf)) < 5e-2
