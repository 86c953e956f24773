"""Offline smoke tests for the orchestration/analysis CLIs that had no
coverage: calculate_supervised_metrics, umap_plots, download_annotations
(local-file mode), make_datasets subcommands, run_baseline."""

import json
import os
import struct

import numpy as np
import pandas as pd
import pytest

from protnote_tpu.data.fasta import read_fasta, save_to_fasta
from protnote_tpu.data.label_cache import LabelEmbeddingCache


@pytest.fixture
def toy_fasta(tmp_path, rng):
    labels = [f"GO:{i:03d}" for i in range(8)]
    recs = []
    for i in range(20):
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), 25))
        recs.append((seq, f"S{i}", list(rng.choice(labels, 2, replace=False))))
    path = tmp_path / "toy.fasta"
    save_to_fasta(recs, str(path))
    return str(path), labels, recs


def test_calculate_supervised_metrics_cli(tmp_path, rng):
    from protnote_tpu.cli.calculate_supervised_metrics import main
    from protnote_tpu.evaln.results_io import save_evaluation_results

    labels = ["GO:A", "GO:B", "GO:C"]
    ids = [f"s{i}" for i in range(12)]
    targets = (rng.random((12, 3)) < 0.4).astype(np.uint8)
    targets[0] = 1
    paths = {}
    for seed in (1, 2):
        logits = rng.normal(size=(12, 3)).astype(np.float16)
        paths[seed] = save_evaluation_results(
            {"logits": logits, "sequence_ids": ids},
            labels, f"seed{seed}", str(tmp_path), "test",
        )["logits"]
    pd.DataFrame(targets, index=ids, columns=labels).to_parquet(
        tmp_path / "labels.parquet"
    )
    parenthood = {"GO:A": ["GO:0008150"], "GO:B": ["GO:0003674"],
                  "GO:C": ["GO:0005575"]}
    (tmp_path / "parenthood.json").write_text(json.dumps(parenthood))

    out = tmp_path / "table.parquet"
    table = main([
        "--logits", paths[1], paths[2],
        "--labels", str(tmp_path / "labels.parquet"),
        "--parenthood-json", str(tmp_path / "parenthood.json"),
        "--output", str(out),
    ])
    assert out.exists()
    # 2 models x 4 ontology slices
    assert len(table) == 8
    assert set(table["ontology"]) == {"All", "biological_process",
                                      "cellular_component", "molecular_function"}
    assert ((table["mAP Micro"] >= 0) & (table["mAP Micro"] <= 1)).all()


def test_umap_plots_cli(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("MPLBACKEND", "Agg")
    from protnote_tpu.cli.umap_plots import main, project_2d

    emb = rng.normal(size=(40, 8)).astype(np.float16)
    ids = np.array([f"s{i}" for i in range(40)])
    np.savez(tmp_path / "emb.npz", embeddings=emb, sequence_ids=ids)
    xy = project_2d(emb.astype(np.float32), method="pca")
    assert xy.shape == (40, 2)
    out = tmp_path / "plot.png"
    main(["--embeddings", str(tmp_path / "emb.npz"), "--output", str(out),
          "--method", "pca"])
    assert out.exists() and out.stat().st_size > 0


def test_download_annotations_go_local(tmp_path):
    from protnote_tpu.cli.download_annotations import main

    obo = """[Term]
id: GO:0000001
name: alpha
def: "First term." [REF:1]
synonym: "first" EXACT []
is_a: GO:0000002

[Term]
id: GO:0000002
name: beta
def: "Second term." [REF:2]
"""
    (tmp_path / "go.obo").write_text(obo)
    main(["go", "--obo", str(tmp_path / "go.obo"),
          "--output", str(tmp_path / "go.pkl"),
          "--parenthood-output", str(tmp_path / "parenthood.json")])
    df = pd.read_pickle(tmp_path / "go.pkl")
    assert df.loc["GO:0000001", "label"] == "First term."
    assert df.loc["GO:0000001", "synonym_exact"] == ["first"]
    closure = json.loads((tmp_path / "parenthood.json").read_text())
    # reference parenthood JSON includes the term itself
    assert set(closure["GO:0000001"]) == {"GO:0000001", "GO:0000002"}


def test_download_annotations_ec_local(tmp_path):
    from protnote_tpu.cli.download_annotations import main

    enzclass = "".join(
        ["h\n"] * 11
        + ["1. -. -.-  Oxidoreductases.\n",
           "1. 1. -.-  Acting on the CH-OH group of donors.\n",
           "1. 1. 1.-  With NAD(+) or NADP(+) as acceptor.\n"]
        + ["f\n"] * 5
    )
    enzyme = ("ID   1.1.1.1\nDE   Alcohol dehydrogenase.\n"
              "CA   An alcohol + NAD(+) = an aldehyde + NADH.\n//\n")
    (tmp_path / "enzclass.txt").write_text(enzclass)
    (tmp_path / "enzyme.dat").write_text(enzyme)
    main(["ec", "--enzclass", str(tmp_path / "enzclass.txt"),
          "--enzyme-dat", str(tmp_path / "enzyme.dat"),
          "--output", str(tmp_path / "ec.pkl")])
    df = pd.read_pickle(tmp_path / "ec.pkl")
    assert "EC:1.1.1.1" in df.index
    assert "alcohol" in df.loc["EC:1.1.1.1", "label"]
    assert df.loc["EC:1.-.-.-", "label"] == "Oxidoreductases"
    assert df.loc["EC:1.1.1.1", "synonym_exact"] == [df.loc["EC:1.1.1.1", "label"]]


def test_make_datasets_cli(tmp_path, toy_fasta, rng):
    from protnote_tpu.cli.make_datasets import main

    fasta, labels, recs = toy_fasta
    for name in ("train.fasta", "val.fasta", "full.fasta"):
        save_to_fasta(recs, str(tmp_path / name))

    main(["zero-shot-splits", "--train-fasta", str(tmp_path / "train.fasta"),
          "--val-fasta", str(tmp_path / "val.fasta"), "--test-fasta", fasta,
          "--full-fasta", str(tmp_path / "full.fasta"),
          "--output-dir", str(tmp_path / "zs")])
    fake_train = read_fasta(str(tmp_path / "zs" / "fake_train_GO_zero_shot.fasta"))
    fake_test = read_fasta(str(tmp_path / "zs" / "fake_test_GO_zero_shot.fasta"))
    tr = {l for _, _, ls in fake_train for l in ls}
    te = {l for _, _, ls in fake_test for l in ls}
    assert tr and te and not (tr & te)

    main(["top-labels", "--test-fasta", fasta,
          "--output", str(tmp_path / "top.fasta"), "--top-k", "3"])
    top = read_fasta(str(tmp_path / "top.fasta"))
    assert len({l for _, _, ls in top for l in ls}) <= 3

    main(["blast-subsets", "--test-fasta", fasta,
          "--output-dir", str(tmp_path / "bs"), "--sizes", "1", "5"])
    names = sorted(os.listdir(tmp_path / "bs"))
    assert len(names) == 2
    assert len(read_fasta(str(tmp_path / "bs" / names[0]))) == 1

    sp = """AC   P1;
DR   GO; GO:1; C:x; IEA.
SQ   SEQUENCE   6 AA;
     MKVLLA
//
"""
    (tmp_path / "sp.dat").write_text(sp)
    (tmp_path / "parenthood.json").write_text(json.dumps({"GO:1": ["GO:1"]}))
    main(["from-swissprot", "--swissprot-dat", str(tmp_path / "sp.dat"),
          "--output", str(tmp_path / "sp.fasta"),
          "--parenthood-json", str(tmp_path / "parenthood.json")])
    assert read_fasta(str(tmp_path / "sp.fasta")) == [("MKVLLA", "P1", ["GO:1"])]


def test_run_baseline_cli(tmp_path, rng):
    """Similarity baseline: each zero-shot label takes the supervised logits
    of its nearest trained label by embedding cosine."""
    from protnote_tpu.cli.run_baseline import main
    from protnote_tpu.evaln.results_io import load_logits, save_evaluation_results

    trained = ["GO:T0", "GO:T1"]
    zs = ["GO:Z0"]
    # unit-vector embeddings: Z0 is exactly T1's direction
    e0, e1 = np.eye(2, dtype=np.float32)
    LabelEmbeddingCache.save(str(tmp_path / "trained.npz"),
                             np.stack([e0, e1]), trained, ["name"] * 2,
                             ["t0 desc", "t1 desc"], [2, 2])
    LabelEmbeddingCache.save(str(tmp_path / "zs.npz"),
                             e1[None, :], zs, ["name"], ["z0 desc"], [2])
    logits = np.array([[0.1, 2.5], [1.0, -3.0]], dtype=np.float16)
    sup = save_evaluation_results(
        {"logits": logits, "sequence_ids": ["a", "b"]},
        trained, "sup", str(tmp_path), "test",
    )["logits"]
    main(["--supervised-logits", sup,
          "--trained-cache", str(tmp_path / "trained.npz"),
          "--zero-shot-cache", str(tmp_path / "zs.npz"),
          "--output-dir", str(tmp_path), "--run-name", "base"])
    outs = [f for f in os.listdir(tmp_path) if f.startswith("zero_shot_logits_base")]
    assert outs
    out = load_logits(str(tmp_path / outs[0]))
    # GO:Z0 inherits GO:T1's column
    np.testing.assert_allclose(out["GO:Z0"].to_numpy(),
                               logits[:, 1].astype(np.float32), rtol=1e-3)
