"""Analysis helpers: ontology slicing, per-label metrics, BLAST completion,
builders (zero-shot splits, subsets), DAG normalizer integration."""

import numpy as np
import pandas as pd
import pytest

from protnote_tpu.evaln.analysis import (
    complete_blast_preds,
    filter_by_go_ontology,
    get_metrics,
    metrics_by_go_ontology,
    metrics_per_label_df,
    ontology_of,
)


@pytest.fixture
def frames(rng):
    labels = ["GO:A", "GO:B", "GO:C"]
    logits = pd.DataFrame(rng.normal(size=(40, 3)), columns=labels)
    targets = pd.DataFrame((rng.random((40, 3)) < 0.3).astype(int), columns=labels)
    targets.iloc[0] = [1, 1, 1]
    parenthood = {
        "GO:A": ["GO:0008150"],  # biological_process
        "GO:B": ["GO:0003674"],  # molecular_function
        "GO:C": ["GO:0005575"],  # cellular_component
    }
    return logits, targets, parenthood


def test_ontology_of(frames):
    _, _, parenthood = frames
    assert ontology_of("GO:A", parenthood) == "biological_process"
    assert ontology_of("GO:B", parenthood) == "molecular_function"
    assert ontology_of("GO:0008150", parenthood) == "biological_process"
    assert ontology_of("GO:missing", parenthood) == "missing"


def test_filter_and_metrics_by_ontology(frames):
    logits, targets, parenthood = frames
    bp = filter_by_go_ontology("biological_process", logits, parenthood)
    assert list(bp.columns) == ["GO:A"]
    res = metrics_by_go_ontology(logits, targets, parenthood, threshold=0.5)
    assert set(res) == {"All", "biological_process", "cellular_component",
                       "molecular_function"}
    for m in res.values():
        assert 0 <= m["mAP Micro"] <= 1


def test_metrics_per_label_df(frames):
    logits, targets, _ = frames
    targets = targets.copy()
    targets["GO:C"] = 0  # no positives -> NaN row
    df = metrics_per_label_df(logits, targets, threshold=0.5)
    assert np.isnan(df.loc["GO:C", "AUPRC"])
    assert 0 <= df.loc["GO:A", "AUPRC"] <= 1
    assert "F1" in df.columns


def test_complete_blast_preds():
    blast = pd.DataFrame({"GO:A": [15.0, -15.0]}, index=["s1", "s2"])
    out = complete_blast_preds(blast, ["GO:A", "GO:B"], ["s1", "s2", "s3"])
    assert out.shape == (3, 2)
    assert out.loc["s3", "GO:A"] == -15.0
    assert out.loc["s1", "GO:B"] == -15.0
    assert out.loc["s1", "GO:A"] == 15.0


def test_zero_shot_split_builders(tmp_path, rng):
    from protnote_tpu.data.builders import (
        make_blast_runtime_subsets,
        make_top_labels_subset,
        make_zero_shot_datasets,
        split_labels,
    )
    from protnote_tpu.data.fasta import read_fasta, save_to_fasta

    labels = [f"GO:{i:03d}" for i in range(20)]
    recs = []
    for i in range(30):
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), 25))
        recs.append((seq, f"S{i}", list(rng.choice(labels, 3, replace=False))))
    for name in ("train.fasta", "val.fasta", "test.fasta", "full.fasta"):
        save_to_fasta(recs, str(tmp_path / name))

    tr, va, te = split_labels(labels, seed=42)
    assert len(tr) == 16 and len(va) == 2 and len(te) == 2
    assert not (set(tr) & set(va)) and not (set(va) & set(te))
    # deterministic
    assert split_labels(labels, seed=42)[0] == tr

    out = make_zero_shot_datasets(
        str(tmp_path / "train.fasta"), str(tmp_path / "val.fasta"),
        str(tmp_path / "test.fasta"), str(tmp_path / "full.fasta"),
        str(tmp_path), seed=42,
    )
    fake_train = read_fasta(out["fake_train_GO_zero_shot.fasta"])
    train_label_set = {l for _, _, ls in fake_train for l in ls}
    assert train_label_set <= set(tr)
    fake_test = read_fasta(out["fake_test_GO_zero_shot.fasta"])
    test_label_set = {l for _, _, ls in fake_test for l in ls}
    assert test_label_set <= set(te)
    assert not (train_label_set & test_label_set)

    subs = make_blast_runtime_subsets(str(tmp_path / "test.fasta"), str(tmp_path),
                                      sizes=(1, 10))
    assert len(read_fasta(subs[1])) == 1 and len(read_fasta(subs[10])) == 10

    n = make_top_labels_subset(str(tmp_path / "test.fasta"),
                               str(tmp_path / "top.fasta"), top_k=3)
    top = read_fasta(str(tmp_path / "top.fasta"))
    assert n == len(top)
    top_label_set = {l for _, _, ls in top for l in ls}
    assert len(top_label_set) <= 3


def test_swissprot_parser(tmp_path):
    from protnote_tpu.data.builders import parse_swissprot_dat

    dat = """ID   TEST1_HUMAN             Reviewed;          10 AA.
AC   P00001; P99999;
DE   RecName: Full=Test protein 1;
OS   Homo sapiens (Human).
OC   Eukaryota; Metazoa; Chordata.
CC   -!- FUNCTION: Does things.
CC   -!- SUBCELLULAR LOCATION: Cytoplasm.
DR   GO; GO:0005737; C:cytoplasm; IEA:UniProtKB-SubCell.
DR   GO; GO:0003824; F:catalytic activity; IEA:InterPro.
DR   Pfam; PF00001; Test; 1.
SQ   SEQUENCE   10 AA;  1111 MW;  ABCDEF1234567890 CRC64;
     MKVLLAACDE
//
ID   TEST2_MOUSE             Unreviewed;        5 AA.
AC   Q00002;
OS   Mus musculus.
SQ   SEQUENCE   5 AA;  555 MW;  0000000000000000 CRC64;
     MKVLL
//
"""
    p = tmp_path / "sp.dat"
    p.write_text(dat)
    recs = list(parse_swissprot_dat(str(p)))
    assert len(recs) == 2
    r = recs[0]
    assert r["seq_id"] == "P00001"
    assert r["sequence"] == "MKVLLAACDE"
    assert r["go_ids"] == ["GO:0005737", "GO:0003824"]
    assert "Cytoplasm" in r["subcellular_location"]
    assert recs[1]["seq_id"] == "Q00002" and recs[1]["go_ids"] == []


def test_build_dataset_from_swissprot(tmp_path):
    from protnote_tpu.data.builders import build_dataset_from_swissprot
    from protnote_tpu.data.fasta import read_fasta

    dat = """AC   P00001;
DR   GO; GO:1; C:x; IEA.
SQ   SEQUENCE   10 AA;
     MKVLLAACDE
//
AC   P00002;
DR   GO; GO:3; C:x; IEA.
SQ   SEQUENCE   5 AA;
     MKVXX
//
AC   P00003;
SQ   SEQUENCE   5 AA;
     MKVLL
//
"""
    p = tmp_path / "sp.dat"
    p.write_text(dat)
    parenthood = {"GO:1": ["GO:1", "GO:2"], "GO:3": ["GO:3"]}
    out = tmp_path / "out.fasta"
    n = build_dataset_from_swissprot(str(p), str(out), parenthood)
    recs = read_fasta(str(out))
    # P00002 dropped (X residues); P00003 dropped (no GO)
    assert n == 1 and len(recs) == 1
    assert recs[0][1] == "P00001"
    assert recs[0][2] == ["GO:1", "GO:2"]  # parent added
