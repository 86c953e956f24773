"""GO-DAG normalizer, annotations parsing, label encoders, baselines,
results IO, config system."""

import json
import os

import numpy as np
import pytest


# ---------------------------------------------------------------- go_dag


def test_dag_normalizer_parent_max():
    from protnote_tpu.evaln.go_dag import DagNormalizer, normalize_confidences

    vocab = ["GO:A", "GO:B", "GO:C", "GO:D"]
    # B and C are children of A (transitively); D unrelated
    parenthood = {"GO:B": ["GO:A"], "GO:C": ["GO:A"], "GO:A": [], "GO:D": []}
    preds = np.array([[0.1, 0.9, 0.3, 0.5],
                      [0.8, 0.2, 0.1, 0.0]], dtype=np.float32)
    out = normalize_confidences(preds, vocab, parenthood)
    # A takes max over {B, C}
    np.testing.assert_allclose(out[:, 0], [0.9, 0.2])
    # leaves and singletons unchanged
    np.testing.assert_allclose(out[:, 1:], preds[:, 1:])
    # monotonicity: parent >= each child
    assert (out[:, 0] >= out[:, 1]).all() and (out[:, 0] >= out[:, 2]).all()


# ---------------------------------------------------------------- annotations

OBO = """format-version: 1.2

[Term]
id: GO:0000001
name: mitochondrion inheritance
def: "The distribution of mitochondria." [GOC:mcc, PMID:10873824]
synonym: "mitochondrial inheritance" EXACT []
is_a: GO:0048308 ! organelle inheritance

[Term]
id: GO:0000002
name: obsolete thing
def: "OBSOLETE. Some old def." [GOC:x]
is_obsolete: true

[Typedef]
id: part_of
name: part of
"""


def test_parse_obo(tmp_path):
    from protnote_tpu.data.annotations import go_annotations_dataframe, parse_obo

    p = tmp_path / "go.obo"
    p.write_text(OBO)
    terms = parse_obo(str(p))
    assert set(terms) == {"GO:0000001", "GO:0000002"}
    t = terms["GO:0000001"]
    assert t["name"] == "mitochondrion inheritance"
    assert t["label"] == "The distribution of mitochondria."
    assert t["synonym_exact"] == ["mitochondrial inheritance"]
    assert t["is_a"] == ["GO:0048308"]
    assert terms["GO:0000002"]["is_obsolete"] is True

    df = go_annotations_dataframe(str(p))
    assert df.loc["GO:0000001", "label"] == "The distribution of mitochondria."


def test_go_parenthood_transitive(tmp_path):
    from protnote_tpu.data.annotations import go_parenthood

    obo = """[Term]
id: GO:1
name: root

[Term]
id: GO:2
name: mid
is_a: GO:1

[Term]
id: GO:3
name: leaf
is_a: GO:2
"""
    p = tmp_path / "go.obo"
    p.write_text(obo)
    closure = go_parenthood(str(p))
    assert set(closure["GO:3"]) == {"GO:1", "GO:2"}
    assert closure["GO:1"] == []


def test_ec_parsing(tmp_path):
    from protnote_tpu.data.annotations import (
        ec_number_to_code,
        get_ec_class_descriptions,
        get_ec_number_description,
    )

    assert ec_number_to_code("1.2.3.4") == (1, 2, 3)
    assert ec_number_to_code("1.-.-.-") == (1, 0, 0)

    header = ["x\n"] * 11
    footer = ["y\n"] * 5
    body = [
        "1. -. -.-  Oxidoreductases.\n",
        "1. 1. -.-  Acting on the CH-OH group of donors.\n",
        "1. 1. 1.-  With NAD(+) or NADP(+) as acceptor.\n",
    ]
    p = tmp_path / "enzclass.txt"
    p.write_text("".join(header + body + footer))
    classes = get_ec_class_descriptions(str(p))
    assert classes[(1, 0, 0)]["label"] == "Oxidoreductases"
    assert classes[(1, 1, 1)]["label"].startswith("Oxidoreductases, acting on")

    dat = (
        "ID   1.1.1.1\nDE   Alcohol dehydrogenase.\n"
        "CA   A primary alcohol + NAD(+) = an aldehyde + NADH.\n//\n"
        "ID   1.1.1.2\nDE   Something.\nCA   \n//\n"
    )
    p2 = tmp_path / "enzyme.dat"
    p2.write_text(dat)
    leaves = get_ec_number_description(str(p2), classes)
    assert leaves[0]["ec_number"] == "1.1.1.1"
    assert "primary alcohol" in leaves[0]["label"]
    # empty CA falls back to class label
    assert leaves[1]["label"].startswith("Oxidoreductases")


# ---------------------------------------------------------------- label encoder


def test_hash_label_encoder_properties():
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    enc = HashLabelEncoder(dim=64)
    texts = ["protein kinase activity", "protein kinase activity",
             "kinase protein activity", "membrane transport"]
    emb = enc.embed(texts)
    assert emb.shape == (4, 64)
    np.testing.assert_allclose(emb[0], emb[1])  # deterministic
    sim_related = emb[0] @ emb[2]
    sim_unrelated = emb[0] @ emb[3]
    assert sim_related > sim_unrelated  # shared words -> closer
    assert enc.token_counts(texts)[0] == 5


def test_pool_hidden_states_matches_reference_semantics():
    from protnote_tpu.models.label_encoder import pool_hidden_states

    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(2, 5, 4)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.int64)
    # mean (SOS-aware): exclude token 0, average the rest of attended tokens
    out = pool_hidden_states(hidden, mask, "mean", account_for_sos=True)
    ref0 = hidden[0, 1:3].mean(axis=0)
    np.testing.assert_allclose(out[0], ref0, rtol=1e-6)
    # last_token: final attended position
    out2 = pool_hidden_states(hidden, mask, "last_token")
    np.testing.assert_allclose(out2[0], hidden[0, 2])
    np.testing.assert_allclose(out2[1], hidden[1, 4])


# ---------------------------------------------------------------- cache generator


def test_flatten_annotations(tmp_path):
    import pandas as pd

    from protnote_tpu.cli.generate_label_embeddings import flatten_annotations

    df = pd.DataFrame(
        {
            "name": ["alpha", "beta"],
            "label": ["def of alpha", "OBSOLETE. def of beta"],
            "synonym_exact": [["syn1", "syn2"], []],
        },
        index=["GO:1", "GO:2"],
    )
    ids, dtypes, texts = flatten_annotations(df)
    assert ids == ["GO:1", "GO:1", "GO:1", "GO:1", "GO:2", "GO:2"]
    assert texts[1] == "def of alpha"
    assert "OBSOLETE" not in texts[-1] and "def of beta" in texts[-1]


# ---------------------------------------------------------------- baselines


def test_similarity_baseline():
    from protnote_tpu.baselines.similarity import transfer_logits

    trained = np.eye(3, dtype=np.float32)  # 3 trained labels
    zero_shot = np.array([[0.9, 0.1, 0.0], [0.0, 0.1, 0.9]], dtype=np.float32)
    logits = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype=np.float32)
    out = transfer_logits(logits, zero_shot, trained)
    np.testing.assert_allclose(out, [[1.0, 3.0], [4.0, 6.0]])


def test_blast_pseudologits_without_binaries(tmp_path):
    from protnote_tpu.baselines import blast as B

    if B.blast_available():
        pytest.skip("blast binaries present; covered by integration run")
    bt = B.BlastTopHits(str(tmp_path / "db.fasta"), str(tmp_path / "q.fasta"))
    with pytest.raises(RuntimeError):
        bt.make_db()


# ---------------------------------------------------------------- results io


def test_save_and_load_results(tmp_path):
    from protnote_tpu.evaln.results_io import load_logits, save_evaluation_results

    logits = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float16)
    labels = (logits > 0).astype(np.uint8)
    paths = save_evaluation_results(
        {"logits": logits, "labels": labels, "sequence_ids": list("abcd")},
        ["GO:1", "GO:2", "GO:3"], "run1", str(tmp_path), "test",
    )
    df = load_logits(paths["logits"])
    assert list(df.columns) == ["GO:1", "GO:2", "GO:3"]
    assert df.values.dtype == np.float32
    np.testing.assert_allclose(df.values, logits.astype(np.float32), rtol=1e-3)


# ---------------------------------------------------------------- config


def test_config_roundtrip(tmp_path, monkeypatch):
    from protnote_tpu.core.config import (
        generate_label_embedding_path,
        get_setup,
        load_config,
    )

    cfg = load_config()
    assert cfg["params"]["LOSS_FN"] == "FocalLoss"
    p = generate_label_embedding_path(
        cfg["params"], "data/embeddings/frozen_label_embeddings.npz"
    )
    assert p.endswith("frozen_label_embeddings_E5multilingual_mean.npz")

    monkeypatch.setenv("PROTNOTE_DATA_DIR", str(tmp_path / "d"))
    monkeypatch.setenv("PROTNOTE_OUTPUT_DIR", str(tmp_path / "o"))
    config, run_name, logger = get_setup(
        run_name="t", overrides=["NUM_EPOCHS", "3"],
        test_paths_names=["TEST_DATA_PATH"],
    )
    assert config["params"]["NUM_EPOCHS"] == 3
    assert config["dataset_paths"]["test"][0].startswith(str(tmp_path / "d"))
    assert "LABEL_EMBEDDING_PATH" in config


def test_blast_empty_results_and_numeric_ids(tmp_path):
    """Empty blastp output -> all -15 pseudo-logits (the documented
    contract, not an EmptyDataError); numeric FASTA ids stay strings through
    the TSV parse so label transfer still matches."""
    from protnote_tpu.baselines.blast import PSEUDO_LOGIT, BlastTopHits
    from protnote_tpu.data.fasta import save_to_fasta

    save_to_fasta([("ACDEF", "123", ["GO:1"]), ("GHIKL", "456", ["GO:2"])],
                  str(tmp_path / "db.fasta"))
    save_to_fasta([("ACDEF", "123", []), ("MNPQR", "789", [])],
                  str(tmp_path / "q.fasta"))
    bt = BlastTopHits(str(tmp_path / "db.fasta"), str(tmp_path / "q.fasta"),
                      work_dir=str(tmp_path))

    # empty results file (blastp found nothing)
    open(bt.results_path, "w").close()
    logits, qids = bt.pseudo_logits(["GO:1", "GO:2"])
    assert qids == ["123", "789"]
    np.testing.assert_array_equal(logits, -PSEUDO_LOGIT)

    # numeric ids in outfmt-6: transfer must hit the str-keyed label dict
    with open(bt.results_path, "w") as fh:
        fh.write("123\t456\t100.0\t5\t0\t0\t1\t5\t1\t5\t1e-30\t50.0\n")
    logits, qids = bt.pseudo_logits(["GO:1", "GO:2"])
    assert logits[0, 1] == PSEUDO_LOGIT  # GO:2 transferred from db seq 456
    assert logits[0, 0] == -PSEUDO_LOGIT
    np.testing.assert_array_equal(logits[1], -PSEUDO_LOGIT)


def test_results_io_rejects_vocab_width_mismatch(tmp_path):
    """A vocab/logit width mismatch must raise — numeric fallback columns
    silently broke every downstream GO-term join."""
    from protnote_tpu.evaln.results_io import save_evaluation_results

    with pytest.raises(ValueError, match="does not match"):
        save_evaluation_results(
            {"logits": np.zeros((2, 3), np.float32), "sequence_ids": ["a", "b"]},
            ["GO:1", "GO:2"], "r", str(tmp_path), "test",
        )
