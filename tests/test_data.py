import numpy as np
import pytest

from protnote_tpu.data.blosum import BLOSUM62, Blosum62Mutations
from protnote_tpu.data.fasta import read_fasta, save_to_fasta, _parse_text
from protnote_tpu.data.vocab import generate_vocabularies, get_vocab_mappings, COMMON_AMINOACIDS

FASTA = """>SEQ1 GO:0001 GO:0002
MKV
LLA
>SEQ2
ACDEFG
>SEQ3 GO:0002
MMMM
"""


def test_parse_fasta_text():
    recs = _parse_text(FASTA)
    assert recs == [
        ("MKVLLA", "SEQ1", ["GO:0001", "GO:0002"]),
        ("ACDEFG", "SEQ2", []),
        ("MMMM", "SEQ3", ["GO:0002"]),
    ]


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(FASTA)
    recs = read_fasta(str(p), use_native=False)
    out = tmp_path / "y.fasta"
    save_to_fasta(recs, str(out))
    recs2 = read_fasta(str(out), use_native=False)
    assert recs == recs2


def test_fasta_native_matches_python(tmp_path):
    from protnote_tpu.native import fastparse

    p = tmp_path / "x.fasta"
    p.write_text(FASTA)
    py = read_fasta(str(p), use_native=False)
    if fastparse.available():
        nat = fastparse.read_fasta(str(p))
        assert nat == py


def test_vocabularies():
    recs = _parse_text(FASTA)
    v = generate_vocabularies(data=recs)
    assert v["label_vocab"] == ["GO:0001", "GO:0002"]
    assert v["sequence_id_vocab"] == ["SEQ1", "SEQ2", "SEQ3"]
    assert "M" in v["amino_acid_vocab"]
    t2i, i2t = get_vocab_mappings(v["label_vocab"])
    assert t2i["GO:0001"] == 0 and i2t[1] == "GO:0002"


def test_vocab_mappings_unique():
    with pytest.raises(ValueError):
        get_vocab_mappings(["A", "A"])


def test_blosum_matrix_symmetric_diagonal():
    for a in COMMON_AMINOACIDS:
        assert BLOSUM62[a][a] > 0
        for b in COMMON_AMINOACIDS:
            assert BLOSUM62[a][b] == BLOSUM62[b][a]


def test_blosum_sampler_distribution(rng):
    mut = Blosum62Mutations(rng=rng)
    # W has the strongest diagonal (11): most samples stay W
    samples = [mut.sample_aa("W") for _ in range(200)]
    assert samples.count("W") > 100
    # all sampled residues have non-negative substitution score
    for s in set(samples):
        assert BLOSUM62["W"][s] >= 0


def test_blosum_augment_ids_vectorised(rng):
    mut = Blosum62Mutations(rng=rng)
    vocab = mut.amino_acid_vocabulary
    ids = rng.integers(0, len(vocab), size=5000).astype(np.int8)
    out = mut.augment_ids(ids, probability=0.5, rng=rng)
    assert out.shape == ids.shape
    changed = (out != ids).mean()
    # p=0.5 but many substitutions return the same residue
    assert 0.05 < changed < 0.5
    # p=0 is identity
    assert np.array_equal(mut.augment_ids(ids, 0.0, rng), ids)
    # substituted ids all map to residues with non-negative blosum score
    sel = out != ids
    for a, b in zip(ids[sel][:100], out[sel][:100]):
        assert BLOSUM62[vocab[a]][vocab[b]] >= 0
