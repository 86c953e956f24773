"""Native C++ input-pipeline helpers vs their Python fallbacks."""

import numpy as np
import pytest

from protnote_tpu.native import fastparse


@pytest.fixture(scope="module")
def lut():
    from protnote_tpu.data.dataset import make_residue_lut
    from protnote_tpu.data.vocab import COMMON_AMINOACIDS

    return make_residue_lut(sorted(COMMON_AMINOACIDS))


def test_encode_batch(lut):
    seqs = ["ACDE", "MKVLLA", "WWYY"]
    out = fastparse.encode_batch(seqs, lut, unknown_id=0, pad_id=20, padded_len=8)
    assert out.shape == (3, 8)
    # 'A' is index 0 in the sorted vocab, 'C' index 1
    assert out[0, 0] == lut[ord("A")]
    assert out[0, 3] == lut[ord("E")]
    assert (out[0, 4:] == 20).all()
    # truncation
    out2 = fastparse.encode_batch(["MKVLLA"], lut, 0, 20, padded_len=3)
    assert out2.shape == (1, 3)
    assert (out2 != 20).all()
    # unknown char maps to unknown_id
    out3 = fastparse.encode_batch(["AXB"], lut, unknown_id=7, pad_id=20, padded_len=4)
    assert out3[0, 1] == 7  # 'X' not in vocab
    assert out3[0, 2] == 7  # 'B' not in vocab


def test_multihot():
    lists = [np.array([0, 2], np.int32), np.array([], np.int32),
             np.array([4, 4, 1], np.int32)]
    out = fastparse.multihot(lists, num_labels=5)
    expect = np.array([
        [1, 0, 1, 0, 0],
        [0, 0, 0, 0, 0],
        [0, 1, 0, 0, 1],
    ], np.uint8)
    np.testing.assert_array_equal(out, expect)
    # out-of-range ids ignored, not crashing
    out2 = fastparse.multihot([np.array([99, -1, 1], np.int32)], num_labels=5)
    np.testing.assert_array_equal(out2, [[0, 1, 0, 0, 0]])


def test_parse_fasta_large_roundtrip(tmp_path, rng):
    """Native parser == Python parser on a bigger generated file."""
    from protnote_tpu.data.fasta import read_fasta, save_to_fasta

    recs = []
    for i in range(500):
        L = int(rng.integers(10, 400))
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), L))
        labels = [f"GO:{int(x):07d}" for x in rng.integers(0, 50, rng.integers(0, 6))]
        recs.append((seq, f"SEQ{i}", labels))
    p = tmp_path / "big.fasta"
    save_to_fasta(recs, str(p))
    py = read_fasta(str(p), use_native=False)
    if fastparse.available():
        nat = fastparse.read_fasta(str(p))
        assert nat == py
    assert py == recs
