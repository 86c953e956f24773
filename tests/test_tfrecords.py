"""TFRecord ingestion (reference make_proteinfer_dataset.py:11-113): the
minimal proto walker reads hand-encoded tf.train.Example records."""

import struct

import numpy as np

from protnote_tpu.data.builders import (
    _parse_example,
    _read_tfrecords,
    proteinfer_tfrecords_to_fasta,
)
from protnote_tpu.data.fasta import read_fasta


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:
    """length-delimited proto field."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _example(features: dict) -> bytes:
    """Encode {name: [bytes, ...]} as a tf.train.Example (bytes lists)."""
    entries = b""
    for key, values in features.items():
        bytes_list = b"".join(_ld(1, v) for v in values)
        feature = _ld(1, bytes_list)  # Feature.bytes_list
        entry = _ld(1, key.encode()) + _ld(2, feature)
        entries += _ld(1, entry)  # Features.feature map entry
    return _ld(1, entries)  # Example.features


def _write_tfrecord(path: str, payloads: list) -> None:
    with open(path, "wb") as fh:
        for p in payloads:
            fh.write(struct.pack("<Q", len(p)))
            fh.write(b"\x00" * 4)  # length crc (ignored by the reader)
            fh.write(p)
            fh.write(b"\x00" * 4)  # payload crc


def test_parse_example_roundtrip():
    ex = _example({"sequence": [b"MKVLLA"], "id": [b"P1"],
                   "label": [b"GO:0000001", b"EC:1.1.1.1"]})
    feats = _parse_example(ex)
    assert feats["sequence"] == [b"MKVLLA"]
    assert feats["id"] == [b"P1"]
    assert feats["label"] == [b"GO:0000001", b"EC:1.1.1.1"]


def test_tfrecords_to_fasta(tmp_path):
    recs = [
        {"sequence": [b"MKVLLA"], "id": [b"P1"],
         "label": [b"GO:0000001", b"EC:1.1.1.1", b"GO:0000002"]},
        {"sequence": [b"ACDEFG"], "id": [b"P2"], "label": [b"EC:2.1.1.1"]},
        {"sequence": [b"WWYY"], "id": [b"P3"], "label": [b"GO:0000002"]},
    ]
    _write_tfrecord(str(tmp_path / "a.tfrecord"), [_example(r) for r in recs[:2]])
    _write_tfrecord(str(tmp_path / "b.tfrecord"), [_example(r) for r in recs[2:]])

    payloads = list(_read_tfrecords(str(tmp_path / "a.tfrecord")))
    assert len(payloads) == 2

    out = tmp_path / "out_GO.fasta"
    n = proteinfer_tfrecords_to_fasta(str(tmp_path), str(out), ["GO"])
    got = read_fasta(str(out))
    # P2 has only EC labels -> dropped for GO
    assert n == 2
    assert got[0] == ("MKVLLA", "P1", ["GO:0000001", "GO:0000002"])
    assert got[1] == ("WWYY", "P3", ["GO:0000002"])

    out_ec = tmp_path / "out_EC.fasta"
    n_ec = proteinfer_tfrecords_to_fasta(str(tmp_path), str(out_ec), ["EC"])
    assert n_ec == 2
