"""Dataset builders (reference bin/make_dataset_from_swissprot.py:46-256,
bin/make_zero_shot_datasets_from_proteinfer.py:10-113,
bin/create_test_sets.py:11-198, bin/make_proteinfer_dataset.py:11-113).

Pure-Python SwissProt .dat and TFRecord readers — no Biopython / torchdata
dependency.  All outputs are the FASTA format of data/fasta.py.
"""

from __future__ import annotations

import glob
import logging
import os
import struct
from collections import Counter
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Set, Tuple

import numpy as np

from protnote_tpu.data.fasta import read_fasta, save_to_fasta
from protnote_tpu.data.vocab import COMMON_AMINOACIDS

logger = logging.getLogger(__name__)

_STANDARD_AA = set(COMMON_AMINOACIDS)


# ---------------------------------------------------------------- zero-shot


def split_labels(
    labels: Sequence[str], seed: int = 42, fractions: Tuple[float, float] = (0.8, 0.1)
) -> Tuple[List[str], List[str], List[str]]:
    """Deterministic 80/10/10 label split (reference
    make_zero_shot_datasets_from_proteinfer.py:10-113 shuffles the label
    vocabulary and slices)."""
    labels = sorted(labels)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(labels))
    n_train = int(len(labels) * fractions[0])
    n_val = int(len(labels) * fractions[1])
    train = [labels[i] for i in order[:n_train]]
    val = [labels[i] for i in order[n_train : n_train + n_val]]
    test = [labels[i] for i in order[n_train + n_val :]]
    return train, val, test


def _filter_records(records, keep: Set[str]):
    out = []
    for seq, sid, labels in records:
        kept = [l for l in labels if l in keep]
        if kept:
            out.append((seq, sid, kept))
    return out


def make_zero_shot_datasets(
    train_fasta: str,
    val_fasta: str,
    test_fasta: str,
    full_fasta: str,
    output_dir: str,
    seed: int = 42,
) -> Dict[str, str]:
    """Label-disjoint 'fake' splits: the label vocabulary is split 80/10/10
    and each source split keeps only its subset's labels (sequences left
    with no labels are dropped) — the supervised data becomes a zero-shot
    benchmark with truly unseen label text."""
    sources = {
        "fake_train_GO_zero_shot.fasta": train_fasta,
        "fake_dev_GO_zero_shot.fasta": val_fasta,
        "fake_test_GO_zero_shot.fasta": test_fasta,
        "fake_full_GO_zero_shot.fasta": full_fasta,
    }
    all_labels: Set[str] = set()
    records = {}
    for name, path in sources.items():
        records[name] = read_fasta(path)
        all_labels.update(l for _, _, ls in records[name] for l in ls)
    tr, va, te = split_labels(sorted(all_labels), seed=seed)
    subset = {
        "fake_train_GO_zero_shot.fasta": set(tr),
        "fake_dev_GO_zero_shot.fasta": set(va),
        "fake_test_GO_zero_shot.fasta": set(te),
        "fake_full_GO_zero_shot.fasta": set(tr) | set(va) | set(te),
    }
    os.makedirs(output_dir, exist_ok=True)
    out = {}
    for name in sources:
        path = os.path.join(output_dir, name)
        save_to_fasta(_filter_records(records[name], subset[name]), path)
        out[name] = path
    return out


# ---------------------------------------------------------------- subsets


def make_blast_runtime_subsets(
    test_fasta: str, output_dir: str, sizes: Sequence[int]
) -> Dict[int, str]:
    """Size-graded query subsets for the BLAST throughput curve (reference
    create_test_sets.py builds 1..20k-sequence subsets)."""
    records = read_fasta(test_fasta)
    os.makedirs(output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(test_fasta))[0]
    out = {}
    for size in sizes:
        path = os.path.join(output_dir, f"{stem}_subset_{size}.fasta")
        save_to_fasta(records[: int(size)], path)
        out[int(size)] = path
    return out


def make_top_labels_subset(test_fasta: str, output: str, top_k: int = 300) -> int:
    """Keep only the top-k most frequent labels; sequences whose labels all
    fall outside the top-k are dropped (reference top-labels test set)."""
    records = read_fasta(test_fasta)
    freq = Counter(l for _, _, ls in records for l in ls)
    keep = {l for l, _ in freq.most_common(int(top_k))}
    filtered = _filter_records(records, keep)
    save_to_fasta(filtered, output)
    return len(filtered)


# ---------------------------------------------------------------- SwissProt


def parse_swissprot_dat(path: str) -> Iterator[Dict]:
    """Stream records from a SwissProt/UniProt flat .dat file.

    Yields ``{seq_id (primary accession), sequence, go_ids,
    subcellular_location, reviewed}`` — the fields the dataset builder needs
    (replaces Biopython SwissProt.parse)."""
    cur: Dict = {"seq_id": None, "sequence": [], "go_ids": [],
                 "subcellular_location": "", "reviewed": False}
    in_seq = False
    with open(path) as fh:
        for line in fh:
            tag = line[:2]
            if tag == "//":
                if cur["seq_id"] is not None or cur["sequence"]:
                    yield {
                        "seq_id": cur["seq_id"],
                        "sequence": "".join(cur["sequence"]),
                        "go_ids": cur["go_ids"],
                        "subcellular_location": cur["subcellular_location"],
                        "reviewed": cur["reviewed"],
                    }
                cur = {"seq_id": None, "sequence": [], "go_ids": [],
                       "subcellular_location": "", "reviewed": False}
                in_seq = False
            elif tag == "ID":
                cur["reviewed"] = "Reviewed" in line
            elif tag == "AC" and cur["seq_id"] is None:
                cur["seq_id"] = line[5:].split(";")[0].strip()
            elif tag == "DR":
                body = line[5:].strip()
                if body.startswith("GO;"):
                    parts = [p.strip() for p in body.split(";")]
                    if len(parts) > 1 and parts[1].startswith("GO:"):
                        cur["go_ids"].append(parts[1])
            elif tag == "CC":
                body = line[5:].strip()
                if body.startswith("-!- SUBCELLULAR LOCATION:"):
                    cur["subcellular_location"] = body[len("-!- SUBCELLULAR LOCATION:"):].strip()
            elif tag == "SQ":
                in_seq = True
            elif in_seq and line.startswith("     "):
                cur["sequence"].append(line.strip().replace(" ", ""))


def _fasta_ids(path: Optional[str]) -> Set[str]:
    if not path:
        return set()
    return {sid for _, sid, _ in read_fasta(path)}


def build_dataset_from_swissprot(
    swissprot_dat: str,
    output: str,
    parenthood: Dict[str, List[str]],
    label_vocabulary: str = "all",
    sequence_vocabulary: str = "all",
    proteinfer_train_fasta: Optional[str] = None,
    proteinfer_val_fasta: Optional[str] = None,
    proteinfer_test_fasta: Optional[str] = None,
    proteinfer_full_fasta: Optional[str] = None,
    label_ids_old: Optional[Set[str]] = None,
    label_ids_new: Optional[Set[str]] = None,
    only_leaf_nodes: bool = False,
    annotations_names: Optional[Dict[str, str]] = None,
) -> int:
    """SwissProt .dat -> filtered FASTA split (reference
    make_dataset_from_swissprot.py:46-256).

    - drops sequences with non-standard residues or no GO annotations,
    - completes each GO set with its ancestors via the parenthood closure,
    - ``sequence_vocabulary``: all | proteinfer_train | proteinfer_test
      (membership of the corresponding reference split) | new (absent from
      the full proteinfer split),
    - ``label_vocabulary``: all | proteinfer (2019 vocab ``label_ids_old``) |
      new (``label_ids_new - label_ids_old``),
    - ``only_leaf_nodes`` keeps labels that are nobody's ancestor,
    - ``annotations_names`` (id -> name) drops labels without a known name.
    Returns the number of sequences written.
    """
    def _required_ids(path, what):
        # a missing reference split must FAIL, not resolve to an empty id
        # set: 'proteinfer_test' would then write 0 sequences, and 'new'
        # would keep the entire training set in the zero-shot benchmark
        if not path:
            raise ValueError(
                f"sequence_vocabulary={sequence_vocabulary!r} needs {what}"
            )
        return _fasta_ids(path)

    seq_filter: Optional[Set[str]] = None
    negate = False
    if sequence_vocabulary == "proteinfer_train":
        seq_filter = _required_ids(
            proteinfer_train_fasta, "proteinfer_train_fasta"
        ) | _required_ids(proteinfer_val_fasta, "proteinfer_val_fasta")
    elif sequence_vocabulary == "proteinfer_test":
        seq_filter = _required_ids(proteinfer_test_fasta, "proteinfer_test_fasta")
    elif sequence_vocabulary == "new":
        seq_filter = _required_ids(proteinfer_full_fasta, "proteinfer_full_fasta")
        negate = True
    elif sequence_vocabulary != "all":
        raise ValueError(f"unknown sequence_vocabulary {sequence_vocabulary!r}")

    label_filter: Optional[Set[str]] = None
    if label_vocabulary == "proteinfer":
        if label_ids_old is None:
            raise ValueError("label_vocabulary='proteinfer' needs label_ids_old")
        label_filter = set(label_ids_old)
    elif label_vocabulary == "new":
        if label_ids_old is None or label_ids_new is None:
            raise ValueError("label_vocabulary='new' needs old and new label ids")
        label_filter = set(label_ids_new) - set(label_ids_old)
    elif label_vocabulary != "all":
        raise ValueError(f"unknown label_vocabulary {label_vocabulary!r}")

    leaves: Optional[Set[str]] = None
    if only_leaf_nodes:
        ancestors: Set[str] = set()
        for term, parents in parenthood.items():
            ancestors.update(p for p in parents if p != term)
        leaves = set(parenthood) - ancestors

    written = []
    for rec in parse_swissprot_dat(swissprot_dat):
        if not rec["go_ids"] or not rec["sequence"]:
            continue
        if set(rec["sequence"]) - _STANDARD_AA:
            continue
        if seq_filter is not None:
            member = rec["seq_id"] in seq_filter
            if member == negate:
                continue
        labels: Set[str] = set()
        for go in rec["go_ids"]:
            labels.update(parenthood.get(go, [go]))
            labels.add(go)
        if label_filter is not None:
            labels &= label_filter
        if leaves is not None:
            labels &= leaves
        if annotations_names is not None:
            labels = {l for l in labels if l in annotations_names}
        if not labels:
            continue
        written.append((rec["sequence"], rec["seq_id"], sorted(labels)))
    save_to_fasta(written, output)
    logger.info("%s: wrote %d sequences", output, len(written))
    return len(written)


# ---------------------------------------------------------------- TFRecords

# Minimal TFRecord + tf.train.Example reader (replaces torchdata's
# load_from_tfrecord, reference make_proteinfer_dataset.py:11-113).  The
# framing is: uint64 length, uint32 length-crc, payload, uint32 payload-crc.


def _read_tfrecords(path: str) -> Iterator[bytes]:
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            fh.read(4)  # length crc
            payload = fh.read(length)
            if len(payload) < length:
                return
            fh.read(4)  # payload crc
            yield payload


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """(field_number, wire_type, value-bytes) for length-delimited fields;
    varint/fixed fields are skipped (Example only uses wire type 2 + the
    int64/float lists we don't need here)."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 0:
            _, pos = _read_varint(buf, pos)
        elif wire == 5:
            pos += 4
        elif wire == 1:
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_example(payload: bytes) -> Dict[str, List[bytes]]:
    """tf.train.Example -> {feature name: [bytes values]}."""
    out: Dict[str, List[bytes]] = {}
    for field, _, features in _iter_fields(payload):
        if field != 1:  # Example.features
            continue
        for f2, _, entry in _iter_fields(features):
            if f2 != 1:  # Features.feature map entry
                continue
            key = None
            values: List[bytes] = []
            for f3, _, v in _iter_fields(entry):
                if f3 == 1:
                    key = v.decode()
                elif f3 == 2:  # Feature
                    for f4, _, flist in _iter_fields(v):
                        if f4 == 1:  # BytesList
                            for f5, _, item in _iter_fields(flist):
                                if f5 == 1:
                                    values.append(item)
            if key is not None:
                out.setdefault(key, []).extend(values)
    return out


def proteinfer_tfrecords_to_fasta(
    input_dir: str,
    output: str,
    annotation_types: Sequence[str] = ("GO",),
    pattern: str = "*.tfrecord",
) -> int:
    """ProteInfer TFRecords (features: sequence / id / label) -> FASTA,
    keeping labels whose prefix matches ``annotation_types``."""
    prefixes = tuple(f"{t}:" for t in annotation_types)
    records = []
    files = sorted(glob.glob(os.path.join(input_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} under {input_dir}")
    for path in files:
        for payload in _read_tfrecords(path):
            feats = _parse_example(payload)
            seq = b"".join(feats.get("sequence", [])).decode()
            sid = b"".join(feats.get("id", [])).decode()
            labels = [
                v.decode() for v in feats.get("label", [])
                if v.decode().startswith(prefixes)
            ]
            if seq and labels:
                records.append((seq, sid, labels))
    save_to_fasta(records, output)
    logger.info("%s: wrote %d sequences from %d shards", output, len(records), len(files))
    return len(records)
