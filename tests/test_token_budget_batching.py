"""Token-budget batching (BucketBatcher.tokens_per_batch, r5).

With a heavy-tail length distribution, fixed-row batches waste most of
their encoder positions in long-tail buckets (VERDICT r4 #4: 37%
padding-position waste measured on the SwissProt-like distribution).
``tokens_per_batch`` shrinks rows for long buckets (and lets short
buckets keep up to ``batch_size`` rows), bounding rows*width.

Reference behavior being improved on: the reference pads per batch to
the batch max (collators.py:45-133) with a fixed DataLoader batch size,
so a single 10k-residue sequence in a batch inflates every row to 10k.
"""

import numpy as np
import pytest

from protnote_tpu.data.batching import (
    BucketBatcher, SWISSPROT_BUCKETS,
)
from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
from protnote_tpu.data.fasta import save_to_fasta
from protnote_tpu.data.label_cache import LabelEmbeddingCache


AAS = list("ACDEFGHIKLMNPQRSTVWY")


def make_label_cache(labels, dim=8):
    rng = np.random.default_rng(1)
    return LabelEmbeddingCache(
        embeddings=rng.normal(size=(len(labels), dim)).astype(np.float32),
        ids=np.array(labels, dtype=object),
        description_types=np.array(["name"] * len(labels), dtype=object),
        descriptions=np.array(labels, dtype=object),
        token_counts=np.full(len(labels), 4, np.int32),
    )


def _make_ds(tmp_path, lens, n_labels=16):
    rng = np.random.default_rng(0)
    labels = [f"GO:{i:07d}" for i in range(n_labels)]
    recs = []
    for i, ln in enumerate(lens):
        seq = "".join(np.array(AAS)[rng.integers(0, 20, ln)])
        recs.append((seq, f"S{i}", [labels[i % n_labels]]))
    fasta = str(tmp_path / "tb.fasta")
    save_to_fasta(recs, fasta)
    cache = make_label_cache(labels, dim=8)
    vocabs = {
        "amino_acid_vocab": AAS,
        "label_vocab": labels,
        "sequence_id_vocab": [f"S{i}" for i in range(len(lens))],
    }
    return ProteinDataset(
        fasta,
        DatasetConfig(dataset_type="test", inference_go_descriptions=("name",),
                      inference_descriptions_per_label=1),
        label_embedding_cache=cache, vocabularies=vocabs,
    )


def test_rows_scale_inversely_with_width(tmp_path):
    # lengths spanning short, medium and long buckets
    lens = ([50] * 40) + ([300] * 30) + ([1500] * 10) + ([9000] * 3)
    ds = _make_ds(tmp_path, lens)
    bat = BucketBatcher(ds, 128, buckets=SWISSPROT_BUCKETS,
                        tokens_per_batch=16384, device_label_gather=True)
    seen = set()
    for b in bat:
        w = b.aa_ids.shape[1]
        rows = b.aa_ids.shape[0]
        # rows = clip(round8(16384/w), 8, 128)
        expect = min(max((16384 // w) // 8 * 8, 8), 128)
        assert rows == expect, (w, rows, expect)
        # rows*width never exceeds the budget except at the 8-row floor
        assert rows * w <= 16384 or rows == 8
        for sid in b.sequence_ids:
            if sid:
                assert sid not in seen
                seen.add(sid)
    assert len(seen) == len(lens)  # every sequence exactly once


def test_default_none_is_unchanged(tmp_path):
    lens = [50, 300, 700, 120, 260]
    ds = _make_ds(tmp_path, lens)
    a = BucketBatcher(ds, 4, buckets=(512, 1024), device_label_gather=True)
    b = BucketBatcher(ds, 4, buckets=(512, 1024), device_label_gather=True,
                      tokens_per_batch=None)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.aa_ids, bb.aa_ids)
        np.testing.assert_array_equal(ba.example_mask, bb.example_mask)


def test_row_shard_divisibility(tmp_path):
    # with a dp row shard, per-bucket rows stay divisible by the axis size
    lens = ([50] * 20) + ([5000] * 5)
    ds = _make_ds(tmp_path, lens)
    bat = BucketBatcher(ds, 32, buckets=(128, 8192),
                        tokens_per_batch=4096, device_label_gather=True)
    bat.set_row_shard((0, 1, 4))  # process 0 of 4
    full = BucketBatcher(ds, 32, buckets=(128, 8192),
                         tokens_per_batch=4096, device_label_gather=True)
    full.set_row_shard(None)
    for b in bat:
        rows_global = b.global_batch_size
        assert rows_global % 4 == 0
        # the shard assembles exactly rows_global/4 rows
        assert b.aa_ids.shape[0] == rows_global // 4
    # sharded assembly = the matching slice of the full assembly
    full_batches = list(full)
    bat2 = BucketBatcher(ds, 32, buckets=(128, 8192),
                         tokens_per_batch=4096, device_label_gather=True)
    bat2.set_row_shard((1, 1, 4))
    for fb, sb in zip(full_batches, bat2):
        g = fb.aa_ids.shape[0]
        lo, hi = g * 1 // 4, g * 2 // 4
        np.testing.assert_array_equal(sb.aa_ids, fb.aa_ids[lo:hi])


def test_epoch_coverage_with_shuffle(tmp_path):
    lens = list(np.random.default_rng(3).integers(30, 3000, 60))
    ds = _make_ds(tmp_path, lens)
    bat = BucketBatcher(ds, 64, buckets=SWISSPROT_BUCKETS,
                        tokens_per_batch=8192, shuffle=True, seed=5,
                        device_label_gather=True)
    bat.set_epoch(2)
    seen = [sid for b in bat for sid in b.sequence_ids if sid]
    assert sorted(seen) == sorted(f"S{i}" for i in range(60))


def test_grid_batcher_with_token_budget(tmp_path):
    """GridBatcher pairs (sequence batch x label tile); with a token budget
    the inner per-bucket row counts flow through unchanged."""
    from protnote_tpu.data.batching import GridBatcher

    lens = ([60] * 18) + ([1200] * 4)
    ds = _make_ds(tmp_path, lens, n_labels=16)
    inner = BucketBatcher(ds, 16, buckets=(128, 2048),
                          tokens_per_batch=2048, device_label_gather=True)
    grid = GridBatcher(inner, labels_batch_size=8)
    seen = {}
    for b in grid:
        w = b.aa_ids.shape[1]
        expect_rows = min(max((2048 // w) // 8 * 8, 8), 16)
        assert b.aa_ids.shape[0] == expect_rows
        assert b.label_indices is not None and len(b.label_indices) == 8
        for r, sid in enumerate(b.sequence_ids):
            if sid:
                seen.setdefault(sid, set()).update(
                    int(i) for i in b.label_indices)
    # every sequence meets every label tile -> the full 16-label vocabulary
    assert set(seen) == {f"S{i}" for i in range(len(lens))}
    for sid, cols in seen.items():
        assert cols == set(range(16))
