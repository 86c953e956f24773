"""GridBatcher: cartesian (sequence batch x label tile) training batches
(reference GridBatchSampler, samplers.py:127-224)."""

import numpy as np

from protnote_tpu.data.batching import BucketBatcher, GridBatcher
from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
from protnote_tpu.data.fasta import save_to_fasta
from protnote_tpu.data.label_cache import LabelEmbeddingCache
from protnote_tpu.models.label_encoder import HashLabelEncoder


def _dataset(tmp_path, rng, n_labels=10, n_seqs=12):
    labels = [f"GO:{i:07d}" for i in range(n_labels)]
    recs = []
    for i in range(n_seqs):
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), 30))
        recs.append((seq, f"S{i}", list(rng.choice(labels, 2, replace=False))))
    save_to_fasta(recs, str(tmp_path / "g.fasta"))
    enc = HashLabelEncoder(dim=16)
    ids, dts, txts = [], [], []
    for g in labels:
        ids.append(g), dts.append("name"), txts.append(f"name {g}")
    emb = enc.embed(txts)
    LabelEmbeddingCache.save(str(tmp_path / "c.npz"), emb, ids, dts, txts,
                             enc.token_counts(txts))
    cache = LabelEmbeddingCache.load(str(tmp_path / "c.npz"))
    return ProteinDataset(
        str(tmp_path / "g.fasta"),
        DatasetConfig(dataset_type="train",
                      label_augmentation_descriptions=("name",)),
        label_embedding_cache=cache,
    )


def test_grid_batcher_tiles(tmp_path, rng):
    ds = _dataset(tmp_path, rng)
    L = ds.num_labels
    inner = BucketBatcher(ds, batch_size=4, buckets=(64,), shuffle=True,
                          drop_last=True, seed=0)
    grid = GridBatcher(inner, labels_batch_size=4, shuffle_grid=True)
    assert len(grid) == len(inner) * -(-L // 4)

    seen_tiles = set()
    count = 0
    for b in grid:
        count += 1
        assert b.label_embeddings.shape[0] == 4  # static tile size
        assert b.label_multihots.shape == (4, 4)
        seen_tiles.add(tuple(b.label_indices.tolist()))
        # multihots correspond to the tile's label columns
        assert b.label_multihots.max() <= 1
    assert count == len(grid)
    # every label index appears in some tile
    covered = {i for t in seen_tiles for i in t}
    assert covered == set(range(L))


def test_grid_batcher_epoch_reshuffle(tmp_path, rng):
    ds = _dataset(tmp_path, rng)
    inner = BucketBatcher(ds, batch_size=4, buckets=(64,), shuffle=True,
                          drop_last=True, seed=0)
    grid = GridBatcher(inner, labels_batch_size=4)
    grid.set_epoch(0)
    ids0 = [tuple(b.sequence_ids) for b in grid]
    grid.set_epoch(1)
    ids1 = [tuple(b.sequence_ids) for b in grid]
    assert ids0 != ids1  # epoch-seeded reshuffle (reference set_epoch contract)


def test_grid_batcher_lazy_matches_and_consistent(tmp_path, rng):
    """Lazy (batch, tile) assembly: two iterations of the same epoch yield
    identical batches (per-batch keyed RNG streams), and identical batch
    content is shared across that batch's tiles."""
    ds = _dataset(tmp_path, rng)
    inner = BucketBatcher(ds, batch_size=4, buckets=(64,), shuffle=True,
                          drop_last=True, seed=3)
    grid = GridBatcher(inner, labels_batch_size=4, shuffle_grid=True)
    grid.set_epoch(1)
    run1 = list(grid)
    run2 = list(grid)
    assert len(run1) == len(run2) == len(grid)
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a.aa_ids, b.aa_ids)
        np.testing.assert_array_equal(a.label_indices, b.label_indices)
        np.testing.assert_array_equal(a.label_multihots, b.label_multihots)
        np.testing.assert_array_equal(a.label_rows is None,
                                      b.label_rows is None)
    # same sequence-batch content across tiles: group by sequence ids
    by_seq = {}
    for b in run1:
        by_seq.setdefault(tuple(b.sequence_ids), []).append(b)
    for group in by_seq.values():
        for b in group[1:]:
            np.testing.assert_array_equal(group[0].aa_ids, b.aa_ids)


def test_prefetch_wrapped_grid_batcher_detected(tmp_path, rng):
    """ADVICE r2: isinstance(GridBatcher) was defeated by PrefetchBatcher's
    __getattr__ delegation; the trainer must detect the grid through the
    wrapper (duck-typed on labels_batch_size) so eval never reuses one
    tile's label latents for every tile."""
    from protnote_tpu.data.batching import PrefetchBatcher
    from protnote_tpu.train.trainer import _is_grid

    ds = _dataset(tmp_path, rng)
    inner = BucketBatcher(ds, batch_size=4, buckets=(64,), seed=0)
    grid = GridBatcher(inner, labels_batch_size=4)
    wrapped = PrefetchBatcher(grid)
    assert _is_grid(grid)
    assert _is_grid(wrapped)
    assert not _is_grid(inner)
    assert not _is_grid(PrefetchBatcher(inner))


def test_grid_tile_multihots_match_full_vocab_slice(tmp_path, rng):
    """The column-restricted multihot construction (both the O(B*positives)
    small-tile branch and the full-width-slice branch) must equal the
    full-vocabulary batch's multihot sliced by the tile's columns, and the
    tile's label embeddings must be the full batch's columns."""
    ds = _dataset(tmp_path, rng)
    L = ds.num_labels
    kw = dict(batch_size=4, buckets=(64,), shuffle=True, drop_last=True,
              seed=5)
    full = {tuple(b.sequence_ids): b for b in BucketBatcher(ds, **kw)}
    # lbs=2 <= L//4 exercises the O(B*positives) branch; lbs=L-1 > L//4
    # exercises the slice branch (with one padded slot in the last tile)
    for lbs in (2, L - 1):
        grid = GridBatcher(BucketBatcher(ds, **kw), labels_batch_size=lbs,
                           shuffle_grid=True)
        seen = 0
        for b in grid:
            fb = full[tuple(b.sequence_ids)]
            tile = np.asarray(b.label_indices)
            s = len(tile)
            np.testing.assert_array_equal(b.aa_ids, fb.aa_ids)
            np.testing.assert_array_equal(
                b.label_multihots[:, :s], fb.label_multihots[:, tile]
            )
            assert b.label_multihots.shape[1] == lbs
            if s < lbs:  # padded label slots carry zero targets
                assert b.label_multihots[:, s:].sum() == 0
                assert not b.label_mask[s:].any()
            if b.label_embeddings is not None and fb.label_embeddings is not None:
                np.testing.assert_array_equal(
                    b.label_embeddings[:s], fb.label_embeddings[tile]
                )
            seen += 1
        assert seen == len(grid)
