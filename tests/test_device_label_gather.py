"""Device-resident label-embedding path: batches carry gather indices, the
view matrix stays on device, and results match the ship-the-matrix path."""

import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.data.batching import BucketBatcher, PrefetchBatcher
from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
from protnote_tpu.data.fasta import save_to_fasta
from protnote_tpu.data.label_cache import LabelEmbeddingCache
from protnote_tpu.models.label_encoder import HashLabelEncoder


def build_dataset(rng, dataset_type="test", n_seqs=10, n_labels=12, k_desc=2,
                  **cfg_kw):
    tmp = tempfile.mkdtemp()
    labels = [f"GO:{i:07d}" for i in range(n_labels)]
    recs = []
    for i in range(n_seqs):
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), 20 + i))
        recs.append((seq, f"S{i}", [labels[i % n_labels], labels[(i * 3) % n_labels]]))
    save_to_fasta(recs, f"{tmp}/x.fasta")
    enc = HashLabelEncoder(dim=16)
    ids, dts, txts = [], [], []
    for g in labels:
        for dt in ("name", "label")[:k_desc]:
            ids.append(g), dts.append(dt), txts.append(f"{dt} {g}")
    emb = enc.embed(txts)
    LabelEmbeddingCache.save(f"{tmp}/c.npz", emb, ids, dts, txts,
                             enc.token_counts(txts))
    cache = LabelEmbeddingCache.load(f"{tmp}/c.npz")
    return ProteinDataset(
        f"{tmp}/x.fasta",
        DatasetConfig(dataset_type=dataset_type, **cfg_kw),
        label_embedding_cache=cache,
    )


def batches_equal(a, b, check_embeddings_via_rows=True):
    np.testing.assert_array_equal(a.aa_ids, b.aa_ids)
    np.testing.assert_array_equal(a.lengths, b.lengths)
    np.testing.assert_array_equal(a.label_multihots, b.label_multihots)
    if check_embeddings_via_rows:
        assert a.label_embeddings is not None and b.label_rows is not None


def test_rows_reproduce_embeddings_eval(rng):
    """Deterministic eval layout: gathering label_rows from the view matrix
    reproduces the materialized label_embeddings exactly (incl. k=2 blocks)."""
    ds = build_dataset(rng, inference_descriptions_per_label=2)
    kw = dict(batch_size=4, buckets=(64,), descriptions_per_label=2)
    b_emb = next(iter(BucketBatcher(ds, **kw)))
    b_row = next(iter(BucketBatcher(ds, device_label_gather=True, **kw)))
    assert b_row.label_embeddings is None
    gathered = ds.label_view.embeddings[b_row.label_rows]
    np.testing.assert_array_equal(b_emb.label_embeddings, gathered)
    np.testing.assert_array_equal(b_emb.label_token_counts, b_row.label_token_counts)
    np.testing.assert_array_equal(
        b_emb.label_description_indices, b_row.label_description_indices
    )


def test_rows_reproduce_embeddings_train_sampled(rng):
    """Training description sampling draws the same rows on both paths
    (same rng stream), so gather == materialize."""
    ds = build_dataset(
        rng, dataset_type="train",
        label_augmentation_descriptions=("name", "label"),
    )
    kw = dict(batch_size=4, buckets=(64,), seed=7, shuffle=True)
    b_emb = next(iter(BucketBatcher(ds, **kw)))
    b_row = next(iter(BucketBatcher(ds, device_label_gather=True, **kw)))
    gathered = ds.label_view.embeddings[b_row.label_rows]
    np.testing.assert_array_equal(b_emb.label_embeddings, gathered)


def test_label_sampling_block_expansion(rng):
    """VALIDATION_LABEL_SAMPLE_SIZE with k=2 descriptions per label selects
    whole per-label blocks (regression for the k>1 mis-indexing)."""
    ds = build_dataset(rng, inference_descriptions_per_label=2)
    kw = dict(batch_size=4, buckets=(64,), descriptions_per_label=2,
              label_sample_size=5)
    b_emb = next(iter(BucketBatcher(ds, **kw)))
    b_row = next(iter(BucketBatcher(ds, device_label_gather=True, **kw)))
    assert b_emb.label_embeddings.shape[0] == 10  # 5 labels x k=2
    assert b_row.label_rows.shape[0] == 10
    gathered = ds.label_view.embeddings[b_row.label_rows]
    np.testing.assert_array_equal(b_emb.label_embeddings, gathered)
    # block j of the embedding matrix describes sampled label j
    full, _, _ = ds.label_view.first_k_per_label(2)
    for j, lab in enumerate(b_emb.label_indices):
        np.testing.assert_array_equal(
            b_emb.label_embeddings[2 * j : 2 * j + 2], full[2 * lab : 2 * lab + 2]
        )


def test_label_padding_pads_rows(rng):
    ds = build_dataset(rng, inference_descriptions_per_label=1)
    b = next(iter(BucketBatcher(ds, 4, buckets=(64,), label_pad_multiple=8,
                                device_label_gather=True)))
    # vocab comes from the data: 10 represented labels -> 16 padded slots
    assert b.label_rows.shape[0] == 16
    assert b.label_mask.sum() == 10
    assert (b.label_rows[10:] == 0).all()


def test_eval_step_gather_matches_materialized(rng):
    """Jitted eval step: label_matrix+label_rows == label_embeddings."""
    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state, make_eval_step

    PI = ProteInferConfig(output_channels=32, kernel_size=5, num_resnet_blocks=2,
                          num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2,
                        label_tile=8)
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    ev = make_eval_step(PI, PN)

    B, T, L, M, D = 4, 32, 10, 24, 16
    matrix = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, M, (L,)).astype(np.int32))
    base = {
        "aa_ids": jnp.asarray(rng.integers(0, 20, (B, T)).astype(np.int8)),
        "lengths": jnp.asarray(rng.integers(8, T, (B,)).astype(np.int32)),
        "example_mask": jnp.ones((B,), jnp.float32),
    }
    out_gather = ev(ts, {**base, "label_rows": rows, "label_matrix": matrix})
    out_mat = ev(ts, {**base, "label_embeddings": matrix[rows]})
    np.testing.assert_allclose(
        np.asarray(out_gather["logits"]), np.asarray(out_mat["logits"]),
        rtol=1e-6, atol=1e-6,
    )


def test_eval_step_precomputed_latents_match(rng):
    """label_latents (W_l projected once per evaluation) == per-step
    projection of the gathered rows."""
    from protnote_tpu.models.fusion import (
        ProtNoteConfig, compute_label_latents, init_protnote,
    )
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state, make_eval_step

    PI = ProteInferConfig(output_channels=32, kernel_size=5, num_resnet_blocks=2,
                          num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2,
                        inference_descriptions_per_label=2)
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    ev = make_eval_step(PI, PN)

    B, T, L, M, D = 4, 32, 10, 24, 16
    matrix = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, M, (L * 2,)).astype(np.int32))  # k=2
    base = {
        "aa_ids": jnp.asarray(rng.integers(0, 20, (B, T)).astype(np.int8)),
        "lengths": jnp.asarray(rng.integers(8, T, (B,)).astype(np.int32)),
        "example_mask": jnp.ones((B,), jnp.float32),
    }
    out_rows = ev(ts, {**base, "label_rows": rows, "label_matrix": matrix})
    latents = compute_label_latents(
        ts["trainable"]["protnote"], ts["model_state"], matrix[rows], PN
    )
    out_lat = ev(ts, {**base, "label_latents": latents})
    np.testing.assert_allclose(
        np.asarray(out_lat["logits"]), np.asarray(out_rows["logits"]),
        rtol=1e-6, atol=1e-6,
    )


def test_train_step_gather_sharded_matches(rng, cpu_devices):
    """Gather path under a (dp=2, label=4) mesh == unsharded materialized."""
    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.parallel.mesh import (
        MeshSpec, make_mesh, replicated, shardings_for_batch,
    )
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state, make_train_step

    PI = ProteInferConfig(output_channels=32, kernel_size=5, num_resnet_blocks=2,
                          num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2)
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3,
                         "CLIP_VALUE": 1.0})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    loss_fn = get_loss_fn({"LOSS_FN": "FocalLoss", "FOCAL_LOSS_GAMMA": 2,
                           "FOCAL_LOSS_ALPHA": -1})
    step = make_train_step(PI, PN, loss_fn, tx, donate=False)

    B, T, L, M, D = 8, 32, 16, 40, 16
    matrix = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, M, (L,)).astype(np.int32))
    batch = {
        "aa_ids": jnp.asarray(rng.integers(0, 20, (B, T)).astype(np.int8)),
        "lengths": jnp.asarray(rng.integers(8, T, (B,)).astype(np.int32)),
        "example_mask": jnp.ones((B,), jnp.float32),
        "label_multihots": jnp.asarray((rng.random((B, L)) < 0.3).astype(np.float32)),
    }
    key = jax.random.PRNGKey(2)
    _, m_ref = step(ts, {**batch, "label_embeddings": matrix[rows]}, key)

    mesh = make_mesh(MeshSpec(dp=2, label=4))
    sh = shardings_for_batch(mesh)
    sharded = {
        k: jax.device_put(v, sh[k]) for k, v in batch.items()
    }
    sharded["label_rows"] = jax.device_put(rows, sh["label_rows"])
    sharded["label_matrix"] = jax.device_put(matrix, sh["label_matrix"])
    _, m_sh = step(jax.device_put(ts, replicated(mesh)), sharded, key)
    assert abs(float(m_ref["loss"]) - float(m_sh["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(m_ref["tp"]), np.asarray(m_sh["tp"]))


def test_prefetch_batcher_matches(rng):
    ds = build_dataset(rng, dataset_type="train",
                       label_augmentation_descriptions=("name", "label"))
    kw = dict(batch_size=4, buckets=(64,), seed=3, shuffle=True,
              device_label_gather=True)
    plain = list(BucketBatcher(ds, **kw))
    pre = list(PrefetchBatcher(BucketBatcher(ds, **kw), prefetch=2))
    assert len(plain) == len(pre)
    for a, b in zip(plain, pre):
        np.testing.assert_array_equal(a.aa_ids, b.aa_ids)
        np.testing.assert_array_equal(a.label_rows, b.label_rows)
        np.testing.assert_array_equal(a.label_multihots, b.label_multihots)


def test_prefetch_batcher_early_stop(rng):
    """Abandoning iteration mid-epoch must not deadlock the producer."""
    ds = build_dataset(rng, n_seqs=20)
    pre = PrefetchBatcher(BucketBatcher(ds, 2, buckets=(64,)), prefetch=1)
    it = iter(pre)
    next(it)
    it.close()  # generator close -> stop event; thread drains and exits


def test_trainer_uses_resident_matrix(rng):
    """Trainer eval over a gather-mode batcher runs and matches the
    materialized-path metrics."""
    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
    from protnote_tpu.train.losses import get_loss_fn
    from protnote_tpu.train.optim import make_optimizer
    from protnote_tpu.train.step import init_train_state
    from protnote_tpu.train.trainer import Trainer, TrainerConfig

    ds = build_dataset(rng, inference_descriptions_per_label=1)
    PI = ProteInferConfig(input_channels=max(20, len(ds.amino_acid_vocabulary)),
                          output_channels=32, kernel_size=5, num_resnet_blocks=2,
                          num_labels=8)
    PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16,
                        latent_dim=16, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2,
                        label_tile=8)
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    trainer = Trainer(ts, PI, PN, loss_fn, tx, TrainerConfig(decision_threshold=0.5))

    kw = dict(batch_size=4, buckets=(64,))
    m_gather = trainer.evaluate(BucketBatcher(ds, device_label_gather=True, **kw))
    m_mat = trainer.evaluate(BucketBatcher(ds, **kw))
    for k in ("f1_micro", "map_micro", "loss"):
        assert m_gather["metrics"][k] == pytest.approx(m_mat["metrics"][k], abs=1e-6)


def test_bucket_overflow_modes(rng):
    """Sequences longer than the largest bucket: warn (default) truncates,
    'error' raises (regression for silent truncation, r1 weak list)."""
    import pytest as _pytest

    ds = build_dataset(rng, n_seqs=6)
    # longest sequence is 20+5=25; force a tiny bucket
    b = next(iter(BucketBatcher(ds, 2, buckets=(16,))))
    assert b.aa_ids.shape[1] == 16
    assert (b.lengths <= 16).all()
    with _pytest.raises(ValueError, match="exceeds the largest bucket"):
        next(iter(BucketBatcher(ds, 2, buckets=(16,), on_bucket_overflow="error")))
