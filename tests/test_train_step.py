"""Train/eval step: loss decreases, BN state updates, sharded == replicated."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
from protnote_tpu.parallel.mesh import MeshSpec, make_mesh, replicated, shardings_for_batch
from protnote_tpu.train.losses import get_loss_fn
from protnote_tpu.train.optim import make_optimizer
from protnote_tpu.train.step import init_train_state, make_eval_step, make_train_step

PI = ProteInferConfig(output_channels=32, kernel_size=5, num_resnet_blocks=2,
                      bottleneck_factor=0.5, num_labels=8)
PN = ProtNoteConfig(protein_embedding_dim=32, label_embedding_dim=16, latent_dim=16,
                    projection_head_num_layers=2, projection_head_hidden_dim_scale_factor=2,
                    output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2,
                    label_tile=8)
B, T, L, D = 8, 64, 16, 16


def make_batch(rng):
    return {
        "aa_ids": jnp.asarray(rng.integers(0, 20, (B, T)).astype(np.int8)),
        "lengths": jnp.asarray(rng.integers(10, T, (B,)).astype(np.int32)),
        "example_mask": jnp.ones((B,), jnp.float32),
        "label_embeddings": jnp.asarray(rng.normal(size=(L, D)).astype(np.float32)),
        "label_multihots": jnp.asarray((rng.random((B, L)) < 0.3).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def setup():
    pi_params, pi_state = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn_params, pn_state = init_protnote(jax.random.PRNGKey(1), PN)
    params_cfg = {"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3, "CLIP_VALUE": 1.0}
    tx = make_optimizer(params_cfg)
    ts = init_train_state(pn_params, pn_state, pi_params, pi_state, tx)
    loss_fn = get_loss_fn({"LOSS_FN": "FocalLoss", "FOCAL_LOSS_GAMMA": 2,
                           "FOCAL_LOSS_ALPHA": -1})
    return ts, tx, loss_fn


def test_loss_decreases(setup, rng):
    ts, tx, loss_fn = setup
    step = make_train_step(PI, PN, loss_fn, tx, donate=False)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        ts, metrics = step(ts, batch, key)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert float(metrics["grad_norm"]) > 0
    assert int(ts["step"]) == 12


def test_bn_state_updates_and_encoder_frozen(setup, rng):
    ts, tx, loss_fn = setup
    step = make_train_step(PI, PN, loss_fn, tx, donate=False)
    batch = make_batch(rng)
    ts2, _ = step(ts, batch, jax.random.PRNGKey(0))
    # projection-head BN state moved
    assert not np.allclose(
        np.asarray(ts["model_state"]["W_p"]["bns"][0]["mean"]),
        np.asarray(ts2["model_state"]["W_p"]["bns"][0]["mean"]),
    )
    # frozen encoder params and state untouched
    assert np.array_equal(
        np.asarray(ts["enc_params"]["conv1"]["kernel"]),
        np.asarray(ts2["enc_params"]["conv1"]["kernel"]),
    )
    assert np.array_equal(
        np.asarray(ts["enc_state"]["blocks"][0]["bn1"]["mean"]),
        np.asarray(ts2["enc_state"]["blocks"][0]["bn1"]["mean"]),
    )


def test_eval_step(setup, rng):
    ts, tx, loss_fn = setup
    ev = make_eval_step(PI, PN, loss_fn)
    batch = make_batch(rng)
    out = ev(ts, batch)
    assert out["logits"].shape == (B, L)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert np.isfinite(float(out["loss"]))


def test_sharded_matches_replicated(setup, rng):
    """dp x label sharded step == single-device step (the DDP+label-partition
    correctness check from SURVEY.md §4)."""
    ts, tx, loss_fn = setup
    step = make_train_step(PI, PN, loss_fn, tx, donate=False)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(3)

    ts_ref, m_ref = step(ts, batch, key)

    mesh = make_mesh(MeshSpec(dp=4, label=2))
    sh = shardings_for_batch(mesh)
    ts_sharded = jax.device_put(ts, replicated(mesh))
    batch_sharded = {
        k: jax.device_put(v, sh[k]) for k, v in batch.items()
    }
    ts_out, m_out = step(ts_sharded, batch_sharded, key)

    assert abs(float(m_ref["loss"]) - float(m_out["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(m_ref["tp"]), np.asarray(m_out["tp"]))
    a = np.asarray(ts_ref["trainable"]["protnote"]["W_p"]["layers"][0]["kernel"])
    b = np.asarray(ts_out["trainable"]["protnote"]["W_p"]["layers"][0]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_label_padding_mask_equivalence(setup, rng):
    """Padding the label axis (for mesh divisibility) with masked slots must
    not change loss or gradients vs the unpadded batch."""
    ts, tx, loss_fn = setup
    step = make_train_step(PI, PN, loss_fn, tx, donate=False)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(1)
    ts_ref, m_ref = step(ts, batch, key)

    pad = 8
    padded = dict(batch)
    padded["label_embeddings"] = jnp.pad(batch["label_embeddings"], ((0, pad), (0, 0)))
    padded["label_multihots"] = jnp.pad(batch["label_multihots"], ((0, 0), (0, pad)))
    padded["label_mask"] = jnp.concatenate(
        [jnp.ones(L, jnp.float32), jnp.zeros(pad, jnp.float32)]
    )
    ts_pad, m_pad = step(ts, padded, key)
    assert abs(float(m_ref["loss"]) - float(m_pad["loss"])) < 1e-5
    a = np.asarray(ts_ref["trainable"]["protnote"]["W_p"]["layers"][0]["kernel"])
    b = np.asarray(ts_pad["trainable"]["protnote"]["W_p"]["layers"][0]["kernel"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
    # padded label columns accumulate no confusion counts
    assert np.asarray(m_pad["tp"])[L:].sum() == 0
    assert np.asarray(m_pad["fp"])[L:].sum() == 0

    # sharded over (dp=2, label=4) with the padded batch
    mesh = make_mesh(MeshSpec(dp=2, label=4))
    sh = shardings_for_batch(mesh)
    ts_sh = jax.device_put(ts, replicated(mesh))
    batch_sh = {k: jax.device_put(v, sh[k]) for k, v in padded.items()}
    _, m_sh = step(ts_sh, batch_sh, key)
    assert abs(float(m_ref["loss"]) - float(m_sh["loss"])) < 1e-5


def test_batcher_label_padding(rng):
    """BucketBatcher pads the label axis to the requested multiple."""
    import tempfile

    from protnote_tpu.data.batching import BucketBatcher
    from protnote_tpu.data.dataset import DatasetConfig, ProteinDataset
    from protnote_tpu.data.fasta import save_to_fasta
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    tmp = tempfile.mkdtemp()
    labels = [f"GO:{i:07d}" for i in range(10)]
    recs = []
    for i in range(6):
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), 30))
        recs.append((seq, f"S{i}", [labels[i % 10]]))
    save_to_fasta(recs, f"{tmp}/x.fasta")
    enc = HashLabelEncoder(dim=16)
    ids, dts, txts = [], [], []
    for g in labels:
        for dt in ("name", "label"):
            ids.append(g), dts.append(dt), txts.append(f"{dt} {g}")
    emb = enc.embed(txts)
    LabelEmbeddingCache.save(f"{tmp}/c.npz", emb, ids, dts, txts, enc.token_counts(txts))
    cache = LabelEmbeddingCache.load(f"{tmp}/c.npz")
    ds = ProteinDataset(
        f"{tmp}/x.fasta",
        DatasetConfig(dataset_type="test", inference_descriptions_per_label=2),
        label_embedding_cache=cache,
    )
    # vocab comes from the data itself: 6 distinct labels -> padded to 8
    b = next(iter(BucketBatcher(ds, 4, buckets=(64,), label_pad_multiple=8,
                                descriptions_per_label=2)))
    assert b.label_multihots.shape[1] == 8
    assert b.label_embeddings.shape[0] == 16      # 8 label slots x k=2
    assert b.label_mask.sum() == 6


def test_checkpoint_roundtrip(setup, rng, tmp_path):
    from protnote_tpu.core.checkpoint import restore_checkpoint, save_checkpoint

    ts, tx, loss_fn = setup
    step = make_train_step(PI, PN, loss_fn, tx, donate=False)
    batch = make_batch(rng)
    ts2, _ = step(ts, batch, jax.random.PRNGKey(0))

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, ts2, epoch=3, best_val_metric=0.5)
    restored, meta = restore_checkpoint(path, ts)
    assert meta["epoch"] == 3 and meta["best_val_metric"] == 0.5

    ev = make_eval_step(PI, PN)
    out1 = ev(ts2, batch)
    out2 = ev(restored, batch)
    np.testing.assert_allclose(np.asarray(out1["logits"]), np.asarray(out2["logits"]),
                               rtol=1e-6, atol=1e-6)

    # resumed training continues identically
    a, _ = step(ts2, batch, jax.random.PRNGKey(9))
    b, _ = step(restored, batch, jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        np.asarray(a["trainable"]["protnote"]["output_mlp"]["out"]["kernel"]),
        np.asarray(b["trainable"]["protnote"]["output_mlp"]["out"]["kernel"]),
        rtol=1e-6, atol=1e-6,
    )


def test_sharded_streamed_matches_replicated(setup, rng):
    """The streamed exact-BN scorer (TRAIN_STREAMING_LABEL_TILE) under a
    dp-sharded mesh == single-device — the beyond-HBM path must shard over
    the batch axis like the dense path (the label axis stays local to the
    tile scan)."""
    import dataclasses

    ts, tx, loss_fn = setup
    pn_stream = dataclasses.replace(PN, train_label_tile=8, train_streaming_cache=True)
    step = make_train_step(PI, pn_stream, loss_fn, tx, donate=False)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(3)

    ts_ref, m_ref = step(ts, batch, key)

    mesh = make_mesh(MeshSpec(dp=8, label=1))
    sh = shardings_for_batch(mesh)
    ts_sharded = jax.device_put(ts, replicated(mesh))
    batch_sharded = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
    ts_out, m_out = step(ts_sharded, batch_sharded, key)

    assert abs(float(m_ref["loss"]) - float(m_out["loss"])) < 1e-5
    a = np.asarray(ts_ref["trainable"]["protnote"]["W_p"]["layers"][0]["kernel"])
    b = np.asarray(ts_out["trainable"]["protnote"]["W_p"]["layers"][0]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_bf16_adam_moments():
    """OPTIMIZER_MOMENT_DTYPE=bfloat16 stores Adam's first moment in bf16
    and trains to a loss close to the f32-moment run."""
    import jax.numpy as jnp
    import optax

    from protnote_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones((8, 4)), "b": jnp.zeros((4,))}
    tx16 = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-2,
                           "OPTIMIZER_MOMENT_DTYPE": "bfloat16"})
    tx32 = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-2})
    s16, s32 = tx16.init(params), tx32.init(params)
    mu_leaf = jax.tree_util.tree_leaves(
        [x for x in jax.tree_util.tree_leaves(s16)
         if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    )
    assert mu_leaf, "bf16 moments not present in optimizer state"

    grads = {"w": jnp.full((8, 4), 0.1), "b": jnp.full((4,), -0.2)}
    p16, p32 = params, params
    for _ in range(5):
        u16, s16 = tx16.update(grads, s16, p16)
        p16 = optax.apply_updates(p16, u16)
        u32, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, u32)
    for a, b in zip(jax.tree_util.tree_leaves(p16),
                    jax.tree_util.tree_leaves(p32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3)
