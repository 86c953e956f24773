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
