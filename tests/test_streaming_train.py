"""Streamed exact-BN pair training == dense materialised training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
from protnote_tpu.ops.pair_scorer import pair_logits_dense
from protnote_tpu.ops.streaming_train import pair_logits_streaming_train

CFG = ProtNoteConfig(
    protein_embedding_dim=20, label_embedding_dim=20, latent_dim=12,
    projection_head_num_layers=2, output_mlp_num_layers=3,
    output_mlp_hidden_dim_scale_factor=2,
)
B, L, D = 5, 21, 12


@pytest.fixture(scope="module")
def setup():
    params, state = init_protnote(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    P_e = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    L_e = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32))
    em = jnp.asarray(np.array([1, 1, 1, 1, 0], np.float32))
    lm = jnp.asarray((np.arange(L) < 18).astype(np.float32))
    return params, state, P_e, L_e, em, lm


@pytest.mark.parametrize("cache_first", [False, True])
@pytest.mark.parametrize("fusion", ["concatenation", "concatenation_diff"])
def test_streaming_matches_dense(setup, fusion, cache_first):
    params, state, P_e, L_e, em, lm = setup
    if fusion == "concatenation_diff":
        import dataclasses

        cfg2 = dataclasses.replace(CFG, feature_fusion=fusion)
        params, state = init_protnote(jax.random.PRNGKey(3), cfg2)
    p, s = params["output_mlp"], state["output_mlp"]

    pair_mask = em[:, None] * lm[None, :]
    dense_logits, dense_s = pair_logits_dense(
        p, s, P_e, L_e, fusion, train=True, pair_mask=pair_mask
    )
    stream_logits, stream_s = pair_logits_streaming_train(
        p, s, P_e, L_e, fusion, example_mask=em, label_mask=lm,
        label_tile=8, compute_dtype=jnp.float32, cache_first=cache_first,
    )
    valid = np.asarray(pair_mask) > 0
    np.testing.assert_allclose(
        np.asarray(stream_logits)[valid], np.asarray(dense_logits)[valid],
        rtol=2e-4, atol=2e-4,
    )
    for i in range(len(s["bns"])):
        np.testing.assert_allclose(
            np.asarray(stream_s["bns"][i]["mean"]),
            np.asarray(dense_s["bns"][i]["mean"]), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(stream_s["bns"][i]["var"]),
            np.asarray(dense_s["bns"][i]["var"]), rtol=2e-3, atol=2e-4,
        )


@pytest.mark.parametrize("cache_first", [False, True])
def test_streaming_gradients_match_dense(setup, cache_first):
    params, state, P_e, L_e, em, lm = setup
    p, s = params["output_mlp"], state["output_mlp"]
    pair_mask = em[:, None] * lm[None, :]

    def loss_dense(p_):
        lg, _ = pair_logits_dense(p_, s, P_e, L_e, "concatenation", train=True,
                                  pair_mask=pair_mask)
        return jnp.sum((jax.nn.sigmoid(lg) * pair_mask) ** 2)

    def loss_stream(p_):
        lg, _ = pair_logits_streaming_train(
            p_, s, P_e, L_e, "concatenation", example_mask=em, label_mask=lm,
            label_tile=8, compute_dtype=jnp.float32, cache_first=cache_first,
        )
        return jnp.sum((jax.nn.sigmoid(lg) * pair_mask) ** 2)

    from jax.flatten_util import ravel_pytree

    g1 = jax.grad(loss_dense)(p)
    g2 = jax.grad(loss_stream)(p)
    flat1, _ = ravel_pytree(g1)
    flat2, _ = ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(flat2), np.asarray(flat1),
                               rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("fusion", ["concatenation", "concatenation_diff"])
@pytest.mark.parametrize("remat", [False, True])
def test_decomposed_matches_dense(setup, fusion, remat):
    """The default training path (decomposed first layer + analytic BN1)
    computes the same function as the materialised dense path."""
    from protnote_tpu.ops.streaming_train import pair_logits_dense_decomposed

    params, state, P_e, L_e, em, lm = setup
    if fusion == "concatenation_diff":
        import dataclasses

        cfg2 = dataclasses.replace(CFG, feature_fusion=fusion)
        params, state = init_protnote(jax.random.PRNGKey(3), cfg2)
    p, s = params["output_mlp"], state["output_mlp"]

    pair_mask = em[:, None] * lm[None, :]
    dense_logits, dense_s = pair_logits_dense(
        p, s, P_e, L_e, fusion, train=True, pair_mask=pair_mask
    )
    dec_logits, dec_s = pair_logits_dense_decomposed(
        p, s, P_e, L_e, fusion, example_mask=em, label_mask=lm,
        compute_dtype=jnp.float32, remat=remat,
    )
    valid = np.asarray(pair_mask) > 0
    np.testing.assert_allclose(
        np.asarray(dec_logits)[valid], np.asarray(dense_logits)[valid],
        rtol=2e-4, atol=2e-4,
    )
    for i in range(len(s["bns"])):
        np.testing.assert_allclose(
            np.asarray(dec_s["bns"][i]["mean"]),
            np.asarray(dense_s["bns"][i]["mean"]), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(dec_s["bns"][i]["var"]),
            np.asarray(dense_s["bns"][i]["var"]), rtol=2e-3, atol=2e-4,
        )


def test_decomposed_gradients_match_dense(setup):
    from jax.flatten_util import ravel_pytree

    from protnote_tpu.ops.streaming_train import pair_logits_dense_decomposed

    params, state, P_e, L_e, em, lm = setup
    p, s = params["output_mlp"], state["output_mlp"]
    pair_mask = em[:, None] * lm[None, :]

    def loss_dense(p_, P_, L_):
        lg, _ = pair_logits_dense(p_, s, P_, L_, "concatenation", train=True,
                                  pair_mask=pair_mask)
        return jnp.sum((jax.nn.sigmoid(lg) * pair_mask) ** 2)

    def loss_dec(p_, P_, L_):
        lg, _ = pair_logits_dense_decomposed(
            p_, s, P_, L_, "concatenation", example_mask=em, label_mask=lm,
            compute_dtype=jnp.float32,
        )
        return jnp.sum((jax.nn.sigmoid(lg) * pair_mask) ** 2)

    # gradients w.r.t. params AND both embedding sides (the projection heads
    # train through this path)
    g1 = jax.grad(loss_dense, argnums=(0, 1, 2))(p, P_e, L_e)
    g2 = jax.grad(loss_dec, argnums=(0, 1, 2))(p, P_e, L_e)
    flat1, _ = ravel_pytree(g1)
    flat2, _ = ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(flat2), np.asarray(flat1),
                               rtol=5e-3, atol=5e-4)


def test_decomposed_via_protnote_forward(setup):
    """protnote_forward's default train path (decomposed) == forced dense."""
    import dataclasses

    from protnote_tpu.models.fusion import protnote_forward

    params, state, _, _, em, lm = setup
    rng = np.random.default_rng(2)
    P_f = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
    L_f = jnp.asarray(rng.normal(size=(L, 20)).astype(np.float32))
    cfg_dense = dataclasses.replace(CFG, pair_backend="dense")
    lg1, st1 = protnote_forward(params, state, P_f, L_f, cfg_dense, train=True,
                                example_mask=em, label_mask=lm)
    lg2, st2 = protnote_forward(params, state, P_f, L_f, CFG, train=True,
                                example_mask=em, label_mask=lm)
    valid = (np.asarray(em)[:, None] * np.asarray(lm)[None, :]) > 0
    np.testing.assert_allclose(np.asarray(lg2)[valid], np.asarray(lg1)[valid],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st2["output_mlp"]["bns"][1]["var"]),
        np.asarray(st1["output_mlp"]["bns"][1]["var"]), rtol=2e-3, atol=2e-4,
    )


def test_streaming_via_protnote_forward(setup):
    """cfg.train_label_tile routes the training forward through the stream."""
    import dataclasses

    from protnote_tpu.models.fusion import protnote_forward

    params, state, P_e_unused, L_e_unused, em, lm = setup
    rng = np.random.default_rng(1)
    P_f = jnp.asarray(rng.normal(size=(B, 20)).astype(np.float32))
    L_f = jnp.asarray(rng.normal(size=(L, 20)).astype(np.float32))
    cfg_stream = dataclasses.replace(CFG, train_label_tile=8)
    lg1, st1 = protnote_forward(params, state, P_f, L_f, CFG, train=True,
                                example_mask=em, label_mask=lm)
    lg2, st2 = protnote_forward(params, state, P_f, L_f, cfg_stream, train=True,
                                example_mask=em, label_mask=lm)
    valid = (np.asarray(em)[:, None] * np.asarray(lm)[None, :]) > 0
    np.testing.assert_allclose(np.asarray(lg2)[valid], np.asarray(lg1)[valid],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st2["output_mlp"]["bns"][1]["var"]),
        np.asarray(st1["output_mlp"]["bns"][1]["var"]), rtol=2e-3, atol=2e-4,
    )


@pytest.mark.parametrize("n_layers", [1, 2])
def test_streaming_cached_shallow_mlp(setup, n_layers):
    """cache_first with 1-2 MLP layers: the z1 cache feeds the loss pass
    directly (no deeper statistics sweep), or is skipped at depth 1."""
    import dataclasses

    cfg2 = dataclasses.replace(CFG, output_mlp_num_layers=n_layers)
    params, state = init_protnote(jax.random.PRNGKey(5), cfg2)
    _, _, P_e, L_e, em, lm = setup
    p, s = params["output_mlp"], state["output_mlp"]

    pair_mask = em[:, None] * lm[None, :]
    dense_logits, dense_s = pair_logits_dense(
        p, s, P_e, L_e, "concatenation", train=True, pair_mask=pair_mask
    )
    stream_logits, stream_s = pair_logits_streaming_train(
        p, s, P_e, L_e, "concatenation", example_mask=em, label_mask=lm,
        label_tile=8, compute_dtype=jnp.float32, cache_first=True,
    )
    valid = np.asarray(pair_mask) > 0
    np.testing.assert_allclose(
        np.asarray(stream_logits)[valid], np.asarray(dense_logits)[valid],
        rtol=2e-4, atol=2e-4,
    )
    for i in range(len(s["bns"])):
        np.testing.assert_allclose(
            np.asarray(stream_s["bns"][i]["mean"]),
            np.asarray(dense_s["bns"][i]["mean"]), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(stream_s["bns"][i]["var"]),
            np.asarray(dense_s["bns"][i]["var"]), rtol=2e-3, atol=2e-4,
        )

    # gradient parity too: at depth 2 the z1 cotangent flows from the LOSS
    # scan (loss_from_z1=True) back into sweep_a — a distinct VJP route from
    # the depth-3 case where the layer-2 statistics sweep consumes z1
    from jax.flatten_util import ravel_pytree

    def loss_dense(p_):
        lg, _ = pair_logits_dense(p_, s, P_e, L_e, "concatenation",
                                  train=True, pair_mask=pair_mask)
        return jnp.sum((jax.nn.sigmoid(lg) * pair_mask) ** 2)

    def loss_stream(p_):
        lg, _ = pair_logits_streaming_train(
            p_, s, P_e, L_e, "concatenation", example_mask=em, label_mask=lm,
            label_tile=8, compute_dtype=jnp.float32, cache_first=True,
        )
        return jnp.sum((jax.nn.sigmoid(lg) * pair_mask) ** 2)

    flat1, _ = ravel_pytree(jax.grad(loss_dense)(p))
    flat2, _ = ravel_pytree(jax.grad(loss_stream)(p))
    np.testing.assert_allclose(np.asarray(flat2), np.asarray(flat1),
                               rtol=5e-3, atol=5e-4)


def test_shifted_moments_large_mean():
    """The shifted single-pass variance stays accurate where the naive
    E[z^2]-E[z]^2 formulation catastrophically cancels in f32
    (|mean| >> std)."""
    from protnote_tpu.ops.streaming_train import _shifted_moments

    rng = np.random.default_rng(0)
    true_std = 0.1
    true_mean = 2000.0
    z = jnp.asarray((true_mean + true_std * rng.normal(size=(4096, 4))).astype(np.float32))
    rows = jnp.ones((4096, 1), jnp.float32)
    # running mean close to (but not equal to) the batch mean, as in training
    running = jnp.full((4,), true_mean * 1.001, jnp.float32)
    mean, var = _shifted_moments(z, rows, 4096.0, running)
    np.testing.assert_allclose(np.asarray(mean), z.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.var(np.asarray(z), axis=0),
                               rtol=1e-2)
    # the naive formulation loses everything at this scale
    naive = float(jnp.mean(z[:, 0] ** 2) - jnp.mean(z[:, 0]) ** 2)
    assert not np.isclose(naive, true_std ** 2, rtol=0.5)
