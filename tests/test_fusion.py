"""Golden tests for the ProtNote fusion head vs a torch oracle, plus
equivalence of the tiled/folded inference path with the dense path."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import (
    ProtNoteConfig,
    ensemble_logits,
    init_protnote,
    protnote_forward,
)
from protnote_tpu.ops.pair_scorer import (
    fold_output_mlp,
    pair_logits_dense,
    pair_logits_tiled,
)

CFG = ProtNoteConfig(
    protein_embedding_dim=48,
    label_embedding_dim=32,
    latent_dim=24,
    projection_head_num_layers=3,
    projection_head_hidden_dim_scale_factor=2,
    output_mlp_num_layers=3,
    output_mlp_hidden_dim_scale_factor=2,
    label_tile=8,
)


@pytest.fixture(scope="module")
def model():
    params, state = init_protnote(jax.random.PRNGKey(0), CFG)
    # randomize BN running stats
    k = jax.random.PRNGKey(3)

    def rand_bns(s):
        nonlocal k
        out = []
        for bn in s["bns"]:
            k, k1, k2 = jax.random.split(k, 3)
            out.append({
                "mean": jax.random.normal(k1, bn["mean"].shape) * 0.2,
                "var": jax.random.uniform(k2, bn["var"].shape, minval=0.5, maxval=1.5),
            })
        return {"bns": out}

    state = {
        "W_p": rand_bns(state["W_p"]),
        "W_l": rand_bns(state["W_l"]),
        "output_mlp": rand_bns(state["output_mlp"]),
    }
    return params, state


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(1)
    P_f = rng.normal(size=(5, 48)).astype(np.float32)
    L_f = rng.normal(size=(21, 32)).astype(np.float32)
    return P_f, L_f


def torch_mlp_head(params, state, x):
    """torchvision-MLP-style projection head oracle."""
    def t(a):
        return torch.tensor(np.asarray(a))

    h = torch.tensor(x)
    n = len(params["layers"])
    for i, lin in enumerate(params["layers"]):
        h = h @ t(lin["kernel"])
        if i < n - 1:
            bn_p, bn_s = params["bns"][i], state["bns"][i]
            h = F.batch_norm(h, t(bn_s["mean"]), t(bn_s["var"]),
                             t(bn_p["scale"]), t(bn_p["bias"]), False, 0.1, 1e-5)
            h = F.relu(h)
    return h


def torch_output_mlp(params, state, x):
    def t(a):
        return torch.tensor(np.asarray(a))

    h = torch.tensor(x)
    for i, lin in enumerate(params["layers"]):
        h = h @ t(lin["kernel"])
        if "bias" in lin:
            h = h + t(lin["bias"])
        bn_p, bn_s = params["bns"][i], state["bns"][i]
        h = F.batch_norm(h, t(bn_s["mean"]), t(bn_s["var"]),
                         t(bn_p["scale"]), t(bn_p["bias"]), False, 0.1, 1e-5)
        h = F.relu(h)
    out = h @ t(params["out"]["kernel"]) + t(params["out"]["bias"])
    return out[:, 0]


def torch_full_oracle(params, state, P_f, L_f, fusion="concatenation"):
    P_e = torch_mlp_head(params["W_p"], state["W_p"], P_f)
    L_e = torch_mlp_head(params["W_l"], state["W_l"], L_f)
    B, L = P_e.shape[0], L_e.shape[0]
    pe = P_e[:, None, :].expand(B, L, -1)
    le = L_e[None, :, :].expand(B, L, -1)
    parts = [pe, le]
    if fusion == "concatenation_diff":
        parts.append(pe - le)
    elif fusion == "concatenation_prod":
        parts.append(pe * le)
    joint = torch.cat(parts, dim=2).reshape(B * L, -1)
    logits = torch_output_mlp(params["output_mlp"], state["output_mlp"], joint.numpy())
    return logits.reshape(B, L).numpy()


def test_forward_eval_matches_torch(model, inputs):
    params, state = model
    P_f, L_f = inputs
    logits, _ = protnote_forward(params, state, jnp.array(P_f), jnp.array(L_f), CFG)
    ref = torch_full_oracle(params, state, P_f, L_f)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("fusion", ["concatenation", "concatenation_diff", "concatenation_prod"])
def test_tiled_matches_dense(model, inputs, fusion):
    params, state = model
    P_f, L_f = inputs
    cfg = ProtNoteConfig(**{**CFG.__dict__, "feature_fusion": fusion})
    if fusion != "concatenation":
        # re-init output mlp for the 3d joint dim
        params2, state2 = init_protnote(jax.random.PRNGKey(7), cfg)
        params = {**params, "output_mlp": params2["output_mlp"]}
        state = {**state, "output_mlp": state2["output_mlp"]}
    rngk = jax.random.PRNGKey(0)
    P_e = jax.random.normal(rngk, (5, cfg.latent_dim))
    L_e = jax.random.normal(jax.random.PRNGKey(1), (21, cfg.latent_dim))
    dense, _ = pair_logits_dense(params["output_mlp"], state["output_mlp"],
                                 P_e, L_e, fusion, train=False)
    folded = fold_output_mlp(params["output_mlp"], state["output_mlp"], fusion, cfg.latent_dim)
    tiled = pair_logits_tiled(folded, P_e, L_e, label_tile=8, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(tiled), rtol=2e-4, atol=2e-4)


def test_similarity_fusion(model, inputs):
    params, state = model
    P_f, L_f = inputs
    cfg = ProtNoteConfig(**{**CFG.__dict__, "feature_fusion": "similarity"})
    logits, _ = protnote_forward(params, state, jnp.array(P_f), jnp.array(L_f), cfg)
    P_e = torch_mlp_head(params["W_p"], state["W_p"], P_f)
    L_e = torch_mlp_head(params["W_l"], state["W_l"], L_f)
    ref = (F.normalize(P_e, dim=-1) @ F.normalize(L_e, dim=-1).T / 0.07).numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_ensemble_logits():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 12)).astype(np.float32)
    out = np.asarray(ensemble_logits(jnp.array(logits), k=3))
    probs = 1 / (1 + np.exp(-logits))
    ref_p = probs.reshape(3, 4, 3).mean(-1).clip(1e-7, 1 - 1e-7)
    ref = np.log(ref_p) - np.log1p(-ref_p)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_train_mode_bn_over_pairs(model, inputs):
    """Training forward: BN stats over all B*L pairs; state must update and
    logits must match a torch oracle in train mode."""
    params, state = model
    P_f, L_f = inputs
    logits, new_state = protnote_forward(
        params, state, jnp.array(P_f), jnp.array(L_f), CFG,
        train=True, rng=None,
    )
    assert logits.shape == (5, 21)
    b0 = np.asarray(state["output_mlp"]["bns"][0]["mean"])
    b1 = np.asarray(new_state["output_mlp"]["bns"][0]["mean"])
    assert not np.allclose(b0, b1)

    # torch train-mode oracle for the output MLP over the joint matrix
    def t(a):
        return torch.tensor(np.asarray(a))

    # project with eval BN (heads use batch stats in torch train mode too,
    # so compare the pair-MLP piece in isolation with train-mode BN)
    P_e = jax.random.normal(jax.random.PRNGKey(5), (4, CFG.latent_dim))
    L_e = jax.random.normal(jax.random.PRNGKey(6), (9, CFG.latent_dim))
    ours, _ = pair_logits_dense(params["output_mlp"], state["output_mlp"],
                                P_e, L_e, "concatenation", train=True)
    joint = np.concatenate(
        [
            np.repeat(np.asarray(P_e)[:, None, :], 9, 1),
            np.repeat(np.asarray(L_e)[None, :, :], 4, 0),
        ],
        axis=2,
    ).reshape(36, -1)
    h = torch.tensor(joint)
    p, s = params["output_mlp"], state["output_mlp"]
    for i, lin in enumerate(p["layers"]):
        h = h @ t(lin["kernel"])
        rm, rv = t(s["bns"][i]["mean"]).clone(), t(s["bns"][i]["var"]).clone()
        h = F.batch_norm(h, rm, rv, t(p["bns"][i]["scale"]), t(p["bns"][i]["bias"]),
                         True, 0.1, 1e-5)
        h = F.relu(h)
    ref = (h @ t(p["out"]["kernel"]) + t(p["out"]["bias"]))[:, 0].reshape(4, 9)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=5e-4, atol=5e-4)


def test_int8_tiled_close_to_f32():
    """The opt-in int8 inference path approximates the f32 tiled scorer:
    per-row dynamic activation quant + per-channel weight quant keeps
    sigmoid probabilities within ~1e-2."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote, protnote_forward
    from protnote_tpu.ops.pair_scorer import (
        fold_output_mlp, pair_logits_tiled, pair_logits_tiled_int8, quantize_folded,
    )

    cfg = ProtNoteConfig(
        protein_embedding_dim=24, label_embedding_dim=24, latent_dim=16,
        projection_head_num_layers=2, output_mlp_num_layers=3,
        output_mlp_hidden_dim_scale_factor=2, label_tile=8,
    )
    params, state = init_protnote(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    P_e = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    L_e = jnp.asarray(rng.normal(size=(21, 16)).astype(np.float32))

    folded = fold_output_mlp(params["output_mlp"], state["output_mlp"],
                             "concatenation", cfg.latent_dim)
    ref = np.asarray(pair_logits_tiled(folded, P_e, L_e, label_tile=8,
                                       compute_dtype=jnp.float32))
    got = np.asarray(pair_logits_tiled_int8(quantize_folded(folded), P_e, L_e,
                                            label_tile=8,
                                            compute_dtype=jnp.float32))
    p_ref = 1 / (1 + np.exp(-ref))
    p_got = 1 / (1 + np.exp(-got))
    assert np.max(np.abs(p_ref - p_got)) < 1e-2
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999

    # end-to-end through protnote_forward with the config backend
    cfg8 = dataclasses.replace(cfg, pair_backend="tiled_int8")
    rngs = np.random.default_rng(1)
    P_f = jnp.asarray(rngs.normal(size=(6, 24)).astype(np.float32))
    L_f = jnp.asarray(rngs.normal(size=(21, 24)).astype(np.float32))
    lg8, _ = protnote_forward(params, state, P_f, L_f, cfg8, train=False)
    lg, _ = protnote_forward(params, state, P_f, L_f, cfg, train=False)
    assert np.max(np.abs(1 / (1 + np.exp(-np.asarray(lg8)))
                         - 1 / (1 + np.exp(-np.asarray(lg))))) < 2e-2

    # training with the int8 config still uses the exact decomposed path
    em = jnp.ones(6, jnp.float32)
    lm = jnp.ones(21, jnp.float32)
    lg_tr8, st8 = protnote_forward(params, state, P_f, L_f, cfg8, train=True,
                                   example_mask=em, label_mask=lm)
    lg_tr, st = protnote_forward(params, state, P_f, L_f, cfg, train=True,
                                 example_mask=em, label_mask=lm)
    np.testing.assert_allclose(np.asarray(lg_tr8), np.asarray(lg_tr),
                               rtol=1e-5, atol=1e-5)


def test_pair_backend_validated():
    from protnote_tpu.models.fusion import ProtNoteConfig

    with pytest.raises(ValueError, match="PAIR_BACKEND"):
        ProtNoteConfig.from_params({"PAIR_BACKEND": "int8"})
    cfg = ProtNoteConfig.from_params({"PAIR_BACKEND": "tiled_int8"})
    assert cfg.pair_backend == "tiled_int8"


def test_int8_quantize_degenerate_weights():
    """Zero weight columns and zero activation rows survive quantization
    (the 1e-12 scale floors prevent div-by-zero / NaN)."""
    import jax.numpy as jnp

    from protnote_tpu.ops.pair_scorer import (
        FoldedOutputMLP, pair_logits_tiled_int8, quantize_folded,
    )

    H, d = 32, 16  # XLA:CPU int8 dot miscompiles below lane width
    W = jnp.zeros((H, H), jnp.float32).at[:, 0].set(1.0)  # cols 1..7 all-zero
    folded = FoldedOutputMLP(
        w1_p=jnp.zeros((d, H)), w1_l=jnp.zeros((d, H)),  # zero h1 rows too
        b1=jnp.zeros(H), w1_prod=None,
        hidden=[(W, jnp.zeros(H))],
        w_out=jnp.ones(H), b_out=jnp.asarray(0.5),
    )
    q = quantize_folded(folded)
    out = pair_logits_tiled_int8(q, jnp.ones((2, d)), jnp.ones((3, d)),
                                 label_tile=2, compute_dtype=jnp.float32)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_int8_with_label_latents():
    """The pipeline's exact combination: precomputed label latents + int8
    backend matches the bf16 tiled path within quantization tolerance."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from protnote_tpu.models.fusion import (
        ProtNoteConfig, compute_label_latents, init_protnote, protnote_forward,
    )

    cfg = ProtNoteConfig(
        protein_embedding_dim=24, label_embedding_dim=24, latent_dim=16,
        projection_head_num_layers=2, output_mlp_num_layers=3,
        output_mlp_hidden_dim_scale_factor=2, label_tile=8,
    )
    params, state = init_protnote(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    P_f = jnp.asarray(rng.normal(size=(5, 24)).astype(np.float32))
    L_f = jnp.asarray(rng.normal(size=(13, 24)).astype(np.float32))
    latents = compute_label_latents(params, state, L_f, cfg)

    cfg8 = dataclasses.replace(cfg, pair_backend="tiled_int8")
    lg8, _ = protnote_forward(params, state, P_f, None, cfg8, train=False,
                              label_latents=latents)
    lg, _ = protnote_forward(params, state, P_f, None, cfg, train=False,
                             label_latents=latents)
    p8 = 1 / (1 + np.exp(-np.asarray(lg8)))
    p = 1 / (1 + np.exp(-np.asarray(lg)))
    assert lg8.shape == (5, 13)
    assert np.max(np.abs(p8 - p)) < 1e-2


def test_int8_subsampled_scale_large_width():
    """At H>=1024 the int8 path estimates per-row scales from a 1/8 column
    subsample (x1.3 margin); accuracy must hold at the flagship width."""
    import jax
    import jax.numpy as jnp

    from protnote_tpu.ops.pair_scorer import (
        FoldedOutputMLP, pair_logits_tiled, pair_logits_tiled_int8,
        quantize_folded,
    )

    H, d = 3072, 32
    rng = np.random.default_rng(7)
    folded = FoldedOutputMLP(
        w1_p=jnp.asarray(rng.normal(size=(d, H)).astype(np.float32)) * 0.1,
        w1_l=jnp.asarray(rng.normal(size=(d, H)).astype(np.float32)) * 0.1,
        b1=jnp.asarray(rng.normal(size=H).astype(np.float32)) * 0.1,
        w1_prod=None,
        hidden=[
            (jnp.asarray(rng.normal(size=(H, H)).astype(np.float32)) * 0.02,
             jnp.asarray(rng.normal(size=H).astype(np.float32)) * 0.1),
            (jnp.asarray(rng.normal(size=(H, H)).astype(np.float32)) * 0.02,
             jnp.asarray(rng.normal(size=H).astype(np.float32)) * 0.1),
        ],
        w_out=jnp.asarray(rng.normal(size=H).astype(np.float32)) * 0.05,
        b_out=jnp.asarray(0.0),
    )
    P_e = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    L_e = jnp.asarray(rng.normal(size=(6, d)).astype(np.float32))
    ref = np.asarray(pair_logits_tiled(folded, P_e, L_e, label_tile=3,
                                       compute_dtype=jnp.float32))
    got = np.asarray(pair_logits_tiled_int8(quantize_folded(folded), P_e, L_e,
                                            label_tile=3,
                                            compute_dtype=jnp.float32))
    p_ref = 1 / (1 + np.exp(-ref))
    p_got = 1 / (1 + np.exp(-got))
    # the inherent int8 error envelope at H=3072 (~3k-term
    # accumulations): measured 0.0104 max prob deviation
    assert np.max(np.abs(p_ref - p_got)) < 2e-2
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999


def test_int8_concatenation_diff():
    """int8 path with the diff fusion: the diff block folds into the
    per-side first-layer weights before quantization."""
    import jax
    import jax.numpy as jnp

    from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
    from protnote_tpu.ops.pair_scorer import (
        fold_output_mlp, pair_logits_tiled, pair_logits_tiled_int8, quantize_folded,
    )

    cfg = ProtNoteConfig(
        protein_embedding_dim=24, label_embedding_dim=24, latent_dim=16,
        projection_head_num_layers=2, output_mlp_num_layers=3,
        output_mlp_hidden_dim_scale_factor=2, feature_fusion="concatenation_diff",
    )
    params, state = init_protnote(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    P_e = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
    L_e = jnp.asarray(rng.normal(size=(11, 16)).astype(np.float32))
    folded = fold_output_mlp(params["output_mlp"], state["output_mlp"],
                             "concatenation_diff", cfg.latent_dim)
    ref = np.asarray(pair_logits_tiled(folded, P_e, L_e, label_tile=4,
                                       compute_dtype=jnp.float32))
    got = np.asarray(pair_logits_tiled_int8(quantize_folded(folded), P_e, L_e,
                                            label_tile=4,
                                            compute_dtype=jnp.float32))
    p_err = np.max(np.abs(1 / (1 + np.exp(-ref)) - 1 / (1 + np.exp(-got))))
    assert p_err < 1e-2

    # concatenation_prod is rejected (the per-tile product term cannot fold)
    cfg_p = ProtNoteConfig(
        protein_embedding_dim=24, label_embedding_dim=24, latent_dim=16,
        projection_head_num_layers=2, output_mlp_num_layers=2,
        output_mlp_hidden_dim_scale_factor=2, feature_fusion="concatenation_prod",
    )
    params_p, state_p = init_protnote(jax.random.PRNGKey(6), cfg_p)
    folded_p = fold_output_mlp(params_p["output_mlp"], state_p["output_mlp"],
                               "concatenation_prod", cfg_p.latent_dim)
    with pytest.raises(ValueError, match="concatenation_prod"):
        quantize_folded(folded_p)
