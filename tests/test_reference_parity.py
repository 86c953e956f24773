"""Bit-parity against the reference's OWN torch modules.

Round-2 verdict item 1: every golden test previously reconstructed the torch
oracle by hand; a hand-built oracle can share the builder's misreading.  Here
the oracles are the actual ``/root/reference/protnote`` modules (imported via
tests/reference_oracle.py with inert stubs for missing deps), with random
weights transplanted through ``protnote_tpu.models.convert`` — which
simultaneously validates the checkpoint converter against real reference
state_dict layouts.

Covered (per the verdict's checklist):
(a) ProteInfer encoder incl. padded/edge-length sequences
    (protein_encoders.py:23-118), eval and train-mode BN statistics;
(b) every fusion variant — concatenation / concatenation_diff /
    concatenation_prod / similarity, pooling "all" + additive attention,
    noising formula, K-description ensembling (ProtNote.py:112-334), with
    and without output-MLP BatchNorm, output-neuron bias, and the 1-layer
    projection-head edge case;
(c) the full loss zoo (losses.py);
(d) train-mode BN statistics after one step, for all three training
    pair-scorer paths (dense / decomposed / streamed).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import load_reference_modules, randomize_bn_running_stats

from protnote_tpu.models.convert import (
    proteinfer_from_torch_state_dict,
    protnote_from_torch_state_dict,
)
from protnote_tpu.models.fusion import (
    ProtNoteConfig,
    compute_label_latents,
    noise_label_embeddings,
    protnote_forward,
)
from protnote_tpu.models.proteinfer import ProteInferConfig, proteinfer_embed, proteinfer_forward

pe_mod, pn_mod, ref_losses = load_reference_modules()

# true-f32 GEMMs everywhere since gemm_precision (r4): module transplants
# now agree to ~1e-6; 1e-5 catches any future precision regression
TOL = dict(rtol=1e-5, atol=1e-5)


# ----------------------------------------------------------------------
# helpers


def _t2n(t):
    return t.detach().cpu().numpy()


def _small_proteinfer(seed=0, num_labels=13, out_ch=64, blocks=3):
    torch.manual_seed(seed)
    model = pe_mod.ProteInfer(
        num_labels=num_labels,
        input_channels=20,
        output_channels=out_ch,
        kernel_size=9,
        activation=torch.nn.ReLU,
        dilation_base=3,
        num_resnet_blocks=blocks,
        bottleneck_factor=0.5,
    )
    randomize_bn_running_stats(model, seed=seed + 1)
    cfg = ProteInferConfig(
        input_channels=20,
        output_channels=out_ch,
        kernel_size=9,
        dilation_base=3,
        num_resnet_blocks=blocks,
        bottleneck_factor=0.5,
        num_labels=num_labels,
    )
    params, state = proteinfer_from_torch_state_dict(model.state_dict(), cfg)
    return model, cfg, params, state


def _proteinfer_inputs(seed=0, B=3, T=30):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, 20, T)).astype(np.float32)
    lengths = np.array([T, 1, T // 2][:B], dtype=np.int64)
    # zero out padding on the input as the collator would
    for i, ln in enumerate(lengths):
        x[i, :, ln:] = 0.0
    return x, lengths


def _small_protnote(seed=0, **kwargs):
    """Build the reference ProtNote and the transplanted JAX twin."""
    defaults = dict(
        protein_embedding_dim=48,
        label_embedding_dim=40,
        latent_dim=32,
        projection_head_num_layers=4,
        projection_head_hidden_dim_scale_factor=3,
        output_mlp_num_layers=3,
        output_mlp_hidden_dim_scale_factor=3,
        outout_mlp_add_batchnorm=True,
        output_neuron_bias=None,
        feature_fusion="concatenation",
        inference_descriptions_per_label=1,
        label_embedding_pooling_method="mean",
        temperature=0.07,
    )
    defaults.update(kwargs)
    torch.manual_seed(seed)
    model = pn_mod.ProtNote(**defaults)
    randomize_bn_running_stats(model, seed=seed + 1)
    cfg = ProtNoteConfig(
        protein_embedding_dim=defaults["protein_embedding_dim"],
        label_embedding_dim=defaults["label_embedding_dim"],
        latent_dim=defaults["latent_dim"],
        projection_head_num_layers=defaults["projection_head_num_layers"],
        projection_head_hidden_dim_scale_factor=defaults[
            "projection_head_hidden_dim_scale_factor"
        ],
        output_mlp_num_layers=defaults["output_mlp_num_layers"],
        output_mlp_hidden_dim_scale_factor=defaults["output_mlp_hidden_dim_scale_factor"],
        output_mlp_batchnorm=defaults["outout_mlp_add_batchnorm"],
        output_neuron_bias=defaults["output_neuron_bias"],
        feature_fusion=defaults["feature_fusion"],
        temperature=defaults["temperature"],
        label_embedding_pooling_method=defaults["label_embedding_pooling_method"],
        inference_descriptions_per_label=defaults["inference_descriptions_per_label"],
    )
    params, state, _ = protnote_from_torch_state_dict(model.state_dict(), cfg)
    return model, cfg, params, state


def _fusion_inputs(seed=0, B=3, L=5, pdim=48, ldim=40):
    rng = np.random.default_rng(seed)
    P = rng.normal(size=(B, pdim)).astype(np.float32)
    Lf = rng.normal(size=(L, ldim)).astype(np.float32)
    return P, Lf


def _bn_states_close(mine, expected, path=""):
    """Recursively compare BN running-stat pytrees."""
    if isinstance(mine, dict):
        for k in mine:
            _bn_states_close(mine[k], expected[k], f"{path}/{k}")
    elif isinstance(mine, (list, tuple)):
        for i, (a, b) in enumerate(zip(mine, expected)):
            _bn_states_close(a, b, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(
            np.asarray(mine), np.asarray(expected), rtol=1e-5, atol=1e-5,
            err_msg=f"BN state mismatch at {path}",
        )


# ----------------------------------------------------------------------
# (a) ProteInfer encoder


def test_proteinfer_eval_parity():
    model, cfg, params, state = _small_proteinfer()
    model.eval()
    x, lengths = _proteinfer_inputs()
    with torch.no_grad():
        ref_emb = _t2n(model.get_embeddings(torch.from_numpy(x), torch.from_numpy(lengths)))
        ref_logits = _t2n(model(torch.from_numpy(x), torch.from_numpy(lengths)))
    # mine: NWC layout
    emb, _ = proteinfer_embed(
        params, state, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(lengths), cfg
    )
    logits, _ = proteinfer_forward(
        params, state, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(lengths), cfg
    )
    np.testing.assert_allclose(np.asarray(emb), ref_emb, **TOL)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, **TOL)


def test_proteinfer_eval_parity_extreme_lengths():
    """All-padding-but-one and full-length rows exercise masked-conv edges."""
    model, cfg, params, state = _small_proteinfer(seed=7)
    model.eval()
    rng = np.random.default_rng(3)
    T = 40
    x = rng.normal(size=(4, 20, T)).astype(np.float32)
    lengths = np.array([T, 1, 2, T - 1], dtype=np.int64)
    for i, ln in enumerate(lengths):
        x[i, :, ln:] = 0.0
    with torch.no_grad():
        ref = _t2n(model.get_embeddings(torch.from_numpy(x), torch.from_numpy(lengths)))
    emb, _ = proteinfer_embed(
        params, state, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(lengths), cfg
    )
    np.testing.assert_allclose(np.asarray(emb), ref, **TOL)


def test_proteinfer_train_bn_parity():
    """One train-mode forward: logits AND updated BN running stats match."""
    model, cfg, params, state = _small_proteinfer(seed=11)
    model.train()
    x, lengths = _proteinfer_inputs(seed=5, B=3, T=24)
    ref_emb = _t2n(model.get_embeddings(torch.from_numpy(x), torch.from_numpy(lengths)))
    # reconvert AFTER the train step: running stats were updated in place
    _, expected_state = proteinfer_from_torch_state_dict(model.state_dict(), cfg)
    emb, new_state = proteinfer_embed(
        params, state, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(lengths), cfg,
        train=True,
    )
    np.testing.assert_allclose(np.asarray(emb), ref_emb, **TOL)
    _bn_states_close(new_state, expected_state)


# ----------------------------------------------------------------------
# (b) fusion variants, eval


@pytest.mark.parametrize(
    "fusion", ["concatenation", "concatenation_diff", "concatenation_prod", "similarity"]
)
def test_fusion_eval_parity(fusion):
    model, cfg, params, state = _small_protnote(feature_fusion=fusion)
    model.eval()
    P, Lf = _fusion_inputs()
    with torch.no_grad():
        ref, _ = model(sequence_embeddings=torch.from_numpy(P),
                       label_embeddings=torch.from_numpy(Lf))
    for backend in (["dense", "tiled"] if fusion.startswith("concatenation") else ["auto"]):
        cfg_b = ProtNoteConfig(**{**cfg.__dict__, "pair_backend": backend, "label_tile": 2})
        logits, _ = protnote_forward(params, state, jnp.asarray(P), jnp.asarray(Lf), cfg_b)
        np.testing.assert_allclose(np.asarray(logits), _t2n(ref), **TOL,
                                   err_msg=f"fusion={fusion} backend={backend}")


def test_fusion_eval_no_batchnorm_with_output_bias():
    model, cfg, params, state = _small_protnote(
        outout_mlp_add_batchnorm=False, output_neuron_bias=-2.0
    )
    model.eval()
    P, Lf = _fusion_inputs(seed=2)
    with torch.no_grad():
        ref, _ = model(sequence_embeddings=torch.from_numpy(P),
                       label_embeddings=torch.from_numpy(Lf))
    logits, _ = protnote_forward(params, state, jnp.asarray(P), jnp.asarray(Lf), cfg)
    np.testing.assert_allclose(np.asarray(logits), _t2n(ref), **TOL)
    # the converter must have picked up the filled output bias
    assert np.allclose(float(params["output_mlp"]["out"]["bias"][0]), -2.0)


def test_fusion_single_layer_projection_head():
    """projection_head_num_layers=1 -> bare Linear head (no hidden BN/ReLU)."""
    model, cfg, params, state = _small_protnote(projection_head_num_layers=1)
    model.eval()
    P, Lf = _fusion_inputs(seed=4)
    with torch.no_grad():
        ref, _ = model(sequence_embeddings=torch.from_numpy(P),
                       label_embeddings=torch.from_numpy(Lf))
    logits, _ = protnote_forward(params, state, jnp.asarray(P), jnp.asarray(Lf), cfg)
    np.testing.assert_allclose(np.asarray(logits), _t2n(ref), **TOL)


def test_fusion_attention_pooling_parity():
    """pooling='all': additive attention over label token states
    (ProtNote.py:154-166,266-267)."""
    model, cfg, params, state = _small_protnote(label_embedding_pooling_method="all")
    model.eval()
    rng = np.random.default_rng(9)
    B, L, T, D = 3, 5, 7, 40
    P = rng.normal(size=(B, 48)).astype(np.float32)
    hidden = rng.normal(size=(L, T, D)).astype(np.float32)
    mask = (rng.random((L, T)) > 0.3).astype(np.int64)
    mask[:, 0] = 1  # no all-masked row
    with torch.no_grad():
        ref, _ = model(
            sequence_embeddings=torch.from_numpy(P),
            label_embeddings=torch.from_numpy(hidden),
            tokenized_labels={"attention_mask": torch.from_numpy(mask)},
        )
    logits, _ = protnote_forward(
        params, state, jnp.asarray(P), jnp.asarray(hidden), cfg,
        label_attention_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(logits), _t2n(ref), **TOL)
    # the precomputed-latents fast path must agree too
    latents = compute_label_latents(params, state, jnp.asarray(hidden), cfg,
                                    label_attention_mask=jnp.asarray(mask))
    logits2, _ = protnote_forward(params, state, jnp.asarray(P), None, cfg,
                                  label_latents=latents)
    np.testing.assert_allclose(np.asarray(logits2), _t2n(ref), **TOL)


def test_fusion_ensembling_parity():
    """K=3 descriptions/label: logit-of-mean-sigmoid (ProtNote.py:308-322)."""
    K = 3
    model, cfg, params, state = _small_protnote(inference_descriptions_per_label=K)
    model.eval()
    P, Lf = _fusion_inputs(seed=6, L=6 * K)
    with torch.no_grad():
        ref, _ = model(sequence_embeddings=torch.from_numpy(P),
                       label_embeddings=torch.from_numpy(Lf))
    logits, _ = protnote_forward(params, state, jnp.asarray(P), jnp.asarray(Lf), cfg)
    assert logits.shape == (3, 6)
    np.testing.assert_allclose(np.asarray(logits), _t2n(ref), **TOL)


def test_noising_formula_parity(monkeypatch):
    """Label-embedding noising L_f + (2U-1) * alpha/sqrt(d)
    (ProtNote.py:219-240) given identical noise draws."""
    rng = np.random.default_rng(12)
    Lf = rng.normal(size=(5, 40)).astype(np.float32)
    U = rng.random(size=(5, 40)).astype(np.float32)
    alpha = 17.0
    import math
    # reference lines 227-240, computed directly
    denominator = math.sqrt(Lf.shape[1])
    expected = Lf + (2 * U - 1) * (alpha / denominator)

    class _FixedUniform:
        def __call__(self, key, shape, dtype, lo, hi):
            return jnp.asarray((hi - lo) * U + lo, dtype)

    # substitute the same draws into our implementation (monkeypatch
    # guarantees restoration of the shared jax.random attribute)
    monkeypatch.setattr(jax.random, "uniform", _FixedUniform())
    mine = noise_label_embeddings(jnp.asarray(Lf), alpha, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(mine), expected, rtol=1e-6, atol=1e-6)


# ----------------------------------------------------------------------
# (d) fusion train-mode BN, all three training paths


def _train_cfg(cfg, **over):
    return ProtNoteConfig(**{**cfg.__dict__, **over})


@pytest.mark.parametrize("fusion", ["concatenation", "concatenation_diff", "concatenation_prod"])
@pytest.mark.parametrize("path", ["dense", "decomposed", "streamed"])
def test_fusion_train_bn_parity(fusion, path):
    if path != "dense" and fusion == "concatenation_prod":
        pytest.skip("decomposed/streamed paths cover concat and diff only")
    model, cfg, params, state = _small_protnote(feature_fusion=fusion, seed=21)
    model.train()
    P, Lf = _fusion_inputs(seed=8, B=4, L=6)
    ref, _ = model(sequence_embeddings=torch.from_numpy(P),
                   label_embeddings=torch.from_numpy(Lf))
    _, expected_state, _ = protnote_from_torch_state_dict(model.state_dict(), cfg)

    if path == "dense":
        cfg_t = _train_cfg(cfg, pair_backend="dense")
    elif path == "decomposed":
        cfg_t = _train_cfg(cfg, pair_backend="auto")
    else:
        cfg_t = _train_cfg(cfg, train_label_tile=2)
    logits, new_state = protnote_forward(
        params, state, jnp.asarray(P), jnp.asarray(Lf), cfg_t, train=True,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(logits), _t2n(ref), **TOL,
                               err_msg=f"fusion={fusion} path={path}")
    _bn_states_close(new_state, expected_state)


def test_fusion_train_similarity_parity():
    model, cfg, params, state = _small_protnote(feature_fusion="similarity", seed=23)
    model.train()
    P, Lf = _fusion_inputs(seed=10)
    ref, _ = model(sequence_embeddings=torch.from_numpy(P),
                   label_embeddings=torch.from_numpy(Lf))
    _, expected_state, _ = protnote_from_torch_state_dict(model.state_dict(), cfg)
    logits, new_state = protnote_forward(
        params, state, jnp.asarray(P), jnp.asarray(Lf), cfg, train=True,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(logits), _t2n(ref), **TOL)
    _bn_states_close(new_state, expected_state)


# ----------------------------------------------------------------------
# (c) loss zoo


def _loss_inputs(seed=0, B=4, L=7):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, L)).astype(np.float32) * 2.0
    targets = (rng.random((B, L)) > 0.6).astype(np.float32)
    targets[0, :] = 0.0  # a row with no positives
    return logits, targets


def test_focal_loss_parity():
    from protnote_tpu.train.losses import focal_loss

    logits, targets = _loss_inputs(1)
    for alpha, gamma, smoothing in [(-1.0, 2.0, 0.0), (0.25, 2.0, 0.0), (0.9, 1.0, 0.1)]:
        ref = ref_losses.FocalLoss(alpha=alpha, gamma=gamma, label_smoothing=smoothing)(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
        mine = focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                          alpha=alpha, gamma=gamma, label_smoothing=smoothing)
        np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)


def test_bce_parity():
    from protnote_tpu.train.losses import bce_with_logits

    logits, targets = _loss_inputs(2)
    ref = torch.nn.BCEWithLogitsLoss(reduction="mean")(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    mine = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)

    pw = np.abs(np.random.default_rng(3).normal(size=(7,))).astype(np.float32) + 0.5
    ref = torch.nn.BCEWithLogitsLoss(reduction="mean", pos_weight=torch.from_numpy(pw))(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    mine = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                           pos_weight=jnp.asarray(pw))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)


def test_weighted_bce_parity():
    from protnote_tpu.train.losses import weighted_bce

    logits, targets = _loss_inputs(4)
    w = np.abs(np.random.default_rng(5).normal(size=(7,))).astype(np.float32)
    ref = ref_losses.WeightedBCE(label_weights=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    mine = weighted_bce(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)


def test_cb_loss_parity():
    from protnote_tpu.train.losses import cb_loss

    logits, targets = _loss_inputs(6)
    counts = np.array([3.0, 0.0, 11.0, 1.0, 7.0, 2.0, 40.0], dtype=np.float32)
    ref = ref_losses.CBLoss(label_weights=torch.from_numpy(counts))(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    mine = cb_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(counts))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)


def test_batch_weighted_bce_parity():
    from protnote_tpu.train.losses import batch_weighted_bce

    logits, targets = _loss_inputs(7)
    ref = ref_losses.BatchWeightedBCE()(torch.from_numpy(logits), torch.from_numpy(targets))
    mine = batch_weighted_bce(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)


def test_batch_label_weighted_bce_parity():
    from protnote_tpu.train.losses import batch_label_weighted_bce

    logits, targets = _loss_inputs(8)
    ref = ref_losses.BatchLabelWeightedBCE()(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    mine = batch_label_weighted_bce(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)


def test_rgd_bce_parity():
    """The reference passes legacy ``reduce="none"`` which resolves to
    reduction='mean' — the reweighting uses the scalar mean BCE."""
    from protnote_tpu.train.losses import rgd_bce

    logits, targets = _loss_inputs(9)
    for temp in (1.0, 2.0, 5.0):
        ref = ref_losses.RGDBCE(temperature=temp)(
            torch.from_numpy(logits), torch.from_numpy(targets)
        )
        mine = rgd_bce(jnp.asarray(logits), jnp.asarray(targets), temperature=temp)
        np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)


def test_supcon_parity():
    from protnote_tpu.train.losses import supcon_loss

    logits, targets = _loss_inputs(10)
    targets[0, 1] = 1.0  # SupCon divides by per-row positive count
    ref = ref_losses.SupCon(temperature=0.07)(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    mine = supcon_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5, atol=1e-6)
