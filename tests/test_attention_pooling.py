"""Additive attention over token states (pooling='all') vs torch oracle
(reference ProtNote.additive_attention, ProtNote.py:154-166)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import ProtNoteConfig, additive_attention, init_protnote, protnote_forward


def test_additive_attention_matches_torch(rng):
    L, T, D = 7, 9, 16
    hidden = rng.normal(size=(L, T, D)).astype(np.float32)
    mask = np.ones((L, T), np.int64)
    mask[2, 5:] = 0
    mask[5, 1:] = 0
    w = rng.normal(size=(1, D)).astype(np.float32) * 0.3
    b = rng.normal(size=(1,)).astype(np.float32)

    p = {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}
    ours = np.asarray(additive_attention(p, jnp.asarray(hidden), jnp.asarray(mask)))

    h = torch.tensor(hidden)
    scores = (h @ torch.tensor(w.T) + torch.tensor(b)).squeeze(-1)
    scores = scores.masked_fill(torch.tensor(mask) == 0, float("-inf"))
    attn = torch.softmax(scores, dim=-1)
    ref = torch.bmm(attn.unsqueeze(1), h).squeeze(1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_forward_with_all_pooling(rng):
    cfg = ProtNoteConfig(
        protein_embedding_dim=12, label_embedding_dim=16, latent_dim=8,
        projection_head_num_layers=2, output_mlp_num_layers=2,
        output_mlp_hidden_dim_scale_factor=2,
        label_embedding_pooling_method="all",
    )
    params, state = init_protnote(jax.random.PRNGKey(0), cfg)
    assert "attn" in params
    B, L, T = 3, 5, 6
    P_f = jnp.asarray(rng.normal(size=(B, 12)).astype(np.float32))
    L_f = jnp.asarray(rng.normal(size=(L, T, 16)).astype(np.float32))
    attn_mask = jnp.asarray(np.ones((L, T), np.int64))
    logits, _ = protnote_forward(params, state, P_f, L_f, cfg,
                                 label_attention_mask=attn_mask)
    assert logits.shape == (B, L)
    assert np.isfinite(np.asarray(logits)).all()

    # missing mask -> clear error
    import pytest

    with pytest.raises(ValueError):
        protnote_forward(params, state, P_f, L_f, cfg)
