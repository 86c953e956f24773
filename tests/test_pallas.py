"""Pallas pair-scoring kernel vs the XLA tiled reference (interpret mode —
the same kernel runs compiled on real TPU; see bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
from protnote_tpu.ops.pair_scorer import fold_output_mlp, pair_logits_dense
from protnote_tpu.ops.pallas_pair_score import pair_logits_pallas

CFG = ProtNoteConfig(
    protein_embedding_dim=40,
    label_embedding_dim=24,
    latent_dim=64,
    projection_head_num_layers=2,
    output_mlp_num_layers=3,
    output_mlp_hidden_dim_scale_factor=4,  # H = 256
)


@pytest.fixture(scope="module")
def folded():
    params, state = init_protnote(jax.random.PRNGKey(0), CFG)
    return fold_output_mlp(params["output_mlp"], state["output_mlp"],
                           "concatenation", CFG.latent_dim)


def test_pallas_matches_dense(folded):
    rng = np.random.default_rng(0)
    P_e = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    L_e = jnp.asarray(rng.normal(size=(37, 64)).astype(np.float32))
    params, state = None, None
    ref = None
    # dense reference via folded weights: use the tiled path at f32
    from protnote_tpu.ops.pair_scorer import pair_logits_tiled

    ref = pair_logits_tiled(folded, P_e, L_e, label_tile=16,
                            compute_dtype=jnp.float32)
    out = pair_logits_pallas(
        folded, P_e, L_e, label_tile=16, seq_tile=4,
        block_k=128, block_n=128, compute_dtype=jnp.float32, interpret=True,
    )
    assert out.shape == (5, 37)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_rejects_unsupported(folded):
    P_e = jnp.zeros((2, 64))
    L_e = jnp.zeros((3, 64))
    import dataclasses

    bad = dataclasses.replace(folded, w1_prod=folded.w1_p)
    with pytest.raises(ValueError):
        pair_logits_pallas(bad, P_e, L_e, interpret=True)
