"""Golden tests: JAX text encoders vs HF transformers reference
implementations (tiny configs, random weights, CPU torch — no downloads)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from protnote_tpu.models.text_transformer import (
    TextEncoderConfig,
    config_from_hf,
    from_hf_state_dict,
    init_lora,
    init_text_encoder,
    pool_hidden_states_jnp,
    text_encoder_forward,
    trainable_mask,
)


@pytest.fixture(scope="module")
def bert_pair():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def gpt_pair():
    from transformers import BioGptConfig, BioGptModel

    hf_cfg = BioGptConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, scale_embedding=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    model = BioGptModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def _inputs(rng, pad_token=1):
    ids = rng.integers(2, 119, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), dtype=np.int64)
    mask[0, 8:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = pad_token
    return ids, mask


def test_bert_matches_hf(bert_pair, rng):
    model, cfg, params = bert_pair
    ids, mask = _inputs(rng)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(
        text_encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    # only attended positions are meaningful
    np.testing.assert_allclose(ours[mask > 0], ref[mask > 0], rtol=2e-4, atol=2e-4)


def test_gpt_matches_hf(gpt_pair, rng):
    model, cfg, params = gpt_pair
    ids, mask = _inputs(rng)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(
        text_encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    # pre-LN residual stream amplifies cross-framework f32 noise (~3e-5/layer)
    np.testing.assert_allclose(ours[mask > 0], ref[mask > 0], rtol=2e-3, atol=2e-3)


def test_pooling_jnp_matches_numpy(rng):
    from protnote_tpu.models.label_encoder import pool_hidden_states

    hidden = rng.normal(size=(3, 10, 8)).astype(np.float32)
    mask = np.ones((3, 10), np.int64)
    mask[1, 6:] = 0
    for method in ("mean", "last_token"):
        a = pool_hidden_states(hidden, mask, method)
        b = np.asarray(pool_hidden_states_jnp(jnp.asarray(hidden), jnp.asarray(mask), method))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_lora_zero_init_is_identity(bert_pair, rng):
    model, cfg, params = bert_pair
    ids, mask = _inputs(rng)
    base = np.asarray(
        text_encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    lora = init_lora(jax.random.PRNGKey(0), cfg, rank=2, last_n_layers=2)
    with_lora = np.asarray(
        text_encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                             lora=lora, lora_alpha=4, lora_rank=2)
    )
    # B is zero-initialised -> adapters start as identity
    np.testing.assert_allclose(base, with_lora, rtol=1e-6, atol=1e-6)
    # perturbing B changes the output
    lora["1"]["q"]["B"] = jnp.ones_like(lora["1"]["q"]["B"])
    changed = np.asarray(
        text_encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                             lora=lora, lora_alpha=4, lora_rank=2)
    )
    assert not np.allclose(base, changed)


def test_trainable_mask_last_n(bert_pair):
    _, cfg, params = bert_pair
    m = trainable_mask(params, cfg, last_n_layers=1)
    assert not jax.tree_util.tree_reduce(
        lambda a, b: a or b, m["layers"][0], False
    )
    assert jax.tree_util.tree_reduce(lambda a, b: a and b, m["layers"][1], True)
    assert not m["word_embeddings"]


def test_attention_only_lora_targets(bert_pair, rng):
    """targets=("q","v") (classic attention-only LoRA) must run: the FFN
    branches previously indexed lora_entry["fc1"] unguarded -> KeyError."""
    _, cfg, params = bert_pair
    lora = init_lora(jax.random.PRNGKey(0), cfg, rank=2, last_n_layers=1,
                     targets=("q", "v"))
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size - 5, (2, 8)).astype(np.int32))
    attn = jnp.asarray(np.ones((2, 8), np.int32))
    out = text_encoder_forward(params, ids, attn, cfg, lora=lora)
    base = text_encoder_forward(params, ids, attn, cfg)
    # B matrices init to zero -> adapted forward equals the base forward
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_mean_pooling_degenerate_mask_is_finite(rng):
    """A row whose attention mask covers only the SOS token must pool to
    zeros, not 0/0 = nan propagating into the label tower."""
    from protnote_tpu.models.label_encoder import pool_hidden_states

    h = rng.normal(size=(2, 4, 8)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0], [1, 0, 0, 0]], np.int32)
    out_np = pool_hidden_states(h, mask, "mean")
    out_j = np.asarray(pool_hidden_states_jnp(
        jnp.asarray(h), jnp.asarray(mask), "mean"))
    assert np.all(np.isfinite(out_np)) and np.all(np.isfinite(out_j))
    np.testing.assert_allclose(out_np, out_j, atol=1e-5)
    np.testing.assert_allclose(out_np[1], 0.0, atol=1e-6)


def test_plain_bert_absolute_positions_match_transformers(rng):
    """model_type 'bert' uses absolute arange positions (fairseq pad-offset
    ids would shift every position embedding by one row) — golden vs
    transformers.BertModel on identical weights."""
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=90, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=24, type_vocab_size=2, pad_token_id=0,
    )
    torch.manual_seed(1)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.position_style == "absolute"
    params = from_hf_state_dict(model.state_dict(), cfg)

    ids = rng.integers(3, 90, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    ids[1, 6:] = 0
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(text_encoder_forward(
        params, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), cfg,
    ))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-4)
