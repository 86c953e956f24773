"""Trainable label tower: on-the-fly text embeddings in the train step with
last-n-layer unfreezing and LoRA (reference LABEL_ENCODER_NUM_TRAINABLE_LAYERS
/ LORA, ProtNote.py:197-215 + models.py:11-50)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote
from protnote_tpu.models.proteinfer import ProteInferConfig, init_proteinfer
from protnote_tpu.models.text_transformer import (
    TextEncoderConfig,
    init_lora,
    init_text_encoder,
    trainable_mask,
)
from protnote_tpu.train.losses import get_loss_fn
from protnote_tpu.train.optim import make_optimizer
from protnote_tpu.train.step import init_train_state, make_eval_step, make_train_step

PI = ProteInferConfig(output_channels=16, kernel_size=3, num_resnet_blocks=1,
                      num_labels=4)
TEXT = TextEncoderConfig(arch="bert", vocab_size=50, hidden_size=16,
                         num_layers=2, num_heads=2, intermediate_size=32,
                         max_position_embeddings=24, pad_token_id=1)
PN = ProtNoteConfig(protein_embedding_dim=16, label_embedding_dim=16, latent_dim=8,
                    projection_head_num_layers=2, projection_head_hidden_dim_scale_factor=2,
                    output_mlp_num_layers=2, output_mlp_hidden_dim_scale_factor=2)
B, T, L, TK = 4, 24, 6, 10


def make_batch(rng):
    ids = rng.integers(2, 49, (L, TK)).astype(np.int32)
    attn = np.ones((L, TK), np.int32)
    attn[:, 7:] = 0
    ids[attn == 0] = 1
    return {
        "aa_ids": jnp.asarray(rng.integers(0, 20, (B, T)).astype(np.int8)),
        "lengths": jnp.asarray(rng.integers(5, T, (B,)).astype(np.int32)),
        "example_mask": jnp.ones((B,), jnp.float32),
        "label_input_ids": jnp.asarray(ids),
        "label_attention_mask": jnp.asarray(attn),
        "label_multihots": jnp.asarray((rng.random((B, L)) < 0.4).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def towers():
    pi = init_proteinfer(jax.random.PRNGKey(0), PI)
    pn = init_protnote(jax.random.PRNGKey(1), PN)
    text = init_text_encoder(jax.random.PRNGKey(2), TEXT)
    return pi, pn, text


def test_train_with_trainable_text_tower(towers, rng):
    (pi_p, pi_s), (pn_p, pn_s), text = towers
    mask = {
        "protnote": jax.tree_util.tree_map(lambda _: True, pn_p),
        "text": trainable_mask(text, TEXT, last_n_layers=1),
    }
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 5e-3,
                         "CLIP_VALUE": 1.0}, trainable_mask=mask)
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx,
                          text_params=text, train_label_encoder=True)
    loss_fn = get_loss_fn({"LOSS_FN": "FocalLoss", "FOCAL_LOSS_GAMMA": 2,
                           "FOCAL_LOSS_ALPHA": -1})
    step = make_train_step(PI, PN, loss_fn, tx, text_cfg=TEXT, donate=False)
    batch = make_batch(rng)
    losses = []
    for i in range(15):
        ts, m = step(ts, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses) < losses[0]
    # last layer moved, first layer frozen (masked optimizer)
    assert not np.allclose(
        np.asarray(text["layers"][1]["q"]["kernel"]),
        np.asarray(ts["trainable"]["text"]["layers"][1]["q"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(text["layers"][0]["q"]["kernel"]),
        np.asarray(ts["trainable"]["text"]["layers"][0]["q"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(text["word_embeddings"]),
        np.asarray(ts["trainable"]["text"]["word_embeddings"]),
    )


def test_train_lora_only(towers, rng):
    (pi_p, pi_s), (pn_p, pn_s), text = towers
    lora = init_lora(jax.random.PRNGKey(3), TEXT, rank=2, last_n_layers=1)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-2,
                         "CLIP_VALUE": 1.0})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx,
                          text_params=text, train_label_encoder=False,
                          lora_params=lora)
    loss_fn = get_loss_fn({"LOSS_FN": "FocalLoss", "FOCAL_LOSS_GAMMA": 2,
                           "FOCAL_LOSS_ALPHA": -1})
    step = make_train_step(PI, PN, loss_fn, tx, text_cfg=TEXT,
                           lora_rank=2, lora_alpha=4, donate=False)
    batch = make_batch(rng)
    ts2 = ts
    for _ in range(4):
        ts2, m = step(ts2, batch, jax.random.PRNGKey(0))
    # LoRA B moved away from zero; base text params untouched (frozen)
    assert np.abs(np.asarray(ts2["trainable"]["lora"]["1"]["q"]["B"])).max() > 0
    np.testing.assert_array_equal(
        np.asarray(ts2["text_params"]["layers"][1]["q"]["kernel"]),
        np.asarray(text["layers"][1]["q"]["kernel"]),
    )


def test_eval_with_text_tower_matches_precomputed(towers, rng):
    """Eval via on-the-fly text tower == eval with precomputed embeddings."""
    from protnote_tpu.models.text_transformer import (
        pool_hidden_states_jnp, text_encoder_forward,
    )

    (pi_p, pi_s), (pn_p, pn_s), text = towers
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx, text_params=text)
    batch = make_batch(rng)

    ev_text = make_eval_step(PI, PN, text_cfg=TEXT)
    out1 = ev_text(ts, batch)

    hidden = text_encoder_forward(
        text, batch["label_input_ids"], batch["label_attention_mask"], TEXT
    )
    emb = pool_hidden_states_jnp(hidden, batch["label_attention_mask"], "mean")
    batch2 = {k: v for k, v in batch.items()
              if k not in ("label_input_ids", "label_attention_mask")}
    batch2["label_embeddings"] = emb
    ev_pre = make_eval_step(PI, PN)
    out2 = ev_pre(ts, batch2)
    np.testing.assert_allclose(np.asarray(out1["logits"]), np.asarray(out2["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_pooling_all_runs_through_steps(towers, rng):
    """LABEL_EMBEDDING_POOLING_METHOD='all' (additive attention over token
    states): both jitted steps must forward label_attention_mask to
    protnote_forward — previously they dropped it and the 'all' branch
    raised ValueError on the first step."""
    import dataclasses

    (pi_p, pi_s), _, text = towers
    PN_all = dataclasses.replace(PN, label_embedding_pooling_method="all")
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(4), PN_all)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx, text_params=text)
    loss_fn = get_loss_fn({"LOSS_FN": "BCE"})
    batch = make_batch(rng)

    step = make_train_step(PI, PN_all, loss_fn, tx, text_cfg=TEXT,
                           pooling_method="all", donate=False)
    ts2, m = step(ts, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    ev = make_eval_step(PI, PN_all, loss_fn, text_cfg=TEXT,
                        pooling_method="all")
    out = ev(ts2, batch)
    assert out["logits"].shape == (B, L)
    assert np.all(np.isfinite(np.asarray(out["logits"])))
