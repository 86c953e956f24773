"""pjit-able train / eval steps over the (dp, label) mesh.

Replaces the reference's imperative engine (ProtNoteTrainer.train_one_epoch,
ProtNoteTrainer.py:675-825: AMP autocast + GradScaler + DDP allreduce +
manual clipping) with a single jitted function: forward (frozen ProteInfer ->
fusion scorer), FocalLoss, grads, optax clip+Adam, and streaming tp/fp/fn
counters.  Sharding propagates from the input shardings
(protnote_tpu.parallel.mesh); XLA inserts the gradient psums the reference
got from NCCL hooks.

bf16 notes: with ``mixed=True`` the encoder and pair scorer run in bfloat16
with float32 accumulation; no loss scaling is needed (unlike fp16 AMP in the
reference) because bf16 keeps the fp32 exponent range.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from protnote_tpu.models.fusion import ProtNoteConfig, protnote_forward
from protnote_tpu.models.proteinfer import ProteInferConfig, embed_from_ids

Params = Dict[str, Any]


def init_train_state(
    pn_params: Params,
    pn_state: Params,
    enc_params: Params,
    enc_state: Params,
    tx: optax.GradientTransformation,
    train_sequence_encoder: bool = False,
    text_params: Optional[Params] = None,
    train_label_encoder: bool = False,
    lora_params: Optional[Params] = None,
) -> Dict[str, Any]:
    """``text_params``: frozen-or-trainable label-tower parameters
    (models/text_transformer.py); with ``train_label_encoder`` they join the
    trainable tree (pair with an optax.masked last-n-layers policy), and
    ``lora_params`` adds always-trainable adapters (reference LoRA wiring,
    models.py:11-50)."""
    trainable = {"protnote": pn_params}
    if train_sequence_encoder:
        trainable["encoder"] = enc_params
    if text_params is not None and train_label_encoder:
        trainable["text"] = text_params
    if lora_params is not None:
        trainable["lora"] = lora_params
    return {
        "trainable": trainable,
        "model_state": pn_state,
        "enc_params": None if train_sequence_encoder else enc_params,
        "enc_state": enc_state,
        "text_params": None if (text_params is None or train_label_encoder) else text_params,
        "opt_state": tx.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }


def _resolve_label_embeddings(batch: Dict[str, Any]) -> jnp.ndarray:
    """Label embeddings for one step: either shipped with the batch, or
    gathered on device from the step-invariant resident view matrix
    (``label_matrix``) using per-step ``label_rows`` indices."""
    if "label_rows" in batch and "label_matrix" in batch:
        return jnp.take(batch["label_matrix"], batch["label_rows"], axis=0)
    return batch["label_embeddings"]


def _pair_mask(example_mask: jnp.ndarray, num_labels: int,
               label_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    m = jnp.broadcast_to(
        example_mask[:, None], (example_mask.shape[0], num_labels)
    )
    if label_mask is not None:
        m = m * label_mask[None, :].astype(m.dtype)
    return m


def make_train_step(
    pi_cfg: ProteInferConfig,
    pn_cfg: ProtNoteConfig,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    train_sequence_encoder: bool = False,
    encoder_bn_train_mode: bool = False,
    decision_threshold: float = 0.5,
    donate: bool = True,
    text_cfg=None,
    pooling_method: str = "mean",
    lora_alpha: float = 8.0,
    lora_rank: int = 4,
):
    """Returns jitted ``(train_state, batch, rng) -> (train_state, metrics)``.

    ``batch``: dict with aa_ids (B,T) int, lengths (B,), example_mask (B,),
    label_embeddings (L,D), label_multihots (B,L).  With ``text_cfg`` set and
    ``label_input_ids``/``label_attention_mask`` in the batch, label
    embeddings are computed on the fly through the JAX text tower (the
    reference trainable-label-encoder path, ProtNote.py:197-215) — gradients
    flow into ``trainable["text"]`` and/or ``trainable["lora"]``.

    ``encoder_bn_train_mode=True`` reproduces the reference quirk of running
    the frozen encoder's BatchNorm on batch statistics during training
    (model.train() covers the frozen tower too, ProtNoteTrainer.py:671);
    default is deterministic eval-mode BN.
    """

    def step(ts, batch, rng):
        rng = jax.random.fold_in(rng, ts["step"])
        mask = _pair_mask(batch["example_mask"], batch["label_multihots"].shape[1],
                          batch.get("label_mask"))

        def loss_inner(trainable):
            enc_params = trainable.get("encoder", ts["enc_params"])
            enc_train = train_sequence_encoder or encoder_bn_train_mode
            P_f, enc_state = embed_from_ids(
                enc_params, ts["enc_state"], batch["aa_ids"], batch["lengths"],
                pi_cfg, train=enc_train, example_mask=batch["example_mask"],
            )
            if not train_sequence_encoder:
                P_f = jax.lax.stop_gradient(P_f)

            if text_cfg is not None and "label_input_ids" in batch:
                from protnote_tpu.models.text_transformer import (
                    pool_hidden_states_jnp,
                    text_encoder_forward,
                )

                text_params = trainable.get("text", ts["text_params"])
                hidden = text_encoder_forward(
                    text_params, batch["label_input_ids"],
                    batch["label_attention_mask"], text_cfg,
                    lora=trainable.get("lora"),
                    lora_alpha=lora_alpha, lora_rank=lora_rank,
                )
                label_embeddings = pool_hidden_states_jnp(
                    hidden, batch["label_attention_mask"], pooling_method
                )
                if "text" not in trainable and "lora" not in trainable:
                    label_embeddings = jax.lax.stop_gradient(label_embeddings)
            else:
                label_embeddings = _resolve_label_embeddings(batch)

            logits, model_state = protnote_forward(
                trainable["protnote"], ts["model_state"], P_f,
                label_embeddings, pn_cfg, train=True, rng=rng,
                example_mask=batch["example_mask"],
                label_mask=batch.get("label_mask"),
                # pooling 'all' (additive attention) needs the token mask
                label_attention_mask=batch.get("label_attention_mask"),
            )
            loss = loss_fn(logits, batch["label_multihots"], mask=mask)
            return loss, (logits, model_state, enc_state)

        (loss, (logits, model_state, enc_state)), grads = jax.value_and_grad(
            loss_inner, has_aux=True
        )(ts["trainable"])

        updates, opt_state = tx.update(grads, ts["opt_state"], ts["trainable"])
        trainable = optax.apply_updates(ts["trainable"], updates)

        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        pred = (probs > decision_threshold) & (mask > 0)
        tgt = (batch["label_multihots"] > 0) & (mask > 0)
        metrics = {
            "loss": loss,
            "tp": jnp.sum(pred & tgt, axis=0),
            "fp": jnp.sum(pred & ~tgt, axis=0),
            "fn": jnp.sum(~pred & tgt, axis=0),
            "grad_norm": optax.global_norm(grads),
            "examples": jnp.sum(batch["example_mask"]),
        }
        new_ts = {
            "trainable": trainable,
            "model_state": model_state,
            "enc_params": ts["enc_params"],
            "enc_state": enc_state if (train_sequence_encoder or encoder_bn_train_mode)
            else ts["enc_state"],
            "text_params": ts.get("text_params"),
            "opt_state": opt_state,
            "step": ts["step"] + 1,
        }
        return new_ts, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    pi_cfg: ProteInferConfig,
    pn_cfg: ProtNoteConfig,
    loss_fn: Optional[Callable] = None,
    text_cfg=None,
    pooling_method: str = "mean",
    lora_alpha: float = 8.0,
    lora_rank: int = 4,
    jit: bool = True,
):
    """Returns jitted ``(params_bundle, batch) -> outputs``.

    ``jit=False`` returns the raw traced function so callers can compose it
    into a larger jit (the trainer fuses the device metric accumulator into
    the same dispatch, trainer._fused_eval_step).

    ``params_bundle``: dict with trainable/model_state/enc_params/enc_state
    (a train_state works directly).  Outputs: logits (B, L) float32 +
    optional loss.  Runs the folded/tiled inference pair scorer
    (cfg.pair_backend) with inference-description ensembling.  With
    ``text_cfg`` + tokenized labels in the batch, label embeddings come from
    the JAX text tower (on-the-fly zero-shot scoring of unseen label text).
    """

    def step(ts, batch):
        enc_params = ts["trainable"].get("encoder", ts["enc_params"])
        P_f, _ = embed_from_ids(
            enc_params, ts["enc_state"], batch["aa_ids"], batch["lengths"],
            pi_cfg, train=False,
        )
        if "label_latents" in batch:
            # precomputed W_l projections (batch-invariant eval label layout
            # -> the label tower runs once per evaluation, not per step)
            logits, _ = protnote_forward(
                ts["trainable"]["protnote"], ts["model_state"], P_f,
                None, pn_cfg, train=False,
                label_latents=batch["label_latents"],
            )
            out = {"logits": logits.astype(jnp.float32)}
            if loss_fn is not None and batch.get("label_multihots") is not None:
                mask = _pair_mask(
                    batch["example_mask"], batch["label_multihots"].shape[1],
                    batch.get("label_mask"),
                )
                out["loss"] = loss_fn(logits, batch["label_multihots"], mask=mask)
            return out
        if text_cfg is not None and "label_input_ids" in batch:
            from protnote_tpu.models.text_transformer import (
                pool_hidden_states_jnp,
                text_encoder_forward,
            )

            text_params = ts["trainable"].get("text", ts["text_params"])
            hidden = text_encoder_forward(
                text_params, batch["label_input_ids"],
                batch["label_attention_mask"], text_cfg,
                lora=ts["trainable"].get("lora"),
                lora_alpha=lora_alpha, lora_rank=lora_rank,
            )
            label_embeddings = pool_hidden_states_jnp(
                hidden, batch["label_attention_mask"], pooling_method
            )
        else:
            label_embeddings = _resolve_label_embeddings(batch)
        logits, _ = protnote_forward(
            ts["trainable"]["protnote"], ts["model_state"], P_f,
            label_embeddings, pn_cfg, train=False,
            label_attention_mask=batch.get("label_attention_mask"),
        )
        out = {"logits": logits.astype(jnp.float32)}
        if loss_fn is not None and batch.get("label_multihots") is not None:
            mask = _pair_mask(batch["example_mask"], batch["label_multihots"].shape[1],
                              batch.get("label_mask"))
            out["loss"] = loss_fn(logits, batch["label_multihots"], mask=mask)
        return out

    return jax.jit(step) if jit else step


def batch_to_device_dict(batch) -> Dict[str, jnp.ndarray]:
    """protnote_tpu.data.batching.Batch -> plain dict of arrays for the steps."""
    out = {
        "aa_ids": jnp.asarray(batch.aa_ids),
        "lengths": jnp.asarray(batch.lengths),
        "example_mask": jnp.asarray(batch.example_mask, dtype=jnp.float32),
    }
    if batch.label_embeddings is not None:
        out["label_embeddings"] = jnp.asarray(batch.label_embeddings)
    if batch.label_rows is not None:
        out["label_rows"] = jnp.asarray(batch.label_rows, dtype=jnp.int32)
    if batch.label_multihots is not None:
        out["label_multihots"] = jnp.asarray(batch.label_multihots)
    if batch.label_mask is not None:
        out["label_mask"] = jnp.asarray(batch.label_mask, dtype=jnp.float32)
    return out
