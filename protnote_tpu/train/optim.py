"""Optimizer factory (reference ProtNoteTrainer._set_optimizer,
ProtNoteTrainer.py:199-245): Adam / AdamW / SGD over the trainable subset
(projection heads + output MLP by default; encoders frozen), with gradient
clipping at CLIP_VALUE and optional gradient accumulation — expressed as an
optax chain instead of imperative scaler/clip/step calls."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax


def make_optimizer(params_cfg: Dict[str, Any],
                   trainable_mask=None) -> optax.GradientTransformation:
    """``trainable_mask``: optional bool pytree (matching the trainable tree)
    that freezes unmasked leaves — the per-parameter freezing policy of the
    reference _set_optimizer (ProtNoteTrainer.py:199-245) expressed as an
    optax partition."""
    name = params_cfg.get("OPTIMIZER", "Adam")
    lr = params_cfg.get("LEARNING_RATE", 3e-4)
    wd = params_cfg.get("WEIGHT_DECAY", 0.0)
    clip = params_cfg.get("CLIP_VALUE")
    accum = params_cfg.get("GRADIENT_ACCUMULATION_STEPS", 1) or 1
    # OPTIMIZER_MOMENT_DTYPE: "bfloat16" halves Adam's FIRST moment (optax
    # mu_dtype casts mu only; nu stays f32) — a ~25% optimizer-state saving,
    # an OOM-boundary lever on the HBM-bound full-vocab train path.
    # Params/grads/updates stay f32.
    mu_dtype = params_cfg.get("OPTIMIZER_MOMENT_DTYPE")
    mu_dtype = None if not mu_dtype else getattr(jax.numpy, str(mu_dtype))

    if name == "Adam":
        base = optax.adam(lr, mu_dtype=mu_dtype)
    elif name == "AdamW":
        base = optax.adamw(lr, weight_decay=wd, mu_dtype=mu_dtype)
    elif name == "SGD":
        # reference semantics (ProtNoteTrainer.py:239-244): plain
        # torch.optim.SGD — NO momentum, L2 weight decay folded into the
        # gradient inside the step (i.e. AFTER clipping).  A previous 0.9
        # momentum default here silently diverged from reference SGD runs.
        base = optax.sgd(lr)
        if wd:
            base = optax.chain(optax.add_decayed_weights(float(wd)), base)
    else:
        raise ValueError(f"Unknown optimizer {name}")

    if trainable_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask
        )
        base = optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()}, labels
        )

    chain = []
    if clip is not None:
        chain.append(optax.clip_by_global_norm(float(clip)))
    chain.append(base)
    tx = optax.chain(*chain)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
