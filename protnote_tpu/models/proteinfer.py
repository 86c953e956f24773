"""ProteInfer dilated-CNN protein encoder, TPU-native.

Functional reimplementation of the reference encoder
(protnote/models/protein_encoders.py:8-153): a masked conv stem, N ResNet-v2
bottleneck blocks with exponentially dilated masked convs (dilation base^i),
padding re-zeroed around every conv, and masked mean-pooling over the true
sequence length into a ``output_channels``-dim embedding.  An optional linear
classifier head reproduces standalone ProteInfer scoring
(protein_encoders.py:105-123).

TPU notes: convolutions run in NWC layout on the MXU with bf16 inputs and
float32 accumulation; sequences arrive as int residue ids and are one-hot
encoded on device (pad id maps to a zero row, so padding is masked for free at
the input); all shapes are static (bucketed lengths).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from protnote_tpu.models.layers import (
    Params,
    batchnorm_apply,
    gemm_precision,
    init_batchnorm,
    init_linear,
    linear,
)

BN_EPS = 1e-3  # reference: BatchNorm1d(eps=0.001, momentum=0.01)
BN_MOMENTUM = 0.01


@dataclass(frozen=True)
class ProteInferConfig:
    input_channels: int = 20
    output_channels: int = 1100
    kernel_size: int = 9
    dilation_base: int = 3
    num_resnet_blocks: int = 5
    bottleneck_factor: float = 0.5
    num_labels: int = 32102
    dtype: Any = jnp.float32
    # Activation/compute dtype for the forward pass; ``None`` falls back to
    # ``dtype``.  The reference runs its encoder under ``autocast()``
    # UNCONDITIONALLY (ProtNoteTrainer.py:287,728), so the MIXED_PRECISION
    # path sets this to bfloat16 (one MXU pass per conv, f32 accumulation)
    # while master weights/BN state stay in ``dtype`` (float32).  Leaving it
    # None keeps the strict-f32 parity path (Precision.HIGHEST convs).
    compute_dtype: Any = None

    @property
    def bottleneck_channels(self) -> int:
        return int(math.floor(self.output_channels * self.bottleneck_factor))

    @property
    def runtime_dtype(self) -> Any:
        return self.dtype if self.compute_dtype is None else self.compute_dtype


# ----------------------------------------------------------------------
# init


def _init_conv(key, k: int, cin: int, cout: int, dtype) -> Params:
    """Torch Conv1d default init (kaiming uniform, fan_in = cin*k)."""
    kw, kb = jax.random.split(key)
    fan_in = cin * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kw, (k, cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (cout,), dtype, -bound, bound),
    }


def init_proteinfer(key, cfg: ProteInferConfig) -> Tuple[Params, Params]:
    """Returns (params, bn_state) pytrees."""
    keys = jax.random.split(key, cfg.num_resnet_blocks * 2 + 2)
    params: Params = {}
    state: Params = {}
    params["conv1"] = _init_conv(
        keys[0], cfg.kernel_size, cfg.input_channels, cfg.output_channels, cfg.dtype
    )
    blocks = []
    blocks_state = []
    cb = cfg.bottleneck_channels
    for i in range(cfg.num_resnet_blocks):
        bn1_p, bn1_s = init_batchnorm(cfg.output_channels, cfg.dtype)
        bn2_p, bn2_s = init_batchnorm(cb, cfg.dtype)
        blocks.append(
            {
                "bn1": bn1_p,
                "conv_dilated": _init_conv(
                    keys[2 * i + 1], cfg.kernel_size, cfg.output_channels, cb, cfg.dtype
                ),
                "bn2": bn2_p,
                "conv_1x1": _init_conv(keys[2 * i + 2], 1, cb, cfg.output_channels, cfg.dtype),
            }
        )
        blocks_state.append({"bn1": bn1_s, "bn2": bn2_s})
    params["blocks"] = blocks
    state["blocks"] = blocks_state
    params["output"] = init_linear(keys[-1], cfg.output_channels, cfg.num_labels, True, cfg.dtype)
    return params, state


# ----------------------------------------------------------------------
# forward


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B, T, 1) float mask of valid positions."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)[..., None]


def one_hot_sequences(aa_ids: jnp.ndarray, num_aa: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) int ids -> (B, T, num_aa); any id >= num_aa (padding) is all-zero."""
    return jax.nn.one_hot(aa_ids, num_aa, dtype=dtype)


def _masked_conv(p: Params, x: jnp.ndarray, mask: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """'same'-padded dilated conv with padding zeroed before and after
    (reference MaskedConv1D, protein_encoders.py:8-17)."""
    x = x * mask.astype(x.dtype)
    k = p["kernel"].shape[0]
    pad = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(1,),
        padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=gemm_precision(x.dtype),
    ).astype(x.dtype)
    y = y + p["bias"].astype(y.dtype)
    return y * mask.astype(y.dtype)


def proteinfer_embed(
    params: Params,
    state: Params,
    aa_onehot: jnp.ndarray,  # (B, T, C_in)
    lengths: jnp.ndarray,  # (B,)
    cfg: ProteInferConfig,
    train: bool = False,
    example_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Params]:
    """Masked dilated CNN -> (B, output_channels) embedding.

    Mirrors ProteInfer.get_embeddings (protein_encoders.py:109-118): conv stem,
    residual blocks, final padding zero-out, sum/length mean pool.

    Train-mode BatchNorm reproduces the reference's statistics EXACTLY: the
    reference runs plain ``BatchNorm1d`` over tensors zero-padded to the
    per-batch max length (protein_encoders.py:36,48), so padding positions
    count in its statistics — but only up to that batch's max length, not
    our static bucket width.  Sums here run over valid positions (padding
    is exact zeros after the masked convs) with the divisor
    ``valid_rows x max_valid_length`` (``count``), which matches the
    reference bit-for-bit AND makes train-mode BN independent of the bucket
    width.  Rows masked off by ``example_mask`` (synthetic batch-filler
    rows, which the reference never has) are excluded entirely.
    """
    x = aa_onehot.astype(cfg.runtime_dtype)
    mask = length_mask(lengths, x.shape[1])
    bn_mask = None
    bn_count = None
    if train:
        lengths_f = lengths.astype(jnp.float32)
        if example_mask is not None:
            em = example_mask.astype(jnp.float32)
            bn_mask = mask * em[:, None, None]
            rows = jnp.sum(em)
            t_ref = jnp.max(lengths_f * em)
        else:
            bn_mask = mask
            rows = jnp.asarray(x.shape[0], jnp.float32)
            t_ref = jnp.max(lengths_f)
        bn_count = jnp.maximum(rows * t_ref, 1.0)

    feats = _masked_conv(params["conv1"], x, mask, dilation=1)

    new_blocks_state = []
    for i, (bp, bs) in enumerate(zip(params["blocks"], state["blocks"])):
        out, bn1_s = batchnorm_apply(
            bp["bn1"], bs["bn1"], feats, train, eps=BN_EPS, momentum=BN_MOMENTUM,
            reduce_axes=(0, 1), mask=bn_mask, count=bn_count,
        )
        out = jax.nn.relu(out)
        out = _masked_conv(bp["conv_dilated"], out, mask, dilation=cfg.dilation_base ** i)
        out, bn2_s = batchnorm_apply(
            bp["bn2"], bs["bn2"], out, train, eps=BN_EPS, momentum=BN_MOMENTUM,
            reduce_axes=(0, 1), mask=bn_mask, count=bn_count,
        )
        out = jax.nn.relu(out)
        out = _masked_conv(bp["conv_1x1"], out, mask, dilation=1)
        feats = feats + out
        new_blocks_state.append({"bn1": bn1_s, "bn2": bn2_s})

    feats = feats * mask.astype(feats.dtype)
    # clamp: a zero-length row would mean 0/0 = NaN, which then poisons the
    # projection head's masked BatchNorm statistics for the whole batch
    denom = jnp.maximum(lengths[:, None].astype(jnp.float32), 1.0)
    pooled = jnp.sum(feats.astype(jnp.float32), axis=1) / denom
    return pooled, {"blocks": new_blocks_state}


def proteinfer_forward(
    params: Params,
    state: Params,
    aa_onehot: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: ProteInferConfig,
    train: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """Embedding + classifier head -> (B, num_labels) logits
    (reference ProteInfer.forward, protein_encoders.py:120-123)."""
    emb, new_state = proteinfer_embed(params, state, aa_onehot, lengths, cfg, train)
    logits = linear(params["output"], emb)
    return logits, new_state


def embed_from_ids(
    params: Params,
    state: Params,
    aa_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: ProteInferConfig,
    train: bool = False,
    example_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Params]:
    """Convenience: int residue ids -> embedding (on-device one-hot)."""
    onehot = one_hot_sequences(aa_ids, cfg.input_channels, dtype=cfg.runtime_dtype)
    return proteinfer_embed(params, state, onehot, lengths, cfg, train,
                            example_mask=example_mask)
