"""Functional NN primitives with torch-compatible numerics.

Parameters are plain nested dicts (pytrees) so they can be sharded with
``jax.sharding`` annotations and converted 1:1 from reference checkpoints.

BatchNorm follows torch semantics exactly (the reference relies on
``torch.nn.BatchNorm1d``): normalisation uses biased batch variance in
training and running statistics in eval; running stats update uses
``new = (1 - momentum) * old + momentum * batch`` with *unbiased* batch
variance.  Under ``jit`` over a sharded batch the statistics are global across
the mesh, i.e. SyncBatchNorm semantics (reference optional flag
``SYNC_BN``, bin/main.py:449-450).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ----------------------------------------------------------------------
# Linear


def init_linear(key, in_dim: int, out_dim: int, use_bias: bool = True,
                dtype=jnp.float32) -> Params:
    """Kaiming-uniform init, matching torch.nn.Linear defaults."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p: Params = {
        "kernel": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    }
    if use_bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def gemm_precision(dtype):
    """Precision for a GEMM/conv whose operands have ``dtype``.

    XLA's DEFAULT precision lowers float32 matmul/conv operands to
    bf16-class passes (one MXU pass on TPU; a reduced-precision path on
    XLA:CPU too — measured 1.1e-2 conv error vs 3e-7 at HIGHEST).  When the
    caller computes in float32 it asked for full precision, so force
    HIGHEST; bfloat16 operands are a single MXU pass either way, so the
    fast path is untouched.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def linear(p: Params, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    if precision is None:
        precision = gemm_precision(x.dtype)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), precision=precision)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ----------------------------------------------------------------------
# BatchNorm


def init_batchnorm(dim: int, dtype=jnp.float32) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batchnorm_apply(
    p: Params,
    s: Params,
    x: jnp.ndarray,
    train: bool,
    eps: float = 1e-5,
    momentum: float = 0.1,
    reduce_axes: Tuple[int, ...] = (0,),
    mask: Optional[jnp.ndarray] = None,
    count: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm over ``reduce_axes`` with channel = last axis.

    ``mask`` restricts the statistics to valid positions.  ``count``
    overrides the divisor to reproduce the reference's padded-tensor
    statistics under a DIFFERENT static padding width: the reference runs
    plain ``BatchNorm1d`` over tensors zero-padded to the *per-batch max
    length* (protein_encoders.py:36,48 — padding positions count), so its
    train-mode statistics depend on that width.  With ``count`` = the
    reference's position count (valid_rows x max_valid_length), masked sums
    over the valid positions equal the reference's sums (padding is exact
    zeros), and the variance gets the ``(count - n_valid) * mean^2`` term
    the zero pads would contribute — making train-mode BN independent of
    OUR bucket width while bit-matching the reference's quirk.
    Returns (y, new_state).
    """
    if train:
        xf = x.astype(jnp.float32)
        if mask is not None:
            m = mask.astype(jnp.float32)
            # valid-position count per channel: broadcast the mask over every
            # reduced axis (it may be lower-rank, e.g. (B,1,1) for (B,T,C))
            m_full = jnp.broadcast_to(m, xf.shape[:-1] + (1,))
            n_valid = jnp.maximum(jnp.sum(m_full, axis=reduce_axes), 1.0)
            n = n_valid if count is None else count
            mean = jnp.sum(xf * m, axis=reduce_axes) / n
            var = (jnp.sum((xf - mean) ** 2 * m, axis=reduce_axes)
                   + (n - n_valid) * mean**2) / n
        else:
            n = 1.0
            for a in reduce_axes:
                n = n * x.shape[a]
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean((xf - mean.reshape(_stat_shape(x, reduce_axes))) ** 2,
                           axis=reduce_axes)
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_state = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean.astype(s["mean"].dtype),
            "var": (1 - momentum) * s["var"] + momentum * unbiased.astype(s["var"].dtype),
        }
    else:
        mean, var = s["mean"].astype(jnp.float32), s["var"].astype(jnp.float32)
        new_state = s

    inv = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean * inv
    y = x.astype(jnp.float32) * inv + shift
    return y.astype(x.dtype), new_state


def _stat_shape(x: jnp.ndarray, reduce_axes: Tuple[int, ...]):
    return tuple(1 if i in reduce_axes else d for i, d in enumerate(x.shape))


def fold_batchnorm(p: Params, s: Params, eps: float) -> Tuple[np.ndarray, np.ndarray]:
    """Eval-mode BN as an affine (scale, shift) pair for kernel fusion."""
    inv = p["scale"] / jnp.sqrt(s["var"] + eps)
    shift = p["bias"] - s["mean"] * inv
    return inv, shift


# ----------------------------------------------------------------------
# Dropout


def dropout(x: jnp.ndarray, rate: float, rng, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
