"""Fused Pallas pair-scoring kernel (inference).

Computes, for every (sequence b, label l) pair, the folded output-MLP chain

    x1 = relu(a[b] + c[l])                      # first layer, decomposed
    x2 = relu(x1 @ W2 + b2)
    out[b, l] = relu(x2 @ W3 + b3) @ w_out + b_out

This is the framework's hot op (reference ProtNote.py:286-293 materialises a
(B*L, 2d) joint tensor and runs three torch Linear/BN layers over it).  The
XLA tiled path (ops/pair_scorer.pair_logits_tiled) is correct but writes each
layer's (pairs, H) activations to HBM — ~4x H*pairs bytes of traffic per tile
against only ~2 H^2 bytes of weight traffic, leaving it HBM-bound.  This
kernel computes x1 k-blocks on the fly inside the W2 pass (the VPU
broadcast-add overlaps the MXU/DMA pipeline; x1 never round-trips through
VMEM), keeps the x2 tile resident, and streams only the weight matrices from
HBM (double-buffered 512x512 blocks).

Grid: (B/TB, L/TL); each program scores a (TB x TL) pair tile.
VMEM budget at (TB=8, TL=256, H=3072, bf16): x2 12MB + 2 weight buffers 1MB +
acc 1MB + a/c operand tiles 1.6MB < 16MB.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from protnote_tpu.ops.pair_scorer import FoldedOutputMLP


def _kernel(
    a_ref,      # (TB, H) VMEM — per-sequence partials
    c_ref,      # (TL, H) VMEM — per-label partials (bias folded in)
    w2_ref,     # (H, H) ANY/HBM
    b2_ref,     # (1, H) VMEM
    w3_ref,     # (H, H) ANY/HBM
    b3_ref,     # (1, H) VMEM
    wout_ref,   # (H, 128) VMEM — w_out replicated into lane 0 (see wrapper)
    out_ref,    # (TB, TL) VMEM
    x2_ref,     # scratch (TP, H) bf16
    wbuf,       # scratch (2, KB, NB) bf16 — double-buffered weight blocks
    acc_out_ref,  # scratch (TP, 128) f32
    dma_sems,   # (2,) DMA semaphores
    *,
    TB: int,
    TL: int,
    H: int,
    KB: int,
    NB: int,
):
    TP = TB * TL
    K = H // KB
    N = H // NB

    # ---- weight streaming ------------------------------------------------
    # Static block schedule: all of W2 (n-major), then all of W3.  N, K are
    # Python ints, so the whole pipeline is unrolled with static slices and
    # static double-buffer slots.
    schedule = [("w2", n, k) for n in range(N) for k in range(K)] + [
        ("w3", n, k) for n in range(N) for k in range(K)
    ]

    def dma(t):
        which, n, k = schedule[t]
        src = w2_ref if which == "w2" else w3_ref
        slot = t % 2
        return pltpu.make_async_copy(
            src.at[k * KB : (k + 1) * KB, n * NB : (n + 1) * NB],
            wbuf.at[slot],
            dma_sems.at[slot],
        )

    dma(0).start()
    acc_out_ref[:] = jnp.zeros((TP, 128), jnp.float32)
    acc = jnp.zeros((TP, NB), jnp.float32)

    for t, (which, n, k) in enumerate(schedule):
        if t + 1 < len(schedule):
            dma(t + 1).start()
        if which == "w2":
            # x1 k-block computed on the fly: relu(a ⊕ c) never round-trips
            # through VMEM, and the VPU broadcast-add overlaps the weight DMA
            # instead of serialising a whole phase before the first GEMM.
            a_k = a_ref[:, k * KB : (k + 1) * KB].astype(jnp.float32)
            c_k = c_ref[:, k * KB : (k + 1) * KB].astype(jnp.float32)
            xk = (
                jax.nn.relu(a_k[:, None, :] + c_k[None, :, :])
                .reshape(TP, KB)
                .astype(x2_ref.dtype)
            )
        else:
            xk = x2_ref[:, k * KB : (k + 1) * KB]
        dma(t).wait()
        acc = acc + jnp.dot(xk, wbuf[t % 2], preferred_element_type=jnp.float32)
        if k == K - 1:
            if which == "w2":
                x2_ref[:, n * NB : (n + 1) * NB] = jax.nn.relu(
                    acc + b2_ref[0, n * NB : (n + 1) * NB].astype(jnp.float32)
                ).astype(x2_ref.dtype)
            else:
                x3n = jax.nn.relu(
                    acc + b3_ref[0, n * NB : (n + 1) * NB].astype(jnp.float32)
                )
                # (TP, NB) @ (NB, 128); only lane 0 of wout is meaningful.
                w = wout_ref[n * NB : (n + 1) * NB, :].astype(jnp.float32)
                acc_out_ref[:] += jnp.dot(
                    x3n, w, preferred_element_type=jnp.float32
                )
            acc = jnp.zeros((TP, NB), jnp.float32)

    out_ref[:] = acc_out_ref[:, 0].reshape(TB, TL)


def pair_logits_pallas(
    folded: FoldedOutputMLP,
    P_e: jnp.ndarray,
    L_e: jnp.ndarray,
    label_tile: int = 64,
    seq_tile: int = 8,
    block_k: int = 512,
    block_n: int = 512,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, L) float32 logits via the fused kernel.

    Requires the 'concatenation'/'concatenation_diff' folded form (layer-1
    fully decomposed, exactly 2 hidden (H,H) layers — the reference default
    OUTPUT_MLP_NUM_LAYERS=3 topology, base_config.yaml:34).
    """
    if folded.w1_prod is not None:
        raise ValueError("pallas kernel does not support concatenation_prod")
    if len(folded.hidden) != 2:
        raise ValueError(
            f"pallas kernel expects 2 hidden layers, got {len(folded.hidden)}"
        )
    (W2, b2), (W3, b3) = folded.hidden
    H = W2.shape[0]
    if H % block_k or H % block_n:
        raise ValueError(f"H={H} must be divisible by block sizes")

    B, d = P_e.shape
    L = L_e.shape[0]

    # First-layer partials (tiny GEMMs, left to XLA).
    a = jnp.dot(
        P_e.astype(compute_dtype), folded.w1_p.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    c = jnp.dot(
        L_e.astype(compute_dtype), folded.w1_l.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + folded.b1.astype(jnp.float32)

    # Pad B and L to tile multiples.
    Bp = -(-B // seq_tile) * seq_tile
    Lp = -(-L // label_tile) * label_tile
    a = jnp.pad(a, ((0, Bp - B), (0, 0))).astype(compute_dtype)
    c = jnp.pad(c, ((0, Lp - L), (0, 0))).astype(compute_dtype)

    wout_mat = jnp.zeros((H, 128), compute_dtype).at[:, 0].set(
        folded.w_out.astype(compute_dtype)
    )

    TB, TL = seq_tile, label_tile
    TP = TB * TL
    grid = (Bp // TB, Lp // TL)

    kernel = functools.partial(
        _kernel, TB=TB, TL=TL, H=H, KB=block_k, NB=block_n
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # W2 stays in HBM
            pl.BlockSpec((1, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # W3 stays in HBM
            pl.BlockSpec((1, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TL), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TP, H), compute_dtype),
            pltpu.VMEM((2, block_k, block_n), compute_dtype),
            pltpu.VMEM((TP, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * Lp * H * H + 2 * Bp * Lp * H,
            bytes_accessed=(Bp // TB) * (Lp // TL) * 2 * H * H * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        a, c,
        W2.astype(compute_dtype), b2.reshape(1, H).astype(compute_dtype),
        W3.astype(compute_dtype), b3.reshape(1, H).astype(compute_dtype),
        wout_mat,
    )
    out = out[:B, :L] + folded.b_out
    return out
