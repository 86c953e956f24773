"""ProtNote fusion model: projection heads + pairwise scorer.

Functional reimplementation of the reference ``ProtNote`` module
(protnote/models/ProtNote.py:9-334): protein and label embeddings are
projected by torchvision-style MLP heads (Linear-no-bias -> BN -> ReLU ->
Dropout per hidden layer, plain Linear last; ProtNote.py:63-86) into a shared
latent space, then every (sequence, label) pair is scored — by a concat-MLP
(via :mod:`protnote_tpu.ops.pair_scorer`) or cosine similarity.  Training-time
label-embedding noising (ProtNote.py:219-240) and inference ensembling over K
descriptions per label (logit of mean sigmoid, ProtNote.py:308-322) are
reproduced exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from protnote_tpu.models.layers import (
    Params,
    batchnorm_apply,
    dropout as dropout_fn,
    gemm_precision,
    init_batchnorm,
    init_linear,
    linear,
)
from protnote_tpu.ops.pair_scorer import (
    BN_EPS,
    BN_MOMENTUM,
    fold_output_mlp,
    pair_logits_dense,
    pair_logits_tiled,
    similarity_logits,
)


@dataclass(frozen=True)
class ProtNoteConfig:
    protein_embedding_dim: int = 1100
    label_embedding_dim: int = 1024
    latent_dim: int = 1024
    projection_head_num_layers: int = 4
    projection_head_hidden_dim_scale_factor: int = 3
    output_mlp_num_layers: int = 3
    output_mlp_hidden_dim_scale_factor: float = 3
    output_mlp_batchnorm: bool = True
    output_neuron_bias: Optional[float] = None
    feature_fusion: str = "concatenation"
    temperature: float = 0.07
    label_embedding_pooling_method: str = "mean"
    label_embedding_noising_alpha: float = 0.0
    inference_descriptions_per_label: int = 1
    dropout: float = 0.0
    sequence_embedding_dropout: float = 0.0
    label_embedding_dropout: float = 0.0
    label_tile: int = 512
    compute_dtype: Any = jnp.float32
    # calibrated static activation scales for the int8 path (one float per
    # hidden layer, from ops.pair_scorer.calibrate_act_scales /
    # Trainer.calibrate_int8); None = dynamic per-row quantization
    int8_act_scales: Optional[Tuple[float, ...]] = None
    # auto (train: dense, eval: tiled) | dense | tiled | tiled_int8.
    # A hand-written Pallas pair kernel was benchmarked and removed: the
    # folded/tiled XLA path runs at 177 TFLOP/s (90% of v5e bf16 peak), and
    # the kernel peaked at 169 — there is no >=10% headroom below the
    # roofline to claim.  tiled_int8 (opt-in, approximate) runs the hidden
    # GEMMs on the MXU int8 pipe (2x bf16 peak).
    pair_backend: str = "auto"
    gradient_checkpointing: bool = False
    # >0: train with the streamed exact-BN pair scorer (bounded memory for
    # any batch size; ops/streaming_train.py), using this label tile size
    train_label_tile: int = 0
    # streamed path z1 cache: None = auto (fits-in-HBM heuristic),
    # True/False = force.  See pair_logits_streaming_train(cache_first=...)
    train_streaming_cache: Any = None
    # opt-in: hand-written 2-pass BN+ReLU backward on the decomposed
    # training path (ops/streaming_train._bn_relu) — candidate for the
    # bandwidth-bound training residual; gradients exact (test-gated)
    train_fused_bn_vjp: bool = False

    @property
    def output_mlp_hidden_dim(self) -> int:
        return int(round(self.output_mlp_hidden_dim_scale_factor * self.latent_dim))

    @property
    def joint_dim(self) -> int:
        return {
            "concatenation": 2 * self.latent_dim,
            "concatenation_diff": 3 * self.latent_dim,
            "concatenation_prod": 3 * self.latent_dim,
        }[self.feature_fusion]

    @classmethod
    def from_params(cls, params: Dict, **overrides) -> "ProtNoteConfig":
        from protnote_tpu.models.convert import sigmoid_bias_from_prob

        bias_prob = params.get("OUTPUT_NEURON_PROBABILITY_BIAS")
        kw = dict(
            protein_embedding_dim=params.get("PROTEIN_EMBEDDING_DIM", 1100),
            label_embedding_dim=params.get("LABEL_EMBEDDING_DIM", 1024),
            latent_dim=params.get("LATENT_EMBEDDING_DIM", 1024),
            projection_head_num_layers=params.get("PROJECTION_HEAD_NUM_LAYERS", 4),
            projection_head_hidden_dim_scale_factor=params.get(
                "PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR", 3
            ),
            output_mlp_num_layers=params.get("OUTPUT_MLP_NUM_LAYERS", 3),
            output_mlp_hidden_dim_scale_factor=params.get(
                "OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR", 3
            ),
            output_mlp_batchnorm=params.get("OUTPUT_MLP_BATCHNORM", True),
            output_neuron_bias=(
                sigmoid_bias_from_prob(bias_prob) if bias_prob is not None else None
            ),
            feature_fusion=params.get("FEATURE_FUSION", "concatenation"),
            temperature=params.get("SUPCON_TEMP", 0.07),
            label_embedding_pooling_method=params.get(
                "LABEL_EMBEDDING_POOLING_METHOD", "mean"
            ),
            label_embedding_noising_alpha=params.get("LABEL_EMBEDDING_NOISING_ALPHA", 0.0),
            dropout=params.get("OUTPUT_MLP_DROPOUT", 0.0),
            sequence_embedding_dropout=params.get("SEQUENCE_EMBEDDING_DROPOUT", 0.0),
            label_embedding_dropout=params.get("LABEL_EMBEDDING_DROPOUT", 0.0),
            gradient_checkpointing=params.get("GRADIENT_CHECKPOINTING", False),
            train_label_tile=params.get("TRAIN_STREAMING_LABEL_TILE", 0) or 0,
            train_streaming_cache=params.get("TRAIN_STREAMING_CACHE", None),
            train_fused_bn_vjp=params.get("TRAIN_FUSED_BN_VJP", False),
            pair_backend=params.get("PAIR_BACKEND", None) or "auto",
            int8_act_scales=(
                tuple(float(s) for s in params["INT8_ACT_SCALES"])
                if params.get("INT8_ACT_SCALES") else None
            ),
        )
        kw.update(overrides)
        allowed = ("auto", "dense", "tiled", "tiled_int8")
        if kw["pair_backend"] not in allowed:
            raise ValueError(
                f"PAIR_BACKEND={kw['pair_backend']!r} not in {allowed}"
            )
        return cls(**kw)


# ----------------------------------------------------------------------
# init


def _init_projection_head(key, in_dim: int, cfg: ProtNoteConfig) -> Tuple[Params, Params]:
    """torchvision MLP: hidden dims [latent*scale]*(n-1) + [latent], no bias,
    BN+ReLU on hidden layers only (reference ProtNote.py:63-86)."""
    n = cfg.projection_head_num_layers
    hidden = [cfg.latent_dim * cfg.projection_head_hidden_dim_scale_factor] * (n - 1) + [
        cfg.latent_dim
    ]
    keys = jax.random.split(key, n)
    layers, bns_p, bns_s = [], [], []
    d = in_dim
    for i, h in enumerate(hidden):
        layers.append(init_linear(keys[i], d, h, use_bias=False))
        if i < n - 1:
            bp, bs = init_batchnorm(h)
            bns_p.append(bp)
            bns_s.append(bs)
        d = h
    return {"layers": layers, "bns": bns_p}, {"bns": bns_s}


def _init_output_mlp(key, cfg: ProtNoteConfig) -> Tuple[Params, Optional[Params]]:
    """get_mlp layout (reference ProtNote.py:337-378)."""
    n = cfg.output_mlp_num_layers
    H = cfg.output_mlp_hidden_dim
    keys = jax.random.split(key, n + 1)
    use_bias = not cfg.output_mlp_batchnorm
    layers, bns_p, bns_s = [], [], []
    d = cfg.joint_dim
    for i in range(n):
        layers.append(init_linear(keys[i], d, H, use_bias=use_bias))
        if cfg.output_mlp_batchnorm:
            bp, bs = init_batchnorm(H)
            bns_p.append(bp)
            bns_s.append(bs)
        d = H
    out = init_linear(keys[-1], H, 1, use_bias=True)
    if cfg.output_neuron_bias is not None:
        out["bias"] = jnp.full((1,), cfg.output_neuron_bias, out["bias"].dtype)
    params: Params = {"layers": layers, "out": out}
    state: Optional[Params] = None
    if cfg.output_mlp_batchnorm:
        params["bns"] = bns_p
        state = {"bns": bns_s}
    return params, state


def init_protnote(key, cfg: ProtNoteConfig) -> Tuple[Params, Params]:
    """Returns (params, state).  State holds every BatchNorm's running stats."""
    k_p, k_l, k_o, k_a = jax.random.split(key, 4)
    wp_p, wp_s = _init_projection_head(k_p, cfg.protein_embedding_dim, cfg)
    wl_p, wl_s = _init_projection_head(k_l, cfg.label_embedding_dim, cfg)
    params: Params = {"W_p": wp_p, "W_l": wl_p}
    state: Params = {"W_p": wp_s, "W_l": wl_s}
    if cfg.feature_fusion.startswith("concatenation"):
        om_p, om_s = _init_output_mlp(k_o, cfg)
        params["output_mlp"] = om_p
        if om_s is not None:
            state["output_mlp"] = om_s
    if cfg.label_embedding_pooling_method == "all":
        params["attn"] = init_linear(k_a, cfg.label_embedding_dim, 1, use_bias=True)
    return params, state


# ----------------------------------------------------------------------
# forward pieces


def projection_head_apply(
    p: Params, s: Params, x: jnp.ndarray, cfg: ProtNoteConfig, train: bool,
    input_dropout: float = 0.0, rng=None,
    rows_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Params]:
    if train and input_dropout > 0 and rng is not None:
        rng, sub = jax.random.split(rng)
        x = dropout_fn(x, input_dropout, sub, train)
    h = x
    n = len(p["layers"])
    new_bns: List[Params] = []
    for i, lin in enumerate(p["layers"]):
        h = linear(lin, h)
        if i < n - 1:
            h, bs = batchnorm_apply(p["bns"][i], s["bns"][i], h, train,
                                    eps=BN_EPS, momentum=BN_MOMENTUM,
                                    mask=rows_mask)
            new_bns.append(bs)
            h = jax.nn.relu(h)
            if train and cfg.dropout > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                h = dropout_fn(h, cfg.dropout, sub, train)
    # final layer: plain linear (+ trailing dropout in torchvision MLP)
    if train and cfg.dropout > 0 and rng is not None:
        rng, sub = jax.random.split(rng)
        h = dropout_fn(h, cfg.dropout, sub, train)
    return h, {"bns": new_bns}


def additive_attention(p: Params, hidden_states: jnp.ndarray,
                       attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Pool (L, T, D) token states with a learned additive-attention head
    (reference ProtNote.additive_attention, ProtNote.py:154-166)."""
    scores = linear(p, hidden_states)[..., 0]
    scores = jnp.where(attention_mask > 0, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("lt,ltd->ld", w, hidden_states,
                      precision=gemm_precision(hidden_states.dtype))


def noise_label_embeddings(L_f: jnp.ndarray, alpha: float, rng) -> jnp.ndarray:
    """Uniform(-1,1) noise scaled by alpha/sqrt(d) (reference
    ProtNote.py:219-240, NEFTune-style)."""
    scale = alpha / jnp.sqrt(jnp.asarray(L_f.shape[-1], jnp.float32))
    noise = jax.random.uniform(rng, L_f.shape, L_f.dtype, -1.0, 1.0)
    return L_f + noise * scale


def ensemble_logits(logits: jnp.ndarray, k: int, eps: float = 1e-7) -> jnp.ndarray:
    """(B, L*k) -> (B, L): logit of the mean sigmoid over each label's k
    description variants (reference ProtNote.py:308-322)."""
    B, Lk = logits.shape
    probs = jax.nn.sigmoid(logits).reshape(B, Lk // k, k).mean(axis=-1)
    probs = jnp.clip(probs, eps, 1.0 - eps)
    return jnp.log(probs) - jnp.log1p(-probs)


def compute_label_latents(
    params: Params,
    state: Params,
    label_embeddings: jnp.ndarray,
    cfg: ProtNoteConfig,
    label_attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Eval-mode W_l projection of label-description rows -> latents to feed
    ``protnote_forward(label_latents=...)``.  Jit and call once per
    evaluation when the label layout is batch-invariant."""
    L_f = label_embeddings
    if cfg.label_embedding_pooling_method == "all":
        if label_attention_mask is None:
            raise ValueError("pooling 'all' requires label_attention_mask")
        L_f = additive_attention(params["attn"], L_f, label_attention_mask)
    L_e, _ = projection_head_apply(
        params["W_l"], state["W_l"], L_f.astype(cfg.compute_dtype), cfg,
        train=False,
    )
    return L_e


def calibrate_int8_maxes(
    params: Params,
    state: Params,
    sequence_embeddings: jnp.ndarray,
    cfg: ProtNoteConfig,
    label_embeddings: Optional[jnp.ndarray] = None,
    label_latents: Optional[jnp.ndarray] = None,
    label_attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Traceable core of :func:`calibrate_int8`: per-hidden-layer max |GEMM
    input| as a (num_hidden,) f32 array, pure jnp (jit-safe — required on
    multi-host meshes, where eager reductions over non-fully-addressable
    arrays are forbidden)."""
    from protnote_tpu.ops.pair_scorer import act_scale_maxes

    P_e, _ = projection_head_apply(
        params["W_p"], state["W_p"],
        sequence_embeddings.astype(cfg.compute_dtype), cfg, train=False,
    )
    if label_latents is None:
        if label_embeddings is None:
            raise ValueError("need label_embeddings or label_latents")
        label_latents = compute_label_latents(
            params, state, label_embeddings, cfg, label_attention_mask
        )
    folded = fold_output_mlp(
        params["output_mlp"], state.get("output_mlp"), cfg.feature_fusion,
        cfg.latent_dim, dtype=cfg.compute_dtype,
    )
    return act_scale_maxes(
        folded, P_e, label_latents.astype(cfg.compute_dtype),
        label_tile=cfg.label_tile,
    )


def calibrate_int8(
    params: Params,
    state: Params,
    sequence_embeddings: jnp.ndarray,
    cfg: ProtNoteConfig,
    label_embeddings: Optional[jnp.ndarray] = None,
    label_latents: Optional[jnp.ndarray] = None,
    label_attention_mask: Optional[jnp.ndarray] = None,
    margin: float = 1.05,
) -> Tuple[float, ...]:
    """Calibrated static activation scales for ``pair_backend='tiled_int8'``.

    Projects one batch through the towers and measures each hidden GEMM's
    input range (ops.pair_scorer.calibrate_act_scales); feed the result into
    ``ProtNoteConfig(int8_act_scales=...)`` (or config key INT8_ACT_SCALES)
    to replace the per-row dynamic quantization with constant scales."""
    import numpy as np

    maxes = np.asarray(calibrate_int8_maxes(
        params, state, sequence_embeddings, cfg,
        label_embeddings=label_embeddings, label_latents=label_latents,
        label_attention_mask=label_attention_mask,
    ))
    return tuple(float(m) * margin / 127.0 for m in maxes)


# ----------------------------------------------------------------------
# full forward


def protnote_forward(
    params: Params,
    state: Params,
    sequence_embeddings: jnp.ndarray,  # (B, protein_embedding_dim) — frozen encoder output
    label_embeddings: Optional[jnp.ndarray],  # (L', D) or (L', T, D) when pooling == "all"
    cfg: ProtNoteConfig,
    train: bool = False,
    rng=None,
    label_attention_mask: Optional[jnp.ndarray] = None,
    example_mask: Optional[jnp.ndarray] = None,
    label_mask: Optional[jnp.ndarray] = None,
    label_latents: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Params]:
    """Score every sequence against every label row.

    Returns ((B, L) logits, new_state).  When
    ``cfg.inference_descriptions_per_label > 1`` and not training, incoming
    label rows are grouped in consecutive blocks of K per label and ensembled.
    ``example_mask`` (B,) / ``label_mask`` (L,) exclude padded rows from
    train-mode BatchNorm statistics.

    ``label_latents``: precomputed W_l projections (L', latent_dim) —
    eval-only fast path that skips the label tower entirely.  The eval label
    layout is constant across batches, so the trainer projects the resident
    label matrix ONCE per evaluation instead of per step (see
    compute_label_latents / Trainer.evaluate); at the reference inference
    shape (2 descriptions x 32k labels) the per-batch label-head MLP is ~8%
    of the step.
    """
    new_state = dict(state)
    if rng is not None:
        rng_noise, rng_p, rng_l, rng_o = jax.random.split(rng, 4)
    else:
        rng_noise = rng_p = rng_l = rng_o = None

    P_e, wp_s = projection_head_apply(
        params["W_p"], state["W_p"], sequence_embeddings.astype(cfg.compute_dtype),
        cfg, train,
        input_dropout=cfg.sequence_embedding_dropout, rng=rng_p,
        rows_mask=None if example_mask is None else example_mask[:, None],
    )
    new_state["W_p"] = wp_s

    if label_latents is not None:
        if train:
            raise ValueError("label_latents is an eval-only fast path")
        L_e = label_latents.astype(cfg.compute_dtype)
    else:
        L_f = label_embeddings
        if cfg.label_embedding_pooling_method == "all":
            if label_attention_mask is None:
                raise ValueError("pooling 'all' requires label_attention_mask")
            L_f = additive_attention(params["attn"], L_f, label_attention_mask)

        if train and cfg.label_embedding_noising_alpha > 0 and rng_noise is not None:
            L_f = noise_label_embeddings(
                L_f, cfg.label_embedding_noising_alpha, rng_noise
            )
        L_e, wl_s = projection_head_apply(
            params["W_l"], state["W_l"], L_f.astype(cfg.compute_dtype), cfg, train,
            input_dropout=cfg.label_embedding_dropout, rng=rng_l,
            rows_mask=None if label_mask is None else label_mask[:, None],
        )
        new_state["W_l"] = wl_s

    if cfg.feature_fusion == "similarity":
        logits = similarity_logits(P_e, L_e, cfg.temperature)
    elif cfg.feature_fusion.startswith("concatenation"):
        om_state = state.get("output_mlp")
        backend = cfg.pair_backend
        if backend == "auto":
            backend = "dense" if train else "tiled"
        if (
            train
            and cfg.train_label_tile > 0
            # "dense" forces the materialised path even when a streaming
            # tile is configured (parity/debug runs) — same contract as the
            # decomposed branch below
            and cfg.pair_backend != "dense"
            and cfg.feature_fusion in ("concatenation", "concatenation_diff")
            and cfg.dropout == 0.0
            and om_state is not None
        ):
            if cfg.train_fused_bn_vjp:
                raise ValueError(
                    "TRAIN_FUSED_BN_VJP applies to the decomposed dense "
                    "training path only; the streamed scorer "
                    "(TRAIN_STREAMING_LABEL_TILE > 0) has its own tiled "
                    "BN handling — unset one of the two"
                )
            from protnote_tpu.ops.streaming_train import pair_logits_streaming_train

            logits, om_s = pair_logits_streaming_train(
                params["output_mlp"], om_state, P_e, L_e, cfg.feature_fusion,
                example_mask=example_mask, label_mask=label_mask,
                label_tile=cfg.train_label_tile, compute_dtype=cfg.compute_dtype,
                cache_first=cfg.train_streaming_cache,
            )
            new_state["output_mlp"] = om_s
        elif (
            train
            # "dense" forces the materialised path; tiled_int8 is
            # inference-only so training falls through to the default
            and cfg.pair_backend in ("auto", "tiled_int8")
            and cfg.feature_fusion in ("concatenation", "concatenation_diff")
            and cfg.dropout == 0.0
            and om_state is not None
        ):
            # default training path: first layer decomposed per side with
            # analytic BN1 statistics — no (B*L, 2d) joint tensor, ~1/3
            # fewer step FLOPs than the materialised dense path
            from protnote_tpu.ops.streaming_train import pair_logits_dense_decomposed

            logits, om_s = pair_logits_dense_decomposed(
                params["output_mlp"], om_state, P_e, L_e, cfg.feature_fusion,
                example_mask=example_mask, label_mask=label_mask,
                compute_dtype=cfg.compute_dtype,
                remat=cfg.gradient_checkpointing,
                fused_bn_vjp=cfg.train_fused_bn_vjp,
            )
            new_state["output_mlp"] = om_s
        elif train or backend == "dense":
            pair_mask = None
            if train and (example_mask is not None or label_mask is not None):
                em = (
                    example_mask
                    if example_mask is not None
                    else jnp.ones(P_e.shape[0], P_e.dtype)
                )
                lm = (
                    label_mask
                    if label_mask is not None
                    else jnp.ones(L_e.shape[0], P_e.dtype)
                )
                pair_mask = em[:, None] * lm[None, :]
            # AMP-style: pair GEMMs in compute_dtype (bf16), BN stats in f32
            logits, om_s = pair_logits_dense(
                params["output_mlp"], om_state,
                P_e.astype(cfg.compute_dtype), L_e.astype(cfg.compute_dtype),
                cfg.feature_fusion,
                train=train, dropout=cfg.dropout, rng=rng_o, pair_mask=pair_mask,
                remat=cfg.gradient_checkpointing,
            )
            if om_s is not None:
                new_state["output_mlp"] = om_s
        else:
            folded = fold_output_mlp(
                params["output_mlp"], om_state, cfg.feature_fusion, cfg.latent_dim,
                dtype=cfg.compute_dtype,
            )
            if backend == "tiled_int8":
                # opt-in approximate path: hidden GEMMs on the MXU int8 pipe
                # (2x bf16 peak on v5e); see ops/pair_scorer.py.  The fold +
                # quantize of the (H, H) weights re-runs inside each jitted
                # eval call (params are jit inputs, so XLA cannot constant-
                # fold it) — ~19M elementwise ops, ~0.1 ms per batch, <0.1%
                # of the pair GEMMs; not worth hoisting per evaluation.
                from protnote_tpu.ops.pair_scorer import (
                    pair_logits_tiled_int8, quantize_folded,
                )

                logits = pair_logits_tiled_int8(
                    quantize_folded(folded, act_scales=cfg.int8_act_scales),
                    P_e, L_e,
                    label_tile=cfg.label_tile, compute_dtype=cfg.compute_dtype,
                )
            else:
                logits = pair_logits_tiled(
                    folded, P_e, L_e, label_tile=cfg.label_tile,
                    compute_dtype=cfg.compute_dtype,
                )
    else:
        raise ValueError(f"feature fusion {cfg.feature_fusion} not implemented")

    k = cfg.inference_descriptions_per_label
    if not train and k > 1:
        logits = ensemble_logits(logits, k)
    return logits, new_state
