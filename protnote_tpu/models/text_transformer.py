"""Native JAX text encoders for the label tower.

The reference embeds label descriptions with HF torch models —
``intfloat/multilingual-e5-large-instruct`` (XLM-RoBERTa encoder) or
``microsoft/biogpt`` (GPT-style decoder) — via AutoModel
(protnote/utils/models.py:182-285, bin/main.py:268-275).  This module
reimplements both architectures functionally in JAX so the zero-shot
"embed new label text on the fly" path runs jitted on TPU, and so the
partial-unfreezing / LoRA training options (reference models.py:11-50,
loralib) have a native home:

* ``arch="bert"``: post-LayerNorm bidirectional encoder (BERT/RoBERTa/XLM-R
  family; covers E5).  Position ids follow fairseq semantics:
  ``cumsum(mask)*mask + pad_token_id``.
* ``arch="gpt"``: pre-LayerNorm causal decoder with learned positions at
  offset 2 and sqrt(d) embedding scaling (BioGPT/OPT family).

LoRA adapters (``B @ A`` with A kaiming-init, B zero-init, scaled alpha/r —
loralib semantics) can be attached to q/k/v/out/fc1/fc2 of the last N layers.
Converters load HF torch state dicts; golden tests compare against
``transformers`` reference implementations on identical weights
(tests/test_text_transformer.py).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from protnote_tpu.models.layers import Params, gemm_precision, init_linear, linear

LN_EPS_DEFAULT = 1e-5


@dataclass(frozen=True)
class TextEncoderConfig:
    arch: str = "bert"  # bert | gpt
    vocab_size: int = 250002
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    scale_embedding: bool = False  # BioGPT: sqrt(hidden)
    # "fairseq": RoBERTa/XLM-R position ids (pad offset + mask cumsum);
    # "absolute": plain BERT (arange from 0, mask-independent)
    position_style: str = "fairseq"
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def e5_large(cls) -> "TextEncoderConfig":
        return cls()  # defaults above are XLM-R large

    @classmethod
    def biogpt(cls) -> "TextEncoderConfig":
        return cls(
            arch="gpt", vocab_size=42384, hidden_size=1024, num_layers=24,
            num_heads=16, intermediate_size=4096, max_position_embeddings=1024,
            pad_token_id=1, scale_embedding=True,
        )


# ----------------------------------------------------------------------
# init


def _init_ln(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_text_encoder(key, cfg: TextEncoderConfig) -> Params:
    H, I = cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(key, cfg.num_layers * 6 + 8))

    def emb(k, n, d):
        return jax.random.normal(k, (n, d)) * 0.02

    params: Params = {
        "word_embeddings": emb(next(keys), cfg.vocab_size, H),
        "position_embeddings": emb(
            next(keys),
            cfg.max_position_embeddings + (2 if cfg.arch == "gpt" else 0),
            H,
        ),
    }
    if cfg.arch == "bert":
        params["token_type_embeddings"] = emb(next(keys), cfg.type_vocab_size, H)
        params["embeddings_ln"] = _init_ln(H)
    else:
        params["final_ln"] = _init_ln(H)

    layers: List[Params] = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "q": init_linear(next(keys), H, H),
                "k": init_linear(next(keys), H, H),
                "v": init_linear(next(keys), H, H),
                "o": init_linear(next(keys), H, H),
                "attn_ln": _init_ln(H),
                "fc1": init_linear(next(keys), H, I),
                "fc2": init_linear(next(keys), I, H),
                "ffn_ln": _init_ln(H),
            }
        )
    params["layers"] = layers
    return params


# ----------------------------------------------------------------------
# LoRA (loralib semantics: y += x @ A^T @ B^T * alpha/r; A kaiming, B zero)

LORA_TARGETS = ("q", "k", "v", "o", "fc1", "fc2")


def init_lora(key, cfg: TextEncoderConfig, rank: int, last_n_layers: int,
              targets: Tuple[str, ...] = LORA_TARGETS) -> Params:
    H, I = cfg.hidden_size, cfg.intermediate_size
    dims = {"q": (H, H), "k": (H, H), "v": (H, H), "o": (H, H),
            "fc1": (H, I), "fc2": (I, H)}
    lora: Dict[str, Params] = {}
    keys = iter(jax.random.split(key, max(last_n_layers, 1) * len(targets)))
    start = max(cfg.num_layers - last_n_layers, 0)
    for li in range(start, cfg.num_layers):
        entry = {}
        for t in targets:
            d_in, d_out = dims[t]
            bound = 1.0 / math.sqrt(rank)
            entry[t] = {
                "A": jax.random.uniform(next(keys), (rank, d_in), jnp.float32,
                                        -bound, bound),
                "B": jnp.zeros((d_out, rank)),
            }
        lora[str(li)] = entry
    return lora


def _lora_delta(lp: Params, x: jnp.ndarray, scaling: float) -> jnp.ndarray:
    return (x @ lp["A"].T.astype(x.dtype)) @ lp["B"].T.astype(x.dtype) * scaling


# ----------------------------------------------------------------------
# forward


def _layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _attention(lp: Params, x: jnp.ndarray, bias_mask: jnp.ndarray,
               cfg: TextEncoderConfig, lora_entry: Optional[Params],
               lora_scaling: float) -> jnp.ndarray:
    B, T, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    def proj(name):
        y = linear(lp[name], x)
        if lora_entry is not None and name in lora_entry:
            y = y + _lora_delta(lora_entry[name], x, lora_scaling)
        return y

    q = proj("q").reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    k = proj("k").reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    v = proj("v").reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=gemm_precision(q.dtype)) / math.sqrt(hd)
    scores = scores + bias_mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32,
                     precision=gemm_precision(v.dtype)).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H)
    out = linear(lp["o"], ctx)
    if lora_entry is not None and "o" in lora_entry:
        out = out + _lora_delta(lora_entry["o"], ctx, lora_scaling)
    return out


def text_encoder_forward(
    params: Params,
    input_ids: jnp.ndarray,  # (B, T) int32
    attention_mask: jnp.ndarray,  # (B, T) 1=real
    cfg: TextEncoderConfig,
    lora: Optional[Params] = None,
    lora_alpha: float = 8.0,
    lora_rank: int = 4,
) -> jnp.ndarray:
    """Returns last_hidden_state (B, T, H)."""
    mask = attention_mask.astype(jnp.int32)
    H = cfg.hidden_size
    lora_scaling = lora_alpha / max(lora_rank, 1)

    we = params["word_embeddings"]
    x = we[input_ids].astype(cfg.dtype)

    if cfg.arch == "bert":
        if cfg.position_style == "fairseq":
            # RoBERTa/XLM-R: padding positions keep pad_token_id
            pos_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        else:
            # plain BERT: absolute positions from 0, mask-independent
            pos_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[1], dtype=jnp.int32),
                input_ids.shape,
            )
        x = x + params["position_embeddings"][pos_ids].astype(cfg.dtype)
        x = x + params["token_type_embeddings"][0].astype(cfg.dtype)
        x = _layer_norm(params["embeddings_ln"], x, cfg.layer_norm_eps)
        attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)
    elif cfg.arch == "gpt":
        if cfg.scale_embedding:
            x = x * math.sqrt(H)
        pos_ids = jnp.cumsum(mask, axis=1) * mask - 1
        x = x + params["position_embeddings"][pos_ids + 2].astype(cfg.dtype)
        T = input_ids.shape[1]
        causal = jnp.tril(jnp.ones((T, T), bool))
        keep = causal[None, None] & (mask[:, None, None, :] > 0)
        attn_bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)
    else:
        raise ValueError(cfg.arch)

    for li, lp in enumerate(params["layers"]):
        lora_entry = lora.get(str(li)) if lora else None
        if cfg.arch == "bert":
            # post-LN (BERT/XLM-R)
            a = _attention(lp, x, attn_bias, cfg, lora_entry, lora_scaling)
            x = _layer_norm(lp["attn_ln"], x + a, cfg.layer_norm_eps)
            # per-target guards: attention-only LoRA (targets=("q","v"))
            # carries no fc1/fc2 entries
            h1pre = linear(lp["fc1"], x)
            if lora_entry is not None and "fc1" in lora_entry:
                h1pre = h1pre + _lora_delta(lora_entry["fc1"], x, lora_scaling)
            h1 = jax.nn.gelu(h1pre, approximate=False)
            f = linear(lp["fc2"], h1)
            if lora_entry is not None and "fc2" in lora_entry:
                f = f + _lora_delta(lora_entry["fc2"], h1, lora_scaling)
            x = _layer_norm(lp["ffn_ln"], x + f, cfg.layer_norm_eps)
        else:
            # pre-LN (BioGPT)
            h = _layer_norm(lp["attn_ln"], x, cfg.layer_norm_eps)
            x = x + _attention(lp, h, attn_bias, cfg, lora_entry, lora_scaling)
            h = _layer_norm(lp["ffn_ln"], x, cfg.layer_norm_eps)
            h1 = linear(lp["fc1"], h)
            if lora_entry is not None and "fc1" in lora_entry:
                h1 = h1 + _lora_delta(lora_entry["fc1"], h, lora_scaling)
            h1 = jax.nn.gelu(h1, approximate=False)
            f = linear(lp["fc2"], h1)
            if lora_entry is not None and "fc2" in lora_entry:
                f = f + _lora_delta(lora_entry["fc2"], h1, lora_scaling)
            x = x + f

    if cfg.arch == "gpt":
        x = _layer_norm(params["final_ln"], x, cfg.layer_norm_eps)
    return x


def pool_hidden_states_jnp(last_hidden: jnp.ndarray, attention_mask: jnp.ndarray,
                           method: str, account_for_sos: bool = True) -> jnp.ndarray:
    """jnp twin of label_encoder.pool_hidden_states (reference
    models.py:148-179)."""
    mask = attention_mask.astype(jnp.float32)
    raw_len = mask.sum(axis=1, keepdims=True)
    if method == "mean":
        adj = mask
        if account_for_sos:
            adj = adj.at[:, 0].set(0.0)
        summed = (last_hidden.astype(jnp.float32) * adj[..., None]).sum(axis=1)
        denom = raw_len - (1.0 if account_for_sos else 0.0)
        # a degenerate row (mask sum <= 1 with SOS accounting) must yield
        # zeros, not 0/0 = nan propagating into every logit of that label
        return summed / jnp.maximum(denom, 1.0)
    if method == "last_token":
        idx = jnp.maximum(raw_len[:, 0] - 1, 0).astype(jnp.int32)
        return last_hidden[jnp.arange(last_hidden.shape[0]), idx].astype(jnp.float32)
    if method == "all":
        return last_hidden
    raise ValueError(method)


# ----------------------------------------------------------------------
# trainable partition (reference biogpt_train_last_n_layers, models.py:32-50)


def trainable_mask(params: Params, cfg: TextEncoderConfig, last_n_layers: int,
                   lora_only: bool = False) -> Params:
    """Boolean pytree: True where the parameter should receive gradients."""
    start = max(cfg.num_layers - last_n_layers, 0)

    def layer_mask(li: int, subtree):
        on = (li >= start) and not lora_only
        return jax.tree_util.tree_map(lambda _: on, subtree)

    out = jax.tree_util.tree_map(lambda _: False, params)
    out["layers"] = [layer_mask(li, lp) for li, lp in enumerate(params["layers"])]
    return out


# ----------------------------------------------------------------------
# HF torch state-dict converters


def _t(v) -> np.ndarray:
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def from_hf_state_dict(sd: Dict[str, Any], cfg: TextEncoderConfig) -> Params:
    """Map an HF torch state dict (XLMRobertaModel / BioGptModel layouts)
    onto our parameter tree."""
    sd = {k: _t(v) for k, v in sd.items()}

    def strip(prefixes):
        for p in prefixes:
            if any(k.startswith(p) for k in sd):
                return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
        return sd

    if cfg.arch == "bert":
        d = strip(["roberta.", "model."])
        params: Params = {
            "word_embeddings": jnp.asarray(d["embeddings.word_embeddings.weight"]),
            "position_embeddings": jnp.asarray(d["embeddings.position_embeddings.weight"]),
            "token_type_embeddings": jnp.asarray(d["embeddings.token_type_embeddings.weight"]),
            "embeddings_ln": {
                "scale": jnp.asarray(d["embeddings.LayerNorm.weight"]),
                "bias": jnp.asarray(d["embeddings.LayerNorm.bias"]),
            },
        }
        layers = []
        for i in range(cfg.num_layers):
            pre = f"encoder.layer.{i}."
            layers.append({
                "q": _lin(d, pre + "attention.self.query"),
                "k": _lin(d, pre + "attention.self.key"),
                "v": _lin(d, pre + "attention.self.value"),
                "o": _lin(d, pre + "attention.output.dense"),
                "attn_ln": _ln(d, pre + "attention.output.LayerNorm"),
                "fc1": _lin(d, pre + "intermediate.dense"),
                "fc2": _lin(d, pre + "output.dense"),
                "ffn_ln": _ln(d, pre + "output.LayerNorm"),
            })
        params["layers"] = layers
        return params

    # BioGPT
    d = strip(["biogpt.", "model."])
    params = {
        "word_embeddings": jnp.asarray(d["embed_tokens.weight"]),
        "position_embeddings": jnp.asarray(d["embed_positions.weight"]),
        "final_ln": _ln(d, "layer_norm"),
    }
    layers = []
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        layers.append({
            "q": _lin(d, pre + "self_attn.q_proj"),
            "k": _lin(d, pre + "self_attn.k_proj"),
            "v": _lin(d, pre + "self_attn.v_proj"),
            "o": _lin(d, pre + "self_attn.out_proj"),
            "attn_ln": _ln(d, pre + "self_attn_layer_norm"),
            "fc1": _lin(d, pre + "fc1"),
            "fc2": _lin(d, pre + "fc2"),
            "ffn_ln": _ln(d, pre + "final_layer_norm"),
        })
    params["layers"] = layers
    return params


def _lin(d: Dict, prefix: str) -> Params:
    return {
        "kernel": jnp.asarray(d[prefix + ".weight"].T),
        "bias": jnp.asarray(d[prefix + ".bias"]),
    }


def _ln(d: Dict, prefix: str) -> Params:
    return {
        "scale": jnp.asarray(d[prefix + ".weight"]),
        "bias": jnp.asarray(d[prefix + ".bias"]),
    }


def config_from_hf(hf_config) -> TextEncoderConfig:
    """Derive a TextEncoderConfig from a transformers config object."""
    mt = getattr(hf_config, "model_type", "")
    if mt in ("xlm-roberta", "roberta", "bert"):
        return TextEncoderConfig(
            arch="bert",
            # plain BERT uses absolute arange positions; RoBERTa-family uses
            # fairseq pad-offset ids — mixing them shifts every position
            # embedding by one row and silently diverges from transformers
            position_style="absolute" if mt == "bert" else "fairseq",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            type_vocab_size=getattr(hf_config, "type_vocab_size", 1),
            pad_token_id=hf_config.pad_token_id or 0,
            layer_norm_eps=getattr(hf_config, "layer_norm_eps", 1e-5),
        )
    if mt == "biogpt":
        return TextEncoderConfig(
            arch="gpt",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            pad_token_id=hf_config.pad_token_id or 1,
            layer_norm_eps=getattr(hf_config, "layer_norm_eps", 1e-5),
            scale_embedding=getattr(hf_config, "scale_embedding", True),
        )
    raise ValueError(f"unsupported HF model_type {mt}")
