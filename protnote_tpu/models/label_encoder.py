"""Frozen text label encoder.

The reference embeds GO/EC free-text descriptions with a frozen HF model
(E5-large-instruct or BioGPT) and mean/last-token/all pooling
(protnote/utils/models.py:115-285).  Embeddings are precomputed offline and
cached (bin/generate_label_embeddings.py) — the zero-shot capability comes
from running this encoder on *new* label text.

Backends:

* ``TorchLabelEncoder`` — HF transformers on CPU (or any torch device), used
  offline by the cache generator.  Requires the model weights to be present
  locally (zero-egress environments must pre-seed the HF cache).
* ``HashLabelEncoder`` — deterministic hashing-based stand-in producing
  unit-norm pseudo-embeddings; lets the entire pipeline (cache -> dataset ->
  training -> zero-shot eval) run end-to-end without model downloads.
  Semantically meaningless but structurally identical.

Pooling semantics match the reference exactly (pool_embeddings,
models.py:148-179): 'mean' excludes the SOS token when ``account_for_sos``,
'last_token' takes the final attended position, 'all' returns token states.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

# the EXACT task text + instruct format of the reference cache generator
# (bin/generate_label_embeddings.py:68-75) — a different instruction would
# produce a systematically shifted embedding cache, silently incomparable
# with reference checkpoints
E5_INSTRUCTION = (
    "Instruct: Identify the main categories, themes, or topics described in "
    "the following Gene Ontology (GO) term, which is used to detail a "
    "protein's function\nQuery: "
)
MAX_LABEL_TOKENS = 510  # E5 learned positions cap (reference models.py:115-135)


def pool_hidden_states(
    last_hidden: np.ndarray,  # (N, T, D)
    attention_mask: np.ndarray,  # (N, T)
    method: str,
    account_for_sos: bool = True,
) -> np.ndarray:
    mask = attention_mask.astype(np.float32)
    raw_len = mask.sum(axis=1, keepdims=True)
    # degenerate rows (mask sum <= 1 with SOS accounting) yield zeros, not
    # 0/0 = nan — kept in lockstep with pool_hidden_states_jnp
    length = np.maximum(raw_len - (1.0 if account_for_sos else 0.0), 1.0)
    if method == "mean":
        adj = mask.copy()
        if account_for_sos:
            adj[:, 0] = 0
        summed = (last_hidden * adj[..., None]).sum(axis=1)
        return summed / length
    if method == "last_token":
        idx = np.maximum(raw_len[:, 0] - 1, 0).astype(np.int64)
        return last_hidden[np.arange(last_hidden.shape[0]), idx]
    if method == "all":
        return last_hidden
    raise ValueError(f"unknown pooling method {method}")


class TorchLabelEncoder:
    """HF AutoModel wrapper, eval mode, batched no-grad embedding."""

    def __init__(self, checkpoint: str, device: str = "cpu",
                 pooling_method: str = "mean", local_files_only: bool = True):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self.checkpoint = checkpoint
        self.pooling_method = pooling_method
        self.device = device
        self.tokenizer = AutoTokenizer.from_pretrained(
            checkpoint, local_files_only=local_files_only
        )
        self.model = AutoModel.from_pretrained(
            checkpoint, local_files_only=local_files_only
        ).to(device)
        self.model.eval()
        self.dim = int(self.model.config.hidden_size)

    def tokenize(self, texts: Sequence[str]):
        return self.tokenizer(
            list(texts), padding="longest", truncation=True,
            max_length=MAX_LABEL_TOKENS, return_tensors="pt",
        )

    def token_counts(self, texts: Sequence[str]) -> List[int]:
        enc = self.tokenizer(
            list(texts), truncation=True, max_length=MAX_LABEL_TOKENS
        )
        return [len(x) for x in enc["input_ids"]]

    def embed(self, texts: Sequence[str], batch_size: int = 32,
              account_for_sos: bool = True) -> np.ndarray:
        import torch

        # pooling 'all' keeps the token axis: every chunk must pad to ONE
        # global width or the final concatenate fails on mismatched T
        fixed_len = (
            max(self.token_counts(texts)) if self.pooling_method == "all"
            else None
        )
        out = []
        for s in range(0, len(texts), batch_size):
            chunk = list(texts[s : s + batch_size])
            if fixed_len is None:
                toks = self.tokenize(chunk)
            else:
                toks = self.tokenizer(
                    chunk, padding="max_length", truncation=True,
                    max_length=fixed_len, return_tensors="pt",
                )
            toks = {k: v.to(self.device) for k, v in toks.items()}
            with torch.no_grad():
                hidden = self.model(**toks).last_hidden_state
            pooled = pool_hidden_states(
                hidden.float().cpu().numpy(),
                toks["attention_mask"].cpu().numpy(),
                self.pooling_method,
                account_for_sos=account_for_sos,
            )
            out.append(pooled.astype(np.float32))
        return np.concatenate(out, axis=0)


class HashLabelEncoder:
    """Deterministic pseudo-embedder (no weights, no network).

    Feature-hashes word n-grams into a ``dim``-d unit vector; similar texts
    get similar vectors, so ranking-style tests behave sanely.
    """

    def __init__(self, dim: int = 1024, pooling_method: str = "mean"):
        self.dim = dim
        self.pooling_method = pooling_method
        self.checkpoint = "hash"

    def token_counts(self, texts: Sequence[str]) -> List[int]:
        return [min(len(t.split()) + 2, MAX_LABEL_TOKENS) for t in texts]

    def _word_vec(self, word: str) -> np.ndarray:
        h = hashlib.sha256(word.encode()).digest()
        seed = int.from_bytes(h[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim).astype(np.float32)

    def embed(self, texts: Sequence[str], batch_size: int = 0,
              account_for_sos: bool = True) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            words = text.lower().split()
            if not words:
                words = ["<empty>"]
            vecs = [self._word_vec(w) for w in words]
            vecs += [self._word_vec(a + "_" + b) for a, b in zip(words, words[1:])]
            v = np.mean(vecs, axis=0)
            out[i] = v / (np.linalg.norm(v) + 1e-8)
        return out


class JaxLabelEncoder:
    """Native JAX text encoder (models/text_transformer.py) behind the same
    embed() interface — the jitted on-the-fly zero-shot path.

    Loads HF weights through the torch state dict once, then runs entirely in
    XLA (optionally on TPU, bf16).  Supports LoRA adapters and partial
    unfreezing via ``trainable_mask``.
    """

    def __init__(self, checkpoint: str, pooling_method: str = "mean",
                 local_files_only: bool = True, dtype=None):
        import jax
        import jax.numpy as jnp
        from transformers import AutoConfig, AutoModel, AutoTokenizer

        from protnote_tpu.models.text_transformer import (
            config_from_hf,
            from_hf_state_dict,
            pool_hidden_states_jnp,
            text_encoder_forward,
        )

        self.checkpoint = checkpoint
        self.pooling_method = pooling_method
        self.tokenizer = AutoTokenizer.from_pretrained(
            checkpoint, local_files_only=local_files_only
        )
        hf_cfg = AutoConfig.from_pretrained(checkpoint, local_files_only=local_files_only)
        model = AutoModel.from_pretrained(checkpoint, local_files_only=local_files_only)
        self.cfg = config_from_hf(hf_cfg)
        if dtype is not None:
            import dataclasses

            self.cfg = dataclasses.replace(self.cfg, dtype=dtype)
        # Commit the tower to the accelerator once: host-committed jit
        # arguments are re-copied to the device on EVERY call, which made the
        # chunked embed loop transfer-bound instead of compute-bound.
        self.params = jax.device_put(
            from_hf_state_dict(model.state_dict(), self.cfg), jax.devices()[0]
        )
        del model
        self.dim = self.cfg.hidden_size

        def fwd(params, ids, mask, account_for_sos):
            hidden = text_encoder_forward(params, ids, mask, self.cfg)
            return pool_hidden_states_jnp(
                hidden, mask, pooling_method, account_for_sos=account_for_sos
            )

        self._fwd = jax.jit(fwd, static_argnums=(3,))

    def token_counts(self, texts: Sequence[str]) -> List[int]:
        enc = self.tokenizer(list(texts), truncation=True, max_length=MAX_LABEL_TOKENS)
        return [len(x) for x in enc["input_ids"]]

    # bucketed token widths: tokenizing each chunk to its own 'longest'
    # would give nearly every chunk a distinct (B, T) shape and recompile
    # the whole tower per chunk — cache generation becomes compile-bound
    _LEN_BUCKETS = (32, 64, 96, 128, 192, 256, 384, MAX_LABEL_TOKENS)

    def embed(self, texts: Sequence[str], batch_size: int = 128,
              account_for_sos: bool = True) -> np.ndarray:
        import jax.numpy as jnp

        fixed_len = (
            max(self.token_counts(texts)) if self.pooling_method == "all"
            else None
        )
        pad_id = self.tokenizer.pad_token_id or 0
        out = []
        for s in range(0, len(texts), batch_size):
            chunk = list(texts[s : s + batch_size])
            toks = self.tokenizer(
                chunk, padding="longest", truncation=True,
                max_length=MAX_LABEL_TOKENS, return_tensors="np",
            )
            ids = toks["input_ids"].astype(np.int32)
            mask = toks["attention_mask"].astype(np.int32)
            if fixed_len is not None:
                width = fixed_len  # pooling 'all': ONE global token width
            else:
                width = next(b for b in self._LEN_BUCKETS
                             if b >= ids.shape[1])
            # pad tokens to the bucket and rows to the full batch (the last
            # partial chunk would otherwise compile its own shape); filler
            # rows get an all-zero mask and are sliced off below
            n = ids.shape[0]
            ids = np.pad(ids, ((0, batch_size - n), (0, width - ids.shape[1])),
                         constant_values=pad_id)
            mask = np.pad(mask, ((0, batch_size - n), (0, width - mask.shape[1])))
            pooled = self._fwd(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                account_for_sos,
            )
            out.append(np.asarray(pooled, dtype=np.float32)[:n])
        return np.concatenate(out, axis=0)


def build_label_encoder(checkpoint: str, pooling_method: str = "mean",
                        device: str = "cpu", allow_fallback: bool = True,
                        backend: str = "torch"):
    """Factory: HF encoder when available locally, hash stub otherwise.

    ``backend='jax'`` uses the native XLA implementation (TPU-jittable);
    ``'torch'`` uses HF directly (CPU offline cache generation).
    """
    if checkpoint == "hash":
        return HashLabelEncoder(pooling_method=pooling_method)
    try:
        if backend == "jax":
            return JaxLabelEncoder(checkpoint, pooling_method=pooling_method)
        return TorchLabelEncoder(checkpoint, device=device,
                                 pooling_method=pooling_method)
    except Exception as e:
        if not allow_fallback:
            raise
        import logging

        logging.getLogger(__name__).warning(
            "label encoder %s unavailable locally (%s); using HashLabelEncoder",
            checkpoint, e,
        )
        return HashLabelEncoder(pooling_method=pooling_method)
