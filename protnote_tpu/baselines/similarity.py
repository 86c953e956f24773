"""Embedding-similarity zero-shot baseline.

Reference: bin/run_baseline.py:138-157 — for each unseen (zero-shot) label,
find the nearest *trained* label by cosine similarity of their text
embeddings and reuse the supervised model's logits for that trained label.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def nearest_trained_labels(
    zero_shot_embeddings: np.ndarray,  # (Z, D)
    trained_embeddings: np.ndarray,  # (K, D)
    chunk: int = 4096,
) -> np.ndarray:
    """argmax cosine similarity row-wise, chunked to bound memory."""
    zn = zero_shot_embeddings / np.maximum(
        np.linalg.norm(zero_shot_embeddings, axis=1, keepdims=True), 1e-12
    )
    tn = trained_embeddings / np.maximum(
        np.linalg.norm(trained_embeddings, axis=1, keepdims=True), 1e-12
    )
    out = np.zeros(len(zn), dtype=np.int64)
    for s in range(0, len(zn), chunk):
        sims = zn[s : s + chunk] @ tn.T
        out[s : s + chunk] = np.argmax(sims, axis=1)
    return out


def transfer_logits(
    supervised_logits: np.ndarray,  # (N, K) logits over trained vocab
    zero_shot_embeddings: np.ndarray,  # (Z, D)
    trained_embeddings: np.ndarray,  # (K, D)
) -> np.ndarray:
    """(N, Z) zero-shot logits: each unseen label reuses its nearest trained
    label's column."""
    idx = nearest_trained_labels(zero_shot_embeddings, trained_embeddings)
    return supervised_logits[:, idx]
