"""Streaming evaluation metrics for huge multi-label problems.

Reimplements the reference metric surface (protnote/utils/evaluation.py:20-271
— torchmetrics Precision/Recall/F1 micro/macro/weighted, AveragePrecision
micro/macro, and the custom samplewise metrics) with TPU-friendly streaming
accumulators:

* :class:`ConfusionAccumulator` — per-label tp/fp/fn counters updated on
  device (the counters live in the train step and reduce over the mesh with a
  ``psum``, mirroring ProtNoteTrainer's dist.reduce, ProtNoteTrainer.py:636-649).
* :class:`ExactAUPRC` — exact mAP micro/macro; scores stream to host in
  float16 shards, sorted once at the end (the reference computes exact AUPRC
  on CPU via torcheval, ProtNoteTrainer.py:477-489).
* :class:`BinnedAUPRC` — on-device histogram-based mAP (the ``ESTIMATE_MAP``
  fallback).
* :class:`SamplewiseAccumulator` — samplewise precision/recall/F1/coverage
  (evaluation.py:20-104).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import jax
    import jax.numpy as jnp

    _HAS_JAX = True
except Exception:  # pragma: no cover
    _HAS_JAX = False


# ----------------------------------------------------------------------
# Average precision (exact, numpy)


def average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """AP = sum_n (R_n - R_{n-1}) * P_n over descending score thresholds.

    Matches sklearn.metrics.average_precision_score / torchmetrics
    AveragePrecision(task='binary'). Returns NaN when there are no positives.
    """
    targets = targets.astype(np.float64)
    n_pos = targets.sum()
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-scores, kind="stable")
    t = targets[order]
    tp = np.cumsum(t)
    fp = np.cumsum(1.0 - t)
    precision = tp / (tp + fp)
    # Group ties: only the last entry at each unique score counts.
    s = scores[order]
    distinct = np.r_[s[1:] != s[:-1], True]
    tp_d = tp[distinct]
    prec_d = precision[distinct]
    recall_d = tp_d / n_pos
    recall_prev = np.r_[0.0, recall_d[:-1]]
    return float(np.sum((recall_d - recall_prev) * prec_d))


# ----------------------------------------------------------------------
# Threshold-based confusion counters


class ConfusionAccumulator:
    """Per-label tp/fp/fn at a fixed decision threshold."""

    def __init__(self, num_labels: int, threshold: float = 0.5):
        self.threshold = threshold
        self.tp = np.zeros(num_labels, dtype=np.int64)
        self.fp = np.zeros(num_labels, dtype=np.int64)
        self.fn = np.zeros(num_labels, dtype=np.int64)

    def update(self, probs: np.ndarray, targets: np.ndarray,
               mask: Optional[np.ndarray] = None) -> None:
        pred = probs > self.threshold
        t = targets.astype(bool)
        if mask is not None:
            keep = mask.astype(bool)
            pred = pred[keep]
            t = t[keep]
        self.tp += np.sum(pred & t, axis=0)
        self.fp += np.sum(pred & ~t, axis=0)
        self.fn += np.sum(~pred & t, axis=0)

    def merge_counts(self, tp: np.ndarray, fp: np.ndarray, fn: np.ndarray) -> None:
        """Fold in counters accumulated on-device (already mesh-reduced)."""
        self.tp += tp.astype(np.int64)
        self.fp += fp.astype(np.int64)
        self.fn += fn.astype(np.int64)

    def compute(self) -> Dict[str, float]:
        return confusion_metrics(self.tp, self.fp, self.fn)


def confusion_metrics(tp: np.ndarray, fp: np.ndarray, fn: np.ndarray) -> Dict[str, float]:
    """micro/macro/weighted precision, recall, F1 from per-label counters.

    Semantics match torchmetrics multilabel metrics: macro averages include
    all labels (labels with no positives and no predictions contribute 0).
    """
    eps = 1e-12
    out: Dict[str, float] = {}
    # micro
    TP, FP, FN = tp.sum(), fp.sum(), fn.sum()
    p_micro = TP / max(TP + FP, 1)
    r_micro = TP / max(TP + FN, 1)
    out["precision_micro"] = float(p_micro)
    out["recall_micro"] = float(r_micro)
    out["f1_micro"] = float(2 * p_micro * r_micro / max(p_micro + r_micro, eps))
    # per-label
    p = tp / np.maximum(tp + fp, 1)
    r = tp / np.maximum(tp + fn, 1)
    f1 = 2 * p * r / np.maximum(p + r, eps)
    out["precision_macro"] = float(p.mean())
    out["recall_macro"] = float(r.mean())
    out["f1_macro"] = float(f1.mean())
    support = tp + fn
    w = support / max(support.sum(), 1)
    out["precision_weighted"] = float((p * w).sum())
    out["recall_weighted"] = float((r * w).sum())
    out["f1_weighted"] = float((f1 * w).sum())
    return out


# ----------------------------------------------------------------------
# Samplewise metrics (reference evaluation.py:20-104)


class SamplewiseAccumulator:
    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold
        self.precision_sum = 0.0
        self.precision_count = 0
        self.recall_sum = 0.0
        self.recall_count = 0
        self.covered = 0
        self.total = 0

    def update(self, probs: np.ndarray, targets: np.ndarray,
               mask: Optional[np.ndarray] = None) -> None:
        if mask is not None:
            keep = mask.astype(bool)
            probs, targets = probs[keep], targets[keep]
        pred = probs > self.threshold
        t = targets.astype(bool)
        tp = (pred & t).sum(axis=1)
        # precision only over samples with >=1 positive prediction
        has_pred = pred.any(axis=1)
        if has_pred.any():
            p = tp[has_pred] / pred[has_pred].sum(axis=1)
            self.precision_sum += float(p.sum())
            self.precision_count += int(has_pred.sum())
        denom = np.maximum(t.sum(axis=1), 1)
        r = tp / denom
        self.recall_sum += float(r.sum())
        self.recall_count += probs.shape[0]
        self.covered += int(has_pred.sum())
        self.total += probs.shape[0]

    def compute(self) -> Dict[str, float]:
        precision = (
            self.precision_sum / self.precision_count if self.precision_count else 0.0
        )
        recall = self.recall_sum / max(self.recall_count, 1)
        f1 = 2 * precision * recall / (precision + recall + 1e-6)
        return {
            "precision_samplewise": precision,
            "recall_samplewise": recall,
            "f1_samplewise": f1,
            "coverage_samplewise": self.covered / max(self.total, 1),
        }


# ----------------------------------------------------------------------
# Exact streaming AUPRC


class ExactAUPRC:
    """Exact micro/macro mAP; stores float16 score shards on host."""

    def __init__(self, num_labels: int, store_dtype=np.float16):
        self.num_labels = num_labels
        self.store_dtype = store_dtype
        self._scores: List[np.ndarray] = []
        self._targets: List[np.ndarray] = []

    def update(self, probs: np.ndarray, targets: np.ndarray,
               mask: Optional[np.ndarray] = None) -> None:
        if mask is not None:
            keep = mask.astype(bool)
            probs, targets = probs[keep], targets[keep]
        self._scores.append(np.asarray(probs, dtype=self.store_dtype))
        self._targets.append(np.asarray(targets, dtype=bool))

    def compute(self) -> Dict[str, float]:
        if not self._scores:
            return {"map_micro": float("nan"), "map_macro": float("nan")}
        scores = np.concatenate(self._scores, axis=0)
        targets = np.concatenate(self._targets, axis=0)
        micro = average_precision(
            scores.reshape(-1).astype(np.float32), targets.reshape(-1)
        )
        aps = []
        for j in range(scores.shape[1]):
            col_t = targets[:, j]
            if not col_t.any():
                continue  # undefined labels excluded from macro mean
            aps.append(average_precision(scores[:, j].astype(np.float32), col_t))
        macro = float(np.mean(aps)) if aps else float("nan")
        return {"map_micro": float(micro), "map_macro": macro}

    def per_label(self) -> np.ndarray:
        scores = np.concatenate(self._scores, axis=0)
        targets = np.concatenate(self._targets, axis=0)
        out = np.full(self.num_labels, np.nan)
        for j in range(scores.shape[1]):
            if targets[:, j].any():
                out[j] = average_precision(scores[:, j].astype(np.float32), targets[:, j])
        return out


# ----------------------------------------------------------------------
# Binned (on-device) AUPRC — the ESTIMATE_MAP fallback


class BinnedAUPRC:
    """Histogram-based AP estimate; update() can run inside jit.

    Maintains per-label histograms of positive/negative counts over
    ``num_bins`` equal-width probability bins.
    """

    def __init__(self, num_labels: int, num_bins: int = 512):
        self.num_labels = num_labels
        self.num_bins = num_bins
        self.pos = np.zeros((num_labels, num_bins), dtype=np.int64)
        self.neg = np.zeros((num_labels, num_bins), dtype=np.int64)

    @staticmethod
    def device_update(pos, neg, probs, targets, mask=None, num_bins: int = 512):
        """Pure jax update: returns new (pos, neg) histograms.

        pos/neg: (L, num_bins) int32. probs/targets: (B, L)."""
        L = pos.shape[0]
        bins = jnp.clip((probs * num_bins).astype(jnp.int32), 0, num_bins - 1)
        t = targets.astype(bool)
        if mask is not None:
            valid = mask.astype(bool)[:, None]
        else:
            valid = jnp.ones(probs.shape, bool)
        label_idx = jnp.broadcast_to(jnp.arange(L)[None, :], probs.shape)
        flat = (label_idx * num_bins + bins).reshape(-1)
        is_pos = (t & valid).reshape(-1)
        is_neg = (~t & valid).reshape(-1)
        pos = pos.reshape(-1).at[flat].add(is_pos.astype(pos.dtype)).reshape(L, num_bins)
        neg = neg.reshape(-1).at[flat].add(is_neg.astype(neg.dtype)).reshape(L, num_bins)
        return pos, neg

    def merge(self, pos: np.ndarray, neg: np.ndarray) -> None:
        self.pos += np.asarray(pos, dtype=np.int64)
        self.neg += np.asarray(neg, dtype=np.int64)

    def update(self, probs: np.ndarray, targets: np.ndarray,
               mask: Optional[np.ndarray] = None) -> None:
        bins = np.clip((probs * self.num_bins).astype(np.int64), 0, self.num_bins - 1)
        t = targets.astype(bool)
        if mask is not None:
            keep = mask.astype(bool)
            bins, t = bins[keep], t[keep]
        for j in range(self.num_labels):
            self.pos[j] += np.bincount(bins[:, j][t[:, j]], minlength=self.num_bins)
            self.neg[j] += np.bincount(bins[:, j][~t[:, j]], minlength=self.num_bins)

    @staticmethod
    def _ap_from_hist(pos: np.ndarray, neg: np.ndarray) -> np.ndarray:
        # descending threshold: cumulate from the top bin down
        tp = np.cumsum(pos[..., ::-1], axis=-1)
        fp = np.cumsum(neg[..., ::-1], axis=-1)
        n_pos = tp[..., -1:]
        precision = tp / np.maximum(tp + fp, 1)
        recall = tp / np.maximum(n_pos, 1)
        recall_prev = np.concatenate(
            [np.zeros_like(recall[..., :1]), recall[..., :-1]], axis=-1
        )
        ap = np.sum((recall - recall_prev) * precision, axis=-1)
        return np.where(n_pos[..., 0] > 0, ap, np.nan)

    def compute(self) -> Dict[str, float]:
        micro = self._ap_from_hist(self.pos.sum(0), self.neg.sum(0))
        per_label = self._ap_from_hist(self.pos, self.neg)
        macro = float(np.nanmean(per_label)) if np.any(~np.isnan(per_label)) else float("nan")
        return {"map_micro": float(micro), "map_macro": macro}


# ----------------------------------------------------------------------
# Collection facade (reference EvalMetrics, evaluation.py:128-271)


class EvalMetrics:
    """Bundles the metric accumulators behind one update()/compute() pair."""

    def __init__(self, num_labels: int, threshold: Optional[float] = 0.5,
                 map_estimate: bool = False, num_bins: int = 512):
        self.num_labels = num_labels
        self.threshold = threshold
        self.confusion = (
            ConfusionAccumulator(num_labels, threshold) if threshold is not None else None
        )
        self.samplewise = (
            SamplewiseAccumulator(threshold) if threshold is not None else None
        )
        self.auprc = (
            BinnedAUPRC(num_labels, num_bins) if map_estimate else ExactAUPRC(num_labels)
        )

    def update(self, probs: np.ndarray, targets: np.ndarray,
               mask: Optional[np.ndarray] = None) -> None:
        probs = np.asarray(probs)
        targets = np.asarray(targets)
        if self.confusion is not None:
            self.confusion.update(probs, targets, mask)
        if self.samplewise is not None:
            self.samplewise.update(probs, targets, mask)
        self.auprc.update(probs, targets, mask)

    def compute(self, prefix: Optional[str] = None) -> Dict[str, float]:
        out: Dict[str, float] = {}
        if self.confusion is not None:
            out.update(self.confusion.compute())
        if self.samplewise is not None:
            out.update(self.samplewise.compute())
        out.update(self.auprc.compute())
        if prefix:
            out = {f"{prefix}_{k}": v for k, v in out.items()}
        return out
