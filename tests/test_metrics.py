"""Metric library vs sklearn oracles."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, precision_recall_fscore_support

from protnote_tpu.evaln.metrics import (
    BinnedAUPRC,
    ConfusionAccumulator,
    EvalMetrics,
    ExactAUPRC,
    SamplewiseAccumulator,
    average_precision,
)


@pytest.fixture
def data(rng):
    probs = rng.random((300, 12)).astype(np.float32)
    targets = (rng.random((300, 12)) < 0.2).astype(np.int64)
    targets[:, 3] = 0  # a label with no positives
    return probs, targets


def test_average_precision_matches_sklearn(rng):
    for _ in range(5):
        scores = rng.random(500).astype(np.float32)
        targets = (rng.random(500) < 0.3).astype(np.int64)
        ours = average_precision(scores, targets)
        ref = average_precision_score(targets, scores)
        assert abs(ours - ref) < 1e-6


def test_average_precision_with_ties(rng):
    scores = np.round(rng.random(500) * 10) / 10  # heavy ties
    targets = (rng.random(500) < 0.3).astype(np.int64)
    ours = average_precision(scores.astype(np.float32), targets)
    ref = average_precision_score(targets, scores)
    assert abs(ours - ref) < 1e-6


def test_exact_auprc_micro_macro(data):
    probs, targets = data
    m = ExactAUPRC(num_labels=12)
    # stream in chunks
    for s in range(0, 300, 64):
        m.update(probs[s : s + 64], targets[s : s + 64])
    res = m.compute()
    ref_micro = average_precision_score(targets.reshape(-1), probs.reshape(-1))
    aps = [
        average_precision_score(targets[:, j], probs[:, j])
        for j in range(12)
        if targets[:, j].any()
    ]
    # float16 storage costs a little precision
    assert abs(res["map_micro"] - ref_micro) < 2e-3
    assert abs(res["map_macro"] - np.mean(aps)) < 2e-3


def test_binned_auprc_close_to_exact(data):
    probs, targets = data
    exact = ExactAUPRC(num_labels=12)
    binned = BinnedAUPRC(num_labels=12, num_bins=2048)
    exact.update(probs, targets)
    binned.update(probs, targets)
    e, b = exact.compute(), binned.compute()
    assert abs(e["map_micro"] - b["map_micro"]) < 0.01
    assert abs(e["map_macro"] - b["map_macro"]) < 0.02


def test_binned_device_update_matches_host(data):
    import jax.numpy as jnp

    probs, targets = data
    host = BinnedAUPRC(num_labels=12, num_bins=256)
    host.update(probs, targets)
    pos = jnp.zeros((12, 256), jnp.int32)
    neg = jnp.zeros((12, 256), jnp.int32)
    pos, neg = BinnedAUPRC.device_update(pos, neg, jnp.array(probs),
                                         jnp.array(targets), num_bins=256)
    np.testing.assert_array_equal(np.asarray(pos), host.pos)
    np.testing.assert_array_equal(np.asarray(neg), host.neg)


def test_confusion_matches_sklearn(data):
    probs, targets = data
    acc = ConfusionAccumulator(num_labels=12, threshold=0.5)
    for s in range(0, 300, 100):
        acc.update(probs[s : s + 100], targets[s : s + 100])
    res = acc.compute()
    pred = (probs > 0.5).astype(int)
    for avg in ["micro", "macro", "weighted"]:
        p, r, f, _ = precision_recall_fscore_support(
            targets, pred, average=avg, zero_division=0
        )
        assert abs(res[f"precision_{avg}"] - p) < 1e-6, avg
        assert abs(res[f"recall_{avg}"] - r) < 1e-6, avg
        assert abs(res[f"f1_{avg}"] - f) < 1e-4, avg


def test_samplewise(data):
    probs, targets = data
    acc = SamplewiseAccumulator(threshold=0.5)
    acc.update(probs, targets)
    res = acc.compute()
    pred = probs > 0.5
    has_pred = pred.any(axis=1)
    tp = (pred & targets.astype(bool)).sum(axis=1)
    ref_prec = (tp[has_pred] / pred[has_pred].sum(axis=1)).mean()
    ref_cov = has_pred.mean()
    assert abs(res["precision_samplewise"] - ref_prec) < 1e-6
    assert abs(res["coverage_samplewise"] - ref_cov) < 1e-6


def test_eval_metrics_mask(data):
    probs, targets = data
    mask = np.ones(300, bool)
    mask[250:] = False
    m1 = EvalMetrics(num_labels=12)
    m1.update(probs, targets, mask)
    m2 = EvalMetrics(num_labels=12)
    m2.update(probs[:250], targets[:250])
    r1, r2 = m1.compute(), m2.compute()
    for k in r1:
        if not np.isnan(r1[k]):
            assert abs(r1[k] - r2[k]) < 1e-9, k


def test_exact_auprc_tolerates_nan_scores(rng):
    """A diverged checkpoint emitting NaN probabilities must not crash the
    eval mid-stream (the logit-grid keys once cast NaN to INT64_MIN and
    np.bincount raised); the accumulator reports NaN metrics instead."""
    from protnote_tpu.evaln.metrics import ExactAUPRC

    m = ExactAUPRC(num_labels=4)
    probs = rng.random((6, 4)).astype(np.float32)
    probs[2, 1] = np.nan
    targets = rng.random((6, 4)) < 0.4
    m.update(probs, targets)  # must not raise
    m.update(rng.random((6, 4)).astype(np.float32), targets)
    out = m.compute()
    assert np.isnan(out["map_micro"]) and np.isnan(out["map_macro"])


def test_exact_auprc_f16_store_uses_histogram_micro(rng):
    """store_dtype=f16 (the halve-the-spool option) must not silently fall
    back to sorting the quantised shards — the logit-grid histogram built
    from the unquantised stream is the more accurate micro basis."""
    from sklearn.metrics import average_precision_score

    from protnote_tpu.evaln.metrics import ExactAUPRC

    probs = rng.random((400, 8)).astype(np.float32)
    targets = rng.random((400, 8)) < 0.1
    m16 = ExactAUPRC(num_labels=8, store_dtype=np.float16)
    m16.update(probs, targets)
    sk = average_precision_score(targets.reshape(-1), probs.reshape(-1))
    # histogram error ~1e-5 at this scale; an f16 shard sort would sit at
    # the f16 tie-collapse level (~1e-3 here)
    assert abs(m16.compute()["map_micro"] - sk) < 5e-4
