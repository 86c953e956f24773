"""Seed-replicate aggregation + Welch t-test (reference Results.ipynb cell 42)."""

import json

import numpy as np
import pytest

from protnote_tpu.evaln.analysis import (
    aggregate_seed_replicates,
    compare_replicates,
    welch_t_test,
)


def test_welch_matches_scipy(rng):
    scipy_stats = pytest.importorskip("scipy.stats")
    a = rng.normal(0.60, 0.002, size=5)
    b = rng.normal(0.64, 0.003, size=5)
    t, p, dof = welch_t_test(a, b)
    ref = scipy_stats.ttest_ind(a, b, equal_var=False)
    assert t == pytest.approx(ref.statistic, rel=1e-9)
    assert p == pytest.approx(ref.pvalue, rel=1e-6)


def test_welch_identical_groups(rng):
    a = rng.normal(size=6)
    t, p, dof = welch_t_test(a, a.copy())
    assert t == pytest.approx(0.0, abs=1e-12)
    assert p == pytest.approx(1.0, abs=1e-9)


def _write_metric_json(path, seed, micro, macro):
    payload = [{
        "run": f"seed_{seed}",
        "metrics": {"test": {"map_micro": micro, "map_macro": macro}},
    }]
    path.write_text(json.dumps(payload))
    return str(path)


def test_aggregate_and_compare(tmp_path, rng):
    protnote_files, proteinfer_files = [], []
    for i, seed in enumerate([12, 22, 32, 42, 52]):
        protnote_files.append(_write_metric_json(
            tmp_path / f"pn_{seed}.json", seed,
            0.9042 + rng.normal(0, 0.0013), 0.6019 + rng.normal(0, 0.0010)))
        proteinfer_files.append(_write_metric_json(
            tmp_path / f"pi_{seed}.json", seed,
            0.9033 + rng.normal(0, 0.0008), 0.6418 + rng.normal(0, 0.0014)))

    agg = aggregate_seed_replicates(protnote_files, split="test")
    assert agg.loc["map_micro", "n"] == 5
    assert agg.loc["map_micro", "mean"] == pytest.approx(0.9042, abs=0.005)
    assert agg.loc["map_macro", "std"] < 0.01

    table = compare_replicates(
        {"protnote": protnote_files, "proteinfer": proteinfer_files},
        metric="map_macro",
    )
    # 0.6019 vs 0.6418 at std ~1e-3: decisively significant
    assert table.loc["proteinfer", "p_value"] < 1e-4
    assert table.loc["proteinfer", "t_vs_protnote"] > 0
    assert table.loc["protnote", "n"] == 5
