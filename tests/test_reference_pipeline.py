"""Pipeline-level parity: the reference's OWN ProtNoteTrainer.evaluate
(ProtNoteTrainer.py:449-673) + collator + DataLoader, vs our cli/main.py
evaluation, on a shared tiny dataset + transplanted checkpoint (VERDICT r3
weak #1).  Module parity can't see composition bugs in batching / masking /
thresholding / metric aggregation — this can."""

import os

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_ROOT, "protnote")),
    reason="reference checkout unavailable",
)


@pytest.fixture(scope="module")
def parity_results(tmp_path_factory):
    from protnote_tpu.core.reference_pipeline import run_pipeline_parity

    root = tmp_path_factory.mktemp("pipeline_parity")
    return run_pipeline_parity(REFERENCE_ROOT, workdir=str(root))


def test_metric_dict_parity(parity_results):
    for key in ("pipeline_loss", "pipeline_map_micro", "pipeline_map_macro",
                "pipeline_f1_micro", "pipeline_f1_macro"):
        entry = parity_results[key]
        assert entry["status"] == "PASS", (key, entry)
        # the numbers must also be non-degenerate (a broken pipeline that
        # scores everything 0.5 would "agree" trivially on some metrics)
        assert np.isfinite(entry["ours"]) and np.isfinite(entry["reference"])
    assert 0.0 < parity_results["pipeline_map_micro"]["reference"] < 1.0
    # the F1 comparison must be non-degenerate too (the output bias is
    # centered on the median logit so predictions straddle DECISION_TH —
    # an all-negative decision surface would make f1 == 0.0 on both sides
    # regardless of composition bugs)
    assert 0.0 < parity_results["pipeline_f1_micro"]["reference"] < 1.0


def test_threshold_sweep_parity(parity_results):
    entry = parity_results["pipeline_threshold_sweep"]
    assert entry["status"] == "PASS", entry
    assert 0.1 <= entry["reference"]["threshold"] <= 0.99


def test_ensembled_descriptions_parity(tmp_path):
    """name+label: K=2 description ensembling (logit of mean sigmoid,
    ProtNote.py:308-322) through BOTH full pipelines."""
    from protnote_tpu.core.reference_pipeline import run_pipeline_parity

    results = run_pipeline_parity(
        REFERENCE_ROOT, workdir=str(tmp_path),
        inference_descriptions="name+label",
    )
    for key, entry in results.items():
        assert entry["status"] == "PASS", (key, entry)
