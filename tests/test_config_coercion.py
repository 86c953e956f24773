"""Override coercion: YAML-style literals through --override."""

from protnote_tpu.core.config import _coerce, load_config, override_config


def test_coerce_literals():
    assert _coerce("null") is None
    assert _coerce("None") is None
    assert _coerce("true") is True
    assert _coerce("False") is False
    assert _coerce("3") == 3
    assert _coerce("0.5") == 0.5
    assert _coerce("[128, 256]") == [128, 256]
    assert _coerce("name+label") == "name+label"
    assert _coerce("FocalLoss") == "FocalLoss"


def test_override_null_threshold():
    cfg = load_config()
    override_config(cfg, ["DECISION_TH", "null", "WEIGHTED_SAMPLING", "false",
                          "TRAIN_LABEL_SAMPLE_SIZE", "5000"])
    assert cfg["params"]["DECISION_TH"] is None
    assert cfg["params"]["WEIGHTED_SAMPLING"] is False
    assert cfg["params"]["TRAIN_LABEL_SAMPLE_SIZE"] == 5000
