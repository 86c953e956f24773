"""Paper-reproduction analysis helpers (reference protnote/utils/notebooks.py
and evaluation.py:325-386): metric tables from saved logits/labels frames,
sliced by GO ontology or EC level-1 class, per-label metric frames, and BLAST
prediction completion."""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np

from protnote_tpu.data.annotations import ec_number_to_code
from protnote_tpu.evaln.metrics import (
    ConfusionAccumulator,
    ExactAUPRC,
    average_precision,
)

GO_ROOTS = {
    "GO:0008150": "biological_process",
    "GO:0003674": "molecular_function",
    "GO:0005575": "cellular_component",
}
ONTOLOGIES = ["All", "biological_process", "cellular_component", "molecular_function"]


def ontology_of(go_term: str, parenthood: Mapping[str, Sequence[str]]) -> str:
    for parent in parenthood.get(go_term, []):
        if parent in GO_ROOTS:
            return GO_ROOTS[parent]
    return GO_ROOTS.get(go_term, "missing")


def get_metrics(logits: np.ndarray, labels: np.ndarray,
                threshold: Optional[float] = 0.5) -> Dict[str, float]:
    """mAP micro/macro + F1 family from a full prediction matrix."""
    probs = 1.0 / (1.0 + np.exp(-logits.astype(np.float32)))
    out: Dict[str, float] = {}
    auprc = ExactAUPRC(num_labels=labels.shape[1])
    auprc.update(probs, labels)
    ap = auprc.compute()
    out["mAP Macro"] = ap["map_macro"]
    out["mAP Micro"] = ap["map_micro"]
    if threshold is not None:
        conf = ConfusionAccumulator(labels.shape[1], threshold)
        conf.update(probs, labels)
        for k, v in conf.compute().items():
            if k.startswith("f1"):
                out[k] = v
    return out


def filter_by_go_ontology(ontology: str, df, parenthood: Mapping[str, Sequence[str]]):
    """Column-filter a logits/labels DataFrame by GO ontology root."""
    if ontology == "All":
        return df
    keep = [ontology_of(c, parenthood) == ontology for c in df.columns]
    return df.iloc[:, keep]


def metrics_by_go_ontology(logits_df, labels_df,
                           parenthood: Mapping[str, Sequence[str]],
                           threshold: Optional[float] = 0.5) -> Dict[str, Dict]:
    results = {}
    for ontology in ONTOLOGIES:
        lg = filter_by_go_ontology(ontology, logits_df, parenthood)
        lb = filter_by_go_ontology(ontology, labels_df, parenthood)
        if lg.shape[1] == 0:
            continue
        results[ontology] = get_metrics(lg.values, lb.values, threshold)
    return results


def filter_by_ec_level_1(level_1_label: str, df, ec_class_descriptions: Dict):
    if level_1_label == "All":
        return df
    keep = [
        ec_class_descriptions[(ec_number_to_code(c.replace("EC:", ""))[0], 0, 0)]["label"]
        == level_1_label
        for c in df.columns
    ]
    return df.iloc[:, keep]


def metrics_by_ec_level_1(logits_df, labels_df, ec_class_descriptions: Dict,
                          threshold: Optional[float] = 0.5) -> Dict[str, Dict]:
    level_1s = [
        ec_class_descriptions[(i, 0, 0)]["label"]
        for i in range(1, 8)
        if (i, 0, 0) in ec_class_descriptions
    ]
    results = {}
    for lvl in ["All"] + level_1s:
        lg = filter_by_ec_level_1(lvl, logits_df, ec_class_descriptions)
        lb = filter_by_ec_level_1(lvl, labels_df, ec_class_descriptions)
        if lg.shape[1] == 0:
            continue
        results[lvl] = get_metrics(lg.values, lb.values, threshold)
    return results


def metrics_per_label_df(logits_df, labels_df, threshold: Optional[float] = None):
    """Per-label AUPRC (+P/R/F1 at a threshold); labels with no positives get
    NaN rows (reference evaluation.py:325-386)."""
    import pandas as pd

    probs = 1.0 / (1.0 + np.exp(-logits_df.values.astype(np.float32)))
    labels = labels_df.values
    rows = []
    for j, col in enumerate(labels_df.columns):
        t = labels[:, j]
        if not t.any():
            rows.append({"label": col, "AUPRC": np.nan})
            continue
        row = {"label": col, "AUPRC": average_precision(probs[:, j], t),
               "frequency": int(t.sum())}
        if threshold is not None:
            pred = probs[:, j] > threshold
            tp = int((pred & (t > 0)).sum())
            p = tp / max(pred.sum(), 1)
            r = tp / max(t.sum(), 1)
            row.update(
                Precision=p, Recall=r,
                F1=(2 * p * r / (p + r)) if (p + r) > 0 else 0.0,
            )
        rows.append(row)
    return pd.DataFrame(rows).set_index("label")


def complete_blast_preds(blast_df, labels: List[str], seqs: List[str],
                         fill_value: float = -15.0):
    """Align a BLAST logits frame onto a full (seqs x labels) grid
    (reference notebooks.py:12-26)."""
    missing_cols = [l for l in set(labels) - set(blast_df.columns)]
    if missing_cols:
        import pandas as pd

        blast_df = blast_df.join(
            pd.DataFrame(fill_value, index=blast_df.index, columns=missing_cols)
        )
    cols = [l for l in labels if l in blast_df.columns]
    return blast_df[cols].reindex(seqs).fillna(fill_value)
