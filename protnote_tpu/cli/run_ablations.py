"""Ablation / seed-replicate orchestration.

Local equivalent of the reference's cluster job specs: the ablation matrix of
amlt_config_ablations.yml (biogpt encoder, no weighted sampling, BCE loss, no
residue augmentation, no label noising, name-only descriptions) and the
hyperdrive grid of hyperdrive_seed_replicates.yml (SEED x SEQUENCE_WEIGHT_AGG)
— run sequentially through cli/main.py with --override sets instead of Azure
YAML.
"""

from __future__ import annotations

import argparse
import itertools
import logging
from typing import Dict, List

logger = logging.getLogger(__name__)

# Named ablations (reference amlt_config_ablations.yml jobs).
ABLATIONS: Dict[str, List[str]] = {
    "baseline": [],
    "biogpt": ["LABEL_ENCODER_CHECKPOINT", "microsoft/biogpt"],
    "no_weighted_sampling": ["WEIGHTED_SAMPLING", "False"],
    "bce": ["LOSS_FN", "BCE"],
    "no_residue_aug": ["AUGMENT_RESIDUE_PROBABILITY", "0.0"],
    "no_label_noise": ["LABEL_EMBEDDING_NOISING_ALPHA", "0.0"],
    "name_only": [
        "LABEL_AUGMENTATION_DESCRIPTIONS", "name",
        "INFERENCE_GO_DESCRIPTIONS", "name",
    ],
}

# Hyperdrive grid (reference hyperdrive_seed_replicates.yml:27-59).
SEED_GRID = [12, 22, 32, 42, 52]
WEIGHT_AGG_GRID = ["sum", "mean"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["ablations", "seed-replicates"],
                    default="ablations")
    ap.add_argument("--ablations", nargs="+", default=list(ABLATIONS),
                    choices=list(ABLATIONS))
    ap.add_argument("--seeds", type=int, nargs="+", default=None)
    ap.add_argument("--weight-aggs", nargs="+", default=None)
    ap.add_argument("--train-path-name", default="TRAIN_DATA_PATH")
    ap.add_argument("--validation-path-name", default="VAL_DATA_PATH")
    ap.add_argument("--test-paths-names", nargs="+", default=["TEST_DATA_PATH"])
    ap.add_argument("--metrics-file", default="ablation_metrics.json")
    ap.add_argument("--extra-overrides", nargs="*", default=[])
    ap.add_argument("--extra-args", nargs="*", default=[])
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from protnote_tpu.cli.main import build_argparser, run

    jobs = []
    if args.mode == "ablations":
        seeds = args.seeds or [42]
        for name, seed in itertools.product(args.ablations, seeds):
            jobs.append((f"{name}_seed{seed}", ABLATIONS[name], seed, None))
    else:
        seeds = args.seeds or SEED_GRID
        aggs = args.weight_aggs or WEIGHT_AGG_GRID
        for seed, agg in itertools.product(seeds, aggs):
            jobs.append((f"seed{seed}_{agg}", ["SEQUENCE_WEIGHT_AGG", agg], seed, agg))

    results = {}
    for run_name, overrides, seed, _ in jobs:
        logger.info("=== job %s ===", run_name)
        cli_args = [
            "--train-path-name", args.train_path_name,
            "--validation-path-name", args.validation_path_name,
            "--test-paths-names", *args.test_paths_names,
            "--name", run_name,
            "--seed", str(seed),
            "--save-val-test-metrics",
            "--save-val-test-metrics-file", args.metrics_file,
            *args.extra_args,
        ]
        all_ov = [*overrides, *args.extra_overrides]
        if all_ov:
            cli_args += ["--override", *all_ov]
        results[run_name] = run(build_argparser().parse_args(cli_args))
    return results


if __name__ == "__main__":
    main()
