"""Single-process reference run for tests/test_multiprocess_cli.py: the same
cli.main configuration on one process with 8 virtual devices."""

import faulthandler
import json
import os
import signal
import sys

faulthandler.register(signal.SIGUSR1)

root = sys.argv[1]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PROTNOTE_DATA_DIR"] = os.path.join(root, "data")
os.environ["PROTNOTE_OUTPUT_DIR"] = os.path.join(root, "outputs_single")

import jax

jax.config.update("jax_platforms", "cpu")

from tests.cli_dist_common import OVERRIDES, patch_small_encoder

patch_small_encoder()

import protnote_tpu.cli.main as cli

args = cli.build_argparser().parse_args(
    [
        "--train-path-name", "TRAIN_DATA_PATH",
        "--validation-path-name", "VAL_DATA_PATH",
        "--test-paths-names", "TEST_DATA_PATH",
        "--name", "dist-e2e",
        "--mesh-dp", "4",
        "--mesh-label", "2",
        "--override", *OVERRIDES,
    ]
)
metrics = cli.run(args)
print("RESULT " + json.dumps({
    "test_loss": metrics["test"]["loss"],
    "test_f1_micro": metrics["test"]["f1_micro"],
    "test_map_micro": metrics["test"]["map_micro"],
    "decision_threshold": metrics["decision_threshold"]["threshold"],
}), flush=True)
