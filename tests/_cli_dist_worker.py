"""Worker for tests/test_multiprocess_cli.py: one OS process of a 2-process
``cli.main`` run over a toy dataset (4 virtual CPU devices per process,
joined by jax.distributed into one dp=4 x label=2 mesh).

Usage: _cli_dist_worker.py <process_id> <num_processes> <port> <root>
"""

import faulthandler
import json
import os
import signal
import sys

faulthandler.register(signal.SIGUSR1)

pid, nprocs, port, root = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PROTNOTE_DATA_DIR"] = os.path.join(root, "data")
os.environ["PROTNOTE_OUTPUT_DIR"] = os.path.join(root, "outputs_dist")

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
        "--save-val-test-metrics",
        "--save-val-test-metrics-file",
        os.path.join(root, "outputs_dist", "metrics_dist.json"),
        "--distributed",
        "--coordinator-address", f"localhost:{port}",
        "--num-processes", nprocs,
        "--process-id", pid,
        "--mesh-dp", "4",
        "--mesh-label", "2",
        "--override", *OVERRIDES,
    ]
)
metrics = cli.run(args)

result = {
    "process": int(pid),
    "processes": jax.process_count(),
    "devices": jax.device_count(),
    "is_main": jax.process_index() == 0,
    "train_loss": metrics["train_summary"].get("best_val_metric"),
    "test_loss": metrics["test"]["loss"],
    "test_f1_micro": metrics["test"]["f1_micro"],
    "test_map_micro": metrics["test"]["map_micro"],
    "epochs": metrics["train_summary"]["epochs"],
    "decision_threshold": metrics["decision_threshold"]["threshold"],
}
print("RESULT " + json.dumps(result), flush=True)
