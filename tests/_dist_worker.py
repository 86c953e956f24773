"""Worker for the 2-process jax.distributed integration test.

Each process sees 4 virtual CPU devices; together they form one 8-device
runtime.  Runs one real train step + eval step over a (dp=4, label=2) mesh
spanning both processes and prints the results as JSON for the parent test
to compare against the single-process reference value.

Usage: python tests/_dist_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from protnote_tpu.parallel.distributed import (
    global_device_put,
    global_device_put_batch,
    initialize_distributed,
    is_main_process,
)

assert initialize_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc

import numpy as np

from protnote_tpu.parallel.mesh import MeshSpec, make_mesh, replicated, shardings_for_batch
from protnote_tpu.train.step import make_eval_step, make_train_step
from tests._dist_setup import make_setup

ts, pi_cfg, pn_cfg, loss_fn, tx, batch = make_setup()
mesh = make_mesh(MeshSpec(dp=jax.device_count() // 2, label=2))
sh = shardings_for_batch(mesh)
rep = replicated(mesh)
# every process holds the full host batch (deterministic schedule); each
# materialises only its local shards
batch_g = global_device_put_batch(batch, sh, rep)
ts_g = jax.tree_util.tree_map(
    lambda x: global_device_put(np.asarray(x), rep), ts
)

step = make_train_step(pi_cfg, pn_cfg, loss_fn, tx, donate=False)
eval_step = make_eval_step(pi_cfg, pn_cfg, loss_fn)
new_ts, metrics = step(ts_g, batch_g, jax.random.PRNGKey(7))
out = eval_step(new_ts, batch_g)

# fully-addressable scalars/vectors can be read on every process
result = {
    "process": jax.process_index(),
    "processes": jax.process_count(),
    "devices": jax.device_count(),
    "loss": float(metrics["loss"]),
    "grad_norm": float(metrics["grad_norm"]),
    "eval_loss": float(out["loss"]),
    "tp_sum": int(np.asarray(jax.device_get(metrics["tp"])).sum()),
    "is_main": is_main_process(),
}
print("RESULT " + json.dumps(result), flush=True)
