"""TRUE multi-process distributed execution: two OS processes, each with 4
virtual CPU devices, joined by jax.distributed into one 8-device runtime
(gloo collectives — the CPU stand-in for ICI/DCN).  A real train step + eval
step run over a (dp, label) mesh SPANNING BOTH PROCESSES and must reproduce
the single-process result bit-for-tolerance.

This is the multi-host contract of parallel/distributed.py exercised for
real (reference multi-node env:// rendezvous, bin/main.py:185-200), not
just simulated on one process."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    results = {}
    logs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        logs.append((p.returncode, out, err))
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["process"]] = r
    assert all(rc == 0 for rc, _, _ in logs), logs
    assert set(results) == {0, 1}, logs
    for r in results.values():
        assert r["processes"] == 2 and r["devices"] == 8
        assert np.isfinite(r["loss"]) and np.isfinite(r["eval_loss"])
    assert results[0]["is_main"] and not results[1]["is_main"]
    # both processes observe identical global values
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["tp_sum"] == results[1]["tp_sum"]

    # single-process reference on the same deterministic setup/batch
    import jax
    import jax.numpy as jnp

    from protnote_tpu.train.step import make_eval_step, make_train_step
    from tests._dist_setup import make_setup

    ts, pi_cfg, pn_cfg, loss_fn, tx, batch = make_setup()
    step = make_train_step(pi_cfg, pn_cfg, loss_fn, tx, donate=False)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    new_ts, metrics = step(ts, batch_j, jax.random.PRNGKey(7))
    out = make_eval_step(pi_cfg, pn_cfg, loss_fn)(new_ts, batch_j)

    assert results[0]["loss"] == pytest.approx(float(metrics["loss"]), abs=1e-5)
    assert results[0]["eval_loss"] == pytest.approx(float(out["loss"]), abs=1e-5)
    assert results[0]["grad_norm"] == pytest.approx(
        float(metrics["grad_norm"]), rel=1e-4)
    assert results[0]["tp_sum"] == int(np.asarray(metrics["tp"]).sum())
