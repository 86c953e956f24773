"""Multi-process Trainer/CLI e2e (VERDICT r2 missing #4): two OS processes
run the FULL ``cli.main`` path — dataset build, strided batch assembly,
Trainer.train epoch loop, device-metric evaluation, checkpoint + metrics
writers — over a dp=4 x label=2 mesh spanning both processes, and the global
metrics must match a single-process run of the same configuration.

This exercises what tests/test_multiprocess_distributed.py (raw step) does
not: ``global_device_put_batch``/``global_device_put_rows`` placement from
inside the Trainer loop, the batcher determinism contract across processes,
per-process strided assembly (``set_row_shard``), and main-process-only
file writers (reference equivalent: bin/main.py:185-200 + the test_ddp AMLT
job, amlt_config.yml:151-168).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_cli_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    """Same toy layout as tests/test_train_e2e.py, in a subprocess-shareable
    directory."""
    from protnote_tpu.data.fasta import save_to_fasta
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    root = tmp_path_factory.mktemp("dist_toy")
    data_dir = root / "data"
    (data_dir / "swissprot" / "proteinfer_splits" / "random").mkdir(parents=True)
    (data_dir / "embeddings").mkdir(parents=True)
    (root / "outputs_dist").mkdir()
    (root / "outputs_single").mkdir()

    rng = np.random.default_rng(5)
    labels_all = [f"GO:{i:07d}" for i in range(10)]
    AAS = "ACDEFGHIKLMNPQRSTVWY"

    def make_fasta(name, n):
        recs = []
        for i in range(n):
            L = int(rng.integers(20, 100))
            seq = "".join(rng.choice(list(AAS), L))
            labs = list(rng.choice(labels_all, size=int(rng.integers(1, 4)),
                                   replace=False))
            recs.append((seq, f"{name}{i}", labs))
        save_to_fasta(
            recs,
            str(data_dir / "swissprot" / "proteinfer_splits" / "random" / name),
        )

    make_fasta("train_GO.fasta", 16)
    make_fasta("dev_GO.fasta", 8)
    make_fasta("test_GO.fasta", 8)

    enc = HashLabelEncoder(dim=32)
    ids, dtypes, texts = [], [], []
    for g in labels_all:
        for dt in ("name", "label"):
            ids.append(g)
            dtypes.append(dt)
            texts.append(f"{dt} description of {g}")
    emb = enc.embed(texts)
    LabelEmbeddingCache.save(
        str(data_dir / "embeddings"
            / "frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dtypes, texts, enc.token_counts(texts),
    )
    return root


@pytest.fixture(scope="module")
def dist_run(toy_root):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(toy_root)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    import time as _time

    results, logs = {}, []
    deadline = _time.monotonic() + 560  # ONE shared deadline for both waits
    try:
        for p in procs:
            try:
                out, err = p.communicate(
                    timeout=max(deadline - _time.monotonic(), 1)
                )
            except subprocess.TimeoutExpired:
                # a distributed-init deadlock is the common failure mode:
                # kill and DRAIN so the stuck process's stderr (faulthandler
                # tracebacks) survives into the assertion message
                p.kill()
                out, err = p.communicate()
            logs.append((p.returncode, out, err))
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
                    results[r["process"]] = r
    finally:
        for p in procs:  # never leave orphaned workers behind on failure
            if p.poll() is None:
                p.kill()
    assert all(rc == 0 for rc, _, _ in logs), logs
    assert set(results) == {0, 1}, logs
    return toy_root, results


def test_cli_two_process_run(dist_run):
    root, results = dist_run
    for r in results.values():
        assert r["processes"] == 2 and r["devices"] == 8
        assert r["epochs"] == 1
        assert np.isfinite(r["test_loss"])
    assert results[0]["is_main"] and not results[1]["is_main"]
    # both processes observe identical global metrics
    assert results[0]["test_loss"] == results[1]["test_loss"]
    assert results[0]["test_f1_micro"] == results[1]["test_f1_micro"]
    # the on-device threshold sweep (DECISION_TH=null) agrees across
    # processes — its (T, L) counters are mesh-replicated global arrays
    assert results[0]["decision_threshold"] == results[1]["decision_threshold"]


def test_cli_writers_gated_to_main_process(dist_run):
    root, _ = dist_run
    mfile = root / "outputs_dist" / "metrics_dist.json"
    assert mfile.exists(), "main process must write the metrics JSON"
    data = json.loads(mfile.read_text())
    # exactly one append: process 1 must not have written
    assert len(data) == 1
    ckpts = list((root / "outputs_dist" / "checkpoints").glob("*.ckpt"))
    assert ckpts, "main process must write checkpoints"


def test_cli_matches_single_process(dist_run):
    """The 2-process CLI run reproduces a single-process run of the same
    configuration (same seed, same 8-device mesh, strided assembly vs full
    assembly)."""
    root, results = dist_run
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    single = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_cli_single_worker.py"),
         str(root)],
        capture_output=True, text=True, env=env, timeout=560,
    )
    assert single.returncode == 0, (single.stdout, single.stderr)
    ref = None
    for line in single.stdout.splitlines():
        if line.startswith("RESULT "):
            ref = json.loads(line[len("RESULT "):])
    assert ref is not None, single.stdout
    got = results[0]
    assert got["test_loss"] == pytest.approx(ref["test_loss"], abs=2e-4)
    assert got["test_f1_micro"] == pytest.approx(ref["test_f1_micro"], abs=2e-4)
    assert got["test_map_micro"] == pytest.approx(ref["test_map_micro"], abs=2e-3)
    assert got["decision_threshold"] == pytest.approx(
        ref["decision_threshold"], abs=1e-6)
