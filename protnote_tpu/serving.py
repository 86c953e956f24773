"""Production serving: low-latency batched inference over a loaded ProtNote.

The reference ships batch evaluation drivers only (bin/main.py eval paths);
serving a trained model requires wiring torch + collators by hand.  Here the
serving stack is first-class and TPU-shaped:

* :class:`ServingEngine` — loads once, precomputes the full label-latent
  matrix ONCE (the label tower never runs again), and scores ad-hoc
  sequence lists through the bucketed static-shape jit cache (one compile
  per length bucket, reused forever).  Backend-agnostic: the bf16 tiled
  scorer or the int8 static-scale path (scales auto-calibrated from the
  first real batch, exactly like Trainer.ensure_int8_calibrated).
* :class:`MicroBatcher` — cross-request batching: concurrent requests
  coalesce into one device dispatch (up to ``max_batch`` sequences or
  ``max_wait_ms``), the standard production-serving trade between p50
  latency and chip utilization.
* :func:`make_http_server` — a dependency-free stdlib HTTP front end
  (POST /v1/predict, GET /healthz) for `python -m protnote_tpu.cli.serve`.

Reference parity anchors: the scoring math is the evaluation path of
ProtNote.py:112-334 (via make_eval_step's label_latents fast path); the
GO-vocabulary contract matches cli/predict.py.
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class ServingStats:
    requests: int = 0
    sequences: int = 0
    batches: int = 0
    batched_rows: int = 0  # sequences dispatched incl. padding rows
    total_device_ms: float = 0.0
    lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def snapshot(self) -> Dict[str, Any]:
        with self.lock:
            d = {
                "requests": self.requests,
                "sequences": self.sequences,
                "batches": self.batches,
                "mean_batch_fill": (
                    self.sequences / self.batched_rows
                    if self.batched_rows else None
                ),
                "total_device_ms": round(self.total_device_ms, 1),
            }
        return d


class ServingEngine:
    """Scores raw amino-acid sequences against the full label vocabulary.

    ``ts``: a train-state bundle (init_train_state / Trainer.ts layout).
    ``label_matrix``: (num_labels * k, label_dim) embedding rows in label
    order (k = descriptions_per_label, the LabelEmbeddingView layout).
    ``label_vocabulary``: num_labels GO ids in the same order.
    """

    def __init__(
        self,
        ts: Dict[str, Any],
        pi_cfg,
        pn_cfg,
        label_matrix: np.ndarray,
        label_vocabulary: Sequence[str],
        amino_acid_vocabulary: Optional[Sequence[str]] = None,
        buckets: Sequence[int] = (256, 512, 1024, 2048, 4096),
        max_batch: int = 32,
        mesh=None,
    ):
        """``mesh``: optional (dp=1, label=N) jax.sharding.Mesh — serve one
        model over N chips with the label axis sharded (the pod serving
        layout of cli/predict.py): latents and logits partition by label,
        parameters and batch rows replicate, and the vocabulary is padded to
        a label-axis multiple (padded columns are dropped before results
        leave the engine)."""
        import jax
        import jax.numpy as jnp

        from protnote_tpu.data.dataset import make_residue_lut
        from protnote_tpu.data.vocab import COMMON_AMINOACIDS

        self._jax, self._jnp = jax, jnp
        self.pi_cfg = pi_cfg
        self.pn_cfg = pn_cfg
        self.label_vocabulary = list(label_vocabulary)
        L = len(self.label_vocabulary)
        if label_matrix.shape[0] % L:
            raise ValueError(
                f"label matrix rows ({label_matrix.shape[0]}) not a multiple "
                f"of the vocabulary size ({L})"
            )
        self.descriptions_per_label = label_matrix.shape[0] // L
        if self.descriptions_per_label != pn_cfg.inference_descriptions_per_label:
            raise ValueError(
                f"label matrix carries {self.descriptions_per_label} "
                f"descriptions/label but the config expects "
                f"{pn_cfg.inference_descriptions_per_label}"
            )
        aa_vocab = sorted(amino_acid_vocabulary or COMMON_AMINOACIDS)
        self._lut = make_residue_lut(aa_vocab)
        self._pad_id = len(aa_vocab)
        self.buckets = tuple(sorted(int(b) for b in buckets))
        self.max_batch = int(max_batch)
        self.mesh = mesh
        label_matrix = np.asarray(label_matrix)
        self._num_labels_padded = L
        if mesh is not None:
            from protnote_tpu.parallel.mesh import replicated

            n_label = int(mesh.shape["label"])
            Lp = -(-L // n_label) * n_label
            if Lp != L:
                k = self.descriptions_per_label
                pad = np.zeros(((Lp - L) * k,) + label_matrix.shape[1:],
                               label_matrix.dtype)
                label_matrix = np.concatenate(
                    [label_matrix.reshape(L, k, -1),
                     pad.reshape(Lp - L, k, -1)]
                ).reshape(Lp * k, -1)
            self._num_labels_padded = Lp
        # inference never reads the optimizer state: a full train-state
        # bundle would pin Adam mu/nu (~2 extra copies of the trainables)
        # on every serving chip and re-upload them with each dispatch
        ts = {k: v for k, v in ts.items() if k not in ("opt_state", "step")}
        if mesh is not None:
            self.ts = jax.device_put(ts, replicated(mesh))
            self._label_matrix = jax.device_put(label_matrix, replicated(mesh))
        else:
            self.ts = jax.device_put(ts)
            self._label_matrix = jnp.asarray(label_matrix)
        if jax.process_count() > 1:
            raise ValueError(
                "ServingEngine is single-controller: run one server per "
                "process/slice (multi-process readback of globally-sharded "
                "logits is not addressable)"
            )
        self.stats = ServingStats()
        self._calib_lock = threading.Lock()
        self._model_lock = threading.Lock()  # atomic (ts, latents) hot swap
        self._int8_scales_supplied = pn_cfg.int8_act_scales is not None
        self._build_steps()
        self.latents = self._compute_latents()
        if (
            self.pn_cfg.pair_backend == "tiled_int8"
            and self.pn_cfg.int8_act_scales is None
        ):
            self._needs_calibration = True
            logger.info("int8 backend without scales: will calibrate on the "
                        "first scored batch")
        else:
            self._needs_calibration = False

    # ---------------- model plumbing ----------------

    def _build_steps(self) -> None:
        import jax
        import jax.numpy as jnp

        from protnote_tpu.train.step import make_eval_step

        raw = make_eval_step(self.pi_cfg, self.pn_cfg, None, jit=False)
        # serving readback dtype is f16 (the repo-wide logits export dtype,
        # results_io.py): halves the device->host transfer per dispatch;
        # sigmoid runs on host in f32 (probability error <= ~5e-4 at |logit|
        # <= 8 — far below any decision threshold granularity)
        self._score_step = jax.jit(
            lambda ts, arrays: raw(ts, arrays)["logits"].astype(jnp.float16)
        )

    def _compute_latents(self):
        """Project every label-embedding row through W_l once (the per-batch
        label tower vanishes from the serving path — the same hoist that
        took the eval pipeline from 134 to 138.6 seqs/s)."""
        import jax

        from protnote_tpu.models.fusion import compute_label_latents

        def f(ts, matrix):
            return compute_label_latents(
                ts["trainable"]["protnote"], ts["model_state"], matrix,
                self.pn_cfg,
            )

        if self.mesh is not None:
            # latents live sharded over the label axis: each chip scores its
            # own label shard (logits partition (B, L/label); only the
            # readback gathers)
            from jax.sharding import NamedSharding, PartitionSpec as P

            fn = jax.jit(
                f, out_shardings=NamedSharding(self.mesh, P("label", None))
            )
        else:
            fn = jax.jit(f)
        return fn(self.ts, self._label_matrix)

    def _calibrate_int8(self, aa: np.ndarray, lengths: np.ndarray) -> None:
        """First-batch static activation scales (Trainer.calibrate_int8
        semantics) — then rebuild the serving step with them frozen in."""
        import dataclasses

        import jax

        from protnote_tpu.models import fusion as fusion_mod
        from protnote_tpu.models.proteinfer import embed_from_ids

        def _maxes(ts, aa_ids, lens, latents):
            enc_params = ts["trainable"].get("encoder", ts["enc_params"])
            P_f, _ = embed_from_ids(
                enc_params, ts["enc_state"], aa_ids, lens, self.pi_cfg,
            )
            return fusion_mod.calibrate_int8_maxes(
                ts["trainable"]["protnote"], ts["model_state"], P_f,
                self.pn_cfg, label_latents=latents,
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            fn = jax.jit(_maxes,
                         out_shardings=NamedSharding(self.mesh, P()))
        else:
            fn = jax.jit(_maxes)
        maxes = np.asarray(fn(
            self.ts, self._jnp.asarray(aa), self._jnp.asarray(lengths),
            self.latents,
        ))
        scales = tuple(float(m) * 1.05 / 127.0 for m in maxes)
        self.pn_cfg = dataclasses.replace(self.pn_cfg, int8_act_scales=scales)
        self._build_steps()
        self._needs_calibration = False
        logger.info("serving int8 scales calibrated: %s",
                    [round(s, 6) for s in scales])

    # ---------------- encoding ----------------

    def _encode(self, sequences: Sequence[str]) -> List[np.ndarray]:
        out = []
        for i, seq in enumerate(sequences):
            if not seq or not isinstance(seq, str):
                raise ValueError(f"sequence {i} is empty or not a string")
            ids = self._lut[np.frombuffer(seq.upper().encode(), dtype=np.uint8)]
            out.append(
                np.where(ids < 0, self._pad_id, ids).astype(np.int8)
            )
        return out

    def _bucket_of(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]  # overflow: truncate (batching.py policy)

    # ---------------- scoring ----------------

    def score(self, sequences: Sequence[str]) -> np.ndarray:
        """(n, num_labels) float32 sigmoid probabilities, input order."""
        encoded = self._encode(sequences)
        order: Dict[int, List[int]] = {}
        for i, e in enumerate(encoded):
            order.setdefault(self._bucket_of(len(e)), []).append(i)
        probs = np.empty((len(encoded), len(self.label_vocabulary)),
                         np.float32)
        for bucket, idxs in sorted(order.items()):
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s : s + self.max_batch]
                probs[chunk] = self._score_bucket(
                    [encoded[i] for i in chunk], bucket
                )
        with self.stats.lock:
            self.stats.sequences += len(encoded)
        return probs

    def _assemble(self, encoded: List[np.ndarray], bucket: int):
        """Pad an encoded chunk into the (max_batch, bucket) static shape."""
        B = self.max_batch  # static batch shape: one compile per bucket
        aa = np.full((B, bucket), self._pad_id, dtype=np.int8)
        lengths = np.ones(B, dtype=np.int32)
        for r, e in enumerate(encoded):
            e = e[:bucket]
            aa[r, : len(e)] = e
            lengths[r] = max(len(e), 1)
        return aa, lengths

    def _score_bucket(self, encoded: List[np.ndarray], bucket: int) -> np.ndarray:
        jnp = self._jnp
        n = len(encoded)
        B = self.max_batch
        aa, lengths = self._assemble(encoded, bucket)
        if self._needs_calibration:
            with self._calib_lock:
                if self._needs_calibration:  # double-check under the lock
                    self._calibrate_int8(aa, lengths)
        mask = np.zeros(B, dtype=np.float32)
        mask[:n] = 1.0
        with self._model_lock:  # pair (ts, latents) must be from ONE model
            ts, latents = self.ts, self.latents
        t0 = time.perf_counter()
        logits16 = self._score_step(ts, {
            "aa_ids": jnp.asarray(aa),
            "lengths": jnp.asarray(lengths),
            "example_mask": jnp.asarray(mask),
            "label_latents": latents,
        })
        logits = np.asarray(logits16)[:n].astype(np.float32)
        if logits.shape[1] != len(self.label_vocabulary):
            logits = logits[:, : len(self.label_vocabulary)]  # mesh padding
        dt = (time.perf_counter() - t0) * 1e3
        with self.stats.lock:
            self.stats.batches += 1
            self.stats.batched_rows += B
            self.stats.total_device_ms += dt
        return 1.0 / (1.0 + np.exp(-logits))

    def top_k(self, sequences: Sequence[str], k: int = 10,
              threshold: Optional[float] = None
              ) -> List[List[Tuple[str, float]]]:
        """Per sequence: the k highest-probability (go_id, prob) pairs,
        optionally filtered to probs >= threshold."""
        return topk_from_probs(self.label_vocabulary, self.score(sequences),
                               k, threshold)

    def reload(self, ts: Dict[str, Any]) -> None:
        """Hot-swap the model weights without dropping traffic.

        Recomputes the label latents for the new weights and swaps
        ``(ts, latents)`` atomically — in-flight requests finish on the old
        model, later requests see only the new one.  Auto-calibrated int8
        scales are invalidated (they are a function of the weights; the
        next scored real batch recalibrates), user-supplied INT8_ACT_SCALES
        survive."""
        import dataclasses

        jax = self._jax
        ts = {k: v for k, v in ts.items() if k not in ("opt_state", "step")}
        if self.mesh is not None:
            from protnote_tpu.parallel.mesh import replicated

            ts = jax.device_put(ts, replicated(self.mesh))
        else:
            ts = jax.device_put(ts)
        if (
            self.pn_cfg.pair_backend == "tiled_int8"
            and not self._int8_scales_supplied
            and self.pn_cfg.int8_act_scales is not None
        ):
            with self._calib_lock:
                self.pn_cfg = dataclasses.replace(
                    self.pn_cfg, int8_act_scales=None)
                self._build_steps()
                self._needs_calibration = True
        old_ts = self.ts
        # latents for the NEW weights, computed before the swap
        with self._model_lock:
            self.ts = ts
            try:
                latents = self._compute_latents()
            except Exception:
                self.ts = old_ts  # roll back; old model keeps serving
                raise
            self.latents = latents
        logger.info("model hot-reloaded")

    def calibrate_from(self, sequences: Sequence[str]) -> None:
        """Calibrate static int8 activation scales from REAL sequences (the
        serving analogue of Trainer.calibrate_int8's first-batch semantics).
        Call before :meth:`warmup` when serving int8 without supplied
        scales — warmup alone refuses to calibrate (its synthetic
        repeated-motif sequence is not a representative activation
        sample)."""
        encoded = self._encode(sequences[: self.max_batch])
        bucket = self._bucket_of(max(len(e) for e in encoded))
        aa, lengths = self._assemble(encoded, bucket)
        with self._calib_lock:
            if self._needs_calibration:
                self._calibrate_int8(aa, lengths)

    def warmup(self) -> None:
        """Compile every (bucket) shape up front so the first real request
        does not pay XLA compilation.

        With a lazily-calibrated int8 backend the warmup is SKIPPED unless
        scales exist: scoring the synthetic warmup sequence would otherwise
        permanently freeze activation scales measured on one repeated motif
        plus padding — call :meth:`calibrate_from` with real sequences
        first (cli.serve --calibration-fasta)."""
        if self._needs_calibration:
            logger.warning(
                "int8 scales not calibrated: skipping warmup (the synthetic "
                "warmup batch must not set them); pass real sequences via "
                "calibrate_from / --calibration-fasta to warm up int8"
            )
            return
        aas = "ACDEFGHIKLMNPQRSTVWY"
        for bucket in self.buckets:
            self._score_bucket(
                self._encode([aas * (bucket // len(aas) + 1)]), bucket
            )
        logger.info("serving warmup complete (%d bucket shapes)",
                    len(self.buckets))


def topk_from_probs(vocabulary: Sequence[str], probs: np.ndarray, k: int,
                    threshold: Optional[float] = None
                    ) -> List[List[Tuple[str, float]]]:
    """Shared top-k: sorted (label, prob) pairs per row, optional threshold
    filter (used by ServingEngine.top_k, the HTTP handler, and bench.py)."""
    k = max(1, min(int(k), probs.shape[1]))
    part = np.argpartition(-probs, k - 1, axis=1)[:, :k]
    results = []
    for row, cols in zip(probs, part):
        cols = cols[np.argsort(-row[cols])]
        results.append([
            (vocabulary[c], float(row[c]))
            for c in cols
            if threshold is None or row[c] >= threshold
        ])
    return results


class MicroBatcher:
    """Coalesces concurrent requests into shared device dispatches.

    Callers submit a sequence list and block until their scores are ready;
    ``pipeline_depth`` worker threads drain the queue, each packing up to
    ``max_batch`` sequences per dispatch and waiting at most ``max_wait_ms``
    for stragglers once the first request of a batch arrived.  Depth > 1
    keeps multiple device programs in flight, overlapping one batch's
    host readback with the next batch's compute — the same double-buffering
    the data pipeline's PrefetchBatcher applies on the input side."""

    def __init__(self, engine: ServingEngine, max_wait_ms: float = 5.0,
                 max_batch: Optional[int] = None, pipeline_depth: int = 2):
        self.engine = engine
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.max_batch = int(max_batch or engine.max_batch)
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._workers = [
            threading.Thread(target=self._run, daemon=True)
            for _ in range(max(1, int(pipeline_depth)))
        ]
        for w in self._workers:
            w.start()

    def submit(self, sequences: Sequence[str]) -> np.ndarray:
        """Blocking: returns (len(sequences), num_labels) probabilities.

        Malformed input raises HERE, in the caller's thread — a bad request
        must not poison the co-batched requests of other callers (the
        worker's defensive error broadcast would fail the whole coalesced
        batch)."""
        if self._stop.is_set():
            raise RuntimeError("MicroBatcher is closed")
        sequences = list(sequences)
        self.engine._encode(sequences)  # validates; raises to this caller only
        done = threading.Event()
        slot: Dict[str, Any] = {}
        self._q.put((sequences, done, slot))
        done.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["probs"]

    def close(self) -> None:
        self._stop.set()
        for _ in self._workers:
            self._q.put(None)  # wake every worker
        for w in self._workers:
            w.join(timeout=5)
        # a submit racing close() may have enqueued after the sentinels;
        # fail those callers instead of stranding them on done.wait()
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[2]["error"] = RuntimeError("MicroBatcher closed")
                item[1].set()

    def _run(self) -> None:
        while not self._stop.is_set():
            item = self._q.get()
            if item is None:
                continue
            batch = [item]
            count = len(item[0])
            deadline = time.monotonic() + self.max_wait_s
            while count < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
                count += len(nxt[0])
            seqs = [s for req, _, _ in batch for s in req]
            try:
                probs = self.engine.score(seqs)
                off = 0
                for req, done, slot in batch:
                    slot["probs"] = probs[off : off + len(req)]
                    off += len(req)
                    done.set()
            except Exception as e:  # deliver, don't kill the worker
                for _, done, slot in batch:
                    slot["error"] = e
                    done.set()
            with self.engine.stats.lock:
                self.engine.stats.requests += len(batch)


def make_http_server(engine: ServingEngine, port: int = 8000,
                     host: str = "127.0.0.1",
                     max_wait_ms: float = 5.0,
                     reload_fn=None):
    """Stdlib HTTP front end.  Returns (server, batcher); call
    ``server.serve_forever()`` (blocking) or drive it from a thread.

    POST /v1/predict  {"sequences": ["MKV..."], "top_k": 10,
                       "threshold": 0.5?}
        -> {"predictions": [[["GO:0005524", 0.93], ...], ...]}
    POST /v1/reload   {"model_file": "path.ckpt"} (only when ``reload_fn``
        is provided — cli.serve wires Trainer.load + engine.reload)
    GET  /healthz     -> {"status": "ok", "labels": N, ...stats}
    GET  /metrics     -> Prometheus text exposition of the same counters
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = MicroBatcher(engine, max_wait_ms=max_wait_ms)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: Dict[str, Any]) -> None:
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):  # noqa: N802 (stdlib casing)
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "labels": len(engine.label_vocabulary),
                    "backend": engine.pn_cfg.pair_backend,
                    **engine.stats.snapshot(),
                })
            elif self.path == "/metrics":
                s = engine.stats.snapshot()
                fill = s["mean_batch_fill"]
                lines = [
                    "# TYPE protnote_requests_total counter",
                    f"protnote_requests_total {s['requests']}",
                    "# TYPE protnote_sequences_total counter",
                    f"protnote_sequences_total {s['sequences']}",
                    "# TYPE protnote_batches_total counter",
                    f"protnote_batches_total {s['batches']}",
                    "# TYPE protnote_device_seconds_total counter",
                    f"protnote_device_seconds_total "
                    f"{s['total_device_ms'] / 1e3:.3f}",
                    "# TYPE protnote_batch_fill_mean gauge",
                    f"protnote_batch_fill_mean "
                    f"{0.0 if fill is None else fill:.4f}",
                    "# TYPE protnote_labels gauge",
                    f"protnote_labels {len(engine.label_vocabulary)}",
                    "",
                ]
                blob = "\n".join(lines).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path == "/v1/reload":
                if reload_fn is None:
                    self._send(404, {"error": "reload not wired on this "
                                              "server (no reload_fn)"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    path = req.get("model_file")
                    if not path or not isinstance(path, str):
                        raise ValueError('body needs a "model_file" path')
                    reload_fn(path)
                    self._send(200, {"status": "reloaded",
                                     "model_file": path})
                except (ValueError, FileNotFoundError) as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:
                    logger.exception("reload failed")
                    self._send(500, {"error": str(e)})
                return
            if self.path != "/v1/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                seqs = req.get("sequences")
                if not isinstance(seqs, list) or not seqs:
                    raise ValueError('body needs a non-empty "sequences" list')
                k = int(req.get("top_k", 10))
                threshold = req.get("threshold")
                probs = batcher.submit(seqs)
                preds = [
                    [[g, p] for g, p in pairs]
                    for pairs in topk_from_probs(
                        engine.label_vocabulary, probs, k,
                        None if threshold is None else float(threshold),
                    )
                ]
                self._send(200, {"predictions": preds})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("predict failed")
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # route through logging
            logger.debug("http: " + fmt, *args)

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # for clean shutdown
    return server, batcher
