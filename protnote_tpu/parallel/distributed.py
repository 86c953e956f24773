"""Multi-host (pod-scale) execution support.

The reference runs multi-node DDP through an env:// NCCL rendezvous
(/root/reference/bin/main.py:185-200: MASTER_ADDR/MASTER_PORT + NODE_RANK,
one process per GPU).  The JAX-native equivalent is one process per *host*,
each seeing its local chip subset, joined into a single logical runtime by
``jax.distributed.initialize``; the (dp, label) mesh then spans every chip in
the slice and jit inserts the cross-host collectives (ICI within a slice,
DCN across slices).

Contract (multi-process SPMD):

* every process runs the SAME program over the SAME batch schedule — the
  batchers are deterministic in (seed, epoch), so no sampler rendezvous is
  needed (the reference's DistributedSampler split, samplers.py:15-63, is
  replaced by determinism + local sharding);
* host arrays are turned into global arrays with
  ``jax.make_array_from_callback`` — each process materialises only the
  shards its local devices own, which is how the per-process data split
  happens (no explicit rank arithmetic);
* checkpoint restore is replicated by construction; only the main process
  writes files (``is_main_process``).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    force: bool = False,
) -> bool:
    """Join the multi-host runtime.  Call before any other JAX API.

    Arguments fall back to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``, ``NUM_PROCESSES``,
    ``PROCESS_ID``); on Cloud TPU pods all three are auto-detected and
    ``jax.distributed.initialize()`` needs no arguments.  Returns True when
    a multi-process runtime was initialised.
    """
    coordinator_address = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])

    # Initialization is explicit-only: a coordinator address (flag or env) or
    # --distributed.  (Auto-detecting from TPU env vars misfires on
    # single-host images where the plugin sets TPU_WORKER_HOSTNAMES.)
    explicit = coordinator_address is not None
    if not explicit and not force:
        return False
    kwargs: Dict[str, Any] = {}
    if explicit:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logger.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def global_device_put(arr: np.ndarray, sharding: NamedSharding):
    """Host array -> global device array under ``sharding``.

    Single-process: plain ``device_put``.  Multi-process: every process holds
    the full host array (the batchers are schedule-deterministic) and
    ``make_array_from_callback`` materialises only the shards owned by this
    process's devices — the multi-host replacement for ``device_put``
    (which requires addressable devices only).
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def global_device_put_batch(arrays: Dict[str, Any],
                            shardings: Dict[str, NamedSharding],
                            default: NamedSharding) -> Dict[str, Any]:
    return {
        k: global_device_put(v, shardings.get(k, default))
        for k, v in arrays.items()
    }


def process_dp_block(mesh) -> Optional[tuple]:
    """This process's contiguous block of the mesh ``dp`` axis.

    Returns (start, count, total) dp rows owned entirely by this process, or
    None when the layout does not allow a clean per-process row split (a dp
    row spanning several processes, or non-contiguous local rows) — callers
    then fall back to full batch assembly.  Feeds
    ``BucketBatcher.set_row_shard`` (reference per-rank split,
    samplers.py:15-63)."""
    dev = np.asarray(mesh.devices)
    if dev.ndim == 1:
        dev = dev[:, None]
    pidx = jax.process_index()
    local = []
    for i in range(dev.shape[0]):
        owners = {d.process_index for d in dev[i].ravel()}
        if owners == {pidx}:
            local.append(i)
        elif pidx in owners:
            return None  # row split across processes
    if not local or local != list(range(local[0], local[0] + len(local))):
        return None
    return local[0], len(local), dev.shape[0]


def global_device_put_rows(local_rows: np.ndarray, row_offset: int,
                           global_rows: int, sharding: NamedSharding):
    """Local row block -> global device array (strided batch assembly).

    ``local_rows`` holds global rows [row_offset, row_offset + len) of a
    (global_rows, ...) array whose dim 0 is sharded such that this process's
    devices only address rows inside that block (guaranteed by
    ``process_dp_block``)."""
    local_rows = np.asarray(local_rows)
    shape = (global_rows,) + local_rows.shape[1:]

    def cb(idx):
        r = idx[0]
        lo = 0 if r.start is None else r.start
        hi = global_rows if r.stop is None else r.stop
        if lo < row_offset or hi > row_offset + local_rows.shape[0]:
            raise ValueError(
                f"device requests rows [{lo}, {hi}) outside the local block "
                f"[{row_offset}, {row_offset + local_rows.shape[0]}) — mesh "
                f"dp layout does not match the strided assembly"
            )
        block = local_rows[lo - row_offset : hi - row_offset]
        rest = tuple(idx[1:])
        return block[(slice(None),) + rest] if rest else block

    return jax.make_array_from_callback(shape, sharding, cb)
