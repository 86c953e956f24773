"""Checkpoint save/restore.

Contract mirrors the reference (protnote/utils/models.py:304-374 and
ProtNoteTrainer checkpoint policy): a checkpoint carries
{step/epoch, model params+state, optimizer state, best_val_metric} and
restore repopulates all of them for ``--from-checkpoint`` resumption.
Storage is a single msgpack file via flax.serialization (atomic rename), so
restore is naturally replicated across the mesh — no parameter broadcast
step is needed (the reference broadcasts from rank0,
ProtNoteTrainer.py:921-938).
"""

from __future__ import annotations

import json
import os
import tempfile
import zlib
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def write_checkpoint_blob(path: str, blob: bytes,
                          meta: Dict[str, Any]) -> None:
    """Single low-level writer for the on-disk format (shared by the sync
    and async checkpointers — one place to change the layout).

    Adds the integrity fields (checksum_crc32 / blob_bytes: torn-write
    detection + cross-process restore equality; the reference was immune by
    construction via its rank0 broadcast, ProtNoteTrainer.py:921-938, a
    shared-storage restore is not), then writes atomically:
    magic, meta length (16 ascii digits), json meta, msgpack tree."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta = dict(meta)
    meta["checksum_crc32"] = zlib.crc32(blob)
    meta["blob_bytes"] = len(blob)
    meta_blob = json.dumps(meta).encode()
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(b"PNTPU1\n")
            fh.write(f"{len(meta_blob):016d}".encode())
            fh.write(meta_blob)
            fh.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_checkpoint(path: str, train_state: Dict[str, Any], epoch: int,
                    best_val_metric: Optional[float] = None,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    blob = serialization.to_bytes(_to_host(train_state))
    meta = {
        "epoch": int(epoch),
        "best_val_metric": None if best_val_metric is None else float(best_val_metric),
        **(extra or {}),
    }
    write_checkpoint_blob(path, blob, meta)


def restore_checkpoint(path: str, train_state_template: Dict[str, Any]
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore into the structure of ``train_state_template``.

    Returns (train_state, meta).  Shapes/dtypes must match the template —
    the analogue of the reference's state_dict key check.
    """
    with open(path, "rb") as fh:
        magic = fh.read(7)
        if magic != b"PNTPU1\n":
            raise ValueError(f"{path}: not a protnote_tpu checkpoint")
        meta_len = int(fh.read(16))
        meta = json.loads(fh.read(meta_len))
        blob = fh.read()
    want = meta.get("checksum_crc32")
    if want is not None and zlib.crc32(blob) != want:
        raise ValueError(
            f"{path}: checksum mismatch — truncated or corrupted checkpoint "
            f"({len(blob)} bytes read, {meta.get('blob_bytes')} expected)"
        )
    stored = serialization.msgpack_restore(blob)
    ts = _merge_into_template(_to_host(train_state_template), stored, path="")
    return ts, meta


def _merge_into_template(template, stored, path: str):
    """Overlay stored leaves onto the template, tolerating keys that only
    exist on one side (train-state fields added/removed across versions).
    Dicts restored from msgpack use string keys for list indices."""
    if isinstance(template, dict):
        if not isinstance(stored, dict):
            raise ValueError(f"checkpoint structure mismatch at {path!r}")
        out = {}
        for k, v in template.items():
            if k in stored:
                out[k] = _merge_into_template(v, stored[k], f"{path}/{k}")
            else:
                out[k] = v  # new field since the checkpoint was written
        return out
    if isinstance(template, (list, tuple)):
        if isinstance(stored, dict):
            if hasattr(template, "_fields"):
                # namedtuples (optax states) serialize keyed by field name;
                # a field ADDED since the checkpoint was written keeps its
                # template value (same tolerance as the dict branch — an
                # optax upgrade must not brick --from-checkpoint)
                items = [
                    stored[f] if f in stored else getattr(template, f)
                    for f in template._fields
                ]
            else:  # plain sequences serialize as {"0": ..., "1": ...}
                items = [stored[str(i)] for i in range(len(stored))]
        else:
            items = list(stored)
        if len(items) != len(template):
            raise ValueError(
                f"checkpoint sequence length mismatch at {path!r}: "
                f"{len(items)} vs {len(template)}"
            )
        merged = [
            _merge_into_template(t, v, f"{path}/{i}")
            for i, (t, v) in enumerate(zip(template, items))
        ]
        if isinstance(template, tuple):
            # namedtuples (optax states) take positional fields
            if hasattr(template, "_fields"):
                return type(template)(*merged)
            return tuple(merged)
        return merged
    if template is None:
        return None if stored is None else stored
    arr = np.asarray(stored)
    want = np.asarray(template)
    if arr.shape != want.shape:
        raise ValueError(
            f"checkpoint shape mismatch at {path!r}: {arr.shape} vs {want.shape}"
        )
    return arr.astype(want.dtype)
