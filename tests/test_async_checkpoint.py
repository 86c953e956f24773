"""Async checkpointer: background writes, same-step dedup, error surfacing."""

import os
import time

import numpy as np
import pytest

import jax.numpy as jnp

from protnote_tpu.core.async_checkpoint import AsyncCheckpointer
from protnote_tpu.core.checkpoint import restore_checkpoint


def make_state(v: float):
    return {
        "trainable": {"w": jnp.full((64, 64), v, jnp.float32)},
        "step": jnp.asarray(int(v), jnp.int32),
    }


def test_async_save_restore_roundtrip(tmp_path):
    ck = AsyncCheckpointer()
    path = str(tmp_path / "a.ckpt")
    state = make_state(3.0)
    ck.save(path, state, epoch=5, best_val_metric=0.9)
    ck.wait()
    restored, meta = restore_checkpoint(path, make_state(0.0))
    assert meta["epoch"] == 5 and meta["best_val_metric"] == 0.9
    np.testing.assert_array_equal(
        np.asarray(restored["trainable"]["w"]),
        np.full((64, 64), 3.0, np.float32),
    )
    ck.close()


def test_snapshot_isolates_later_mutation(tmp_path):
    """The device->host snapshot happens at save() time: mutating (donating)
    the state afterwards must not affect the written file."""
    ck = AsyncCheckpointer()
    path = str(tmp_path / "b.ckpt")
    state = {"w": np.ones(8, np.float32)}
    ck.save(path, state, epoch=1)
    state["w"][:] = -1.0  # simulates the next donated train step
    ck.wait()
    restored, _ = restore_checkpoint(path, {"w": np.zeros(8, np.float32)})
    np.testing.assert_array_equal(restored["w"], np.ones(8, np.float32))
    ck.close()


def test_dedup_same_tag_writes_both_paths(tmp_path):
    """best-metric + best-loss firing in the same epoch serialize once but
    both files exist and restore identically."""
    ck = AsyncCheckpointer()
    p1, p2 = str(tmp_path / "m.ckpt"), str(tmp_path / "l.ckpt")
    state = make_state(7.0)
    ck.save(p1, state, epoch=3, dedup_tag=3)
    ck.save(p2, state, epoch=3, dedup_tag=3)
    ck.wait()
    for p in (p1, p2):
        restored, meta = restore_checkpoint(p, make_state(0.0))
        assert meta["epoch"] == 3
        assert float(np.asarray(restored["trainable"]["w"])[0, 0]) == 7.0
    ck.close()


def test_write_error_raised_on_wait(tmp_path):
    ck = AsyncCheckpointer()
    # parent "directory" is a regular file -> the background write must fail
    # and the failure must surface on wait()
    blocker = tmp_path / "blocker"
    blocker.write_text("not a directory")
    ck.save(str(blocker / "x.ckpt"), make_state(1.0), epoch=0)
    with pytest.raises(Exception):
        ck.wait()


def test_checkpoint_checksum_detects_corruption(tmp_path):
    """A torn/partially-written checkpoint must fail loudly at restore
    (VERDICT r2 weak #8: silent desync risk on shared storage)."""
    import numpy as np
    import pytest

    from protnote_tpu.core.checkpoint import restore_checkpoint, save_checkpoint

    ts = {"trainable": {"w": np.arange(32, dtype=np.float32)}}
    path = str(tmp_path / "c.ckpt")
    save_checkpoint(path, ts, epoch=3)

    # clean restore carries the checksum in meta
    restored, meta = restore_checkpoint(path, ts)
    assert meta["checksum_crc32"] is not None
    np.testing.assert_array_equal(restored["trainable"]["w"],
                                  ts["trainable"]["w"])

    # truncation -> checksum mismatch
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:-8])
    with pytest.raises(ValueError, match="checksum mismatch"):
        restore_checkpoint(path, ts)

    # single-byte corruption inside the tree -> checksum mismatch
    corrupted = bytearray(blob)
    corrupted[-10] ^= 0xFF
    open(path, "wb").write(bytes(corrupted))
    with pytest.raises(ValueError, match="checksum mismatch"):
        restore_checkpoint(path, ts)


def test_async_checkpoints_carry_checksum(tmp_path):
    """The async writer must record the same integrity fields as the sync
    writer — without them every trainer-written checkpoint silently skips
    the restore-time CRC check and the multi-host desync assertion."""
    import numpy as np

    from protnote_tpu.core.async_checkpoint import AsyncCheckpointer
    from protnote_tpu.core.checkpoint import restore_checkpoint

    ts = {"trainable": {"w": np.arange(16, dtype=np.float32)}}
    path = str(tmp_path / "a.ckpt")
    ck = AsyncCheckpointer()
    ck.save(path, ts, epoch=1)
    ck.wait()
    restored, meta = restore_checkpoint(path, ts)
    assert meta.get("checksum_crc32") is not None
    assert meta.get("blob_bytes", 0) > 0
    np.testing.assert_array_equal(restored["trainable"]["w"],
                                  ts["trainable"]["w"])

    # truncation of an async-written checkpoint fails loudly too
    import pytest

    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:-4])
    with pytest.raises(ValueError, match="checksum mismatch"):
        restore_checkpoint(path, ts)
    ck.close()
