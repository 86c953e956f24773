"""Multi-host helpers (single-process semantics on the virtual 8-device mesh)."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from protnote_tpu.parallel.distributed import (
    global_device_put,
    initialize_distributed,
    is_main_process,
)
from protnote_tpu.parallel.mesh import MeshSpec, make_mesh


def test_initialize_noop_without_config(monkeypatch):
    """No coordinator flags/env and no --distributed: must not touch
    jax.distributed (the axon plugin even sets TPU_WORKER_HOSTNAMES on a
    single host, which must not trigger initialization)."""
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize_distributed() is False
    assert is_main_process()


def test_global_device_put_matches_device_put(rng, cpu_devices):
    mesh = make_mesh(MeshSpec(dp=4, label=2))
    for spec in (P("dp", None), P("label", None), P("dp", "label"), P()):
        sharding = NamedSharding(mesh, spec)
        arr = rng.normal(size=(8, 16)).astype(np.float32)
        a = global_device_put(arr, sharding)
        b = jax.device_put(arr, sharding)
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_global_device_put_feeds_jit(rng, cpu_devices):
    mesh = make_mesh(MeshSpec(dp=8, label=1))
    sharding = NamedSharding(mesh, P("dp", None))
    x = global_device_put(rng.normal(size=(16, 4)).astype(np.float32), sharding)
    y = jax.jit(lambda v: (v * 2).sum())(x)
    assert np.isfinite(float(y))
