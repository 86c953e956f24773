import os

# Simulate an 8-device TPU-like mesh on CPU for sharding tests.  XLA_FLAGS
# must be set before the CPU backend initialises; the platform choice is made
# through jax.config (the env var alone is not honored under the axon TPU
# plugin in this image).
import re as _re

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in flags:
    # a pre-set DIFFERENT count (e.g. =4 from a prior benchmarking shell)
    # would fail every sharding test on the ==8 assertion; override it
    flags = _re.sub(r"--xla_force_host_platform_device_count=\d+",
                    "--xla_force_host_platform_device_count=8", flags)
    os.environ["XLA_FLAGS"] = flags
else:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
