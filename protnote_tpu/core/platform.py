"""Backend selection honoring JAX_PLATFORMS under the axon TPU plugin.

The axon plugin in this image ignores the ``JAX_PLATFORMS`` environment
variable, so ``JAX_PLATFORMS=cpu python -m protnote_tpu.cli...`` would still
try to initialize the TPU tunnel (and fail hard when it is unreachable).
Call :func:`honor_jax_platforms_env` before the first jax computation —
bench.py and the test conftest already do the equivalent inline."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not plats:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:  # already initialized with the same value, or absent
        pass
