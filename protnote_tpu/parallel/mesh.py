"""Device mesh and sharding layout.

The reference's distribution story is NCCL DDP plus an optional label-axis
partition in the collator (SURVEY.md §2.11: bin/main.py:192-200,452,
collators.py:82-91).  The TPU-native equivalent is a single
``jax.sharding.Mesh`` with axes ``("dp", "label")``:

* batch-like arrays shard over ``dp`` (gradients are averaged by the psums
  XLA inserts under jit — the DDP allreduce),
* the label-embedding matrix, multi-hot targets and the (B, L) logit matrix
  shard over ``label`` (the DISTRIBUTE_LABELS mode, first-class here),
* parameters are replicated.

Collectives ride ICI automatically; nothing below ever issues an explicit
NCCL-style call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    dp: int = -1  # -1: all remaining devices
    label: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        label = max(1, self.label)
        dp = self.dp if self.dp > 0 else max(1, n_devices // label)
        if dp * label != n_devices:
            raise ValueError(
                f"mesh {dp}x{label} does not match {n_devices} devices"
            )
        return dp, label


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp, label = spec.resolve(len(devices))
    arr = np.array(devices).reshape(dp, label)
    return Mesh(arr, axis_names=("dp", "label"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shardings_for_batch(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Shardings for the arrays of one step (see protnote_tpu.data.batching.Batch)."""
    return {
        "aa_ids": NamedSharding(mesh, P("dp", None)),
        "lengths": NamedSharding(mesh, P("dp")),
        "example_mask": NamedSharding(mesh, P("dp")),
        "label_multihots": NamedSharding(mesh, P("dp", "label")),
        "label_embeddings": NamedSharding(mesh, P("label", None)),
        "label_token_counts": NamedSharding(mesh, P("label")),
        "label_mask": NamedSharding(mesh, P("label")),
        # device-resident label path: per-step gather indices shard over the
        # label axis; the resident view matrix is replicated so each device
        # gathers its own label shard locally (no cross-device gather)
        "label_rows": NamedSharding(mesh, P("label")),
        "label_matrix": NamedSharding(mesh, P()),
        "logits": NamedSharding(mesh, P("dp", "label")),
        "params": NamedSharding(mesh, P()),
    }


def device_put_batch(mesh: Mesh, arrays: Dict[str, Any]) -> Dict[str, Any]:
    """Places host arrays on the mesh with the canonical shardings."""
    sh = shardings_for_batch(mesh)
    out = {}
    for k, v in arrays.items():
        if v is None:
            out[k] = None
            continue
        out[k] = jax.device_put(v, sh.get(k, replicated(mesh)))
    return out
