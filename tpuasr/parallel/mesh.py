"""Device mesh + sharding rules.

The TPU-native replacement for the reference's whole distributed stack
(SURVEY §2.7/§2.8): one `jax.sharding.Mesh` over all chips with a `data` axis
(batch/DP) and an optional `model` axis (joint-tensor vocab sharding when
(T, U, V) exceeds HBM — BASELINE.json north star). Gradients reduce via
compiler-inserted psum over ICI/DCN; there is no process-group management,
no monitored barrier (SPMD lockstep), no DDP/FSDP/DeepSpeed wrapper zoo
(train_utils.py:410-488) to re-express.

Multi-host: `jax.distributed.initialize()` (called by the launcher, not here)
makes `jax.devices()` global; per-host data loading uses
`pipeline.LengthBucketPipeline(host_id=jax.process_index(), ...)` and batches
are placed with `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[list] = None,
    model_parallel_size: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel_size == 0, (n, model_parallel_size)
    arr = np.asarray(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading (batch) dim split over the data axis, rest replicated."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, data_axis: str = "data") -> dict:
    """Place host numpy batch arrays on the mesh, batch dim on `data`."""
    sh = batch_sharding(mesh, data_axis)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            out[k] = jax.device_put(v, sh)
        elif isinstance(v, np.ndarray) or np.isscalar(v):
            out[k] = jax.device_put(np.asarray(v), replicated_sharding(mesh))
        else:
            out[k] = v  # strings etc. stay on host
    return out


def joint_logits_spec(mesh: Mesh, data_axis: str = "data", model_axis: str = "model") -> P:
    """[B, T, U, V] joint tensor: batch on data, vocab on model."""
    return P(data_axis, None, None, model_axis)
