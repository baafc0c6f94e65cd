"""Device mesh and sharding layout.

TPU-native replacement for the reference's torch.distributed/NCCL tier
(cpu/distributed.py): instead of process-group collectives, we lay a
``jax.sharding.Mesh`` over the slice's ICI and express data parallelism as
sharding annotations -- XLA inserts the gradient all-reduce (psum over the
'data' axis) during compilation.

Layout choices (models here are ~1-3M params -- see SURVEY.md 2.6):
- datasets: tiny, replicated in HBM on every device;
- batch *indices*: sharded P('data'); the on-device gather of a replicated
  array by sharded indices yields a batch sharded on its leading axis with
  zero communication;
- params/opt state: replicated; jit's reverse-mode AD of the sharded-batch
  loss produces the cross-device grad reduction automatically over ICI.

A 'model' axis is part of the mesh signature for forward-compatibility
(tensor-parallel variants); the standard recipes run it at size 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch_size",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence] = None, model_parallel: int = 1
) -> Mesh:
    """(data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (
        f"device count {n} not divisible by model_parallel {model_parallel}"
    )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_size(batch_size: int, mesh: Mesh) -> int:
    """Validate that the global batch divides evenly over the data axis."""
    ndata = mesh.shape[DATA_AXIS]
    assert batch_size % ndata == 0, (
        f"global batch size {batch_size} must be divisible by the data-axis "
        f"size {ndata}"
    )
    return batch_size // ndata
