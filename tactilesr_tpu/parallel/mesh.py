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

import logging
from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch_size",
    "put_global",
    "host_local_copy",
    "resolve_mesh",
    "resolve_mesh_from_config",
]

logger = logging.getLogger("tactilesr_tpu")

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


def put_global(tree, sharding: Optional[NamedSharding]):
    """Place a host pytree under a sharding, correctly for ANY process count.

    Single-process: plain ``jax.device_put``.  Multi-process (a mesh spanning
    processes, so some devices are non-addressable): ``device_put`` of a host
    value onto a NamedSharding is NOT the multihost global-array construction
    -- each process must instead contribute the data for its own addressable
    shards.  ``jax.make_array_from_callback`` does exactly that, for
    replicated and sharded layouts alike, under one precondition that this
    framework upholds everywhere: every process passes the SAME host value
    (datasets load from the same files on every process, batch indices derive
    from the shared config seed, and checkpoints are read by all processes).

    Replaces the reference's DDP broadcast-from-rank-0 model placement
    (cpu/trainer.py:171-176 relies on torch DDP construction) with the
    single-controller JAX equivalent.
    """
    if sharding is None:
        return jax.device_put(tree)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def one(x):
        a = np.asarray(x)
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        )

    return jax.tree_util.tree_map(one, tree)


def host_local_copy(tree):
    """A host (or process-local) copy of a pytree safe for EAGER ops.

    Under a multi-process mesh, state lives on non-addressable devices where
    eager (non-jit) computation is disallowed; fetching the (replicated)
    values to host is process-local -- no collective.  Single-process trees
    pass through untouched."""
    leaves = jax.tree_util.tree_leaves(tree)
    if any(not getattr(leaf, "is_fully_addressable", True) for leaf in leaves):
        return jax.device_get(tree)
    return tree


def resolve_mesh(
    spec: Union[str, int, None] = "auto",
    batch_size: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Optional[Mesh]:
    """Mesh from the ``data_parallel`` config knob -- the product-surface
    entry to scaling (the role the reference's ``init_distributed`` plays for
    every entry script, cpu/distributed.py:171-217).

    - ``"off"`` / ``0`` / ``1`` / ``None`` / ``False``: single device (no mesh);
    - ``"auto"`` (default): all local devices, shrunk to the largest count
      that divides ``batch_size`` (with a warning) so recipes never die on a
      divisibility error they didn't opt into;
    - an integer N: exactly N devices -- asserts availability and
      batch divisibility (a mis-sized explicit request is a user error).
    """
    if devices is None:
        devices = jax.devices()
    if spec is True:  # bool before the off-tuple: True == 1 would match it
        spec = "auto"
    if isinstance(spec, str):  # CLI strings: accept on/off synonyms
        low = spec.strip().lower()
        if low in ("true", "on", "yes"):
            spec = "auto"
        elif low in ("false", "no", "none"):
            spec = "off"
        else:
            spec = low
    if spec is False or spec in (None, "off", "0", "1", 0, 1):
        return None
    n = len(devices)
    # Group by owning process: a shrunken mesh must still cover EVERY
    # process, else the excluded processes have no addressable shards --
    # put_global raises there and the survivors hang in the first
    # collective.  Shrinking is therefore done in whole multiples of the
    # process count, taking devices evenly from each process.
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    nproc = len(by_proc)
    per_proc_cap = min(len(v) for v in by_proc.values())

    def pick(ndata):
        if nproc == 1:
            return list(devices)[:ndata]
        per = ndata // nproc
        return [d for pid in sorted(by_proc) for d in by_proc[pid][:per]]

    if spec == "auto":
        ndata = per_proc_cap * nproc
        if batch_size is not None:
            usable = ndata  # may already be < n (uneven per-process counts)
            while ndata > 0 and batch_size % ndata:
                ndata -= nproc
            if 0 < ndata < usable:  # only when divisibility shrank the axis
                logger.warning(
                    "data_parallel=auto: batch size %d not divisible by %d "
                    "devices; using a %d-device data axis",
                    batch_size,
                    usable,
                    ndata,
                )
        if ndata <= 1:
            if nproc > 1:
                raise ValueError(
                    f"data_parallel=auto: no multiple of the process count "
                    f"({nproc}) divides batch size {batch_size}; a "
                    f"multi-process run cannot fall back to independent "
                    f"single-device replicas -- pick a divisible batch size"
                )
            return None
        return make_mesh(pick(ndata))
    ndata = int(spec)
    assert 1 <= ndata <= n, (
        f"data_parallel={ndata} requested but only {n} devices are present"
    )
    if nproc > 1 and (ndata % nproc or ndata // nproc > per_proc_cap):
        raise ValueError(
            f"data_parallel={ndata} cannot be laid out evenly over "
            f"{nproc} processes ({per_proc_cap} devices each); use a "
            f"multiple of {nproc} up to {per_proc_cap * nproc}"
        )
    if batch_size is not None and ndata > 1:
        assert batch_size % ndata == 0, (
            f"batch size {batch_size} must be divisible by data_parallel={ndata}"
        )
    if ndata == 1:
        return None
    return make_mesh(pick(ndata))


def resolve_mesh_from_config(config) -> Optional[Mesh]:
    """Mesh from a task config's ``data_parallel`` + ``train_batch_size``
    keys, with the standard announcement log -- shared by both task mains."""
    mesh = resolve_mesh(
        config.get("data_parallel", "auto"),
        batch_size=config["train_batch_size"],
    )
    if mesh is not None:
        logger.info(
            "Data parallelism: %d-device mesh %s",
            mesh.devices.size,
            dict(mesh.shape),
        )
    return mesh
