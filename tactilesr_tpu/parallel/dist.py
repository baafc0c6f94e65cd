"""Multi-process (multi-host) helpers.

Parity with the reference's distributed surface (cpu/distributed.py:
init_distributed / get_rank / get_world_size / is_main_process / gather /
all_gather / reduce_dict), recast for single-controller JAX:

- process identity comes from ``jax.process_index()`` / ``process_count()``;
- tensor reductions happen *inside* compiled programs (psum over the mesh),
  so the host-side object gather the reference needed (a gloo side-channel
  for picklable metrics) reduces to ``multihost_utils`` broadcasts;
- checkpoint/log gating uses ``is_main_process()`` exactly as the reference
  gates its rank-0 hooks.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = [
    "init_distributed",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "reduce_dict",
    "all_gather_object",
    "gather_object",
]

logger = logging.getLogger(__name__)


def _enable_cpu_collectives() -> None:
    """Cross-process collectives on the CPU backend need the gloo
    implementation; the knob is a no-op for TPU backends."""
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jax without the knob
        pass


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX; no-op (returning process 0) when launched
    single-host.

    Bootstrap derivation mirrors the reference's ``init_distributed``
    (cpu/distributed.py:171-217: explicit args > env:// > SLURM):
    1. explicit arguments;
    2. ``TACTILESR_COORDINATOR`` / ``TACTILESR_NUM_PROCESSES`` /
       ``TACTILESR_PROCESS_ID`` environment variables;
    3. a SLURM allocation (``SLURM_NTASKS`` > 1) -- jax's built-in cluster
       detection derives coordinator/rank/world from the SLURM env;
    4. otherwise: single process.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        # idempotent: the entry scripts call this unconditionally, and a
        # launcher (or test worker) may have initialized the cluster already
        return jax.process_index()
    env = os.environ
    if num_processes is None and env.get("TACTILESR_NUM_PROCESSES"):
        coordinator_address = coordinator_address or env.get("TACTILESR_COORDINATOR")
        num_processes = int(env["TACTILESR_NUM_PROCESSES"])
        if process_id is None and env.get("TACTILESR_PROCESS_ID"):
            process_id = int(env["TACTILESR_PROCESS_ID"])
    if num_processes is not None and num_processes > 1:
        _enable_cpu_collectives()
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is None and int(env.get("SLURM_NTASKS", "1")) > 1:
        _enable_cpu_collectives()
        jax.distributed.initialize()  # SLURM auto-detection
    else:
        return jax.process_index()
    logger.info(
        "jax.distributed initialized: process %d / %d",
        jax.process_index(),
        jax.process_count(),
    )
    return jax.process_index()


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def reduce_dict(metrics: Dict[str, Any], average: bool = True) -> Dict[str, float]:
    """Average (or sum) a dict of scalars across processes.

    Single-process: identity.  Multi-process: uses
    ``multihost_utils.process_allgather`` on a stacked vector.
    """
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics.keys())
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(vec)  # (P, K)
    red = gathered.mean(axis=0) if average else gathered.sum(axis=0)
    return {k: float(red[i]) for i, k in enumerate(keys)}


def all_gather_object(value: Any) -> list:
    """Gather one arbitrary picklable value from every process (the
    reference's gloo-side-channel ``all_gather``, cpu/distributed.py:25-57):
    pickle to bytes, allgather the lengths, pad each payload to the max
    length, allgather the padded uint8 buffers, unpickle per process."""
    if jax.process_count() == 1:
        return [value]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(value, protocol=pickle.HIGHEST_PROTOCOL)
    length = np.asarray([len(payload)], np.int64)
    lengths = multihost_utils.process_allgather(length).reshape(-1)
    max_len = int(lengths.max())
    buf = np.zeros(max_len, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    bufs = multihost_utils.process_allgather(buf)  # (P, max_len)
    return [
        pickle.loads(bufs[p, : int(lengths[p])].tobytes())
        for p in range(jax.process_count())
    ]


def gather_object(value: Any, dst: int = 0) -> Optional[list]:
    """Gather to one process: the list on ``dst``, None elsewhere (the
    reference's ``gather``, cpu/distributed.py:60-86; single-controller JAX
    has no rooted object gather, so this is allgather + local selection)."""
    gathered = all_gather_object(value)
    return gathered if jax.process_index() == dst else None
