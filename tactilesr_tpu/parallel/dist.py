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
]

logger = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX when launched across hosts; no-op (returning
    process 0) for the single-host case, mirroring the reference's
    auto-detection behavior."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
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
    """Gather one (small, array-convertible) value from every process."""
    if jax.process_count() == 1:
        return [value]
    from jax.experimental import multihost_utils

    arr = np.asarray(value)
    gathered = multihost_utils.process_allgather(arr)
    return list(gathered)
