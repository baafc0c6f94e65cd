"""Device selection and burn-in utilities.

Capability parity with the reference's GPU tools (utility/tools.py:6-46:
nvidia-smi memory scan -> pick the freest GPU; a timed compute burn-in).
On TPU, device ordering is already sensible and memory comes from
``device.memory_stats()`` (when the backend exposes it), so the "scan" is a
formality -- but the API surface is preserved for drop-in migration.
"""

from __future__ import annotations

import time
from typing import List, Tuple

__all__ = [
    "parse_device_memory",
    "select_device_with_most_free_memory",
    "test_device",
]


def parse_device_memory() -> List[dict]:
    """Per-device memory report: [{index, name, total, used, free}, ...].
    Falls back to zeros when the backend exposes no memory_stats."""
    import jax

    out = []
    for i, dev in enumerate(jax.local_devices()):
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            pass
        total = int(stats.get("bytes_limit", 0))
        used = int(stats.get("bytes_in_use", 0))
        out.append(
            {
                "index": i,
                "name": str(dev),
                "total_memory": total,
                "used_memory": used,
                "free_memory": total - used,
            }
        )
    return out


def select_device_with_most_free_memory() -> Tuple[int, "object", str, int]:
    """(index, device, name, free_bytes) of the least-loaded local device."""
    import jax

    info = parse_device_memory()
    best = max(info, key=lambda d: d["free_memory"])
    dev = jax.local_devices()[best["index"]]
    return best["index"], dev, best["name"], best["free_memory"]


def test_device(
    device=None, test_time: float = 5.0, test_memory_gb: float = 1.0
) -> float:
    """Timed matmul burn-in on one device; returns achieved TFLOP/s.

    Sync discipline for tunneled TPUs: dispatch a pipeline, sync via a
    scalar fetch (block_until_ready is not reliable on every platform).
    """
    import jax
    import jax.numpy as jnp

    if device is None:
        device = jax.local_devices()[0]
    n = 4096
    a = jax.device_put(jnp.ones((n, n), jnp.bfloat16), device)

    @jax.jit
    def step(a):
        return jnp.sum(a @ a)

    float(step(a))  # compile + warm
    iters = 0
    t0 = time.perf_counter()
    out = None
    while time.perf_counter() - t0 < test_time:
        for _ in range(8):
            out = step(a)
        iters += 8
        float(out)
    dt = time.perf_counter() - t0
    tflops = 2 * n**3 * iters / dt / 1e12
    print(f"burn-in: {iters} matmuls in {dt:.1f}s -> {tflops:.1f} TFLOP/s")
    return tflops
