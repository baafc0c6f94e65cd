"""Misc runtime utilities: env report, deterministic seeding.

Capability parity with the reference's cpu/misc.py (collect_env tabulated
report, set_random_seed, symlink -- symlink lives in checkpoint.py here).
"""

from __future__ import annotations

import os
import platform
import random
import sys

import numpy as np

__all__ = ["collect_env", "set_random_seed", "apply_matmul_precision"]


def apply_matmul_precision(config) -> None:
    """Apply the ``matmul_precision`` config key to jax's global flag.

    Always sets the flag ("default" maps back to jax's unset state, None) so
    consecutive runs in one process cannot inherit a previous run's
    override.  On TPU, "default" lowers f32 contractions to one bf16 MXU
    pass; "highest" computes true f32 (6 passes) -- required when comparing
    float32 training against a CPU/GPU reference (scripts/head_to_head.py).
    """
    import jax

    prec = config.get("matmul_precision", "default")
    jax.config.update(
        "jax_default_matmul_precision", None if prec in (None, "default") else prec
    )


def collect_env() -> str:
    """Human-readable environment report for the training log."""
    import jax

    rows = [
        ("sys.platform", sys.platform),
        ("Python", sys.version.replace("\n", "")),
        ("numpy", np.__version__),
        ("jax", jax.__version__),
        ("jax backend", jax.default_backend()),
        ("devices", ", ".join(str(d) for d in jax.devices())),
        ("device count", str(jax.device_count())),
        ("process count", str(jax.process_count())),
        ("hostname", platform.node()),
    ]
    try:
        import flax

        rows.append(("flax", flax.__version__))
    except ImportError:
        pass
    try:
        import optax

        rows.append(("optax", optax.__version__))
    except ImportError:
        pass
    try:
        from tabulate import tabulate

        return tabulate(rows)
    except ImportError:
        width = max(len(k) for k, _ in rows)
        return "\n".join(f"{k:<{width}}  {v}" for k, v in rows)


def set_random_seed(seed: int = -1, deterministic: bool = False) -> int:
    """Seed python/numpy RNGs and PYTHONHASHSEED; returns the seed used.

    JAX is functional -- model/data randomness flows through explicit
    ``jax.random.key(seed)`` streams derived from this seed by the callers.
    ``deterministic=True`` additionally disables XLA autotune-driven
    non-determinism on TPU/GPU backends where applicable.
    """
    if seed < 0:
        seed = int.from_bytes(os.urandom(4), "little")
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    if deterministic:
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_gpu_deterministic_ops" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_gpu_deterministic_ops=true").strip()
    return seed
