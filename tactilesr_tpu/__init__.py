"""tactilesr_tpu: TPU-native tactile super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
wmtlab/tactileSR (IROS 2022 TactileSRCNN; ToH 2024 tPSFNet + TactileSR
STSR/MTSR): models, physics, data pipeline, training runtime, metrics,
checkpointing, and multi-device scaling over a jax.sharding Mesh.
"""

__version__ = "0.1.0"

import os as _os


def maybe_force_platform() -> None:
    """Honor ``$TACTILESR_PLATFORM`` (e.g. 'cpu', 'tpu') -- or, failing
    that, the standard ``$JAX_PLATFORMS`` -- even when a site plugin pinned
    another jax platform at interpreter start via the config API (which
    silently outranks the env var).  Must run before any jax backend is
    initialized; entry scripts call this first.  This restores jax's
    documented precedence (explicit env beats site defaults) for every
    product CLI, so e.g. ``JAX_PLATFORMS=cpu python train/X_train.py``
    stays a CPU run on a TPU-pinned host."""
    plat = _os.environ.get("TACTILESR_PLATFORM") or _os.environ.get(
        "JAX_PLATFORMS"
    )
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # backend already initialized; leave as-is
            pass


from . import metrics, models, ops

__all__ = ["metrics", "models", "ops", "maybe_force_platform", "__version__"]
