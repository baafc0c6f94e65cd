"""tactilesr_tpu: TPU-native tactile super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
wmtlab/tactileSR (IROS 2022 TactileSRCNN; ToH 2024 tPSFNet + TactileSR
STSR/MTSR): models, physics, data pipeline, training runtime, metrics,
checkpointing, and multi-device scaling over a jax.sharding Mesh.
"""

__version__ = "0.1.0"

from . import metrics, models, ops

__all__ = ["metrics", "models", "ops", "__version__"]
