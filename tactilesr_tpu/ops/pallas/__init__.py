from .tpsf_kernel import tpsf_physics_fused, tpsf_physics_pallas_raw

__all__ = ["tpsf_physics_fused", "tpsf_physics_pallas_raw"]
