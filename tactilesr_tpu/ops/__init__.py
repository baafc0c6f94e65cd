from .psf import (
    degradation,
    degradation_direct,
    depth_to_hr,
    depth_to_hr_direct,
    psf_kernel,
    tpsf_forward_physics,
)
from .resize import (
    bilinear_resize_matrix,
    resize_bilinear,
    resize_bilinear_nchw,
    upsample_bilinear,
)

__all__ = [
    "psf_kernel",
    "depth_to_hr",
    "depth_to_hr_direct",
    "degradation",
    "degradation_direct",
    "tpsf_forward_physics",
    "resize_bilinear",
    "resize_bilinear_nchw",
    "upsample_bilinear",
    "bilinear_resize_matrix",
]
