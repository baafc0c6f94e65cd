"""Evaluation metrics, reproducing the reference definitions exactly.

Reference definitions (cited for parity checking):
- PSNR: ``10*log10(maxValue^2 / MSE)`` over a single (H, W) map
  (reference utility/tools.py:49-63).  The entry scripts pass
  ``maxValue = sensorMaxVaule_factor = 250`` (train/tactileSR_train.py:70,89;
  config/default.py:54) -- note the config *comment* claims 25, but the code
  passes 250; we follow the code.
- SSIM: *global-statistics* SSIM -- one mean/variance/covariance over the
  whole image, NO sliding window (reference utility/tools.py:66-81), with
  C1=0.01^2, C2=0.03^2.  This is intentionally NOT skimage's windowed SSIM.

All functions are jit-friendly and accept either jnp or np arrays; batched
variants vmap over a leading axis so the whole eval set is scored in one
compiled call on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psnr", "ssim", "batched_psnr", "batched_ssim", "mse", "ssim_loss"]


def mse(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.mean((a - b) ** 2)


def psnr(pattern1, pattern2, max_value: float):
    """PSNR = 10*log10(MAX^2 / MSE), single (H, W) map."""
    err = mse(pattern1, pattern2)
    return 10.0 * jnp.log10((max_value * max_value) / err)


def ssim(pattern1, pattern2, c1: float = 0.01**2, c2: float = 0.03**2):
    """Global (non-windowed) SSIM over a single (H, W) map."""
    x = jnp.asarray(pattern1, jnp.float32)
    y = jnp.asarray(pattern2, jnp.float32)
    mu1 = x.mean()
    mu2 = y.mean()
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = (x * x).mean() - mu1_sq
    sigma2_sq = (y * y).mean() - mu2_sq
    sigma12 = (x * y).mean() - mu1_mu2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


batched_psnr = jax.vmap(psnr, in_axes=(0, 0, None))
batched_ssim = jax.vmap(ssim, in_axes=(0, 0))


def ssim_loss(img1, img2):
    """Differentiable SSIM objective over whole images (capability parity
    with the reference's unused-but-public SSIM loss module,
    utility/tools.py:85-114).  Being pure-jnp, :func:`ssim` is already
    differentiable; this returns 1 - SSIM as a minimizable loss."""
    return 1.0 - ssim(img1, img2)
