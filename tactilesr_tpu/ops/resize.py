"""Bilinear resize with PyTorch ``align_corners=False`` semantics, as matmuls.

Why not ``jax.image.resize``: when *downsampling*, jax applies an anti-aliasing
kernel (scaled triangle), whereas ``torch.nn.functional.interpolate`` (used by
the reference for both the 4->40 input upsample and the 100->40 label
downsample; reference model/tactileSR_model.py:35,83 and
train/tactileSR_train.py:45) always samples exactly two neighbours per axis.
The two disagree on every downsample and on boundary handling, which is
parity-critical for the training labels.

TPU-native design: since all sizes here are small and static, the resize is
expressed as two dense matrix multiplications ``W_h @ img @ W_w^T`` which XLA
maps straight onto the MXU and fuses with neighbouring ops.  The weight
matrices are built once on host (each row has at most two non-zeros) and
baked into the compiled program as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bilinear_resize_matrix", "resize_bilinear", "upsample_bilinear"]


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix M with (M @ x) == torch bilinear resample of x.

    Implements torch's ``area_pixel_compute_source_index`` for
    ``align_corners=False``: src = (dst + 0.5) * (in/out) - 0.5, clamped below
    at 0; the two taps are floor(src) and min(floor(src)+1, in-1).
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[dst.astype(np.int64), i0] += w0
    mat[dst.astype(np.int64), i1] += w1
    return mat.astype(np.float32)


def bilinear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Public accessor for the (out, in) torch-bilinear weight matrix."""
    return _resize_matrix_np(in_size, out_size)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Resize the two trailing-but-one axes of an NHWC (or HW / NHW) array.

    Accepts (..., H, W, C) layout; H and W are axes -3 and -2.
    Matches ``F.interpolate(mode='bilinear', align_corners=False)`` exactly.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_resize_matrix_np(h_in, h_out))
    ww = jnp.asarray(_resize_matrix_np(w_in, w_out))
    dtype = x.dtype
    # two MXU matmuls; compute in f32 at full precision for torch parity
    # (TPU matmuls otherwise downcast inputs to bf16)
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hwc->...owc", wh, x.astype(jnp.float32), precision=hi)
    y = jnp.einsum("pw,...owc->...opc", ww, y, precision=hi)
    return y.astype(dtype)


def resize_bilinear_nchw(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Same as :func:`resize_bilinear` but for (..., C, H, W) layout."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_resize_matrix_np(h_in, h_out))
    ww = jnp.asarray(_resize_matrix_np(w_in, w_out))
    dtype = x.dtype
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32), precision=hi)
    y = jnp.einsum("pw,...ow->...op", ww, y, precision=hi)
    return y.astype(dtype)


def upsample_bilinear(x: jnp.ndarray, scale_factor: int) -> jnp.ndarray:
    """NHWC upsample by integer scale factor (torch ``nn.Upsample`` parity)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (h * scale_factor, w * scale_factor))
