"""Fused tPSF physics as a batch-tiled Pallas TPU kernel.

Each grid step loads a tile of ``TILE`` samples into VMEM and, per sample,
computes entirely on-chip:

  1. the banded PSF operator  A[i,j] = exp(-C_PSF*(j-i)^2 / beta^2),
     |j-i| <= 49  (built on the fly from iotas -- never touches HBM),
  2. HR0 = alpha * (A @ D @ A^T)          -- two (100,100) MXU matmuls,
  3. the contact-mask second-max fixup,
  4. the taxel degradation LR[i,j] = (U @ HR @ U^T - mn*sum(HR)) * 1e-4/(1-mn)
     with U[t,x] = exp(-C_MASK*(x - c_t)^2 / m).

Fusing steps 1-4 keeps every intermediate (A: 40 KB, HR: 40 KB) in VMEM; the
XLA path materializes the per-sample band matrices and HR maps in HBM
between ops.  Mathematically identical to ops/psf.py's separable
formulation, which itself is golden-tested against the reference's direct
conv semantics (model/tPSFNet.py:78-141).

Why the tile: the per-sample (100,100) matmuls underfill the MXU and, one
sample per grid step, the launch/DMA latency dominates (round 1 measured
187k samples/s vs XLA's 266k).  Unrolling ``TILE=8`` samples per step gives
the scheduler 16 independent MXU contractions plus VPU work to overlap and
amortizes the per-step overhead 8x.  Measured on the v5e chip (B=1024,
f32-HIGHEST matmuls, same as the XLA path), interleaved A/B over 3x40
iterations: tiled kernel ~538k samples/s vs XLA separable ~450k (1.13-1.4x
per round, kernel ahead in every round); max |dev| vs the XLA path 1e-3 on
HR, 1.2e-4 on LR (reassociated f32 accumulation).  The kernel is therefore
the default physics path on TPU (``use_pallas_physics`` in
config/default.py; forced off on CPU where interpret mode is test-only).

The in-kernel matmuls take a ``precision`` argument.  HIGHEST (true-f32,
6 MXU passes) is the parity default; DEFAULT (one bf16 pass) measured +33%
at generation-scale batches (B=8192 on the v5e: 1.14M samples/s at tile
16/32 vs 855k for both XLA and the HIGHEST kernel; tile x precision sweep
in scripts/probe_tpsf_kernel.py) at 2.1e-3 relative deviation on LR — opt
in via ``physics_precision: default`` where bf16 physics labels are
acceptable, e.g. dataset generation (`--physics-precision default`).  At
the training batch (B=256) dispatch overhead dominates and the knob is
neutral.  See docs/PERF.md for the full sweep.

The backward pass falls back to the XLA formulation via custom_vjp
(recompute); training uses whichever path the config selects, and both are
cross-checked in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..psf import (
    C_MASK,
    C_PSF,
    DEGRADE_SCALE,
    DISTURBANCE,
    HR_SIZE,
    PSF_CENTER,
    TAXEL_CENTER_0,
    TAXEL_PITCH,
    TAXELS,
    _physics_single,
)

__all__ = ["tpsf_physics_fused", "tpsf_physics_pallas_raw", "get_fused", "TILE"]

TILE = 8  # samples per grid step; amortizes launch/DMA, overlaps 16 matmuls


def _sample_body(alpha, beta, m, d, precision):
    """Physics for ONE sample: alpha/beta/m scalars, d (100,100) f32 -> (hr, lr)."""

    # banded PSF operator from iotas (no HBM traffic); Mosaic iota is
    # integer-only, cast afterwards
    i = jax.lax.broadcasted_iota(jnp.int32, (HR_SIZE, HR_SIZE), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (HR_SIZE, HR_SIZE), 1)
    off = (j - i).astype(jnp.float32)
    band = jnp.exp(-C_PSF * off * off / (beta * beta))
    valid = jnp.abs(off) <= PSF_CENTER
    a = jnp.where(valid, band, 0.0)

    # HR0 = alpha * A @ D @ A^T  -- MXU
    hi = precision
    t1 = jnp.dot(a, d, preferred_element_type=jnp.float32, precision=hi)
    hr0 = alpha * jnp.dot(t1, a.T, preferred_element_type=jnp.float32, precision=hi)

    # contact-mask second-max substitution
    mask = d > (jnp.max(d) - DISTURBANCE)
    second = jnp.max(jnp.where(mask, 0.0, hr0))
    hr = jnp.where(mask, second, hr0)

    # taxel degradation: U (4,100) from iotas
    x = jax.lax.broadcasted_iota(jnp.int32, (TAXELS, HR_SIZE), 1).astype(jnp.float32)
    c = (
        jax.lax.broadcasted_iota(jnp.int32, (TAXELS, HR_SIZE), 0).astype(jnp.float32)
        * TAXEL_PITCH
        + TAXEL_CENTER_0
    )
    u = jnp.exp(-C_MASK * (x - c) * (x - c) / m)
    t2 = jnp.dot(
        jnp.dot(u, hr, preferred_element_type=jnp.float32, precision=hi),
        u.T,
        preferred_element_type=jnp.float32,
        precision=hi,
    )
    mn = jnp.exp(-100.0 / m)
    lr = (t2 - mn * jnp.sum(hr)) / (1.0 - mn) * DEGRADE_SCALE
    return hr, lr


def _make_kernel(precision):
    def _kernel(abm_ref, depth_ref, hr_ref, lr_ref):
        # unrolled over the tile: 2*TILE independent MXU contractions for
        # the scheduler to overlap with the VPU band/mask work of other
        # samples
        for t in range(abm_ref.shape[0]):
            alpha = abm_ref[t, 0, 0]  # SMEM: scalar loads only
            beta = abm_ref[t, 0, 1]
            m = abm_ref[t, 0, 2]
            d = depth_ref[t, :, :].astype(jnp.float32)
            hr, lr = _sample_body(alpha, beta, m, d, precision)
            hr_ref[t, :, :] = hr
            lr_ref[t, :, :] = lr

    return _kernel


def tpsf_physics_pallas_raw(
    depth,
    abm,
    interpret: bool | None = None,
    tile: int = TILE,
    precision=jax.lax.Precision.HIGHEST,
):
    """Batch-tiled fused kernel: depth (B,100,100), abm (B,3) -> (HR, LR).

    ``interpret`` defaults to True off-TPU so tests exercise the same kernel
    body on the CPU mesh.  ``tile`` samples run per grid step; the batch is
    zero-padded up to a tile multiple (a zero depth map is harmless: its
    outputs are sliced away).  ``precision`` feeds the in-kernel matmuls
    (HIGHEST = true-f32 6-pass MXU, the parity default).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = depth.shape[0]
    tile = max(1, min(tile, b))
    pad = (-b) % tile
    if pad:
        depth = jnp.concatenate(
            [depth, jnp.zeros((pad,) + depth.shape[1:], depth.dtype)]
        )
        # beta/m appear in divisions -- pad with ones, not zeros
        abm = jnp.concatenate([abm, jnp.ones((pad, 3), abm.dtype)])
    bp = b + pad
    # (B,1,3) so the per-step SMEM block's trailing dims equal the array's
    # (TPU lowering requires trailing block dims divisible by (8,128) or
    # equal to the full array dims)
    abm3 = abm.astype(jnp.float32)[:, None, :]
    hr, lr = pl.pallas_call(
        _make_kernel(precision),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1, 3), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, HR_SIZE, HR_SIZE), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, HR_SIZE, HR_SIZE), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, TAXELS, TAXELS), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, HR_SIZE, HR_SIZE), jnp.float32),
            jax.ShapeDtypeStruct((bp, TAXELS, TAXELS), jnp.float32),
        ],
        interpret=interpret,
    )(abm3, depth.astype(jnp.float32))
    if pad:
        hr, lr = hr[:b], lr[:b]
    return hr, lr


def _xla_reference(depth, abm):
    hr, lr = _physics_single(depth, abm)
    return hr, lr


@functools.lru_cache(maxsize=None)
def get_fused(precision=jax.lax.Precision.HIGHEST, tile=TILE):
    """Fused forward (Pallas) with an XLA-recompute backward; drop-in for
    ``tpsf_forward_physics(..., return_psf=False)`` minus the psf output.

    One cached custom_vjp function per (matmul ``precision``, ``tile``) so
    jit caches stay warm across calls.  The backward recomputes through the
    XLA formulation at HIGHEST regardless of the forward precision
    (gradients are MSE-against-labels; a bf16 forward with an f32-exact
    backward keeps optimizer trajectories well-conditioned)."""

    @jax.custom_vjp
    def fused(depth, abm):
        return tpsf_physics_pallas_raw(depth, abm, tile=tile, precision=precision)

    def _fwd(depth, abm):
        return fused(depth, abm), (depth, abm)

    def _bwd(residuals, cotangents):
        depth, abm = residuals
        _out, vjp = jax.vjp(_xla_reference, depth, abm)
        return vjp(cotangents)

    fused.defvjp(_fwd, _bwd)
    return fused


def tpsf_physics_fused(depth, abm, precision=jax.lax.Precision.HIGHEST):
    """Back-compat wrapper around :func:`get_fused`."""
    return get_fused(precision)(depth, abm)
