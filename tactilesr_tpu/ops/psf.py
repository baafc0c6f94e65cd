"""tPSF physics ops: PSF synthesis, depth->HR rendering, taxel degradation.

Reference behavior being reproduced (model/tPSFNet.py):
- ``PSF_sdf``: 99x99 Euclidean distance field from the center pixel (49,49),
  min-max scaled to [0,10] (:43-46).  PSF = alpha * exp(-sdf^2 / beta^2) (:78-83).
- ``depth2tactile``: contact mask = depth > max-1e-3; ZeroPad2d(48) then
  conv2d(depth, psf, padding=1) -> (100,100) HR; masked pixels overwritten
  with the max over the *non*-contact region of the detached HR (:85-100).
- ``degradation_process``: per-taxel Gaussian masks exp(-sdf^2/m) over a
  (4,4,100,100) distance field with centers at (12+25i, 12+25j), jointly
  min-max normalized to [0,1]; LR[i,j] = sum(HR*mask[i,j]) * 1e-4 (:129-141).

TPU-native design -- exact separability
---------------------------------------
Because sdf^2 is proportional to (x-cx)^2 + (y-cy)^2 (min-max scaling of a
distance field from 0 to its max is a pure scalar multiple), every Gaussian
here factorizes exactly:

    PSF            = alpha * g (outer) g,      g[t] = exp(-C_PSF * (t-49)^2 / beta^2)
    depth (x) PSF  = alpha * (A @ D @ A^T)     with banded A[i,j] = g[j-i+49]
    taxel masks    = u_i (outer) u_j           (plus a scalar min-max shift)
    degradation    = (U @ HR @ U^T - mn*sum(HR)) * 1e-4 / (1 - mn)

so the reference's per-sample python loop over a 99x99 convolution becomes a
pair of small batched matmuls -- MXU-shaped work with ~25x fewer FLOPs than
the direct conv, and trivially vmapped over the batch.  ``depth_to_hr_direct``
keeps the direct-conv formulation for golden testing.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PSF_SIZE",
    "HR_SIZE",
    "psf_kernel",
    "contact_mask",
    "depth_to_hr",
    "depth_to_hr_direct",
    "degradation",
    "degradation_direct",
    "tpsf_forward_physics",
    "resolve_pallas_physics",
    "resolve_physics_precision",
]

PSF_SIZE = 99
PSF_CENTER = PSF_SIZE // 2  # 49
HR_SIZE = 100
PAD = 48  # ZeroPad2d(48): 100 + 96 = 196, conv pad 1 -> out 100
TAXELS = 4
TAXEL_CENTER_0 = 12
TAXEL_PITCH = 25
DISTURBANCE = 1e-3
DEGRADE_SCALE = 1e-4

# sdf fields are min-max scaled to [0, 10]; distances scale linearly so the
# scaled-squared-distance is C * ((x-cx)^2 + (y-cy)^2) with:
_PSF_DMAX = PSF_CENTER * math.sqrt(2.0)  # corner of the 99x99 field
C_PSF = (10.0 / _PSF_DMAX) ** 2
_MASK_DMAX = (HR_SIZE - 1 - TAXEL_CENTER_0) * math.sqrt(2.0)  # (12,12) -> (99,99)
C_MASK = (10.0 / _MASK_DMAX) ** 2

_TAXEL_CENTERS = np.array(
    [TAXEL_CENTER_0 + TAXEL_PITCH * i for i in range(TAXELS)], dtype=np.float32
)


def _psf_profile(beta, coords=None):
    """1-D PSF factor g[t] = exp(-C_PSF * (t - 49)^2 / beta^2), shape (99,)."""
    if coords is None:
        coords = jnp.arange(PSF_SIZE, dtype=jnp.float32)
    d2 = (coords - PSF_CENTER) ** 2
    return jnp.exp(-C_PSF * d2 / (beta * beta))


def psf_kernel(alpha, beta):
    """Full (99, 99) PSF = alpha * exp(-sdf^2 / beta^2); exact outer product."""
    g = _psf_profile(beta)
    return alpha * jnp.outer(g, g)


def _band_matrix(beta):
    """(100, 100) banded operator A with (A @ D @ A^T) == depth (x) PSF.

    Derivation: the reference zero-pads D by 48 then convs with padding=1 and
    a 99-tap kernel centered at 49.  Output row i draws from padded rows
    i-1 .. i+97, i.e. raw rows j with -49 <= j - i <= 49, weighted g[j-i+49].
    The 48-pad contributes only zeros, so it is never materialized.
    """
    i = jnp.arange(HR_SIZE, dtype=jnp.int32)[:, None]
    j = jnp.arange(HR_SIZE, dtype=jnp.int32)[None, :]
    u = j - i + PSF_CENTER  # kernel tap index
    valid = (u >= 0) & (u < PSF_SIZE)
    d2 = (u.astype(jnp.float32) - PSF_CENTER) ** 2
    g = jnp.exp(-C_PSF * d2 / (beta * beta))
    return jnp.where(valid, g, 0.0)


def contact_mask(depth):
    """Contact region: depth > depth.max() - 1e-3 (per sample)."""
    return depth > (depth.max() - DISTURBANCE)


def _second_max_fixup(hr, mask):
    """Overwrite contact pixels with the max over non-contact pixels of the
    *detached* HR (the reference's 'second max' trick)."""
    non_contact_max = jnp.max(jnp.where(mask, 0.0, hr))
    return jnp.where(mask, jax.lax.stop_gradient(non_contact_max), hr)


_HI = jax.lax.Precision.HIGHEST


def depth_to_hr(depth, alpha, beta):
    """HR tactile map from a (100,100) depth map; separable matmul path."""
    a = _band_matrix(beta)
    d = depth.astype(jnp.float32)
    hr = alpha * jnp.matmul(jnp.matmul(a, d, precision=_HI), a.T, precision=_HI)
    return _second_max_fixup(hr, contact_mask(depth))


def depth_to_hr_direct(depth, alpha, beta):
    """Direct conv formulation (golden-test reference for depth_to_hr)."""
    psf = psf_kernel(alpha, beta)
    padded = jnp.pad(depth.astype(jnp.float32), PAD)
    out = jax.lax.conv_general_dilated(
        padded[None, None],
        psf[None, None],
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return _second_max_fixup(out, contact_mask(depth))


def _taxel_profiles(m):
    """(4, 100) per-taxel 1-D Gaussian factors u_i[t] = exp(-C_MASK*(t-c_i)^2/m)."""
    t = jnp.arange(HR_SIZE, dtype=jnp.float32)[None, :]
    c = jnp.asarray(_TAXEL_CENTERS)[:, None]
    return jnp.exp(-C_MASK * (t - c) ** 2 / m)


def degradation(hr, m):
    """(4,4) degraded LR from a (100,100) HR map; separable matmul path.

    The joint min-max normalization of the reference's 16 masks has min
    mn = exp(-100/m) (scaled sdf max is 10) and max 1, so the normalized sum
    is (U @ HR @ U^T - mn * sum(HR)) / (1 - mn).
    """
    u = _taxel_profiles(m)
    mn = jnp.exp(-100.0 / m)
    hrf = hr.astype(jnp.float32)
    t = jnp.matmul(jnp.matmul(u, hrf, precision=_HI), u.T, precision=_HI)  # (4, 4)
    return (t - mn * jnp.sum(hrf)) / (1.0 - mn) * DEGRADE_SCALE


def degradation_direct(hr, m):
    """Direct 16-mask formulation (golden-test reference for degradation)."""
    x = jnp.arange(HR_SIZE, dtype=jnp.float32)
    cx = jnp.asarray(_TAXEL_CENTERS)
    d2 = (
        (x[None, None, :, None] - cx[:, None, None, None]) ** 2
        + (x[None, None, None, :] - cx[None, :, None, None]) ** 2
    )  # (4, 4, 100, 100)
    masking = jnp.exp(-C_MASK * d2 / m)
    masking = (masking - masking.min()) / (masking.max() - masking.min())
    return jnp.einsum("hw,ijhw->ij", hr.astype(jnp.float32), masking) * DEGRADE_SCALE


@partial(jax.vmap, in_axes=(0, 0))
def _physics_single(depth, alpha_beta_m):
    alpha, beta, m = alpha_beta_m[0], alpha_beta_m[1], alpha_beta_m[2]
    hr = depth_to_hr(depth, alpha, beta)
    lr_degrade = degradation(hr, m)
    return hr, lr_degrade


def resolve_pallas_physics(config) -> bool:
    """``use_pallas_physics: auto|true|false`` -- auto means TPU-only (the
    tiled kernel wins ~1.2x there; interpret mode elsewhere is test-only).
    Mesh-safe either way: under a device mesh the model shard_maps the
    kernel over the data axis (models/tpsf_net.py, tpsf_forward_physics)."""
    val = config.get("use_pallas_physics", "auto")
    if isinstance(val, str):
        low = val.lower()
        if low == "auto":
            return jax.default_backend() == "tpu"
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        # fail loud on typos ('ture', 'enable', ...) instead of silently
        # dropping to the slower non-Pallas path -- matches resolve_mesh
        raise ValueError(
            f"use_pallas_physics={val!r}: expected auto|true|false "
            "(or on/off/yes/no/1/0)"
        )
    return bool(val)


def resolve_physics_precision(val):
    """Map a config string to the Pallas kernel's in-kernel matmul precision.

    ``highest`` (true-f32, 6 MXU passes) is the parity default; ``default``
    (one bf16 pass) trades 2e-3 relative LR deviation for ~1.3x physics
    throughput at generation-scale batches (see docs/PERF.md).  ``high``
    (3-pass f32) is accepted for completeness.  Accepts a
    ``jax.lax.Precision`` or None (-> HIGHEST) passthrough; fails loud on
    typos like the other config resolvers."""
    if val is None:
        return jax.lax.Precision.HIGHEST
    if isinstance(val, jax.lax.Precision):
        return val
    if isinstance(val, str):
        try:
            return {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[val.lower()]
        except KeyError:
            pass
    raise ValueError(
        f"physics_precision={val!r}: expected highest|high|default "
        "(or a jax.lax.Precision)"
    )


def tpsf_forward_physics(
    depth, alpha_beta_m, return_psf: bool = True, use_pallas: bool = False,
    mesh=None, precision=None,
):
    """Batched physics: depth (B,100,100), alpha_beta_m (B,3) ->
    (HR (B,100,100), LR_degrade (B,4,4), psf (B,99,99) or None).

    ``use_pallas`` routes through the fused batch-tiled kernel
    (ops/pallas/tpsf_kernel.py); numerically equivalent, keeps all
    intermediates in VMEM.  Under a device ``mesh`` the kernel is wrapped in
    ``shard_map`` over the data axis -- ``pallas_call`` is not
    SPMD-partitionable by GSPMD, so without the wrapper the compiler would
    all-gather the sharded batch and run the physics replicated on every
    device; with it, each device runs the kernel on its local batch shard
    (the physics is per-sample, so no cross-shard communication exists).
    The custom_vjp backward (XLA recompute) shards the same way.

    ``precision`` feeds the Pallas kernel's in-kernel matmuls only
    (string or ``jax.lax.Precision``; None -> HIGHEST, the parity default).
    The XLA path is pinned to explicit f32-HIGHEST matmuls -- it is the
    golden-tested reference formulation (and the custom_vjp backward), so it
    stays bit-stable regardless of this knob or the global
    ``matmul_precision`` flag."""
    if use_pallas:
        from .pallas.tpsf_kernel import get_fused

        tpsf_physics_fused = get_fused(resolve_physics_precision(precision))

        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS as _DA

            # init/eval/inference call with small batches (down to 1) that
            # need not divide the data axis; shard_map requires an even
            # split, so those fall through to the plain kernel (their
            # inputs are replicated anyway -- no GSPMD gather to avoid)
            if depth.shape[0] % mesh.shape[_DA] != 0:
                mesh = None
        if mesh is not None:
            import inspect

            try:
                from jax import shard_map  # jax >= 0.8
            except ImportError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            # replication checking can't see through pallas_call/custom_vjp;
            # the kwarg was renamed check_rep -> check_vma in jax 0.8
            sig = inspect.signature(shard_map).parameters
            check_kw = (
                {"check_vma": False}
                if "check_vma" in sig
                else {"check_rep": False}
            )
            hr, lr_degrade = shard_map(
                tpsf_physics_fused,
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                **check_kw,
            )(depth, alpha_beta_m)
        else:
            hr, lr_degrade = tpsf_physics_fused(depth, alpha_beta_m)
    else:
        hr, lr_degrade = _physics_single(depth, alpha_beta_m)
    psf = None
    if return_psf:
        psf = jax.vmap(psf_kernel)(alpha_beta_m[:, 0], alpha_beta_m[:, 1])
    return hr, lr_degrade, psf
