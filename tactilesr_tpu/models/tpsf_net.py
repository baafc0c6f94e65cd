"""tPSFNet: learned point-spread-function physics model (ToH 2024 stage 1).

Capability parity with reference model/tPSFNet.py:13-141: an MLP
(48 -> 256 -> 1024 -> 256 -> 3, ReLU, final Softplus) maps a flattened
(3,4,4) LR reading to (alpha, beta, m); a Gaussian PSF renders a depth map
into a synthetic HR contact map; a taxel degradation model projects the HR
map back to a 4x4 reading for self-supervision.

TPU-native: the reference runs a *python loop over the batch*, each iteration
doing a 196x196 (x) 99x99 convolution -- here the whole batch is one fused
stack of small matmuls (see ops/psf.py for the exact separable formulation).

API mirrors the reference contract:
    forward(LR (B,3,4,4), depth (B,1,100,100)) ->
        (HR (B,1,100,100), LR_degrade (B,1,4,4), psf (B,1,99,99),
         alpha_beta (B,1,3))

``gama`` and ``perception_scale`` are stored but never used in computation,
matching the reference (model/tPSFNet.py:18-19; verified unused there).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.psf import tpsf_forward_physics
from .layers import Dense

__all__ = ["TPSFNet"]


class TPSFNet(nn.Module):
    gama: float = 1.4
    perception_scale: Optional[float] = None
    dtype: Any = jnp.float32
    use_pallas: bool = False  # fused batch-tiled physics kernel
    # in-kernel matmul precision for the Pallas path: "highest" (f32 parity
    # default) or "default" (one-pass bf16, ~1.3x physics throughput at
    # generation-scale batches, 2e-3 rel LR deviation -- see docs/PERF.md)
    physics_precision: Optional[Any] = None
    # device mesh for data-parallel training: the pallas path shard_maps
    # over the data axis so each device runs the kernel on its local shard
    mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x, depth, return_psf: bool = True):
        assert x.shape[0] == depth.shape[0], (
            "Batch size of LR tactile and depth should be the same!"
        )
        b = x.shape[0]
        dt = self.dtype

        # MLP: flatten (3,4,4) row-major, as torch nn.Flatten does
        h = x.reshape(b, -1).astype(dt)
        h = nn.relu(Dense(256, dtype=dt, name="mlp_0")(h))
        h = nn.relu(Dense(1024, dtype=dt, name="mlp_1")(h))
        h = nn.relu(Dense(256, dtype=dt, name="mlp_2")(h))
        alpha_beta = nn.softplus(Dense(3, dtype=dt, name="mlp_3")(h).astype(jnp.float32))

        depth2d = depth.reshape(b, depth.shape[-2], depth.shape[-1])
        hr, lr_degrade, psf = tpsf_forward_physics(
            depth2d,
            alpha_beta,
            return_psf=return_psf,
            use_pallas=self.use_pallas,
            mesh=self.mesh,
            precision=self.physics_precision,
        )

        hr = hr[:, None]  # (B, 1, 100, 100)
        lr_degrade = lr_degrade[:, None]  # (B, 1, 4, 4)
        if psf is not None:
            psf = psf[:, None]  # (B, 1, 99, 99)
        return hr, lr_degrade, psf, alpha_beta[:, None]  # (B, 1, 3)
