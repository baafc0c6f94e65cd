"""Residual feature blocks (NHWC).

Behavioral parity targets (capability, not code, from the reference):
- MSRB: multi-scale residual block (ECCV'18) -- parallel 3x3 & 5x5 conv-BN-ReLU,
  concat, parallel 3x3 & 5x5 at 2n channels, concat to 4n, 1x1 "confusion"
  conv back to n, residual add, ReLU (reference model/tactileSR_model.py:157-214).
- ResBlock: conv-relu-conv + residual, ReLU (reference :216-225).
- LeakyResBlock: defined-but-unused leaky variant kept for capability parity
  (reference :227-241).

All convs inside MSRB/ResBlock carry bias (torch Conv2d default), unlike the
bias-free convs of the input/output heads.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, Conv

__all__ = ["MSRB", "ResBlock", "LeakyResBlock"]


class MSRB(nn.Module):
    n_feats: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        n = self.n_feats
        dt = self.dtype

        def cbr(inp, feats, k, name):
            h = Conv(feats, k, padding=k // 2, use_bias=True, dtype=dt, name=name)(inp)
            h = BatchNorm(dtype=dt, name=f"{name}_bn")(h, use_running_average=not train)
            return nn.relu(h)

        out_3_1 = cbr(x, n, 3, "conv_3_1")
        out_5_1 = cbr(x, n, 5, "conv_5_1")
        mid = jnp.concatenate([out_3_1, out_5_1], axis=-1)
        out_3_2 = cbr(mid, 2 * n, 3, "conv_3_2")
        out_5_2 = cbr(mid, 2 * n, 5, "conv_5_2")
        fused = jnp.concatenate([out_3_2, out_5_2], axis=-1)
        out = Conv(n, 1, padding=0, use_bias=True, dtype=dt, name="confusion")(fused)
        return nn.relu(out + x)


class ResBlock(nn.Module):
    n_feats: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        y = Conv(self.n_feats, 3, padding=1, use_bias=True, dtype=dt, name="conv1")(x)
        y = nn.relu(y)
        y = Conv(self.n_feats, 3, padding=1, use_bias=True, dtype=dt, name="conv2")(y)
        return nn.relu(x + y)


class LeakyResBlock(nn.Module):
    """Leaky-ReLU residual block; unused by the training recipes but part of
    the reference's public model surface."""

    n_feats: int = 64
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        y = Conv(self.n_feats, 3, padding=1, use_bias=False, dtype=dt, name="conv1")(x)
        y = BatchNorm(dtype=dt, name="bn1")(y, use_running_average=not train)
        y = nn.leaky_relu(y, negative_slope=1.0)
        y = Conv(self.n_feats, 3, padding=1, use_bias=False, dtype=dt, name="conv2")(y)
        y = BatchNorm(dtype=dt, name="bn2")(y, use_running_average=not train)
        return nn.leaky_relu(y + x, negative_slope=self.negative_slope)
