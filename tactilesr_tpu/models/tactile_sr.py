"""Tactile super-resolution networks (TPU-native, NHWC internals).

Capability parity with the reference models:
- ``TactileSR``: ToH-2024 SR network.  STSR when ``seqs_cnt == 1``, MTSR when
  ``> 1`` (reference model/tactileSR_model.py:18-98).  Per-sequence-frame
  pattern branch (bilinear x-scale upsample -> 2x conv3x3-BN-ReLU), branch
  concat -> fuse conv -> MSRB stack; parallel force branch (upsample ->
  conv3x3 -> ReLU -> ResBlock stack); concat(force, pattern) -> 2-conv head ->
  bilinear resize to (4*scale)^2.
- ``TactileSRCNN``: IROS-2022 baseline (reference :101-153).

API keeps the reference NCHW contract -- input (B, seqs*axis, 4, 4), output
(B, 1, 4*scale, 4*scale) -- while computing in NHWC, which is the layout XLA
tiles best on TPU.  The bilinear resizes use torch-exact matmul resampling
(see ops/resize.py).  ``dtype`` selects the compute precision (bf16 on TPU by
default in the training recipes); params stay f32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear, upsample_bilinear
from .blocks import MSRB, ResBlock
from .layers import (
    BatchNorm,
    Conv,
    kaiming_normal_fan_out,
    non_negative_kaiming_fan_out,
)

HEAD_INITS = {
    "reference": kaiming_normal_fan_out,
    "non_negative": non_negative_kaiming_fan_out,
}


def _head_kernel_init(head_init: str):
    try:
        return HEAD_INITS[head_init]
    except KeyError:
        raise ValueError(
            f"head_init must be one of {sorted(HEAD_INITS)}, got {head_init!r}"
        ) from None

__all__ = ["TactileSR", "TactileSRCNN", "TAXEL_CNT"]

TAXEL_CNT = 4  # the Xela sensor is a 4x4 taxel grid


class TactileSR(nn.Module):
    scale_factor: int = 10
    seqs_cnt: int = 1
    axis_cnt: int = 3
    pattern_feature_extra_layer_cnt: int = 6
    force_feature_extra_layer_cnt: int = 1
    dtype: Any = jnp.float32
    # "reference" (Kaiming fan_out, reference-exact) or "non_negative"
    # (|Kaiming|: immunizes the final conv->ReLU head against the
    # born-dead init draw; same param tree, checkpoint-compatible)
    head_init: str = "reference"

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[1] == self.seqs_cnt * self.axis_cnt, (
            "input channel should equal seqs_cnt * axis_cnt "
            f"(got {x.shape[1]} != {self.seqs_cnt}*{self.axis_cnt})"
        )
        dt = self.dtype
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)  # NCHW -> NHWC

        def conv_bn_relu(inp, name):
            h = Conv(64, 3, padding=1, use_bias=False, dtype=dt, name=name)(inp)
            h = BatchNorm(dtype=dt, name=f"{name}_bn")(h, use_running_average=not train)
            return nn.relu(h)

        # --- pattern branches: one per sequence frame, each with its own params
        branch_feats = []
        for s in range(self.seqs_cnt):
            xs = x[..., s * self.axis_cnt : (s + 1) * self.axis_cnt]
            xs = upsample_bilinear(xs, self.scale_factor)
            h = conv_bn_relu(xs, f"inputLayer_pattern_{s}_conv0")
            h = conv_bn_relu(h, f"inputLayer_pattern_{s}_conv1")
            branch_feats.append(h)
        pattern = (
            branch_feats[0]
            if len(branch_feats) == 1
            else jnp.concatenate(branch_feats, axis=-1)
        )

        # --- fuse branches, then the MSRB trunk
        pattern = conv_bn_relu(pattern, "inputContact_layer")
        for i in range(self.pattern_feature_extra_layer_cnt):
            pattern = MSRB(dtype=dt, name=f"patternFeatureExtra_layer_{i}")(
                pattern, train=train
            )

        # --- force branch on the first frame only
        force = upsample_bilinear(x[..., : self.axis_cnt], self.scale_factor)
        force = Conv(64, 3, padding=1, use_bias=False, dtype=dt, name="input_layer_force")(
            force
        )
        force = nn.relu(force)
        for i in range(self.force_feature_extra_layer_cnt):
            force = ResBlock(dtype=dt, name=f"forceFeatureExtra_layer_{i}")(
                force, train=train
            )

        # --- fusion head: concat(force, pattern) ordering is contract
        out = jnp.concatenate([force, pattern], axis=-1)
        out = Conv(128, 3, padding=1, use_bias=False, dtype=dt, name="output_conv0")(out)
        out = nn.relu(out)
        out = Conv(
            1,
            3,
            padding=1,
            use_bias=False,
            dtype=dt,
            kernel_init=_head_kernel_init(self.head_init),
            name="output_conv1",
        )(out)
        out = nn.relu(out)

        hw = TAXEL_CNT * self.scale_factor
        out = resize_bilinear(out, (hw, hw))
        return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.float32)  # NHWC -> NCHW


class TactileSRCNN(nn.Module):
    """IROS-2022 baseline: upsample x10 -> 3x(conv-BN-ReLU) -> 6x MSRB -> conv -> ReLU."""

    scale_factor: int = 10
    msrb_cnt: int = 6
    dtype: Any = jnp.float32
    head_init: str = "reference"  # see TactileSR.head_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)
        h = upsample_bilinear(x, self.scale_factor)
        for i in range(3):
            h = Conv(64, 3, padding=1, use_bias=False, dtype=dt, name=f"input_zyx_conv{i}")(h)
            h = BatchNorm(dtype=dt, name=f"input_zyx_bn{i}")(h, use_running_average=not train)
            h = nn.relu(h)
        for i in range(self.msrb_cnt):
            h = MSRB(dtype=dt, name=f"msrb_layer_{i}")(h, train=train)
        h = Conv(
            1,
            3,
            padding=1,
            use_bias=False,
            dtype=dt,
            kernel_init=_head_kernel_init(self.head_init),
            name="output_conv",
        )(h)
        h = nn.relu(h)
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
