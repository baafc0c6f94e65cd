"""Primitive layers with exact PyTorch semantics, in TPU-friendly NHWC layout.

The reference initializes every Conv2d with Kaiming-normal fan_out and every
BatchNorm2d with weight=0.1 AND bias=0.1 (non-standard; reference
model/tactileSR_model.py:92-98).  torch BatchNorm also differs from
flax.linen.BatchNorm in that its *running variance* is updated with the
unbiased batch variance (n/(n-1) correction) while normalization uses the
biased one; we reproduce that here so eval-mode outputs match.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "kaiming_normal_fan_out",
    "non_negative_kaiming_fan_out",
    "torch_conv_bias_init",
    "Conv",
    "BatchNorm",
    "Dense",
]

# Kaiming-normal, mode=fan_out, nonlinearity=relu: std = sqrt(2 / fan_out)
# with fan_out = out_channels * prod(kernel_hw).  For flax kernels of shape
# (kh, kw, in, out) this is exactly variance_scaling(2.0, "fan_out", "normal").
kaiming_normal_fan_out = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)


def non_negative_kaiming_fan_out(key, shape, dtype=jnp.float32):
    """|Kaiming fan_out| / sqrt(fan_in): all-positive, scale-compensated.

    The reference architecture ends every SR network with
    conv(no bias) -> ReLU (model/tactileSR_model.py:84-86).  Its inputs are
    ReLU features (>= 0), so an unlucky Kaiming draw whose positive weight
    mass never dominates leaves the pre-activation negative for every
    sample -- the ReLU gradient is then exactly zero and the whole network
    is frozen at init (observed: seed 3 of the head-to-head study, eval
    loss pinned at mean(HR^2)).  Taking absolute values guarantees a
    positive pre-activation wherever any input feature fires, so the head
    can never be born dead -- but it also changes the growth law: a
    random-sign draw sums fan_in terms to std ~ sqrt(fan_in)*sigma while
    all-positive weights on positive features sum to MEAN ~ fan_in*E|w|.
    At the TactileSR head's fan_in (output_conv1 reads the 128-channel
    fusion: 3*3*128 = 1152) the raw |Kaiming| fold starts the output
    ~34x too large (TactileSRCNN's 64-channel head: sqrt(576) = 24x),
    and a low-lr recipe spends its whole budget
    walking that back (measured, MTSR seed-0 revival: 36.9 dB unscaled vs
    52.6 / 57.2 dB at 0.1x / 0.02x -- RESULTS.md "head-init study").
    Dividing by sqrt(fan_in) restores the sqrt-growth of the sign-random
    law while keeping every weight positive.  Opt-in via
    ``head_init: non_negative`` (the default stays reference-exact).
    """
    fan_in = float(np.prod(shape[:-1])) or 1.0
    return jnp.abs(kaiming_normal_fan_out(key, shape, dtype)) / np.sqrt(fan_in)


def torch_conv_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    """torch Conv2d/Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv(nn.Module):
    """2D convolution (NHWC), torch-default init unless overridden.

    ``padding`` is the symmetric spatial padding (torch ``padding=`` int).
    """

    features: int
    kernel_size: int = 3
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = in_ch * k * k
        conv = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(1, 1),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=lambda key, shape, dtype=jnp.float32: torch_conv_bias_init(
                key, shape, dtype, fan_in=fan_in
            ),
            name="conv",
        )
        return conv(x)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics over NHWC inputs.

    - normalization uses the *biased* batch variance,
    - running_var is updated with the *unbiased* batch variance,
    - torch ``momentum=0.1``: new = 0.9*old + 0.1*batch,
    - scale/bias initialized to 0.1/0.1 per the reference's ``_init_network``.
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.constant(0.1)
    bias_init: Callable = nn.initializers.constant(0.1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        scale = self.param("scale", self.scale_init, (features,), jnp.float32)
        bias = self.param("bias", self.bias_init, (features,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))  # reduce N, H, W
            mean = jnp.mean(xf, axis=axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=axes)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            n = x.size // features
            correction = n / max(n - 1, 1)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * correction

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


class Dense(nn.Module):
    """Linear layer; reference tPSFNet initializes weights N(0, 0.03) and keeps
    the torch-default bias init (reference model/tPSFNet.py:64-65)."""

    features: int
    weight_std: float = 0.03
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        dense = nn.Dense(
            features=self.features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(stddev=self.weight_std),
            bias_init=lambda key, shape, dtype=jnp.float32: torch_conv_bias_init(
                key, shape, dtype, fan_in=fan_in
            ),
            name="linear",
        )
        return dense(x)
