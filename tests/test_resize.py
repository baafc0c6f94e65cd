"""Parity of the matmul bilinear resize vs torch F.interpolate(align_corners=False)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tactilesr_tpu.ops.resize import (
    bilinear_resize_matrix,
    resize_bilinear,
    resize_bilinear_nchw,
    upsample_bilinear,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((4, 4), (40, 40)),  # the x10 input upsample
        ((100, 100), (40, 40)),  # the label downsample (antialias mismatch trap)
        ((4, 4), (8, 8)),
        ((7, 5), (13, 11)),
        ((40, 40), (40, 40)),  # identity
        ((100, 100), (37, 91)),
    ],
)
def test_matches_torch_bilinear(rng, in_hw, out_hw):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    got_nchw = np.asarray(resize_bilinear_nchw(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-4)

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    got_nhwc = np.asarray(resize_bilinear(jnp.asarray(x_nhwc), out_hw))
    np.testing.assert_allclose(
        np.transpose(got_nhwc, (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-4
    )


def test_upsample_scale_factor(rng):
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    got = np.asarray(upsample_bilinear(jnp.asarray(x), 10))
    want = F.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        scale_factor=10,
        mode="bilinear",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-4)


def test_resize_matrix_rows_sum_to_one():
    for in_s, out_s in [(4, 40), (100, 40), (5, 3)]:
        m = bilinear_resize_matrix(in_s, out_s)
        np.testing.assert_allclose(m.sum(axis=1), np.ones(out_s), rtol=1e-6)
