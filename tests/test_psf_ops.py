"""Golden tests for the separable tPSF physics against direct formulations
and against an independent numpy transcription of the reference math."""


import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tactilesr_tpu.ops import psf as psf_ops


def _numpy_sdf(n, centre):
    x = np.arange(n, dtype=np.float64)[:, None]
    y = np.arange(n, dtype=np.float64)[None, :]
    return np.sqrt((x - centre[0]) ** 2 + (y - centre[1]) ** 2)


def _numpy_psf(alpha, beta):
    sdf = _numpy_sdf(99, (49, 49))
    sdf = 10 * (sdf - sdf.min()) / (sdf.max() - sdf.min())
    return alpha * np.exp(-(sdf**2) / beta**2)


def test_psf_kernel_matches_sdf_formulation():
    alpha, beta = 1.3, 1.1
    got = np.asarray(psf_ops.psf_kernel(alpha, beta))
    want = _numpy_psf(alpha, beta)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _example_depth(rng):
    # binary-ish contact blob, like the binarized+resized depth maps
    depth = np.zeros((100, 100), np.float32)
    depth[30:70, 40:80] = 1.0
    depth += 0.001 * rng.standard_normal((100, 100)).astype(np.float32)
    return depth


def test_separable_hr_matches_direct_conv(rng):
    depth = _example_depth(rng)
    alpha, beta = 1.2, 1.05
    got = np.asarray(psf_ops.depth_to_hr(jnp.asarray(depth), alpha, beta))
    want = np.asarray(psf_ops.depth_to_hr_direct(jnp.asarray(depth), alpha, beta))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_direct_conv_matches_torch_reference_semantics(rng):
    """torch transcription of the reference pipeline: pad 48, conv2d pad=1,
    second-max substitution on the contact mask."""
    depth = _example_depth(rng)
    alpha, beta = 1.2, 1.05
    psf = torch.from_numpy(_numpy_psf(alpha, beta).astype(np.float32))
    d = torch.from_numpy(depth)[None, None]
    mask = d > (d.max() - 1e-3)
    padded = F.pad(d, (48, 48, 48, 48))
    hr = F.conv2d(padded, psf[None, None], padding=1)
    tmp = hr.clone()
    tmp[mask] = 0
    hr[mask] = tmp.max()
    want = hr[0, 0].numpy()

    got = np.asarray(psf_ops.depth_to_hr(jnp.asarray(depth), alpha, beta))
    assert got.shape == (100, 100)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_separable_degradation_matches_direct(rng):
    depth = _example_depth(rng)
    hr = np.asarray(psf_ops.depth_to_hr(jnp.asarray(depth), 1.2, 1.05))
    for m in [0.5, 1.0, 3.7]:
        got = np.asarray(psf_ops.degradation(jnp.asarray(hr), m))
        want = np.asarray(psf_ops.degradation_direct(jnp.asarray(hr), m))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_degradation_direct_matches_numpy_reference(rng):
    """Independent numpy transcription of the reference degradation loop."""
    hr = rng.random((100, 100)).astype(np.float32)
    m = 1.7
    sdf = np.zeros((4, 4, 100, 100))
    for i in range(4):
        for j in range(4):
            sdf[i, j] = _numpy_sdf(100, (12 + 25 * i, 12 + 25 * j))
    sdf = 10 * (sdf - sdf.min()) / (sdf.max() - sdf.min())
    masking = np.exp(-(sdf**2) / m)
    masking = (masking - masking.min()) / (masking.max() - masking.min())
    want = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            want[i, j] = (hr * masking[i, j]).sum() * 1e-4

    got = np.asarray(psf_ops.degradation(jnp.asarray(hr), m))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_second_max_fixup_gradient_is_stopped(rng):
    depth = _example_depth(rng)

    def f(alpha):
        hr = psf_ops.depth_to_hr(jnp.asarray(depth), alpha, 1.0)
        return jnp.sum(hr)

    g = jax.grad(f)(1.5)
    assert np.isfinite(float(g))
    # contact pixels contribute stop_gradient(non_contact_max): their direct
    # alpha-sensitivity must be excluded
    hr = psf_ops.depth_to_hr(jnp.asarray(depth), 1.0, 1.0)
    mask = np.asarray(psf_ops.contact_mask(jnp.asarray(depth)))
    manual = np.asarray(hr)[~mask].sum()
    np.testing.assert_allclose(float(g), manual, rtol=1e-3)


def test_batched_physics_shapes(rng):
    depth = np.stack([_example_depth(rng) for _ in range(3)])
    abm = np.abs(rng.standard_normal((3, 3))).astype(np.float32) + 0.5
    hr, lr_deg, psf = psf_ops.tpsf_forward_physics(
        jnp.asarray(depth), jnp.asarray(abm)
    )
    assert hr.shape == (3, 100, 100)
    assert lr_deg.shape == (3, 4, 4)
    assert psf.shape == (3, 99, 99)
