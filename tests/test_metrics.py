"""PSNR/SSIM parity with the reference formulas (global-stat SSIM, no window)."""

import numpy as np

import jax.numpy as jnp

from tactilesr_tpu.metrics import batched_psnr, batched_ssim, psnr, ssim


def _ref_psnr(a, b, max_value):
    mse = ((a - b) ** 2).sum() / (a.shape[0] * a.shape[1])
    return 10 * np.log10(max_value**2 / mse)


def _ref_ssim(a, b, c1=0.01**2, c2=0.03**2):
    mu1, mu2 = a.mean(), b.mean()
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = (a * a).mean() - mu1_sq
    s2 = (b * b).mean() - mu2_sq
    s12 = (a * b).mean() - mu1_mu2
    return ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )


def test_psnr_matches_reference_formula(rng):
    a = rng.random((40, 40)).astype(np.float32) * 25
    b = rng.random((40, 40)).astype(np.float32) * 25
    got = float(psnr(jnp.asarray(a), jnp.asarray(b), 250.0))
    np.testing.assert_allclose(got, _ref_psnr(a, b, 250.0), rtol=1e-5)


def test_ssim_matches_reference_formula(rng):
    a = rng.random((40, 40)).astype(np.float32)
    b = a + 0.05 * rng.standard_normal((40, 40)).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _ref_ssim(a, b), rtol=1e-4)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def test_ssim_is_global_not_windowed(rng):
    # a checkerboard vs its inverse: windowed SSIM would be strongly negative
    # everywhere; the reference's global SSIM only sees means/variances.
    a = np.indices((40, 40)).sum(axis=0) % 2
    a = a.astype(np.float32)
    b = 1.0 - a
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _ref_ssim(a, b), rtol=1e-4)


def test_batched_variants(rng):
    a = rng.random((5, 40, 40)).astype(np.float32)
    b = rng.random((5, 40, 40)).astype(np.float32)
    ps = np.asarray(batched_psnr(jnp.asarray(a), jnp.asarray(b), 250.0))
    ss = np.asarray(batched_ssim(jnp.asarray(a), jnp.asarray(b)))
    for i in range(5):
        np.testing.assert_allclose(ps[i], _ref_psnr(a[i], b[i], 250.0), rtol=1e-4)
        np.testing.assert_allclose(ss[i], _ref_ssim(a[i], b[i]), rtol=1e-3)


def test_ssim_loss_is_differentiable_objective(rng):
    """1 - SSIM as a minimizable loss (capability parity with the reference's
    public-but-unused SSIM loss module, utility/tools.py:85-114): zero at a
    perfect match, consistent with the golden formula, and with finite
    nonzero gradients usable by an optimizer."""
    import jax

    from tactilesr_tpu.metrics import ssim_loss

    a = rng.random((40, 40)).astype(np.float32)
    b = a + 0.05 * rng.standard_normal((40, 40)).astype(np.float32)
    got = float(ssim_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, 1.0 - _ref_ssim(a, b), rtol=1e-4)
    assert float(ssim_loss(jnp.asarray(a), jnp.asarray(a))) < 1e-3

    g = jax.grad(lambda x: ssim_loss(x, jnp.asarray(b)))(jnp.asarray(a))
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0

    # gradient descent on the loss actually increases SSIM
    x = jnp.asarray(rng.random((40, 40)).astype(np.float32))
    target = jnp.asarray(b)
    loss0 = float(ssim_loss(x, target))
    step = jax.jit(lambda x: x - 0.5 * jax.grad(ssim_loss)(x, target))
    for _ in range(20):
        x = step(x)
    assert float(ssim_loss(x, target)) < loss0
