"""Pallas fused tPSF kernel vs the XLA separable formulation (interpret mode
on the CPU mesh; the same kernel body compiles on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from tactilesr_tpu.ops.pallas.tpsf_kernel import (
    tpsf_physics_fused,
    tpsf_physics_pallas_raw,
)
from tactilesr_tpu.ops.psf import tpsf_forward_physics


def _inputs(rng, b=3):
    depth = np.zeros((b, 100, 100), np.float32)
    for k in range(b):
        depth[k, 20 + 5 * k : 60, 30 : 70 + 3 * k] = 1.0
    abm = (0.5 + np.abs(rng.standard_normal((b, 3)))).astype(np.float32)
    return jnp.asarray(depth), jnp.asarray(abm)


def test_fused_matches_xla(rng):
    depth, abm = _inputs(rng)
    hr_p, lr_p = tpsf_physics_pallas_raw(depth, abm, interpret=True)
    hr_x, lr_x, _ = tpsf_forward_physics(depth, abm, return_psf=False)
    np.testing.assert_allclose(np.asarray(hr_p), np.asarray(hr_x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lr_p), np.asarray(lr_x), rtol=1e-4, atol=1e-6)


def test_fused_custom_vjp_matches_xla_grads(rng):
    depth, abm = _inputs(rng, b=2)

    def loss_fused(abm):
        hr, lr = tpsf_physics_fused(depth, abm)
        return jnp.sum(lr**2) + 1e-6 * jnp.sum(hr)

    def loss_xla(abm):
        hr, lr, _ = tpsf_forward_physics(depth, abm, return_psf=False)
        return jnp.sum(lr**2) + 1e-6 * jnp.sum(hr)

    g_f = jax.grad(loss_fused)(abm)
    g_x = jax.grad(loss_xla)(abm)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), rtol=1e-3, atol=1e-6)


def test_fused_jits(rng):
    depth, abm = _inputs(rng, b=2)
    f = jax.jit(tpsf_physics_fused)
    hr, lr = f(depth, abm)
    assert hr.shape == (2, 100, 100) and lr.shape == (2, 4, 4)
    assert np.all(np.isfinite(np.asarray(hr)))


def test_tile_padding_roundtrip(rng):
    """Batch not divisible by the tile: padded samples must not leak."""
    depth, abm = _inputs(rng, b=5)
    hr_t, lr_t = tpsf_physics_pallas_raw(depth, abm, interpret=True, tile=2)
    hr_1, lr_1 = tpsf_physics_pallas_raw(depth, abm, interpret=True, tile=1)
    assert hr_t.shape == (5, 100, 100) and lr_t.shape == (5, 4, 4)
    np.testing.assert_allclose(np.asarray(hr_t), np.asarray(hr_1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lr_t), np.asarray(lr_1), rtol=1e-5, atol=1e-7)


def test_use_pallas_physics_auto_resolution():
    from tactilesr_tpu.tasks.tpsf_task import resolve_pallas_physics

    on_tpu = jax.default_backend() == "tpu"
    assert resolve_pallas_physics({"use_pallas_physics": "auto"}) == on_tpu
    assert resolve_pallas_physics({}) == on_tpu  # default is auto
    assert resolve_pallas_physics({"use_pallas_physics": True}) is True
    assert resolve_pallas_physics({"use_pallas_physics": False}) is False
    assert resolve_pallas_physics({"use_pallas_physics": "false"}) is False
    assert resolve_pallas_physics({"use_pallas_physics": "on"}) is True
    assert resolve_pallas_physics({"use_pallas_physics": "off"}) is False
    # typos must fail loud, not silently disable the faster kernel path
    import pytest

    with pytest.raises(ValueError, match="use_pallas_physics"):
        resolve_pallas_physics({"use_pallas_physics": "ture"})
    with pytest.raises(ValueError, match="use_pallas_physics"):
        resolve_pallas_physics({"use_pallas_physics": "enable"})
