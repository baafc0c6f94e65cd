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


def test_precision_knob_matches_reference_numerics(rng):
    """DEFAULT-precision in-kernel matmuls (one bf16 MXU pass on TPU; plain
    f32 in interpret mode) must stay within the documented 1e-2 relative
    envelope of the f32-HIGHEST reference formulation."""
    depth, abm = _inputs(rng, b=4)
    hr_x, lr_x, _ = tpsf_forward_physics(depth, abm, return_psf=False)
    hr_d, lr_d = tpsf_physics_fused(depth, abm, precision=jax.lax.Precision.DEFAULT)
    scale = float(jnp.abs(lr_x).max())
    assert float(jnp.abs(lr_d - lr_x).max()) / scale < 1e-2
    assert hr_d.shape == hr_x.shape


def test_get_fused_caches_per_precision():
    from tactilesr_tpu.ops.pallas.tpsf_kernel import get_fused

    hi = jax.lax.Precision.HIGHEST
    de = jax.lax.Precision.DEFAULT
    assert get_fused(hi) is get_fused(hi)  # jit caches stay warm across calls
    assert get_fused(de) is get_fused(de)
    assert get_fused(hi) is not get_fused(de)


def test_precision_knob_grad_path(rng):
    """custom_vjp backward is the XLA recompute regardless of the forward
    precision -- gradients must exist and track the XLA gradients closely."""
    depth, abm = _inputs(rng, b=2)

    def loss_fused(abm):
        hr, lr = tpsf_physics_fused(depth, abm, precision=jax.lax.Precision.DEFAULT)
        return jnp.sum(lr**2)

    def loss_xla(abm):
        _hr, lr, _ = tpsf_forward_physics(depth, abm, return_psf=False)
        return jnp.sum(lr**2)

    g_f = jax.grad(loss_fused)(abm)
    g_x = jax.grad(loss_xla)(abm)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), rtol=1e-3, atol=1e-6)


def test_forward_physics_precision_threading(rng):
    """tpsf_forward_physics(use_pallas=True, precision=...) accepts strings
    via resolve_physics_precision and matches the XLA path."""
    depth, abm = _inputs(rng, b=3)
    hr_x, lr_x, _ = tpsf_forward_physics(depth, abm, return_psf=False)
    hr_p, lr_p, _ = tpsf_forward_physics(
        depth, abm, return_psf=False, use_pallas=True, precision="highest"
    )
    np.testing.assert_allclose(np.asarray(hr_p), np.asarray(hr_x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lr_p), np.asarray(lr_x), rtol=1e-4, atol=1e-6)


def test_resolve_physics_precision():
    import pytest

    from tactilesr_tpu.ops.psf import resolve_physics_precision

    P = jax.lax.Precision
    assert resolve_physics_precision(None) is P.HIGHEST
    assert resolve_physics_precision("highest") is P.HIGHEST
    assert resolve_physics_precision("HIGH") is P.HIGH
    assert resolve_physics_precision("default") is P.DEFAULT
    assert resolve_physics_precision(P.DEFAULT) is P.DEFAULT  # passthrough
    with pytest.raises(ValueError, match="physics_precision"):
        resolve_physics_precision("bf16")
    with pytest.raises(ValueError, match="physics_precision"):
        resolve_physics_precision(16)


def test_tpsf_net_accepts_physics_precision(rng):
    """The model field threads down to the kernel; outputs match the default
    model bit-for-bit in interpret mode (same f32 math on CPU)."""
    from tactilesr_tpu.models.tpsf_net import TPSFNet

    lr_in = jnp.asarray(rng.random((2, 3, 4, 4)).astype(np.float32))
    depth = jnp.asarray((rng.random((2, 1, 100, 100)) > 0.7).astype(np.float32))
    base = TPSFNet(use_pallas=True)
    fast = TPSFNet(use_pallas=True, physics_precision=jax.lax.Precision.DEFAULT)
    params = base.init(jax.random.PRNGKey(0), lr_in, depth, return_psf=False)
    out_b = base.apply(params, lr_in, depth, return_psf=False)
    out_f = fast.apply(params, lr_in, depth, return_psf=False)
    np.testing.assert_allclose(
        np.asarray(out_f[1]), np.asarray(out_b[1]), rtol=1e-5, atol=1e-7
    )


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
