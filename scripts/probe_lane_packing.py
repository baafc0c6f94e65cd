#!/usr/bin/env python3
"""Measure whether lane-packing MSRB stage-1's parallel convs wins in TRAINING.

The serving rewrite merges the parallel 3x3/5x5 convs into one full-lane 5x5
(models/inference.py).  In training the same merge is exact too -- params
stay separate, the merged kernel is rebuilt per step (pad+concat), and AD
routes gradients through the pad/concat slices -- but the *dgrad* of the
merged conv still outputs 64 channels (half the MXU lanes) and carries the
zero-padded taps' extra FLOPs, so the net effect needs measuring, not
guessing.

A/B on (256,40,40,64), value_and_grad of a scalar loss over
  A: conv3x3(64->64) and conv5x5(64->64) on the same input, outputs summed
  B: one conv5x5(64->128) with kernel = concat(pad(W3), W5), halves summed
Interleaved timing, scalar-fetch sync (tunneled-TPU safe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    import bench

    bench.wait_for_quiet(jnp, jax)

    B, H, W, C = 256, 40, 40, 64
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    w3 = jax.device_put(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05)
    w5 = jax.device_put(rng.standard_normal((5, 5, C, C)).astype(np.float32) * 0.05)
    dn = jax.lax.conv_dimension_numbers(x.shape, (5, 5, C, C), ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, k):
        return jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=dn, preferred_element_type=jnp.bfloat16,
        )

    def loss_a(params, x):
        w3, w5 = params
        y = conv(x, w3, 3) + conv(x, w5, 5)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_b(params, x):
        w3, w5 = params
        w3p = jnp.pad(w3, ((1, 1), (1, 1), (0, 0), (0, 0)))
        wm = jnp.concatenate([w3p, w5], axis=3)  # 5,5,64,128
        y = conv(x, wm, 5)
        return jnp.sum(y[..., :C].astype(jnp.float32) ** 2) + jnp.sum(
            y[..., C:].astype(jnp.float32) ** 2
        )

    ga = jax.jit(jax.value_and_grad(loss_a))
    gb = jax.jit(jax.value_and_grad(loss_b))

    def sync(v):
        return float(jnp.asarray(v).reshape(-1)[0])

    def run(fn, iters=30):
        v, g = fn((w3, w5), x)
        sync(v)
        t0 = time.perf_counter()
        for _ in range(iters):
            v, g = fn((w3, w5), x)
        sync(v)
        return (time.perf_counter() - t0) / iters * 1e3

    for _ in range(2):  # interleave rounds (tunnel drift)
        ta = run(ga)
        tb = run(gb)
        print(f"A separate 3x3+5x5 fwd+bwd: {ta:.3f} ms | B merged 5x5->128: {tb:.3f} ms | B/A {tb/ta:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
