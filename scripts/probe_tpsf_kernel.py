#!/usr/bin/env python3
"""tPSF physics kernel probe: tile-size x matmul-precision sweep on the chip.

Measures the batch-tiled Pallas kernel (ops/pallas/tpsf_kernel.py) against
the XLA separable path at every (tile, precision) point, interleaved A/B
per round so tunnel drift can't favor one side, plus numerics vs the
f32-HIGHEST XLA path (the golden-tested reference formulation).

Roofline context printed alongside: per sample the physics is dominated by
two (100,100)x(100,100) MXU matmuls (4.0 MFLOP) + one 10k-lane exp band;
at 100-of-128 lane fill the MXU ceilings are ~(100/128)^2 * 197/6 TF/s for
true-f32 HIGHEST and ~(100/128)^2 * 197 TF/s for one-pass bf16.

Usage: python scripts/probe_tpsf_kernel.py --batch 1024 --iters 40 --rounds 3
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--tiles", type=int, nargs="+", default=[4, 8, 16, 32])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    bench.require_device()
    if jax.default_backend() == "tpu":
        bench.wait_for_quiet(jnp, jax)

    from tactilesr_tpu.ops.pallas.tpsf_kernel import tpsf_physics_pallas_raw
    from tactilesr_tpu.ops.psf import _physics_single

    rng = np.random.default_rng(0)
    # realistic inputs: binary-ish contact depths, alpha/beta/m in the
    # trained networks' observed ranges
    depth = (rng.random((args.batch, 100, 100)) > 0.7).astype(np.float32)
    abm = np.stack(
        [
            rng.uniform(5.0, 40.0, args.batch),
            rng.uniform(5.0, 30.0, args.batch),
            rng.uniform(5.0, 60.0, args.batch),
        ],
        axis=1,
    ).astype(np.float32)
    depth_d = jnp.asarray(depth)
    abm_d = jnp.asarray(abm)

    HI = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT

    # the XLA separable path pins its matmuls to explicit f32-HIGHEST
    # (ops/psf.py -- it is the golden-tested parity formulation), so there
    # is exactly one XLA variant
    xla_fn = jax.jit(_physics_single)  # already batch-vmapped

    def make_pallas(tile, precision):
        @jax.jit
        def f(d, a):
            return tpsf_physics_pallas_raw(d, a, tile=tile, precision=precision)

        return f

    variants = {"xla/hi": xla_fn}
    for t in args.tiles:
        variants[f"pl/t{t}/hi"] = make_pallas(t, HI)
        variants[f"pl/t{t}/def"] = make_pallas(t, DEF)

    # numerics vs the golden-tested XLA HIGHEST path
    ref_hr, ref_lr = jax.device_get(variants["xla/hi"](depth_d, abm_d))
    lr_scale = float(np.abs(ref_lr).max())
    print(f"# numerics vs xla/hi (LR amplitude {lr_scale:.3f}):")
    for name, fn in variants.items():
        hr, lr = jax.device_get(fn(depth_d, abm_d))
        print(
            f"  {name:12} max|dHR| {np.abs(hr - ref_hr).max():.3e}"
            f"  max|dLR| {np.abs(lr - ref_lr).max():.3e}"
            f"  rel {np.abs(lr - ref_lr).max() / lr_scale:.2e}"
        )

    def run_once(fn):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(depth_d, abm_d)
        float(jnp.sum(out[1]))  # sync through the tunnel
        return args.batch * args.iters / (time.perf_counter() - t0)

    for fn in variants.values():  # compile + warm outside the timed region
        float(jnp.sum(fn(depth_d, abm_d)[1]))

    results = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():  # interleaved within each round
            results[name].append(run_once(fn))
    print(f"\n# samples/s over {args.rounds} interleaved rounds "
          f"(B={args.batch}, {args.iters} iters):")
    for name, vals in results.items():
        best = max(vals)
        print(
            f"  {name:12} best {best:>10,.0f}  rounds "
            + " ".join(f"{v:,.0f}" for v in vals)
        )


if __name__ == "__main__":
    main()
