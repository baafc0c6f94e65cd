#!/usr/bin/env python3
"""Reproduce docs/PERF.md: trace the fused serving forward and print the
per-fusion device-time table.

Usage:  python scripts/profile_serving.py [--batch 4096] [--iters 3] [--seqs 7]

``--seqs N`` profiles the MTSR fused graph (N per-seq branch folds,
models/inference.py:140-218).  The roofline line uses XLA's own
cost_analysis flop count for the compiled fused module against the bf16
MXU peak (197 TFLOP/s on v5e) -- the same ceiling accounting as the STSR
table in docs/PERF.md.

Captures a ``jax.profiler`` trace of ``tactile_sr_infer`` (the fused
serving graph) on the default device, then parses the chrome trace for
per-op device durations and prints the top fusions with their share of an
iteration.  On the tunneled axon TPU, sync points are scalar fetches (see
bench.py header).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--seqs", type=int, default=1)
    p.add_argument(
        "--branch-mode",
        default="per_seq",
        choices=("auto", "per_seq", "dense", "grouped", "mixed"),
        help="MTSR input-branch formulation to profile "
        "(models/inference.py rewrite 4; the round-5 A/B knob)",
    )
    args = p.parse_args()
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="sr_trace_")

    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.models.inference import (
        fold_inference_params,
        tactile_sr_infer,
    )
    from tactilesr_tpu.models.tactile_sr import TactileSR

    seqs = args.seqs
    model = TactileSR(
        scale_factor=10,
        seqs_cnt=seqs,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=6,
        force_feature_extra_layer_cnt=1,
        dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 3 * seqs, 4, 4)), train=False
    )
    folded = jax.device_put(
        fold_inference_params(
            variables, dtype=jnp.bfloat16, seqs_cnt=seqs,
            branch_mode=args.branch_mode,
        )
    )
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.random((args.batch, 3 * seqs, 4, 4)).astype(np.float32)
    )

    def fwd(xx):
        return tactile_sr_infer(
            folded, xx, seqs_cnt=seqs, branch_mode=args.branch_mode
        )

    out = fwd(x)
    float(jnp.asarray(out[0, 0, 0, 0]))  # compile + sync
    # XLA's own flop count for the compiled fused module -> roofline floor
    try:
        ca = jax.jit(fwd).lower(x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        flops = 0.0
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            out = fwd(x)
        float(jnp.asarray(out[0, 0, 0, 0]))

    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print(f"no trace produced under {trace_dir}", file=sys.stderr)
        return 1
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    it = args.iters
    total = sum(d for n, d in dur.items() if n.startswith("jit_"))
    print(f"trace: {paths[-1]}")
    print(
        f"seqs={args.seqs} batch={args.batch} branch_mode={args.branch_mode}: "
        f"total device time: {total/it/1e3:.1f} ms/iter over {it} iters"
    )
    if total and flops:
        ideal_ms = flops / 197e12 * 1e3
        meas_ms = total / it / 1e3
        fps = args.batch / (meas_ms / 1e3)
        print(
            f"XLA-counted {flops/args.batch/1e9:.2f} GFLOP/frame -> bf16 "
            f"roofline {ideal_ms:.1f} ms/iter; measured {meas_ms:.1f} ms "
            f"= {100*ideal_ms/meas_ms:.0f}% of roofline "
            f"({fps:,.0f} frames/s)"
        )
    print()
    print(f"{'ms/iter':>9}  {'calls':>5}  op")
    for n, d in dur.most_common(args.top):
        print(f"{d/it/1e3:9.2f}  {cnt[n]:5d}  {n[:80]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
