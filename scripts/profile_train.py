#!/usr/bin/env python3
"""Per-fusion device-time table for the STSR train step (docs/PERF.md).

Usage:  python scripts/profile_train.py [--batch 256] [--steps 24]

Builds the real SRTrainer epoch-scan step (fwd + bwd + Adam + train-mode
BN) exactly as ``bench.py --train`` does, traces one epoch with
``jax.profiler``, and prints per-op device durations normalized per step --
the evidence base for the train-step roofline discussion.
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
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--bn-stats-dtype", default=None, help="config override")
    p.add_argument(
        "--seqs-cnt",
        type=int,
        default=1,
        help="frames per sample (7 profiles the MTSR step instead of STSR)",
    )
    p.add_argument(
        "--remat",
        action="store_true",
        help="rematerialized backward (jax.checkpoint on the loss)",
    )
    p.add_argument(
        "--grad-accum",
        type=int,
        default=1,
        help="micro-batch accumulation: --batch is the EFFECTIVE batch, "
        "each dispatch sees batch/grad_accum rows (the B>256 cliff cure)",
    )
    args = p.parse_args()
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="sr_train_trace_")

    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.config.default import tactileSR_config
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.runtime.logger import setup_logger
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model

    setup_logger("tactilesr_tpu", stream=sys.stderr)

    # the tunneled TPU can be wedged by previously killed clients; poll a
    # tiny op until the queue drains before compiling anything (bench.py)
    import bench

    bench.wait_for_quiet(jnp, jax)

    rng = np.random.default_rng(0)
    batch, steps = args.batch, args.steps
    cfg = dict(tactileSR_config)
    cfg.update(
        save_dir=f"/tmp/profile_train_{batch}",
        train_batch_size=batch,
        warmup_t=0,
        seqsCnt=args.seqs_cnt,
    )
    if args.bn_stats_dtype:
        cfg["bn_stats_dtype"] = args.bn_stats_dtype
    n = batch * steps
    chans = cfg["seqsCnt"] * cfg["axisCnt"]
    lr = (rng.random((n, chans, 4, 4)) * 4).astype(np.float32)
    hr = (rng.random((n, 1, 100, 100)) * 50).astype(np.float32)
    model = build_model(cfg)
    v = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, chans, 4, 4)), train=False)
    )
    tr = SRTrainer(
        config=cfg,
        model=model,
        variables={"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        tx=adam_l2(weight_decay=1e-2),
        lr_schedule=LRWarmupSchedule(StepLR(1e-3, 2, 0.8), by_epoch=True, epoch_len=steps),
        train_arrays={"LR": lr, "HR": hr},
        batch_size=batch,
        max_epochs=2,
        work_dir=cfg["save_dir"],
        scan_epochs=True,
        remat=args.remat,
        grad_accum=args.grad_accum,
    )
    tr._epoch_scan = tr._build_epoch_scan()
    tr.train_one_epoch_scan()  # compile + warm epoch
    tr.cur_iter = tr.epoch_len
    with jax.profiler.trace(trace_dir):
        tr.train_one_epoch_scan()  # one epoch = one device dispatch

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        print(f"no trace produced under {trace_dir}", file=sys.stderr)
        return 1
    with gzip.open(paths[-1], "rt") as f:
        tr_json = json.load(f)
    events = tr_json["traceEvents"]
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
    total = sum(d for nm, d in dur.items() if nm.startswith("jit_"))
    print(f"trace: {paths[-1]}")
    sps = batch * steps / (total / 1e6) if total else 0.0
    print(
        f"total device time: {total/1e3:.1f} ms/epoch of {steps} steps "
        f"= {total/steps/1e3:.2f} ms/step at B={batch}"
        + (f" (grad_accum={args.grad_accum}, micro-batch "
           f"{batch//args.grad_accum})" if args.grad_accum > 1 else "")
        + f" -> {sps:,.0f} samples/s device-side\n"
    )
    print(f"{'ms/step':>9}  {'calls':>5}  op")
    for nm, d in dur.most_common(args.top):
        print(f"{d/steps/1e3:9.3f}  {cnt[nm]:5d}  {nm[:100]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
