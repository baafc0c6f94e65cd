#!/usr/bin/env python3
"""Headline benchmark: TactileSR (STSR, full size) inference throughput on
one chip -- SR frames/sec at the full 4x4 -> 40x40 upscale, bf16 compute,
through the fused serving graph (models/inference.py: BN folding + parallel
conv merge + concat-input splitting; exact rewrites of the training graph).

Baseline (BASELINE.md north star): > 10,000 frames/sec/chip.
``vs_baseline`` = measured / 10,000.

Prints exactly ONE JSON line on stdout.  Diagnostics go to stderr.
All measured numbers are also recorded in RESULTS.md (single source of
truth for the prose docs).

Measurement notes for tunneled TPUs (axon): ``block_until_ready`` does not
reliably await remote completion, so every sync point here is a scalar
``device_get`` of the latest output; throughput is measured by dispatching a
pipeline of ``iters`` steps and timing to the final fetch, which amortizes
the tunnel's round-trip latency the same way a production serving loop does.
Small-bucket latency medians therefore INCLUDE one tunnel round-trip -- they
are an upper bound on device latency.  A small-op drain poll runs first so a
backlogged relay doesn't pollute the numbers.

Timing policy (round-3 advisor note, kept permanent): each throughput
number is the BEST of 3 interleaved rounds, because the axon tunnel is
shared and a neighbor's burst in one round would understate the machine's
capability; ``vs_baseline`` then divides that best-of-3 by the FIXED
10,000 f/s target from BASELINE.md (never by a co-measured quantity), so
round-to-round comparisons of the headline stay apples-to-apples even
though a single unlucky round could not be retried against a moving
denominator.

The default run also measures the MTSR (seqs=7) serving graph and the
B=256 training step and reports them as numeric ``extras``
(``mtsr_frames_per_sec``, ``train_samples_per_sec``) so BENCH_rN.json
carries the full perf surface machine-readably; ``--seqs 7`` / ``--train``
remain the standalone deep benchmarks.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 10_000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def require_device(timeout_s: float = 600.0):
    """Fail FAST if PJRT backend init never completes (dead tunnel).

    ``jax.devices()`` on the tunneled axon backend can block forever when
    the remote end is down — observed 2026-08-18 — which would hang the
    whole benchmark before the first drain poll.  Init runs in a daemon
    thread with a deadline; on timeout we exit(1) with a clear message
    (there is no honest number to print)."""
    import threading

    box = {}

    def _init():
        try:
            import jax

            box["dev"] = jax.devices()[0]
        except BaseException as e:  # report, don't misdiagnose as a hang
            box["err"] = e

    th = threading.Thread(target=_init, daemon=True)
    th.start()
    th.join(timeout_s)
    if "err" in box:
        log(f"FATAL: jax backend init failed: {box['err']!r}")
        os._exit(1)
    if "dev" not in box:
        log(
            f"FATAL: jax backend init did not complete within {timeout_s:.0f}s"
            " (TPU tunnel down?) -- aborting instead of hanging"
        )
        os._exit(1)
    return box["dev"]


def wait_for_quiet(jnp, jax, patience_s: float = 300.0) -> None:
    x = jnp.ones((8, 128))
    deadline = time.time() + patience_s
    while time.time() < deadline:
        t0 = time.time()
        float(jnp.sum(x + 1.0))
        dt = time.time() - t0
        log(f"drain poll: {dt*1e3:.0f} ms")
        if dt < 0.5:
            return
        time.sleep(5)
    log("warning: device queue never went quiet; measuring anyway")


def device_latency_ms(forward, x, jax, jnp, iters: int = 20):
    """Trace-derived DEVICE time per dispatch (ms): captures a jax.profiler
    trace of ``iters`` forwards and sums the TPU-pid jit_ module events --
    the on-chip cost, free of the tunnel RTT that dominates end-to-end
    medians on axon (same parsing as scripts/profile_serving.py)."""
    import collections
    import glob
    import gzip
    import json as _json
    import tempfile

    trace_dir = tempfile.mkdtemp(prefix="bench_lat_")
    out = forward(x)
    float(jnp.asarray(out[0, 0, 0, 0]))  # warm + sync
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = forward(x)
        float(jnp.asarray(out[0, 0, 0, 0]))
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        tr = _json.load(f)
    events = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    dur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            dur[e["name"]] += e.get("dur", 0)
    total_us = sum(d for n, d in dur.items() if n.startswith("jit_"))
    if total_us == 0:
        return None
    return round(total_us / iters / 1e3, 3)


def _train_sps(batch: int, steps: int = 24) -> float:
    """Samples/sec of the full STSR train step (fwd+bwd+Adam+BN update) at
    ``batch``, epoch-scan mode: one compile+warm epoch, one measured epoch."""
    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.config.default import tactileSR_config
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model

    # stdout must carry exactly one JSON line: claim the console handler
    # for stderr before any trainer sets one up
    from tactilesr_tpu.runtime.logger import setup_logger

    setup_logger("tactilesr_tpu", stream=sys.stderr)

    rng = np.random.default_rng(0)
    cfg = dict(tactileSR_config)
    cfg.update(save_dir=f"/tmp/bench_train_{batch}", train_batch_size=batch, warmup_t=0)
    n = batch * steps
    lr = (rng.random((n, 3, 4, 4)) * 4).astype(np.float32)
    hr = (rng.random((n, 1, 100, 100)) * 50).astype(np.float32)
    model = build_model(cfg)
    v = jax.device_get(model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False))
    tr = SRTrainer(
        config=cfg, model=model,
        variables={"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        tx=adam_l2(weight_decay=1e-2),
        lr_schedule=LRWarmupSchedule(StepLR(1e-3, 2, 0.8), by_epoch=True, epoch_len=steps),
        train_arrays={"LR": lr, "HR": hr}, batch_size=batch, max_epochs=2,
        work_dir=cfg["save_dir"], scan_epochs=True,
    )
    tr._epoch_scan = tr._build_epoch_scan()
    tr.train_one_epoch_scan()  # compile + warm epoch
    tr.cur_iter = tr.epoch_len
    t0 = time.perf_counter()
    tr.train_one_epoch_scan()  # one full epoch = one device dispatch
    dt = (time.perf_counter() - t0) / tr.epoch_len
    sps = batch / dt
    log(f"train B={batch}: {dt*1e3:.1f} ms/step -> {sps:,.0f} samples/s")
    return sps


def bench_train():
    """Secondary benchmark: training throughput (samples/sec) of the full
    STSR train step (fwd+bwd+Adam+BN update), vs the reference's measured
    torch-CPU rate at B=32 on this machine (see
    scripts/measure_ref_baseline.py for the provenance of ``ref_cpu``)."""
    require_device()
    import jax
    import jax.numpy as jnp

    wait_for_quiet(jnp, jax)
    best = (0.0, 0)
    for batch in (32, 256):
        sps = _train_sps(batch)
        if sps > best[0]:
            best = (sps, batch)
    ref_cpu = 1.72  # reference torch-CPU samples/s at B=32 (conservative max
    # of observed runs: 1.54-1.72); reproduce with
    # `python scripts/measure_ref_baseline.py` (requires /root/reference)
    print(
        json.dumps(
            {
                "metric": "sr_train_throughput",
                "value": round(best[0], 1),
                "unit": "samples/sec",
                "vs_baseline": round(best[0] / (50 * ref_cpu), 3),
            }
        )
    )


def bench_tpsf(batch: int = 1024, precision: str = "highest", tile: int = 8):
    """Physics-path benchmark: fused batch-tiled Pallas kernel vs the XLA
    separable formulation at B=1024 (the tPSFNet hot op), interleaved A/B.
    ``vs_baseline`` = pallas / xla (>1 means the kernel wins).

    ``--batch N`` / ``--precision highest|high|default`` / ``--tile T``
    reproduce the docs/PERF.md round-3 sweep points from the bench entry
    (``default`` = one-pass bf16 in-kernel matmuls, +33% at B=8192; the
    full sweep lives in scripts/probe_tpsf_kernel.py)."""
    require_device()
    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.ops.pallas.tpsf_kernel import tpsf_physics_pallas_raw
    from tactilesr_tpu.ops.psf import _physics_single, resolve_physics_precision

    prec = resolve_physics_precision(precision)
    wait_for_quiet(jnp, jax)
    B = batch
    rng = np.random.default_rng(0)
    depth = jax.device_put((rng.random((B, 100, 100)) * 3).astype(np.float32))
    abm = jax.device_put(
        np.stack(
            [
                rng.random(B).astype(np.float32) * 2 + 0.5,
                rng.random(B).astype(np.float32) * 3 + 1.0,
                rng.random(B).astype(np.float32) * 4 + 1.0,
            ],
            axis=1,
        )
    )
    xla = jax.jit(lambda d, a: _physics_single(d, a))
    pal = jax.jit(
        lambda d, a: tpsf_physics_pallas_raw(d, a, tile=tile, precision=prec)
    )

    def sync(o):
        float(jnp.asarray(o[0].reshape(-1)[0]))

    sync(xla(depth, abm))
    sync(pal(depth, abm))
    rates = {"xla": [], "pallas": []}
    for _ in range(3):  # interleaved rounds to ride out tunnel noise
        for name, f in (("xla", xla), ("pallas", pal)):
            t0 = time.perf_counter()
            for _ in range(40):
                out = f(depth, abm)
            sync(out)
            rates[name].append(B * 40 / (time.perf_counter() - t0))
    x_med = float(np.median(rates["xla"]))
    p_med = float(np.median(rates["pallas"]))
    log(f"xla median: {x_med:,.0f} samples/s  pallas median: {p_med:,.0f}")
    print(
        json.dumps(
            {
                "metric": "tpsf_physics_throughput",
                "value": round(p_med, 1),
                "unit": "samples/sec",
                "vs_baseline": round(p_med / x_med, 3),
                "extras": {
                    "xla_separable": round(x_med, 1),
                    "batch": B,
                    "precision": precision,
                    "tile": tile,
                    "note": "vs_baseline is pallas/xla on the same chip",
                },
            }
        )
    )


def _build_forward(seqs: int, jax, jnp):
    """Init + fold the fused serving forward for ``seqs`` frames (auto
    branch mode: per_seq for STSR, grouped for MTSR -- docs/PERF.md)."""
    from tactilesr_tpu.models.inference import (
        fold_inference_params,
        tactile_sr_infer,
    )
    from tactilesr_tpu.models.tactile_sr import TactileSR

    chans = 3 * seqs
    model = TactileSR(
        scale_factor=10,
        seqs_cnt=seqs,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=6,
        force_feature_extra_layer_cnt=1,
        dtype=jnp.bfloat16,
    )
    t0 = time.time()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, chans, 4, 4)), train=False
    )
    folded = jax.device_put(
        fold_inference_params(
            variables, dtype=jnp.bfloat16, seqs_cnt=seqs, branch_mode="auto"
        )
    )
    log(f"init+fold (seqs={seqs}): {time.time()-t0:.1f}s")

    def forward(x):
        return tactile_sr_infer(folded, x, seqs_cnt=seqs, branch_mode="auto")

    return forward, chans


def _pipelined_fps(forward, x, jnp, batch: int, iters: int, rounds: int) -> float:
    """Best-of-``rounds`` pipelined throughput (frames/s) -- see the
    module docstring's timing policy."""
    out = forward(x)
    float(jnp.asarray(out[0, 0, 0, 0]))  # compile + warm
    fps = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward(x)
        float(jnp.asarray(out[0, 0, 0, 0]))  # drain the pipeline
        dt = time.perf_counter() - t0
        fps = max(fps, batch * iters / dt)
        log(
            f"batch {batch}: {batch*iters/dt:,.0f} frames/s"
            f" ({dt/iters*1e3:.2f} ms/iter)"
        )
    return fps


def main(seqs: int = 1):
    dev = require_device()
    import jax
    import jax.numpy as jnp

    log(f"device: {dev}")
    wait_for_quiet(jnp, jax)

    rng = np.random.default_rng(0)
    forward, chans = _build_forward(seqs, jax, jnp)

    best_fps = 0.0
    best_batch = 0
    # MTSR (grouped branch batching) materializes (B,40,40,448) bf16
    # intermediates -- ~11.7 GB each at B=8192, a compile-time OOM on one
    # v5e; B=4096 is its measured sweet spot (docs/PERF.md round-5)
    for batch in (2048, 4096, 8192) if seqs == 1 else (2048, 4096):
        x = jax.device_put(rng.random((batch, chans, 4, 4)).astype(np.float32))
        t0 = time.time()
        # best of 3 rounds: the axon tunnel is shared, and a neighbor's
        # burst during one round would understate the machine's capability
        fps = _pipelined_fps(forward, x, jnp, batch, iters=12, rounds=3)
        log(f"batch {batch}: done in {time.time()-t0:.1f}s incl. compile")
        if fps > best_fps:
            best_fps, best_batch = fps, batch

    # small-bucket serving latency (median of 20 round-trips; includes one
    # tunnel RTT per call on axon -- an upper bound on device latency)
    latency_ms = {}
    for batch in (1, 8, 64):
        x = jax.device_put(rng.random((batch, chans, 4, 4)).astype(np.float32))
        out = forward(x)
        float(jnp.asarray(out[0, 0, 0, 0]))
        ts = []
        for _ in range(20):
            t0 = time.perf_counter()
            out = forward(x)
            float(jnp.asarray(out[0, 0, 0, 0]))
            ts.append(time.perf_counter() - t0)
        latency_ms[f"B{batch}"] = round(float(np.median(ts)) * 1e3, 2)
        log(f"latency B={batch}: median {latency_ms[f'B{batch}']} ms")

    # device-side latency from profiler traces (no tunnel RTT in the number)
    device_ms = {}
    for batch in (1, 8, 64):
        x = jax.device_put(rng.random((batch, chans, 4, 4)).astype(np.float32))
        d = device_latency_ms(forward, x, jax, jnp)
        if d is not None:
            device_ms[f"B{batch}"] = d
            log(f"device latency B={batch}: {d} ms/dispatch (trace)")

    log(f"best: batch {best_batch} -> {best_fps:,.0f} frames/s")

    # the full perf surface, machine-readable (default run only): the MTSR
    # serving headline and the B=256 training sweet spot as numbers, so a
    # round-over-round diff of BENCH_rN.json sees them without parsing prose
    perf_extras = {}
    if seqs == 1:
        fwd7, chans7 = _build_forward(7, jax, jnp)
        x7 = jax.device_put(rng.random((4096, chans7, 4, 4)).astype(np.float32))
        perf_extras["mtsr_frames_per_sec"] = round(
            _pipelined_fps(fwd7, x7, jnp, 4096, iters=8, rounds=2), 1
        )
        perf_extras["train_samples_per_sec"] = round(_train_sps(256), 1)
    print(
        json.dumps(
            {
                "metric": (
                    "sr_inference_throughput"
                    if seqs == 1
                    else f"mtsr_seqs{seqs}_inference_throughput"
                ),
                "value": round(best_fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(best_fps / BASELINE_FPS, 3),
                "extras": {
                    "note": (
                        "fused serving graph (BN fold + parallel-conv merge + "
                        "concat splits, models/inference.py); ~91% of the "
                        "15.7 GFLOP/frame fused-graph bf16 roofline (84% "
                        "counting original-graph FLOPs); full numbers in "
                        "RESULTS.md"
                    )
                    if seqs == 1
                    else (
                        f"fused {seqs}-branch MTSR serving graph, "
                        "branch_mode=auto (grouped: round-5 measured A/B, "
                        "docs/PERF.md 'branch-batching'); 84% of its "
                        "16.49 GFLOP/frame bf16 roofline (trunk ~97%; the "
                        "rest is the HBM-bound branch stage); vs_baseline "
                        "shares the STSR 10k target for scale"
                    ),
                    "timing": "best-of-3 rounds vs the FIXED 10k baseline "
                    "(module docstring timing policy)",
                    **perf_extras,
                    "latency": {
                        "end_to_end_ms_median": latency_ms,
                        "device_ms_per_dispatch_trace": device_ms,
                        "note": (
                            "end-to-end includes one tunnel RTT per call "
                            "on axon; device_ms is the trace-derived "
                            "on-chip time per dispatch"
                        ),
                    },
                    "train_throughput": (
                        "see `python bench.py --train` and RESULTS.md; "
                        "torch-CPU reference baseline provenance: "
                        "scripts/measure_ref_baseline.py"
                    ),
                },
            }
        )
    )


def _argval(flag, default, cast=str):
    if flag not in sys.argv:
        return default
    i = sys.argv.index(flag) + 1
    if i >= len(sys.argv):
        raise SystemExit(f"usage: {flag} requires a value")
    return cast(sys.argv[i])


if __name__ == "__main__":
    if "--train" in sys.argv:
        bench_train()
    elif "--tpsf" in sys.argv:
        bench_tpsf(
            batch=_argval("--batch", 1024, int),
            precision=_argval("--precision", "highest"),
            tile=_argval("--tile", 8, int),
        )
    else:
        main(seqs=_argval("--seqs", 1, int))
