#!/usr/bin/env python3
"""Load study for the HTTP serving endpoint (tactilesr_tpu/server.py):
how much does server-side micro-batching buy under concurrent clients?

Protocol: start the server in-process on an ephemeral port with the
full-size STSR model (random-init checkpoint synthesized on the fly unless
--checkpoint is given), then drive it over real HTTP:

  phase A — 1 client, sequential single-frame requests  (no coalescing
            possible: every frame pays a full dispatch + tunnel RTT)
  phase B — N concurrent clients, single-frame requests (the micro-
            batcher coalesces them into shared dispatches)
  phase C — N concurrent clients, 8-frame requests      (mixed sizes)

Each phase reports frames/s and the batcher's avg-frames-per-dispatch
delta, which is the coalescing factor.  Numbers land in docs/PERF.md.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_ckpt(path: str) -> str:
    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.models.tactile_sr import TactileSR
    from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file

    model = TactileSR(
        scale_factor=10, seqs_cnt=1, axis_cnt=3,
        pattern_feature_extra_layer_cnt=6, force_feature_extra_layer_cnt=1,
    )
    v = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    save_checkpoint_file(path, {
        "num_devices": 1,
        "model": {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        "epoch": 0,
    })
    return path


def post_npz(url: str, lr: np.ndarray) -> np.ndarray:
    buf = io.BytesIO()
    np.savez(buf, LR=lr)
    req = urllib.request.Request(
        url + "/predict", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npz"},
    )
    with urllib.request.urlopen(req) as r:
        with np.load(io.BytesIO(r.read())) as z:
            return z["SR"]


def stats(url: str) -> dict:
    with urllib.request.urlopen(url + "/stats") as r:
        return json.loads(r.read())


def run_phase(url, n_clients, reqs_per_client, frames_per_req, rng):
    lr = (rng.random((frames_per_req, 3, 4, 4)) * 4).astype(np.float32)
    before = stats(url)
    errs = []

    def client():
        try:
            for _ in range(reqs_per_client):
                post_npz(url, lr)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errs:
        raise errs[0]
    after = stats(url)
    frames = n_clients * reqs_per_client * frames_per_req
    dispatches = after["batches"] - before["batches"]
    # (max_coalesced_requests is a cumulative max in /stats -- no per-phase
    # delta exists, so it is reported once at the end, not per phase)
    return {
        "clients": n_clients,
        "reqs_per_client": reqs_per_client,
        "frames_per_req": frames_per_req,
        "frames_per_sec": round(frames / dt, 1),
        "dispatches": dispatches,
        "frames_per_dispatch": round(frames / max(dispatches, 1), 2),
    }


def run_overload(url, n_clients, reqs_per_client, frames_per_req, rng):
    """Phase D: drive arrivals past the service rate against a BOUNDED
    queue and report how the endpoint degrades: accepted throughput,
    accepted-request latency percentiles, clean 429/504 counts, and the
    max queue depth ever observed (must stay at/below the bound)."""
    import urllib.error

    lr = (rng.random((frames_per_req, 3, 4, 4)) * 4).astype(np.float32)
    codes, latencies, errs = [], [], []
    lock = threading.Lock()
    stop = threading.Event()
    max_depth = [0]

    def monitor():
        while not stop.is_set():
            try:
                d = stats(url)["queue_depth_frames"]
                max_depth[0] = max(max_depth[0], d)
            except Exception:
                pass
            time.sleep(0.005)

    def client():
        for _ in range(reqs_per_client):
            t0 = time.perf_counter()
            try:
                post_npz(url, lr)
                with lock:
                    codes.append(200)
                    latencies.append(time.perf_counter() - t0)
            except urllib.error.HTTPError as e:
                e.read()
                with lock:
                    codes.append(e.code)
            except Exception as e:  # pragma: no cover
                with lock:
                    errs.append(repr(e))

    mon = threading.Thread(target=monitor, daemon=True)
    mon.start()
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    stop.set()
    mon.join(2)
    lat = sorted(latencies)
    pick = lambda q: round(lat[int(q * (len(lat) - 1))] * 1e3, 1) if lat else None
    counts = {c: codes.count(c) for c in sorted(set(codes))}
    return {
        "clients": n_clients,
        "frames_per_req": frames_per_req,
        "wall_s": round(dt, 2),
        "status_counts": counts,
        "connection_errors": len(errs),
        "accepted_frames_per_sec": round(
            counts.get(200, 0) * frames_per_req / dt, 1
        ),
        "accepted_latency_ms": {"p50": pick(0.5), "p95": pick(0.95), "p99": pick(0.99)},
        "max_queue_depth_frames_observed": max_depth[0],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--linger-ms", type=float, default=5.0)
    ap.add_argument("--max-queue-frames", type=int, default=2048)
    ap.add_argument("--deadline-ms", type=float, default=2000.0)
    ap.add_argument("--skip-overload", action="store_true")
    ap.add_argument(
        "--sweep-linger", action="store_true",
        help="sensitivity study: re-run the concurrent phases at linger "
        "windows 0.5/2/5/10 ms (hot server, batcher linger mutated "
        "between phases) -- the docs/PERF.md round-5 table",
    )
    args = ap.parse_args()

    from tactilesr_tpu.server import create_server

    ckpt = args.checkpoint or make_ckpt("/tmp/bench_server_model.ckpt")
    srv = create_server(
        ckpt, linger_ms=args.linger_ms,
        max_queue_frames=args.max_queue_frames or None,
        deadline_ms=args.deadline_ms or None,
        scale_factor=10, pattern_layers=6, force_layers=1,
        compute_dtype="bfloat16",
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = "http://%s:%d" % srv.server_address
    print(f"server: {url} (linger {args.linger_ms} ms)", file=sys.stderr)
    rng = np.random.default_rng(0)
    post_npz(url, (rng.random((1, 3, 4, 4)) * 4).astype(np.float32))  # warm

    results = {
        "sequential_1client_1frame": run_phase(url, 1, 40, 1, rng),
        f"concurrent_{args.clients}clients_1frame": run_phase(
            url, args.clients, 10, 1, rng
        ),
        f"concurrent_{max(args.clients // 4, 1)}clients_8frames": run_phase(
            url, max(args.clients // 4, 1), 10, 8, rng
        ),
    }
    seq = results["sequential_1client_1frame"]["frames_per_sec"]
    conc = results[f"concurrent_{args.clients}clients_1frame"]["frames_per_sec"]
    results["coalescing_speedup_1frame"] = round(conc / seq, 2)
    results["max_coalesced_requests_overall"] = stats(url)[
        "max_coalesced_requests"
    ]
    if args.sweep_linger:
        sweep = {}
        for ms in (0.5, 2.0, 5.0, 10.0):
            srv.batcher.linger_s = ms / 1e3
            sweep[f"{ms}ms"] = {
                f"{args.clients}x1frame": run_phase(url, args.clients, 10, 1, rng),
                f"{max(args.clients // 4, 1)}x8frames": run_phase(
                    url, max(args.clients // 4, 1), 10, 8, rng
                ),
            }
        srv.batcher.linger_s = args.linger_ms / 1e3
        results["linger_sweep"] = sweep
    if not args.skip_overload:
        # arrival >> service: 64 clients x 64-frame requests back-to-back
        results["overload_bounded_queue"] = run_overload(
            url, args.clients, 8, 64, rng
        )
        results["overload_bounds"] = {
            "max_queue_frames": args.max_queue_frames,
            "deadline_ms": args.deadline_ms,
        }
    print(json.dumps(results, indent=1))
    srv.shutdown()
    srv.batcher.shutdown()


if __name__ == "__main__":
    main()
