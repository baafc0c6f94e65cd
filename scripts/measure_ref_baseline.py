#!/usr/bin/env python3
"""Provenance for the ``ref_cpu`` torch-CPU baseline used by bench.py --train.

Runs the ACTUAL reference implementation (imported read-only from
/root/reference, never vendored) through one measured window of STSR
training steps -- full forward + MSE backward + Adam, batch 32, float32,
CPU -- and prints samples/sec.  This is the number BASELINE.md's
"50x torch-CPU" target multiplies.

Usage:  python scripts/measure_ref_baseline.py [--batch 32] [--steps 8]

Measured 2026-08 on this machine: 1.54-1.72 samples/s at B=32 across runs
(bench.py's bench_train hardcodes the conservative max, 1.72).
"""

import argparse
import sys
import time

REFERENCE = "/root/reference"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=8, help="measured steps")
    p.add_argument("--warmup", type=int, default=2)
    args = p.parse_args()

    sys.path.insert(0, REFERENCE)
    try:
        import torch
        from model.tactileSR_model import TactileSR  # reference model
    except ImportError as e:  # pragma: no cover
        print(f"reference checkout or torch unavailable: {e}", file=sys.stderr)
        return 1
    finally:
        if REFERENCE in sys.path:
            sys.path.remove(REFERENCE)

    torch.manual_seed(0)
    model = TactileSR(
        scale_factor=10,
        seqsCnt=1,
        axisCnt=3,
        patternFeatureExtraLayerCnt=6,
        forceFeatureExtraLayerCnt=1,
    )
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-2)
    loss_fn = torch.nn.MSELoss()

    b = args.batch
    x = torch.rand(b, 3, 4, 4) * 4
    y = torch.rand(b, 1, 40, 40) * 5

    def step():
        opt.zero_grad()
        out = model(x)
        loss = loss_fn(out, y)
        loss.backward()
        opt.step()

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps
    sps = b / dt
    print(
        f"reference torch-CPU STSR train: B={b}  {dt*1e3:.0f} ms/step  "
        f"{sps:.2f} samples/s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
