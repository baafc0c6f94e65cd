#!/usr/bin/env python3
"""Head-to-head: the torch reference vs tactilesr_tpu on IDENTICAL data.

The strongest parity evidence available while the reference's real sensor
blobs are missing (/root/reference/.MISSING_LARGE_BLOBS): generate one
SRdataset (legacy object-``.npy`` readable by the reference's loader plus
the ``.npz`` twin of the SAME samples), train the actual reference recipe
(/root/reference/train/tactileSR_train.py:199-239, CPU torch) and this
framework's ``sr_task.main`` on the same files with the same
hyperparameters, and report both eval trajectories + the end-of-training
PSNR/SSIM gap.

Usage:
    python scripts/head_to_head.py --workdir /tmp/h2h --epochs 15

The reference runs in a subprocess (``--ref-worker``) so its import-time
side effects (GPU probing, env mutation) stay contained; the GPU selector is
stubbed to CPU before ``config.default`` imports it.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVAL_RE = r"==> \[test\] loss: ([-\d.naninf]+), SSIM: ([-\d.naninf]+), PSNR: ([-\d.naninf]+)"


def traj_from_records(records) -> list:
    """Per-epoch {loss, ssim, psnr} from captured eval log lines -- the ONE
    EVAL_RE parse both sides use (a drifted copy would skew one stage)."""
    import re

    return [
        {
            "loss": float(m.group(1)),
            "ssim": float(m.group(2)),
            "psnr": float(m.group(3)),
        }
        for line in records
        for m in [re.search(EVAL_RE, line)]
        if m
    ]


def _common_overrides(args) -> dict:
    """The hyperparameters BOTH frameworks train with (identical recipes)."""
    return dict(
        train_batch_size=args.batch,
        test_batch_size=8,
        lr=args.lr,
        weight_decay=1e-2,
        lr_scheduler_step_size=2,
        lr_scheduler_gamma=0.8,
        scale_factor=args.scale_factor,
        seqsCnt=1,
        axisCnt=3,
        patternFeatureExtraLayerCnt=args.pattern_layers,
        forceFeatureExtraLayerCnt=1,
        HR_scale_num=10,
        sensorMaxVaule_factor=250,
        warmup_t=args.warmup_t,
        warmup_mode="auto",
        warmup_init_lr=1e-5,
        warmup_factor=1e-4,
        epochs=args.epochs,
        checkpoint_period=(
            args.checkpoint_period
            if args.checkpoint_period is not None
            else max(args.epochs - 1, 1)
        ),
        inference_test=False,
        random_seed=args.seed,
    )


def _parse_ref_sr_log(workdir: str, iters_per_epoch: int) -> list:
    """Reference SR eval trajectory from ``ref_work/log_rank0.txt``.

    The file accumulates across auto-resumed runs, and a killed run's
    resumed segment RE-TRAINS from its last checkpoint — so the same
    epoch's eval can appear several times.  Each segment opens with
    ``Start training from iteration N`` and logs exactly one ``[test]``
    line per completed epoch (verified: a 12-epoch reference run logs 12),
    so a segment's k-th eval is epoch ``N // iters_per_epoch + k``; later
    segments override earlier ones.  ``iters_per_epoch`` is re-anchored to
    the value the worker recorded in ``ref_meta.json`` (the caller's value
    is derived from the CURRENT --batch, which may differ from the batch
    the log was trained with)."""
    import re

    iters_per_epoch = _recorded_iters_per_epoch(workdir, iters_per_epoch)
    log_path = os.path.join(workdir, "ref_work", "log_rank0.txt")
    if not os.path.exists(log_path):
        return []
    with open(log_path) as f:
        text = f.read()
    parts = re.split(r"Start training from iteration (\d+)", text)
    # parts = [preamble, N1, body1, N2, body2, ...]; keep from the last
    # FRESH start (iteration 0) onward — earlier aborted full runs out
    starts = [int(parts[i]) for i in range(1, len(parts), 2)]
    bodies = [parts[i + 1] for i in range(1, len(parts), 2)]
    fresh = max((i for i, s in enumerate(starts) if s == 0), default=None)
    if fresh is None:
        return []
    by_epoch: dict = {}
    for start_iter, body in zip(starts[fresh:], bodies[fresh:]):
        epoch0 = start_iter // iters_per_epoch
        for k, m in enumerate(re.finditer(EVAL_RE, body)):
            by_epoch[epoch0 + k] = {
                "loss": float(m.group(1)),
                "ssim": float(m.group(2)),
                "psnr": float(m.group(3)),
            }
    return [by_epoch[e] for e in sorted(by_epoch)]


def _sr_iters_per_epoch(args, train_path: str = None) -> int:
    """Train iterations per epoch of the shared SRdataset (the reference's
    DataLoader keeps the final partial batch: ceil(len/batch))."""
    import math

    sys.path.insert(0, REPO)
    from tactilesr_tpu.data.datasets import TactileSRDataset

    n = len(
        TactileSRDataset(
            train_path
            or os.path.join(args.workdir, "data/SRdataset/SRdataset_train.npy")
        )
    )
    return math.ceil(n / args.batch)


def _write_ref_meta(
    preds_dir: str, args, train_path: str, resume: bool = False
) -> None:
    """Record the reference run's epoch geometry next to its dumps so later
    ``--skip-ref`` / ``--report`` passes don't re-derive it from DIFFERENT
    CLI args: iters/epoch depends on ``--batch``, and a mismatch silently
    corrupts the reconstructed trajectory's epoch anchoring.

    On a ``--ref-auto-resume`` continuation the ORIGINAL run's meta stays
    authoritative: overwriting it with geometry derived from the resume's
    (possibly different) CLI args would mis-anchor the old log segments —
    the exact corruption this file exists to prevent."""
    meta_path = os.path.join(preds_dir, "ref_meta.json")
    if resume and os.path.exists(meta_path):
        print(f"(resume: keeping the original {meta_path})")
        return
    meta = {
        "batch": args.batch,
        "epochs": args.epochs,
        "iters_per_epoch": _sr_iters_per_epoch(args, train_path),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)


def _recorded_iters_per_epoch(workdir: str, fallback: int) -> int:
    """Prefer the ``ref_meta.json`` the reference worker recorded over a
    value re-derived from the current CLI args (see _write_ref_meta)."""
    meta_path = os.path.join(workdir, "ref_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            recorded = json.load(f).get("iters_per_epoch")
        if recorded:
            if recorded != fallback:
                print(
                    f"(ref_meta.json records {recorded} iters/epoch; overriding"
                    f" the current-args value {fallback} for epoch anchoring)"
                )
            return int(recorded)
    return fallback


def _role_of(npz, tag: str) -> str:
    """Role of a prediction dump: the ``role`` field the dump helpers write,
    else (legacy dumps) a filename heuristic — ``ref`` / ``ref_*`` tags are
    the reference, everything else (any --preds-tag) is ours."""
    if "role" in npz.files:
        return str(npz["role"])
    return "ref" if tag == "ref" or tag.startswith("ref_") else "ours"


def _load_ref_sr_model(ref_module, cfg):
    """Rebuild the reference architecture from its config and load its
    latest checkpoint (shared by the SR and MTSR workers so the eval
    protocol stays identical across stages)."""
    import torch

    ckpt = torch.load(
        os.path.join(cfg["save_dir"], "checkpoints", "latest.pth"),
        map_location="cpu",
        weights_only=False,
    )
    model = ref_module.TactileSR(
        scale_factor=cfg["scale_factor"],
        seqsCnt=cfg["seqsCnt"],
        axisCnt=cfg["axisCnt"],
        patternFeatureExtraLayerCnt=cfg["patternFeatureExtraLayerCnt"],
        forceFeatureExtraLayerCnt=cfg["forceFeatureExtraLayerCnt"],
    )
    model.load_state_dict(ckpt["model"])
    model.eval()
    return model


def _dump_ref_sr_preds(model, ds, cfg, out_path: str) -> None:
    """THE eval-protocol contract, reference side — ONE implementation for
    both the SR and MTSR stages (a drifted copy would silently skew one
    stage's dump and invalidate its head-to-head): slice LR to the recipe's
    seqsCnt*axisCnt channels, scale + bilinearly resize HR to (4s,4s), run
    the torch model, dump SR/HR (+role) for the shared evaluator."""
    import numpy as np
    import torch
    import torch.nn.functional as F
    from torch.utils.data import DataLoader

    loader = DataLoader(ds, batch_size=cfg["test_batch_size"], shuffle=False)
    preds, labels = [], []
    hw = 4 * cfg["scale_factor"]
    with torch.no_grad():
        for LR, HR in loader:
            LR = LR.type(torch.float32)[:, : cfg["seqsCnt"] * cfg["axisCnt"]]
            HR = HR.type(torch.float32) / cfg["HR_scale_num"]
            HR = F.interpolate(
                HR, size=(hw, hw), mode="bilinear", align_corners=False
            )
            preds.append(model(LR).numpy())
            labels.append(HR.numpy())
    np.savez(
        out_path,
        SR=np.concatenate(preds),
        HR=np.concatenate(labels),
        role=np.array("ref"),
    )


def _capture_log(logger_name: str) -> list:
    """Attach a handler to ``logger_name`` and return the live list its
    messages append to."""
    records: list = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logging.getLogger(logger_name).addHandler(_Capture())
    return records


def _majority_label_first(paths: list, read_labels) -> list:
    """Order dump paths so the first one carries the MAJORITY label set.

    Used when no canonical ref dump pins the label baseline: the baseline
    used to be whichever file sorted first, so a stale dump from another
    data draw could become the reference everything else is 'SKIPPED'
    against.  Group dumps by allclose-equal labels and lead with the
    largest group (ties: the most recently written dump)."""
    import numpy as np

    if len(paths) <= 1:
        return paths
    labels = [read_labels(p) for p in paths]
    groups: list = []  # lists of indices into paths
    for i, lab in enumerate(labels):
        for g in groups:
            ref = labels[g[0]]
            if lab.shape == ref.shape and np.allclose(
                lab, ref, rtol=1e-4, atol=1e-5
            ):
                g.append(i)
                break
        else:
            groups.append([i])
    if len(groups) == 1:
        return paths
    groups.sort(
        key=lambda g: (len(g), max(os.path.getmtime(paths[i]) for i in g)),
        reverse=True,
    )
    lead = groups[0][0]
    return [paths[lead]] + [p for i, p in enumerate(paths) if i != lead]


def _ours_jax_preamble():
    """Shared ours-side setup: pin the platform (TACTILESR_PLATFORM beats
    any sitecustomize default), make the repo importable, and drain a
    tunneled TPU that a previously killed client may have wedged (see
    bench.py) before dispatching anything.  Returns the jax module."""
    import jax

    jax.config.update(
        "jax_platforms", os.environ.get("TACTILESR_PLATFORM", "cpu")
    )
    sys.path.insert(0, REPO)
    if jax.default_backend() not in ("cpu",):
        import jax.numpy as jnp

        import bench

        bench.wait_for_quiet(jnp, jax)
    return jax


def _capture_our_log() -> list:
    """Capture OUR framework's logger.  Needed because MetricStorage's
    HistoryBuffer keeps only the last window_size=20 values (the
    reference's contract, cpu/history_buffer.py) — reading the storage
    after a >20-epoch run yields a tail-truncated trajectory that would
    misalign against the reference's full per-epoch table."""
    return _capture_log("tactilesr_tpu")


def _ours_sr_traj(trainer, records: list = None) -> list:
    """Per-epoch eval trajectory: parsed from the captured log (full
    length) when available, else from the trainer's metric storage (last
    20 epochs only — see _capture_our_log)."""
    if records is not None:
        traj = traj_from_records(records)
        if traj:
            return traj
    storage = trainer.metric_storage
    vals = {
        k: storage[k].state_dict()["values"]
        for k in ("test_loss", "test_SSIM", "test_PSNR")
    }
    return [
        {"loss": l, "ssim": s, "psnr": p}
        for l, s, p in zip(vals["test_loss"], vals["test_SSIM"], vals["test_PSNR"])
    ]


def _dump_ours_sr_preds(trainer, ds, cfg, out_path: str) -> None:
    """THE eval-protocol contract, ours side — mirror of
    _dump_ref_sr_preds, shared by the SR and MTSR stages."""
    import numpy as np

    import jax.numpy as jnp

    from tactilesr_tpu.tasks.sr_task import prepare_sr_labels

    lr_test, hr_test = ds.stacked()
    out = trainer.model_apply(
        jnp.asarray(lr_test[:, : cfg["seqsCnt"] * cfg["axisCnt"]]), train=False
    )
    np.savez(
        out_path,
        SR=np.asarray(out),
        HR=prepare_sr_labels(hr_test, cfg),
        role=np.array("ours"),
    )


def _capture_cpu_log() -> list:
    """Capture the reference's ``cpu`` logger (see _capture_log)."""
    return _capture_log("cpu")


def _force_ref_auto_resume(ref_module) -> None:
    """The reference mains hardcode ``trainer.train(auto_resume=False)``;
    long single-core runs need to survive client restarts, so patch the
    (shared cpu.trainer) Trainer class to resume from
    ``<save_dir>/checkpoints/latest.pth``.  Also force torch.load's
    pre-2.6 ``weights_only=False`` behavior: the reference's checkpoints
    embed cpu.trainer.MetricStorage, which torch>=2.6 refuses to unpickle
    by default (these are files we just wrote ourselves)."""
    orig_train = ref_module.Trainer.train
    ref_module.Trainer.train = (
        lambda self, *a, **k: orig_train(self, auto_resume=True)
    )
    import torch

    _orig_load = torch.load
    torch.load = lambda *a, **k: _orig_load(*a, **{**k, "weights_only": False})


def _print_sr_result(ref_traj, ours_traj, preds_dir, ours_tag, scale_factor):
    """The per-epoch trajectory table + shared-evaluator verdict shared by
    the SR and MTSR stages."""
    import math

    n = min(len(ref_traj), len(ours_traj))
    if len(ref_traj) != len(ours_traj):
        print(
            f"(trajectory lengths differ: ref {len(ref_traj)} vs ours"
            f" {len(ours_traj)} epochs -- table shows the first {n};"
            " rows pair by POSITION, so a truncated side misaligns)"
        )
    hw = 4 * scale_factor
    offset_db = 10 * math.log10(hw)  # divisor C*H vs the true H*W
    print(
        "\n(ref's logged PSNR carries its eval quirk: calculationPSNR gets"
        f" (C,H,W) tensors -> divisor C*H={hw}, a constant -{offset_db:.2f} dB"
        " vs the true per-map formula; 'shared eval' below scores both"
        " frameworks with one implementation)"
    )
    print("epoch |   ref PSNR |  ours PSNR |  ref SSIM | ours SSIM |  ref loss | ours loss")
    for e in range(n):
        print(
            f"{e:5d} | {ref_traj[e]['psnr']:10.3f} | {ours_traj[e]['psnr']:10.3f}"
            f" | {ref_traj[e]['ssim']:9.4f} | {ours_traj[e]['ssim']:9.4f}"
            f" | {ref_traj[e]['loss']:9.4f} | {ours_traj[e]['loss']:9.4f}"
        )
    final = shared_eval(preds_dir, ours_tag=ours_tag)
    gap_psnr = final["ours"]["psnr"] - final["ref"]["psnr"]
    gap_ssim = final["ours"]["ssim"] - final["ref"]["ssim"]
    print(
        "H2H_RESULT "
        + json.dumps(
            {
                "epochs": n,
                "ref_logged_final": ref_traj[n - 1] if n else None,
                "ours_logged_final": ours_traj[n - 1] if n else None,
                "shared_eval": final,
                "psnr_gap_db": round(gap_psnr, 4),
                "ssim_gap": round(gap_ssim, 5),
            }
        )
    )


# --------------------------------------------------------------- reference
def run_reference_worker(args) -> None:
    """Subprocess body: drive the reference's own main() on our data."""
    ref = args.reference
    sys.path.insert(0, ref)
    sys.path.insert(0, os.path.join(ref, "train"))

    # stub the nvidia-smi GPU probe (config/default.py:101-104) to CPU
    # BEFORE config.default executes its `from utility.tools import ...`
    import utility.tools as ut  # noqa: E402

    ut.select_gpu_with_least_used_memory = lambda: (0, "cpu", "cpu", 0)

    import tactileSR_train as ref_train  # noqa: E402  (imports config.default)

    cfg = dict(ref_train.tactileSR_config)
    cfg.update(_common_overrides(args))
    cfg.update(
        train_dataset_dir=os.path.join(args.workdir, "data/SRdataset/SRdataset_train.npy"),
        test_dataset_dir=os.path.join(args.workdir, "data/SRdataset/SRdataset_test.npy"),
        save_dir=os.path.join(args.workdir, "ref_work"),
    )

    # capture the reference's per-epoch eval log lines
    records = _capture_cpu_log()

    if args.ref_auto_resume:
        _force_ref_auto_resume(ref_train)

    _write_ref_meta(
        args.workdir, args, cfg["train_dataset_dir"], resume=args.ref_auto_resume
    )
    ref_train.main(cfg)

    traj = traj_from_records(records)

    # shared-evaluator evidence: dump the trained reference model's test-set
    # predictions (and its torch-made labels) so the parent can score BOTH
    # frameworks with ONE metric implementation.  NB the reference's own
    # logged PSNR is NOT comparable across frameworks: eval_func passes
    # (C,H,W) tensors into calculationPSNR (train/tactileSR_train.py:90,
    # utility/tools.py:59-60), whose divisor is shape[0]*shape[1] = C*H=40
    # instead of H*W=1600 -- a constant -10*log10(40) = -16.02 dB offset on
    # every logged value.
    model = _load_ref_sr_model(ref_train, cfg)
    _dump_ref_sr_preds(
        model,
        ref_train.TactileSRDataset(cfg["test_dataset_dir"]),
        cfg,
        os.path.join(args.workdir, "ref_preds.npz"),
    )
    print("H2H_REF " + json.dumps(traj), flush=True)


# -------------------------------------------------------------------- ours
def run_ours(args) -> list:
    _ours_jax_preamble()
    from tactilesr_tpu.config.default import tactileSR_config
    from tactilesr_tpu.tasks.sr_task import main as sr_main

    cfg = dict(tactileSR_config)
    cfg.update(_common_overrides(args))
    cfg.update(
        # the same literal legacy files the reference trains on (our loader
        # reads both formats)
        train_dataset_dir=os.path.join(args.workdir, "data/SRdataset/SRdataset_train.npy"),
        test_dataset_dir=os.path.join(args.workdir, "data/SRdataset/SRdataset_test.npy"),
        save_dir=os.path.join(args.workdir, f"{args.preds_tag}_work"),
        compute_dtype="float32",  # reference trains f32 (no AMP wired)
        data_parallel="off",  # single device, like the reference
        # the torch-CPU reference computes TRUE f32 convolutions; on TPU
        # the default lowers f32 contractions to one bf16 MXU pass, which
        # visibly changes convergence on this small-data recipe -- pin the
        # parity-grade precision
        matmul_precision=args.matmul_precision,
        head_init=args.head_init,
        dead_head_action=args.dead_head_action,
    )
    records = _capture_our_log()
    trainer = sr_main(cfg)
    traj = _ours_sr_traj(trainer, records)

    # dump our trained model's predictions on the same test set for the
    # shared evaluator
    from tactilesr_tpu.data.datasets import TactileSRDataset

    _dump_ours_sr_preds(
        trainer,
        TactileSRDataset(cfg["test_dataset_dir"]),
        cfg,
        os.path.join(args.workdir, f"{args.preds_tag}_preds.npz"),
    )
    return traj


def _spawn_ref_worker(args, what: str) -> "subprocess.CompletedProcess":
    """Re-invoke this script as ``--ref-worker`` with the caller's args
    forwarded (single source of truth for both stages' forwarding rules)."""
    ref_cmd = [sys.executable, os.path.abspath(__file__), "--ref-worker"]
    for k, v in vars(args).items():
        # NB identity checks: `0 in (None, False)` is True (0 == False),
        # which would silently drop --seed 0 / --warmup-t 0 and train the
        # two sides with different recipes
        if k in (
            "ref_worker", "skip_datagen", "skip_ref", "ours_only",
            "ref_auto_resume",
        ) or (v is None or v is False):
            continue
        ref_cmd += [f"--{k.replace('_', '-')}", str(v)]
    if args.ref_auto_resume:
        ref_cmd.append("--ref-auto-resume")
    out = subprocess.run(ref_cmd, capture_output=True, text=True, cwd=args.workdir)
    sys.stderr.write(out.stderr[-2000:])
    assert out.returncode == 0, f"{what} run failed:\n{out.stdout[-3000:]}"
    return out


def run_tpsf_stage(args) -> None:
    """Orchestrate the stage-1 head-to-head: reference tPSFNet in a
    subprocess (unless --skip-ref / --ours-only), then our side, then the
    shared-evaluator table."""
    import re

    ref_traj = []
    if not args.ours_only:
        if args.skip_ref:
            # the reference's per-epoch eval goes through bare print() (not
            # its logger), so a reused run has no re-parseable trajectory --
            # the shared table below is the comparison in that case
            assert os.path.exists(os.path.join(args.workdir, "ref_tpsfpreds.npz"))
        else:
            out = _spawn_ref_worker(args, "reference tPSF")
            ref_traj = [
                {"mse": float(m.group(1)), "ssim": float(m.group(2))}
                for m in re.finditer(TPSF_EVAL_RE, out.stdout)
            ]

    ours_traj = run_ours_tpsf(args)

    if ref_traj:
        # NB logged trajectories are indicative, not sample-identical: each
        # side scores the first sample of each of ITS test batches, and the
        # two loaders order the blob files differently (the shared table
        # below scores all taps in one canonical order).  Under
        # --ref-auto-resume only the resumed run's epochs appear here.
        n = min(len(ref_traj), len(ours_traj))
        print("epoch |    ref MSE |   ours MSE |  ref SSIM | ours SSIM")
        for e in range(n):
            print(
                f"{e:5d} | {ref_traj[e]['mse']:10.6f} | {ours_traj[e]['mse']:10.6f}"
                f" | {ref_traj[e]['ssim']:9.4f} | {ours_traj[e]['ssim']:9.4f}"
            )
    elif args.ours_only:
        print("H2H_TPSF_OURS " + json.dumps({"seed": args.seed, "traj": ours_traj}))
    else:
        print("(no reference trajectory available; see shared table below)")
    tpsf_report(args.workdir)


def shared_eval(workdir: str, ours_tag: str = "tpu") -> dict:
    """Score both frameworks' predictions with ONE metric implementation
    (ours, golden-tested against the reference formulas on (H,W) maps).
    Keys of the result are the ROLES ("ref"/"ours"); ``ours_tag`` names the
    ours-side prediction file (``{ours_tag}_preds.npz``, --preds-tag)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from tactilesr_tpu.metrics import batched_psnr, batched_ssim

    out = {}
    label_ref = None
    for role, tag in (("ref", "ref"), ("ours", ours_tag)):
        with np.load(os.path.join(workdir, f"{tag}_preds.npz")) as z:
            sr, hr = z["SR"], z["HR"]
        if label_ref is None:
            label_ref = hr
        elif hr.shape != label_ref.shape or not np.allclose(
            hr, label_ref, rtol=1e-4, atol=1e-5
        ):  # both frameworks must have scored against the same labels
            raise ValueError(
                f"{tag}_preds.npz holds labels different from ref_preds.npz's"
                " -- the two sides did not eval the same test set (stale dump"
                " from an earlier data draw? delete it or rerun that side)"
            )
        ps = np.asarray(batched_psnr(jnp.asarray(sr[:, 0]), jnp.asarray(hr[:, 0]), 250.0))
        ss = np.asarray(batched_ssim(jnp.asarray(sr[:, 0]), jnp.asarray(hr[:, 0])))
        mse = float(np.mean((sr - hr) ** 2))
        out[role] = {
            "psnr": round(float(ps.mean()), 4),
            "ssim": round(float(ss.mean()), 5),
            "mse": round(mse, 5),
        }
    return out


# ------------------------------------------------------- tPSF (stage 1) leg
TPSF_EVAL_RE = r"mse_loss_ave:([-\d.e+naninf]+), ssim_ave:([-\d.e+naninf]+)"


def _tpsf_overrides(args) -> dict:
    """The hyperparameters BOTH frameworks' stage-1 recipes train with
    (reference defaults: config/default.py:17-40, minus size cuts)."""
    return dict(
        train_batch_size=args.batch,
        test_batch_size=8,
        lr=args.lr,
        weight_decay=1e-5,
        lr_scheduler_step_size=1,
        lr_scheduler_gamma=0.8,
        epochs=args.epochs,
        sample_cnt=args.sample_cnt,
        is_aug_data=False,
        inference_test=False,
        checkpoint_period=(
            args.checkpoint_period
            if args.checkpoint_period is not None
            else max(args.epochs - 1, 1)
        ),
        random_seed=args.seed,
    )


def run_reference_worker_tpsf(args) -> None:
    """Subprocess body: drive the reference's tPSFNet main() on our raw
    blobs (train/tPSFNet_train.py:193-229), then dump its trained model's
    degraded 4x4 predictions over the test taps for the shared evaluator."""
    ref = args.reference
    sys.path.insert(0, ref)
    sys.path.insert(0, os.path.join(ref, "train"))

    import utility.tools as ut  # noqa: E402

    ut.select_gpu_with_least_used_memory = lambda: (0, "cpu", "cpu", 0)

    import tPSFNet_train as ref_tpsf  # noqa: E402

    # NB must mutate the module-global dict IN PLACE: build_dataloader reads
    # `tPSFNet_config['train_batch_size']` from the global, not from the
    # config it was passed (train/tPSFNet_train.py:36-37)
    cfg = ref_tpsf.tPSFNet_config
    cfg.update(_tpsf_overrides(args))
    cfg.update(
        dataset_dir=os.path.join(args.workdir, "data/rotateDataset"),
        save_dir=os.path.join(args.workdir, "ref_tpsf_work"),
    )

    if args.ref_auto_resume:
        _force_ref_auto_resume(ref_tpsf)

    ref_tpsf.main(cfg)
    # (the per-epoch "mse_loss_ave:..., ssim_ave:..." lines go to stdout via
    # eval_func's print(); the parent parses them from this subprocess)

    import numpy as np
    import torch

    from utility.raw_data_process import loadRawDataset  # noqa: E402

    ckpt = torch.load(
        os.path.join(cfg["save_dir"], "checkpoints", "latest.pth"),
        map_location="cpu",
        weights_only=False,
    )
    model = ref_tpsf.tPSFNet(
        gama=cfg["gama"],
        perception_scale=cfg["perception_scale"],
        device=torch.device("cpu"),
    )
    model.load_state_dict(ckpt["model"])
    model.eval()

    # canonical test set: SORTED blob files so the sample order matches our
    # loader's (the reference's os.walk order is directory-entry order;
    # ours sorts -- data/datasets.py)
    lrs, depths = [], []
    for root, _dirs, files in os.walk(cfg["dataset_dir"]):
        for f in sorted(files):
            if os.path.splitext(f)[1] == ".npy":
                for s in loadRawDataset(
                    os.path.join(root, f),
                    sample_cnt=cfg["sample_cnt"],
                    is_sample_idx=list(range(0, 5)),
                    is_aug_data=cfg["is_aug_data"],
                ):
                    lrs.append(np.ascontiguousarray(s["LR"]))
                    depths.append(np.ascontiguousarray(s["depth"]))
    lr = torch.tensor(np.stack(lrs), dtype=torch.float32) / cfg["scale_num"]
    depth = torch.tensor(np.stack(depths), dtype=torch.float32).unsqueeze(1)
    degs = []
    with torch.no_grad():
        for i in range(0, lr.shape[0], 8):
            _hr, deg, _psf, _ab = model(lr[i : i + 8], depth[i : i + 8])
            degs.append(deg.numpy())
    np.savez(
        os.path.join(args.workdir, "ref_tpsfpreds.npz"),
        DEG=np.concatenate(degs),
        LRZ=lr[:, 2:3].numpy(),
        role=np.array("ref"),
    )
    print("H2H_TPSF_REF_DONE", flush=True)


def run_ours_tpsf(args) -> list:
    _ours_jax_preamble()
    from tactilesr_tpu.config.default import tPSFNet_config
    from tactilesr_tpu.tasks.tpsf_task import main as tpsf_main

    cfg = dict(tPSFNet_config)
    cfg.update(_tpsf_overrides(args))
    cfg.update(
        dataset_dir=os.path.join(args.workdir, "data/rotateDataset"),
        save_dir=os.path.join(args.workdir, f"{args.preds_tag}_tpsf_work"),
        compute_dtype="float32",
        data_parallel="off",
        matmul_precision=args.matmul_precision,
    )
    records = _capture_our_log()
    trainer = tpsf_main(cfg)
    import re

    traj = [
        {"mse": float(m.group(1)), "ssim": float(m.group(2))}
        for line in records
        for m in [re.search(TPSF_EVAL_RE, line)]
        if m
    ]
    if not traj:  # fallback: last-20-epochs view (see _capture_our_log)
        storage = trainer.metric_storage
        traj = [
            {"mse": m, "ssim": s}
            for m, s in zip(
                storage["Eval Metric"].state_dict()["values"],
                storage["eval_ssim"].state_dict()["values"],
            )
        ]

    import jax.numpy as jnp
    import numpy as np

    from tactilesr_tpu.data.datasets import TPSFNetDataset
    from tactilesr_tpu.parallel.mesh import host_local_copy

    lr_t, depth_t = TPSFNetDataset(
        cfg["dataset_dir"],
        sample_cnt=cfg["sample_cnt"],
        is_sample_idx=list(range(0, 5)),
        is_aug_data=cfg["is_aug_data"],
    ).stacked()
    lr_in = jnp.asarray(lr_t, jnp.float32) / cfg["scale_num"]
    params = host_local_copy(trainer.state.params)
    _hr, deg, _psf, _ab = trainer.model.apply(
        {"params": params}, lr_in, jnp.asarray(depth_t)[:, None], return_psf=False
    )
    np.savez(
        os.path.join(args.workdir, f"{args.preds_tag}_tpsfpreds.npz"),
        DEG=np.asarray(deg, np.float32),
        LRZ=np.asarray(lr_in[:, 2:3], np.float32),
        role=np.array("ours"),
    )
    return traj


def tpsf_report(workdir: str) -> None:
    """Score every ``*_tpsfpreds.npz`` (degraded 4x4 prediction vs the real
    z reading) with ONE metric implementation: per-sample MSE + global-stat
    SSIM, averaged over ALL test taps (the reference's own eval only scores
    the first sample of each batch; this scores everything)."""
    import glob

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from tactilesr_tpu.metrics import batched_ssim

    rows = []
    label_ref, base_tag = None, None
    paths = sorted(glob.glob(os.path.join(workdir, "*_tpsfpreds.npz")))
    canonical = os.path.join(workdir, "ref_tpsfpreds.npz")
    if canonical in paths:  # deterministic label baseline (see report_all)
        paths.remove(canonical)
        paths.insert(0, canonical)
    else:  # no ref dump: lead with the majority label set, not sort order
        def _read_lrz(p):
            with np.load(p) as z:
                return z["LRZ"]

        paths = _majority_label_first(paths, _read_lrz)
    for path in paths:
        tag = os.path.basename(path)[: -len("_tpsfpreds.npz")]
        with np.load(path) as z:
            deg, lrz = z["DEG"], z["LRZ"]
            role = _role_of(z, tag)
        if label_ref is None:
            label_ref, base_tag = lrz, tag
        elif lrz.shape != label_ref.shape or not np.allclose(
            lrz, label_ref, rtol=1e-4, atol=1e-5
        ):  # both frameworks must predict the same real readings
            print(
                f"{tag:24} SKIPPED: real z readings differ from {base_tag}'s"
                " (stale prediction set from another data draw?)"
            )
            continue
        mse = float(np.mean((deg - lrz) ** 2))
        ss = float(
            np.asarray(
                batched_ssim(jnp.asarray(deg[:, 0]), jnp.asarray(lrz[:, 0]))
            ).mean()
        )
        rows.append((tag, role, mse, ss))
        print(f"{tag:24} MSE {mse:10.6f}  SSIM {ss:7.4f}")
    ours = [r for r in rows if r[1] == "ours"]
    ref = [r for r in rows if r[1] == "ref"]
    if ours and ref:
        best_ref = min(ref, key=lambda r: r[2])  # the strongest ref draw
        best_ours = min(ours, key=lambda r: r[2])
        print(
            "H2H_TPSF "
            + json.dumps(
                {
                    "ref_mse": round(best_ref[2], 6),
                    "ref_ssim": round(best_ref[3], 5),
                    "ours_mse": round(best_ours[2], 6),
                    "ours_ssim": round(best_ours[3], 5),
                    "mse_ratio_ours_over_ref": (
                        round(best_ours[2] / best_ref[2], 4) if best_ref[2] else None
                    ),
                }
            )
        )


# ------------------------------------------------------ MTSR (stage 4) leg
def _mtsr_overrides(args) -> dict:
    """The hyperparameters BOTH frameworks' stage-4 recipes train with
    (reference defaults: config/default.py:80-97 -- lr 1e-4, no warmup:
    the reference's seqs main() passes no warmup args to its Trainer)."""
    return dict(
        train_batch_size=args.batch,
        test_batch_size=8,
        lr=args.lr,
        weight_decay=1e-2,
        lr_scheduler_step_size=2,
        lr_scheduler_gamma=0.8,
        scale_factor=args.scale_factor,
        seqsCnt=args.seqs_cnt,
        axisCnt=3,
        patternFeatureExtraLayerCnt=args.pattern_layers,
        forceFeatureExtraLayerCnt=1,
        HR_scale_num=10,
        sensorMaxVaule_factor=250,
        epochs=args.epochs,
        checkpoint_period=(
            args.checkpoint_period
            if args.checkpoint_period is not None
            else max(args.epochs - 1, 1)
        ),
        inference_test=False,
        random_seed=args.seed,
    )


def _mtsr_dataset_paths(args) -> dict:
    base = os.path.join(args.workdir, "data/SeqsDataset")
    return {
        "train_dataset_dir": os.path.join(base, "SRdataset_train_32.npy"),
        "test_dataset_dir": os.path.join(base, "SRdataset_test_32.npy"),
        "val_dataset_dir": os.path.join(base, "SRdataset_validation_32.npy"),
    }


def run_reference_worker_mtsr(args) -> None:
    """Subprocess body: drive the reference's tactileSRSeqs main() on our
    SeqsDataset (train/tactileSRSeqs_train.py:62-100), trunk-transferring
    from ITS OWN head-to-head STSR checkpoint (model_param_init reads the
    module-global tactileSeqs_config['load_checkpoint_dir'], so that dict
    must be mutated in place), then dump test-set predictions."""
    ref = args.reference
    sys.path.insert(0, ref)
    sys.path.insert(0, os.path.join(ref, "train"))

    import utility.tools as ut  # noqa: E402

    ut.select_gpu_with_least_used_memory = lambda: (0, "cpu", "cpu", 0)

    import tactileSRSeqs_train as ref_seqs  # noqa: E402

    ref_stsr = args.ref_stsr_checkpoint or os.path.join(
        args.workdir, "ref_work/checkpoints/latest.pth"
    )
    assert os.path.exists(ref_stsr), (
        f"reference STSR transfer checkpoint missing: {ref_stsr} -- run the"
        " --stage sr head-to-head first (the MTSR recipe warm-starts its"
        " trunks from stage 3)"
    )
    # the transfer source is built from the module-global tactileSR_config
    # (train/tactileSRSeqs_train.py:47-51) -- align its shape knobs with
    # the checkpoint we trained in the SR stage
    ref_seqs.tactileSR_config.update(
        scale_factor=args.scale_factor,
        seqsCnt=1,
        axisCnt=3,
        patternFeatureExtraLayerCnt=args.pattern_layers,
        forceFeatureExtraLayerCnt=1,
    )
    cfg = ref_seqs.tactileSeqs_config  # in place: model_param_init reads it
    cfg.update(_mtsr_overrides(args))
    cfg.update(_mtsr_dataset_paths(args))
    cfg.update(
        load_checkpoint_dir=ref_stsr,
        save_dir=os.path.join(args.workdir, "mtsr", "ref_work"),
    )

    records = _capture_cpu_log()
    if args.ref_auto_resume:
        _force_ref_auto_resume(ref_seqs)
    else:
        # the transfer checkpoint embeds cpu.trainer classes too
        import torch

        _orig_load = torch.load
        torch.load = lambda *a, **k: _orig_load(
            *a, **{**k, "weights_only": False}
        )

    _write_ref_meta(
        os.path.join(args.workdir, "mtsr"),
        args,
        cfg["train_dataset_dir"],
        resume=args.ref_auto_resume,
    )
    ref_seqs.main(cfg)

    traj = traj_from_records(records)

    model = _load_ref_sr_model(ref_seqs, cfg)
    _dump_ref_sr_preds(
        model,
        ref_seqs.TactileSRDataset_seq(cfg["test_dataset_dir"]),
        cfg,
        os.path.join(args.workdir, "mtsr", "ref_preds.npz"),
    )
    print("H2H_REF " + json.dumps(traj), flush=True)


def run_ours_mtsr(args) -> list:
    _ours_jax_preamble()
    from tactilesr_tpu.config.default import tactileSeqs_config
    from tactilesr_tpu.tasks.sr_task import main as sr_main

    ours_stsr = args.ours_stsr_checkpoint
    assert ours_stsr and os.path.exists(ours_stsr), (
        "--ours-stsr-checkpoint must name our trained STSR bundle (e.g."
        " <workdir>/tpu_s42_work/checkpoints/latest.ckpt) -- the MTSR"
        " recipe warm-starts its trunks from stage 3"
    )
    cfg = dict(tactileSeqs_config)
    cfg.update(_mtsr_overrides(args))
    cfg.update(_mtsr_dataset_paths(args))  # the literal legacy files
    cfg.update(
        load_checkpoint_dir=ours_stsr,
        save_dir=os.path.join(args.workdir, "mtsr", f"{args.preds_tag}_work"),
        compute_dtype="float32",
        data_parallel="off",
        matmul_precision=args.matmul_precision,
        head_init=args.head_init,
        dead_head_action=args.dead_head_action,
    )
    records = _capture_our_log()
    trainer = sr_main(cfg, seqs=True)
    traj = _ours_sr_traj(trainer, records)

    from tactilesr_tpu.data.datasets import TactileSRDatasetSeq

    _dump_ours_sr_preds(
        trainer,
        TactileSRDatasetSeq(cfg["test_dataset_dir"]),
        cfg,
        os.path.join(args.workdir, "mtsr", f"{args.preds_tag}_preds.npz"),
    )
    return traj


def run_mtsr_stage(args) -> None:
    """Orchestrate the stage-4 head-to-head: both frameworks train the
    seqsCnt-frame MTSR on the same SeqsDataset files, each trunk-transferring
    from its OWN stage-3 head-to-head checkpoint (the full-pipeline
    comparison), scored by the shared evaluator."""
    preds_dir = os.path.join(args.workdir, "mtsr")
    os.makedirs(preds_dir, exist_ok=True)

    if args.ours_only:
        traj = run_ours_mtsr(args)
        print("H2H_MTSR_OURS " + json.dumps({"seed": args.seed, "traj": traj}))
        return

    if args.skip_ref:
        ref_traj = _parse_ref_sr_log(
            preds_dir,
            _sr_iters_per_epoch(args, _mtsr_dataset_paths(args)["train_dataset_dir"]),
        )
        assert ref_traj, "no eval lines found in mtsr/ref_work/log_rank0.txt"
        assert os.path.exists(os.path.join(preds_dir, "ref_preds.npz"))
    else:
        out = _spawn_ref_worker(args, "reference MTSR")
        line = [l for l in out.stdout.splitlines() if l.startswith("H2H_REF ")]
        ref_traj = json.loads(line[-1][len("H2H_REF "):])
        if args.ref_auto_resume:
            ref_traj = (
                _parse_ref_sr_log(
                    preds_dir,
                    _sr_iters_per_epoch(
                        args, _mtsr_dataset_paths(args)["train_dataset_dir"]
                    ),
                )
                or ref_traj
            )

    ours_traj = run_ours_mtsr(args)
    _print_sr_result(
        ref_traj, ours_traj, preds_dir, args.preds_tag, args.scale_factor
    )


# -------------------------------------------------------------------- data
def generate_shared_data(args) -> None:
    """Synthetic raw -> brief tPSF fit -> one SRdataset in both formats.
    (--stage tpsf only needs the raw blobs: both frameworks fit the physics
    themselves.)"""
    env = dict(os.environ)
    env.update(TACTILESR_PLATFORM="cpu", TACTILESR_ROOT=args.workdir)
    raw = os.path.join(args.workdir, "data/rotateDataset")
    sr = os.path.join(args.workdir, "data/SRdataset")
    run = lambda cmd: subprocess.run(cmd, env=env, check=True, cwd=REPO)
    run(
        [sys.executable, "-m", "tactilesr_tpu.data.generate", "synthetic",
         "--out-dir", raw, "--names", "C", "I", "P", "--taps-per-blob", "81",
         "--seqs", "24"]
    )
    if getattr(args, "stage", "sr") == "tpsf":
        return
    tpsf_ckpt = os.path.join(
        args.workdir, "pth/tPSFNet_no_aug/checkpoints/latest.ckpt"
    )
    if not os.path.exists(tpsf_ckpt):
        run(
            [sys.executable, "train/tPSFNet_train.py", "--epochs", "2",
             "--sample_cnt", "4", "--train_batch_size", "64",
             "--compute_dtype", "float32", "--inference_seqs_length", "12"]
        )
    if getattr(args, "stage", "sr") == "mtsr":
        # stage 4 trains on the SeqsDataset (the SRdataset + both sides'
        # STSR checkpoints must already exist from a --stage sr run)
        run(
            [sys.executable, "-m", "tactilesr_tpu.data.generate", "seqs",
             "--tpsf-checkpoint", tpsf_ckpt, "--raw-dir", raw,
             "--out-dir", os.path.join(args.workdir, "data/SeqsDataset"),
             "--sample-cnt", str(args.sample_cnt), "--n-contacts", "3",
             "--n-translations", "9", "--legacy-npy"]
        )
        return
    run(
        [sys.executable, "-m", "tactilesr_tpu.data.generate", "single",
         "--tpsf-checkpoint", tpsf_ckpt,
         "--raw-dir", raw, "--out-dir", sr,
         "--sample-cnt", str(args.sample_cnt), "--legacy-npy"]
    )


def report_all(workdir: str) -> None:
    """Score every ``*_preds.npz`` in the workdir with ONE metric
    implementation and print a comparison table (used for seed-spread
    studies: several ours-only runs + the reference)."""
    import glob

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny metrics; never touch
    # (or wait on) the TPU tunnel from a reporting pass
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from tactilesr_tpu.metrics import batched_psnr, batched_ssim

    rows = []
    label_ref, base_tag = None, None
    paths = sorted(glob.glob(os.path.join(workdir, "*_preds.npz")))
    # deterministic label baseline: the stage's own fresh reference dump
    # when present, else the first file; every other file's labels must
    # match it, and a same-shape-but-different-labels file (a stale dump
    # from another data draw) is SKIPPED, not crashed on
    canonical = os.path.join(workdir, "ref_preds.npz")
    if canonical in paths:
        paths.remove(canonical)
        paths.insert(0, canonical)
    else:  # no ref dump: lead with the majority label set, not sort order
        def _read_hr(p):
            with np.load(p) as z:
                return z["HR"]

        paths = _majority_label_first(paths, _read_hr)
    for path in paths:
        tag = os.path.basename(path)[: -len("_preds.npz")]
        with np.load(path) as z:
            sr, hr = z["SR"], z["HR"]
            role = _role_of(z, tag)
        if label_ref is None:
            label_ref, base_tag = hr, tag
        elif hr.shape != label_ref.shape or not np.allclose(
            hr, label_ref, rtol=1e-4, atol=1e-5
        ):
            print(
                f"{tag:24} SKIPPED: labels differ from {base_tag}'s"
                " (stale prediction set from another data draw?)"
            )
            continue
        ps = float(
            np.asarray(
                batched_psnr(jnp.asarray(sr[:, 0]), jnp.asarray(hr[:, 0]), 250.0)
            ).mean()
        )
        ss = float(
            np.asarray(batched_ssim(jnp.asarray(sr[:, 0]), jnp.asarray(hr[:, 0]))).mean()
        )
        mse = float(np.mean((sr - hr) ** 2))
        rows.append((tag, role, ps, ss, mse))
        print(f"{tag:24} PSNR {ps:7.3f} dB  SSIM {ss:7.4f}  MSE {mse:8.5f}")
    ours = [r for r in rows if r[1] == "ours"]
    ref = [r for r in rows if r[1] == "ref"]
    if ours and ref:
        ps = sorted(r[2] for r in ours)
        best_ref = max(r[2] for r in ref)  # the strongest reference draw
        summary = {
            "ref_psnr": round(best_ref, 3),
            "n_ref": len(ref),
            "ours_psnr_min": round(ps[0], 3),
            "ours_psnr_median": round(float(np.median(ps)), 3),
            "ours_psnr_max": round(ps[-1], 3),
            "n_ours": len(ours),
            "ref_within_ours_range": bool(ps[0] <= best_ref <= ps[-1]),
        }
        print("H2H_REPORT " + json.dumps(summary))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/tactilesr_h2h")
    p.add_argument("--reference", default="/root/reference")
    p.add_argument(
        "--stage",
        choices=("sr", "tpsf", "mtsr"),
        default="sr",
        help="which head-to-head to run: the stage-3 SR network (default), "
        "the stage-1 tPSFNet physics fit (both frameworks train on the "
        "same raw blobs; the shared evaluator scores the degraded 4x4 "
        "predictions over ALL test taps), or the stage-4 multi-frame MTSR "
        "(SeqsDataset; each side trunk-transfers from its OWN --stage sr "
        "checkpoint, so run that first)",
    )
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument(
        "--lr",
        type=float,
        default=None,
        help="default: 3e-4 for --stage sr, 1e-4 (the reference recipes') "
        "for --stage tpsf/mtsr",
    )
    p.add_argument(
        "--seqs-cnt",
        type=int,
        default=7,
        help="MTSR temporal frame count (--stage mtsr; reference recipe: 7)",
    )
    p.add_argument(
        "--ours-stsr-checkpoint",
        default=None,
        help="--stage mtsr: OUR trained STSR bundle to trunk-transfer from "
        "(e.g. <workdir>/tpu_s42_work/checkpoints/latest.ckpt)",
    )
    p.add_argument(
        "--ref-stsr-checkpoint",
        default=None,
        help="--stage mtsr: the reference's STSR .pth to trunk-transfer "
        "from (default: <workdir>/ref_work/checkpoints/latest.pth)",
    )
    p.add_argument("--scale-factor", type=int, default=10)
    p.add_argument("--pattern-layers", type=int, default=6)
    p.add_argument("--warmup-t", type=int, default=50)
    p.add_argument("--sample-cnt", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--matmul-precision", default="highest")
    p.add_argument(
        "--checkpoint-period",
        type=int,
        default=None,
        help="override both sides' checkpoint period (default: epochs-1, "
        "i.e. one final checkpoint); long reference runs on one CPU core "
        "want a small period so they are resumable",
    )
    p.add_argument(
        "--ref-auto-resume",
        action="store_true",
        help="let the reference trainer auto-resume from "
        "ref_work/checkpoints/latest.pth (the reference's own main() "
        "hardcodes auto_resume=False)",
    )
    p.add_argument(
        "--ours-only",
        action="store_true",
        help="train only our side and print its trajectory + dump "
        "tpu_preds.npz (for seed-spread studies; no reference, no "
        "comparison)",
    )
    p.add_argument(
        "--preds-tag",
        default="tpu",
        help="basename prefix for the predictions dump (ours-only runs "
        "with several seeds use distinct tags; any name works -- the dump "
        "records its ref/ours role internally for --report)",
    )
    p.add_argument(
        "--head-init",
        default="reference",
        help="ours-side head_init knob (reference|non_negative); the "
        "reference side always trains its own exact init, so this only "
        "affects run_ours (used to demo the dead-head cure on the seed "
        "that drew it)",
    )
    p.add_argument(
        "--dead-head-action",
        default="warn",
        help="ours-side dead_head_action knob (warn|reinit); used to demo "
        "the in-run head revival on the seed that drew a dead head",
    )
    p.add_argument("--skip-datagen", action="store_true")
    p.add_argument(
        "--report",
        action="store_true",
        help="score every *_preds.npz in the workdir with the shared "
        "evaluator and print one table (seed-spread summary)",
    )
    p.add_argument(
        "--skip-ref",
        action="store_true",
        help="reuse an existing ref_preds.npz + ref_work log instead of "
        "re-training the reference (e.g. to re-run only our side)",
    )
    p.add_argument("--ref-worker", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args()

    # absolute: the ref worker runs with cwd=workdir, so a relative path
    # would resolve to workdir/workdir/... inside it
    args.workdir = os.path.abspath(args.workdir)
    if args.lr is None:
        args.lr = 1e-4 if args.stage in ("tpsf", "mtsr") else 3e-4

    if args.ref_worker:
        if args.stage == "tpsf":
            run_reference_worker_tpsf(args)
        elif args.stage == "mtsr":
            run_reference_worker_mtsr(args)
        else:
            run_reference_worker(args)
        return

    if args.report:  # reporting never regenerates anything
        if args.stage == "tpsf":
            tpsf_report(args.workdir)
        elif args.stage == "mtsr":
            report_all(os.path.join(args.workdir, "mtsr"))
        else:
            report_all(args.workdir)
        return

    os.makedirs(args.workdir, exist_ok=True)
    if not args.skip_datagen:
        generate_shared_data(args)

    if args.stage == "tpsf":
        run_tpsf_stage(args)
        return
    if args.stage == "mtsr":
        run_mtsr_stage(args)
        return

    if args.ours_only:
        traj = run_ours(args)
        print("H2H_OURS " + json.dumps({"seed": args.seed, "traj": traj}))
        return

    # reference first (subprocess), then ours in-process
    if args.skip_ref:
        ref_traj = _parse_ref_sr_log(args.workdir, _sr_iters_per_epoch(args))
        assert ref_traj, "no eval lines found in ref_work/log_rank0.txt"
        assert os.path.exists(os.path.join(args.workdir, "ref_preds.npz"))
    else:
        out = _spawn_ref_worker(args, "reference")
        line = [l for l in out.stdout.splitlines() if l.startswith("H2H_REF ")]
        ref_traj = json.loads(line[-1][len("H2H_REF "):])
        if args.ref_auto_resume:
            # the subprocess only saw the resumed run's epochs (possibly
            # ZERO, if the previous run already finished and main() went
            # straight to the prediction dump); the log file accumulates
            # every run's eval lines -- prefer it
            ref_traj = (
                _parse_ref_sr_log(args.workdir, _sr_iters_per_epoch(args))
                or ref_traj
            )

    ours_traj = run_ours(args)
    _print_sr_result(
        ref_traj, ours_traj, args.workdir, args.preds_tag, args.scale_factor
    )


if __name__ == "__main__":
    main()
