"""Unit tests for the head-to-head study driver's pure helpers
(scripts/head_to_head.py) — the reference-log reconstruction is subtle
enough (auto-resume re-trains overlapping epochs) to deserve pinning."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from head_to_head import _parse_ref_sr_log  # noqa: E402

LINE = "[08/17 10:00:00 cpu.trainer]: ==> [test] loss: {l}, SSIM: {s}, PSNR: {p}\n"
START = "[08/17 10:00:00 cpu.trainer INFO]: Start training from iteration {i}\n"


def _write_log(tmp_path, text):
    d = tmp_path / "ref_work"
    d.mkdir()
    (d / "log_rank0.txt").write_text(text)
    return str(tmp_path)


def _evals(e0, n):
    # distinguishable values: psnr encodes the epoch
    return "".join(
        LINE.format(l=1.0 / (e + 1), s=0.9, p=30.0 + e) for e in range(e0, e0 + n)
    )


def test_parser_single_fresh_run(tmp_path):
    wd = _write_log(tmp_path, START.format(i=0) + _evals(0, 5))
    traj = _parse_ref_sr_log(wd, iters_per_epoch=21)
    assert [t["psnr"] for t in traj] == [30.0, 31.0, 32.0, 33.0, 34.0]


def test_parser_resume_overlap_dedups(tmp_path):
    # fresh run trains epochs 0-19, killed; resumes from the epoch-11
    # checkpoint (iteration 252 = 12*21) and re-trains 12-24: the resumed
    # values must override the overlapping 12-19 and extend to 24
    text = (
        START.format(i=0)
        + _evals(0, 20)
        + START.format(i=252)
        + "".join(
            LINE.format(l=0.5, s=0.95, p=100.0 + e) for e in range(12, 25)
        )
    )
    traj = _parse_ref_sr_log(_write_log(tmp_path, text), iters_per_epoch=21)
    assert len(traj) == 25
    assert traj[11]["psnr"] == 41.0  # from the fresh segment
    assert traj[12]["psnr"] == 112.0  # overridden by the resumed segment
    assert traj[24]["psnr"] == 124.0


def test_parser_drops_earlier_aborted_full_runs(tmp_path):
    text = (
        START.format(i=0)
        + _evals(0, 3)  # aborted early study
        + START.format(i=0)
        + _evals(0, 4)  # the real run
    )
    traj = _parse_ref_sr_log(_write_log(tmp_path, text), iters_per_epoch=21)
    assert len(traj) == 4


def test_parser_missing_log(tmp_path):
    assert _parse_ref_sr_log(str(tmp_path), iters_per_epoch=21) == []


def test_parser_prefers_recorded_iters_per_epoch(tmp_path):
    """A ref_meta.json written by the worker pins the epoch anchoring even
    when the report/skip-ref pass runs with a different --batch (which
    would re-derive a different iters_per_epoch and mis-slot resumed
    segments)."""
    import json

    # resumed segment starts at iteration 252; at the TRUE 21 iters/epoch
    # that anchors epoch 12, at a wrong 42 it would anchor epoch 6
    text = (
        START.format(i=0)
        + _evals(0, 20)
        + START.format(i=252)
        + "".join(LINE.format(l=0.5, s=0.95, p=100.0 + e) for e in range(12, 25))
    )
    wd = _write_log(tmp_path, text)
    (tmp_path / "ref_meta.json").write_text(
        json.dumps({"batch": 32, "epochs": 25, "iters_per_epoch": 21})
    )
    traj = _parse_ref_sr_log(wd, iters_per_epoch=42)  # stale current-args value
    assert len(traj) == 25
    assert traj[12]["psnr"] == 112.0


def _fake_preds(path, hr, role=None, sr_bias=0.0):
    import numpy as np

    arrays = {"SR": hr + sr_bias, "HR": hr}
    if role is not None:
        arrays["role"] = np.array(role)
    np.savez(path, **arrays)


def test_report_roles_and_stale_skip(tmp_path, capsys):
    """--report classifies by the recorded role (any --preds-tag counts as
    ours; a 'refit' tag is NOT mistaken for a reference run) and SKIPS a
    same-shape dump whose labels come from another data draw instead of
    crashing."""
    import json

    import numpy as np

    from head_to_head import report_all

    rng = np.random.default_rng(0)
    hr = rng.uniform(0.0, 5.0, size=(6, 1, 40, 40)).astype(np.float32)
    _fake_preds(tmp_path / "ref_preds.npz", hr, role="ref", sr_bias=0.3)
    _fake_preds(tmp_path / "refit_preds.npz", hr, role="ours", sr_bias=0.1)
    _fake_preds(tmp_path / "mystudy_preds.npz", hr, role="ours", sr_bias=0.2)
    # legacy dump without a role field: tpu* prefix heuristic applies
    _fake_preds(tmp_path / "tpu_s9_preds.npz", hr, sr_bias=0.15)
    # stale same-shape dump from a different data draw: must be skipped
    _fake_preds(tmp_path / "tpu_stale_preds.npz", hr + 1.7, role="ours")

    report_all(str(tmp_path))
    out = capsys.readouterr().out
    assert "tpu_stale" in out and "SKIPPED" in out
    summary = json.loads(
        [l for l in out.splitlines() if l.startswith("H2H_REPORT ")][-1][
            len("H2H_REPORT "):
        ]
    )
    assert summary["n_ours"] == 3  # refit + mystudy + tpu_s9, not the stale one
    assert summary["n_ref"] == 1


def test_ours_traj_prefers_captured_log_over_window20_storage():
    """MetricStorage's HistoryBuffer keeps only the last 20 values (the
    reference's window contract), so a 51-epoch ours trajectory read from
    storage would be tail-truncated and misalign against the reference's
    full table; the captured-log path must return ALL epochs."""
    from head_to_head import _ours_sr_traj

    records = [
        f"==> [test] loss: {1.0 / (e + 1):.4f}, SSIM: 0.9000, PSNR: {30.0 + e:.4f}"
        for e in range(51)
    ] + ["unrelated log line"]
    traj = _ours_sr_traj(trainer=None, records=records)  # trainer unused
    assert len(traj) == 51
    assert traj[0]["psnr"] == 30.0 and traj[50]["psnr"] == 80.0


def test_majority_label_first(tmp_path):
    """With no canonical ref dump, the label baseline must come from the
    MAJORITY allclose-group of dumps, not whichever filename sorts first."""
    import time

    import numpy as np

    from head_to_head import _majority_label_first

    fresh = np.full((4, 1, 8, 8), 2.0, np.float32)
    stale = np.zeros((4, 1, 8, 8), np.float32)
    paths = []
    for name, lab in [("a_old", stale), ("tpu_s0", fresh), ("tpu_s1", fresh)]:
        p = str(tmp_path / f"{name}_preds.npz")
        np.savez(p, SR=lab, HR=lab)
        paths.append(p)
    time.sleep(0.01)
    os.utime(paths[1])  # fresh dumps are newer

    def read_hr(p):
        with np.load(p) as z:
            return z["HR"]

    ordered = _majority_label_first(sorted(paths), read_hr)
    assert os.path.basename(ordered[0]).startswith("tpu_")  # majority leads
    assert sorted(ordered) == sorted(paths)  # nothing dropped

    # single group: order untouched
    same = _majority_label_first(sorted(paths[1:]), read_hr)
    assert same == sorted(paths[1:])


def test_write_ref_meta_resume_keeps_original(tmp_path):
    """--ref-auto-resume must NOT overwrite the original run's recorded
    epoch geometry (a resume with different --batch would mis-anchor the
    old log segments)."""
    import json
    import types

    from head_to_head import _write_ref_meta

    meta_path = tmp_path / "ref_meta.json"
    meta_path.write_text(json.dumps({"batch": 32, "epochs": 20, "iters_per_epoch": 21}))

    args = types.SimpleNamespace(batch=64, epochs=20, workdir=str(tmp_path))
    _write_ref_meta(str(tmp_path), args, train_path="unused", resume=True)
    assert json.loads(meta_path.read_text())["iters_per_epoch"] == 21  # kept
