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
