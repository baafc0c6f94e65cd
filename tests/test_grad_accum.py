"""Gradient accumulation (``grad_accum: K``): K micro-batches per
optimizer step, valid-row-weighted gradient averaging, one update.

The contract (runtime/trainer.py::_step_core): for any mean-over-valid-
rows loss the accumulated gradient EQUALS the full-batch gradient, padded
final batches included -- so a BN-free model must reproduce the
unaccumulated trajectory bit-for-bit (up to float associativity).  With
BatchNorm the micro-batch normalization statistics differ by design
(documented; same semantics as torch accumulation), so the BN-model test
is behavioral.  This knob exists to break the single-chip B>256 layout
cliff measured in docs/PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_toy_trainer, toy_sr_config, toy_sr_data
from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
from tactilesr_tpu.runtime.trainer import Trainer, masked_mse


class _LinearTrainer(Trainer):
    """Minimal BN-free task: least squares Y ~ X @ w."""

    def train_cal_loss(self, params, batch_stats, batch):
        pred = batch["X"] @ params["w"]
        loss = masked_mse(pred, batch["Y"], batch["mask"])
        return loss, {"loss": loss}, batch_stats


def _linear_trainer(tmp_dir, X, Y, max_epochs=3, batch_size=8, **kw):
    n, d = X.shape
    w0 = np.linspace(-0.5, 0.5, d).astype(np.float32)
    sched = LRWarmupSchedule(
        StepLR(1e-2, 1, 0.9),
        by_epoch=True,
        epoch_len=-(-n // batch_size),
    )
    return _LinearTrainer(
        model=None,
        variables={"params": {"w": w0}},
        tx=adam_l2(weight_decay=1e-4),
        lr_schedule=sched,
        train_arrays={"X": X, "Y": Y},
        batch_size=batch_size,
        max_epochs=max_epochs,
        work_dir=str(tmp_dir),
        seed=7,
        **kw,
    )


def _linear_data(rng, n=23, d=6):
    # n deliberately NOT divisible by the batch size: the padded final
    # batch exercises the valid-row weighting across micro-batches
    X = rng.standard_normal((n, d)).astype(np.float32)
    w_true = rng.standard_normal(d).astype(np.float32)
    Y = (X @ w_true + 0.01 * rng.standard_normal(n)).astype(np.float32)
    return X, Y


def _final_w(t):
    return np.asarray(jax.device_get(t.state.params["w"]))


def test_accumulated_matches_full_batch_trajectory(tmp_path, rng):
    """BN-free model, same effective batch: grad_accum=4 reproduces the
    unaccumulated trajectory (losses and params), including the padded
    final batch of every epoch."""
    X, Y = _linear_data(rng)
    ta = _linear_trainer(tmp_path / "a", X, Y)
    ta.train(auto_resume=False)
    tb = _linear_trainer(tmp_path / "b", X, Y, grad_accum=4)
    tb.train(auto_resume=False)

    la, lb = ta.metric_storage["total_loss"], tb.metric_storage["total_loss"]
    assert len(la) == len(lb)
    np.testing.assert_allclose(la.latest, lb.latest, rtol=1e-5)
    np.testing.assert_allclose(_final_w(ta), _final_w(tb), rtol=1e-5, atol=1e-7)


def test_accum_composes_with_epoch_scan_and_remat(tmp_path, rng):
    """grad_accum inside the whole-epoch lax.scan (scan over steps, inner
    scan over micro-batches) and under remat: same trajectory again."""
    X, Y = _linear_data(rng)
    ta = _linear_trainer(tmp_path / "a", X, Y)
    ta.train(auto_resume=False)
    tb = _linear_trainer(
        tmp_path / "b", X, Y, grad_accum=4, scan_epochs=True, remat=True
    )
    tb.train(auto_resume=False)
    np.testing.assert_allclose(
        ta.metric_storage["total_loss"].latest,
        tb.metric_storage["total_loss"].latest,
        rtol=1e-5,
    )
    np.testing.assert_allclose(_final_w(ta), _final_w(tb), rtol=1e-5, atol=1e-7)


def test_accum_under_device_mesh(tmp_path, rng):
    """Micro-batches shard over the data axis: an 8-device mesh run with
    grad_accum=2 (micro-batch 16 -> 2 rows/device) matches the single-
    device accumulated run."""
    from tactilesr_tpu.parallel.mesh import resolve_mesh

    mesh = resolve_mesh("auto")
    assert mesh is not None and mesh.shape["data"] == 8
    X, Y = _linear_data(rng, n=70)
    ta = _linear_trainer(tmp_path / "a", X, Y, batch_size=32, grad_accum=2)
    ta.train(auto_resume=False)
    tb = _linear_trainer(
        tmp_path / "b", X, Y, batch_size=32, grad_accum=2, mesh=mesh
    )
    tb.train(auto_resume=False)
    np.testing.assert_allclose(
        ta.metric_storage["total_loss"].latest,
        tb.metric_storage["total_loss"].latest,
        rtol=1e-5,
    )
    np.testing.assert_allclose(_final_w(ta), _final_w(tb), rtol=1e-5, atol=1e-7)


def test_accum_micro_batch_divisibility_guard(tmp_path, rng):
    X, Y = _linear_data(rng)
    with pytest.raises(AssertionError, match="grad_accum"):
        _linear_trainer(tmp_path, X, Y, batch_size=8, grad_accum=3)


class _BNCountTrainer(Trainer):
    """batch_stats is a counter: +1 per train_cal_loss call whose stats
    update is COMMITTED -- exposes which micro-batches touch BN state."""

    def train_cal_loss(self, params, batch_stats, batch):
        pred = batch["X"] @ params["w"]
        loss = masked_mse(pred, batch["Y"], batch["mask"])
        return loss, {"loss": loss}, {"count": batch_stats["count"] + 1.0}


def test_accum_all_padded_micro_batch_keeps_batch_stats(tmp_path, rng):
    """ADVICE r4: a fully-padded micro-batch (every row a duplicate of
    sample 0) is excluded from gradients AND from the batch_stats update
    -- its degenerate statistics must not touch the running stats."""
    X, Y = _linear_data(rng, n=10)  # B=8, K=4 -> final step: [2 valid, 0, 0, 0]
    n = X.shape[0]
    w0 = np.linspace(-0.5, 0.5, X.shape[1]).astype(np.float32)
    sched = LRWarmupSchedule(StepLR(1e-2, 1, 0.9), by_epoch=True, epoch_len=2)
    t = _BNCountTrainer(
        model=None,
        variables={"params": {"w": w0}, "batch_stats": {"count": np.zeros(())}},
        tx=adam_l2(),
        lr_schedule=sched,
        train_arrays={"X": X, "Y": Y},
        batch_size=8,
        max_epochs=1,
        work_dir=str(tmp_path),
        seed=7,
        grad_accum=4,
    )
    t.train(auto_resume=False)
    count = float(jax.device_get(t.state.batch_stats["count"]))
    # 2 steps x 4 micro-batches = 8 calls, but only 5 carry valid rows
    # (step 1: 4x2 rows; step 2: 2 valid rows in the first micro-batch)
    assert count == 5.0, count
    """The real SR model (BatchNorm): accumulation trains comparably.
    Exact parity is NOT expected -- train-mode BN normalizes each
    micro-batch by its own statistics and running stats see K momentum
    updates per step (the documented semantics choice)."""
    lr, hr = toy_sr_data(rng)
    ta = make_toy_trainer(
        toy_sr_config(str(tmp_path / "a")), lr, hr, max_epochs=3
    )
    ta.train(auto_resume=False)
    tb = make_toy_trainer(
        toy_sr_config(str(tmp_path / "b")), lr, hr, max_epochs=3, grad_accum=2
    )
    tb.train(auto_resume=False)
    la = ta.metric_storage["total_loss"]
    lb = tb.metric_storage["total_loss"]
    assert len(la) == len(lb)
    assert np.isfinite(lb.latest)
    # both runs learn: final loss well below the first-iteration loss
    first_b = lb._values[0]  # window 20 >= the 9 steps of this run
    assert lb.latest < 0.7 * first_b
    # and the BN divergence stays small on this toy problem
    assert lb.latest == pytest.approx(la.latest, rel=0.5)
