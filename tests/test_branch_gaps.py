"""Behavioral tests for shipped branches the main suites leave untraced:
trainer resume/NaN/warning paths, plateau-through-hook LR updates,
iteration-mode Eval/Logger hooks, micro-batcher failure delivery, legacy
torch-tensor dataset records, and schedule guards.  (Server error routes
live in test_server.py on its shared fixture.)

Targets picked from scripts/coverage_lines.py output (in-process missed
lines that are NOT covered by the subprocess/CLI tests)."""

import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tactilesr_tpu.runtime import (
    ConstantLR,
    LRWarmupSchedule,
    ReduceLROnPlateau,
    StepLR,
    adam_l2,
)
from tactilesr_tpu.runtime.checkpoint import (
    load_checkpoint_file,
    save_checkpoint_file,
)
from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model

from conftest import (  # shared toy-trainer scaffolding (one copy, no drift)
    make_toy_trainer as _make_trainer,
    toy_sr_config as _toy_config,
    toy_sr_data,
)


# ---------------------------------------------------------------- helpers
class _Capture(logging.Handler):
    """Collects package-logger records directly: setup_logger sets
    propagate=False, so pytest's caplog (which relies on propagation to
    root) never sees them."""

    def __init__(self):
        super().__init__(logging.WARNING)
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())

    def __enter__(self):
        logging.getLogger("tactilesr_tpu").addHandler(self)
        return self

    def __exit__(self, *exc):
        logging.getLogger("tactilesr_tpu").removeHandler(self)


def _toy_data(rng, n=16):  # smaller than test_trainer's 24: 2 steps/epoch
    return toy_sr_data(rng, n=n)


# ------------------------------------------------------- trainer branches
def test_nan_loss_raises_in_scan_mode(tmp_path, rng):
    """Scan mode checks the fetched per-step metrics after the epoch
    dispatch (trainer.py:375-379) -- same FloatingPointError contract as
    the per-iter path (reference cpu/trainer.py:281-284)."""
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    hr[3, 0, 5, 5] = np.nan
    trainer = _make_trainer(cfg, lr, hr, max_epochs=2, scan_epochs=True)
    trainer.register_hooks([])
    with pytest.raises(FloatingPointError, match="infinite or NaN"):
        trainer.train(auto_resume=False)


def test_auto_resume_without_checkpoint_warns(tmp_path, rng):
    """auto_resume=True with an empty checkpoint dir warns and starts
    fresh (trainer.py:526-531)."""
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    trainer = _make_trainer(cfg, lr, hr, max_epochs=1)
    trainer.register_hooks([])
    with _Capture() as cap:
        trainer.train(auto_resume=True)
    assert any("no latest checkpoint" in m for m in cap.messages)
    assert trainer.start_iter == 0


def test_resume_explicit_path(tmp_path, rng):
    """train(resume_from_checkpoint=...) loads the named file, not
    latest.ckpt (trainer.py:434-436)."""
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    t1 = _make_trainer(cfg, lr, hr, max_epochs=2)
    t1.register_hooks([])
    t1.train(auto_resume=False)
    epoch0 = os.path.join(cfg["save_dir"], "checkpoints", "epoch_0.ckpt")
    assert os.path.exists(epoch0)

    t2 = _make_trainer(cfg, lr, hr, max_epochs=2, seed=7)
    t2.register_hooks([])
    t2.train(resume_from_checkpoint=epoch0)
    # epoch_0 resume continues from iteration epoch_len, NOT from the
    # latest (epoch_1) checkpoint's 2*epoch_len
    assert t2.start_iter == t2.epoch_len


def test_resume_device_count_mismatch_raises(tmp_path, rng):
    """The reference asserts saved num_gpus == world size on resume
    (cpu/trainer.py:446-450); ours asserts device count
    (trainer.py:541-545)."""
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    t1 = _make_trainer(cfg, lr, hr, max_epochs=1)
    t1.register_hooks([])
    t1.train(auto_resume=False)
    path = os.path.join(cfg["save_dir"], "checkpoints", "epoch_0.ckpt")
    bundle = load_checkpoint_file(path)
    bundle["num_devices"] = bundle["num_devices"] + 1
    save_checkpoint_file(path, bundle)

    t2 = _make_trainer(cfg, lr, hr, max_epochs=2)
    t2.register_hooks([])
    with pytest.raises(AssertionError, match="devices"):
        t2.train(resume_from_checkpoint=path)


def test_resume_hook_state_warnings(tmp_path, rng):
    """Missing and unexpected hook states warn by name on resume
    (trainer.py:578-586), mirroring the reference's strict=False hook
    restore (cpu/trainer.py:484-498)."""
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    t1 = _make_trainer(cfg, lr, hr, max_epochs=1)
    t1.register_hooks([])  # defaults include the checkpointable CheckpointHook
    t1.train(auto_resume=False)
    path = os.path.join(cfg["save_dir"], "checkpoints", "epoch_0.ckpt")
    bundle = load_checkpoint_file(path)
    assert "CheckpointHook" in bundle.get("hooks", {})
    bundle["hooks"] = {"BogusHook": {"x": 1}}  # drop real, add unknown
    save_checkpoint_file(path, bundle)

    t2 = _make_trainer(cfg, lr, hr, max_epochs=2)
    t2.register_hooks([])
    with _Capture() as cap:
        t2.train(resume_from_checkpoint=path)
    assert any("Missing hook state: CheckpointHook" in m for m in cap.messages)
    assert any("Unexpected hook state: BogusHook" in m for m in cap.messages)


class _TwoTermTrainer(SRTrainer):
    """Loss split into two logged components (the reference supports
    multi-entry loss dicts, cpu/trainer.py:291-316)."""

    def train_cal_loss(self, params, batch_stats, batch):
        loss, loss_dict, new_bs = super().train_cal_loss(
            params, batch_stats, batch
        )
        mse = loss_dict["total_loss"]
        return loss, {"mse": mse * 0.75, "aux": mse * 0.25}, new_bs


@pytest.mark.parametrize("scan", [False, True])
def test_multi_component_loss_dict_logged(tmp_path, rng, scan):
    """A >1-entry loss dict logs each component plus their total_loss sum,
    in both the per-iter and epoch-scan paths (trainer.py:385-386,
    425-426)."""
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    trainer = _make_trainer(
        cfg, lr, hr, max_epochs=1, trainer_cls=_TwoTermTrainer,
        scan_epochs=scan,
    )
    trainer.register_hooks([])
    trainer.train(auto_resume=False)
    trainer.flush_metrics()
    storage = trainer.metric_storage
    assert "mse" in storage and "aux" in storage and "total_loss" in storage
    np.testing.assert_allclose(
        storage["total_loss"].latest,
        storage["mse"].latest + storage["aux"].latest,
        rtol=1e-5,
    )


# ----------------------------------------------------------- hook branches
def test_lr_update_hook_plateau_requires_eval_metric(tmp_path, rng):
    """Plateau LR scheduling through the default LRUpdateHook needs an
    EvalHook logging 'Eval Metric' (reference
    cpu/hooks/lr_update_hook.py:20-38); without one the first epoch
    boundary fails loud."""
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    sched = LRWarmupSchedule(
        ReduceLROnPlateau(cfg["lr"], patience=0, factor=0.5), by_epoch=True
    )
    trainer = _make_trainer(cfg, lr, hr, max_epochs=2, schedule=sched)
    trainer.register_hooks([])  # LRUpdateHook is a default; no EvalHook
    with pytest.raises(AssertionError, match="Eval Metric"):
        trainer.train(auto_resume=False)


def test_lr_update_hook_plateau_steps_on_eval_metric(tmp_path, rng):
    """With a constant 'Eval Metric' and patience=0, the plateau inner
    reduces the LR through the hook path (builtin.py:39-47)."""
    from tactilesr_tpu.runtime.hooks import EvalHook

    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    sched = LRWarmupSchedule(
        ReduceLROnPlateau(cfg["lr"], patience=0, factor=0.5), by_epoch=True
    )
    trainer = _make_trainer(cfg, lr, hr, max_epochs=3, schedule=sched)
    trainer.register_hooks([EvalHook(1, lambda: {"Eval Metric": 1.0})])
    trainer.train(auto_resume=False)
    # epoch 0 sets best; epochs 1,2 are 'bad' -> two 0.5x reductions
    assert trainer.lr_schedule.get_lr() == pytest.approx(cfg["lr"] * 0.25)


def test_eval_and_logger_hooks_iteration_mode(tmp_path, rng):
    """Iteration-based training drives EvalHook.after_iter and
    LoggerHook's console/TB writes (builtin.py:103-106, 186-190;
    reference eval_hook.py:42-47, logger_hook.py:50-98)."""
    from tactilesr_tpu.runtime.hooks import EvalHook

    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    model = build_model(cfg)
    v = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    calls = []
    trainer = SRTrainer(
        config=cfg,
        model=model,
        variables={
            "params": v["params"],
            "batch_stats": v.get("batch_stats", {}),
        },
        tx=adam_l2(),
        lr_schedule=LRWarmupSchedule(ConstantLR(1e-4), by_epoch=False),
        train_arrays={"LR": lr, "HR": hr},
        batch_size=8,
        max_iters=5,
        work_dir=cfg["save_dir"],
        log_period=1,  # LoggerHook writes every iter
    )
    trainer.register_hooks(
        [EvalHook(2, lambda: calls.append(1) or {"Eval Metric": 2.5})]
    )
    trainer.train(auto_resume=False)
    # period-2 fires mid-run (iters 1, 3) + the unconditional end-of-train
    assert len(calls) == 3
    assert trainer.metric_storage["Eval Metric"].latest == 2.5
    # LoggerHook's TB writer produced event files
    tb_files = os.listdir(trainer.tb_log_dir)
    assert any("tfevents" in f or f.endswith(".jsonl") for f in tb_files)


def test_profiler_hook_stops_at_train_end(tmp_path, rng):
    """A profiler window extending past the last iteration is closed by
    after_train (profiler.py:49-55) and still yields a parseable trace."""
    from tactilesr_tpu.runtime.hooks import ProfilerHook

    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    trainer = _make_trainer(cfg, lr, hr, max_epochs=1)
    trace_dir = str(tmp_path / "trace")
    hook = ProfilerHook(trace_dir, start_iter=0, num_iters=10_000)
    trainer.register_hooks([hook])
    trainer.train(auto_resume=False)
    assert not hook._active
    import glob

    assert glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    )


# ------------------------------------------------------- schedule branches
def test_invalid_warmup_mode_raises():
    with pytest.raises(ValueError, match="Invalid warmup mode"):
        LRWarmupSchedule(
            StepLR(1e-3, 2, 0.8),
            by_epoch=True,
            epoch_len=4,
            warmup_t=8,
            warmup_mode="bogus",
        )


def test_steplr_lr_at_matches_step():
    s = StepLR(1e-3, step_size=2, gamma=0.5)
    want = []
    for t in range(6):
        want.append(s.lr)
        s.step()
    assert [StepLR(1e-3, 2, 0.5).lr_at(t) for t in range(6)] == want


def test_plateau_step_without_metric_only_advances():
    p = ReduceLROnPlateau(1e-3, patience=0, factor=0.5)
    p.step(1.0)  # sets best
    p.step(None)  # metric-less tick: no reduction decision
    assert p.lr == 1e-3 and p.t == 2
    p.step(1.0)  # not better -> reduce
    assert p.lr == pytest.approx(5e-4)


def test_plateau_with_epoch_warmup_precomputes_flat_lrs():
    """Plateau inners cannot be table-stepped ahead; the warmup wrapper
    pins the post-warmup table to base_lr (schedule.py:199-201)."""
    sched = LRWarmupSchedule(
        ReduceLROnPlateau(1e-3, patience=0, factor=0.5),
        by_epoch=True,
        warmup_by_epoch=True,
        warmup_t=2,
        warmup_mode="fix",
        warmup_init_lr=1e-5,
    )
    assert sched.regular_lrs_per_t == [1e-3] * 3
    assert sched.get_lr() == pytest.approx(1e-5)


# ------------------------------------------------- micro-batcher / server
class _FlakyPredictor:
    """Predictor stub: fails the first dispatch, then echoes shapes."""

    in_channels = 3
    buckets = (16,)

    def __init__(self):
        self.calls = 0

    def predict(self, lr):
        self.calls += 1
        if self.calls == 1:
            raise RuntimeError("device fell over")
        n = lr.shape[0]
        return np.zeros((n, 1, 16, 16), np.float32)


def test_microbatcher_delivers_errors_and_survives():
    """A failed dispatch raises per-caller (server.py:120-128) and the
    worker keeps serving subsequent requests."""
    from tactilesr_tpu.server import MicroBatcher

    mb = MicroBatcher(_FlakyPredictor(), linger_ms=1.0)
    try:
        x = np.zeros((2, 3, 4, 4), np.float32)
        with pytest.raises(RuntimeError, match="batched predict failed"):
            mb.submit(x)
        out = mb.submit(x)  # worker survived the failure
        assert out.shape == (2, 1, 16, 16)
        assert mb.stats["requests"] >= 1
    finally:
        mb.shutdown()


# ------------------------------------------------------------ data formats
def test_legacy_npy_with_torch_tensors(tmp_path):
    """Legacy object-.npy written with torch tensors inside the record
    dicts loads transparently (datasets.py::_to_numpy, the 'saved on
    another machine' case)."""
    torch = pytest.importorskip("torch")  # suite stays green torch-free

    from tactilesr_tpu.data.datasets import TactileSRDataset

    recs = np.empty(3, dtype=object)
    for i in range(3):
        recs[i] = {
            "LR": torch.full((3, 4, 4), float(i)),
            "HR": torch.full((1, 100, 100), float(10 + i)),
        }
    path = str(tmp_path / "SRdataset_train.npy")
    np.save(path, recs, allow_pickle=True)

    ds = TactileSRDataset(path)
    a, b = ds.stacked()
    assert a.shape == (3, 3, 4, 4) and b.shape == (3, 1, 100, 100)
    np.testing.assert_array_equal(a[2], 2.0)
    np.testing.assert_array_equal(b[0], 10.0)


def test_tpsf_dataset_empty_dir_yields_empty_stacks(tmp_path):
    """No raw blobs -> zero-length, correctly-shaped stacks (datasets.py:
    85-87) so downstream shape logic stays total."""
    from tactilesr_tpu.data.datasets import TPSFNetDataset

    ds = TPSFNetDataset(str(tmp_path), sample_cnt=4, is_sample_idx=None)
    a, b = ds.stacked()
    assert a.shape == (0, 3, 4, 4) and b.shape == (0, 100, 100)
    assert len(ds) == 0


# ---------------------------------------------------------------- mesh edge
def test_resolve_mesh_auto_indivisible_batch_falls_back_to_none():
    """auto shrinks the data axis to divide the batch; when only 1 device
    divides it there is no mesh at all (mesh.py:185-193)."""
    from tactilesr_tpu.parallel.mesh import resolve_mesh

    assert resolve_mesh("auto", batch_size=1) is None


# ------------------------------------------------------- dead-head detector
def _dead_trainer(tmp_path, rng, check=True):
    """Force the born-dead-head pathology deterministically: all-zero
    params emit a constant-zero map (BN folds zeros to zeros, final conv
    bias is 0), and an ~zero LR keeps them there -- loss pins at
    mean(HR^2) with zero output variance, the exact seed-3 signature."""
    import jax as _jax
    import jax.numpy as _jnp

    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    lr, hr = _toy_data(rng)
    cfg = _toy_config(str(tmp_path), lr=1e-30, warmup_t=0)
    t = _make_trainer(cfg, lr, hr, max_epochs=4)
    t.state = t.state.replace(
        params=_jax.tree_util.tree_map(
            lambda p: _jnp.zeros_like(p), t.state.params
        )
    )
    if check:
        t.register_hooks([DeadHeadHook(lr, patience=3)])
    return t


def test_dead_head_hook_warns_on_pinned_constant_output(tmp_path, rng):
    """The runtime detector: 3 consecutive epochs of loss==mean(HR^2) with
    ~zero probe variance fire ONE actionable warning naming the
    `head_init: non_negative` cure (RESULTS.md head-init study)."""
    t = _dead_trainer(tmp_path, rng)
    with _Capture() as cap:
        t.train(auto_resume=False)
    dead = [m for m in cap.messages if "Dead head detected" in m]
    assert len(dead) == 1  # fires once, then stays quiet
    assert "head_init" in dead[0] and "non_negative" in dead[0]


def _kill_head(t, head="output_conv1"):
    """Force the dead-head state on an otherwise-healthy trainer: an
    all-negative head kernel on ReLU (>=0) input features leaves the
    pre-activation negative everywhere -- zero gradient, constant-zero
    output (the seed-3 failure, reproduced surgically)."""

    def kill(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if head in keys and keys[-1] == "kernel":
            return -jnp.abs(leaf) - 1e-3
        return leaf

    t.state = t.state.replace(
        params=jax.tree_util.tree_map_with_path(kill, t.state.params)
    )


def test_dead_head_hook_reinit_recovers_in_run(tmp_path, rng):
    """dead_head_action=reinit: after `patience` pinned epochs the hook
    re-draws ONLY the head kernel (scale-compensated non-negative) and
    zeroes its Adam moments; the SAME run then trains below the pinned
    mean(HR^2) level -- no restart, trunk epochs preserved."""
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    lr, hr = _toy_data(rng)
    cfg = _toy_config(str(tmp_path), lr=3e-3, warmup_t=0)
    t = _make_trainer(cfg, lr, hr, max_epochs=12)
    _kill_head(t)
    t.register_hooks([DeadHeadHook(lr, patience=2, action="reinit")])
    with _Capture() as cap:
        t.train(auto_resume=False)
    revive = [m for m in cap.messages if "re-drew the 'output_conv1' kernel" in m]
    assert len(revive) == 1, cap.messages
    hr_power = float(jnp.mean(jnp.square(t.device_arrays["HR"])))
    final = t.metric_storage["total_loss"].latest
    assert final < 0.8 * hr_power, (final, hr_power)
    # warn-once escalation never fired (the head stayed alive after reinit)
    assert not any("will not recover" in m for m in cap.messages)


def test_dead_head_hook_reinit_only_touches_the_head(tmp_path, rng):
    """The in-place cure must not perturb the trunk: every non-head param
    and optimizer leaf is bit-identical across the reinit."""
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    lr, hr = _toy_data(rng)
    cfg = _toy_config(str(tmp_path), lr=1e-30, warmup_t=0)
    t = _make_trainer(cfg, lr, hr, max_epochs=3)
    _kill_head(t)
    hook = DeadHeadHook(lr, patience=3, action="reinit")
    t.register_hooks([hook])
    t.train(auto_resume=False)  # patience hits on the last epoch
    assert hook._reinited

    # with lr ~0 the trunk params are (numerically) frozen; compare the
    # head-excluded subtrees of a fresh identical init against the state
    t2 = _make_trainer(
        _toy_config(str(tmp_path / "b"), lr=1e-30, warmup_t=0), lr, hr,
        max_epochs=3,
    )
    a = jax.device_get(t.state.params)
    b = jax.device_get(t2.state.params)
    for name in a:
        if name == "output_conv1":
            continue
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=0, atol=5e-7),
            a[name], b[name],
        )


def test_dead_head_hook_probe_failure_disables_not_kills(tmp_path, rng):
    """ADVICE r4: a probe whose channels don't match the model (21-ch seqs
    LR against a 3-ch model) must disable the detector with a warning, not
    crash the training run it protects."""
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    t = _dead_trainer(tmp_path, rng, check=False)
    bad_probe = np.random.default_rng(0).random((8, 21, 4, 4)).astype(np.float32)
    t.register_hooks([DeadHeadHook(bad_probe, patience=1)])
    with _Capture() as cap:
        t.train(auto_resume=False)  # must complete
    assert any("probe forward failed" in m for m in cap.messages)


def test_dead_head_hook_rejects_unknown_action():
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    with pytest.raises(ValueError, match="dead_head_action"):
        DeadHeadHook(np.zeros((1, 3, 4, 4), np.float32), action="restart")


def test_dead_head_hook_second_death_escalates_to_warning(tmp_path, rng):
    """Recovery is once-per-run: a head that pins again after a reinit
    gets the warning (naming the already-applied reinit), not another
    silent re-draw."""
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    lr, hr = _toy_data(rng)
    cfg = _toy_config(str(tmp_path), lr=1e-30, warmup_t=0)
    t = _make_trainer(cfg, lr, hr, max_epochs=8)
    t.state = t.state.replace(
        params=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), t.state.params)
    )  # whole net dead: a head reinit alone cannot revive it (lr ~0 too)
    hook = DeadHeadHook(lr, patience=2, action="reinit")
    t.register_hooks([hook])
    with _Capture() as cap:
        t.train(auto_resume=False)
    assert hook._reinited  # first detection applied the in-place cure
    died_again = [m for m in cap.messages if "died again" in m]
    assert len(died_again) == 1, cap.messages  # second detection escalates once


def test_dead_head_hook_reinit_missing_head_module_disables(tmp_path, rng):
    """A head_module name absent from the param tree cannot be cured;
    the hook disables itself with a warning instead of looping."""
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    t = _dead_trainer(tmp_path, rng, check=False)
    hook = DeadHeadHook(
        t.device_arrays["LR"][:4], patience=1, action="reinit",
        head_module="no_such_module",
    )
    t.register_hooks([hook])
    with _Capture() as cap:
        t.train(auto_resume=False)
    assert hook._disabled
    assert any("cannot reinit" in m for m in cap.messages)


def test_dead_head_hook_reinit_multiprocess_falls_back_to_warn(
    tmp_path, rng, monkeypatch
):
    """Under a multi-process mesh the proc-0-only hook must not edit the
    replicated state; reinit falls back to the warning."""
    import tactilesr_tpu.parallel.dist as dist_mod
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    t = _dead_trainer(tmp_path, rng, check=False)
    monkeypatch.setattr(dist_mod, "get_world_size", lambda: 2)
    hook = DeadHeadHook(t.device_arrays["LR"][:4], patience=2, action="reinit")
    t.register_hooks([hook])
    with _Capture() as cap:
        t.train(auto_resume=False)
    assert not hook._reinited
    assert any("not supported under a multi-process mesh" in m for m in cap.messages)
    assert any("Dead head detected" in m for m in cap.messages)  # warn path


def test_dead_head_registration_uses_cnn_head_module(tmp_path, rng, monkeypatch):
    """sr_task.main wires the architecture's own head name into the hook
    (TactileSRCNN ends in 'output_conv', not 'output_conv1') and slices
    the probe to the model's input channels."""
    from tactilesr_tpu.tasks import sr_task

    captured = {}
    orig = sr_task.DeadHeadHook

    class Spy(orig):
        def __init__(self, probe_lr, **kw):
            captured["kw"] = dict(kw)
            captured["probe_channels"] = np.asarray(probe_lr).shape[1]
            super().__init__(probe_lr, **kw)

    monkeypatch.setattr(sr_task, "DeadHeadHook", Spy)

    lr, hr = _toy_data(rng)
    train_npz = str(tmp_path / "train.npz")
    test_npz = str(tmp_path / "test.npz")
    np.savez(train_npz, LR=lr, HR=hr)
    np.savez(test_npz, LR=lr[:4], HR=hr[:4])
    cfg = _toy_config(
        str(tmp_path),
        model_arch="TactileSRCNN",
        train_dataset_dir=train_npz,
        test_dataset_dir=test_npz,
        dead_head_action="reinit",
    )
    sr_task.main(cfg, max_epochs=1)
    assert captured["kw"]["head_module"] == "output_conv"
    assert captured["kw"]["action"] == "reinit"
    assert captured["probe_channels"] == 3


def test_dead_head_hook_no_metrics_is_a_noop(tmp_path, rng):
    """after_epoch before any loss was logged must return quietly."""
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    lr, hr = _toy_data(rng)
    t = _make_trainer(_toy_config(str(tmp_path)), lr, hr, max_epochs=1)
    hook = DeadHeadHook(lr, patience=1)
    t.register_hooks([hook])
    hook.after_epoch()  # storage has no "total_loss" yet
    assert hook._streak == 0 and not hook._warned


def test_dead_head_hook_quiet_on_healthy_run(tmp_path, rng):
    """A normal training run (params alive, loss leaves mean(HR^2)) must
    never trip the detector."""
    from tactilesr_tpu.tasks.sr_task import DeadHeadHook

    lr, hr = _toy_data(rng)
    t = _make_trainer(_toy_config(str(tmp_path)), lr, hr, max_epochs=4)
    t.register_hooks([DeadHeadHook(lr, patience=2)])
    with _Capture() as cap:
        t.train(auto_resume=False)
    assert not any("Dead head" in m for m in cap.messages)
