"""Unit tests for runtime pieces: history buffers, checkpoint manager GC,
scalar writer, config parser, iteration-based training mode, device utils."""

import os

import numpy as np
import pytest

from tactilesr_tpu.config.parser import ConfigArgumentParser, save_args
from tactilesr_tpu.runtime import CheckpointManager, MetricStorage
from tactilesr_tpu.runtime.history import HistoryBuffer
from tactilesr_tpu.runtime.logger import ScalarWriter


def test_history_buffer_window_and_global():
    buf = HistoryBuffer(window_size=3)
    for v in [1, 2, 3, 4]:
        buf.update(v)
    assert buf.latest == 4
    assert buf.avg == (2 + 3 + 4) / 3
    assert buf.global_avg == 2.5
    assert buf.global_sum == 10
    state = buf.state_dict()
    buf2 = HistoryBuffer.from_state_dict(state)
    assert buf2.avg == buf.avg and len(buf2) == len(buf)


def test_metric_storage_smoothing_and_guards():
    ms = MetricStorage(window_size=2)
    ms.update(0, loss=1.0)
    ms.update(0, lr=0.1, smooth=False)
    ms.update(1, loss=0.5)
    ms.update(1, lr=0.01, smooth=False)
    vals = ms.values_maybe_smooth
    assert vals["loss"] == (1, 0.75)  # smoothed window avg
    assert vals["lr"] == (1, 0.01)  # latest
    with pytest.raises(AssertionError):
        ms.update(2, loss=0.1, smooth=False)  # smooth flag flip
    with pytest.raises(AssertionError):
        ms.update(0, loss=0.1)  # non-increasing iteration
    state = ms.state_dict()
    ms2 = MetricStorage()
    ms2.load_state_dict(state)
    assert ms2.values_maybe_smooth == vals


def test_checkpoint_manager_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    for e in range(4):
        mgr.save(f"epoch_{e}.ckpt", {"epoch": e})
    files = sorted(os.listdir(tmp_path))
    assert "epoch_0.ckpt" not in files and "epoch_1.ckpt" not in files
    assert "epoch_2.ckpt" in files and "epoch_3.ckpt" in files
    assert os.path.islink(tmp_path / "latest.ckpt")
    from tactilesr_tpu.runtime import load_checkpoint_file

    assert load_checkpoint_file(str(tmp_path / "latest.ckpt"))["epoch"] == 3


def test_scalar_writer_produces_tfevents(tmp_path):
    w = ScalarWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("loss", 1.0 / (i + 1), i)
    w.flush()
    w.close()
    names = os.listdir(tmp_path)
    assert any("tfevents" in n for n in names) or "scalars.jsonl" in names


def test_config_parser_yaml_and_flags(tmp_path):
    import yaml

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(yaml.dump({"lr": 0.5, "steps": 7}))
    p = ConfigArgumentParser()
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=1)
    args = p.parse_args(["-c", str(cfg_file)])
    assert args.lr == 0.5 and args.steps == 7
    # CLI beats YAML
    args2 = p.parse_args(["-c", str(cfg_file), "--lr", "0.9"])
    assert args2.lr == 0.9
    # unknown YAML key -> error
    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.dump({"nope": 1}))
    with pytest.raises(SystemExit):
        p.parse_args(["-c", str(bad)])
    # save_args roundtrip
    out = tmp_path / "saved.yaml"
    save_args(args, str(out))
    assert yaml.safe_load(out.read_text())["lr"] == 0.5


def test_iteration_based_training(tmp_path, rng):
    """max_iters mode: trains, checkpoints iter_{i}.ckpt, resumes."""
    from tactilesr_tpu.config.default import tactileSR_config
    from tactilesr_tpu.runtime import ConstantLR, LRWarmupSchedule, adam_l2
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model
    import jax
    import jax.numpy as jnp

    cfg = dict(tactileSR_config)
    cfg.update(
        save_dir=str(tmp_path / "work"),
        train_batch_size=8,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        compute_dtype="float32",
    )
    lr = (rng.random((16, 3, 4, 4)) * 4).astype(np.float32)
    hr = np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    model = build_model(cfg)
    v = jax.device_get(model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False))

    def make(max_iters):
        return SRTrainer(
            config=cfg,
            model=model,
            variables={"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            tx=adam_l2(weight_decay=1e-2),
            lr_schedule=LRWarmupSchedule(ConstantLR(1e-4), by_epoch=False),
            train_arrays={"LR": lr, "HR": hr},
            batch_size=8,
            max_iters=max_iters,
            work_dir=cfg["save_dir"],
            checkpoint_period=2,
        )

    t = make(4)
    t.train(auto_resume=False)
    ckpts = os.listdir(os.path.join(cfg["save_dir"], "checkpoints"))
    assert "iter_1.ckpt" in ckpts and "iter_3.ckpt" in ckpts

    t2 = make(6)
    t2.train(auto_resume=True)
    assert t2.start_iter == 4


def test_device_utils_smoke():
    from tactilesr_tpu.runtime.device import (
        parse_device_memory,
        select_device_with_most_free_memory,
    )

    info = parse_device_memory()
    assert len(info) >= 1 and {"index", "free_memory"} <= set(info[0])
    idx, dev, name, free = select_device_with_most_free_memory()
    assert 0 <= idx < len(info)


def test_profiler_hook(tmp_path, rng):
    """ProfilerHook captures a trace window without disturbing training."""
    from tactilesr_tpu.config.default import tactileSR_config
    from tactilesr_tpu.runtime import ConstantLR, LRWarmupSchedule, adam_l2
    from tactilesr_tpu.runtime.hooks import ProfilerHook
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model
    import jax
    import jax.numpy as jnp

    cfg = dict(tactileSR_config)
    cfg.update(
        save_dir=str(tmp_path / "work"),
        train_batch_size=8,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        compute_dtype="float32",
    )
    lr = (rng.random((16, 3, 4, 4)) * 4).astype(np.float32)
    hr = (rng.random((16, 1, 100, 100)) * 20).astype(np.float32)
    model = build_model(cfg)
    v = jax.device_get(model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False))
    trainer = SRTrainer(
        config=cfg,
        model=model,
        variables={"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        tx=adam_l2(),
        lr_schedule=LRWarmupSchedule(ConstantLR(1e-4), by_epoch=True, epoch_len=2),
        train_arrays={"LR": lr, "HR": hr},
        batch_size=8,
        max_epochs=2,
        work_dir=cfg["save_dir"],
    )
    trace_dir = str(tmp_path / "trace")
    trainer.register_hooks([ProfilerHook(trace_dir, start_iter=1, num_iters=2)])
    trainer.train(auto_resume=False)
    assert os.path.isdir(trace_dir) and len(os.listdir(trace_dir)) > 0
    # the window must have produced an actually parseable trace: a
    # TensorBoard-profile session dir with an .xplane.pb (always) and a
    # chrome trace.json.gz that json-parses to events
    import glob
    import gzip
    import json

    xplanes = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    )
    assert xplanes, f"no xplane.pb under {trace_dir}"
    assert os.path.getsize(xplanes[0]) > 0
    chrome = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if chrome:  # present on CPU/TPU backends that export chrome traces
        with gzip.open(chrome[0], "rt") as f:
            trace = json.load(f)
        assert trace.get("traceEvents"), "chrome trace has no events"


def test_trainer_ctor_guards(tmp_path):
    """The documented misconfiguration guards (trainer.py:108-113) fire
    before any device work."""
    from tactilesr_tpu.runtime.trainer import Trainer

    kw = dict(
        model=None, variables={}, tx=None, lr_schedule=None,
        train_arrays={"x": np.zeros((4, 1))}, batch_size=2,
        work_dir=str(tmp_path),
    )
    with pytest.raises(AssertionError, match="either max_epochs or max_iters"):
        Trainer(**kw)  # neither
    with pytest.raises(AssertionError, match="either max_epochs or max_iters"):
        Trainer(max_epochs=1, max_iters=1, **kw)  # both
    with pytest.raises(AssertionError, match="scan_epochs requires epoch"):
        Trainer(max_iters=4, scan_epochs=True, **kw)


def test_trainer_base_train_cal_loss_raises(tmp_path):
    """The base Trainer is an extension point: train_cal_loss must be
    overridden (trainer.py:246, mirroring the reference's warning)."""
    import optax

    from tactilesr_tpu.runtime.trainer import Trainer

    tr = Trainer(
        model=None, variables={"params": {}}, tx=optax.sgd(0.1),
        lr_schedule=None, train_arrays={"x": np.zeros((4, 1))},
        batch_size=2, max_epochs=1, work_dir=str(tmp_path),
    )
    with pytest.raises(NotImplementedError, match="train_cal_loss"):
        tr.train_cal_loss(None, {"x": np.zeros((2, 1))}, True)


def test_eval_hook_rejects_non_scalar_results():
    from tactilesr_tpu.runtime.hooks.builtin import EvalHook

    hook = EvalHook(1, lambda: {"PSNR": "not-a-number"})
    with pytest.raises(AssertionError, match="must be a scalar"):
        hook._do_eval()
    # None result is allowed and a no-op even with no trainer attached
    EvalHook(1, lambda: None)._do_eval()


def test_sr_dataset_missing_file_message(tmp_path):
    from tactilesr_tpu.data.datasets import TactileSRDataset

    with pytest.raises(FileNotFoundError, match="tactilesr_tpu.data.generate"):
        TactileSRDataset(str(tmp_path / "nope.npz"))


def test_make_mesh_divisibility_guard():
    import jax

    from tactilesr_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    assert n == 8  # conftest forces the 8-device CPU mesh
    with pytest.raises(AssertionError, match="not divisible"):
        make_mesh(model_parallel=3)


def test_scalar_writer_jsonl_fallback(tmp_path, monkeypatch):
    """Images without tensorboard fall back to scalars.jsonl — force the
    import failure and exercise add_scalar/flush/close on that path."""
    import json as _json
    import sys

    for mod in list(sys.modules):
        if mod.startswith("tensorboard"):
            monkeypatch.delitem(sys.modules, mod)
    monkeypatch.setitem(sys.modules, "tensorboard", None)  # import -> error
    w = ScalarWriter(str(tmp_path / "tb"))
    assert w._impl is None and w._jsonl is not None
    w.add_scalar("loss", 0.5, 3)
    w.flush()
    w.close()
    lines = (tmp_path / "tb" / "scalars.jsonl").read_text().splitlines()
    assert _json.loads(lines[0]) == {"tag": "loss", "value": 0.5, "step": 3}


def test_config_parser_flag_typing_and_save_args(tmp_path):
    import argparse

    from tactilesr_tpu.config.parser import add_config_args, apply_overrides

    cfg = {"lr": 1e-3, "epochs": 5, "name": "x", "aug": False, "paths": [1]}
    p = argparse.ArgumentParser()
    add_config_args(p, cfg)  # list-valued key gets no flag
    args = p.parse_args(["--lr", "0.5", "--aug", "true", "--name", "y"])
    out = apply_overrides(cfg, args)
    assert out["lr"] == 0.5 and out["aug"] is True and out["name"] == "y"
    assert out["epochs"] == 5 and out["paths"] == [1]  # untouched
    with pytest.raises(SystemExit):
        p.parse_args(["--paths", "2"])  # non-scalar keys are not flags
    # save_args: yaml on process 0, no-op elsewhere
    f = tmp_path / "args.yaml"
    save_args(args, str(f), process_index=1)
    assert not f.exists()
    save_args(args, str(f), excluded_fields=["name"], process_index=0)
    import yaml

    loaded = yaml.safe_load(f.read_text())
    assert loaded["lr"] == 0.5 and "name" not in loaded


def test_collect_env_and_seed_fallbacks(monkeypatch):
    import sys

    from tactilesr_tpu.runtime.misc import collect_env, set_random_seed

    monkeypatch.delitem(sys.modules, "tabulate", raising=False)
    monkeypatch.setitem(sys.modules, "tabulate", None)  # import -> error
    report = collect_env()  # width-aligned plain fallback
    assert "jax" in report and "numpy" in report
    monkeypatch.setenv("XLA_FLAGS", "")
    s = set_random_seed(123, deterministic=True)
    assert s == 123
    assert "--xla_gpu_deterministic_ops" in os.environ["XLA_FLAGS"]


def test_device_burn_in_cpu():
    """test_device (the reference's test_gpu analogue, utility/tools.py:27-46)
    runs a timed matmul burn-in and reports a positive TFLOP/s figure."""
    from tactilesr_tpu.runtime.device import test_device

    tflops = test_device(test_time=0.3)
    assert tflops > 0
