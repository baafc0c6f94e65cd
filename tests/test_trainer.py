"""Trainer integration: learning progress, checkpoint round-trip/resume,
strict=False partial load, NaN detection, metric flush, torch-Adam parity."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tactilesr_tpu.runtime import (
    adam_l2,
    merge_pytree_strict_false,
    scale_updates_by_lr,
)
from tactilesr_tpu.tasks.sr_task import SRTrainer, build_eval_fn, build_model

from conftest import (  # shared toy-trainer scaffolding (one copy, no drift)
    make_toy_trainer as _make_trainer,
    toy_sr_config as _toy_config,
    toy_sr_data as _toy_data,
)


def test_training_reduces_loss(tmp_path, rng):
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    trainer = _make_trainer(cfg, lr, hr, max_epochs=4)
    trainer.register_hooks([])
    trainer.train(auto_resume=False)
    losses = trainer.metric_storage["total_loss"]
    assert losses.latest < losses.global_avg  # trending down
    assert os.path.exists(os.path.join(cfg["save_dir"], "checkpoints", "epoch_3.ckpt"))
    assert os.path.exists(os.path.join(cfg["save_dir"], "checkpoints", "latest.ckpt"))


def test_eval_and_resume(tmp_path, rng):
    cfg = _toy_config(str(tmp_path))
    lr, hr = _toy_data(rng)
    trainer = _make_trainer(cfg, lr, hr, max_epochs=2)
    eval_fn = build_eval_fn(trainer, {"LR": lr[:10], "HR": hr[:10]})
    from tactilesr_tpu.runtime.hooks import EvalHook

    trainer.register_hooks([EvalHook(1, eval_fn)])
    trainer.train(auto_resume=False)
    assert "test_PSNR" in trainer.metric_storage
    assert np.isfinite(trainer.metric_storage["test_PSNR"].latest)
    final_params = jax.device_get(trainer.state.params)

    # fresh trainer auto-resumes from latest.ckpt and continues
    trainer2 = _make_trainer(cfg, lr, hr, max_epochs=3, seed=7)
    trainer2.train(auto_resume=True)
    assert trainer2.start_iter == 2 * trainer2.epoch_len
    # resumed params must have evolved from (not equal) the loaded snapshot
    p0 = jax.tree_util.tree_leaves(final_params)[0]
    p1 = jax.tree_util.tree_leaves(jax.device_get(trainer2.state.params))[0]
    assert not np.allclose(p0, p1)


def test_checkpoint_strict_false_merge():
    cur = {"a": np.zeros(3), "b": {"c": np.ones(2)}}
    loaded = {"a": np.full(3, 5.0), "b": {"d": np.ones(1)}, "e": np.zeros(1)}
    merged, missing, unexpected = merge_pytree_strict_false(cur, loaded)
    np.testing.assert_array_equal(merged["a"], 5.0)
    np.testing.assert_array_equal(merged["b"]["c"], 1.0)
    assert missing == ["b/c"]
    assert set(unexpected) == {"b/d", "e"}
    # shape mismatch -> skipped, reported unexpected
    merged2, _, unexpected2 = merge_pytree_strict_false(
        {"a": np.zeros(3)}, {"a": np.zeros(4)}
    )
    assert merged2["a"].shape == (3,)
    assert "a" in unexpected2
    # empty subtrees survive the round trip (tPSFNet state carries
    # batch_stats == {}; dropping the key crashed every tPSF resume)
    cur3 = {"params": {"a": np.zeros(2)}, "batch_stats": {}}
    merged3, missing3, unexpected3 = merge_pytree_strict_false(
        cur3, {"params": {"a": np.ones(2)}, "batch_stats": {}}
    )
    assert merged3["batch_stats"] == {} and missing3 == [] and unexpected3 == []
    np.testing.assert_array_equal(merged3["params"]["a"], 1.0)


def test_nan_loss_raises(tmp_path, rng):
    cfg = _toy_config(str(tmp_path), lr=1e38)  # absurd lr forces non-finite loss
    lr, hr = _toy_data(rng)
    trainer = _make_trainer(cfg, lr, hr, max_epochs=2)
    with pytest.raises(FloatingPointError):
        trainer.train(auto_resume=False)


def test_adam_l2_matches_torch_adam(rng):
    """Our optax chain == torch.optim.Adam with coupled weight decay."""
    import torch

    w0 = rng.standard_normal((5, 4)).astype(np.float32)
    grads_seq = [rng.standard_normal((5, 4)).astype(np.float32) for _ in range(5)]
    lr, wd = 1e-2, 1e-2

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads_seq:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = adam_l2(weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads_seq:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        updates = scale_updates_by_lr(updates, lr)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-4, atol=1e-6
    )


def test_scan_epochs_matches_per_iter_trajectory(tmp_path, rng):
    """Epoch-scan mode must reproduce the per-iter trajectory exactly
    (same seed => same permutations => same updates)."""
    lr, hr = _toy_data(rng)

    cfg_a = _toy_config(str(tmp_path / "a"))
    ta = _make_trainer(cfg_a, lr, hr, max_epochs=2)
    ta.train(auto_resume=False)

    cfg_b = _toy_config(str(tmp_path / "b"))
    model = build_model(cfg_b)
    variables = jax.device_get(
        model.init(jax.random.key(42), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR

    tb = SRTrainer(
        config=cfg_b,
        model=model,
        variables={
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
        tx=adam_l2(weight_decay=cfg_b["weight_decay"]),
        lr_schedule=LRWarmupSchedule(
            StepLR(cfg_b["lr"], cfg_b["lr_scheduler_step_size"], cfg_b["lr_scheduler_gamma"]),
            by_epoch=True,
            epoch_len=-(-lr.shape[0] // cfg_b["train_batch_size"]),
        ),
        train_arrays={"LR": lr, "HR": hr},
        batch_size=cfg_b["train_batch_size"],
        max_epochs=2,
        work_dir=cfg_b["save_dir"],
        seed=42,
        scan_epochs=True,
    )
    tb.train(auto_resume=False)

    la = ta.metric_storage["total_loss"]
    lb = tb.metric_storage["total_loss"]
    assert len(la) == len(lb)
    np.testing.assert_allclose(la.latest, lb.latest, rtol=1e-4)
    pa = jax.tree_util.tree_leaves(jax.device_get(ta.state.params))[0]
    pb = jax.tree_util.tree_leaves(jax.device_get(tb.state.params))[0]
    np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-6)
    # checkpoints written per epoch in scan mode too
    assert os.path.exists(os.path.join(cfg_b["save_dir"], "checkpoints", "epoch_1.ckpt"))


def test_remat_matches_plain_trajectory(tmp_path, rng):
    """remat=True (jax.checkpoint on the loss) recomputes the forward in the
    backward pass -- a pure memory/FLOPs trade that must not change the
    math.  Train twice from the same seed and compare trajectories and
    final params."""
    lr, hr = _toy_data(rng)

    ta = _make_trainer(_toy_config(str(tmp_path / "a")), lr, hr, max_epochs=2)
    ta.train(auto_resume=False)

    tb = _make_trainer(
        _toy_config(str(tmp_path / "b")), lr, hr, max_epochs=2, remat=True
    )
    tb.train(auto_resume=False)

    la = ta.metric_storage["total_loss"]
    lb = tb.metric_storage["total_loss"]
    assert len(la) == len(lb)
    np.testing.assert_allclose(la.latest, lb.latest, rtol=1e-5)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(jax.device_get(ta.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(tb.state.params)),
    ):
        np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-6)

    # scan mode composes with remat (lax.scan over checkpointed steps)
    tc = _make_trainer(
        _toy_config(str(tmp_path / "c")),
        lr,
        hr,
        max_epochs=2,
        remat=True,
        scan_epochs=True,
    )
    tc.train(auto_resume=False)
    np.testing.assert_allclose(
        tc.metric_storage["total_loss"].latest, la.latest, rtol=1e-4
    )


def test_scan_epochs_resume(tmp_path, rng):
    """Scan-mode auto-resume continues from the epoch boundary."""
    lr, hr = _toy_data(rng)
    cfg = _toy_config(str(tmp_path))

    t1 = _make_trainer(cfg, lr, hr, max_epochs=2)
    t1.scan_epochs = True
    t1.train(auto_resume=False)

    t2 = _make_trainer(cfg, lr, hr, max_epochs=4, seed=5)
    t2.scan_epochs = True
    t2.train(auto_resume=True)
    assert t2.start_iter == 2 * t2.epoch_len
    assert len(t2.metric_storage["total_loss"]) == 4 * t2.epoch_len


def test_bf16_compute_trains(tmp_path, rng):
    """compute_dtype=bfloat16 (the TPU default policy) learns on CPU too."""
    cfg = _toy_config(str(tmp_path), compute_dtype="bfloat16")
    lr, hr = _toy_data(rng)
    trainer = _make_trainer(cfg, lr, hr, max_epochs=3)
    trainer.train(auto_resume=False)
    losses = trainer.metric_storage["total_loss"]
    assert np.isfinite(losses.latest)
    assert losses.latest < losses.global_avg


def test_dataset_smaller_than_batch(tmp_path, rng):
    """n < batch_size: single padded batch per epoch, masked loss exact."""
    cfg = _toy_config(str(tmp_path), train_batch_size=16)
    lr, hr = _toy_data(rng, n=5)
    trainer = _make_trainer(cfg, lr, hr, max_epochs=2)
    assert trainer.epoch_len == 1
    trainer.train(auto_resume=False)
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)


def test_seqs_warmup_gate(tmp_path):
    """Parity gate: the seqs (MTSR) recipe wires NO warmup unless
    seqs_use_warmup=true opts in (the reference's seqs entry passes no
    warmup args; tasks/sr_task.py:355-360)."""
    import numpy as np

    from tactilesr_tpu.config.default import tactileSeqs_config
    from tactilesr_tpu.tasks import sr_task

    rng = np.random.default_rng(0)
    lr_arr = (rng.random((8, 21, 4, 4)) * 4).astype(np.float32)
    hr = 6.0 * np.repeat(np.repeat(lr_arr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    npz = str(tmp_path / "seqs.npz")
    np.savez(npz, LR=lr_arr, HR=hr)

    def run(tag, **extra):
        cfg = dict(tactileSeqs_config)
        cfg.update(
            train_dataset_dir=npz,
            test_dataset_dir=npz,
            save_dir=str(tmp_path / tag),
            load_checkpoint_dir=str(tmp_path / "missing.ckpt"),  # from scratch
            train_batch_size=8,
            test_batch_size=8,
            patternFeatureExtraLayerCnt=1,
            forceFeatureExtraLayerCnt=1,
            scale_factor=4,
            warmup_t=100,
            warmup_mode="fix",
            warmup_init_lr=1e-9,
            compute_dtype="float32",
            inference_test=False,
            **extra,
        )
        trainer = sr_task.main(cfg, seqs=True, max_epochs=1)
        return trainer.metric_storage["lr"].latest, cfg["lr"]

    lr_off, base = run("off")
    assert lr_off == pytest.approx(base)  # warmup ignored by default

    lr_on, base = run("on", seqs_use_warmup=True)
    assert lr_on < base  # inside the 100-iter warmup ramp after 1 iter
