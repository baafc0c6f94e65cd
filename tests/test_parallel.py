"""Multi-device data parallelism over the virtual 8-device CPU mesh:
sharded-batch training step, replicated state, loss parity with single-device."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tactilesr_tpu.config.default import tactileSR_config
from tactilesr_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch_size,
)
from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model


def _cfg(tmp_dir):
    cfg = dict(tactileSR_config)
    cfg.update(
        save_dir=os.path.join(tmp_dir, "work"),
        train_batch_size=8,
        test_batch_size=4,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        warmup_t=0,
        compute_dtype="float32",
        inference_test=False,
    )
    return cfg


def _trainer(cfg, lr, hr, mesh, max_epochs=2, seed=3):
    model = build_model(cfg)
    variables = jax.device_get(
        model.init(jax.random.key(seed), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    return SRTrainer(
        config=cfg,
        model=model,
        variables={
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
        tx=adam_l2(weight_decay=cfg["weight_decay"]),
        lr_schedule=LRWarmupSchedule(
            StepLR(cfg["lr"], 2, 0.8), by_epoch=True,
            epoch_len=-(-lr.shape[0] // cfg["train_batch_size"]),
        ),
        train_arrays={"LR": lr, "HR": hr},
        batch_size=cfg["train_batch_size"],
        max_epochs=max_epochs,
        work_dir=cfg["save_dir"],
        mesh=mesh,
        seed=seed,
    )


def test_mesh_construction():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape["data"] == jax.device_count()
    assert mesh.shape["model"] == 1
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape["data"] * 2 == jax.device_count()
    assert shard_batch_size(32, mesh) == 32 // jax.device_count()
    with pytest.raises(AssertionError):
        shard_batch_size(9, mesh)


def test_dp_training_runs_and_matches_single_device(tmp_path, rng):
    lr = (rng.random((32, 3, 4, 4)) * 4).astype(np.float32)
    hr = np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)

    cfg1 = _cfg(str(tmp_path / "single"))
    t1 = _trainer(cfg1, lr, hr, mesh=None)
    t1.train(auto_resume=False)

    cfg8 = _cfg(str(tmp_path / "dp8"))
    mesh = make_mesh()
    t8 = _trainer(cfg8, lr, hr, mesh=mesh)
    t8.train(auto_resume=False)

    # same seed => same batch order => numerically near-identical trajectories
    l1 = t1.metric_storage["total_loss"].latest
    l8 = t8.metric_storage["total_loss"].latest
    np.testing.assert_allclose(l1, l8, rtol=2e-3, atol=1e-5)

    # batch sharding really shards: an index batch put with the sharding
    # spreads over all devices
    idx = jax.device_put(jnp.arange(8), batch_sharding(mesh))
    assert len(idx.sharding.device_set) == jax.device_count()
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(t8.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_tpsf_dp_training_runs(tmp_path, rng):
    """tPSF stage under the 8-device mesh: one epoch, finite loss."""
    from tactilesr_tpu.config.default import tPSFNet_config
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.tasks.tpsf_task import TPSFTrainer, build_model
    import jax
    import jax.numpy as jnp

    cfg = dict(tPSFNet_config)
    cfg.update(
        save_dir=str(tmp_path / "work"),
        train_batch_size=16,
        compute_dtype="float32",
    )
    n = 32
    lr = (rng.random((n, 3, 4, 4)) * 4).astype(np.float32)
    depth = np.zeros((n, 100, 100), np.float32)
    depth[:, 30:60, 30:70] = 1.0
    model = build_model(cfg)
    v = jax.device_get(
        model.init(
            jax.random.key(0), jnp.zeros((1, 3, 4, 4)),
            jnp.zeros((1, 1, 100, 100)), return_psf=False,
        )
    )
    trainer = TPSFTrainer(
        config=cfg,
        model=model,
        variables={"params": v["params"], "batch_stats": {}},
        tx=adam_l2(weight_decay=1e-5),
        lr_schedule=LRWarmupSchedule(StepLR(1e-4, 1, 0.8), by_epoch=True, epoch_len=2),
        train_arrays={"LR": lr, "depth": depth},
        batch_size=16,
        max_epochs=1,
        work_dir=cfg["save_dir"],
        mesh=make_mesh(),
    )
    trainer.train(auto_resume=False)
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)


def test_scan_epochs_under_mesh(tmp_path, rng):
    """Epoch-scan mode composes with the 8-device DP mesh."""
    lr = (rng.random((32, 3, 4, 4)) * 4).astype(np.float32)
    hr = np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    cfg = _cfg(str(tmp_path / "scan_dp"))
    mesh = make_mesh()
    t = _trainer(cfg, lr, hr, mesh=mesh, max_epochs=2)
    t.scan_epochs = True
    t.train(auto_resume=False)
    assert np.isfinite(t.metric_storage["total_loss"].latest)
    leaf = jax.tree_util.tree_leaves(t.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_put_global_matches_device_put_single_process():
    """put_global must be value- and sharding-equivalent to device_put in the
    single-process case (the multi-process construction is exercised by the
    real 2-process cluster in test_dist_multiprocess)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tactilesr_tpu.parallel.mesh import batch_sharding, put_global, replicated_sharding

    mesh = make_mesh()
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    for sh in (replicated_sharding(mesh), batch_sharding(mesh), NamedSharding(mesh, P(None, "data"))):
        a = put_global(x, sh)
        b = jax.device_put(x, sh)
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # pytree + no-sharding fallthrough
    tree = put_global({"w": x, "b": np.float32(2.0)}, replicated_sharding(mesh))
    assert jax.tree_util.tree_leaves(tree)[0].sharding.is_fully_replicated
    none_case = put_global(x, None)
    np.testing.assert_array_equal(np.asarray(none_case), x)
