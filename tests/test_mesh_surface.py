"""The product surface reaches multi-device training: the ``data_parallel``
config knob resolves to a mesh inside the task mains (VERDICT r1 item 1),
batch divisibility fails fast, and sharded evaluation runs over the mesh."""


import numpy as np
import pytest

import jax

from tactilesr_tpu.config.default import tactileSR_config
from tactilesr_tpu.parallel import make_mesh, resolve_mesh
from tactilesr_tpu.tasks import sr_task


def test_resolve_mesh_auto_uses_all_devices():
    mesh = resolve_mesh("auto", batch_size=32)
    assert mesh is not None
    assert mesh.shape["data"] == jax.device_count()


def test_resolve_mesh_auto_shrinks_to_batch_divisor():
    # 30 % 8 != 0 -> largest divisor <= 8 is 6
    mesh = resolve_mesh("auto", batch_size=30)
    assert mesh is not None
    assert mesh.shape["data"] == 6


def test_resolve_mesh_off_and_one():
    assert resolve_mesh("off") is None
    assert resolve_mesh(0) is None
    assert resolve_mesh(1) is None
    assert resolve_mesh(None) is None
    # auto with a prime batch smaller than any divisor >1
    assert resolve_mesh("auto", batch_size=7) is None or (
        7 % resolve_mesh("auto", batch_size=7).shape["data"] == 0
    )


def test_resolve_mesh_bool_true_means_auto():
    # regression: True == 1 must NOT match the disable-tuple
    mesh = resolve_mesh(True, batch_size=16)
    assert mesh is not None and mesh.shape["data"] > 1
    assert resolve_mesh(False) is None
    # CLI string synonyms must not crash int() parsing
    assert resolve_mesh("true", batch_size=16).shape["data"] > 1
    assert resolve_mesh("ON", batch_size=16).shape["data"] > 1
    assert resolve_mesh("false") is None
    assert resolve_mesh("OFF") is None


def test_pallas_physics_shard_maps_over_mesh():
    """pallas_call is not GSPMD-partitionable; under a mesh the physics runs
    through shard_map so each device computes only its local batch shard.
    Asserts (a) numerical equality with the XLA path, (b) the output stays
    batch-sharded (no all-gather-and-replicate)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tactilesr_tpu.ops.psf import tpsf_forward_physics
    from tactilesr_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(jax.devices())
    rng = np.random.default_rng(0)
    b = 16
    depth = (rng.random((b, 100, 100)) * 3).astype(np.float32)
    abm = (rng.random((b, 3)) + 0.5).astype(np.float32)
    sh = batch_sharding(mesh)
    depth_s = jax.device_put(jnp.asarray(depth), sh)
    abm_s = jax.device_put(jnp.asarray(abm), sh)

    @jax.jit
    def pallas_path(d, a):
        hr, lr, _ = tpsf_forward_physics(
            d, a, return_psf=False, use_pallas=True, mesh=mesh
        )
        return hr, lr

    hr_p, lr_p = pallas_path(depth_s, abm_s)
    hr_x, lr_x, _ = tpsf_forward_physics(
        jnp.asarray(depth), jnp.asarray(abm), return_psf=False
    )
    np.testing.assert_allclose(np.asarray(hr_p), np.asarray(hr_x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lr_p), np.asarray(lr_x), rtol=1e-4, atol=1e-6)
    spec = hr_p.sharding.spec
    assert spec and spec[0] == "data", f"HR not batch-sharded: {spec}"


def test_pallas_physics_mesh_fallback_small_batch():
    """init/eval call with batches (down to 1) that don't divide the data
    axis; the mesh path must fall back to the plain kernel, not raise."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.ops.psf import tpsf_forward_physics
    from tactilesr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices())
    rng = np.random.default_rng(2)
    for b in (1, 3):
        depth = jnp.asarray((rng.random((b, 100, 100)) * 3).astype(np.float32))
        abm = jnp.asarray((rng.random((b, 3)) + 0.5).astype(np.float32))
        hr, lr, _ = tpsf_forward_physics(
            depth, abm, return_psf=False, use_pallas=True, mesh=mesh
        )
        hr_x, lr_x, _ = tpsf_forward_physics(depth, abm, return_psf=False)
        np.testing.assert_allclose(np.asarray(hr), np.asarray(hr_x), rtol=1e-4, atol=1e-4)


def test_pallas_physics_grad_under_mesh():
    """The custom_vjp backward (XLA recompute) must also shard."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.ops.psf import tpsf_forward_physics
    from tactilesr_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(jax.devices())
    rng = np.random.default_rng(1)
    b = 8
    depth = jnp.asarray((rng.random((b, 100, 100)) * 3).astype(np.float32))
    abm = jnp.asarray((rng.random((b, 3)) + 0.5).astype(np.float32))
    sh = batch_sharding(mesh)

    def loss(a, d, use_pallas, m):
        hr, lr, _ = tpsf_forward_physics(
            d, a, return_psf=False, use_pallas=use_pallas, mesh=m
        )
        return jnp.sum(lr**2) + 1e-6 * jnp.sum(hr)

    g_p = jax.jit(jax.grad(lambda a, d: loss(a, d, True, mesh)))(
        jax.device_put(abm, sh), jax.device_put(depth, sh)
    )
    g_x = jax.grad(lambda a, d: loss(a, d, False, None))(abm, depth)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-3, atol=1e-6)


def test_resolve_mesh_explicit_int():
    mesh = resolve_mesh(4, batch_size=32)
    assert mesh.shape["data"] == 4
    with pytest.raises(AssertionError):
        resolve_mesh(jax.device_count() + 1)
    with pytest.raises(AssertionError):
        resolve_mesh(4, batch_size=30)  # explicit request must divide


def test_trainer_rejects_indivisible_batch(tmp_path, rng):
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model

    cfg = dict(tactileSR_config)
    cfg.update(
        train_batch_size=9,  # 9 % 8 != 0
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        compute_dtype="float32",
    )
    lr = rng.random((18, 3, 4, 4)).astype(np.float32)
    hr = rng.random((18, 1, 100, 100)).astype(np.float32)
    model = build_model(cfg)
    import jax.numpy as jnp

    variables = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    with pytest.raises(AssertionError, match="divisible"):
        SRTrainer(
            config=cfg,
            model=model,
            variables={
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            tx=adam_l2(weight_decay=0.0),
            lr_schedule=LRWarmupSchedule(
                StepLR(1e-3, 2, 0.8), by_epoch=True, epoch_len=2
            ),
            train_arrays={"LR": lr, "HR": hr},
            batch_size=9,
            max_epochs=1,
            work_dir=str(tmp_path / "work"),
            mesh=make_mesh(),
        )


def _tiny_sr_npz(path, n, rng):
    lr = (rng.random((n, 3, 4, 4)) * 4).astype(np.float32)
    hr = np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    np.savez(path, LR=lr, HR=hr)
    return str(path)


def test_main_builds_mesh_from_config_and_trains(tmp_path, rng):
    """`python train/tactileSR_train.py` semantics: data_parallel=auto in the
    default config gives the recipe a mesh with no user code."""
    train_npz = _tiny_sr_npz(tmp_path / "train.npz", 32, rng)
    test_npz = _tiny_sr_npz(tmp_path / "test.npz", 16, rng)

    cfg = dict(tactileSR_config)
    cfg.update(
        train_dataset_dir=train_npz,
        test_dataset_dir=test_npz,
        save_dir=str(tmp_path / "work"),
        train_batch_size=16,
        test_batch_size=8,  # divisible by the 8-device data axis -> sharded eval
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        warmup_t=0,
        compute_dtype="float32",
        inference_test=False,
        data_parallel="auto",
    )
    trainer = sr_task.main(cfg, max_epochs=1)
    assert trainer.mesh is not None
    assert trainer.mesh.shape["data"] == jax.device_count()
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)
    assert np.isfinite(trainer.metric_storage["test_PSNR"].latest)
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_main_data_parallel_off(tmp_path, rng):
    train_npz = _tiny_sr_npz(tmp_path / "train.npz", 16, rng)
    test_npz = _tiny_sr_npz(tmp_path / "test.npz", 8, rng)
    cfg = dict(tactileSR_config)
    cfg.update(
        train_dataset_dir=train_npz,
        test_dataset_dir=test_npz,
        save_dir=str(tmp_path / "work"),
        train_batch_size=8,
        test_batch_size=4,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        warmup_t=0,
        compute_dtype="float32",
        inference_test=False,
        data_parallel="off",
    )
    trainer = sr_task.main(cfg, max_epochs=1)
    assert trainer.mesh is None


def test_sharded_eval_matches_unsharded(tmp_path, rng):
    """PSNR/SSIM from the mesh-sharded eval equal the single-device eval."""
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_eval_fn, build_model
    import jax.numpy as jnp

    cfg = dict(tactileSR_config)
    cfg.update(
        train_batch_size=16,
        test_batch_size=8,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        compute_dtype="float32",
    )
    lr = (rng.random((32, 3, 4, 4)) * 4).astype(np.float32)
    hr = np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    test_arrays = {"LR": lr[:20], "HR": hr[:20]}  # padded final batch too

    def mk(mesh, sub):
        model = build_model(cfg)
        variables = jax.device_get(
            model.init(jax.random.key(7), jnp.zeros((1, 3, 4, 4)), train=False)
        )
        return SRTrainer(
            config=cfg,
            model=model,
            variables={
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            tx=adam_l2(weight_decay=0.0),
            lr_schedule=LRWarmupSchedule(
                StepLR(1e-3, 2, 0.8), by_epoch=True, epoch_len=2
            ),
            train_arrays={"LR": lr, "HR": hr},
            batch_size=16,
            max_epochs=1,
            work_dir=str(tmp_path / sub),
            mesh=mesh,
        )

    r_single = mk(None, "single")
    r_mesh = mk(make_mesh(), "mesh")
    e_single = build_eval_fn(r_single, test_arrays)()
    e_mesh = build_eval_fn(r_mesh, test_arrays)()
    for k in e_single:
        np.testing.assert_allclose(e_single[k], e_mesh[k], rtol=1e-5, atol=1e-6)


def test_history_buffer_empty_raises_clear_error():
    from tactilesr_tpu.runtime.history import HistoryBuffer

    buf = HistoryBuffer()
    with pytest.raises(ValueError, match="empty"):
        buf.latest
    with pytest.raises(ValueError, match="empty"):
        buf.avg


# ------------------------------------------------- multi-process mesh layout
class _FakeDev:
    """Stand-in device with a process_index (a mesh layout concern only --
    make_mesh is monkeypatched, so no jax Device API is needed)."""

    def __init__(self, pid, i):
        self.process_index = pid
        self.id = i

    def __repr__(self):
        return f"d{self.process_index}.{self.id}"


def test_resolve_mesh_multiprocess_spans_every_process(monkeypatch):
    """Shrunken/explicit meshes must take devices evenly from EVERY process:
    a mesh omitting some process leaves it with no addressable shards
    (put_global raises there; survivors hang in the first collective)."""
    import tactilesr_tpu.parallel.mesh as M

    devs = [_FakeDev(p, p * 4 + i) for p in range(2) for i in range(4)]
    captured = {}

    def fake_make_mesh(ds):
        captured["ds"] = list(ds)
        return "MESH"

    monkeypatch.setattr(M, "make_mesh", fake_make_mesh)

    # auto with batch 4: shrink 8 -> 4, two devices from each process
    assert M.resolve_mesh("auto", batch_size=4, devices=devs) == "MESH"
    pids = [d.process_index for d in captured["ds"]]
    assert len(pids) == 4 and pids.count(0) == 2 and pids.count(1) == 2

    # explicit 4 over 2 processes: even split too
    captured.clear()
    M.resolve_mesh(4, batch_size=8, devices=devs)
    pids = [d.process_index for d in captured["ds"]]
    assert pids.count(0) == 2 and pids.count(1) == 2


def test_resolve_mesh_multiprocess_fails_loud(monkeypatch):
    import tactilesr_tpu.parallel.mesh as M

    monkeypatch.setattr(M, "make_mesh", lambda ds: "MESH")
    devs = [_FakeDev(p, p * 4 + i) for p in range(2) for i in range(4)]

    # an odd explicit count cannot be laid out evenly over 2 processes
    with pytest.raises(ValueError, match="processes"):
        M.resolve_mesh(3, batch_size=6, devices=devs)
    # auto with a batch no multiple of nproc divides: no silent fallback
    with pytest.raises(ValueError, match="divisible batch"):
        M.resolve_mesh("auto", batch_size=7, devices=devs)


def test_resolve_mesh_single_process_shrink_unchanged(monkeypatch):
    """Single-process semantics are untouched: largest divisor of the batch."""
    import tactilesr_tpu.parallel.mesh as M

    captured = {}
    monkeypatch.setattr(
        M, "make_mesh", lambda ds: captured.update(n=len(list(ds))) or "MESH"
    )
    devs = [_FakeDev(0, i) for i in range(8)]
    assert M.resolve_mesh("auto", batch_size=30, devices=devs) == "MESH"
    assert captured["n"] == 6


def test_eval_indivisible_batch_falls_back_replicated(tmp_path, rng):
    """test_batch_size not divisible by the data axis: eval falls back to a
    REPLICATED (put_global) placement -- still correct, and built the
    multi-process-safe way (plain jnp.asarray would create process-local
    arrays jit rejects next to global params on a spanning mesh)."""
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_eval_fn, build_model
    import jax.numpy as jnp

    cfg = dict(tactileSR_config)
    cfg.update(
        train_batch_size=16,
        test_batch_size=6,  # 6 % 8 devices != 0 -> fallback branch
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        compute_dtype="float32",
    )
    lr = (rng.random((32, 3, 4, 4)) * 4).astype(np.float32)
    hr = np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    test_arrays = {"LR": lr[:20], "HR": hr[:20]}

    def mk(mesh, sub):
        model = build_model(cfg)
        variables = jax.device_get(
            model.init(jax.random.key(7), jnp.zeros((1, 3, 4, 4)), train=False)
        )
        return SRTrainer(
            config=cfg,
            model=model,
            variables={
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            tx=adam_l2(weight_decay=0.0),
            lr_schedule=LRWarmupSchedule(
                StepLR(1e-3, 2, 0.8), by_epoch=True, epoch_len=2
            ),
            train_arrays={"LR": lr, "HR": hr},
            batch_size=16,
            max_epochs=1,
            work_dir=str(tmp_path / sub),
            mesh=mesh,
        )

    e_single = build_eval_fn(mk(None, "single"), test_arrays)()
    e_mesh = build_eval_fn(mk(make_mesh(), "mesh"), test_arrays)()
    for k in e_single:
        np.testing.assert_allclose(e_single[k], e_mesh[k], rtol=1e-5, atol=1e-6)
