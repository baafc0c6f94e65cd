"""Serving: checkpoint load, bucketed batched prediction, padding behavior."""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file
from tactilesr_tpu.serving import SRPredictor
from tactilesr_tpu.models.tactile_sr import TactileSR


def _make_ckpt(tmp_path, pattern_layers=1):
    from conftest import make_sr_checkpoint

    return make_sr_checkpoint(
        tmp_path / "model.ckpt", pattern_layers=pattern_layers
    )


def test_predict_shapes_and_bucketing(tmp_path, rng):
    ckpt = _make_ckpt(tmp_path)
    pred = SRPredictor(
        ckpt, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4, 16),
    )
    pred.warmup()
    # 10 frames -> one 16-bucket call with padding; result unpadded
    lr = (rng.random((10, 3, 4, 4)) * 4).astype(np.float32)
    out = pred.predict(lr)
    assert out.shape == (10, 1, 16, 16)
    # padding must not leak into results: single-frame == batched row 0
    out1 = pred.predict(lr[:1])
    np.testing.assert_allclose(out1[0], out[0], rtol=1e-5, atol=1e-5)
    # shape validation raises ValueError (not assert: survives python -O)
    with pytest.raises(ValueError, match="expected"):
        pred.predict(np.zeros((2, 5, 4, 4), np.float32))


def test_predict_more_than_max_bucket(tmp_path, rng):
    ckpt = _make_ckpt(tmp_path)
    pred = SRPredictor(
        ckpt, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    lr = (rng.random((9, 3, 4, 4)) * 4).astype(np.float32)
    out = pred.predict(lr)  # 3 chunks of 4 (last padded)
    assert out.shape == (9, 1, 16, 16)


def test_predictor_mtsr_seqs7(tmp_path, rng):
    """MTSR serving: seqs_cnt=7 (the reference's maximum), fused vs training
    graph."""
    model = TactileSR(
        scale_factor=4, seqs_cnt=7, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
    )
    v = jax.device_get(
        model.init(jax.random.key(7), jnp.zeros((1, 21, 4, 4)), train=False)
    )
    path = str(tmp_path / "mtsr.ckpt")
    save_checkpoint_file(
        path,
        {
            "num_devices": 1,
            "model": {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            "epoch": 0,
        },
    )
    kw = dict(
        scale_factor=4, seqs_cnt=7, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    pred = SRPredictor(path, **kw)
    pred_ref = SRPredictor(path, fused=False, **kw)
    lr = (rng.random((4, 21, 4, 4)) * 4).astype(np.float32)
    out = pred.predict(lr)
    assert out.shape == (4, 1, 16, 16)
    np.testing.assert_allclose(out, pred_ref.predict(lr), rtol=1e-4, atol=1e-4)


def test_reload_checkpoint_hot_swap(tmp_path, rng):
    """Weight hot-swap: same-architecture reload changes outputs without
    recompiling; a mismatched reload raises and keeps the old weights."""
    import pytest

    ckpt_a = _make_ckpt(tmp_path, pattern_layers=1)
    # a second checkpoint with different weights (different init key)
    model = TactileSR(
        scale_factor=4, seqs_cnt=1, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
    )
    v2 = jax.device_get(
        model.init(jax.random.key(99), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    ckpt_b = str(tmp_path / "model_b.ckpt")
    save_checkpoint_file(
        ckpt_b,
        {
            "num_devices": 1,
            "model": {"params": v2["params"], "batch_stats": v2.get("batch_stats", {})},
            "epoch": 0,
        },
    )
    bad = _make_ckpt(tmp_path / "bad", pattern_layers=2)

    pred = SRPredictor(
        ckpt_a, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    x = (rng.random((4, 3, 4, 4)) * 4).astype(np.float32)
    out_a = pred.predict(x)
    from tactilesr_tpu.models.inference import tactile_sr_infer

    cache_before = tactile_sr_infer._cache_size()
    pred.reload_checkpoint(ckpt_b)
    out_b = pred.predict(x)
    # the core promise: same executables, new weights (no retrace/recompile)
    assert tactile_sr_infer._cache_size() == cache_before
    assert np.abs(out_a - out_b).max() > 1e-4  # weights actually changed
    # matches a fresh predictor on ckpt_b
    fresh = SRPredictor(
        ckpt_b, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    np.testing.assert_allclose(out_b, fresh.predict(x), rtol=1e-6, atol=1e-6)
    # mismatched reload refuses and keeps serving the old weights
    with pytest.raises(ValueError):
        pred.reload_checkpoint(bad)
    np.testing.assert_allclose(pred.predict(x), out_b, rtol=1e-6, atol=1e-6)

    # the literal-training-graph path validates reloads too
    pred_raw = SRPredictor(
        ckpt_a, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,), fused=False,
    )
    raw_a = pred_raw.predict(x)
    pred_raw.reload_checkpoint(ckpt_b)
    np.testing.assert_allclose(
        pred_raw.predict(x), out_b, rtol=1e-5, atol=1e-5
    )
    with pytest.raises(ValueError, match="previous weights keep serving"):
        pred_raw.reload_checkpoint(bad)
    np.testing.assert_allclose(
        pred_raw.predict(x), out_b, rtol=1e-5, atol=1e-5
    )
    del raw_a


def test_reload_shape_mismatch_fused_path(tmp_path, rng):
    """A checkpoint that FOLDS successfully (same module names) but with
    different tensor shapes (here: axis_cnt=1 vs 3) must be refused by the
    fused reload -- otherwise the next predict recompiles (breaking the
    no-recompile hot-swap contract) with the old weights already gone."""
    import pytest

    ckpt_a = _make_ckpt(tmp_path, pattern_layers=1)
    # same architecture knobs, but trained with a single force axis:
    # every module name matches, so folding alone cannot catch it
    model1 = TactileSR(
        scale_factor=4, seqs_cnt=1, axis_cnt=1,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
    )
    v1 = jax.device_get(
        model1.init(jax.random.key(3), jnp.zeros((1, 1, 4, 4)), train=False)
    )
    ckpt_ax1 = str(tmp_path / "ax1.ckpt")
    save_checkpoint_file(
        ckpt_ax1,
        {
            "num_devices": 1,
            "model": {"params": v1["params"], "batch_stats": v1.get("batch_stats", {})},
            "epoch": 0,
        },
    )
    pred = SRPredictor(
        ckpt_a, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    x = (rng.random((4, 3, 4, 4)) * 4).astype(np.float32)
    out_a = pred.predict(x)
    with pytest.raises(ValueError, match="previous weights keep serving"):
        pred.reload_checkpoint(ckpt_ax1)
    np.testing.assert_allclose(pred.predict(x), out_a, rtol=1e-6, atol=1e-6)


def test_hot_swap_under_concurrent_predict(tmp_path, rng):
    """Atomicity of hot-swap under concurrency: a reader thread streams
    predict() while the main thread flips between two checkpoints.  Every
    output must equal exactly one checkpoint's output -- never a mix."""
    import threading

    ckpt_a = _make_ckpt(tmp_path, pattern_layers=1)
    model = TactileSR(
        scale_factor=4, seqs_cnt=1, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
    )
    v2 = jax.device_get(
        model.init(jax.random.key(99), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    ckpt_b = str(tmp_path / "model_b.ckpt")
    save_checkpoint_file(
        ckpt_b,
        {
            "num_devices": 1,
            "model": {"params": v2["params"], "batch_stats": v2.get("batch_stats", {})},
            "epoch": 0,
        },
    )
    pred = SRPredictor(
        ckpt_a, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    pred.warmup()
    # 6 frames over a 4-bucket -> each predict() is TWO forward chunks, so a
    # mid-request swap would visibly mix checkpoints if the per-request
    # snapshot were broken
    x = (rng.random((6, 3, 4, 4)) * 4).astype(np.float32)
    want_a = pred.predict(x)
    fresh_b = SRPredictor(
        ckpt_b, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    want_b = fresh_b.predict(x)
    assert np.abs(want_a - want_b).max() > 1e-4

    outputs, errors = [], []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                outputs.append(pred.predict(x))
        except Exception as e:  # pragma: no cover - failure diagnostics
            errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    for _ in range(30):
        pred.reload_checkpoint(ckpt_b)
        pred.reload_checkpoint(ckpt_a)
    pred.reload_checkpoint(ckpt_b)
    stop.set()
    t.join(timeout=60)
    assert not t.is_alive() and not errors
    assert len(outputs) >= 3, "reader thread barely ran; weaken the swap loop"
    for out in outputs:
        da = np.abs(out - want_a).max()
        db = np.abs(out - want_b).max()
        assert min(da, db) < 1e-5, (
            f"output matches neither checkpoint (|d_a|={da}, |d_b|={db}): "
            "hot-swap mixed weights mid-request"
        )


def test_arch_mismatch_raises_clear_error(tmp_path):
    """Serving a checkpoint with the wrong architecture knobs should name
    the knobs, not die with a bare KeyError."""
    import pytest

    ckpt = _make_ckpt(tmp_path, pattern_layers=1)
    with pytest.raises(KeyError, match="model_arch.*pattern_layers"):
        SRPredictor(
            ckpt, scale_factor=4, pattern_layers=3, force_layers=1,
            compute_dtype="float32", buckets=(4,),
        )
    with pytest.raises(KeyError, match="TactileSRCNN"):
        SRPredictor(
            ckpt, scale_factor=4, compute_dtype="float32", buckets=(4,),
            model_arch="TactileSRCNN",
        )


def test_arch_underspec_raises_instead_of_truncating(tmp_path):
    """UNDER-specified knobs must refuse, not silently fold a truncated
    network: pattern_layers=1 on a 2-layer checkpoint, seqs_cnt=1 on an
    MTSR checkpoint."""
    import pytest

    ckpt2 = _make_ckpt(tmp_path, pattern_layers=2)
    with pytest.raises(ValueError, match="patternFeatureExtra_layer_1"):
        SRPredictor(
            ckpt2, scale_factor=4, pattern_layers=1, force_layers=1,
            compute_dtype="float32", buckets=(4,),
        )

    model = TactileSR(
        scale_factor=4, seqs_cnt=2, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
    )
    v = jax.device_get(
        model.init(jax.random.key(8), jnp.zeros((1, 6, 4, 4)), train=False)
    )
    mtsr = str(tmp_path / "mtsr2.ckpt")
    save_checkpoint_file(
        mtsr,
        {
            "num_devices": 1,
            "model": {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            "epoch": 0,
        },
    )
    with pytest.raises(ValueError, match="inputLayer_pattern_1"):
        SRPredictor(
            mtsr, scale_factor=4, seqs_cnt=1, pattern_layers=1, force_layers=1,
            compute_dtype="float32", buckets=(4,),
        )


def test_mesh_sharded_serving_matches_single_device(tmp_path, rng):
    """Data-parallel serving over the 8-device CPU mesh: identical outputs,
    buckets rounded up to data-axis multiples."""
    from tactilesr_tpu.parallel.mesh import make_mesh

    ckpt = _make_ckpt(tmp_path)
    mesh = make_mesh(jax.devices())
    kw = dict(
        scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32",
    )
    pred_mesh = SRPredictor(ckpt, buckets=(4, 16), mesh=mesh, **kw)
    pred_one = SRPredictor(ckpt, buckets=(4, 16), **kw)
    # bucket 4 < 8 devices -> rounded to 8
    assert pred_mesh.buckets == (8, 16)
    pred_mesh.warmup()
    lr = (rng.random((13, 3, 4, 4)) * 4).astype(np.float32)
    np.testing.assert_allclose(
        pred_mesh.predict(lr), pred_one.predict(lr), rtol=1e-5, atol=1e-5
    )
    # the literal-training-graph path must also serve under the mesh
    pred_mesh_raw = SRPredictor(ckpt, buckets=(8,), mesh=mesh, fused=False, **kw)
    np.testing.assert_allclose(
        pred_mesh_raw.predict(lr), pred_one.predict(lr), rtol=1e-5, atol=1e-5
    )


def test_stablehlo_export_roundtrip(tmp_path, rng):
    from jax import export as jexport

    from tactilesr_tpu.serving import export_stablehlo

    ckpt = _make_ckpt(tmp_path)
    path = export_stablehlo(
        ckpt, str(tmp_path / "model.stablehlo"), batch=4,
        scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32",
    )
    with open(path, "rb") as f:
        restored = jexport.deserialize(f.read())
    x = (rng.random((4, 3, 4, 4)) * 4).astype(np.float32)
    out = np.asarray(restored.call(jnp.asarray(x)))

    pred = SRPredictor(
        ckpt, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    want = pred.predict(x)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_predictor_rejects_unknown_arch(tmp_path):
    ckpt = _make_ckpt(tmp_path)
    import pytest

    with pytest.raises(ValueError, match="unknown model_arch"):
        SRPredictor(ckpt, model_arch="SRGAN")


def test_fold_error_messages(tmp_path):
    """The fused loader's diagnosis branches (serving.py:192-212): a
    checkpoint with no batch_stats names the real cause; an architecture-
    knob mismatch names the knobs to check."""
    import pytest

    model = TactileSR(
        scale_factor=4, seqs_cnt=1, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
    )
    v = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    nostats = str(tmp_path / "nostats.ckpt")
    save_checkpoint_file(
        nostats,
        {"num_devices": 1, "model": {"params": v["params"], "batch_stats": {}},
         "epoch": 0},
    )
    with pytest.raises(KeyError, match="no batch_stats"):
        SRPredictor(nostats, scale_factor=4, pattern_layers=1, force_layers=1)
    ckpt = _make_ckpt(tmp_path, pattern_layers=1)
    with pytest.raises(KeyError, match="pattern_layers=2"):
        SRPredictor(ckpt, scale_factor=4, pattern_layers=2, force_layers=1)


def test_cnn_rejects_multi_frame(tmp_path):
    """TactileSRCNN is single-frame; a multi-frame request must fail with a
    ValueError (server.py maps it to a 4xx) before any checkpoint I/O."""
    import pytest

    with pytest.raises(ValueError, match="single-frame"):
        SRPredictor(
            str(tmp_path / "missing.ckpt"),
            model_arch="TactileSRCNN",
            seqs_cnt=4,
        )
