"""Parity of the fused serving forward (BN fold + conv merge/split) against
the training-graph ``TactileSR.apply(train=False)`` it rewrites."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tactilesr_tpu.models.inference import fold_inference_params, tactile_sr_infer
from tactilesr_tpu.models.tactile_sr import TactileSR


def _trained_like_variables(model, key, x, steps: int = 3):
    """Variables with non-trivial batch_stats (a few train-mode applies)."""
    variables = model.init(key, x, train=False)
    params = variables["params"]
    stats = variables["batch_stats"]
    for i in range(steps):
        kx = jax.random.normal(jax.random.key(100 + i), x.shape) * (2.0 + i)
        _, upd = model.apply(
            {"params": params, "batch_stats": stats},
            kx + 1.0,
            train=True,
            mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize(
    "seqs_cnt,pattern_layers,force_layers",
    [(1, 2, 1), (3, 2, 2)],
)
def test_fused_matches_training_graph_f32(seqs_cnt, pattern_layers, force_layers):
    model = TactileSR(
        scale_factor=10,
        seqs_cnt=seqs_cnt,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=pattern_layers,
        force_feature_extra_layer_cnt=force_layers,
        dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((4, seqs_cnt * 3, 4, 4)).astype(np.float32) * 4
    )
    variables = _trained_like_variables(model, jax.random.key(0), x)
    ref = model.apply(variables, x, train=False)
    folded = fold_inference_params(
        variables,
        seqs_cnt=seqs_cnt,
        pattern_layers=pattern_layers,
        force_layers=force_layers,
        dtype=jnp.float32,
    )
    got = tactile_sr_infer(
        folded,
        x,
        scale_factor=10,
        seqs_cnt=seqs_cnt,
        axis_cnt=3,
        pattern_layers=pattern_layers,
        force_layers=force_layers,
    )
    assert got.shape == ref.shape == (4, 1, 40, 40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("branch_mode", ["dense", "grouped", "mixed"])
def test_branch_batched_matches_training_graph_f32(branch_mode):
    """Rewrite 4 (block-diagonal / grouped branch batching) is exact in f32
    against the training graph -- zero cross-branch taps contribute 0."""
    seqs_cnt, pattern_layers, force_layers = 7, 2, 1
    model = TactileSR(
        scale_factor=10,
        seqs_cnt=seqs_cnt,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=pattern_layers,
        force_feature_extra_layer_cnt=force_layers,
        dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(7).random((4, seqs_cnt * 3, 4, 4)).astype(np.float32) * 4
    )
    variables = _trained_like_variables(model, jax.random.key(7), x)
    ref = model.apply(variables, x, train=False)
    folded = fold_inference_params(
        variables,
        seqs_cnt=seqs_cnt,
        pattern_layers=pattern_layers,
        force_layers=force_layers,
        dtype=jnp.float32,
        branch_mode=branch_mode,
    )
    got = tactile_sr_infer(
        folded,
        x,
        scale_factor=10,
        seqs_cnt=seqs_cnt,
        axis_cnt=3,
        pattern_layers=pattern_layers,
        force_layers=force_layers,
        branch_mode=branch_mode,
    )
    assert got.shape == ref.shape == (4, 1, 40, 40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_branch_batched_matches_per_seq_fold_exactly_f32():
    """dense/grouped vs the shipped per_seq fold: identical folded weights
    rearranged, so the three formulations agree to f32 roundoff on the same
    checkpoint (the parity assertion for the round-5 A/B)."""
    seqs_cnt = 7
    model = TactileSR(
        scale_factor=10, seqs_cnt=seqs_cnt, axis_cnt=3,
        pattern_feature_extra_layer_cnt=2, force_feature_extra_layer_cnt=1,
        dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(8).random((3, 21, 4, 4)).astype(np.float32) * 4
    )
    variables = _trained_like_variables(model, jax.random.key(8), x)
    kw = dict(seqs_cnt=seqs_cnt, pattern_layers=2, force_layers=1)
    outs = {}
    for mode in ("per_seq", "dense", "grouped", "mixed"):
        folded = fold_inference_params(
            variables, dtype=jnp.float32, branch_mode=mode, **kw
        )
        outs[mode] = np.asarray(
            tactile_sr_infer(folded, x, scale_factor=10, axis_cnt=3,
                             branch_mode=mode, **kw)
        )
    np.testing.assert_allclose(outs["dense"], outs["per_seq"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["grouped"], outs["per_seq"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["mixed"], outs["per_seq"], rtol=1e-5, atol=1e-5)


def test_branch_mode_resolution_and_fold_structure():
    from tactilesr_tpu.models.inference import resolve_branch_mode

    assert resolve_branch_mode("auto", 1) == "per_seq"
    assert resolve_branch_mode("auto", 7) == "grouped"
    assert resolve_branch_mode("per_seq", 7) == "per_seq"
    with pytest.raises(ValueError, match="branch_mode"):
        resolve_branch_mode("blockdiag", 7)

    model = TactileSR(
        scale_factor=4, seqs_cnt=3, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
        dtype=jnp.float32,
    )
    variables = model.init(jax.random.key(9), jnp.zeros((1, 9, 4, 4)), train=False)
    dense = fold_inference_params(
        variables, seqs_cnt=3, pattern_layers=1, dtype=jnp.float32,
        branch_mode="dense",
    )
    k0 = np.asarray(dense["branches/k0"])
    k1 = np.asarray(dense["branches/k1"])
    assert k0.shape == (3, 3, 9, 192) and k1.shape == (3, 3, 192, 192)
    # off-diagonal blocks are exactly zero (the exactness argument)
    assert np.all(k0[:, :, 3:, :64] == 0) and np.all(k0[:, :, :3, 64:] == 0)
    assert np.all(k1[:, :, 64:, :64] == 0) and np.all(k1[:, :, :64, 64:] == 0)
    grouped = fold_inference_params(
        variables, seqs_cnt=3, pattern_layers=1, dtype=jnp.float32,
        branch_mode="grouped",
    )
    g0 = np.asarray(grouped["branches/k0"])
    assert g0.shape == (3, 3, 3, 192)
    # the grouped kernel is the dense diagonal, compacted
    np.testing.assert_array_equal(g0[:, :, :, :64], k0[:, :, :3, :64])
    np.testing.assert_array_equal(g0[:, :, :, 64:128], k0[:, :, 3:6, 64:128])


def test_predictor_branch_mode_auto_mtsr(tmp_path):
    """SRPredictor's auto is BUCKET-aware for seqs>1 (per_seq below the
    measured crossover, grouped at/above it) and every formulation serves
    the same numbers on the same checkpoint; hot-swap works across the
    dual-layout fold."""
    from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file
    from tactilesr_tpu.serving import BRANCH_GROUPED_MIN_BUCKET, SRPredictor

    model = TactileSR(
        scale_factor=4, seqs_cnt=3, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
        dtype=jnp.float32,
    )
    x4 = jnp.zeros((1, 9, 4, 4))
    v = jax.device_get(_trained_like_variables(model, jax.random.key(10), x4))
    path = str(tmp_path / "mtsr.ckpt")
    bundle = {
        "num_devices": 1,
        "model": {"params": v["params"], "batch_stats": v["batch_stats"]},
        "epoch": 0,
    }
    save_checkpoint_file(path, bundle)
    kw = dict(scale_factor=4, seqs_cnt=3, pattern_layers=1, force_layers=1,
              compute_dtype="float32")
    # buckets straddle the crossover: 4 serves per_seq, the big one grouped
    pred_auto = SRPredictor(path, buckets=(4, BRANCH_GROUPED_MIN_BUCKET), **kw)
    assert pred_auto.branch_mode.startswith("auto")
    assert pred_auto._mode_for(4) == "per_seq"
    assert pred_auto._mode_for(BRANCH_GROUPED_MIN_BUCKET) == "grouped"
    assert set(pred_auto._folded) == {"per_seq", "grouped"}
    pred_ps = SRPredictor(path, branch_mode="per_seq", buckets=(4,), **kw)
    assert pred_ps.branch_mode == "per_seq"
    rng11 = np.random.default_rng(11)
    x = (rng11.random((4, 9, 4, 4)) * 4).astype(np.float32)
    np.testing.assert_allclose(
        pred_auto.predict(x), pred_ps.predict(x), rtol=1e-5, atol=1e-5
    )
    # a request filling the large bucket dispatches the grouped executable
    # and still matches per_seq on the shared rows
    xl = (rng11.random((BRANCH_GROUPED_MIN_BUCKET, 9, 4, 4)) * 4).astype(np.float32)
    np.testing.assert_allclose(
        pred_auto.predict(xl)[:4], pred_ps.predict(xl[:4]), rtol=1e-5, atol=1e-5
    )
    # hot-swap folds BOTH layouts and keeps serving
    path2 = str(tmp_path / "mtsr2.ckpt")
    save_checkpoint_file(path2, bundle)
    pred_auto.reload_checkpoint(path2)
    np.testing.assert_allclose(
        pred_auto.predict(x), pred_ps.predict(x), rtol=1e-5, atol=1e-5
    )


def test_fused_bf16_close_to_bf16_training_graph():
    model = TactileSR(
        scale_factor=10,
        seqs_cnt=1,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=6,
        force_feature_extra_layer_cnt=1,
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(
        np.random.default_rng(1).random((4, 3, 4, 4)).astype(np.float32) * 4
    )
    variables = _trained_like_variables(model, jax.random.key(1), x)
    ref = np.asarray(model.apply(variables, x, train=False))
    folded = fold_inference_params(variables, dtype=jnp.bfloat16)
    got = np.asarray(tactile_sr_infer(folded, x))
    # both are bf16 graphs; the rewrite only reassociates rounding
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(got - ref).max() / scale < 0.05, (
        f"max rel dev {np.abs(got - ref).max() / scale}"
    )


def test_cnn_fused_matches_training_graph_f32():
    from tactilesr_tpu.models.inference import (
        fold_inference_params_cnn,
        tactile_sr_cnn_infer,
    )
    from tactilesr_tpu.models.tactile_sr import TactileSRCNN

    model = TactileSRCNN(scale_factor=4, msrb_cnt=2, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(2).random((3, 3, 4, 4)).astype(np.float32) * 4
    )
    variables = _trained_like_variables(model, jax.random.key(2), x)
    ref = model.apply(variables, x, train=False)
    folded = fold_inference_params_cnn(variables, msrb_cnt=2, dtype=jnp.float32)
    got = tactile_sr_cnn_infer(folded, x, scale_factor=4, msrb_cnt=2)
    assert got.shape == ref.shape == (3, 1, 16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_predictor_cnn_arch(tmp_path):
    from tactilesr_tpu.models.tactile_sr import TactileSRCNN
    from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file
    from tactilesr_tpu.serving import SRPredictor

    model = TactileSRCNN(scale_factor=4, msrb_cnt=6, dtype=jnp.float32)
    v = jax.device_get(
        model.init(jax.random.key(3), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    path = str(tmp_path / "cnn.ckpt")
    save_checkpoint_file(
        path,
        {
            "num_devices": 1,
            "model": {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            "epoch": 0,
        },
    )
    pred = SRPredictor(
        path, scale_factor=4, compute_dtype="float32",
        buckets=(4,), model_arch="TactileSRCNN",
    )
    pred_ref = SRPredictor(
        path, scale_factor=4, compute_dtype="float32",
        buckets=(4,), model_arch="TactileSRCNN", fused=False,
    )
    x = (np.random.default_rng(4).random((4, 3, 4, 4)) * 4).astype(np.float32)
    np.testing.assert_allclose(
        pred.predict(x), pred_ref.predict(x), rtol=1e-4, atol=1e-4
    )


def test_stablehlo_export_cnn_arch(tmp_path):
    """Regression: export_stablehlo must honor model_arch (a CNN checkpoint
    used to crash the default TactileSR fold with a KeyError)."""
    from jax import export as jexport

    from tactilesr_tpu.models.tactile_sr import TactileSRCNN
    from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file
    from tactilesr_tpu.serving import export_stablehlo

    model = TactileSRCNN(scale_factor=4, msrb_cnt=6, dtype=jnp.float32)
    v = jax.device_get(
        model.init(jax.random.key(5), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    ckpt = str(tmp_path / "cnn.ckpt")
    save_checkpoint_file(
        ckpt,
        {
            "num_devices": 1,
            "model": {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            "epoch": 0,
        },
    )
    path = export_stablehlo(
        ckpt, str(tmp_path / "cnn.stablehlo"), batch=2, scale_factor=4,
        compute_dtype="float32", model_arch="TactileSRCNN",
    )
    with open(path, "rb") as f:
        restored = jexport.deserialize(f.read())
    x = np.random.default_rng(6).random((2, 3, 4, 4)).astype(np.float32)
    out = np.asarray(restored.call(jnp.asarray(x)))
    want = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_fold_is_pure_and_cacheable():
    model = TactileSR(
        scale_factor=10,
        seqs_cnt=1,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=1,
        force_feature_extra_layer_cnt=1,
        dtype=jnp.float32,
    )
    x = jnp.zeros((1, 3, 4, 4))
    variables = model.init(jax.random.key(0), x, train=False)
    f1 = fold_inference_params(variables, pattern_layers=1, dtype=jnp.float32)
    f2 = fold_inference_params(variables, pattern_layers=1, dtype=jnp.float32)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_array_equal(np.asarray(f1[k]), np.asarray(f2[k]))
    # merged stage-1 kernel has the 3x3 path zero-embedded at the border
    k = np.asarray(f1["msrb_0/stage1/k"])
    assert k.shape == (5, 5, 64, 128)
    assert np.all(k[0, :, :, :64] == 0) and np.all(k[:, 0, :, :64] == 0)
