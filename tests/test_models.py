"""Model-layer tests: shapes across seqsCnt, init statistics, BatchNorm
torch parity, tPSFNet forward/grad."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tactilesr_tpu.models import MSRB, BatchNorm, ResBlock, TactileSR, TactileSRCNN, TPSFNet


def _init_and_apply(model, *args, train=False, seed=0, **kwargs):
    variables = model.init(jax.random.key(seed), *args, train=train, **kwargs)
    if train:
        out, _ = model.apply(
            variables, *args, train=train, mutable=["batch_stats"], **kwargs
        )
    else:
        out = model.apply(variables, *args, train=train, **kwargs)
    return variables, out


@pytest.mark.parametrize("seqs_cnt", [1, 3, 7])
def test_tactile_sr_shapes(seqs_cnt, rng):
    model = TactileSR(
        scale_factor=10,
        seqs_cnt=seqs_cnt,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=1,
        force_feature_extra_layer_cnt=1,
    )
    x = jnp.asarray(rng.standard_normal((2, seqs_cnt * 3, 4, 4)).astype(np.float32))
    variables, out = _init_and_apply(model, x)
    assert out.shape == (2, 1, 40, 40)
    assert np.all(np.asarray(out) >= 0)  # final ReLU
    # per-seq branches have their own parameters
    branch_names = [k for k in variables["params"] if k.startswith("inputLayer_pattern_")]
    assert len(branch_names) == 4 * seqs_cnt  # (conv + bn) x 2 per branch


def test_tactile_sr_rejects_wrong_channels(rng):
    model = TactileSR(seqs_cnt=2, axis_cnt=3, pattern_feature_extra_layer_cnt=1)
    x = jnp.zeros((1, 3, 4, 4))
    with pytest.raises(AssertionError):
        model.init(jax.random.key(0), x, train=False)


def test_tactile_srcnn_shapes(rng):
    model = TactileSRCNN(msrb_cnt=1)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    _, out = _init_and_apply(model, x)
    assert out.shape == (2, 1, 40, 40)


def test_build_model_rejects_multiframe_srcnn():
    """ValueError (not a -O-strippable assert): TactileSRCNN is the
    single-frame IROS-2022 baseline (tasks/sr_task.py::build_model)."""
    from tactilesr_tpu.config.default import tactileSeqs_config
    from tactilesr_tpu.tasks.sr_task import build_model

    cfg = dict(tactileSeqs_config)  # seqsCnt=7
    cfg["model_arch"] = "TactileSRCNN"
    with pytest.raises(ValueError, match="single-frame"):
        build_model(cfg)


def test_blocks_preserve_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    for block in (MSRB(), ResBlock()):
        _, out = _init_and_apply(block, x, train=True)
        assert out.shape == x.shape


def test_conv_kaiming_and_bn_init():
    model = TactileSR(pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False)
    params = variables["params"]
    # conv kernels: std ~= sqrt(2 / fan_out), fan_out = out_ch * kh * kw
    k = params["inputContact_layer"]["conv"]["kernel"]  # (3,3,64,64)
    fan_out = k.shape[-1] * k.shape[0] * k.shape[1]
    std = float(jnp.std(k))
    assert abs(std - (2.0 / fan_out) ** 0.5) / ((2.0 / fan_out) ** 0.5) < 0.1
    # BN scale/bias init to 0.1 (reference's non-standard parity detail)
    bn = params["inputContact_layer_bn"]
    np.testing.assert_allclose(np.asarray(bn["scale"]), 0.1)
    np.testing.assert_allclose(np.asarray(bn["bias"]), 0.1)


def test_batchnorm_matches_torch(rng):
    x = rng.standard_normal((4, 8, 8, 5)).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)

    tbn = torch.nn.BatchNorm2d(5, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.fill_(0.1)
        tbn.bias.fill_(0.1)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # training mode: normalized output + running-stat update
    tbn.train()
    want = tbn(tx).detach().numpy()
    out, mutated = bn.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        rtol=1e-4,
        atol=1e-6,
    )
    # torch updates running_var with the UNBIASED batch variance
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-4,
        atol=1e-6,
    )

    # eval mode with the updated stats
    tbn.eval()
    want_eval = tbn(tx).detach().numpy()
    got_eval = bn.apply(
        {"params": variables["params"], "batch_stats": mutated["batch_stats"]},
        jnp.asarray(x),
        use_running_average=True,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_eval), (0, 3, 1, 2)), want_eval, rtol=1e-4, atol=1e-5
    )


def test_tpsf_net_forward_and_grad(rng):
    model = TPSFNet()
    lr = jnp.asarray(np.abs(rng.standard_normal((3, 3, 4, 4))).astype(np.float32))
    depth = np.zeros((3, 1, 100, 100), np.float32)
    depth[:, :, 30:60, 30:60] = 1.0
    depth = jnp.asarray(depth)
    variables = model.init(jax.random.key(0), lr, depth)
    hr, deg, psf, ab = model.apply(variables, lr, depth)
    assert hr.shape == (3, 1, 100, 100)
    assert deg.shape == (3, 1, 4, 4)
    assert psf.shape == (3, 1, 99, 99)
    assert ab.shape == (3, 1, 3)
    assert np.all(np.asarray(ab) >= 0)  # softplus head

    def loss(params):
        _hr, d, _p, _a = model.apply({"params": params}, lr, depth, return_psf=False)
        return jnp.mean((lr[:, 2:3] - d) ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


# ---------------------------------------------------------------- head_init
def test_head_init_non_negative_same_tree_and_signs(rng):
    """head_init only flips the final kernel's signs: identical param tree
    (checkpoint-compatible), |values| drawn from the same Kaiming law."""
    kw = dict(scale_factor=10, pattern_feature_extra_layer_cnt=1)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    ref = TactileSR(**kw).init(jax.random.key(7), x)
    pos = TactileSR(**kw, head_init="non_negative").init(jax.random.key(7), x)
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(pos)
    k_ref = np.asarray(ref["params"]["output_conv1"]["conv"]["kernel"])
    k_pos = np.asarray(pos["params"]["output_conv1"]["conv"]["kernel"])
    assert np.all(k_pos >= 0)
    # |Kaiming| scaled by 1/sqrt(fan_in) (growth-law compensation; see
    # models/layers.py::non_negative_kaiming_fan_out)
    fan_in = np.prod(k_ref.shape[:-1])
    np.testing.assert_allclose(k_pos, np.abs(k_ref) / np.sqrt(fan_in), rtol=1e-6)
    # every other kernel is untouched
    np.testing.assert_allclose(
        np.asarray(ref["params"]["output_conv0"]["conv"]["kernel"]),
        np.asarray(pos["params"]["output_conv0"]["conv"]["kernel"]),
    )


def test_head_init_immunizes_dead_head(rng):
    """A head whose pre-activation is negative everywhere has exactly-zero
    gradient (the born-dead mode observed on seed 3); the non_negative fold
    of the SAME draw keeps the gradient alive."""
    model = TactileSR(scale_factor=4, pattern_feature_extra_layer_cnt=1)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 3, 4, 4))).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    params = variables["params"]
    k = params["output_conv1"]["conv"]["kernel"]

    from flax import traverse_util
    from flax.core import unfreeze

    def loss_with_head(kernel):
        flat = traverse_util.flatten_dict(unfreeze(params))
        flat[("output_conv1", "conv", "kernel")] = kernel
        p = traverse_util.unflatten_dict(flat)
        out = model.apply({**unfreeze(variables), "params": p}, x, train=False)
        return jnp.mean((out - 1.0) ** 2)

    g_dead = jax.grad(loss_with_head)(-jnp.abs(k))  # all-negative head
    assert float(jnp.abs(g_dead).max()) == 0.0
    g_live = jax.grad(loss_with_head)(jnp.abs(k))  # the non_negative fold
    assert float(jnp.abs(g_live).max()) > 0.0


def test_head_init_rejects_unknown():
    with pytest.raises(ValueError, match="head_init"):
        TactileSR(head_init="typo").init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)))


def test_head_init_cnn(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 4)).astype(np.float32))
    v = TactileSRCNN(scale_factor=4, msrb_cnt=1, head_init="non_negative").init(
        jax.random.key(1), x
    )
    assert np.all(np.asarray(v["params"]["output_conv"]["conv"]["kernel"]) >= 0)


def test_leaky_res_block(rng):
    """LeakyResBlock (reference tactileSR_model.py:227-241, defined-unused
    there but part of the public surface): shape-preserving, and the inner
    LeakyReLU(1) quirk means the final slope is the only nonlinearity on
    the residual sum — slope=1 yields the raw sum, slope=0 its ReLU."""
    from tactilesr_tpu.models.blocks import LeakyResBlock

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    _, out = _init_and_apply(LeakyResBlock(), x, train=True)
    assert out.shape == x.shape
    _, out1 = _init_and_apply(LeakyResBlock(negative_slope=1.0), x)
    _, out0 = _init_and_apply(LeakyResBlock(negative_slope=0.0), x)
    np.testing.assert_allclose(
        np.asarray(out0), np.maximum(np.asarray(out1), 0.0),
        rtol=1e-6, atol=1e-6,
    )
