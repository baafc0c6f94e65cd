"""Serving-specialized TactileSR forward: identical math, restructured graph.

Three exact graph rewrites applied once at load time (host-side, f32):

1. **BatchNorm folding** -- eval-mode BN is the affine map
   ``y = (x - mean) * scale/sqrt(var+eps) + bias``; folding it into the
   preceding convolution's kernel/bias removes every BN from the serving
   graph (the reference serves through the full train-graph in eval mode,
   model/tactileSR_model.py:18-98 + test/test_model.py).
2. **Parallel-kernel merging** -- MSRB's parallel 3x3 and 5x5 convolutions
   over the same input become ONE 5x5 convolution with the 3x3 kernel
   zero-embedded and the output channels stacked.  The merged output *is*
   the concat, so the (B, 40, 40, 128) concat buffer is never materialized,
   and the conv's output-channel dim fills the TPU's 128-wide lane tiling
   instead of running two half-filled convs.  Zero-padding a kernel is
   exact: the MXU accumulates in f32 and the extra taps contribute 0.
3. **Concat-input splitting** -- ``conv(concat(a, b))`` becomes
   ``conv_a(a) + conv_b(b)`` by splitting the kernel along input channels
   (bias rides on one half).  Applied to MSRB's confusion 1x1, the output
   head's first conv, and the multi-sequence branch fuse, removing the
   remaining concats from the hot path.
4. **Branch batching (MTSR)** -- the S per-sequence input branches are
   channel-independent: branch ``s`` reads only input channels
   ``3s..3s+3`` and writes only feature channels ``64s..64s+64``.  Their
   concat is therefore EXACTLY one convolution with a block-diagonal
   kernel (zero cross-branch taps -- the same zero-embedding trick as
   rewrite 2, exact in f32 because the extra taps contribute 0), or
   equivalently one grouped convolution with ``feature_group_count=S``
   and no extra taps at all.  ``branch_mode`` selects the formulation:
   ``per_seq`` (S separate branch stacks, the rewrite-3 layout),
   ``dense`` (one 3S->64S + one 64S->64S block-diagonal conv),
   ``grouped`` (the same two convs with ``feature_group_count=S``), or
   ``mixed`` (dense first conv, where the zero-tap overhead is small --
   +0.23 GFLOP/frame -- and grouped second, where dense would 7x the
   dominant FLOPs; measured a tie with grouped).  Under any batched mode
   the
   branch-fuse conv needs no splitting: it is served as the original
   single 64S->64 convolution.  A/B measurements on chip are in
   docs/PERF.md "The fused MTSR graph".

All rewrites are algebraically exact in f32; in bf16 they differ from the
layer-by-layer graph only by rounding (folded weights are quantized once
instead of BN running in f32 post-conv).  Parity is asserted in
tests/test_inference_fused.py against the training-graph forward.

The public entry points are :func:`fold_inference_params` (host-side, once
per checkpoint) and :func:`tactile_sr_infer` (pure, jittable).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear, upsample_bilinear

__all__ = [
    "BRANCH_MODES",
    "fold_inference_params",
    "fold_inference_params_cnn",
    "resolve_branch_mode",
    "tactile_sr_infer",
    "tactile_sr_cnn_infer",
]

BRANCH_MODES = ("per_seq", "dense", "grouped", "mixed")


def resolve_branch_mode(branch_mode: str, seqs_cnt: int) -> str:
    """Resolve the MTSR branch formulation (module docstring, rewrite 4).

    ``auto`` picks ``grouped`` for multi-sequence graphs -- measured
    fastest on chip and adds zero FLOPs (docs/PERF.md "The fused MTSR
    graph", round-5 A/B over all four formulations: 410.4 ms/iter vs
    416.7 per_seq / 519.8 dense / 410.8 mixed at S=7, B=4096) -- and the
    canonical ``per_seq`` layout for STSR, where there is nothing to
    batch (S=1 batching degenerates to the same convs with a different
    key layout and would only fragment the executable cache)."""
    if branch_mode == "auto":
        return "grouped" if seqs_cnt > 1 else "per_seq"
    if branch_mode not in BRANCH_MODES:
        raise ValueError(
            f"branch_mode must be 'auto' or one of {BRANCH_MODES}, "
            f"got {branch_mode!r}"
        )
    return branch_mode

_EPS = 1e-5  # torch BatchNorm2d default, matches models/layers.py


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def _fold_bn(kernel, bias, bn_params, bn_stats):
    """Fold eval-mode BN into the preceding conv's (kernel, bias).

    kernel: (kh, kw, cin, cout); bias: (cout,) or None.
    """
    kernel = _np(kernel)
    scale = _np(bn_params["scale"])
    bn_bias = _np(bn_params["bias"])
    mean = _np(bn_stats["mean"])
    var = _np(bn_stats["var"])
    s = scale / np.sqrt(var + _EPS)
    k = kernel * s  # broadcasts over the trailing (cout) axis
    b = bias if bias is not None else np.zeros(kernel.shape[-1], np.float32)
    b = (_np(b) - mean) * s + bn_bias
    return k, b


def _embed_3_in_5(k3: np.ndarray) -> np.ndarray:
    """Zero-embed a (3,3,cin,cout) kernel at the center of a 5x5 window."""
    kh, kw, cin, cout = k3.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((5, 5, cin, cout), np.float32)
    out[1:4, 1:4] = k3
    return out


def _fold_msrb(blk: dict, bst: dict, pre: str, out: dict) -> None:
    """Fold one MSRB block into the fused layout under key prefix ``pre``."""

    def fold(name):
        return _fold_bn(
            blk[name]["conv"]["kernel"],
            blk[name]["conv"].get("bias"),
            blk[f"{name}_bn"],
            bst[f"{name}_bn"],
        )

    # parallel 3x3/5x5 over x -> one 5x5 conv 64->128 (output IS `mid`)
    k3, b3 = fold("conv_3_1")
    k5, b5 = fold("conv_5_1")
    out[f"{pre}/stage1/k"] = np.concatenate([_embed_3_in_5(k3), k5], axis=-1)
    out[f"{pre}/stage1/b"] = np.concatenate([b3, b5])

    # second pair stays as two convs over `mid` (merging would add 47%
    # FLOPs to the dominant 128-ch convs); BN folded
    k32, b32 = fold("conv_3_2")
    k52, b52 = fold("conv_5_2")
    out[f"{pre}/conv32/k"] = k32
    out[f"{pre}/conv32/b"] = b32
    out[f"{pre}/conv52/k"] = k52
    out[f"{pre}/conv52/b"] = b52

    # confusion 1x1 reads concat(out32, out52): split input channels
    ck = _np(blk["confusion"]["conv"]["kernel"])
    out[f"{pre}/conf/k32"] = ck[:, :, :128, :]
    out[f"{pre}/conf/k52"] = ck[:, :, 128:, :]
    out[f"{pre}/conf/b"] = _np(blk["confusion"]["conv"]["bias"])


def _cast_folded(out: dict, dtype) -> dict:
    """Kernels to the compute dtype; biases are STORED f32 (the BN-fold
    arithmetic that produced them ran in f32, and keeping them f32 defers
    quantization to the single cast at the add site -- _conv/_msrb_infer
    cast to the activation dtype there, so under bf16 the adds ARE bf16)."""
    dt = jnp.dtype(dtype)
    return {
        k: jnp.asarray(v, dt if k.rsplit("/", 1)[-1].startswith("k") else jnp.float32)
        for k, v in out.items()
    }


def _check_all_consumed(params: dict, consumed: set, hint: str) -> None:
    """Under-specified knobs would silently fold a truncated network (e.g.
    pattern_layers=1 on a 3-layer checkpoint reads only msrb_0 and serves
    garbage); refuse if any checkpoint module went unread."""
    extra = sorted(set(params) - consumed)
    if extra:
        raise ValueError(
            f"checkpoint contains modules the requested architecture does "
            f"not consume: {extra} -- {hint}"
        )


def fold_inference_params(
    variables: dict,
    *,
    seqs_cnt: int = 1,
    pattern_layers: int = 6,
    force_layers: int = 1,
    dtype: Any = jnp.bfloat16,
    branch_mode: str = "per_seq",
) -> dict:
    """Rewrite trained TactileSR variables into the fused serving layout.

    Returns a flat dict of arrays already cast to the compute ``dtype``
    (biases and resize weights are stored f32; they are cast to the
    activation dtype at their use sites, see ``_cast_folded``).

    ``branch_mode`` selects the input-branch formulation (module
    docstring, rewrite 4); the folded key layout differs per mode and
    must match the ``branch_mode`` passed to :func:`tactile_sr_infer`.
    """
    branch_mode = resolve_branch_mode(branch_mode, seqs_cnt)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}

    def fold_cbr(name):
        return _fold_bn(
            params[name]["conv"]["kernel"],
            params[name]["conv"].get("bias"),
            params[f"{name}_bn"],
            stats[f"{name}_bn"],
        )

    def cbr(name):
        out[f"{name}/k"], out[f"{name}/b"] = fold_cbr(name)

    ick, icb = _fold_bn(
        params["inputContact_layer"]["conv"]["kernel"],
        None,
        params["inputContact_layer_bn"],
        stats["inputContact_layer_bn"],
    )
    if branch_mode == "per_seq":
        for s in range(seqs_cnt):
            cbr(f"inputLayer_pattern_{s}_conv0")
            cbr(f"inputLayer_pattern_{s}_conv1")
        # inputContact reads concat(branch_0..branch_{S-1}); split per branch
        for s in range(seqs_cnt):
            out[f"inputContact/k{s}"] = ick[:, :, s * 64 : (s + 1) * 64, :]
        out["inputContact/b"] = icb
    else:
        # batch the S branch stacks into two convolutions (rewrite 4).
        # Branch s maps input channels [3s, 3s+3) to features [64s, 64s+64)
        # with zero cross-branch taps, so the stack is block-diagonal.
        folds0 = [fold_cbr(f"inputLayer_pattern_{s}_conv0") for s in range(seqs_cnt)]
        folds1 = [fold_cbr(f"inputLayer_pattern_{s}_conv1") for s in range(seqs_cnt)]
        cin = folds0[0][0].shape[2]  # axis_cnt (3)

        def dense0():
            k0 = np.zeros((3, 3, cin * seqs_cnt, 64 * seqs_cnt), np.float32)
            for s, (k, _) in enumerate(folds0):
                k0[:, :, s * cin : (s + 1) * cin, s * 64 : (s + 1) * 64] = k
            return k0

        def dense1():
            k1 = np.zeros((3, 3, 64 * seqs_cnt, 64 * seqs_cnt), np.float32)
            for s, (k, _) in enumerate(folds1):
                k1[:, :, s * 64 : (s + 1) * 64, s * 64 : (s + 1) * 64] = k
            return k1

        # grouped kernels stack on the OUTPUT axis only (feature_group_count=S)
        if branch_mode == "grouped":
            out["branches/k0"] = np.concatenate([k for k, _ in folds0], axis=-1)
            out["branches/k1"] = np.concatenate([k for k, _ in folds1], axis=-1)
        elif branch_mode == "dense":
            out["branches/k0"] = dense0()
            out["branches/k1"] = dense1()
        else:  # mixed: dense conv0 (fills the 3-channel input lanes once,
            # +0.5 GFLOP/frame of zero taps), grouped conv1 (dense there
            # would 7x the dominant 64->64 FLOPs -- measured 133 ms/iter,
            # docs/PERF.md round-5 A/B)
            out["branches/k0"] = dense0()
            out["branches/k1"] = np.concatenate([k for k, _ in folds1], axis=-1)
        out["branches/b0"] = np.concatenate([b for _, b in folds0])
        out["branches/b1"] = np.concatenate([b for _, b in folds1])
        # the branch-fuse conv reads the (virtual) concat directly: the
        # original single 64S->64 kernel, no splitting needed
        out["inputContact/k"] = ick
        out["inputContact/b"] = icb

    for i in range(pattern_layers):
        _fold_msrb(
            params[f"patternFeatureExtra_layer_{i}"],
            stats[f"patternFeatureExtra_layer_{i}"],
            f"msrb_{i}",
            out,
        )

    out["force_in/k"] = _np(params["input_layer_force"]["conv"]["kernel"])
    for i in range(force_layers):
        blk = params[f"forceFeatureExtra_layer_{i}"]
        out[f"res_{i}/conv1/k"] = _np(blk["conv1"]["conv"]["kernel"])
        out[f"res_{i}/conv1/b"] = _np(blk["conv1"]["conv"]["bias"])
        out[f"res_{i}/conv2/k"] = _np(blk["conv2"]["conv"]["kernel"])
        out[f"res_{i}/conv2/b"] = _np(blk["conv2"]["conv"]["bias"])

    # output head: conv0 reads concat(force, pattern) -> split halves
    hk = _np(params["output_conv0"]["conv"]["kernel"])
    out["head0/kf"] = hk[:, :, :64, :]
    out["head0/kp"] = hk[:, :, 64:, :]
    out["head1/k"] = _np(params["output_conv1"]["conv"]["kernel"])

    consumed = {"inputContact_layer", "inputContact_layer_bn",
                "input_layer_force", "output_conv0", "output_conv1"}
    for s in range(seqs_cnt):
        for c in ("conv0", "conv0_bn", "conv1", "conv1_bn"):
            consumed.add(f"inputLayer_pattern_{s}_{c}")
    consumed |= {f"patternFeatureExtra_layer_{i}" for i in range(pattern_layers)}
    consumed |= {f"forceFeatureExtra_layer_{i}" for i in range(force_layers)}
    _check_all_consumed(
        params, consumed,
        f"do seqs_cnt={seqs_cnt}, pattern_layers={pattern_layers}, "
        f"force_layers={force_layers} match the trained architecture?",
    )
    return _cast_folded(out, dtype)


def fold_inference_params_cnn(
    variables: dict,
    *,
    msrb_cnt: int = 6,
    dtype: Any = jnp.bfloat16,
) -> dict:
    """Fused serving layout for ``TactileSRCNN`` (models/tactile_sr.py:101-121):
    BN folded into the three input convs, every MSRB merged/split as in
    :func:`fold_inference_params`."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}

    for i in range(3):
        k, b = _fold_bn(
            params[f"input_zyx_conv{i}"]["conv"]["kernel"],
            params[f"input_zyx_conv{i}"]["conv"].get("bias"),
            params[f"input_zyx_bn{i}"],
            stats[f"input_zyx_bn{i}"],
        )
        out[f"in{i}/k"] = k
        out[f"in{i}/b"] = b

    for i in range(msrb_cnt):
        _fold_msrb(
            params[f"msrb_layer_{i}"], stats[f"msrb_layer_{i}"], f"msrb_{i}", out
        )

    out["head/k"] = _np(params["output_conv"]["conv"]["kernel"])

    consumed = {"output_conv"}
    for i in range(3):
        consumed |= {f"input_zyx_conv{i}", f"input_zyx_bn{i}"}
    consumed |= {f"msrb_layer_{i}" for i in range(msrb_cnt)}
    _check_all_consumed(
        params, consumed,
        f"does msrb_cnt={msrb_cnt} match the trained TactileSRCNN (and is "
        "this really a TactileSRCNN checkpoint)?",
    )
    return _cast_folded(out, dtype)


def _msrb_infer(folded: dict, pre: str, x):
    """One fused MSRB block: merged stage-1 conv, split confusion."""
    relu = jax.nn.relu
    mid = relu(_conv(x, folded[f"{pre}/stage1/k"], folded[f"{pre}/stage1/b"], pad=2))
    o32 = relu(_conv(mid, folded[f"{pre}/conv32/k"], folded[f"{pre}/conv32/b"], pad=1))
    o52 = relu(_conv(mid, folded[f"{pre}/conv52/k"], folded[f"{pre}/conv52/b"], pad=2))
    conf = (
        _conv(o32, folded[f"{pre}/conf/k32"], pad=0)
        + _conv(o52, folded[f"{pre}/conf/k52"], pad=0)
        + folded[f"{pre}/conf/b"].astype(o32.dtype)
    )
    return relu(conf + x)


def _conv(x, kernel, bias=None, *, pad: int, groups: int = 1):
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale_factor",
        "seqs_cnt",
        "axis_cnt",
        "pattern_layers",
        "force_layers",
        "branch_mode",
    ),
)
def tactile_sr_infer(
    folded: dict,
    x: jnp.ndarray,
    *,
    scale_factor: int = 10,
    seqs_cnt: int = 1,
    axis_cnt: int = 3,
    pattern_layers: int = 6,
    force_layers: int = 1,
    branch_mode: str = "per_seq",
) -> jnp.ndarray:
    """Fused serving forward: (B, seqs*axis, 4, 4) f32 -> (B, 1, 4s, 4s) f32.

    Semantics match ``TactileSR.apply(..., train=False)``
    (models/tactile_sr.py:44-98); the graph is the rewritten one described
    in the module docstring.  ``branch_mode`` must match the layout the
    ``folded`` dict was produced with (:func:`fold_inference_params`).
    """
    branch_mode = resolve_branch_mode(branch_mode, seqs_cnt)
    dt = folded["head1/k"].dtype
    relu = jax.nn.relu
    x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC, f32

    if branch_mode == "per_seq":
        # pattern branches -> split-fused inputContact
        acc = None
        for s in range(seqs_cnt):
            xs = x[..., s * axis_cnt : (s + 1) * axis_cnt]
            xs = upsample_bilinear(xs, scale_factor).astype(dt)
            h = relu(_conv(xs, folded[f"inputLayer_pattern_{s}_conv0/k"],
                           folded[f"inputLayer_pattern_{s}_conv0/b"], pad=1))
            h = relu(_conv(h, folded[f"inputLayer_pattern_{s}_conv1/k"],
                           folded[f"inputLayer_pattern_{s}_conv1/b"], pad=1))
            c = _conv(h, folded[f"inputContact/k{s}"], pad=1)
            acc = c if acc is None else acc + c
        pattern = relu(acc + folded["inputContact/b"].astype(acc.dtype))
    else:
        # rewrite 4: all S branches as two convs (upsample is per-channel,
        # so upsampling the full 3S-channel input == per-branch upsamples)
        g0 = seqs_cnt if branch_mode == "grouped" else 1
        g1 = seqs_cnt if branch_mode in ("grouped", "mixed") else 1
        xs = upsample_bilinear(x, scale_factor).astype(dt)
        h = relu(_conv(xs, folded["branches/k0"], folded["branches/b0"],
                       pad=1, groups=g0))
        h = relu(_conv(h, folded["branches/k1"], folded["branches/b1"],
                       pad=1, groups=g1))
        pattern = relu(_conv(h, folded["inputContact/k"],
                             folded["inputContact/b"], pad=1))

    # MSRB trunk (merged stage-1, split confusion)
    for i in range(pattern_layers):
        pattern = _msrb_infer(folded, f"msrb_{i}", pattern)

    # force branch
    force = upsample_bilinear(x[..., :axis_cnt], scale_factor).astype(dt)
    force = relu(_conv(force, folded["force_in/k"], pad=1))
    for i in range(force_layers):
        y = relu(_conv(force, folded[f"res_{i}/conv1/k"],
                       folded[f"res_{i}/conv1/b"], pad=1))
        y = _conv(y, folded[f"res_{i}/conv2/k"], folded[f"res_{i}/conv2/b"], pad=1)
        force = relu(force + y)

    # split-fused head
    out = relu(_conv(force, folded["head0/kf"], pad=1)
               + _conv(pattern, folded["head0/kp"], pad=1))
    out = relu(_conv(out, folded["head1/k"], pad=1))

    hw = 4 * scale_factor
    out = resize_bilinear(out, (hw, hw))
    return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("scale_factor", "msrb_cnt"))
def tactile_sr_cnn_infer(
    folded: dict,
    x: jnp.ndarray,
    *,
    scale_factor: int = 10,
    msrb_cnt: int = 6,
) -> jnp.ndarray:
    """Fused serving forward for ``TactileSRCNN``: (B, 3, 4, 4) f32 ->
    (B, 1, 4s, 4s) f32.  Semantics match
    ``TactileSRCNN.apply(..., train=False)`` (models/tactile_sr.py:108-121)."""
    dt = folded["head/k"].dtype
    relu = jax.nn.relu
    x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC, f32
    h = upsample_bilinear(x, scale_factor).astype(dt)
    for i in range(3):
        h = relu(_conv(h, folded[f"in{i}/k"], folded[f"in{i}/b"], pad=1))
    for i in range(msrb_cnt):
        h = _msrb_infer(folded, f"msrb_{i}", h)
    h = relu(_conv(h, folded["head/k"], pad=1))
    return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
