"""Architecture-level parity: run the actual reference torch models (from
/root/reference, read-only) and our flax models with IDENTICAL weights on
identical inputs; outputs must agree.  This pins every layer's wiring, the
resize semantics, and the torch->flax checkpoint converter in one shot.

Skipped automatically when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "model")):
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, REFERENCE)
try:
    from model.tactileSR_model import TactileSR as RefTactileSR  # noqa: E402
    from model.tactileSR_model import TactileSRCNN as RefTactileSRCNN  # noqa: E402
    from model.tPSFNet import tPSFNet as RefTPSFNet  # noqa: E402
finally:
    # don't leave the reference checkout shadowing top-level names
    # (model/config/utility/...) for the rest of the test session
    sys.path.remove(REFERENCE)

from tactilesr_tpu.compat.torch_convert import (  # noqa: E402
    convert_tactile_sr,
    convert_tactile_srcnn,
    convert_tpsf_net,
)
from tactilesr_tpu.models import TactileSR, TactileSRCNN, TPSFNet  # noqa: E402


@pytest.mark.parametrize("seqs_cnt,pattern_layers", [(1, 2), (3, 1)])
def test_tactile_sr_forward_parity(rng, seqs_cnt, pattern_layers):
    torch.manual_seed(0)
    ref = RefTactileSR(
        scale_factor=10,
        seqsCnt=seqs_cnt,
        axisCnt=3,
        patternFeatureExtraLayerCnt=pattern_layers,
        forceFeatureExtraLayerCnt=1,
    )
    ref.eval()
    variables = convert_tactile_sr(
        ref.state_dict(), seqs_cnt=seqs_cnt, pattern_layers=pattern_layers,
        force_layers=1,
    )
    ours = TactileSR(
        scale_factor=10,
        seqs_cnt=seqs_cnt,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=pattern_layers,
        force_feature_extra_layer_cnt=1,
    )
    x = rng.standard_normal((2, seqs_cnt * 3, 4, 4)).astype(np.float32) * 2
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_tactile_srcnn_forward_parity(rng):
    torch.manual_seed(1)
    ref = RefTactileSRCNN()
    ref.eval()
    variables = convert_tactile_srcnn(ref.state_dict(), msrb_cnt=6)
    ours = TactileSRCNN(msrb_cnt=6)
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_tpsf_net_forward_parity(rng):
    torch.manual_seed(2)
    ref = RefTPSFNet(gama=1.4, perception_scale=None, device="cpu")
    ref.eval()
    variables = convert_tpsf_net(ref.state_dict())
    ours = TPSFNet(gama=1.4)

    lr = np.abs(rng.standard_normal((2, 3, 4, 4))).astype(np.float32)
    depth = np.zeros((2, 1, 100, 100), np.float32)
    depth[0, :, 30:60, 30:70] = 1.0
    depth[1, :, 20:50, 40:80] = 1.0

    with torch.no_grad():
        hr_t, deg_t, psf_t, ab_t = ref(torch.from_numpy(lr), torch.from_numpy(depth))
    hr_j, deg_j, psf_j, ab_j = ours.apply(
        variables, jnp.asarray(lr), jnp.asarray(depth)
    )
    np.testing.assert_allclose(np.asarray(ab_j), ab_t.numpy()[:, None] if ab_t.ndim == 2 else ab_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hr_j), hr_t.numpy(), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(deg_j), deg_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(psf_j), psf_t.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seqs_cnt", [1, 3])
def test_training_step_parity(rng, seqs_cnt):
    """Same init + same batches: 3 optimizer steps in each framework must
    produce matching losses and parameters (pins loss wiring, gradients,
    Adam-with-L2, and BN-stat updates end to end).  seqs_cnt=3 covers the
    MTSR training path (per-frame input convs + seqsCnt*64-channel trunk
    input), whose CPU-reference head-to-head would cost hours."""
    import torch.nn.functional as F
    from torch import nn, optim

    import jax
    import optax

    from tactilesr_tpu.runtime.optim import adam_l2, scale_updates_by_lr
    from tactilesr_tpu.runtime.trainer import masked_mse
    from tactilesr_tpu.ops.resize import bilinear_resize_matrix

    torch.manual_seed(3)
    pattern_layers = 1
    ref = RefTactileSR(
        scale_factor=10, seqsCnt=seqs_cnt, axisCnt=3,
        patternFeatureExtraLayerCnt=pattern_layers, forceFeatureExtraLayerCnt=1,
    )
    ref.train()
    variables = convert_tactile_sr(
        ref.state_dict(), seqs_cnt=seqs_cnt, pattern_layers=pattern_layers,
        force_layers=1,
    )
    ours = TactileSR(
        scale_factor=10, seqs_cnt=seqs_cnt, axis_cnt=3,
        pattern_feature_extra_layer_cnt=pattern_layers,
        force_feature_extra_layer_cnt=1,
    )

    lr_rate, wd = 1e-3, 1e-2
    topt = optim.Adam(ref.parameters(), lr=lr_rate, weight_decay=wd)
    tcrit = nn.MSELoss()

    tx = adam_l2(weight_decay=wd)
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"])
    opt_state = tx.init(params)

    wh = bilinear_resize_matrix(100, 40)

    @jax.jit
    def our_step(params, batch_stats, opt_state, x, hr40):
        def loss_fn(p, bs):
            out, mut = ours.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            return masked_mse(out, hr40, jnp.ones(x.shape[0])), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        updates = scale_updates_by_lr(updates, lr_rate)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    for step in range(3):
        x = rng.standard_normal((4, seqs_cnt * 3, 4, 4)).astype(np.float32) * 2
        hr = (rng.random((4, 1, 100, 100)) * 30).astype(np.float32)
        hr40 = np.einsum("oh,nchw,pw->ncop", wh, hr / 10.0, wh).astype(np.float32)

        tx_in = torch.from_numpy(x)
        t_hr40 = F.interpolate(
            torch.from_numpy(hr) / 10.0, size=(40, 40), mode="bilinear",
            align_corners=False,
        )
        out_t = ref(tx_in)
        loss_t = tcrit(out_t, t_hr40)
        topt.zero_grad()
        loss_t.backward()
        topt.step()

        params, batch_stats, opt_state, loss_j = our_step(
            params, batch_stats, opt_state, jnp.asarray(x), jnp.asarray(hr40)
        )
        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), rtol=2e-3,
            err_msg=f"loss diverged at step {step}",
        )

    # spot-check parameters after 3 steps
    sd = ref.state_dict()
    checks = [
        ("inputContact_layer.0.weight",
         np.asarray(params["inputContact_layer"]["conv"]["kernel"]).transpose(3, 2, 0, 1)),
        ("output_layer.2.weight",
         np.asarray(params["output_conv1"]["conv"]["kernel"]).transpose(3, 2, 0, 1)),
        ("inputContact_layer.1.weight",
         np.asarray(params["inputContact_layer_bn"]["scale"])),
    ]
    for key, ours_arr in checks:
        want = sd[key].detach().numpy()
        # elementwise-strict, except that Adam's per-element normalization
        # amplifies f32 noise on near-zero-gradient weights (v ~ 0 flips the
        # update sign); allow <=0.01% such outliers, tightly capped
        bad = np.abs(ours_arr - want) > (5e-5 + 5e-3 * np.abs(want))
        assert bad.mean() <= 1e-4, (
            f"param {key} diverged: {bad.sum()}/{bad.size} elements off"
        )
        np.testing.assert_allclose(
            ours_arr, want, rtol=0.2, atol=5e-3,
            err_msg=f"param {key} diverged beyond the Adam-noise cap",
        )
    # BN running stats follow torch's unbiased update
    np.testing.assert_allclose(
        np.asarray(batch_stats["inputContact_layer_bn"]["var"]),
        sd["inputContact_layer.1.running_var"].numpy(),
        rtol=1e-3,
    )


def test_two_epoch_training_and_eval_parity(rng):
    """Drive BOTH frameworks through 2 full epochs (identical init, identical
    batch order, reduced model) and compare the final held-out PSNR/SSIM --
    the end-to-end version of the 0.1 dB parity requirement, on synthetic
    data since the reference snapshot ships no real recordings."""
    import torch.nn.functional as F
    from torch import nn, optim

    import jax
    import optax

    from tactilesr_tpu.metrics import batched_psnr, batched_ssim
    from tactilesr_tpu.ops.resize import bilinear_resize_matrix
    from tactilesr_tpu.runtime.optim import adam_l2, scale_updates_by_lr
    from tactilesr_tpu.runtime.trainer import masked_mse

    pattern_layers, scale, bsz = 1, 4, 16
    hw = 4 * scale
    torch.manual_seed(7)
    ref = RefTactileSR(
        scale_factor=scale, seqsCnt=1, axisCnt=3,
        patternFeatureExtraLayerCnt=pattern_layers, forceFeatureExtraLayerCnt=1,
    )
    ref.train()
    variables = convert_tactile_sr(
        ref.state_dict(), seqs_cnt=1, pattern_layers=pattern_layers, force_layers=1
    )
    ours = TactileSR(
        scale_factor=scale, seqs_cnt=1, axis_cnt=3,
        pattern_feature_extra_layer_cnt=pattern_layers,
        force_feature_extra_layer_cnt=1,
    )

    # learnable synthetic task
    n_train, n_test = 48, 16
    lr_all = (rng.random((n_train + n_test, 3, 4, 4)) * 4).astype(np.float32)
    hr_all = np.repeat(np.repeat(lr_all[:, 2:3] * 10, 25, 2), 25, 3).astype(np.float32)
    wh = bilinear_resize_matrix(100, hw)
    hr40_all = np.einsum("oh,nchw,pw->ncop", wh, hr_all / 10.0, wh).astype(np.float32)
    tr_lr, tr_hr = lr_all[:n_train], hr40_all[:n_train]
    te_lr, te_hr = lr_all[n_train:], hr40_all[n_train:]

    lr_rate, wd = 1e-3, 1e-2
    topt = optim.Adam(ref.parameters(), lr=lr_rate, weight_decay=wd)
    tcrit = nn.MSELoss()

    tx = adam_l2(weight_decay=wd)
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    bstats = jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"])
    opt_state = tx.init(params)

    @jax.jit
    def our_step(params, bstats, opt_state, x, y):
        def loss_fn(p, bs):
            out, mut = ours.apply(
                {"params": p, "batch_stats": bs}, x, train=True, mutable=["batch_stats"]
            )
            return masked_mse(out, y, jnp.ones(x.shape[0])), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bstats)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, scale_updates_by_lr(updates, lr_rate)),
            new_bs,
            new_opt,
        )

    order_rng = np.random.default_rng(11)
    for _epoch in range(2):
        perm = order_rng.permutation(n_train)
        for b in range(n_train // bsz):
            idx = perm[b * bsz : (b + 1) * bsz]
            x, y = tr_lr[idx], tr_hr[idx]
            out_t = ref(torch.from_numpy(x))
            loss_t = tcrit(out_t, torch.from_numpy(y))
            topt.zero_grad()
            loss_t.backward()
            topt.step()
            params, bstats, opt_state = our_step(
                params, bstats, opt_state, jnp.asarray(x), jnp.asarray(y)
            )

    # identical eval-mode metrics on the held-out split
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(te_lr)).numpy()
    out_ours = np.asarray(
        ours.apply({"params": params, "batch_stats": bstats}, jnp.asarray(te_lr), train=False)
    )
    psnr_ref = float(np.mean(np.asarray(batched_psnr(jnp.asarray(out_ref[:, 0]), jnp.asarray(te_hr[:, 0]), 250.0))))
    psnr_ours = float(np.mean(np.asarray(batched_psnr(jnp.asarray(out_ours[:, 0]), jnp.asarray(te_hr[:, 0]), 250.0))))
    ssim_ref = float(np.mean(np.asarray(batched_ssim(jnp.asarray(out_ref[:, 0]), jnp.asarray(te_hr[:, 0])))))
    ssim_ours = float(np.mean(np.asarray(batched_ssim(jnp.asarray(out_ours[:, 0]), jnp.asarray(te_hr[:, 0])))))
    assert abs(psnr_ours - psnr_ref) < 0.1, (psnr_ours, psnr_ref)  # the 0.1 dB bar
    assert abs(ssim_ours - ssim_ref) < 0.01, (ssim_ours, ssim_ref)


def test_fused_serving_matches_reference_torch(rng):
    """End-to-end of the serving rewrite chain: reference torch weights ->
    torch_convert -> BN-fold + conv merge/split (models/inference.py) ->
    fused forward must still match the ORIGINAL torch implementation."""
    from tactilesr_tpu.models.inference import (
        fold_inference_params,
        fold_inference_params_cnn,
        tactile_sr_cnn_infer,
        tactile_sr_infer,
    )

    torch.manual_seed(3)
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32) * 2

    ref = RefTactileSR(
        scale_factor=10, seqsCnt=1, axisCnt=3,
        patternFeatureExtraLayerCnt=2, forceFeatureExtraLayerCnt=1,
    )
    ref.eval()
    variables = convert_tactile_sr(
        ref.state_dict(), seqs_cnt=1, pattern_layers=2, force_layers=1
    )
    folded = fold_inference_params(
        variables, seqs_cnt=1, pattern_layers=2, force_layers=1,
        dtype=jnp.float32,
    )
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(
        tactile_sr_infer(
            folded, jnp.asarray(x), scale_factor=10, seqs_cnt=1, axis_cnt=3,
            pattern_layers=2, force_layers=1,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    torch.manual_seed(4)
    ref_cnn = RefTactileSRCNN()
    ref_cnn.eval()
    v_cnn = convert_tactile_srcnn(ref_cnn.state_dict(), msrb_cnt=6)
    folded_cnn = fold_inference_params_cnn(v_cnn, msrb_cnt=6, dtype=jnp.float32)
    with torch.no_grad():
        want_cnn = ref_cnn(torch.from_numpy(x)).numpy()
    got_cnn = np.asarray(
        tactile_sr_cnn_infer(folded_cnn, jnp.asarray(x), scale_factor=10, msrb_cnt=6)
    )
    np.testing.assert_allclose(got_cnn, want_cnn, rtol=1e-3, atol=1e-4)


def test_synthetic_blob_readable_by_reference_loader(tmp_path):
    """The synthetic raw blobs must be byte-compatible with the REFERENCE's
    own loader (utility/raw_data_process.py:99-101 unconditionally calls
    ``.item()`` per element, so each record must be a 0-d object ndarray),
    and both loaders must produce identical samples from the same blob —
    the contract the tPSF-stage head-to-head rests on."""
    from tactilesr_tpu.data.raw_process import load_raw_dataset
    from tactilesr_tpu.data.synthetic import write_raw_blob

    path = write_raw_blob(str(tmp_path / "blob.npy"), n_taps=9, seed=3, seqs=16)
    sys.path.insert(0, REFERENCE)
    try:
        from utility.raw_data_process import loadRawDataset as ref_load
    finally:
        sys.path.remove(REFERENCE)

    kw = dict(sample_cnt=4, is_sample_idx=[0, 1, 2], is_aug_data=False)
    ours = load_raw_dataset(path, **kw)
    # NB ref's loader mutates data['depth'] in place, so it must run second
    # on a fresh load (np.load re-reads the file; no aliasing in practice)
    ref = ref_load(path, **kw)
    assert len(ours) == len(ref) > 0
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a["LR"], b["LR"])
        np.testing.assert_allclose(a["depth"], b["depth"])


def test_convert_checkpoint_file_rejects_unconsumed_keys(tmp_path):
    """A converter invoked with an architecture smaller than the trained
    model must fail loud, not write a silently-truncated bundle (the
    serving-side _check_all_consumed can never fire on one)."""
    from tactilesr_tpu.compat.torch_convert import convert_checkpoint_file

    torch.manual_seed(0)
    ref = RefTactileSR(
        scale_factor=4,
        seqsCnt=1,
        axisCnt=3,
        patternFeatureExtraLayerCnt=2,
        forceFeatureExtraLayerCnt=1,
    )
    pth = tmp_path / "two_blocks.pth"
    torch.save({"model": ref.state_dict()}, pth)
    with pytest.raises(ValueError, match="patternFeatureExtra_layer.1"):
        convert_checkpoint_file(
            str(pth),
            str(tmp_path / "out.ckpt"),
            arch="tactileSR",
            seqs_cnt=1,
            pattern_layers=1,  # one block fewer than trained
            force_layers=1,
        )
    assert not (tmp_path / "out.ckpt").exists()
    # the matching declaration converts cleanly
    convert_checkpoint_file(
        str(pth),
        str(tmp_path / "ok.ckpt"),
        arch="tactileSR",
        seqs_cnt=1,
        pattern_layers=2,
        force_layers=1,
    )
    assert (tmp_path / "ok.ckpt").exists()


def test_load_torch_state_dict_module_bundle(tmp_path):
    """torch.save({'model': model, ...}) bundles (whole pickled nn.Module)
    unwrap via .state_dict() instead of crashing on .values()."""
    from tactilesr_tpu.compat.torch_convert import load_torch_state_dict

    torch.manual_seed(0)
    ref = RefTPSFNet(gama=1.4, perception_scale=None, device="cpu")
    pth = tmp_path / "module_bundle.pth"
    torch.save({"model": ref, "epoch": 3}, pth)
    sd = load_torch_state_dict(str(pth))
    want = ref.state_dict()
    assert set(sd) == set(want)
    for k in want:
        assert torch.equal(sd[k], want[k])

    # the bare twin -- torch.save(model, path) with no bundle dict
    bare = tmp_path / "bare_module.pth"
    torch.save(ref, bare)
    sd2 = load_torch_state_dict(str(bare))
    assert set(sd2) == set(want)
    for k in want:
        assert torch.equal(sd2[k], want[k])
