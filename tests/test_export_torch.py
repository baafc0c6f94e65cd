"""Reverse-migration parity: export OUR weights to a reference-loadable
torch ``.pth`` and run the actual reference torch models with them.  The
strict=True load pins the exported key set exactly; the forward comparison
pins the layout transposes.  Together with test_reference_parity.py (the
torch->ours direction) this closes the migration loop in both directions.

Skipped automatically when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

import jax
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
    sys.path.remove(REFERENCE)

from tactilesr_tpu.compat import (  # noqa: E402
    export_checkpoint_file,
    export_tactile_sr,
    export_tactile_srcnn,
    export_tpsf_net,
)
from tactilesr_tpu.models import TactileSR, TactileSRCNN, TPSFNet  # noqa: E402
from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file  # noqa: E402


def _our_variables(model, example):
    v = jax.device_get(model.init(jax.random.key(7), example, train=False))
    return {"params": v["params"], "batch_stats": v.get("batch_stats", {})}


@pytest.mark.parametrize("seqs_cnt,pattern_layers", [(1, 2), (3, 1)])
def test_export_tactile_sr_round_trip(rng, seqs_cnt, pattern_layers):
    ours = TactileSR(
        scale_factor=10,
        seqs_cnt=seqs_cnt,
        axis_cnt=3,
        pattern_feature_extra_layer_cnt=pattern_layers,
        force_feature_extra_layer_cnt=1,
    )
    x = rng.standard_normal((2, seqs_cnt * 3, 4, 4)).astype(np.float32) * 2
    variables = _our_variables(ours, jnp.asarray(x[:1]))
    # exported batch_stats must be non-trivial for the BN parity to mean
    # anything: perturb them away from the (0, 1) init
    variables["batch_stats"] = jax.tree.map(
        lambda a: a + 0.1 * np.arange(a.size, dtype=np.float32).reshape(a.shape) / a.size,
        variables["batch_stats"],
    )

    sd = export_tactile_sr(variables)
    ref = RefTactileSR(
        scale_factor=10,
        seqsCnt=seqs_cnt,
        axisCnt=3,
        patternFeatureExtraLayerCnt=pattern_layers,
        forceFeatureExtraLayerCnt=1,
    )
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_export_tactile_srcnn_round_trip(rng):
    ours = TactileSRCNN(msrb_cnt=6)
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    variables = _our_variables(ours, jnp.asarray(x[:1]))

    sd = export_tactile_srcnn(variables)
    ref = RefTactileSRCNN()
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_export_tpsf_net_round_trip(rng):
    from tactilesr_tpu.compat.torch_convert import convert_tpsf_net

    ours = TPSFNet(gama=0.1, perception_scale=1.2)
    lr = (rng.random((2, 3, 4, 4)) * 2).astype(np.float32)
    depth = rng.random((2, 1, 100, 100)).astype(np.float32)
    variables = {
        "params": jax.device_get(
            ours.init(jax.random.key(3), jnp.asarray(lr[:1]), jnp.asarray(depth[:1]))
        )["params"],
        "batch_stats": {},
    }

    sd = export_tpsf_net(variables)
    ref = RefTPSFNet(gama=0.1, perception_scale=1.2)
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    # exact inverse of the forward converter: round-tripping the export
    # through convert_tpsf_net reproduces our params bit-for-bit
    back = convert_tpsf_net(sd)
    for i in range(4):
        np.testing.assert_array_equal(
            back["params"][f"mlp_{i}"]["linear"]["kernel"],
            np.asarray(variables["params"][f"mlp_{i}"]["linear"]["kernel"]),
        )

    # and the torch MLP head (Flatten->3xLinear/ReLU->Linear->Softplus,
    # reference tPSFNet.py:25-36) agrees with a numpy chain over our params
    with torch.no_grad():
        want = ref.MLP_layer(torch.from_numpy(lr)).numpy()
    kp = variables["params"]
    h = lr.reshape(2, -1)  # torch Flatten: (B, C*H*W)
    for i in range(4):
        lin = kp[f"mlp_{i}"]["linear"]
        h = h @ np.asarray(lin["kernel"]) + np.asarray(lin["bias"])
        if i < 3:
            h = np.maximum(h, 0.0)
    h = np.logaddexp(0.0, h)  # Softplus
    np.testing.assert_allclose(h, want, rtol=1e-4, atol=1e-5)


def test_export_checkpoint_file_round_trip(rng, tmp_path):
    """File-level path: .ckpt bundle -> .pth in the reference trainer's
    bundle format, loadable by its resume convention (bundle['model'])."""
    ours = TactileSRCNN(msrb_cnt=6)
    x = rng.standard_normal((1, 3, 4, 4)).astype(np.float32)
    variables = _our_variables(ours, jnp.asarray(x))
    ckpt = str(tmp_path / "ours.ckpt")
    save_checkpoint_file(ckpt, {"model": variables, "epoch": 4})

    pth = str(tmp_path / "exported.pth")
    export_checkpoint_file(ckpt, pth, arch="tactileSRCNN")

    bundle = torch.load(pth, map_location="cpu", weights_only=False)
    assert bundle["exported_from"] == ckpt
    ref = RefTactileSRCNN()
    ref.load_state_dict(bundle["model"], strict=True)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
