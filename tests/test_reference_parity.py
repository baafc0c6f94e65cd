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

from model.tactileSR_model import TactileSR as RefTactileSR  # noqa: E402
from model.tactileSR_model import TactileSRCNN as RefTactileSRCNN  # noqa: E402
from model.tPSFNet import tPSFNet as RefTPSFNet  # noqa: E402

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
