"""Native C++ preprocessing vs the numpy reference implementations."""

import os

import numpy as np
import pytest

from tactilesr_tpu import native
from tactilesr_tpu.data import raw_process
from tactilesr_tpu.data.synthetic import make_tap_record
from tactilesr_tpu.ops.resize import bilinear_resize_matrix

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native build failed"
)


def _numpy_binarize(depth, px=100):
    os.environ["TACTILESR_NATIVE"] = "0"
    try:
        return raw_process.binarize_depth(depth, px)
    finally:
        os.environ["TACTILESR_NATIVE"] = "1"


def _numpy_extract(lrs, scale, cnt):
    os.environ["TACTILESR_NATIVE"] = "0"
    try:
        return raw_process.extract_contact_seqs(lrs, scale, cnt)
    finally:
        os.environ["TACTILESR_NATIVE"] = "1"


def test_resize_matches_matrix_path(rng):
    src = rng.random((64, 80)).astype(np.float32)
    got = native.resize_bilinear_native(src, (100, 100))
    wh = bilinear_resize_matrix(64, 100)
    ww = bilinear_resize_matrix(80, 100)
    want = wh @ src @ ww.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_binarize_matches_numpy(rng):
    for shape in [(100, 100), (64, 64)]:
        d = np.where(rng.random(shape) > 0.6, 4.0, 0.0).astype(np.float32)
        d += 0.05 * np.abs(rng.standard_normal(shape)).astype(np.float32)
        got = native.binarize_depth_native(d, 100)
        want = _numpy_binarize(d, 100)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_extract_matches_numpy(rng):
    rec = make_tap_record(0, rng, seqs=50)
    for scale, cnt in [(0.1, -1), (0.3, 16), (0.3, 4), (0.9, 8)]:
        got = native.extract_contact_seqs_native(rec["LRs"], scale, cnt)
        want = _numpy_extract(rec["LRs"], scale, cnt)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_dispatch_toggles(rng, tmp_path):
    """load_raw_dataset produces identical samples with native on/off."""
    from tactilesr_tpu.data.synthetic import write_raw_blob

    path = write_raw_blob(str(tmp_path / "X.npy"), n_taps=3, seed=5, seqs=30)
    os.environ["TACTILESR_NATIVE"] = "1"
    a = raw_process.load_raw_dataset(path, sample_cnt=6, is_sample_idx=[0, 2])
    os.environ["TACTILESR_NATIVE"] = "0"
    try:
        b = raw_process.load_raw_dataset(path, sample_cnt=6, is_sample_idx=[0, 2])
    finally:
        os.environ["TACTILESR_NATIVE"] = "1"
    assert len(a) == len(b)
    for sa, sb in zip(a, b):
        np.testing.assert_allclose(sa["LR"], sb["LR"], rtol=1e-6)
        np.testing.assert_allclose(sa["depth"], sb["depth"], rtol=1e-5, atol=1e-5)
