"""Small remaining units: dist helpers (single-process identities), env
report, platform forcing, serving error paths."""

import numpy as np
import pytest

import jax

from tactilesr_tpu.parallel import (
    all_gather_object,
    get_rank,
    get_world_size,
    init_distributed,
    is_main_process,
    reduce_dict,
)
from tactilesr_tpu.runtime.misc import collect_env, set_random_seed


def test_dist_single_process_identities():
    assert init_distributed() == 0
    assert get_rank() == 0
    assert get_world_size() == 1
    assert is_main_process()
    red = reduce_dict({"x": 2.0, "y": 4})
    assert red == {"x": 2.0, "y": 4.0}
    assert all_gather_object(3.5) == [3.5]


def test_collect_env_mentions_jax_and_devices():
    report = collect_env()
    assert "jax" in report and "device count" in report


def test_set_random_seed_deterministic_numpy():
    set_random_seed(123)
    a = np.random.rand(3)
    set_random_seed(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    s = set_random_seed(-1)  # random seed path
    assert s >= 0


def test_serving_missing_checkpoint_raises(tmp_path):
    from tactilesr_tpu.serving import SRPredictor

    with pytest.raises(FileNotFoundError):
        SRPredictor(str(tmp_path / "nope.ckpt"), scale_factor=4)


def test_predictor_rejects_wrong_channels(tmp_path, rng):
    from tactilesr_tpu.serving import SRPredictor
    from tests.test_serving import _make_ckpt

    ckpt = _make_ckpt(tmp_path)
    pred = SRPredictor(
        ckpt, scale_factor=4, pattern_layers=1, force_layers=1,
        compute_dtype="float32", buckets=(4,),
    )
    with pytest.raises(ValueError, match="expected"):
        pred.predict(rng.random((2, 6, 4, 4)).astype(np.float32))


def test_apply_matmul_precision_sets_and_resets():
    """'highest' applies; 'default' must RESET the global flag so back-to-back
    runs in one process don't inherit a previous run's override."""
    from tactilesr_tpu.runtime.misc import apply_matmul_precision

    flag = jax.config.jax_default_matmul_precision
    try:
        apply_matmul_precision({"matmul_precision": "highest"})
        assert jax.config.jax_default_matmul_precision == "highest"
        apply_matmul_precision({"matmul_precision": "default"})
        assert jax.config.jax_default_matmul_precision is None
        apply_matmul_precision({})  # absent key behaves like default
        assert jax.config.jax_default_matmul_precision is None
    finally:
        jax.config.update("jax_default_matmul_precision", flag)


def test_bench_require_device_returns_on_live_backend():
    """bench.require_device must pass straight through when the backend
    initializes (the CPU backend here); its timeout path is for dead
    tunnels, where jax.devices() blocks forever."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    dev = bench.require_device(timeout_s=120)
    assert dev is jax.devices()[0]


def test_module_main_prints_command_index():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "tactilesr_tpu"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    assert "tactilesr_tpu.server" in out.stdout
    assert "tPSFNet_train.py" in out.stdout
