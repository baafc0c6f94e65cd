"""Test configuration.

Tests run on a *virtual 8-device CPU mesh* so multi-chip sharding logic is
exercised without TPU hardware (the JAX-native way to fake a mesh; see
jax docs for ``xla_force_host_platform_device_count``).

These environment variables must be set before jax initializes its backends,
hence they live here at conftest import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize module may have imported jax before this conftest ran
# (pinning the platform from the launch environment); override via the
# config API, which works post-import as long as no backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of install state.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_work_dir(tmp_path):
    return str(tmp_path / "work_dir")


def make_sr_checkpoint(
    path, seed=0, pattern_layers=1, force_layers=1, seqs_cnt=1,
    scale_factor=4, epoch=0,
):
    """Random-init TactileSR checkpoint bundle (the one layout every
    serving/server test needs); shared so the format lives in one place."""
    import jax.numpy as jnp

    from tactilesr_tpu.models.tactile_sr import TactileSR
    from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file

    model = TactileSR(
        scale_factor=scale_factor, seqs_cnt=seqs_cnt, axis_cnt=3,
        pattern_feature_extra_layer_cnt=pattern_layers,
        force_feature_extra_layer_cnt=force_layers,
    )
    c = seqs_cnt * 3
    v = jax.device_get(
        model.init(jax.random.key(seed), jnp.zeros((1, c, 4, 4)), train=False)
    )
    path = str(path)
    save_checkpoint_file(
        path,
        {
            "num_devices": 1,
            "model": {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            "epoch": epoch,
        },
    )
    return path
