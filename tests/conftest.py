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
