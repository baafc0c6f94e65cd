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


def toy_sr_config(tmp_dir, **overrides):
    """tactileSR_config shrunk for CPU tests (16x16 output, 1 block per
    branch, f32, no warmup); shared by the trainer suites."""
    import os as _os

    from tactilesr_tpu.config.default import tactileSR_config

    cfg = dict(tactileSR_config)
    cfg.update(
        save_dir=_os.path.join(tmp_dir, "work"),
        train_batch_size=8,
        test_batch_size=4,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,  # 16x16 output: fast on CPU
        warmup_t=0,
        compute_dtype="float32",
        inference_test=False,
    )
    cfg.update(overrides)
    return cfg


def toy_sr_data(rng, n=24):
    """Learnable toy pairs: HR is a smooth function of LR's z channel."""
    lr = (rng.random((n, 3, 4, 4)) * 4).astype(np.float32)
    hr = np.repeat(np.repeat(lr[:, 2:3], 25, axis=2), 25, axis=3).astype(
        np.float32
    )
    return lr, hr


def make_toy_trainer(
    cfg, lr, hr, max_epochs=3, seed=42, trainer_cls=None, schedule=None,
    **trainer_kwargs,
):
    """One toy-trainer factory for every trainer-behavior test (the
    constructor wiring lives here so suites can't drift apart)."""
    import jax.numpy as jnp

    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model

    if trainer_cls is None:
        trainer_cls = SRTrainer
    model = build_model(cfg)
    variables = jax.device_get(
        model.init(
            jax.random.key(seed),
            jnp.zeros((1, cfg["seqsCnt"] * cfg["axisCnt"], 4, 4)),
            train=False,
        )
    )
    if schedule is None:
        schedule = LRWarmupSchedule(
            StepLR(
                cfg["lr"],
                cfg["lr_scheduler_step_size"],
                cfg["lr_scheduler_gamma"],
            ),
            by_epoch=True,
            epoch_len=-(-lr.shape[0] // cfg["train_batch_size"]),
        )
    return trainer_cls(
        config=cfg,
        model=model,
        variables={
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
        tx=adam_l2(weight_decay=cfg["weight_decay"]),
        lr_schedule=schedule,
        train_arrays={"LR": lr, "HR": hr},
        batch_size=cfg["train_batch_size"],
        max_epochs=max_epochs,
        work_dir=cfg["save_dir"],
        checkpoint_period=1,
        seed=seed,
        **trainer_kwargs,
    )


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
