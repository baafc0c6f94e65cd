"""Process-level CLI parity: the public entry points run as real commands.

The reference's contract is ``python train/tactileSR_train.py`` (bare, no
flags; tactileSR_train.py:242-243).  Ours adds ``-c config.yaml`` and
``--<key> value`` overrides on top.  These tests execute the actual scripts
in subprocesses (CPU platform) so the import-time bootstrap
(maybe_force_platform, init_distributed no-op, sys.path fix) is covered,
not just the in-process task mains."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single virtual device: fastest startup
    return env


def _run(cmd, **kw):
    return subprocess.run(
        cmd, cwd=REPO, env=_env(), capture_output=True, text=True,
        timeout=600, **kw
    )


def test_generate_cli_synthetic(tmp_path):
    out_dir = str(tmp_path / "rotateDataset")
    r = _run(
        [
            sys.executable, "-m", "tactilesr_tpu.data.generate", "synthetic",
            "--out-dir", out_dir, "--names", "C", "--taps-per-blob", "9",
            "--seqs", "8",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out_dir, "C.npy"))


def test_train_cli_stsr_with_yaml_and_flag_overrides(tmp_path):
    """`python train/tactileSR_train.py -c cfg.yaml --epochs 1` end to end:
    YAML overrides merge under per-key flags, training runs, checkpoints and
    per-process logs land in save_dir."""
    rng = np.random.default_rng(0)
    lr = (rng.random((16, 3, 4, 4)) * 4).astype(np.float32)
    hr = 6.0 * np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    train_npz = str(tmp_path / "train.npz")
    test_npz = str(tmp_path / "test.npz")
    np.savez(train_npz, LR=lr, HR=hr)
    np.savez(test_npz, LR=lr[:4], HR=hr[:4])

    save_dir = str(tmp_path / "run")
    cfg_yaml = str(tmp_path / "cfg.yaml")
    with open(cfg_yaml, "w") as f:
        f.write(
            "\n".join(
                [
                    f"train_dataset_dir: {train_npz}",
                    f"test_dataset_dir: {test_npz}",
                    f"save_dir: {save_dir}",
                    "train_batch_size: 8",
                    "test_batch_size: 4",
                    "patternFeatureExtraLayerCnt: 1",
                    "forceFeatureExtraLayerCnt: 1",
                    "scale_factor: 4",
                    "warmup_t: 5",
                    "compute_dtype: float32",
                    "inference_test: false",
                    "epochs: 3",  # the flag below must beat this
                ]
            )
        )

    r = _run(
        [
            sys.executable, "train/tactileSR_train.py", "-c", cfg_yaml,
            "--epochs", "1",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ckpts = os.listdir(os.path.join(save_dir, "checkpoints"))
    assert "epoch_0.ckpt" in ckpts and "latest.ckpt" in ckpts
    assert "epoch_1.ckpt" not in ckpts  # --epochs 1 beat the YAML's 3
    assert os.path.exists(os.path.join(save_dir, "log_rank0.txt"))


def test_serving_cli_evaluate_and_output(tmp_path):
    """`python -m tactilesr_tpu.serving` end to end: loads a checkpoint,
    predicts an .npz batch, reports a JSON line with PSNR/SSIM (--evaluate),
    and writes the SR maps (--output)."""
    import json

    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.models.tactile_sr import TactileSR
    from tactilesr_tpu.runtime.checkpoint import save_checkpoint_file

    model = TactileSR(
        scale_factor=4, seqs_cnt=1, axis_cnt=3,
        pattern_feature_extra_layer_cnt=1, force_feature_extra_layer_cnt=1,
    )
    v = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False)
    )
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint_file(
        ckpt,
        {
            "num_devices": 1,
            "model": {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
            "epoch": 0,
        },
    )

    rng = np.random.default_rng(1)
    lr = (rng.random((6, 3, 4, 4)) * 4).astype(np.float32)
    hr = 6.0 * np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3).astype(np.float32)
    inp = str(tmp_path / "input.npz")
    outp = str(tmp_path / "out.npz")
    np.savez(inp, LR=lr, HR=hr)

    r = _run(
        [
            sys.executable, "-m", "tactilesr_tpu.serving",
            "--checkpoint", ckpt, "--input", inp, "--output", outp,
            "--scale-factor", "4", "--pattern-layers", "1",
            "--compute-dtype", "float32", "--evaluate",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    json_lines = [
        ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert json_lines, r.stdout
    report = json.loads(json_lines[-1])
    assert report["frames"] == 6
    assert report["output_shape"] == [6, 1, 16, 16]
    assert np.isfinite(report["psnr_db"]) and np.isfinite(report["ssim"])
    with np.load(outp) as z:
        assert z["SR"].shape == (6, 1, 16, 16)


def test_platform_env_var_beats_site_pin():
    """`JAX_PLATFORMS=cpu python train/X_train.py` must be a CPU run even on
    hosts whose sitecustomize pins another platform through the config API
    (which silently outranks the raw env var).  maybe_force_platform --
    called first by every product CLI -- restores the documented env
    precedence; without it, subprocess 'CPU' runs land on the TPU tunnel."""
    r = _run(
        [
            sys.executable, "-c",
            "import tactilesr_tpu; tactilesr_tpu.maybe_force_platform(); "
            "import jax; print('BACKEND=' + jax.default_backend())",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "BACKEND=cpu" in r.stdout


def test_server_cli_subprocess(tmp_path):
    """`python -m tactilesr_tpu.server` end to end in a subprocess: binds an
    ephemeral port, prints the one-line JSON address on stdout, answers
    healthz/predict/stats over HTTP, and dies cleanly on SIGTERM."""
    import io
    import json
    import signal
    import time
    import urllib.request

    from conftest import make_sr_checkpoint

    ckpt = make_sr_checkpoint(tmp_path / "model.ckpt")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "tactilesr_tpu.server",
            "--checkpoint", ckpt, "--port", "0",
            "--scale-factor", "4", "--pattern-layers", "1",
            "--force-layers", "1", "--compute-dtype", "float32",
        ],
        cwd=REPO, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
    )
    try:
        line = proc.stdout.readline()  # blocks until warmup finishes
        base = json.loads(line)["serving"]
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        buf = io.BytesIO()
        np.savez(buf, LR=np.random.rand(3, 3, 4, 4).astype(np.float32))
        req = urllib.request.Request(
            base + "/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npz"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
            with np.load(io.BytesIO(r.read())) as z:
                assert z["SR"].shape == (3, 1, 16, 16)
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            s = json.loads(r.read())
        assert s["frames"] == 3 and "latency_ms" in s
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
