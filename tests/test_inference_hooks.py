"""Behavioral coverage for the PNG visual-regression artifacts -- the
reference's per-epoch inference hooks (train/tactileSR_train.py:104-196,
train/tPSFNet_train.py:75-170) and its standalone test_tPSF entry
(train/tPSFNet_train.py:306-332).  Each test trains a tiny run with
``inference_test=True`` through the public task mains and asserts real PNG
files appear where the reference writes them."""

import os

import numpy as np
import pytest

from tactilesr_tpu.config.default import tPSFNet_config, tactileSR_config
from tactilesr_tpu.data import generate_rotate_dataset
from tactilesr_tpu.tasks import sr_task, tpsf_task

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _assert_png(path: str) -> None:
    assert os.path.exists(path), f"missing PNG artifact: {path}"
    with open(path, "rb") as f:
        assert f.read(8) == PNG_MAGIC, f"not a PNG file: {path}"
    assert os.path.getsize(path) > 1000  # a rendered figure, not a stub


def _srdataset_npz(path, n, rng):
    lr = (rng.random((n, 3, 4, 4)) * 4).astype(np.float32)
    hr = 6.0 * np.repeat(np.repeat(lr[:, 2:3], 25, 2), 25, 3)
    np.savez(path, LR=lr, HR=hr.astype(np.float32))
    return str(path)


def test_inference_hook_sr_writes_epoch_pngs(tmp_path):
    rng = np.random.default_rng(0)
    train = _srdataset_npz(tmp_path / "train.npz", 16, rng)
    test = _srdataset_npz(tmp_path / "test.npz", 4, rng)
    cfg = dict(tactileSR_config)
    cfg.update(
        train_dataset_dir=train,
        test_dataset_dir=test,
        save_dir=str(tmp_path / "run"),
        train_batch_size=8,
        test_batch_size=4,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        warmup_t=5,
        compute_dtype="float32",
        inference_test=True,
    )
    sr_task.main(cfg, max_epochs=2)
    for epoch in (0, 1):
        _assert_png(
            os.path.join(cfg["save_dir"], "inference_result", f"epoch_{epoch}.png")
        )


@pytest.fixture(scope="module")
def tpsf_png_run(tmp_path_factory):
    """One tiny tPSF training run with the inference hook enabled."""
    root = tmp_path_factory.mktemp("tpsf_png")
    raw_dir = str(root / "rotateDataset")
    # the reference recipe's fixed splits assume 81 taps per blob
    generate_rotate_dataset(raw_dir, names=("I", "P"), seqs=8)
    cfg = dict(tPSFNet_config)
    cfg.update(
        dataset_dir=raw_dir,
        save_dir=str(root / "run"),
        sample_cnt=1,
        train_batch_size=32,
        test_batch_size=5,
        compute_dtype="float32",
        inference_test=True,
        test_dataset_dir_1=os.path.join(raw_dir, "I.npy"),
        test_dataset_dir_2=os.path.join(raw_dir, "P.npy"),
        inference_index=3,
        inference_seqs_length=4,
        is_aug_data=False,
    )
    trainer = tpsf_task.main(cfg, max_epochs=1)
    return cfg, trainer


def test_inference_hook_tpsf_writes_epoch_png(tpsf_png_run):
    cfg, trainer = tpsf_png_run
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)
    _assert_png(os.path.join(cfg["save_dir"], "inference_result", "epoch_0.png"))


def test_inspect_checkpoint_renders_standalone(tpsf_png_run, tmp_path):
    """The no-training inspection entry (reference's test_tPSF) loads a saved
    checkpoint and renders the alpha/beta-vs-force curves on its own."""
    cfg, _ = tpsf_png_run
    ckpt = os.path.join(cfg["save_dir"], "checkpoints", "latest.ckpt")
    assert os.path.exists(ckpt)
    out = str(tmp_path / "inspect.png")
    got = tpsf_task.inspect_checkpoint(cfg, ckpt, save_name=out)
    assert got == out
    _assert_png(out)


def test_inference_hook_disabled_when_seq_blobs_missing(tmp_path):
    """A missing press-sequence blob disables the hook with a warning instead
    of crashing the run (reference behavior: it would crash; ours degrades)."""
    root = tmp_path
    raw_dir = str(root / "rotateDataset")
    generate_rotate_dataset(raw_dir, names=("C",), seqs=8)
    cfg = dict(tPSFNet_config)
    cfg.update(
        dataset_dir=raw_dir,
        save_dir=str(root / "run"),
        sample_cnt=1,
        train_batch_size=32,
        test_batch_size=5,
        compute_dtype="float32",
        inference_test=True,
        test_dataset_dir_1=os.path.join(raw_dir, "does_not_exist.npy"),
        test_dataset_dir_2=os.path.join(raw_dir, "C.npy"),
        is_aug_data=False,
    )
    trainer = tpsf_task.main(cfg, max_epochs=1)
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)
    assert not os.path.exists(os.path.join(cfg["save_dir"], "inference_result"))
