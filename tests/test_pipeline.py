"""Full-stack pipeline: synthetic raw blobs -> tPSFNet training -> SRdataset
generation -> TactileSR training -> SeqsDataset generation -> MTSR training
with trunk transfer.  Exercises every layer on tiny shapes."""

import os

import numpy as np
import pytest

import jax

from tactilesr_tpu.config.default import tPSFNet_config, tactileSR_config, tactileSeqs_config
from tactilesr_tpu.data import generate_rotate_dataset
from tactilesr_tpu.data.generate import (
    generate_seqs_srdataset,
    generate_single_srdataset,
)
from tactilesr_tpu.tasks import sr_task, tpsf_task

SAMPLE_CNT = 4


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    raw_dir = str(root / "rotateDataset")
    # 2 contact shapes x 27 taps (3 translations x 9 rotations)
    generate_rotate_dataset(raw_dir, names=("C", "I"), taps_per_blob=27, seqs=24)
    return {"root": str(root), "raw": raw_dir}


def _tpsf_cfg(pipeline_dirs, save_sub="tpsf_work"):
    cfg = dict(tPSFNet_config)
    cfg.update(
        dataset_dir=pipeline_dirs["raw"],
        save_dir=os.path.join(pipeline_dirs["root"], save_sub),
        sample_cnt=SAMPLE_CNT,
        train_batch_size=8,
        test_batch_size=4,
        compute_dtype="float32",
        inference_test=False,
        is_aug_data=False,
    )
    return cfg


@pytest.fixture(scope="module")
def tpsf_ckpt(pipeline_dirs):
    cfg = _tpsf_cfg(pipeline_dirs)
    # 2 blobs x 18 taps x SAMPLE_CNT samples = 144; train on taps 2.., test 0..1
    trainer = _run_tpsf(cfg)
    path = os.path.join(cfg["save_dir"], "checkpoints", "latest.ckpt")
    assert os.path.exists(path)
    return os.path.realpath(path)


def _run_tpsf(cfg, max_epochs=1, auto_resume=False):
    from tactilesr_tpu.data.datasets import TPSFNetDataset
    from tactilesr_tpu.runtime import EvalHook

    # narrow index ranges fitting the tiny fixture
    import jax.numpy as jnp

    from tactilesr_tpu.runtime.misc import set_random_seed

    set_random_seed(cfg["random_seed"])
    train_ds = TPSFNetDataset(
        cfg["dataset_dir"], sample_cnt=cfg["sample_cnt"],
        is_sample_idx=list(range(2, 18)), is_aug_data=False,
    )
    test_ds = TPSFNetDataset(
        cfg["dataset_dir"], sample_cnt=cfg["sample_cnt"],
        is_sample_idx=[0, 1], is_aug_data=False,
    )
    lr_train, d_train = train_ds.stacked()
    lr_test, d_test = test_ds.stacked()
    assert len(train_ds) > 0 and len(test_ds) > 0

    model = tpsf_task.build_model(cfg)
    variables = jax.device_get(
        model.init(
            jax.random.key(0),
            jnp.zeros((1, 3, 4, 4)),
            jnp.zeros((1, 1, 100, 100)),
            return_psf=False,
        )
    )
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2

    trainer = tpsf_task.TPSFTrainer(
        config=cfg,
        model=model,
        variables={"params": variables["params"], "batch_stats": {}},
        tx=adam_l2(weight_decay=cfg["weight_decay"]),
        lr_schedule=LRWarmupSchedule(
            StepLR(cfg["lr"], cfg["lr_scheduler_step_size"], cfg["lr_scheduler_gamma"]),
            by_epoch=True,
            epoch_len=-(-lr_train.shape[0] // cfg["train_batch_size"]),
        ),
        train_arrays={"LR": lr_train, "depth": d_train},
        batch_size=cfg["train_batch_size"],
        max_epochs=max_epochs,
        work_dir=cfg["save_dir"],
        checkpoint_period=1,
    )
    trainer.register_hooks(
        [EvalHook(1, tpsf_task.build_eval_fn(trainer, {"LR": lr_test, "depth": d_test}))]
    )
    trainer.train(auto_resume=auto_resume)
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)
    assert "Eval Metric" in trainer.metric_storage
    return trainer


def test_generate_with_pallas_and_precision_knobs(pipeline_dirs, tpsf_ckpt):
    """The generation CLI's --use-pallas/--physics-precision knobs: the fused
    kernel (interpret mode on CPU) must reproduce the XLA-generated dataset
    within f32 reassociation noise."""
    splits = {"test": [0, 1]}
    base = generate_single_srdataset(
        tpsf_ckpt, pipeline_dirs["raw"],
        os.path.join(pipeline_dirs["root"], "SR_xla"),
        sample_cnt=SAMPLE_CNT, splits=splits, use_pallas="false",
    )
    fused = generate_single_srdataset(
        tpsf_ckpt, pipeline_dirs["raw"],
        os.path.join(pipeline_dirs["root"], "SR_pallas"),
        sample_cnt=SAMPLE_CNT, splits=splits, use_pallas="true",
        physics_precision="default", batch=8,
    )
    with np.load(base["test"]) as zb, np.load(fused["test"]) as zf:
        np.testing.assert_allclose(zf["HR"], zb["HR"], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            zf["LR_degrade"], zb["LR_degrade"], rtol=1e-4, atol=1e-6
        )


def test_generate_and_train_sr(pipeline_dirs, tpsf_ckpt):
    out_dir = os.path.join(pipeline_dirs["root"], "SRdataset")
    paths = generate_single_srdataset(
        tpsf_ckpt,
        pipeline_dirs["raw"],
        out_dir,
        sample_cnt=SAMPLE_CNT,
        legacy_npy=True,
        splits={"train": list(range(2, 10)), "test": [0, 1], "validation": [10, 11]},
    )
    assert set(paths) == {"train", "test", "validation"}
    with np.load(paths["train"]) as z:
        assert z["LR"].shape[1:] == (3, 4, 4)
        assert z["HR"].shape[1:] == (1, 100, 100)
        assert z["LR_degrade"].shape[1:] == (1, 4, 4)
        assert z["alphaBeta"].shape[1:] == (3,)
        n_train = z["LR"].shape[0]
    assert n_train == 8 * SAMPLE_CNT * 2  # 8 taps x samples x 2 blobs

    # legacy mirror loads identically
    from tactilesr_tpu.data.datasets import TactileSRDataset

    legacy = TactileSRDataset(paths["train"].replace(".npz", ".npy"))
    fast = TactileSRDataset(paths["train"])
    np.testing.assert_allclose(legacy.stacked()[0], fast.stacked()[0], rtol=1e-6)
    # and the legacy file must be readable with the REFERENCE's exact access
    # pattern (utility/load_tactile_dataset.py:44: dataset[idx].item()['LR'])
    raw = np.load(paths["train"].replace(".npz", ".npy"), allow_pickle=True)
    rec = raw[0].item()
    assert isinstance(rec, dict)
    np.testing.assert_allclose(
        np.ascontiguousarray(rec["LR"]), fast.stacked()[0][0], rtol=1e-6
    )

    cfg = dict(tactileSR_config)
    cfg.update(
        train_dataset_dir=paths["train"],
        test_dataset_dir=paths["test"],
        save_dir=os.path.join(pipeline_dirs["root"], "sr_work"),
        train_batch_size=16,
        test_batch_size=4,
        patternFeatureExtraLayerCnt=1,
        forceFeatureExtraLayerCnt=1,
        scale_factor=4,
        warmup_t=5,
        compute_dtype="float32",
        inference_test=False,
    )
    trainer = sr_task.main(cfg, max_epochs=1)
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)
    assert np.isfinite(trainer.metric_storage["test_PSNR"].latest)
    # stash for the seqs stage
    test_generate_and_train_sr.sr_ckpt = os.path.realpath(
        os.path.join(cfg["save_dir"], "checkpoints", "latest.ckpt")
    )
    test_generate_and_train_sr.sr_cfg = cfg


def test_generate_seqs_and_transfer(pipeline_dirs, tpsf_ckpt):
    sr_ckpt = getattr(test_generate_and_train_sr, "sr_ckpt", None)
    assert sr_ckpt is not None, "runs after test_generate_and_train_sr"

    out_dir = os.path.join(pipeline_dirs["root"], "SeqsDataset")
    paths = generate_seqs_srdataset(
        tpsf_ckpt,
        pipeline_dirs["raw"],
        out_dir,
        sample_cnt=SAMPLE_CNT,
        n_contacts=2,
        n_translations=3,
    )
    assert "train" in paths
    with np.load(paths["train"]) as z:
        assert z["LR"].shape[1:] == (21, 4, 4)
        assert z["HR"].shape[1:] == (1, 100, 100)

    cfg = dict(tactileSeqs_config)
    base = getattr(test_generate_and_train_sr, "sr_cfg")
    cfg.update(
        train_dataset_dir=paths["train"],
        test_dataset_dir=paths.get("test", paths["train"]),
        save_dir=os.path.join(pipeline_dirs["root"], "seqs_work"),
        load_checkpoint_dir=sr_ckpt,
        train_batch_size=4,
        test_batch_size=2,
        patternFeatureExtraLayerCnt=base["patternFeatureExtraLayerCnt"],
        forceFeatureExtraLayerCnt=base["forceFeatureExtraLayerCnt"],
        scale_factor=base["scale_factor"],
        compute_dtype="float32",
        inference_test=False,
    )
    trainer = sr_task.main(cfg, seqs=True, max_epochs=1)
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)

    # the grafted trunk must equal the single-frame checkpoint's trunk
    from tactilesr_tpu.runtime import load_checkpoint_file

    single = load_checkpoint_file(sr_ckpt)
    # note: trainer params have evolved 1 epoch; compare transfer BEFORE train
    from tactilesr_tpu.tasks.sr_task import build_model, transfer_trunk_params

    model = sr_task.build_model(cfg)
    import jax.numpy as jnp

    fresh = jax.device_get(
        model.init(
            jax.random.key(0),
            jnp.zeros((1, cfg["seqsCnt"] * cfg["axisCnt"], 4, 4)),
            train=False,
        )
    )
    grafted = transfer_trunk_params(
        {"params": fresh["params"], "batch_stats": fresh.get("batch_stats", {})},
        single,
    )
    got = np.asarray(
        jax.tree_util.tree_leaves(
            grafted["params"]["patternFeatureExtra_layer_0"]
        )[0]
    )
    want = np.asarray(
        jax.tree_util.tree_leaves(
            single["model"]["params"]["patternFeatureExtra_layer_0"]
        )[0]
    )
    np.testing.assert_allclose(got, want)


def test_physics_fwd_jit_is_cached_across_splits():
    """The generation physics forward is compiled once per module config --
    a per-call @jax.jit closure would re-trace for every split."""
    from tactilesr_tpu.data.generate import _physics_fwd
    from tactilesr_tpu.models.tpsf_net import TPSFNet

    a = TPSFNet()
    assert _physics_fwd(a, 100.0) is _physics_fwd(a, 100.0)
    # equal-config modules (fresh instance per split load) share the entry
    assert _physics_fwd(TPSFNet(), 100.0) is _physics_fwd(a, 100.0)
    # a different config gets its own compiled entry
    assert _physics_fwd(TPSFNet(gama=2.0), 100.0) is not _physics_fwd(a, 100.0)


def test_tpsf_resume_continues(pipeline_dirs, tpsf_ckpt):
    """Resuming a tPSFNet run must work: its state carries batch_stats == {}
    and the strict=False merge must preserve that (empty) subtree instead of
    dropping the key (regression: KeyError 'batch_stats' on any tPSF resume)."""
    cfg = _tpsf_cfg(pipeline_dirs)  # same work dir as the 1-epoch fixture run
    trainer = _run_tpsf(cfg, max_epochs=2, auto_resume=True)
    # resumed at epoch 1 (not retrained from 0) and reached epoch 2
    assert trainer.start_iter == trainer.epoch_len
    assert os.path.exists(
        os.path.join(cfg["save_dir"], "checkpoints", "epoch_1.ckpt")
    )
