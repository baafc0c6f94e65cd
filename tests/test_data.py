"""Data layer: contact extraction, binarization, augmentation, datasets,
synthetic fixtures, loaders."""

import numpy as np
import pytest

from tactilesr_tpu.data import (
    SingleTapSeqsDataset,
    TactileSRDataset,
    TPSFNetDataset,
    augment_rotations,
    binarize_depth,
    epoch_batches,
    extract_contact_seqs,
    generate_rotate_dataset,
    load_raw_dataset,
    make_tap_record,
    write_raw_blob,
)


def _ref_extract(tactile_lrs, threshold_scale=0.1, sample_count=-1):
    """Independent numpy transcription of the reference extraction loop."""
    ret = []
    z_max, max_idx = 0, 0
    for i in range(tactile_lrs.shape[0]):
        lr = tactile_lrs[i].reshape(16, 3)
        lz = lr[:, 2].reshape(4, 4)
        if lz.sum() > z_max:
            z_max = lz.sum()
            max_idx = i
    for i in range(max_idx):
        lr = tactile_lrs[i].reshape(16, 3)
        lx, ly, lz = (lr[:, c].reshape(4, 4) for c in range(3))
        if lz.sum() > z_max * threshold_scale:
            ret.append([np.flip(lx, 0), np.flip(ly, 0), np.flip(lz, 0)])
    ret = np.array(ret)
    if sample_count > 0 and len(ret):
        n = min(sample_count, ret.shape[0])
        idx = np.linspace(0, ret.shape[0] - 1, n).astype(np.int16)
        ret = ret[idx]
    return ret


def test_extract_contact_seqs_matches_reference_semantics(rng):
    rec = make_tap_record(0, rng, seqs=50)
    got = extract_contact_seqs(rec["LRs"], 0.1, -1)
    want = _ref_extract(rec["LRs"], 0.1, -1)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    got_s = extract_contact_seqs(rec["LRs"], 0.3, 16)
    want_s = _ref_extract(rec["LRs"], 0.3, 16)
    assert got_s.shape == want_s.shape == (16, 3, 4, 4)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)


def test_binarize_depth_two_pass_semantics(rng):
    # bimodal input with near-zero background (realistic depth map):
    # result is fully binary
    d = np.where(rng.random((100, 100)) > 0.6, 4.0, 0.0).astype(np.float32)
    d += 0.05 * np.abs(rng.standard_normal((100, 100))).astype(np.float32)
    out = binarize_depth(d)
    assert set(np.unique(out)).issubset({0.0, 1.0})

    # sequential two-pass semantics hold for ANY input: first threshold on
    # the original array, second on the modified one
    d2 = rng.uniform(0, 5, (100, 100)).astype(np.float32)
    ref = d2.copy()
    t1 = ref.min() * 0.5 + ref.max() * 0.5
    ref[ref > t1] = 1
    t2 = ref.min() * 0.5 + ref.max() * 0.5
    ref[~(ref > t2)] = 0
    np.testing.assert_array_equal(binarize_depth(d2), ref)


def test_binarize_depth_resizes():
    d = np.zeros((64, 64), np.float32)
    d[20:40, 20:40] = 2.0
    out = binarize_depth(d, depth_pixel=100)
    assert out.shape == (100, 100)


def test_augment_rotations_joint():
    lr = np.arange(3 * 16, dtype=np.float32).reshape(3, 4, 4)
    depth = np.arange(100.0, dtype=np.float32).reshape(10, 10)
    out = augment_rotations([{"LR": lr, "depth": depth}])
    assert len(out) == 4
    np.testing.assert_array_equal(out[1]["LR"][0], np.rot90(lr[0], 1))
    np.testing.assert_array_equal(out[3]["depth"], np.rot90(depth, 3))


def test_load_raw_dataset_and_slicing(tmp_path, rng):
    path = write_raw_blob(str(tmp_path / "X.npy"), n_taps=5, seed=1, seqs=48)
    all_samples = load_raw_dataset(path, sample_cnt=8, is_sample_idx=None)
    assert len(all_samples) == 5 * 8  # each tap yields sample_cnt frames
    assert all_samples[0]["LR"].shape == (3, 4, 4)
    assert all_samples[0]["depth"].shape == (100, 100)

    sliced = load_raw_dataset(path, sample_cnt=8, is_sample_idx=[1, 3])
    assert len(sliced) == 16
    np.testing.assert_array_equal(sliced[0]["LR"], all_samples[8]["LR"])

    aug = load_raw_dataset(path, sample_cnt=8, is_sample_idx=[0], is_aug_data=True)
    assert len(aug) == 32


def test_tpsf_dataset_walks_directory(tmp_path):
    generate_rotate_dataset(str(tmp_path), names=("A", "B"), taps_per_blob=3, seqs=40)
    ds = TPSFNetDataset(str(tmp_path), sample_cnt=4, is_sample_idx=[0, 1], is_aug_data=False)
    assert len(ds) == 2 * 4 * 2  # 2 blobs x 2 taps x 4 samples
    lr, depth = ds[0]
    assert lr.shape == (3, 4, 4) and depth.shape == (100, 100)
    a, b = ds.stacked()
    assert a.shape[0] == b.shape[0] == len(ds)


def test_single_tap_dataset(tmp_path):
    path = write_raw_blob(str(tmp_path / "I.npy"), n_taps=8, seed=2, seqs=64)
    ds = SingleTapSeqsDataset(path, [3], 10)
    assert len(ds) == 10


def test_sr_dataset_legacy_and_npz(tmp_path, rng):
    lr = rng.random((6, 3, 4, 4)).astype(np.float32)
    hr = rng.random((6, 1, 100, 100)).astype(np.float32)
    # legacy layout: object array of singleton [dict] rows
    legacy = np.empty(6, dtype=object)
    for i in range(6):
        legacy[i] = [{"LR": lr[i], "HR": hr[i], "depth": hr[i]}]
    np.save(tmp_path / "legacy.npy", legacy, allow_pickle=True)
    ds1 = TactileSRDataset(str(tmp_path / "legacy.npy"))
    np.testing.assert_array_equal(ds1.stacked()[0], lr)
    np.testing.assert_array_equal(ds1.stacked()[1], hr)

    np.savez(tmp_path / "fast.npz", LR=lr, HR=hr)
    ds2 = TactileSRDataset(str(tmp_path / "fast.npz"))
    np.testing.assert_array_equal(ds2.stacked()[0], lr)


def test_epoch_batches_padding_and_mask():
    batches = list(epoch_batches(10, 4, shuffle=False))
    assert len(batches) == 3
    idx, mask = batches[-1]
    assert len(idx) == 4 and mask.sum() == 2
    # drop_last
    assert len(list(epoch_batches(10, 4, shuffle=False, drop_last=True))) == 2


def test_epoch_batches_shuffles_deterministically():
    r1 = list(epoch_batches(10, 4, shuffle=True, rng=np.random.default_rng(7)))
    r2 = list(epoch_batches(10, 4, shuffle=True, rng=np.random.default_rng(7)))
    for (i1, m1), (i2, m2) in zip(r1, r2):
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(m1, m2)
    assert len(r1) == 3


def test_load_seq_dataset_sr(tmp_path):
    from tactilesr_tpu.data import load_seq_dataset_sr

    # 9-position grid layout: needs >= 36 taps (4*i + j + 1 <= 35)
    path = write_raw_blob(str(tmp_path / "G.npy"), n_taps=36, seed=9, seqs=30)
    out = load_seq_dataset_sr(path, sample_cnt=4)
    assert len(out) > 0
    row = out[0]
    assert row["LR_0"].shape == (3, 4, 4)
    assert row["LR_1"].shape == (3, 4, 4)
    assert row["depth"].shape == (100, 100)


def test_model_arch_srcnn_trains(tmp_path, rng):
    """model_arch='TactileSRCNN' runs through the SR recipe."""
    import jax
    import jax.numpy as jnp

    from tactilesr_tpu.config.default import tactileSR_config
    from tactilesr_tpu.runtime import LRWarmupSchedule, StepLR, adam_l2
    from tactilesr_tpu.tasks.sr_task import SRTrainer, build_model

    cfg = dict(tactileSR_config)
    cfg.update(
        save_dir=str(tmp_path / "work"),
        model_arch="TactileSRCNN",
        train_batch_size=8,
        scale_factor=4,
        warmup_t=0,
        compute_dtype="float32",
    )
    lr = (rng.random((16, 3, 4, 4)) * 4).astype(np.float32)
    hr = (rng.random((16, 1, 100, 100)) * 20).astype(np.float32)
    model = build_model(cfg)
    assert type(model).__name__ == "TactileSRCNN"
    v = jax.device_get(model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 4)), train=False))
    trainer = SRTrainer(
        config=cfg,
        model=model,
        variables={"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        tx=adam_l2(weight_decay=1e-2),
        lr_schedule=LRWarmupSchedule(StepLR(1e-4, 2, 0.8), by_epoch=True, epoch_len=2),
        train_arrays={"LR": lr, "HR": hr},
        batch_size=8,
        max_epochs=1,
        work_dir=cfg["save_dir"],
    )
    trainer.train(auto_resume=False)
    assert np.isfinite(trainer.metric_storage["total_loss"].latest)


def test_scale_depth_by_force():
    """depth *= sum(LR_z) * 0.01 in place, per the reference's dataset scaler
    (utility/raw_data_process.py:52-55)."""
    from tactilesr_tpu.data.raw_process import scale_depth_by_force

    rng = np.random.default_rng(3)
    samples = [
        {"LR": rng.random((3, 4, 4)).astype(np.float32),
         "depth": rng.random((100, 100)).astype(np.float32)}
        for _ in range(3)
    ]
    want = [s["depth"] * s["LR"][2].sum() * 0.01 for s in samples]
    got = scale_depth_by_force(samples)
    assert got is samples  # in-place, returns the same list
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["depth"], w, rtol=1e-6)


def test_single_tap_dataset_int_index_means_one_tap(tmp_path):
    """A bare-int is_sample_idx must select ONE tap (the documented
    semantics), not fall through load_raw_dataset's list-only check and
    silently load every tap."""
    path = write_raw_blob(str(tmp_path / "J.npy"), n_taps=8, seed=2, seqs=64)
    as_int = SingleTapSeqsDataset(path, 3, 10)
    as_list = SingleTapSeqsDataset(path, [3], 10)
    assert len(as_int) == len(as_list) == 10
    np.testing.assert_array_equal(as_int.stacked()[0], as_list.stacked()[0])
    # out-of-range tap: clear error, not an opaque np.stack([]) crash
    with pytest.raises(ValueError, match="no samples"):
        SingleTapSeqsDataset(path, [99], 10)


def test_load_raw_dataset_short_tap_fails_loud(tmp_path):
    """Tap-index selection slices positionally assuming sample_cnt samples
    per tap; a tap with too few pre-peak frames would silently shift every
    later tap's slice (train/test leakage), so it must raise instead."""
    

    rng = np.random.default_rng(0)
    taps = []
    for t in range(3):
        lrs = rng.random((32, 48)).astype(np.float32) * 100 + 50
        if t == 1:  # peak at frame 0 -> ZERO pre-peak contact frames
            lrs[0] += 10_000.0
        else:  # strong late peak, plenty of pre-peak frames
            lrs[:, 2::3] += np.linspace(0, 400, 32)[:, None]
        taps.append(
            np.array(
                {"sample_idx": t, "depth": rng.random((200, 200)), "LRs": lrs}
            )
        )
    path = str(tmp_path / "short.npy")
    np.save(path, np.array(taps, dtype=object), allow_pickle=True)

    with pytest.raises(ValueError, match="fell short"):
        load_raw_dataset(path, sample_cnt=8, is_sample_idx=[0, 2])
    # without index selection the variable counts are fine (flat list)
    flat = load_raw_dataset(path, sample_cnt=8)
    assert 0 < len(flat) < 3 * 8
