"""Raw rotateDataset processing: contact-sequence extraction, depth
binarization, rotation augmentation.

Behavioral parity targets (reference utility/raw_data_process.py):
- ``extract_contact_seqs`` == getContactTactileSeqs (:14-50): from a
  (seqs, 48) tap recording, find the peak-force frame by z-sum, keep the
  *pre-peak* frames whose z-sum exceeds ``threshold_scale`` x peak, flip every
  4x4 map vertically (sensor orientation), and uniformly subsample to
  ``sample_count`` frames.
- ``binarize_depth`` == the two sequential in-place thresholds of
  loadRawDataset (:104-107), including the quirk that the second threshold is
  computed on the already-modified array; followed by a bilinear resize to
  ``depth_pixel`` (cv2.INTER_LINEAR half-pixel convention == our torch-parity
  resize matrices).
- ``augment_rotations`` == augmentData (:57-95): x4 dataset via joint rot90 of
  all LR channels and the depth map.
- ``load_raw_dataset`` == loadRawDataset (:97-130): schema
  ``{sample_idx, depth(HxW), LRs(seqs,48)}`` pickled dicts in one ``.npy``.

Everything here is host-side numpy executed once at dataset build; the
variable-length contact extraction is padded/subsampled to fixed
``sample_cnt`` before anything reaches the device (static shapes for XLA).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

import numpy as np

from ..ops.resize import bilinear_resize_matrix

__all__ = [
    "extract_contact_seqs",
    "binarize_depth",
    "augment_rotations",
    "scale_depth_by_force",
    "load_raw_dataset",
    "load_seq_dataset_sr",
    "frames_to_maps",
]


def _use_native() -> bool:
    """Dispatch to the C++ preprocessing library unless disabled via
    ``TACTILESR_NATIVE=0``; silently falls back when no toolchain built it
    (numpy and native paths are parity-tested against each other)."""
    if os.environ.get("TACTILESR_NATIVE", "1") == "0":
        return False
    from .. import native

    return native.available()


def frames_to_maps(tactile_lrs: np.ndarray) -> np.ndarray:
    """(seqs, 48) raw taxel frames -> (seqs, 3, 4, 4) [x, y, z] force maps.

    Each frame is 16 taxels x 3 axes, taxel-major; each axis map is read out
    as a 4x4 grid and flipped vertically (sensor orientation convention).
    """
    seqs = tactile_lrs.shape[0]
    maps = tactile_lrs.reshape(seqs, 16, 3).transpose(0, 2, 1).reshape(seqs, 3, 4, 4)
    return maps[:, :, ::-1, :]  # np.flip(axis=0) of each 4x4 map


def extract_contact_seqs(
    tactile_lrs: np.ndarray,
    threshold_scale: float = 0.1,
    sample_count: int = -1,
) -> np.ndarray:
    """Pre-peak contact frames from one tap, as (n, 3, 4, 4).

    Peak = frame with the largest z-sum (strictly-greater scan, so the first
    maximal frame wins); kept frames are those BEFORE the peak whose z-sum
    exceeds threshold_scale * peak.  Uniform linspace subsample to
    ``sample_count`` when requested.
    """
    tactile_lrs = np.asarray(tactile_lrs)
    if _use_native():
        from ..native import extract_contact_seqs_native

        return extract_contact_seqs_native(tactile_lrs, threshold_scale, sample_count)
    maps = frames_to_maps(tactile_lrs)  # (seqs, 3, 4, 4), already flipped
    z_sums = maps[:, 2].sum(axis=(1, 2))  # flip does not change sums

    peak = 0.0
    peak_idx = 0
    for i, s in enumerate(z_sums):
        if s > peak:
            peak = s
            peak_idx = i

    keep = np.nonzero(z_sums[:peak_idx] > peak * threshold_scale)[0]
    kept = maps[keep]

    if sample_count > 0 and kept.shape[0] > 0:
        n = min(sample_count, kept.shape[0])
        idx = np.linspace(0, kept.shape[0] - 1, n).astype(np.int16)
        kept = kept[idx]
    return np.ascontiguousarray(kept)


def binarize_depth(depth: np.ndarray, depth_pixel: int = 100) -> np.ndarray:
    """Two-pass midpoint binarization + bilinear resize to (depth_pixel,)*2.

    Pass 1 sets values above the original midpoint to 1; pass 2 recomputes
    the midpoint on the *modified* array and zeros everything not above it
    (reproducing the reference's sequential in-place thresholds).
    """
    if _use_native():
        from ..native import binarize_depth_native

        return binarize_depth_native(np.asarray(depth, np.float32), depth_pixel)
    d = np.array(depth, dtype=np.float32, copy=True)
    t1 = d.min() * 0.5 + d.max() * 0.5
    d[d > t1] = 1.0
    t2 = d.min() * 0.5 + d.max() * 0.5
    d[~(d > t2)] = 0.0

    if d.shape != (depth_pixel, depth_pixel):
        wh = bilinear_resize_matrix(d.shape[0], depth_pixel)
        ww = bilinear_resize_matrix(d.shape[1], depth_pixel)
        d = wh @ d @ ww.T
    return d.astype(np.float32)


def scale_depth_by_force(samples: List[dict]) -> List[dict]:
    """In-place: depth *= sum(LR_z) * 0.01 -- the reference's
    ``depth2tactile`` dataset scaler (utility/raw_data_process.py:52-55),
    kept for API completeness."""
    for s in samples:
        s["depth"] = s["depth"] * s["LR"][2].sum() * 0.01
    return samples


def augment_rotations(samples: List[dict]) -> List[dict]:
    """x4 dataset: original + joint rot90/180/270 of LR channels and depth."""
    out: List[dict] = []
    for s in samples:
        out.append({"LR": s["LR"], "depth": s["depth"]})
        for k in (1, 2, 3):
            lr = np.stack([np.rot90(s["LR"][c], k) for c in range(s["LR"].shape[0])])
            out.append({"LR": lr, "depth": np.rot90(s["depth"], k)})
    return out


def load_raw_dataset(
    dataset_filepath: str,
    sample_cnt: int,
    is_sample_idx: Union[Sequence[int], int, None] = None,
    idx_threshold_scale: float = 0.3,
    depth_pixel: int = 100,
    is_aug_data: bool = False,
) -> List[dict]:
    """Load one raw ``.npy`` of pickled tap dicts into flat
    ``{LR (3,4,4), depth (100,100)}`` samples.

    ``is_sample_idx``: when a list, selects taps by index assuming each tap
    contributed exactly ``sample_cnt`` samples (the reference's slicing
    contract); otherwise all samples are returned.
    """
    raw = np.load(dataset_filepath, allow_pickle=True)
    samples: List[dict] = []
    short_taps: List[tuple] = []
    for tap_no, rec in enumerate(raw):
        rec = rec.item() if hasattr(rec, "item") and not isinstance(rec, dict) else rec
        depth = binarize_depth(np.asarray(rec["depth"]), depth_pixel)
        lr_seqs = extract_contact_seqs(
            np.asarray(rec["LRs"]),
            threshold_scale=idx_threshold_scale,
            sample_count=sample_cnt,
        )
        if sample_cnt > 0 and lr_seqs.shape[0] != sample_cnt:
            short_taps.append((tap_no, lr_seqs.shape[0]))
        for i in range(lr_seqs.shape[0]):
            samples.append({"LR": lr_seqs[i], "depth": depth})

    if isinstance(is_sample_idx, (list, tuple, np.ndarray)):
        if short_taps:
            # the positional slicing below assumes EVERY tap contributed
            # exactly sample_cnt samples (the reference's contract,
            # utility/raw_data_process.py:121-126); a short tap shifts every
            # later tap's slice -- silent train/test leakage.  Fail loud.
            raise ValueError(
                f"{dataset_filepath}: tap-index selection requires every tap "
                f"to contribute exactly sample_cnt={sample_cnt} samples, but "
                f"{len(short_taps)} tap(s) fell short (tap, n): "
                f"{short_taps[:5]}{' ...' if len(short_taps) > 5 else ''} -- "
                "the tap has too few pre-peak contact frames; lower "
                "sample_cnt or drop the tap from the blob"
            )
        picked: List[dict] = []
        for idx in is_sample_idx:
            assert idx >= 0, "sample index should be >= 0"
            picked += samples[idx * sample_cnt : (idx + 1) * sample_cnt]
        samples = picked

    if is_aug_data:
        samples = augment_rotations(samples)
    return samples


def load_seq_dataset_sr(
    dataset_filepath: str,
    sample_cnt: int,
    idx_threshold_scale: float = 0.3,
    depth_pixel: int = 100,
) -> List[dict]:
    """Rot0/rot30 tap pairing over the 9-position grid layout (capability
    parity with the reference's loadSeqDataset_SR, which its pipeline never
    calls; kept for API completeness).  Yields
    ``{LR_0 (3,4,4), LR_1 (3,4,4), depth}`` pairs.
    """
    raw = np.load(dataset_filepath, allow_pickle=True)

    def tap(i):
        rec = raw[i]
        return rec.item() if hasattr(rec, "item") and not isinstance(rec, dict) else rec

    out: List[dict] = []
    for i in range(9):
        pairs = [(4 * i + j, 4 * i + j + 1) for j in range(3)] + [(4 * i + 2, 4 * i + 1)]
        for idx0, idx30 in pairs:
            rec0, rec30 = tap(idx0), tap(idx30)
            depth = binarize_depth(np.asarray(rec30["depth"]), depth_pixel)
            lr0 = extract_contact_seqs(
                np.asarray(rec0["LRs"]), idx_threshold_scale, sample_cnt
            )
            lr_seqs = extract_contact_seqs(
                np.asarray(rec30["LRs"]), idx_threshold_scale, sample_cnt
            )
            if lr0.shape[0] == 0:
                continue
            for k in range(lr_seqs.shape[0]):
                out.append({"LR_0": lr0[-1], "LR_1": lr_seqs[k], "depth": depth})
    return out
