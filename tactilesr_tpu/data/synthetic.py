"""Synthetic raw-dataset fixtures.

The reference repo's 18 raw rotateDataset blobs (letters/shapes) are large
binary files not present in its snapshot, so both its pipeline and ours need
stand-ins for testing and for end-to-end runs.  This module fabricates
``.npy`` blobs with the exact raw schema ``{sample_idx, depth (HxW),
LRs (seqs, 48)}`` (reference utility/raw_data_process.py:97-110): a shaped
contact depth map plus a simulated press sequence whose per-taxel forces ramp
up to a peak and release.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["make_tap_record", "write_raw_blob", "generate_rotate_dataset"]

_SHAPES = ("circle", "square", "triangle", "bar")


def _depth_map(shape_name: str, rng: np.random.Generator, px: int = 100) -> np.ndarray:
    """A binary-ish contact silhouette with smooth borders."""
    y, x = np.mgrid[0:px, 0:px].astype(np.float32)
    cx = px / 2 + rng.uniform(-8, 8)
    cy = px / 2 + rng.uniform(-8, 8)
    r = px * rng.uniform(0.15, 0.3)
    if shape_name == "circle":
        d = ((x - cx) ** 2 + (y - cy) ** 2) < r * r
    elif shape_name == "square":
        d = (np.abs(x - cx) < r) & (np.abs(y - cy) < r)
    elif shape_name == "triangle":
        d = (y - cy > -(r / 1.2)) & (np.abs(x - cx) < (y - cy + r) / 2)
    else:  # bar
        d = (np.abs(x - cx) < r / 3) & (np.abs(y - cy) < r * 1.4)
    depth = d.astype(np.float32)
    depth += 0.05 * rng.standard_normal((px, px)).astype(np.float32)
    return depth


def _press_sequence(
    depth: np.ndarray, seqs: int, rng: np.random.Generator
) -> np.ndarray:
    """(seqs, 48) force frames: z-forces grow with press depth where the
    object contacts each taxel's receptive field; x/y are small shear noise.
    The ramp peaks near the end, with a short release tail (so the reference
    pre-peak extraction logic has work to do)."""
    px = depth.shape[0]
    cell = px // 4
    contact = (depth > 0.5).astype(np.float32)
    taxel_area = contact.reshape(4, cell, 4, cell).mean(axis=(1, 3))  # (4,4)

    peak_t = int(seqs * 0.85)
    profile = np.zeros(seqs, np.float32)
    profile[: peak_t + 1] = np.linspace(0.02, 1.0, peak_t + 1)
    if seqs - peak_t - 1 > 0:
        profile[peak_t + 1 :] = np.linspace(0.8, 0.1, seqs - peak_t - 1)

    frames = np.zeros((seqs, 16, 3), np.float32)
    # raw taxel units: real recordings reach O(100-800) per taxel so that the
    # /scale_num(=100) scaling lands in the O(1-8) range the models expect
    base_force = rng.uniform(300.0, 800.0)
    for t in range(seqs):
        z = base_force * profile[t] * (taxel_area + 0.02)
        z = z * (1 + 0.05 * rng.standard_normal((4, 4)))
        xy = 0.1 * profile[t] * rng.standard_normal((4, 4, 2))
        # undo the sensor's vertical flip so extraction re-applies it
        frames[t, :, 2] = z[::-1].reshape(16)
        frames[t, :, 0] = xy[::-1, :, 0].reshape(16)
        frames[t, :, 1] = xy[::-1, :, 1].reshape(16)
    return frames.reshape(seqs, 48)


def make_tap_record(
    sample_idx: int,
    rng: np.random.Generator,
    shape_name: Optional[str] = None,
    seqs: int = 64,
    px: int = 100,
) -> dict:
    shape_name = shape_name or _SHAPES[sample_idx % len(_SHAPES)]
    depth = _depth_map(shape_name, rng, px)
    lrs = _press_sequence(depth, seqs, rng)
    return {"sample_idx": sample_idx, "depth": depth, "LRs": lrs}


def write_raw_blob(
    path: str,
    n_taps: int,
    seed: int = 0,
    shape_name: Optional[str] = None,
    seqs: int = 64,
    px: int = 100,
) -> str:
    """Write one raw blob with ``n_taps`` tap records (object .npy)."""
    rng = np.random.default_rng(seed)
    records = np.empty(n_taps, dtype=object)
    for i in range(n_taps):
        records[i] = make_tap_record(i, rng, shape_name, seqs, px)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, records, allow_pickle=True)
    return path


def generate_rotate_dataset(
    dataset_dir: str,
    names: Sequence[str] = ("C", "I", "P"),
    taps_per_blob: int = 81,
    seed: int = 0,
    seqs: int = 64,
) -> list:
    """A miniature rotateDataset directory: one blob per contact shape, with
    the reference's 81-taps-per-blob layout (9 translations x 9 rotations)."""
    paths = []
    for k, name in enumerate(names):
        paths.append(
            write_raw_blob(
                os.path.join(dataset_dir, f"{name}.npy"),
                n_taps=taps_per_blob,
                seed=seed + k,
                seqs=seqs,
            )
        )
    return paths
