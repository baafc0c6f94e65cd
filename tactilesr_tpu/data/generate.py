"""Offline SR-dataset generation: the bridge between training stages.

A trained tPSFNet manufactures the HR labels that the SR networks train on.
Layout parity with the reference generators:

- ``generate_single_srdataset`` (reference data/SRdataset/depth2tactile.py:
  62-160): fixed train/val/test tap-index splits over the 9x9 grid, one
  record per sample ``{LR (3,4,4) [already /scale_num], depth (1,100,100),
  HR (1,100,100), LR_degrade (1,4,4), alphaBeta}``.
- ``generate_seqs_srdataset`` (reference data/SeqsDataset/
  seqsDepth2Tactile.py:20-107): index arithmetic over 18 contacts x 9
  translations x ``sample_cnt`` press depths picks 7 rotation frames
  (0..30 degrees); HR synthesized from the 30-degree frame; LR is the
  deepest-first concat (21,4,4); split by translation index
  (train {2..8} / val {1} / test {0}).

TPU-native difference: the reference loops sample-by-sample with batch=1;
here each split runs as device-batched tPSF physics (one jit, big batches),
and output goes to stacked ``.npz`` (plus optional legacy object-``.npy``).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.tpsf_net import TPSFNet
from ..ops.psf import resolve_pallas_physics, resolve_physics_precision
from ..runtime.checkpoint import load_checkpoint_file
from .datasets import TPSFNetDataset

__all__ = [
    "tpsf_apply_batched",
    "generate_single_srdataset",
    "generate_seqs_srdataset",
    "SINGLE_SPLITS",
]

logger = logging.getLogger("tactilesr_tpu")

# the reference's tap-index splits over the 9-translation x 9-rotation grid
SINGLE_SPLITS = {
    "test": [0, 6, 7, 8],
    "validation": [9 + i for i in (0, 6, 7, 8)],
    "train": [9 * k + i for k in range(2, 9) for i in (0, 6, 7, 8)],
}


def _load_tpsf(
    checkpoint_path: str,
    gama: float = 1.4,
    perception_scale=None,
    use_pallas="auto",
    physics_precision="highest",
):
    """Generation is the biggest-batch physics workload in the framework, so
    it gets the same kernel knobs as training: ``use_pallas`` (auto = TPU)
    and ``physics_precision`` ("default" = one-pass bf16 matmuls, measured
    +33% physics throughput at B=8192 on the v5e at 2e-3 rel LR deviation
    -- docs/PERF.md)."""
    model = TPSFNet(
        gama=gama,
        perception_scale=perception_scale,
        use_pallas=resolve_pallas_physics({"use_pallas_physics": use_pallas}),
        physics_precision=resolve_physics_precision(physics_precision),
    )
    bundle = load_checkpoint_file(checkpoint_path)
    params = bundle["model"]["params"]
    return model, params


# jit cache keyed on the (hashable) module config: a per-call @jax.jit
# closure would re-trace and re-compile the physics graph on EVERY call --
# generate_single_srdataset alone calls this three times (train/val/test)
_PHYSICS_FWD_CACHE: Dict = {}


def _physics_fwd(model: TPSFNet, scale_num: float):
    key = (model, scale_num)
    fn = _PHYSICS_FWD_CACHE.get(key)
    if fn is None:

        @jax.jit
        def fn(params, lr_b, depth_b):
            hr, deg, _psf, ab = model.apply(
                {"params": params},
                lr_b.astype(jnp.float32) / scale_num,
                depth_b[:, None],
                return_psf=False,
            )
            return hr, deg, ab

        _PHYSICS_FWD_CACHE[key] = fn
    return fn


def tpsf_apply_batched(
    model: TPSFNet,
    params,
    lr: np.ndarray,
    depth: np.ndarray,
    scale_num: float = 100.0,
    batch: int = 256,
) -> Dict[str, np.ndarray]:
    """Run the physics over a whole split in device-sized chunks.

    Returns stacked arrays: LR (scaled), depth (1,100,100), HR, LR_degrade,
    alphaBeta."""
    fwd = _physics_fwd(model, float(scale_num))
    outs = {"HR": [], "LR_degrade": [], "alphaBeta": []}
    n = lr.shape[0]
    pad = (-n) % batch
    lr_p = np.concatenate([lr, np.zeros((pad,) + lr.shape[1:], lr.dtype)]) if pad else lr
    d_p = (
        np.concatenate([depth, np.zeros((pad,) + depth.shape[1:], depth.dtype)])
        if pad
        else depth
    )
    for i in range(0, n + pad, batch):
        hr, deg, ab = fwd(
            params, jnp.asarray(lr_p[i : i + batch]), jnp.asarray(d_p[i : i + batch])
        )
        outs["HR"].append(np.asarray(hr))
        outs["LR_degrade"].append(np.asarray(deg))
        outs["alphaBeta"].append(np.asarray(ab[:, 0]))
    result = {k: np.concatenate(v)[:n] for k, v in outs.items()}
    result["LR"] = (lr.astype(np.float32) / scale_num)[:n]
    result["depth"] = depth[:, None].astype(np.float32)[:n]
    return result


def _save_split(
    out_dir: str, name: str, arrays: Dict[str, np.ndarray], legacy: bool
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, name + ".npz"), **arrays)
    if legacy:
        # reference schema: array of SINGLETON OBJECT ARRAYS, so that
        # ``dataset[idx].item()['LR']`` works with the reference's loader
        # (utility/load_tactile_dataset.py:39-45) -- a plain list element
        # has no .item()
        n = arrays["LR"].shape[0]
        rows = np.empty(n, dtype=object)
        for i in range(n):
            row = np.empty(1, dtype=object)
            row[0] = {k: v[i] for k, v in arrays.items()}
            rows[i] = row
        np.save(os.path.join(out_dir, name + ".npy"), rows, allow_pickle=True)
    logger.info("saved %s: %d samples", name, arrays["LR"].shape[0])


def generate_single_srdataset(
    tpsf_checkpoint: str,
    raw_dataset_dir: str,
    out_dir: str,
    sample_cnt: int = 16,
    scale_num: float = 100.0,
    gama: float = 1.4,
    legacy_npy: bool = False,
    splits: Optional[Dict[str, Sequence[int]]] = None,
    use_pallas="auto",
    physics_precision="highest",
    batch: int = 256,
) -> Dict[str, str]:
    """Single-frame SRdataset: {LR, depth, HR, LR_degrade, alphaBeta} per split."""
    model, params = _load_tpsf(
        tpsf_checkpoint, gama,
        use_pallas=use_pallas, physics_precision=physics_precision,
    )
    splits = splits or SINGLE_SPLITS
    paths = {}
    for split, idx in splits.items():
        ds = TPSFNetDataset(
            raw_dataset_dir, sample_cnt=sample_cnt, is_sample_idx=list(idx),
            is_aug_data=False,
        )
        lr, depth = ds.stacked()
        arrays = tpsf_apply_batched(model, params, lr, depth, scale_num, batch)
        name = f"SRdataset_{split}"
        _save_split(out_dir, name, arrays, legacy_npy)
        paths[split] = os.path.join(out_dir, name + ".npz")
    return paths


def generate_seqs_srdataset(
    tpsf_checkpoint: str,
    raw_dataset_dir: str,
    out_dir: str,
    sample_cnt: int = 16,
    scale_num: float = 100.0,
    gama: float = 1.4,
    n_contacts: int = 18,
    n_translations: int = 9,
    legacy_npy: bool = False,
    suffix: str = "_32",
    use_pallas="auto",
    physics_precision="highest",
    batch: int = 256,
) -> Dict[str, str]:
    """Multi-frame SeqsDataset: 7 rotation frames deepest-first -> (21,4,4) LR."""
    model, params = _load_tpsf(
        tpsf_checkpoint, gama,
        use_pallas=use_pallas, physics_precision=physics_precision,
    )
    ds = TPSFNetDataset(
        raw_dataset_dir,
        sample_cnt=sample_cnt,
        is_sample_idx=list(range(0, n_translations * 9)),
        is_aug_data=False,
    )
    lr_all, depth_all = ds.stacked()
    taps_per_contact = sample_cnt * n_translations * 9

    def flat_index(contact, trans, rot, seq):
        return seq + sample_cnt * (rot + trans * 9) + taps_per_contact * contact

    collected = {"train": [], "validation": [], "test": []}
    split_of_trans = {0: "test", 1: "validation"}
    n_avail = lr_all.shape[0]
    for contact in range(n_contacts):
        for trans in range(n_translations):
            for seq in range(sample_cnt):
                # rotations 0,5,...,25 degrees use the deepest press frame;
                # the 30-degree frame sweeps the press sequence
                idxs = [flat_index(contact, trans, rot, sample_cnt - 1) for rot in range(6)]
                idx30 = flat_index(contact, trans, 6, seq)
                if max(idxs + [idx30]) >= n_avail:
                    continue
                frames = [lr_all[idx30]] + [lr_all[i] for i in reversed(idxs)]
                lr_cat = np.concatenate(frames, axis=0).astype(np.float32) / scale_num
                collected[split_of_trans.get(trans, "train")].append(
                    (lr_cat, depth_all[idx30], idx30)
                )

    paths: Dict[str, str] = {}
    for split, rows in collected.items():
        if not rows:
            logger.warning("seqs split '%s' is empty", split)
            continue
        lr_cat = np.stack([r[0] for r in rows])
        depth = np.stack([r[1] for r in rows])
        idx30 = np.asarray([r[2] for r in rows])
        phys = tpsf_apply_batched(
            model, params, lr_all[idx30], depth_all[idx30], scale_num, batch
        )
        arrays = {
            "LR": lr_cat,  # (N, 21, 4, 4), already scaled
            "depth": depth[:, None].astype(np.float32),
            "HR": phys["HR"],
        }
        name = f"SRdataset_{split}{suffix}"
        _save_split(out_dir, name, arrays, legacy_npy)
        paths[split] = os.path.join(out_dir, name + ".npz")
    return paths


def _cli():
    import argparse

    from .. import maybe_force_platform

    maybe_force_platform()

    from ..runtime.logger import setup_logger
    from .synthetic import generate_rotate_dataset

    setup_logger("tactilesr_tpu")
    p = argparse.ArgumentParser(
        prog="python -m tactilesr_tpu.data.generate",
        description="Dataset generation: synthetic raw blobs, SRdataset, SeqsDataset",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synthetic", help="fabricate raw rotateDataset blobs")
    ps.add_argument("--out-dir", required=True)
    ps.add_argument("--names", nargs="+", default=["C", "I", "P"])
    ps.add_argument("--taps-per-blob", type=int, default=81)
    ps.add_argument("--seqs", type=int, default=64)
    ps.add_argument("--seed", type=int, default=0)

    for name in ("single", "seqs"):
        pg = sub.add_parser(name, help=f"generate the {name}-frame SR dataset")
        pg.add_argument("--tpsf-checkpoint", required=True)
        pg.add_argument("--raw-dir", required=True)
        pg.add_argument("--out-dir", required=True)
        pg.add_argument("--sample-cnt", type=int, default=16)
        pg.add_argument("--scale-num", type=float, default=100.0)
        pg.add_argument("--gama", type=float, default=1.4)
        pg.add_argument("--legacy-npy", action="store_true")
        pg.add_argument(
            "--use-pallas", default="auto",
            help="fused physics kernel: auto (TPU-only, the default)|true|false",
        )
        pg.add_argument(
            "--physics-precision", default="highest",
            choices=["highest", "high", "default"],
            help="Pallas in-kernel matmul precision; 'default' (bf16 one-pass)"
            " is ~1.3x faster physics at 2e-3 rel LR deviation",
        )
        pg.add_argument(
            "--batch", type=int, default=256,
            help="physics device batch; raise (e.g. 8192) to saturate a TPU",
        )
        if name == "seqs":
            pg.add_argument("--n-contacts", type=int, default=18)
            pg.add_argument("--n-translations", type=int, default=9)

    args = p.parse_args()
    if args.cmd == "synthetic":
        paths = generate_rotate_dataset(
            args.out_dir,
            names=tuple(args.names),
            taps_per_blob=args.taps_per_blob,
            seed=args.seed,
            seqs=args.seqs,
        )
        print("\n".join(paths))
    elif args.cmd == "single":
        paths = generate_single_srdataset(
            args.tpsf_checkpoint, args.raw_dir, args.out_dir,
            sample_cnt=args.sample_cnt, scale_num=args.scale_num,
            gama=args.gama, legacy_npy=args.legacy_npy,
            use_pallas=args.use_pallas,
            physics_precision=args.physics_precision, batch=args.batch,
        )
        print("\n".join(f"{k}: {v}" for k, v in paths.items()))
    else:
        paths = generate_seqs_srdataset(
            args.tpsf_checkpoint, args.raw_dir, args.out_dir,
            sample_cnt=args.sample_cnt, scale_num=args.scale_num,
            gama=args.gama, legacy_npy=args.legacy_npy,
            n_contacts=args.n_contacts, n_translations=args.n_translations,
            use_pallas=args.use_pallas,
            physics_precision=args.physics_precision, batch=args.batch,
        )
        print("\n".join(f"{k}: {v}" for k, v in paths.items()))


if __name__ == "__main__":
    _cli()
