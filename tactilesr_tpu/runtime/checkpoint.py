"""Checkpointing.

Contract parity with the reference (cpu/trainer.py:394-498,
cpu/hooks/checkpoint_hook.py): per-epoch ``epoch_{e}.ckpt`` files (or
``iter_{i}.ckpt``), a ``latest.ckpt`` symlink, ``max_to_keep`` GC, a state
bundle ``{num_devices, model, optimizer, lr_scheduler, metric_storage,
epoch|iter, hooks}``, and strict=False partial model loads that warn about
missing/unexpected keys.

Serialization is flax msgpack over plain pytrees -- single-file checkpoints,
readable anywhere, no torch. jax arrays are pulled to host numpy on save and
restored as numpy (the trainer device-puts them back with the right
sharding).
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

__all__ = [
    "save_checkpoint_file",
    "load_checkpoint_file",
    "merge_pytree_strict_false",
    "symlink",
]

logger = logging.getLogger(__name__)

CKPT_SUFFIX = ".ckpt"
LATEST_NAME = "latest" + CKPT_SUFFIX


def _to_host(tree):
    def cvt(x):
        if isinstance(x, jax.Array):
            return np.asarray(jax.device_get(x))
        return x

    return jax.tree_util.tree_map(cvt, tree)


def symlink(src: str, dst: str, overwrite: bool = True) -> None:
    """Create/refresh a relative symlink (the 'latest' tag)."""
    if osp.lexists(dst) and overwrite:
        os.remove(dst)
    os.symlink(src, dst)


def save_checkpoint_file(path: str, bundle: Dict[str, Any]) -> None:
    os.makedirs(osp.dirname(path), exist_ok=True)
    data = serialization.msgpack_serialize(_to_host(bundle))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _flatten_keys(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_keys(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = tree
    return out


def merge_pytree_strict_false(
    current: Dict[str, Any], loaded: Dict[str, Any]
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Overlay ``loaded`` onto ``current`` by flattened key intersection.

    Returns (merged, missing_keys, unexpected_keys) -- torch
    ``load_state_dict(strict=False)`` semantics.  Leaves whose shapes
    mismatch are treated as unexpected (skipped with a warning).
    """
    cur_flat = _flatten_keys(current)
    load_flat = _flatten_keys(loaded)
    missing = sorted(set(cur_flat) - set(load_flat))
    unexpected = sorted(set(load_flat) - set(cur_flat))

    merged_flat = dict(cur_flat)
    for k in set(cur_flat) & set(load_flat):
        cur_leaf, new_leaf = cur_flat[k], load_flat[k]
        cur_shape = getattr(cur_leaf, "shape", None)
        new_shape = getattr(new_leaf, "shape", None)
        if cur_shape is not None and new_shape is not None and cur_shape != new_shape:
            unexpected.append(k)
            logger.warning(
                "Shape mismatch for %s: checkpoint %s vs model %s; skipping",
                k,
                new_shape,
                cur_shape,
            )
            continue
        merged_flat[k] = new_leaf

    # rebuild by walking the CURRENT tree's structure (not the flattened
    # keys, which cannot represent empty subtrees -- a tPSFNet state has
    # batch_stats == {} and must keep that key through a resume)
    def rebuild(cur, prefix=""):
        if isinstance(cur, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in cur.items()}
        return merged_flat[prefix.rstrip("/")]

    return rebuild(current), missing, sorted(unexpected)


class CheckpointManager:
    """Directory-level manager: save/load bundles, tag latest, GC old files."""

    def __init__(self, ckpt_dir: str, max_to_keep: Optional[int] = None):
        self.ckpt_dir = ckpt_dir
        self.max_to_keep = max_to_keep
        self._saved: List[str] = []
        os.makedirs(ckpt_dir, exist_ok=True)

    def save(self, file_name: str, bundle: Dict[str, Any]) -> str:
        path = osp.join(self.ckpt_dir, file_name)
        logger.info("Saving checkpoint to %s", path)
        save_checkpoint_file(path, bundle)
        symlink(file_name, osp.join(self.ckpt_dir, LATEST_NAME))
        self._saved.append(file_name)
        if self.max_to_keep is not None and self.max_to_keep > 0:
            while len(self._saved) > self.max_to_keep:
                victim = self._saved.pop(0)
                vpath = osp.join(self.ckpt_dir, victim)
                if osp.exists(vpath):
                    os.remove(vpath)
        return path

    def latest_path(self) -> Optional[str]:
        p = osp.join(self.ckpt_dir, LATEST_NAME)
        return p if osp.exists(p) else None

    def state_dict(self) -> dict:
        return {"saved": list(self._saved)}

    def load_state_dict(self, state: dict) -> None:
        self._saved = list(state.get("saved", []))
