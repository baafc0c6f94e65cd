"""Batching: a host-side loader (torch-DataLoader-shaped) and the TPU-native
device-resident pipeline.

The TPU path (``DeviceData``): the entire (small) dataset is device_put into
HBM once, sharded along the batch axis of the mesh; each step receives a
batch of *indices* and gathers rows inside the jitted step.  No host<->device
copies per iteration, no host collate -- this replaces the reference's
per-iter ``.to(device)`` (train/tactileSR_train.py:43) entirely.

Partial final batches are padded to the fixed batch size and carry a
``mask`` so compiled shapes stay static while loss/metrics stay exact
(torch DataLoader drop_last=False parity).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HostLoader", "DeviceData", "epoch_batches"]


def epoch_batches(
    n: int,
    batch_size: int,
    shuffle: bool,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (padded index array of len batch_size, validity mask)."""
    order = np.arange(n)
    if shuffle:
        assert rng is not None, "shuffle requires an rng"
        order = rng.permutation(n)
    num = n // batch_size if drop_last else math.ceil(n / batch_size)
    for b in range(num):
        idx = order[b * batch_size : (b + 1) * batch_size]
        mask = np.ones(len(idx), np.float32)
        if len(idx) < batch_size:  # pad final batch; mask the padding out
            pad = batch_size - len(idx)
            idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])
        yield idx, mask


class HostLoader:
    """Minimal epoch iterator over stacked arrays, yielding numpy batches.

    Matches the access pattern of the reference's DataLoader usage (shuffle
    per epoch, stable order when shuffle=False).  ``__len__`` is the number
    of batches per epoch (drop_last=False).
    """

    def __init__(
        self,
        arrays: Tuple[np.ndarray, ...],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
    ):
        assert len({a.shape[0] for a in arrays}) == 1, "arrays must align"
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self.n = arrays[0].shape[0]

    def __len__(self):
        return (
            self.n // self.batch_size
            if self.drop_last
            else math.ceil(self.n / self.batch_size)
        )

    def __iter__(self):
        for idx, mask in epoch_batches(
            self.n, self.batch_size, self.shuffle, self._rng, self.drop_last
        ):
            yield tuple(a[idx] for a in self.arrays) + (mask,)


class DeviceData:
    """HBM-resident dataset with on-device gather batching.

    ``put`` uploads stacked arrays once (replicated, or sharded along the
    mesh 'data' axis when a sharding is given).  ``gather(arrays, idx)`` is
    meant to run *inside* jit: ``jnp.take`` of the batch rows.
    """

    def __init__(self, arrays: Dict[str, np.ndarray], sharding=None):
        self.n = next(iter(arrays.values())).shape[0]
        if sharding is not None:
            self.arrays = {
                k: jax.device_put(v, sharding) for k, v in arrays.items()
            }
        else:
            self.arrays = {k: jax.device_put(v) for k, v in arrays.items()}

    @staticmethod
    def take(array, idx):
        return jnp.take(array, idx, axis=0)

    def batch(self, idx):
        """Host-callable convenience (still lazy): dict of gathered rows."""
        return {k: self.take(v, idx) for k, v in self.arrays.items()}
