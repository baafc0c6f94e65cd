"""Batching: the single data API of the TPU-native pipeline.

``epoch_batches`` yields (index, mask) pairs per epoch; the entire (small)
dataset is placed into HBM once by the Trainer (replicated over the mesh via
``parallel.mesh.put_global``) and each jitted step gathers its batch rows
on-device by index.  No host<->device copies per iteration, no host collate
-- this replaces the reference's per-iter DataLoader + ``.to(device)``
(train/tactileSR_train.py:43) entirely.

Partial final batches are padded to the fixed batch size and carry a
``mask`` so compiled shapes stay static while loss/metrics stay exact
(torch DataLoader drop_last=False parity).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["epoch_batches"]


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
