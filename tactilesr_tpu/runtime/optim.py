"""Optimizer construction (optax).

Parity note: ``torch.optim.Adam(weight_decay=wd)`` is Adam with *coupled* L2
regularization -- wd*param is added to the gradient BEFORE the moment
updates (not AdamW's decoupled decay).  The reference recipes rely on this
(train/tactileSR_train.py:212 with wd=1e-2; train/tPSFNet_train.py:201 with
wd=1e-5), so the chain here is: [clip] -> add_decayed_weights -> scale_by_adam.

The learning rate is intentionally NOT part of the chain: the trainer feeds
it per-step as a scalar argument into the jitted train step (host-side
schedule, zero retraces), and updates are scaled by -lr there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["adam_l2", "scale_updates_by_lr"]


def adam_l2(
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clip_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    """torch-Adam-equivalent transformation, sans learning rate."""
    parts = []
    if clip_grad_norm and clip_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*parts)


def scale_updates_by_lr(updates, lr):
    """Final -lr scaling applied inside the jitted step (lr is a traced scalar)."""
    neg_lr = -jnp.asarray(lr, jnp.float32)
    return jax.tree_util.tree_map(lambda u: neg_lr * u, updates)
