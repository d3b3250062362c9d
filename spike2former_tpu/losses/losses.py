"""Losses for mask-classification training.

Reference: mmdet/models/losses/{cross_entropy_loss.py, focal_loss.py,
dice_loss.py} with the exact reduction semantics the Spike2Former configs
select (class-weighted softmax CE with background weight 0.1; sigmoid focal
loss alpha=0.25 gamma=2 on ``1 - mask_target``; naive dice with eps=1.0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jax.Array,       # [N, K+1]
    labels: jax.Array,       # [N] int
    class_weight: jax.Array,  # [K+1]
    sample_weight: jax.Array | None = None,  # [N]
) -> jax.Array:
    """torch ``F.cross_entropy(weight=class_weight)`` + sum/avg_factor where
    avg_factor = sum(class_weight[labels]) (maskformer_head.py:452-457)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = class_weight[labels]
    if sample_weight is not None:
        w = w * sample_weight
    avg = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(nll * w) / avg


def sigmoid_focal_loss(
    pred: jax.Array,     # logits, any shape
    target: jax.Array,   # same shape, {0,1}
    weight: jax.Array | None = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: jax.Array | float | None = None,
) -> jax.Array:
    """py_sigmoid_focal_loss (focal_loss.py:12-60)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    p = jax.nn.sigmoid(pred)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_w = (alpha * target + (1.0 - alpha) * (1.0 - target)) * pt ** gamma
    bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = bce * focal_w
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)


def dice_loss(
    pred: jax.Array,    # [N, ...] logits or probs
    target: jax.Array,  # [N, ...] {0,1}
    weight: jax.Array | None = None,  # [N]
    eps: float = 1.0,
    naive: bool = True,
    activate: bool = True,
    avg_factor: jax.Array | float | None = None,
) -> jax.Array:
    """dice_loss (dice_loss.py:9-64) with naive_dice=True, eps=1.0."""
    pred = pred.astype(jnp.float32)
    if activate:
        pred = jax.nn.sigmoid(pred)
    n = pred.shape[0]
    p = pred.reshape(n, -1)
    t = target.astype(jnp.float32).reshape(n, -1)
    a = jnp.sum(p * t, axis=1)
    if naive:
        d = (2 * a + eps) / (jnp.sum(p, 1) + jnp.sum(t, 1) + eps)
    else:
        d = 2 * a / (jnp.sum(p * p, 1) + eps + jnp.sum(t * t, 1) + eps)
    loss = 1.0 - d
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)
