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


def focal_terms(pred: jax.Array, target: jax.Array,
                gamma: float = 2.0, alpha: float = 0.25) -> jax.Array:
    """Per-element sigmoid focal loss terms (py_sigmoid_focal_loss body,
    focal_loss.py:12-60): pred f32 logits, target f32 {0,1}.

    One transcendental pair per element: ``exp(-|x|)`` is shared between
    the sigmoid and the stable BCE ``log1p`` — at the flagship loss shapes
    these terms stream [B, G, 512, 512]-scale tensors (4 phase grids x 7
    decoder layers), so the elementwise op count is the cost.
    """
    e = jnp.exp(-jnp.abs(pred))
    p = jnp.where(pred >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    pt = (1.0 - p) * target + p * (1.0 - target)
    ptg = pt * pt if gamma == 2.0 else pt ** gamma
    focal_w = (alpha * target + (1.0 - alpha) * (1.0 - target)) * ptg
    bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(e)
    return bce * focal_w


def sigmoid_focal_loss(
    pred: jax.Array,     # logits, any shape
    target: jax.Array,   # same shape, {0,1}
    weight: jax.Array | None = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: jax.Array | float | None = None,
) -> jax.Array:
    """py_sigmoid_focal_loss (focal_loss.py:12-60)."""
    loss = focal_terms(pred.astype(jnp.float32), target.astype(jnp.float32),
                       gamma=gamma, alpha=alpha)
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
