"""Sine positional encoding (DETR style).

Reference: mmdet/models/layers/positional_encoding.py:14-109
(SinePositionalEncoding, num_feats=128, temperature=10000, normalize=True,
scale=2*pi, eps=1e-6, offset=0).

The reference builds the embedding from a padding mask via cumsum; in the
active Spike2Former path the mask is always all-valid (maskformer_head.py
:542-545 passes ``new_zeros``), so the embedding is a pure function of
(H, W) that we can precompute per shape.  The mask-aware form is kept for
parity with padded batches.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sine_positional_encoding(
    mask: jax.Array,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
    offset: float = 0.0,
) -> jax.Array:
    """mask: [B, H, W] (True/1 = padded).  Returns [B, H, W, 2*num_feats]
    (channels-last; reference returns [B, 2*num_feats, H, W])."""
    not_mask = 1.0 - mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    b, h, w = mask.shape
    pos_x = jnp.stack(
        (jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])), axis=4
    ).reshape(b, h, w, -1)
    pos_y = jnp.stack(
        (jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])), axis=4
    ).reshape(b, h, w, -1)
    return jnp.concatenate((pos_y, pos_x), axis=3)


def sine_pe_for_shape(h: int, w: int, num_feats: int = 128) -> jax.Array:
    """All-valid-mask PE for a static (h, w): [h, w, 2*num_feats]."""
    mask = jnp.zeros((1, h, w), jnp.float32)
    return sine_positional_encoding(mask, num_feats)[0]
