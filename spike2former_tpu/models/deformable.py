"""Spiking multi-scale deformable attention + Deformable-DETR encoder.

Reference: mmdet/models/layers/transformer/mmcv_spike/
multi_scale_deform_attn.py:175-414 (``SpikeMultiScaleDeformableAttention``:
conv1d+BN projection heads wrapped in MultiSpike_norm4 quantizers, and —
distinctively — the attention weights are scaled by ``C^-0.5`` and passed
through a SPIKE instead of a softmax, :375-383) and
deformable_detr_layers.py:357-400
(``SpikeDeformableDetrTransformerEncoderLayer``: layer-scale 1e-6
residuals around attention and MSDA_FFN) with the reference-point grid of
:76-113.

The CUDA ``ms_deform_attn`` op is replaced by the parity-tested selector
contraction in ``ops/msda.py``.  Layout [T, B, N, C] (T folded for convs).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.msda import ms_deform_attn
from .attention import TokenConvBN
from .layers import Spike, fold_t, unfold_t


def encoder_reference_points(spatial_shapes: Sequence[tuple[int, int]]
                             ) -> jax.Array:
    """Normalized per-level center-of-pixel reference points
    (deformable_detr_layers.py get_encoder_reference_points, valid
    ratios = 1).  Returns [sum(H*W), L, 2] (x, y) in [0, 1]."""
    num_levels = len(spatial_shapes)
    refs = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(refs, 0)                        # [N, 2]
    return jnp.asarray(np.broadcast_to(ref[:, None], (ref.shape[0],
                                                      num_levels, 2)))


class SpikeMSDeformAttention(nn.Module):
    """query/value [T, B, N, C]; reference_points [N, L, 2] or
    [B, N, L, 2] normalized (x, y); spatial_shapes static ((H, W), ...)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    spike: str = "multispike_norm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, reference_points, spatial_shapes,
                 query_pos=None, train: bool = False):
        t, b, nq, c = query.shape
        nv = value.shape[2]
        h, lv, p = self.num_heads, self.num_levels, self.num_points
        if query_pos is not None:
            query = query + query_pos

        # value: spike -> conv1d+BN -> spike (:366-370)
        val = Spike(self.spike)(TokenConvBN(
            self.embed_dims, self.spike, self.dtype, name="value_proj")(
            value, train))
        val = val.reshape(t * b, nv, h, c // h)

        # sampling offsets: spike -> conv1d+BN (:372-373)
        off = TokenConvBN(h * lv * p * 2, self.spike, self.dtype,
                          name="sampling_offsets")(query, train)
        off = off.reshape(t * b, nq, h, lv, p, 2)

        # attention weights: spike -> conv1d+BN, * C^-0.5, then SPIKE in
        # place of the usual softmax (:375-383)
        wgt = TokenConvBN(h * lv * p, self.spike, self.dtype,
                          name="attention_weights")(query, train)
        wgt = Spike(self.spike)(wgt * (self.embed_dims ** -0.5))
        wgt = wgt.reshape(t * b, nq, h, lv, p)

        ref = jnp.asarray(reference_points, jnp.float32)
        if ref.ndim == 3:
            ref = ref[None]                              # [1, N, L, 2]
        norm = jnp.asarray([(w_, h_) for h_, w_ in spatial_shapes],
                           jnp.float32)                  # [L, 2] (w, h)
        loc = (ref[:, :, None, :, None, :]
               + off / norm[None, None, None, :, None, :])

        out = ms_deform_attn(val, tuple(spatial_shapes), loc, wgt)
        out = unfold_t(out.reshape(t * b, nq, c), t)

        # output: spike -> conv1d+BN (:409)
        return TokenConvBN(self.embed_dims, self.spike, self.dtype,
                           name="output_proj")(out, train)


class SpikeDeformableEncoderLayer(nn.Module):
    """x += γ1·MSDeformAttn(x); x += γ2·MSDA_FFN(x) with layer-scale 1e-6
    (deformable_detr_layers.py:357-400)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024
    layer_scale: float = 1e-6
    spike: str = "multispike_norm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, spatial_shapes,
                 query_pos=None, train: bool = False):
        from .attention import MSDAFFN

        init = nn.initializers.constant(self.layer_scale)
        g1 = self.param("gamma1", init, (self.embed_dims,))
        g2 = self.param("gamma2", init, (self.embed_dims,))
        attn = SpikeMSDeformAttention(
            self.embed_dims, self.num_heads, self.num_levels,
            self.num_points, self.spike, self.dtype, name="self_attn")(
            query, query, reference_points, spatial_shapes,
            query_pos=query_pos, train=train)
        query = query + g1 * attn
        ffn = MSDAFFN(self.embed_dims, self.feedforward_channels,
                      spike="qspike", dtype=self.dtype,
                      name="ffn")(query, train)
        return query + g2 * ffn


class SpikeDeformableEncoder(nn.Module):
    """N stacked deformable encoder layers over flattened multi-level
    tokens (SpikeDeformableDetrTransformerEncoder,
    deformable_detr_layers.py:23-75)."""

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 1024
    spike: str = "multispike_norm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, spatial_shapes, query_pos=None,
                 train: bool = False):
        ref = encoder_reference_points(spatial_shapes)
        for i in range(self.num_layers):
            query = SpikeDeformableEncoderLayer(
                self.embed_dims, self.num_heads, len(spatial_shapes),
                self.num_points, self.feedforward_channels,
                spike=self.spike, dtype=self.dtype, name=f"layer_{i}")(
                query, ref, spatial_shapes, query_pos=query_pos,
                train=train)
        return query
