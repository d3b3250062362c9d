"""Spiking DETR transformer decoder.

Reference: mmdet/models/layers/transformer/detr_layers.py —
``DetrTransformerDecoder`` (:112-185, return_intermediate, post-norm
disabled) and the active ``DetrTransformerDecoderLayer`` (:417-559):
cross-attn → self-attn → FFN, residual adds in the layer, all attention
softmax-free spiking MHA with positional embeddings added to query/key
(mmcv_spike/transformer.py:626-629).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MSDAFFN, SpikeMHA


class DetrDecoderLayer(nn.Module):
    """``order='ca_sa'`` (default) is the active DetrTransformerDecoderLayer
    (cross → self → FFN, detr_layers.py:530-556); ``order='sa_ca'`` is the
    alternative Spike2FormerTransformerDecoderLayer ordering (self → cross
    → FFN, Spike2former_layers.py:154-215).  Residual adds stay in the
    layer for both orders, matching the active path's convention."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    spike: str = "qspike"
    order: str = "ca_sa"
    compat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, query_pos, key_pos,
                 cross_attn_mask=None, self_attn_mask=None,
                 train: bool = False):
        """query [T,B,nq,C]; key/value [T,B,nk,C]; *_pos [B,n,C]
        (broadcast over T)."""

        def cross(q):
            # factored (right-associated) attention kills the [nq, nk]
            # score tensor over the big pixel-token levels; compat mode
            # keeps the reference's dense summation order (see SpikeMHA).
            return q + SpikeMHA(
                self.embed_dims, self.num_heads, self.spike, self.dtype,
                factored=not self.compat,
                name="cross_attn")(
                q + query_pos, key + key_pos, value,
                attn_mask=cross_attn_mask, train=train)

        def self_(q):
            return q + SpikeMHA(
                self.embed_dims, self.num_heads, self.spike, self.dtype,
                name="self_attn")(
                q + query_pos, q + query_pos, q,
                attn_mask=self_attn_mask, train=train)

        if self.order == "ca_sa":
            query = self_(cross(query))
        elif self.order == "sa_ca":
            query = cross(self_(query))
        else:
            raise ValueError(f"unknown order {self.order!r}")

        query = query + MSDAFFN(
            self.embed_dims, self.feedforward_channels, spike=self.spike,
            compat=self.compat, dtype=self.dtype, name="ffn")(query, train)
        return query
