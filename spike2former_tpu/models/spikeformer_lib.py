"""The spikeformer attention library + BASE_Transformer decoder layer +
QueryProposal — the last SURVEY-named transformer support components.

Reference:
* mmdet/models/layers/transformer/mmcv_spike/spikeformer.py —
  ``SelfAttention`` (:193-277), ``CrossAttention`` (:280-435), ``MLP``
  (:438-483): Multispike_norm4-quantized attention blocks (Conv1d+BN1d
  projections, fixed score scale 0.1, softmax-free, residual INSIDE the
  block) used by ``Spike2FormerTransformerDecoderLayer``
  (Spike2former_layers.py:83-216, SA→CA→FFN order).
* mmdet/models/layers/transformer/mmcv_spike/BASE_Transformer.py —
  ``TransformerDecoderLayer`` (:229-313): the 'norm' spiking MHA pair +
  MSDA_FFN under layer-scale gammas (1e-6) with EXTERNAL residuals.
* mmdet/models/layers/transformer/utils.py — ``QueryProposal``
  (:880-949): spike-conv class logits → per-pixel argmax one-hot gating →
  8-neighbour local-maximum boost → top-k pixel proposals as queries.

Upstream status notes (kept for the parity trail): none of these are on
the shipped config path.  spikeformer.CrossAttention.forward references an
undefined name (``MultiSpike4.quant4``, :393) and SepConv there uses
never-constructed ``self.lif1/lif2`` (:145-148) — the file cannot execute
upstream as written; this rebuild implements the evident intent (the
Multispike_norm4 head spike, without the dead double-quant line).
Tokens are [T, B, N, C] channels-last; Conv1d(k=1)+BN1d stacks become
pointwise Dense + BN over (T*B, N) per channel, identical statistics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import (MSDAFFN, SpikeMultiheadAttention, _merge_heads,
                        _split_heads)
from .layers import BatchNorm, Spike, fold_t, unfold_t


class _ProjBN(nn.Module):
    """Conv1d(k=1) + BatchNorm1d on [T, B, N, C] tokens (channel-last)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xf, t = fold_t(x)
        xf = nn.Dense(self.features, dtype=self.dtype)(xf)
        xf = BatchNorm(use_running_average=not train)(xf)
        return unfold_t(xf, t)


class SpikeformerSelfAttention(nn.Module):
    """spikeformer.py ``SelfAttention`` (:193-277).

    x = query + query_pos; head spike (Multispike_norm4); q/k/v =
    Conv1d+BN1d; per-branch spikes; multi-head ``q k^T * 0.1`` (NO
    softmax, fixed scale :204); ``@ v``; attn spike; proj Conv1d+BN1d;
    residual ``+ (query + query_pos)`` inside the block (:277).
    """

    embed_dims: int
    num_heads: int = 8
    spike: str = "multispike_norm"
    scale: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, query_pos=None, attn_mask=None,
                 train: bool = False):
        x = query if query_pos is None else query + query_pos
        tmp = x
        x = Spike(self.spike, name="head_lif")(x)
        q = _ProjBN(self.embed_dims, self.dtype, name="q_conv")(x, train)
        k = _ProjBN(self.embed_dims, self.dtype, name="k_conv")(x, train)
        v = _ProjBN(self.embed_dims, self.dtype, name="v_conv")(x, train)
        q = Spike(self.spike, name="q_lif")(q)
        k = Spike(self.spike, name="k_lif")(k)
        v = Spike(self.spike, name="v_lif")(v)

        qh, kh, vh = (_split_heads(y, self.num_heads) for y in (q, k, v))
        scores = jnp.einsum("...nc,...mc->...nm", qh, kh,
                            preferred_element_type=jnp.float32) * self.scale
        if attn_mask is not None:
            # bool mask entries are ZEROED (:421-423 — "already sparse")
            scores = jnp.where(attn_mask, 0.0, scores)
        out = jnp.einsum(
            "...nm,...mc->...nc", scores.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32).astype(q.dtype)
        out = _merge_heads(out)
        out = Spike(self.spike, name="attn_lif")(out)
        out = _ProjBN(self.embed_dims, self.dtype, name="proj_conv")(
            out, train)
        return out + tmp


class SpikeformerCrossAttention(nn.Module):
    """spikeformer.py ``CrossAttention`` (:280-435).

    q from queries, k from keys; **value = the spiked key path** (:394 —
    ``value = key`` after ``head_lif_k``, the v branch consumes it through
    its own conv).  Residual is the pos-added query ``q_t`` (:435).  A
    boolean attn_mask zeroes scores; a float mask adds (:419-425).
    """

    embed_dims: int
    num_heads: int = 8
    spike: str = "multispike_norm"
    scale: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos=None, key_pos=None,
                 attn_mask=None, train: bool = False):
        q_t = query if query_pos is None else query + query_pos
        key = key if key_pos is None else key + key_pos

        xq = Spike(self.spike, name="head_lif_q")(q_t)
        xk = Spike(self.spike, name="head_lif_k")(key)

        q = _ProjBN(self.embed_dims, self.dtype, name="q_conv")(xq, train)
        k = _ProjBN(self.embed_dims, self.dtype, name="k_conv")(xk, train)
        v = _ProjBN(self.embed_dims, self.dtype, name="v_conv")(xk, train)
        q = Spike(self.spike, name="q_lif")(q)
        k = Spike(self.spike, name="k_lif")(k)
        v = Spike(self.spike, name="v_lif")(v)

        qh, kh, vh = (_split_heads(y, self.num_heads) for y in (q, k, v))
        scores = jnp.einsum("...nc,...mc->...nm", qh, kh,
                            preferred_element_type=jnp.float32) * self.scale
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                scores = jnp.where(attn_mask, 0.0, scores)
            else:
                scores = scores + attn_mask
        out = jnp.einsum(
            "...nm,...mc->...nc", scores.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32).astype(q.dtype)
        out = _merge_heads(out)
        out = Spike(self.spike, name="attn_lif")(out)
        out = _ProjBN(self.embed_dims, self.dtype, name="proj_conv")(
            out, train)
        return out + q_t


class SpikeformerMLP(nn.Module):
    """spikeformer.py ``MLP`` (:438-483): spike→Conv1d+BN1d→spike→
    Conv1d+BN1d with the residual inside (:483)."""

    embed_dims: int
    feedforward_channels: int
    spike: str = "multispike_norm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_t = x
        x = Spike(self.spike, name="fc1_lif")(x)
        x = _ProjBN(self.feedforward_channels, self.dtype,
                    name="fc1")(x, train)
        x = Spike(self.spike, name="fc2_lif")(x)
        x = _ProjBN(self.embed_dims, self.dtype, name="fc2")(x, train)
        return x + x_t


class SpikeformerDecoderLayer(nn.Module):
    """``Spike2FormerTransformerDecoderLayer`` (Spike2former_layers.py:
    83-216): SA → CA → FFN, every residual INSIDE the blocks (the layer
    body is three straight calls, :195-216)."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    spike: str = "multispike_norm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos=None, key_pos=None,
                 self_attn_mask=None, cross_attn_mask=None,
                 train: bool = False):
        query = SpikeformerSelfAttention(
            self.embed_dims, self.num_heads, self.spike, dtype=self.dtype,
            name="self_attn")(query, query_pos=query_pos,
                              attn_mask=self_attn_mask, train=train)
        query = SpikeformerCrossAttention(
            self.embed_dims, self.num_heads, self.spike, dtype=self.dtype,
            name="cross_attn")(query, key, query_pos=query_pos,
                               key_pos=key_pos, attn_mask=cross_attn_mask,
                               train=train)
        return SpikeformerMLP(
            self.embed_dims, self.feedforward_channels, self.spike,
            dtype=self.dtype, name="ffn")(query, train=train)


class BaseTransformerDecoderLayer(nn.Module):
    """BASE_Transformer.py ``TransformerDecoderLayer`` (:229-313): the
    'norm' spiking MHA pair + MSDA_FFN with EXTERNAL residuals, each
    scaled by a learned per-channel gamma initialized at 1e-6 (:248-256 —
    "avoid the influence of query_initial")."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, mem_pos=None,
                 tgt_mask=None, memory_mask=None, train: bool = False):
        init = nn.initializers.constant(1e-6)
        g1 = self.param("gamma1", init, (self.embed_dims,))
        g2 = self.param("gamma2", init, (self.embed_dims,))
        g3 = self.param("gamma3", init, (self.embed_dims,))
        tgt = tgt + g1 * SpikeMultiheadAttention(
            self.embed_dims, self.num_heads, attn_type="SA",
            spike=self.spike, dtype=self.dtype, name="self_attn")(
            tgt, tgt, tgt, query_pos=query_pos, key_pos=query_pos,
            attn_mask=tgt_mask, train=train)
        tgt = tgt + g2 * SpikeMultiheadAttention(
            self.embed_dims, self.num_heads, attn_type="CA",
            spike=self.spike, dtype=self.dtype, name="multihead_attn")(
            tgt, memory, memory, query_pos=query_pos, key_pos=mem_pos,
            attn_mask=memory_mask, train=train)
        return tgt + g3 * MSDAFFN(
            self.embed_dims, self.feedforward_channels, spike=self.spike,
            dtype=self.dtype, name="mlp")(tgt, train=train)


def seek_local_maximum(x: jax.Array, epsilon: float = 1e-6) -> jax.Array:
    """utils.py ``QueryProposal.seek_local_maximum`` (:900-918): 1 where a
    pixel is >= all 8 zero-padded neighbours and >= epsilon.  x [B, H, W, C]
    (channels-last here; the ref is [B, C, H, W])."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    m = x >= epsilon
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = xp[:, 1 + dy:x.shape[1] + 1 + dy,
                    1 + dx:x.shape[2] + 1 + dx]
            m = m & (x >= nb)
    return m.astype(x.dtype)


class QueryProposal(nn.Module):
    """utils.py ``QueryProposal`` (:880-949): top-k pixel proposals as
    decoder queries.

    spike→1x1 conv class logits → sigmoid probs → gate by the per-pixel
    argmax one-hot (background channel excluded from the argmax, :925-927)
    → add the 8-neighbour local-maximum map (:928-929) → top-k pixels by
    the per-pixel max class prob → gather (features, pos embeddings,
    normalized locations).

    x [B, H, W, C] features; pos [B, H, W, C] (or [1, H, W, C], broadcast
    like the ref's ``repeat``).  Returns (proposals [B, K, C],
    pos [B, K, C], locations [B, K, 2] (train only), logits [B, H, W,
    ncls+1]).
    """

    num_queries: int
    num_classes: int
    spike: str = "multispike_norm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_embeddings, train: bool = False):
        b, h, w, c = x.shape
        logits = nn.Conv(self.num_classes + 1, (1, 1), dtype=self.dtype,
                         name="proposal_cls")(
            Spike(self.spike, name="proposal_spike")(x))
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        onehot = jax.nn.one_hot(
            jnp.argmax(probs[..., :-1], axis=-1), self.num_classes + 1,
            dtype=probs.dtype)
        probs = probs * onehot
        probs = probs + seek_local_maximum(probs)

        # per-pixel best foreground prob -> top-k pixel indices (:932)
        score = jnp.max(probs[..., :-1], axis=-1).reshape(b, h * w)
        _, topk = jax.lax.top_k(score, self.num_queries)  # [B, K]

        feats = jnp.take_along_axis(
            x.reshape(b, h * w, c), topk[..., None], axis=1)
        pos = jnp.broadcast_to(pos_embeddings, (b, h, w, c))
        pos = jnp.take_along_axis(
            pos.reshape(b, h * w, c), topk[..., None], axis=1)
        locations = None
        if train:
            ys = jnp.linspace(0.0, 1.0, h)
            xs = jnp.linspace(0.0, 1.0, w)
            loc = jnp.stack(
                jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [H, W, 2]
            loc = jnp.broadcast_to(loc.reshape(1, h * w, 2), (b, h * w, 2))
            locations = jnp.take_along_axis(loc, topk[..., None], axis=1)
        return feats, pos, locations, logits
