"""Spiking DAB-DETR decoder: dynamic anchor-box queries.

Reference: mmdet/models/layers/transformer/dab_detr_layers.py
(``DABDetrTransformerDecoder{,Layer}`` :17-262, ``DABDetrTransformerEncoder``
:264-300) over ``ConditionalAttention`` / ``coordinate_to_encoding`` /
``inverse_sigmoid`` (transformer/utils.py:49-735).  Faithful structure:

* queries carry explicit anchors (cx, cy, w, h) in sigmoid space; each
  layer re-encodes the anchor with a sine encoding, maps it through
  ``ref_point_head`` to the self-attention positional embedding, and
  scales the cross-attention sine embedding by a content-conditioned
  transformation (``query_scale``: cond_elewise / cond_scalar /
  fix_elewise — dab_detr_layers.py:139-151,205-216).
* modulated HW attention divides the sine embedding by the anchor's
  w/h (scaled by ``ref_anchor_head``) — :218-225.
* anchors are refined per layer by a regression branch in
  inverse-sigmoid space and DETACHED (:236-246).
* conditional attention decouples content and position: self-attn adds
  projected positions; cross-attn CONCATENATES per-head content and
  position halves, doubling the score feature dim (utils.py:688-712);
  ``qpos_proj`` is applied only in the first layer unless
  ``keep_query_pos`` (:697-703).

TPU/spiking adaptation: the attention core is the framework's
softmax-free spiking form (spiked q/k/v, scores scaled by the full
hidden dim, masked scores zeroed — models/attention.py SpikeMHA), with
BN-based token norms instead of LayerNorm; the tiny anchor-control MLPs
(ref_point_head / query_scale / ref_anchor_head / reg branch) stay
plain ReLU MLPs as in the reference (utils.py MLP).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import MSDAFFN, TokenConvBN
from .layers import BatchNorm, Spike, fold_t, unfold_t

__all__ = ["inverse_sigmoid", "coordinate_to_encoding",
           "ConditionalSpikeAttention", "DABDetrDecoderLayer",
           "DABDetrDecoder"]


def inverse_sigmoid(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """logit with clamping (transformer/utils.py inverse_sigmoid)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def coordinate_to_encoding(coord: jax.Array, num_feats: int = 128,
                           temperature: float = 10000.0,
                           scale: float = 2 * math.pi) -> jax.Array:
    """Sine/cos encoding of (cx, cy[, w, h]) coordinates — exact
    transcription of transformer/utils.py:49-97 (interleaved sin/cos,
    concatenated y, x[, w, h] blocks)."""
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    def enc(v):
        pos = v[..., None] * scale / dim_t
        return jnp.stack(
            [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
            axis=-1).reshape(*v.shape, num_feats)

    pos_x = enc(coord[..., 0])
    pos_y = enc(coord[..., 1])
    if coord.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    if coord.shape[-1] == 4:
        pos_w = enc(coord[..., 2])
        pos_h = enc(coord[..., 3])
        return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)
    raise ValueError(f"coord last dim must be 2 or 4, got {coord.shape}")


class _MLP(nn.Module):
    """utils.py MLP: Linear+ReLU stack (control heads, non-spiking)."""

    hidden: int
    out: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out)(x)


class ConditionalSpikeAttention(nn.Module):
    """Conditional (content/position decoupled) spiking attention.

    Self-attn: q/k = content_proj(x) + pos_proj(pos).  Cross-attn: q/k =
    [content | position] concatenated per head (score feature dim 2c),
    with ``qpos_proj`` applied only when ``is_first`` or
    ``keep_query_pos`` (utils.py:685-735).  Attention core is
    softmax-free spiking (spiked q/k/v, scores / sqrt(hidden), masked
    entries zeroed), residual inside as in the reference wrapper.
    """

    embed_dims: int
    num_heads: int = 8
    cross: bool = False
    keep_query_pos: bool = False
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos=None,
                 ref_sine_embed=None, attn_mask=None, is_first: bool = False,
                 train: bool = False):
        """query [T,B,nq,C]; key [T,B,nk,C]; query_pos/key_pos [B,n,C];
        ref_sine_embed [B,nq,C] (cross only)."""
        c, h = self.embed_dims, self.num_heads
        t, b, nq = query.shape[:3]

        dense = lambda name: nn.Dense(c, dtype=self.dtype, name=name)
        if self.cross:
            q_c = dense("qcontent_proj")(query)
            k_c = dense("kcontent_proj")(key)
            v = dense("v_proj")(key)
            k_p = dense("kpos_proj")(key_pos)
            if is_first or self.keep_query_pos:
                q_c = q_c + dense("qpos_proj")(query_pos)
                k_c = k_c + k_p
            nk = key.shape[2]
            q_s = dense("qpos_sine_proj")(ref_sine_embed)
            # per-head concat [content | position] -> hidden dim 2c
            q = jnp.concatenate([
                q_c.reshape(t, b, nq, h, c // h),
                jnp.broadcast_to(q_s.reshape(b, nq, h, c // h),
                                 (t, b, nq, h, c // h))], axis=-1)
            k = jnp.concatenate([
                k_c.reshape(t, b, nk, h, c // h),
                jnp.broadcast_to(k_p.reshape(b, nk, h, c // h),
                                 (t, b, nk, h, c // h))], axis=-1)
            hidden = 2 * c
        else:
            q_lin = dense("qcontent_proj")(query) + dense("qpos_proj")(
                query_pos)
            k_lin = dense("kcontent_proj")(key) + dense("kpos_proj")(
                key_pos if key_pos is not None else query_pos)
            v = dense("v_proj")(key)
            nk = key.shape[2]
            q = q_lin.reshape(t, b, nq, h, c // h)
            k = k_lin.reshape(t, b, nk, h, c // h)
            hidden = c

        # spiking attention core (SpikeMHA conventions)
        q = Spike(self.spike)(q)
        k = Spike(self.spike)(k)
        v = Spike(self.spike)(v).reshape(t, b, nk, h, c // h)
        scores = jnp.einsum("tbnhc,tbmhc->tbhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / (hidden ** 0.5)
        if attn_mask is not None:
            scores = jnp.where(attn_mask, 0.0, scores)
        out = jnp.einsum("tbhnm,tbmhc->tbnhc", scores.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(t, b, nq, c).astype(query.dtype)

        outf, _ = fold_t(out)
        outf = Spike(self.spike)(outf)
        outf = nn.Conv(c, (1,), use_bias=True, dtype=self.dtype,
                       name="out_proj")(outf)
        outf = BatchNorm(use_running_average=not train)(outf)
        return query + unfold_t(outf, t)


class DABDetrDecoderLayer(nn.Module):
    """SA → CA → FFN with conditional attention
    (dab_detr_layers.py:17-99; BN-normed spiking blocks replace the
    reference's LayerNorms)."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    keep_query_pos: bool = False
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, ref_sine_embed,
                 self_attn_mask=None, cross_attn_mask=None,
                 is_first: bool = False, train: bool = False):
        query = ConditionalSpikeAttention(
            self.embed_dims, self.num_heads, cross=False,
            spike=self.spike, dtype=self.dtype, name="self_attn")(
            query, query, query_pos, attn_mask=self_attn_mask, train=train)
        query = ConditionalSpikeAttention(
            self.embed_dims, self.num_heads, cross=True,
            keep_query_pos=self.keep_query_pos, spike=self.spike,
            dtype=self.dtype, name="cross_attn")(
            query, key, query_pos, key_pos=key_pos,
            ref_sine_embed=ref_sine_embed, attn_mask=cross_attn_mask,
            is_first=is_first, train=train)
        query = query + MSDAFFN(
            self.embed_dims, self.feedforward_channels, spike=self.spike,
            dtype=self.dtype, name="ffn")(query, train)
        return query


class DABDetrDecoder(nn.Module):
    """DAB-DETR decoder: per-layer anchor re-encoding + refinement
    (dab_detr_layers.py:101-262)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_layers: int = 6
    feedforward_channels: int = 2048
    query_dim: int = 4                    # 4 = anchor, 2 = point
    query_scale_type: str = "cond_elewise"
    with_modulated_hw_attn: bool = True
    keep_query_pos: bool = False
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, key_pos, anchors,
                 cross_attn_mask=None, train: bool = False):
        """query [T,B,nq,C]; key [T,B,nk,C]; key_pos [B,nk,C]; anchors
        [B,nq,query_dim] in INVERSE-sigmoid (logit) space, as the
        reference's query_pos embedding (:194-196).  ``cross_attn_mask``
        ([B,1,1,nk] bool, True = masked) gates padded key tokens.

        Returns (outputs [L,T,B,nq,C], references [L,B,nq,query_dim]):
        per-layer refined queries and the sigmoid-space reference
        points/anchors each layer attended with.
        """
        assert self.query_dim in (2, 4)
        assert self.query_scale_type in (
            "cond_elewise", "cond_scalar", "fix_elewise")
        c = self.embed_dims

        ref_point_head = _MLP(c, c, 2, name="ref_point_head")
        if self.query_scale_type == "cond_elewise":
            query_scale = _MLP(c, c, 2, name="query_scale")
        elif self.query_scale_type == "cond_scalar":
            query_scale = _MLP(c, 1, 2, name="query_scale")
        else:
            query_scale = self.param(
                "query_scale_weight", nn.initializers.normal(1.0),
                (self.num_layers, c))
        if self.with_modulated_hw_attn and self.query_dim == 4:
            ref_anchor_head = _MLP(c, 2, 2, name="ref_anchor_head")
        reg_branch = _MLP(c, self.query_dim, 3, name="reg_branch")

        reference = jax.nn.sigmoid(anchors.astype(jnp.float32))
        output = query
        inter_out, inter_refs = [], [reference]
        for i in range(self.num_layers):
            obj_center = reference[..., : self.query_dim]  # [B, nq, qd]
            sine = coordinate_to_encoding(obj_center, c // 2)  # [B,nq,qd*c/2]
            query_pos = ref_point_head(sine.astype(self.dtype))

            # content-conditioned transformation of the sine embedding
            # (mean over T: the control signal is per query, not per step)
            content = output.mean(axis=0).astype(self.dtype)  # [B, nq, C]
            if self.query_scale_type == "fix_elewise":
                pos_tf = query_scale[i]
            elif i == 0:
                pos_tf = 1.0
            else:
                pos_tf = query_scale(content)
            ref_sine = sine[..., :c] * pos_tf

            if self.with_modulated_hw_attn and self.query_dim == 4:
                ref_hw = jax.nn.sigmoid(
                    ref_anchor_head(content).astype(jnp.float32))
                ref_sine = jnp.concatenate([
                    ref_sine[..., : c // 2]
                    * (ref_hw[..., 1] / obj_center[..., 3])[..., None],
                    ref_sine[..., c // 2:]
                    * (ref_hw[..., 0] / obj_center[..., 2])[..., None],
                ], axis=-1)

            output = DABDetrDecoderLayer(
                embed_dims=c, num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels,
                keep_query_pos=self.keep_query_pos, spike=self.spike,
                dtype=self.dtype, name=f"layer_{i}")(
                output, key, query_pos, key_pos,
                ref_sine.astype(self.dtype),
                cross_attn_mask=cross_attn_mask,
                is_first=(i == 0), train=train)

            # iterative anchor refinement in logit space, detached (:236-246)
            reg = reg_branch(output.mean(axis=0)).astype(jnp.float32)
            new_ref = jax.nn.sigmoid(reg + inverse_sigmoid(reference))
            if i != self.num_layers - 1:
                inter_refs.append(new_ref)
            reference = jax.lax.stop_gradient(new_ref)
            inter_out.append(output)

        return jnp.stack(inter_out), jnp.stack(inter_refs)
