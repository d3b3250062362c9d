"""Spiking token-attention blocks and FFNs for the DETR-style decoder.

Reference: mmdet/models/layers/transformer/mmcv_spike/transformer.py —
``MultiHeadAttentionBlock`` (SA, :196-278), ``CrossMultiHeadAttentionBlock``
(CA, :280-361), ``MultiHeadCrossAttentionBlock`` (LinearCA, :364-438),
``MSMultiHeadAttentionBlock`` (LinearSA, :442-502), ``MSDA_FFN`` (:710-784)
and the dispatching ``MultiheadAttention`` wrapper (:505-638).

All spiking attention here is **softmax-free**: raw ``q k^T / sqrt(C)``
scores multiply the values directly (masked entries are zeroed, not -inf'd).
Tokens are ``[T, B, N, C]`` channels-last.

Deviation note: the reference's MSDA_FFN moves between token-major and
channel-major layouts with ``reshape`` instead of ``transpose``
(transformer.py:777-781), which silently shuffles (token, channel) pairs
through the pointwise convs.  We implement the mathematically intended
transpose — models are trained from scratch in this framework, so we keep
the clean semantics and document the difference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (BatchNorm, RepConv, Spike, _packed_cgd, fold_t,
                     unfold_t)


class TokenConvBN(nn.Module):
    """spike -> pointwise projection -> BN over tokens [T, B, N, C].

    Equivalent to the reference's ``Q_IFNode -> Conv1d(k=1) -> BatchNorm1d``
    stacks (BN statistics over (T*B, N) per channel).
    """

    features: int
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xf, t = fold_t(x)  # [(T*B), N, C]
        xf = Spike(self.spike)(xf)
        xf = nn.Conv(self.features, (1,), use_bias=True, dtype=self.dtype)(xf)
        xf = BatchNorm(use_running_average=not train)(xf)
        return unfold_t(xf, t)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[..., N, C] -> [..., H, N, C/H] with channel-contiguous head split."""
    *lead, n, c = x.shape
    x = x.reshape(*lead, n, num_heads, c // num_heads)
    return jnp.swapaxes(x, -2, -3)


def _merge_heads(x: jax.Array) -> jax.Array:
    *lead, h, n, ch = x.shape
    return jnp.swapaxes(x, -2, -3).reshape(*lead, n, h * ch)


class SpikeMHA(nn.Module):
    """Softmax-free spiking multi-head attention (SA/CA share the math).

    scores = (q k^T) / sqrt(embed_dims)  — note: full embed dim, not head
    dim (transformer.py:262-263); boolean ``attn_mask`` entries are zeroed.

    ``factored``: with no softmax and no mask the attention output is
    LINEAR in the scores, so ``(q k^T) v == q (k^T v)`` exactly (up to
    float summation order).  Associating right replaces the
    [*, nq, nk] score tensor (84 MB per decoder cross-attn layer at the
    flagship train shape, nk = 128^2) and the N-minor layout copies of
    the k/v spike outputs (4 x 128 MB measured, round-4 allocation
    table) with a tiny per-head [c, c] contraction — same math the
    reference backbone already uses for its linear attention
    (sdtv2.py:335-336).  Falls back to dense scores whenever
    ``attn_mask`` is given (masking breaks linearity) or the key count
    is under ``factored_min_kv`` — small attentions gain nothing, and
    the dense form keeps the legacy summation order that short
    toy-convergence tests were tuned against (the quantized net is
    chaotic: ulp-level reordering re-rolls a 450-iter toy run).  Off in
    compat mode so converted-checkpoint parity replays the reference's
    exact summation order.
    """

    embed_dims: int
    num_heads: int = 8
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32
    factored: bool = False
    factored_min_kv: int = 1024

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, train: bool = False):
        q = Spike(self.spike)(TokenConvBN(
            self.embed_dims, self.spike, self.dtype, name="q")(query, train))
        k = Spike(self.spike)(TokenConvBN(
            self.embed_dims, self.spike, self.dtype, name="k")(key, train))
        v = Spike(self.spike)(TokenConvBN(
            self.embed_dims, self.spike, self.dtype, name="v")(value, train))

        qh, kh, vh = (_split_heads(y, self.num_heads) for y in (q, k, v))
        if (self.factored and attn_mask is None
                and key.shape[-2] >= self.factored_min_kv):
            kv = jnp.einsum("...mc,...md->...cd", kh, vh,
                            preferred_element_type=jnp.float32)
            kv = kv / (self.embed_dims ** 0.5)
            out = jnp.einsum("...nc,...cd->...nd", qh, kv.astype(qh.dtype),
                             preferred_element_type=jnp.float32
                             ).astype(q.dtype)
        else:
            scores = jnp.einsum("...nc,...mc->...nm", qh, kh,
                                preferred_element_type=jnp.float32)
            scores = scores / (self.embed_dims ** 0.5)
            if attn_mask is not None:
                scores = jnp.where(attn_mask, 0.0, scores)
            out = jnp.einsum("...nm,...mc->...nc", scores.astype(vh.dtype),
                             vh,
                             preferred_element_type=jnp.float32
                             ).astype(q.dtype)
        out = _merge_heads(out)

        outf, t = fold_t(out)
        outf = Spike(self.spike)(outf)
        outf = nn.Conv(self.embed_dims, (1,), use_bias=True,
                       dtype=self.dtype)(outf)
        outf = BatchNorm(use_running_average=not train)(outf)
        return unfold_t(outf, t)


class LinearSpikeMHA(nn.Module):
    """Linear (kernelized) spiking attention: ``q (k^T v) * scale``.

    ``mode='SA'`` → MSMultiHeadAttentionBlock (conv q/k/v, transformer.py
    :442-502); ``mode='CA'`` → MultiHeadCrossAttentionBlock (RepConv k/v over
    a spatial key map + channel-attention shortcut, :364-438).
    """

    embed_dims: int
    num_heads: int = 8
    mode: str = "SA"
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, train: bool = False):
        scale = (self.embed_dims // self.num_heads) ** -0.5
        q_in = TokenConvBN(self.embed_dims, self.spike, self.dtype,
                           name="q")(query, train)
        q = Spike(self.spike)(q_in)

        if self.mode == "CA":
            # key/value are spatial maps [T, B, H, W, C]
            def rep(y, name):
                yf, t = fold_t(y)
                yf = Spike(self.spike)(yf)
                yf = RepConv(self.embed_dims, dtype=self.dtype, name=name)(
                    yf, train)
                # k_spike/v_spike after the RepConv projection
                # (transformer.py:410-417)
                yf = Spike(self.spike)(yf)
                tb, h, w, c = yf.shape
                return unfold_t(yf.reshape(tb, h * w, c), t)

            k = rep(key, "k_rep")
            v = rep(value, "v_rep")
        else:
            k = Spike(self.spike)(TokenConvBN(
                self.embed_dims, self.spike, self.dtype, name="k")(key, train))
            v = Spike(self.spike)(TokenConvBN(
                self.embed_dims, self.spike, self.dtype, name="v")(value, train))

        qh, kh, vh = (_split_heads(y, self.num_heads) for y in (q, k, v))
        kv = jnp.einsum("...mc,...md->...cd", kh, vh,
                        preferred_element_type=jnp.float32)
        if self.mode == "CA":
            kv = kv / (self.embed_dims ** 0.5)  # :426-427
            out = jnp.einsum("...nc,...cd->...nd", qh, kv.astype(qh.dtype),
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.einsum("...nc,...cd->...nd", qh, kv.astype(qh.dtype),
                             preferred_element_type=jnp.float32) * scale
        out = _merge_heads(out.astype(q.dtype))

        if self.mode == "CA":
            # channel-attention shortcut: global-avg-pooled conv of the spiked
            # query, scaled residual (transformer.py:393-395,432-434)
            tgt = jnp.mean(
                nn.Conv(self.embed_dims, (1,), use_bias=False,
                        dtype=self.dtype, name="channel_conv")(
                    Spike(self.spike)(query)),  # q_conv_spike reuse
                axis=-2, keepdims=True)
            alpha = self.param("alpha", nn.initializers.ones,
                               (1, 1, self.embed_dims))
            out = out * alpha + tgt

        outf, t = fold_t(out)
        outf = Spike(self.spike)(outf)
        outf = nn.Conv(self.embed_dims, (1,), use_bias=True,
                       dtype=self.dtype)(outf)
        outf = BatchNorm(use_running_average=not train)(outf)
        return unfold_t(outf, t)


class LocalRepresentation(nn.Module):
    """BN → depthwise 3x3 → linear over tokens (transformer.py:63-100).
    Input [B, H, W, C] → [B, H*W, C]."""

    d_model: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(use_running_average=not train, name="bn")(x)
        x = nn.Conv(self.d_model, (3, 3), padding=[(1, 1)] * 2,
                    feature_group_count=self.d_model, use_bias=True,
                    dtype=self.dtype, name="dw")(x)
        b, h, w, c = x.shape
        return nn.Dense(self.d_model, dtype=self.dtype, name="out")(
            x.reshape(b, h * w, c))


class PEMCrossAttention(nn.Module):
    """Prototype-based masked cross-attention (PEM_CA, transformer.py:
    102-192): queries attend by copying their single MOST SIMILAR feature
    token per head (argmax over cosine similarity, with masked-out tokens
    excluded unless a (batch, head) slice is entirely masked), then a
    scaled, query-axis-normalized refinement.

    Layout difference from the reference: batch-first [B, Q, C] queries
    (the ref uses [Q, B, C]); the math is identical.
    """

    embed_dims: int = 256
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_mask=None, pos=None,
                 query_pos=None, train: bool = False):
        """tgt [B, Q, C]; memory [B, H, W, C]; memory_mask [B, Q, H, W]
        (mask value < 0 excludes a token, the ref's sigmoid-logit
        convention); pos [B, H, W, C]; query_pos [B, Q, C]."""
        if pos is not None:
            memory = memory + pos
        if query_pos is not None:
            tgt = tgt + query_pos

        mem = LocalRepresentation(self.embed_dims, self.dtype,
                                  name="feature_proj")(memory, train)
        q = nn.LayerNorm(dtype=self.dtype, name="query_norm")(tgt)
        q = nn.Dense(self.embed_dims, dtype=self.dtype, name="query_proj")(q)

        def l2(y, axis):
            return y / jnp.maximum(
                jnp.linalg.norm(y, axis=axis, keepdims=True), 1e-12)

        mem = l2(mem, -1)
        q = l2(q, -1)

        b, n, c = mem.shape
        nq = q.shape[1]
        hd = c // self.num_heads
        mh = mem.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        qh = q.reshape(b, nq, self.num_heads, hd).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhnc,bhqc->bhnq", mh, qh)      # [B, h, N, Q]

        if memory_mask is not None:
            excl = (jax.lax.stop_gradient(memory_mask)
                    .reshape(b, nq, n).transpose(0, 2, 1) < 0.0)
            excl = jnp.broadcast_to(excl[:, None],
                                    (b, self.num_heads, n, nq))
            # a (batch, head) slice whose EVERY query is fully masked is
            # unmasked wholesale (transformer.py:161-163)
            fully = jnp.sum(excl, axis=2) == n           # [B, h, Q]
            wipe = jnp.all(fully, axis=2)                # [B, h]
            excl = jnp.where(wipe[:, :, None, None], False, excl)
            sim = jnp.where(excl, -jnp.inf, sim)

        idx = jnp.argmax(sim, axis=2)                    # [B, h, Q]
        picked = jnp.take_along_axis(
            mh, idx[..., None], axis=2)                  # [B, h, Q, hd]
        picked = picked.transpose(0, 2, 1, 3).reshape(b, nq, c)

        alpha = self.param("alpha", nn.initializers.ones,
                           (1, 1, self.embed_dims))
        mixed = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name="proj")(picked * q)
        # the reference normalizes over the QUERY axis here (dim=1 of
        # [B, Q, C]) — faithful, if unusual
        out = l2(mixed, 1) * alpha + picked
        return nn.Dense(self.embed_dims, dtype=self.dtype,
                        name="final")(out)


class SpikeMultiheadAttention(nn.Module):
    """Dispatching wrapper (transformer.py:505-638): adds positional
    embeddings to query/key (:626-629), then routes by ``attn_type`` —
    'SA'/'CA' → full softmax-free attention (``SpikeMHA``), 'LinearSA' →
    ``LinearSpikeMHA(mode='SA')``, 'LinearCA' → ``LinearSpikeMHA(mode='CA')``
    (spatial key/value map, no key_pos)."""

    embed_dims: int
    num_heads: int = 8
    attn_type: str = "SA"
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, query_pos=None, key_pos=None,
                 attn_mask=None, train: bool = False):
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None and self.attn_type != "LinearCA":
            key = key + key_pos
        if self.attn_type in ("SA", "CA"):
            return SpikeMHA(self.embed_dims, self.num_heads, self.spike,
                            self.dtype, name="attn")(
                query, key, value, attn_mask=attn_mask, train=train)
        if self.attn_type in ("LinearSA", "LinearCA"):
            return LinearSpikeMHA(
                self.embed_dims, self.num_heads,
                mode=self.attn_type.removeprefix("Linear"),
                spike=self.spike, dtype=self.dtype, name="attn")(
                query, key, value, train=train)
        raise ValueError(f"unknown attn_type {self.attn_type!r}")


class MSDAFFN(nn.Module):
    """Spiking FFN: spike→1x1(→ffn)→BN→spike→1x1(→C)→BN.  No residual inside
    — the caller adds it (detr_layers.py:554-556).

    ``compat=True`` reproduces the reference's layout bit-exactly, which is
    REQUIRED to run converted reference checkpoints:
    * token inputs [T,B,N,C] (MSDA_FFN, transformer.py:777-781): the ref
      moves to channel-major with ``reshape`` instead of ``transpose``, so
      the convs see a fixed (token, channel) shuffle; the output is
      un-shuffled by the mirror reshape.
    * spatial inputs [T,B,H,W,C] (MS_MLP, transformer.py:815-831): the move
      IN is a real permute, but the output ``[tb,C,N] -> (T,B,H,W,C)`` is a
      plain reshape — a channels-first tensor reinterpreted channels-last.
    The trained weights encode these permutations, so compat mode replays
    them.  Param shapes/names are identical in both modes (the internal
    compute stays channels-last for the MXU; only cheap reshapes differ).
    """

    embed_dims: int = 256
    feedforward_channels: int = 2048
    spike: str = "qspike"
    compat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xf, t = fold_t(x)
        xf = Spike(self.spike)(xf)

        spatial = xf.ndim == 4
        if self.compat:
            tb, c = xf.shape[0], xf.shape[-1]
            if spatial:
                h, w = xf.shape[1], xf.shape[2]
                # real transpose in (torch permute+contiguous, :825)
                xf = jnp.swapaxes(xf.reshape(tb, h * w, c), 1, 2)
            else:
                n = xf.shape[1]
                # quirky reinterpret in (torch reshape, :777)
                xf = xf.reshape(tb, c, n)
            # channels live on axis 1 now; compute channels-last via swaps
            xf = jnp.swapaxes(xf, 1, 2)

        xf = nn.Conv(self.feedforward_channels, (1,), use_bias=True,
                     dtype=self.dtype,
                     conv_general_dilated=_packed_cgd(self.spike))(xf)
        xf = BatchNorm(use_running_average=not train)(xf)
        xf = Spike(self.spike)(xf)
        xf = nn.Conv(self.embed_dims, (1,), use_bias=True,
                     dtype=self.dtype,
                     conv_general_dilated=_packed_cgd(self.spike))(xf)
        xf = BatchNorm(use_running_average=not train)(xf)

        if self.compat:
            xf = jnp.swapaxes(xf, 1, 2)  # back to [(tb), C, N']
            # quirky reinterpret out (torch reshape, :781 / :831)
            xf = (xf.reshape(tb, h, w, c) if spatial
                  else xf.reshape(tb, n, c))
        return unfold_t(xf, t)


class SpikeMLP3(nn.Module):
    """3-layer Q-IF MLP used for mask embeddings: fc→(spike*α)→fc→(spike*α)→fc
    (SNN_core.py:95-123 MLP, quant_const=4)."""

    out_dim: int
    quant_const: float = 4.0
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(d, use_bias=False, dtype=self.dtype)(x)
        x = Spike(self.spike)(x) * self.quant_const
        x = nn.Dense(d, use_bias=False, dtype=self.dtype)(x)
        x = Spike(self.spike)(x) * self.quant_const
        x = nn.Dense(self.out_dim, use_bias=True, dtype=self.dtype,
                     kernel_init=nn.initializers.truncated_normal(0.02))(x)
        return x
