"""MaskFormer head: DCN pixel decoder + spiking DETR decoder + SDME output.

Reference: mmdet/models/dense_heads/maskformer_head.py:31-586 (forward at
:498-586) wrapped by the mmseg shim (mmseg/models/decode_heads/
maskformer_head.py) whose semantic-inference einsum lives in
``semantic_inference`` below.

Head flow (faithful to the reference):
  pixel_decoder → 3 scale levels (+ per-level sine PE + level_embed)
  → 6 decoder layers round-robin over levels, collecting each layer's query
    features *including the initial queries* (:551-552, Mask2Former-style
    deep supervision)
  → SDME output block (:571-582): sigmoid → Q-IF spike → ×α(=4);
    classification by a linear head averaged over T; mask embeddings via a
    3-layer spiking MLP plus a learned query-mixing shortcut conv, then a
    final spike and an einsum with the mask features averaged over T.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.spike import qspike
from .attention import SpikeMLP3
from .layers import BatchNorm, Spike
from .pixel_decoder import DCNPixelDecoder
from .positional import sine_pe_for_shape, sine_positional_encoding
from .transformer_decoder import DetrDecoderLayer


def mask2former_attn_mask(mask_pred: jax.Array, hw: tuple[int, int],
                          pad_mask: jax.Array | None = None) -> jax.Array:
    """Mask2Former masked-attention rule: the previous layer's mask
    prediction, resized to the attention level, gates the keys.

    mask_pred: [B, nq, h, w] mask LOGITS.  Returns a boolean
    [B, 1(heads), nq, hw] attention mask (True = masked out):
    ``sigmoid(resize(mask)) < 0.5`` (⇔ resized logit < 0), except rows
    that would mask every key are fully unmasked (the upstream
    Mask2FormerHead escape that keeps degenerate queries trainable).
    ``pad_mask`` ([B, 1, 1, hw]) ORs in padded-token masking.
    """
    from ..ops.resize import resize_bilinear_hw

    b, nq = mask_pred.shape[:2]
    h, w = hw
    m = resize_bilinear_hw(mask_pred.astype(jnp.float32), (h, w))
    am = (m < 0.0).reshape(b, nq, h * w)
    all_masked = jnp.all(am, axis=-1, keepdims=True)
    am = (am & ~all_masked)[:, None]  # [B, 1, nq, hw]
    if pad_mask is not None:
        am = am | pad_mask
    return am


class MaskFormerHead(nn.Module):
    in_channels: Sequence[int] = (32, 64, 128, 360)
    feat_channels: int = 256
    out_channels: int = 256
    num_classes: int = 150
    num_queries: int = 100
    num_decoder_layers: int = 6
    num_feat_levels: int = 3
    num_heads: int = 8
    decoder_ffn_channels: int = 2048
    encoder_ffn_channels: int = 1024
    num_encoder_layers: int = 6
    dcn_group: int = 32
    dw_kernel_size: int = 5
    alpha: float = 4.0
    spike: str = "qspike"
    decoder_order: str = "ca_sa"   # 'sa_ca' = Spike2former_layers variant
    # Mask2Former-style masked cross-attention: each decoder layer's
    # cross-attn keys are restricted to the foreground of the PREVIOUS
    # layer's mask prediction (sigmoid < 0.5 masked, with the all-masked
    # row escape).  Matches mmdet Mask2FormerHead._forward_head +
    # Mask2FormerTransformerDecoderLayer (mask2former_layers.py:188-261).
    masked_attention: bool = False
    # Decoder stack variant: 'detr' = the Spike2Former DETR decoder
    # (level round-robin, maskformer_head.py:551-562); 'dab' = the spiking
    # DAB-DETR decoder with dynamic anchor-box queries (models/dab_detr.py;
    # reference dab_detr_layers.py — inactive upstream, config-reachable
    # here).  'dab' attends the coarsest scale level with learned anchors.
    decoder: str = "detr"
    # At inference the reference discards all but the last decoder layer's
    # SDME output (mmseg shim :163-164) — but its hooks/monitors still SEE
    # every layer go through the spike sites.  True (default) skips the
    # discarded work; False replays the literal all-layers eval, which is
    # what firing-rate analysis (tools/cal_firing_num.py) must measure.
    eval_last_only: bool = True
    # Train-time output form: True returns (cls, LazyMasks) — the mask
    # logits stay factored as (embeddings, mask features) and the loss
    # contracts one layer (and only its matched slots) at a time, instead
    # of materializing the [L, B, nq, h, w] stack (the largest train-step
    # HBM allocation at flagship shapes).  Inference is unaffected.
    lazy_masks: bool = False
    compat: bool = False
    remat: bool = False  # checkpoint DCN encoder layers (training memory)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False,
                 valid_hw: jax.Array | None = None):
        """feats: 4-level pyramid [T,B,h,w,c].

        ``valid_hw`` ([B, 2] int32, input-resolution valid extents) enables
        static-shape bucketed eval: images are bottom-right padded to a
        bucket shape, and here the padded tokens are (a) excluded from the
        sine PE normalization (the reference's mask-cumsum form,
        positional_encoding.py:73-81) and (b) masked out of the decoder's
        cross-attention keys (masked scores zeroed, transformer.py:267-269)
        — so the valid-region computation matches an exact-shape forward up
        to local conv halo bleed (the same class of effect the reference's
        size_divisor=32 padding has).

        Returns (all_cls_scores [L+1, B, nq, ncls+1],
                 all_mask_preds [L+1, B, nq, H/2, W/2]).
        """
        c = self.feat_channels
        mask_features, memory, multi_scale = DCNPixelDecoder(
            in_channels=self.in_channels, feat_channels=c,
            out_channels=self.out_channels,
            num_encoder_layers=self.num_encoder_layers,
            feedforward_channels=self.encoder_ffn_channels,
            group=self.dcn_group, dw_kernel_size=self.dw_kernel_size,
            spike=self.spike, compat=self.compat, remat=self.remat,
            dtype=self.dtype, name="pixel_decoder")(feats, train)

        t, b = memory.shape[0], memory.shape[1]
        nq = self.num_queries

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (nq, c))
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (nq, c))
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feat_levels, c))

        input_h = feats[0].shape[2] * 2  # feats[0] is the /2 level

        # per-level token inputs + positional encodings (+ key pad masks)
        decoder_inputs, decoder_pes, decoder_masks = [], [], []
        for i in range(self.num_feat_levels):
            lvl = multi_scale[i]  # [T,B,h,w,C]
            h, w = lvl.shape[2], lvl.shape[3]
            tokens = lvl.reshape(t, b, h * w, c) + level_embed[i]
            if valid_hw is None:
                pe = sine_pe_for_shape(h, w, c // 2).reshape(h * w, c)
                decoder_pes.append(jnp.broadcast_to(pe, (b, h * w, c)))
                decoder_masks.append(None)
            else:
                stride = input_h // h
                vh = (valid_hw[:, 0] + stride - 1) // stride  # [B] ceil
                vw = (valid_hw[:, 1] + stride - 1) // stride
                pad = ((jnp.arange(h)[None, :, None] >= vh[:, None, None])
                       | (jnp.arange(w)[None, None, :] >= vw[:, None, None]))
                pe = sine_positional_encoding(
                    pad.astype(jnp.float32), c // 2).reshape(b, h * w, c)
                decoder_pes.append(pe)
                decoder_masks.append(pad.reshape(b, 1, 1, h * w))
            decoder_inputs.append(tokens)

        query = jnp.broadcast_to(query_feat, (t, b, nq, c))
        qpos = jnp.broadcast_to(query_embed, (b, nq, c))

        # ---- SDME output block (:571-582), shared across all calls ----
        decoder_out_spike = Spike(self.spike, name="decoder_out_spike")
        cls_embed = nn.Dense(
            self.num_classes + 1, dtype=self.dtype,
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="cls_embed")
        mask_mlp = SpikeMLP3(
            self.out_channels, quant_const=self.alpha, spike=self.spike,
            dtype=self.dtype, name="mask_embed")
        shortcut_spike = Spike(self.spike, name="shortcut_spike")
        shortcut_bn = BatchNorm(use_running_average=not train,
                                name="shortcut_bn")
        mask_embed_spike = Spike(self.spike, name="mask_embed_spike")
        w_mix = self.param(
            "shortcut_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (nq, nq))
        w_scale = self.param("w", nn.initializers.ones, (1,))

        def sdme_embed(out):
            """out: [L, T, B, nq, C] query features → per-layer class
            scores [L, B, nq, ncls+1] and post-spike mask embeddings
            [L, T, B, nq, C] (the factored half of the mask logits)."""
            out_sig = jax.nn.sigmoid(
                out.astype(jnp.float32)).astype(out.dtype)
            out_spiked = self.alpha * decoder_out_spike(out_sig)
            cls_scores = cls_embed(out_spiked).mean(axis=1)  # mean over T

            mask_embed = mask_mlp(out_spiked)
            # shortcut: conv over the *query* axis + BN over queries
            # (maskformer_head.py:152-155,576-579)
            sc = self.alpha * shortcut_spike(out_sig)
            sc = jnp.einsum("ltbqc,pq->ltbpc", sc, w_mix)
            sc_t = jnp.moveaxis(sc, 3, -1)  # [..., C, nq]
            sc_t = shortcut_bn(sc_t.reshape(-1, c, nq)).reshape(sc_t.shape)
            sc = jnp.moveaxis(sc_t, -1, 3)
            mask_embed = mask_embed + w_scale * sc
            mask_embed = self.alpha * mask_embed_spike(mask_embed)
            return cls_scores.astype(jnp.float32), mask_embed

        def sdme(out):
            """out: [L, T, B, nq, C] query features → per-layer class
            scores [L, B, nq, ncls+1] and mask logits [L, B, nq, h, w]."""
            cls_scores, mask_embed = sdme_embed(out)
            # [L,T,B,nq,C] x [T,B,h,w,C] -> [L,B,nq,h,w]: contract (T, C)
            # in one dot_general (== einsum('ltbqc,tbchw->ltbqhw').mean(T)
            # of the reference :581-582, without materializing the 6-D
            # intermediate).
            mask_preds = jnp.einsum(
                "ltbqc,tbhwc->lbqhw", mask_embed, mask_features,
                preferred_element_type=jnp.float32) / t
            return cls_scores, mask_preds

        # Factored train-time output: materializing every layer's dense
        # mask logits is the largest train allocation (losses/criterion.py
        # LazyMasks docstring); the loss contracts per layer instead.
        lazy = train and self.lazy_masks

        def sdme_out(out):
            if lazy:
                from ..losses.criterion import LazyMasks

                cls_scores, mask_embed = sdme_embed(out)
                return cls_scores, LazyMasks(mask_embed, mask_features)
            return sdme(out)

        def attn_mask_from(mask_pred, lvl):
            hw = (multi_scale[lvl].shape[2], multi_scale[lvl].shape[3])
            return mask2former_attn_mask(mask_pred, hw,
                                         pad_mask=decoder_masks[lvl])

        if self.decoder == "dab":
            if self.masked_attention:
                raise ValueError(
                    "decoder='dab' does not support masked_attention "
                    "(the DAB decoder has no per-layer mask gating); "
                    "pick one")
            from .dab_detr import DABDetrDecoder

            anchors = self.param(
                "query_anchors", nn.initializers.normal(1.0), (nq, 4))
            outputs, _refs = DABDetrDecoder(
                embed_dims=c, num_heads=self.num_heads,
                num_layers=self.num_decoder_layers,
                feedforward_channels=self.decoder_ffn_channels,
                spike=self.spike, dtype=self.dtype, name="dab_decoder")(
                query, decoder_inputs[0], decoder_pes[0],
                jnp.broadcast_to(anchors.astype(jnp.float32), (b, nq, 4)),
                cross_attn_mask=decoder_masks[0], train=train)
            out = jnp.concatenate([query[None], outputs], axis=0)
            if not train and self.eval_last_only:
                out = out[-1:]
            return sdme_out(out)
        if self.decoder != "detr":
            raise ValueError(f"unknown decoder {self.decoder!r}")

        if not self.masked_attention:
            out_dec = [query]  # supervise the initial queries (:551-552)
            for i in range(self.num_decoder_layers):
                lvl = i % self.num_feat_levels
                query = DetrDecoderLayer(
                    embed_dims=c, num_heads=self.num_heads,
                    feedforward_channels=self.decoder_ffn_channels,
                    spike=self.spike, order=self.decoder_order,
                    compat=self.compat, dtype=self.dtype,
                    name=f"decoder_{i}")(
                    query, decoder_inputs[lvl], decoder_inputs[lvl],
                    qpos, decoder_pes[lvl],
                    cross_attn_mask=decoder_masks[lvl], train=train)
                out_dec.append(query)

            out = jnp.stack(out_dec)  # [L+1, T, B, nq, C]
            if not train and self.eval_last_only:
                # Deep supervision is only consumed by the loss; at
                # inference the reference discards all but the last layer
                # (:163-164), so skip the SDME work for the other six.
                out = out[-1:]
            return sdme_out(out)

        # Mask2Former mode: per-layer head + masked cross-attention.  The
        # SDME must run per layer anyway (its mask gates the next layer's
        # attention), so deep supervision comes for free at train time.
        # (Train-mode shortcut-BN batch statistics are computed per layer
        # here vs. over the stacked layers in MaskFormer mode — a
        # different-model-variant choice, not a numerical bug; eval uses
        # running averages and is unaffected.)
        cls_list, mask_list, embed_list = [], [], []

        def step_sdme(q):
            # the dense mask is needed per layer regardless (it gates the
            # next layer's attention) but is transient; when lazy, only
            # the embeddings are kept for the loss
            cls_i, me_i = sdme_embed(q[None])
            mask_i = jnp.einsum(
                "ltbqc,tbhwc->lbqhw", me_i, mask_features,
                preferred_element_type=jnp.float32) / t
            cls_list.append(cls_i[0])
            mask_list.append(mask_i[0])
            embed_list.append(me_i[0])

        step_sdme(query)
        for i in range(self.num_decoder_layers):
            lvl = i % self.num_feat_levels
            query = DetrDecoderLayer(
                embed_dims=c, num_heads=self.num_heads,
                feedforward_channels=self.decoder_ffn_channels,
                spike=self.spike, order=self.decoder_order,
                compat=self.compat, dtype=self.dtype,
                name=f"decoder_{i}")(
                query, decoder_inputs[lvl], decoder_inputs[lvl],
                qpos, decoder_pes[lvl],
                cross_attn_mask=attn_mask_from(mask_list[-1], lvl),
                train=train)
            step_sdme(query)
        if not train and self.eval_last_only:
            return cls_list[-1][None], mask_list[-1][None]
        if lazy:
            from ..losses.criterion import LazyMasks

            return jnp.stack(cls_list), LazyMasks(
                jnp.stack(embed_list), mask_features)
        return jnp.stack(cls_list), jnp.stack(mask_list)


def semantic_inference(cls_scores: jax.Array, mask_preds: jax.Array,
                       dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Per-pixel class logits from mask classification
    (mmseg/models/decode_heads/maskformer_head.py:174-177):
    ``einsum(softmax(cls)[..., :-1], sigmoid(masks))``.

    cls_scores: [B, nq, ncls+1]; mask_preds: [B, nq, H, W]
    → [B, H, W, ncls] (channels-last).  ``dtype`` sets the einsum operand
    precision AND the output storage dtype (accumulation stays f32 inside
    the contraction; bf16 output halves the ~2.5 GB logit write per
    flagship batch, and only exact near-ties can flip the argmax).
    """
    cls_prob = jax.nn.softmax(
        cls_scores.astype(jnp.float32), axis=-1)[..., :-1].astype(dtype)
    mask_prob = jax.nn.sigmoid(mask_preds).astype(dtype)
    return jnp.einsum("bqc,bqhw->bhwc", cls_prob, mask_prob,
                      preferred_element_type=jnp.float32).astype(dtype)
