"""Cascade encoder-decoder segmentor.

Reference: mmseg/models/segmentors/cascade_encoder_decoder.py:13-140 —
``num_stages`` decode heads where stage 0 sees only backbone features and
every later stage refines ``(features, prev_logits)``; training sums each
stage's decode loss under a ``decode_<i>`` prefix (:90-116), inference
takes the LAST head's prediction (:74-88).

The reference fork ships no cascade config (the component is inherited
mmseg scaffolding), so the refinement stage here is the minimal faithful
head honoring the cascade contract: previous logits are embedded with a
1x1 conv, added to the fused FPN feature, and a spiking conv head emits a
residual correction on top of the previous stage's logits.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .fpn import ConvBNT, FPNHead, FPNNeck, Neuron
from .layers import fold_t, unfold_t
from .sdtv2 import SpikingMetaFormer


class CascadeRefineHead(nn.Module):
    """Stage >= 1 cascade head: ``(feats, prev_logits) -> logits``.

    prev logits are projected into the feature space (1x1 conv), summed
    with the finest-stride FPN feature, refined by a spiking conv stack,
    and emitted as a residual on top of ``prev_logits`` so each stage can
    only improve on — never forget — the previous decision.
    """

    num_classes: int
    channels: int = 128
    neuron: str = "lif"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], prev_logits: jax.Array,
                 train: bool = False):
        y = feats[0]                                 # [T, B, h, w, C]
        t = y.shape[0]
        prev = prev_logits
        if prev.shape[1:3] != y.shape[2:4]:
            prev = resize_bilinear(prev, y.shape[2:4])
        ctx = nn.Conv(y.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                      name="logit_embed")(prev)      # [B, h, w, C]
        y = y + ctx[None]                            # broadcast over T

        y = Neuron(self.neuron, name="refine_neuron_0")(y)
        y = ConvBNT(self.channels, 3, 1, dtype=self.dtype,
                    name="refine_conv_0")(y, train)
        y = Neuron(self.neuron, name="refine_neuron_1")(y)
        yf, _ = fold_t(y)
        delta = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                        dtype=self.dtype, name="cls")(yf)
        delta = unfold_t(delta, t).mean(axis=0)      # [B, h, w, K]
        return prev + delta


class CascadeSegmentor(nn.Module):
    """Backbone + FPN neck + ``num_stages`` cascaded decode heads."""

    num_classes: int = 150
    num_stages: int = 2
    embed_dim: Sequence[int] = (64, 128, 256, 360)
    backbone_heads: int = 8
    T: int = 4
    variant: str = "sdtv2"
    neck_channels: int = 256
    head_channels: int = 128
    neuron: str = "lif"
    depths_stage3: int = 6
    depths_stage4: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.num_stages >= 2, "cascade needs >= 2 stages"
        e = self.embed_dim
        self.backbone = SpikingMetaFormer(
            embed_dim=e, num_heads=self.backbone_heads, T=self.T,
            variant=self.variant, depths_stage3=self.depths_stage3,
            depths_stage4=self.depths_stage4, dtype=self.dtype)
        self.neck = FPNNeck(
            in_channels=(e[0] // 2, e[0], e[1], e[3]),
            out_channels=self.neck_channels, neuron=self.neuron,
            dtype=self.dtype)
        self.stage0 = FPNHead(
            num_classes=self.num_classes, channels=self.head_channels,
            feature_strides=(2, 4, 8, 16), neuron=self.neuron,
            dtype=self.dtype)
        self.refine = [
            CascadeRefineHead(
                num_classes=self.num_classes, channels=self.head_channels,
                neuron=self.neuron, dtype=self.dtype,
                name=f"stage{i}")
            for i in range(1, self.num_stages)]

    def __call__(self, images: jax.Array, train: bool = False):
        """Returns the per-stage logits list (finest stride, mean over T) —
        the training contract (each stage gets its own decode loss)."""
        feats = self.backbone(images, train)
        feats = self.neck(feats, train)
        outs = [self.stage0(feats, train)]
        for head in self.refine:
            outs.append(head(feats, outs[-1], train))
        return outs

    def predict_logits(self, images: jax.Array,
                       valid_hw: jax.Array | None = None) -> jax.Array:
        del valid_hw  # pure local conv; padding is cropped by postprocess
        logits = self(images, train=False)[-1]       # last stage only
        return resize_bilinear(logits, images.shape[1:3])
