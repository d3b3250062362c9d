"""End-to-end segmentor: backbone → MaskFormer head → semantic logits.

Reference: mmseg/models/segmentors/encoder_decoder.py:17-369 (EncoderDecoder)
+ mmseg/models/data_preprocessor.py:12-152 (SegDataPreProcessor).  The
device-side preprocessing (normalize, pad) is a jitted op here; whole- and
sliding-window inference live in ``spike2former_tpu/engine/inference.py``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear_hw
from .maskformer_head import MaskFormerHead, semantic_inference
from .sdtv2 import SpikingMetaFormer

# ImageNet RGB normalization used by every shipped config
# (configs/Spike2Former/*.py data_preprocessor).
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def preprocess(images_u8: jax.Array,
               mean: Sequence[float] = IMAGENET_MEAN,
               std: Sequence[float] = IMAGENET_STD) -> jax.Array:
    """[B, H, W, 3] uint8/float RGB → normalized float32."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images_u8.astype(jnp.float32) - mean) / std


class Spike2Former(nn.Module):
    """Spiking MaskFormer segmentor (SDTv2/SDTv3 backbone + DCN MaskFormer
    head)."""

    num_classes: int = 150
    embed_dim: Sequence[int] = (64, 128, 256, 360)
    backbone_heads: int = 8
    T: int = 4
    variant: str = "sdtv2"
    feat_channels: int = 256
    num_queries: int = 100
    num_decoder_layers: int = 6
    num_encoder_layers: int = 6
    depths_stage3: int = 6
    depths_stage4: int = 2
    dcn_group: int = 32
    compat: bool = False  # reference-exact layout quirks (for converted ckpts)
    norm_eval: bool = True  # freeze backbone BN stats in training (config :41)
    # Collapse the timestep axis: the Qtrick spike ops used by every
    # Spike2Former variant are stateless across T and the input is repeated,
    # so all T time slices are identical and the head's mean-over-T equals
    # the single-step value — compute one step instead of T identical ones.
    # Exact (not approximate); see SpikingMetaFormer.__call__ and
    # tests/test_collapse_t.py.  Disable to replay the reference's literal
    # T-times recompute (e.g. for firing-stat dumps per time step).
    collapse_t: bool = True
    # checkpoint backbone blocks + DCN encoder layers: recompute in the
    # backward instead of saving activations — cuts train HBM peak (admits
    # larger per-chip batches) and most of the fwd->bwd layout-copy traffic
    remat: bool = False
    # Mask2Former-style masked cross-attention in the decoder (per-layer
    # mask predictions gate the next layer's keys) — see MaskFormerHead
    masked_attention: bool = False
    # decoder stack: 'detr' (Spike2Former default) or 'dab' (spiking
    # DAB-DETR dynamic anchor-box decoder, models/dab_detr.py)
    decoder: str = "detr"
    # False = replay the reference's literal all-layers SDME at eval
    # (firing-rate analysis); True skips the discarded layers' work
    eval_last_only: bool = True
    # factored train-time mask predictions (see MaskFormerHead.lazy_masks)
    lazy_masks: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        e = self.embed_dim
        self.backbone = SpikingMetaFormer(
            embed_dim=e, num_heads=self.backbone_heads, T=self.T,
            variant=self.variant, depths_stage3=self.depths_stage3,
            depths_stage4=self.depths_stage4, norm_eval=self.norm_eval,
            collapse_t=self.collapse_t, remat=self.remat, dtype=self.dtype)
        last_c = e[2] if self.variant == "sdtv3mae" else e[3]
        self.head = MaskFormerHead(
            in_channels=(e[0] // 2, e[0], e[1], last_c),
            feat_channels=self.feat_channels,
            out_channels=self.feat_channels,
            num_classes=self.num_classes,
            num_queries=self.num_queries,
            num_decoder_layers=self.num_decoder_layers,
            num_encoder_layers=self.num_encoder_layers,
            dcn_group=min(self.dcn_group, self.feat_channels),
            spike="qspike", compat=self.compat, remat=self.remat,
            masked_attention=self.masked_attention, decoder=self.decoder,
            eval_last_only=self.eval_last_only,
            lazy_masks=self.lazy_masks, dtype=self.dtype)

    def __call__(self, images: jax.Array, train: bool = False,
                 valid_hw: jax.Array | None = None):
        """images: [B, H, W, 3] normalized.  Returns (cls_scores, mask_preds)
        — [L, B, nq, ncls+1], [L, B, nq, H/2, W/2] (L=7 in train, 1 in
        eval).  ``valid_hw`` [B, 2]: valid extents for bucketed-padded
        inputs (see MaskFormerHead)."""
        feats = self.backbone(images, train)
        return self.head(feats, train, valid_hw=valid_hw)

    def predict_logits(self, images: jax.Array,
                       valid_hw: jax.Array | None = None) -> jax.Array:
        """Whole-image semantic logits at input resolution
        (encoder_decoder.py whole_inference + the mmseg head shim's
        semantic-inference einsum): [B, H, W, num_classes]."""
        cls_scores, mask_preds = self(images, train=False,
                                      valid_hw=valid_hw)
        mask = mask_preds[-1]  # [B, nq, h, w]
        hw = images.shape[1:3]
        # the upsample + semantic einsum run in the model compute dtype
        # (bf16 on TPU: ~1.5x faster tail, argmax agreement ~99.8%,
        # |dlogit| ~1e-3; f32 models keep the reference-exact f32 path);
        # resize in the native [B, nq, H, W] layout — no transpose passes
        mask = resize_bilinear_hw(mask.astype(self.dtype), hw)
        return semantic_inference(cls_scores[-1], mask, dtype=self.dtype)
