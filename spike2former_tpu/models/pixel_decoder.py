"""Pixel decoders: spiking FPN fusion + DCN transformer encoder.

Reference: mmdet/models/layers/pixel_decoder.py —
``PixelDecoder`` (:23-138, plain spiking FPN) and
``DCNTransformerEncoderPixelDecoder`` (:316-472, the active config) whose
encoder stack is ``DCNDetrTransformerEncoderLayer``
(detr_layers.py:263-339): three layer-scaled residuals
SepConv_Spike → DCNv3 → MS_MLP.

Layout: pyramid levels [T, B, h, w, c]; returns
(mask_feature [T,B,H/2,W/2,out], memory [T,B,H/16,W/16,feat],
 multi_scale [/16, /8, /4]).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_nearest_torch
from .attention import MSDAFFN
from .dcn import DCNv3
from .layers import BatchNorm, ConvBN, SepConv, Spike, fold_t, unfold_t


class DCNEncoderLayer(nn.Module):
    """x += γ1·SepConv(x); x += γ2·DCNv3(x); x += γ3·FFN(x)
    with layer-scale init 1e-6 (detr_layers.py:301,329-339)."""

    embed_dims: int = 256
    feedforward_channels: int = 1024
    group: int = 32
    dw_kernel_size: int = 5
    layer_scale: float = 1e-6
    spike: str = "qspike"
    compat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def gamma(name):
            return self.param(
                name, nn.initializers.constant(self.layer_scale),
                (self.embed_dims,))

        x = x + gamma("gamma1") * SepConv(
            self.embed_dims, kernel_size=3, padding=1, dw_bn=True,
            num_spikes=3, spike=self.spike, dtype=self.dtype,
            name="conv")(x, train)
        x = x + gamma("gamma2") * DCNv3(
            channels=self.embed_dims, group=self.group,
            dw_kernel_size=self.dw_kernel_size, spike=self.spike,
            compat=self.compat, dtype=self.dtype, name="dcn")(x, train)
        x = x + gamma("gamma3") * MSDAFFN(
            self.embed_dims, self.feedforward_channels, spike=self.spike,
            compat=self.compat, dtype=self.dtype, name="ffn")(x, train)
        return x


class DCNPixelDecoder(nn.Module):
    """DCN-encoder pixel decoder (pixel_decoder.py:316-472)."""

    in_channels: Sequence[int] = (32, 64, 128, 360)
    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_layers: int = 6
    feedforward_channels: int = 1024
    group: int = 32
    dw_kernel_size: int = 5
    spike: str = "qspike"
    compat: bool = False
    remat: bool = False  # checkpoint each encoder layer (training memory)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        num_inputs = len(self.in_channels)
        t = feats[-1].shape[0]

        # /16 level through the DCN encoder
        xf, _ = fold_t(feats[-1])
        xf = Spike(self.spike, name="in_spike")(xf)
        xf = ConvBN(self.feat_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="encoder_in_proj")(xf, train)
        x = unfold_t(xf, t)
        Layer = (nn.remat(DCNEncoderLayer, static_argnums=(2,))
                 if self.remat else DCNEncoderLayer)
        for i in range(self.num_encoder_layers):
            x = Layer(
                self.feat_channels, self.feedforward_channels, self.group,
                self.dw_kernel_size, spike=self.spike, compat=self.compat,
                dtype=self.dtype, name=f"encoder_{i}")(x, train)
        memory = x
        memory = Spike(self.spike, name="out_spike")(memory)
        yf, _ = fold_t(memory)
        yf = ConvBN(self.feat_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="encoder_out_proj")(yf, train)

        # top-down spiking FPN over the higher-res levels
        outs = [unfold_t(yf, t)]
        y = yf
        for idx, i in enumerate(range(num_inputs - 2, -1, -1)):
            lf, _ = fold_t(feats[i])
            lf = Spike(self.spike, name=f"lateral_spike_{idx}")(lf)
            cur = ConvBN(self.feat_channels, (1, 1), use_bias=True,
                         dtype=self.dtype, name=f"lateral_{idx}")(lf, train)
            y = cur + resize_bilinear(y, cur.shape[1:3])
            y = Spike(self.spike, name=f"output_spike_{idx}")(y)
            y = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        feature_group_count=self.feat_channels, use_bias=False,
                        dtype=self.dtype, name=f"output_conv_{idx}")(y)
            y = BatchNorm(use_running_average=not train,
                          name=f"output_bn_{idx}")(y)
            outs.append(unfold_t(y, t))

        y = Spike(self.spike, name="mask_spike")(y)
        mask_feature = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                               dtype=self.dtype, name="mask_feature")(y)
        return unfold_t(mask_feature, t), memory, outs[:3]


class TransformerEncoderPixelDecoder(nn.Module):
    """Pixel decoder with a global spiking-MHA transformer encoder on the
    /16 level (pixel_decoder.py:141-313): 6 x (softmax-free spiking MHA +
    MSDA_FFN) with sine PE, then bilinear top-down spiking FPN."""

    in_channels: Sequence[int] = (32, 64, 128, 360)
    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 1024
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        from .attention import SpikeMHA
        from .positional import sine_pe_for_shape

        num_inputs = len(self.in_channels)
        t, b, h, w, _ = feats[-1].shape

        xf, _ = fold_t(feats[-1])
        xf = Spike(self.spike, name="in_spike")(xf)
        xf = ConvBN(self.feat_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="encoder_in_proj")(xf, train)
        tokens = unfold_t(xf, t).reshape(t, b, h * w, self.feat_channels)
        pe = sine_pe_for_shape(h, w, self.feat_channels // 2).reshape(
            h * w, self.feat_channels)
        pe = jnp.broadcast_to(pe, (b, h * w, self.feat_channels))

        for i in range(self.num_encoder_layers):
            attn = SpikeMHA(self.feat_channels, self.num_heads, self.spike,
                            self.dtype, name=f"encoder_attn_{i}")(
                tokens + pe, tokens + pe, tokens, train=train)
            tokens = tokens + attn
            from .attention import MSDAFFN
            tokens = tokens + MSDAFFN(
                self.feat_channels, self.feedforward_channels,
                spike=self.spike, dtype=self.dtype,
                name=f"encoder_ffn_{i}")(tokens, train)

        memory = tokens.reshape(t, b, h, w, self.feat_channels)
        yf, _ = fold_t(memory)
        yf = ConvBN(self.feat_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="encoder_out_proj")(yf, train)

        outs = [unfold_t(yf, t)]
        y = yf
        for idx, i in enumerate(range(num_inputs - 2, -1, -1)):
            lf, _ = fold_t(feats[i])
            lf = Spike(self.spike, name=f"lateral_spike_{idx}")(lf)
            cur = ConvBN(self.feat_channels, (1, 1), use_bias=True,
                         dtype=self.dtype, name=f"lateral_{idx}")(lf, train)
            y = cur + resize_bilinear(y, cur.shape[1:3])
            y = Spike(self.spike, name=f"output_spike_{idx}")(y)
            y = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        feature_group_count=self.feat_channels, use_bias=False,
                        dtype=self.dtype, name=f"output_conv_{idx}")(y)
            y = BatchNorm(use_running_average=not train,
                          name=f"output_bn_{idx}")(y)
            outs.append(unfold_t(y, t))

        y = Spike(self.spike, name="mask_spike")(y)
        mask_feature = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                               dtype=self.dtype, name="mask_feature")(y)
        return unfold_t(mask_feature, t), memory, outs[:3]


class FPNPixelDecoder(nn.Module):
    """Plain spiking-FPN pixel decoder (pixel_decoder.py:23-138): lateral
    1x1+BN, nearest top-down, 3x3+BN output convs, spiked 1x1 mask head."""

    in_channels: Sequence[int] = (32, 64, 128, 360)
    feat_channels: int = 256
    out_channels: int = 256
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        num_inputs = len(self.in_channels)
        t = feats[-1].shape[0]

        lf, _ = fold_t(feats[-1])
        lf = Spike(self.spike, name="last_spike")(lf)
        y = ConvBN(self.feat_channels, (3, 3), padding=1, use_bias=True,
                   dtype=self.dtype, name="last_feat_conv")(lf, train)

        outs = []
        for idx, i in enumerate(range(num_inputs - 2, -1, -1)):
            xf, _ = fold_t(feats[i])
            xf = Spike(self.spike, name=f"lateral_spike_{idx}")(xf)
            cur = ConvBN(self.feat_channels, (1, 1), use_bias=True,
                         dtype=self.dtype, name=f"lateral_{idx}")(xf, train)
            y = cur + resize_nearest_torch(y, cur.shape[1:3])
            y = Spike(self.spike, name=f"output_spike_{idx}")(y)
            y = ConvBN(self.feat_channels, (3, 3), padding=1, use_bias=True,
                       dtype=self.dtype, name=f"output_{idx}")(y, train)
            outs.append(unfold_t(y, t))

        y = Spike(self.spike, name="mask_spike")(y)
        mask_feature = nn.Conv(self.out_channels, (1, 1),
                               padding=[(1, 1), (1, 1)], use_bias=True,
                               dtype=self.dtype, name="mask_feature")(y)
        memory = feats[-1]
        return unfold_t(mask_feature, t), memory, outs[:3]
