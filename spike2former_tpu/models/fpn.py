"""FPN model family — the reference's second supported pipeline.

Reference: mmseg/models/necks/fpn.py (FPN :19, QFPN :224, FPN_SNN :372) and
mmseg/models/decode_heads/fpn_head.py (FPNHead :19, QFPNHead :78,
FPNHead_SNN :140) with configs/FPN/*.

The SNN variants wrap every conv in a true multi-step LIF neuron
(``MultiStepLIFNode(tau=2.0, detach_reset=True)``) — here the ``lax.scan``
LIF from ``ops/neuron.py`` applied over the leading T axis; the Q variants
use the stateless multispike quantizer.  Per-pixel classification head sums
bilinear-aligned scale heads and averages logits over T.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.neuron import multistep_lif
from ..ops.resize import resize_bilinear, resize_nearest_torch
from .layers import BatchNorm, Spike, fold_t, unfold_t
from .sdtv2 import SpikingMetaFormer


class Neuron(nn.Module):
    """Temporal neuron over [T, B, ...]: multi-step LIF/IF/EIF (binary
    spikes), parametric LIF (learned tau), or the stateless multispike
    quantizer."""

    kind: str = "lif"

    @nn.compact
    def __call__(self, x):
        if self.kind == "lif":
            return multistep_lif(x, tau=2.0, detach_reset=True).spikes
        if self.kind == "if":
            from ..ops.neuron import multistep_if

            return multistep_if(x, detach_reset=True).spikes
        if self.kind == "eif":
            from ..ops.neuron import multistep_eif

            return multistep_eif(x, tau=2.0, detach_reset=True).spikes
        if self.kind == "plif":
            from ..ops.neuron import multistep_plif

            w = self.param("w", nn.initializers.constant(0.0), ())
            return multistep_plif(x, w, detach_reset=True).spikes
        return Spike("multispike_norm")(x)


class ConvBNT(nn.Module):
    """conv+BN applied with T folded into batch."""

    features: int
    kernel: int = 1
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xf, t = fold_t(x)
        xf = nn.Conv(self.features, (self.kernel,) * 2,
                     padding=[(self.padding,) * 2] * 2, use_bias=False,
                     dtype=self.dtype)(xf)
        xf = BatchNorm(use_running_average=not train)(xf)
        return unfold_t(xf, t)


class FPNNeck(nn.Module):
    """FPN_SNN (fpn.py:372-...): neuron→lateral 1x1+BN, nearest top-down sum,
    neuron→3x3+BN output convs."""

    in_channels: Sequence[int] = (64, 128, 256, 360)
    out_channels: int = 256
    neuron: str = "lif"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        laterals = []
        for i, f in enumerate(feats):
            y = Neuron(self.neuron, name=f"lateral_neuron_{i}")(f)
            y = ConvBNT(self.out_channels, 1, dtype=self.dtype,
                        name=f"lateral_{i}")(y, train)
            laterals.append(y)
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_nearest_torch(laterals[i], laterals[i - 1].shape[2:4])
            laterals[i - 1] = laterals[i - 1] + up
        outs = []
        for i, lat in enumerate(laterals):
            y = Neuron(self.neuron, name=f"fpn_neuron_{i}")(lat)
            y = ConvBNT(self.out_channels, 3, 1, dtype=self.dtype,
                        name=f"fpn_{i}")(y, train)
            outs.append(y)
        return outs


class FPNHead(nn.Module):
    """FPNHead_SNN (fpn_head.py:140-240): per-level scale heads (neuron →
    3x3+BN [→ x2 bilinear up]) summed at the finest stride, then neuron →
    1x1 classifier, logits averaged over T."""

    num_classes: int
    channels: int = 128
    feature_strides: Sequence[int] = (4, 8, 16, 32)
    neuron: str = "lif"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        import numpy as np

        s0 = self.feature_strides[0]
        out = None
        for i, stride in enumerate(self.feature_strides):
            length = max(1, int(np.log2(stride) - np.log2(s0)))
            y = feats[i]
            for k in range(length):
                y = Neuron(self.neuron, name=f"head_neuron_{i}_{k}")(y)
                y = ConvBNT(self.channels, 3, 1, dtype=self.dtype,
                            name=f"head_conv_{i}_{k}")(y, train)
                if stride != s0:
                    t = y.shape[0]
                    yf, _ = fold_t(y)
                    yf = resize_bilinear(
                        yf, (yf.shape[1] * 2, yf.shape[2] * 2))
                    y = unfold_t(yf, t)
            if out is None:
                out = y
            else:
                if y.shape[2:4] != out.shape[2:4]:
                    t = y.shape[0]
                    yf, _ = fold_t(y)
                    yf = resize_bilinear(yf, out.shape[2:4])
                    y = unfold_t(yf, t)
                out = out + y

        out = Neuron(self.neuron, name="decode_neuron")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         dtype=self.dtype)(out)
        return logits.mean(axis=0)  # [B, h, w, num_classes]


class FPNSegmentor(nn.Module):
    """Backbone + FPN neck + per-pixel head (configs/FPN/*)."""

    num_classes: int = 150
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
        e = self.embed_dim
        if self.variant.startswith("msresnet"):
            # spiking ResNet pyramid (models/msresnet.py): strides
            # 4/8/16/32, channels width*(1,2,4,8); width = embed_dim[0]
            from .msresnet import MSResNet

            self.backbone = MSResNet(
                variant=self.variant, width=e[0], T=self.T,
                dtype=self.dtype)
            in_channels = tuple(e[0] * (2 ** i) for i in range(4))
            strides = (4, 8, 16, 32)
        else:
            self.backbone = SpikingMetaFormer(
                embed_dim=e, num_heads=self.backbone_heads, T=self.T,
                variant=self.variant, depths_stage3=self.depths_stage3,
                depths_stage4=self.depths_stage4, dtype=self.dtype)
            in_channels = (e[0] // 2, e[0], e[1], e[3])
            strides = (2, 4, 8, 16)
        self.neck = FPNNeck(
            in_channels=in_channels,
            out_channels=self.neck_channels, neuron=self.neuron,
            dtype=self.dtype)
        self.head = FPNHead(
            num_classes=self.num_classes, channels=self.head_channels,
            feature_strides=strides, neuron=self.neuron,
            dtype=self.dtype)

    def __call__(self, images: jax.Array, train: bool = False):
        feats = self.backbone(images, train)
        feats = self.neck(feats, train)
        return self.head(feats, train)  # logits at stride 2

    def predict_logits(self, images: jax.Array,
                       valid_hw: jax.Array | None = None) -> jax.Array:
        # valid_hw (bucket-padded eval) is accepted for interface parity
        # with Spike2Former but needs no masking here: the network is pure
        # local conv (no attention over padded keys), so padded regions
        # only produce logits that postprocess_pred crops away — the same
        # behavior as the reference FPN path under pad-to-divisor.
        del valid_hw
        logits = self(images, train=False)
        return resize_bilinear(logits, images.shape[1:3])
