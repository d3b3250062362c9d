"""MS-ResNet: spiking residual backbones (RM/MS-ResNet-18/34/104).

Reference: mmseg/models/backbones/MSResnet.py —
``Snn_Conv2d`` (:107-140, per-timestep conv), ``batch_norm_2d``/TDBN
(:65-105, BatchNorm3d over [B, C, T, H, W] == statistics over (T·B, H, W)
per channel, with a zero-gamma variant on the block's second BN),
``BasicBlock_104``/``BasicBlock_18`` (:144-181 / :240-280:
spike → 3x3 conv (stride) → TDBN → spike → 3x3 conv → TDBN(0-init),
plus a conv shortcut — avg-pooled for the 104 flavor) and
``ResNet_104``/``ResNet_origin_18`` (:184-236 / :283-332; note their
``self.pool`` is built but never called in forward — the stage strides
alone set the pyramid).

TPU-native layout [T, B, H, W, C] channels-last; the reference's Python
loop over timesteps inside ``Snn_Conv2d`` is a single conv over the folded
(T·B) batch (identical math, one MXU dispatch), and TDBN is exactly our
``BatchNorm`` over the folded batch.  The classification models in the
reference are re-cast here as a 4-level pyramid backbone (strides
4/8/16/32) usable under the FPN family, with the reference's
avg-pool + mean-over-T + fc available via ``classify=True``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Spike, fold_t, unfold_t


class ConvBNF(nn.Module):
    """Conv + TDBN on folded [(T*B), H, W, C] tensors."""

    features: int
    kernel: int = 3
    stride: int = 1
    zero_init: bool = False
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, train: bool = False):
        pad = (self.kernel - 1) // 2
        xf = nn.Conv(self.features, (self.kernel,) * 2,
                     strides=(self.stride,) * 2,
                     padding=[(pad, pad)] * 2, use_bias=self.use_bias,
                     dtype=self.dtype)(xf)
        scale_init = (nn.initializers.zeros if self.zero_init
                      else nn.initializers.ones)
        xf = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, scale_init=scale_init,
                          dtype=self.dtype)(xf)
        return xf


class SnnBasicBlock(nn.Module):
    """BasicBlock_104 / BasicBlock_18 (MSResnet.py:144-181, :240-280)."""

    features: int
    stride: int = 1
    avgpool_shortcut: bool = True   # 104 flavor; False = 18/34 flavor
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, train: bool = False):
        cin = xf.shape[-1]
        y = Spike(self.spike)(xf)
        y = ConvBNF(self.features, 3, self.stride, dtype=self.dtype,
                    name="conv_bn_1")(y, train)
        y = Spike(self.spike)(y)
        y = ConvBNF(self.features, 3, 1, zero_init=True, dtype=self.dtype,
                    name="conv_bn_2")(y, train)

        sc = xf
        if self.stride != 1 or cin != self.features:
            if self.avgpool_shortcut and self.stride != 1:
                # AvgPool3d((1,2,2)) then 1x1 conv stride 1 (:170-178)
                sc = nn.avg_pool(sc, (self.stride,) * 2,
                                 strides=(self.stride,) * 2)
                sc = ConvBNF(self.features, 1, 1, dtype=self.dtype,
                             name="shortcut")(sc, train)
            else:
                # 1x1 conv with the stride (:266-274)
                sc = ConvBNF(self.features, 1, self.stride,
                             dtype=self.dtype, name="shortcut")(sc, train)
        return y + sc


_LAYOUTS = {
    "msresnet18": ([2, 2, 2, 2], False),
    "msresnet34": ([3, 4, 6, 3], False),
    "msresnet104": ([3, 8, 32, 8], True),
}


class MSResNet(nn.Module):
    """4-level spiking ResNet pyramid (strides 4/8/16/32, channels
    ``width * (1, 2, 4, 8)``)."""

    variant: str = "msresnet18"
    width: int = 64
    T: int = 1
    num_classes: int = 0            # >0 adds the reference's fc head
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False,
                 classify: bool = False):
        """images [B, H, W, 3] → 4 feature maps [T, B, h, w, C] (or class
        logits [B, num_classes] with ``classify=True``)."""
        num_block, avgpool = _LAYOUTS[self.variant]
        x = jnp.broadcast_to(images[None],
                             (self.T, *images.shape)).astype(self.dtype)
        xf, t = fold_t(x)

        # stem (stride 2): 104 = three 3x3 convs then BN (:189-196);
        # 18/34 = one 7x7 conv then BN (:285-294)
        if avgpool:
            for i, s in enumerate((2, 1, 1)):
                pad = 1
                xf = nn.Conv(self.width, (3, 3), strides=(s, s),
                             padding=[(pad, pad)] * 2, use_bias=True,
                             dtype=self.dtype, name=f"stem_conv_{i}")(xf)
            xf = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype,
                              name="stem_bn")(xf)
        else:
            xf = ConvBNF(self.width, 7, 2, dtype=self.dtype,
                         name="stem")(xf, train)

        feats = []
        for stage, blocks in enumerate(num_block):
            features = self.width * (2 ** stage)
            for b in range(blocks):
                xf = SnnBasicBlock(
                    features, stride=(2 if b == 0 else 1),
                    avgpool_shortcut=avgpool, spike=self.spike,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{b}")(xf, train)
            feats.append(unfold_t(xf, t))

        if not classify:
            return feats

        # classification tail (:221-236): spike → global avg pool →
        # mean over T → (dropout in the 104 flavor) → fc
        y = Spike(self.spike)(xf)
        y = jnp.mean(y, axis=(1, 2))                  # [(T*B), C]
        y = unfold_t(y, t).mean(axis=0)               # [B, C]
        if avgpool:
            y = nn.Dropout(0.2, deterministic=not train)(y)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="fc")(y)
