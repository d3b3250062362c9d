"""Spiking DCNv3 module (offset/mask heads + deformable sampling).

Reference: mmdet/models/layers/transformer/ops_dcnv3/modules/dcnv3.py:96-233
(``DCNv3_pytorch``).  Distinctive Spike2Former choices faithfully kept:
* input/output projections are SepConv_Spike stacks (not linear),
* offset and mask heads are conv1x1+BN (zero-initialized conv),
* the sampling mask goes through a Q-IF spike **instead of softmax**
  (dcnv3.py:213-215).

The native CUDA extension (ops_dcnv3/src/) is replaced by the XLA gather
formulation in ``ops/dcnv3.py`` (Pallas kernel: ``ops/pallas``).
Layout: [T, B, H, W, C].
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcnv3 import dcnv3_core
from .layers import (BatchNorm, SepConv, Spike, _packed_cgd, fold_t,
                     unfold_t)


class DCNv3(nn.Module):
    channels: int = 256
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 32
    offset_scale: float = 1.0
    expansion_ratio: int = 2
    dw_kernel_size: int = 5
    spike: str = "qspike"
    compat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, b, h, w, c = x.shape
        g, k = self.group, self.kernel_size
        p = k * k

        sep_kw = dict(dim=self.channels, kernel_size=self.dw_kernel_size,
                      padding=(self.dw_kernel_size - 1) // 2,
                      expansion_ratio=self.expansion_ratio,
                      dw_bn=True, num_spikes=3, spike=self.spike,
                      dtype=self.dtype)
        value = SepConv(name="input_proj", **sep_kw)(x, train)

        x1f, _ = fold_t(x)
        x1f = Spike(self.spike)(x1f)
        x1f = nn.Conv(self.channels, (self.dw_kernel_size,) * 2,
                      padding=[( (self.dw_kernel_size - 1) // 2,) * 2] * 2,
                      feature_group_count=self.channels, use_bias=False,
                      dtype=self.dtype, name="dw_conv",
                      conv_general_dilated=_packed_cgd(self.spike))(x1f)
        x1f = BatchNorm(use_running_average=not train, name="dw_bn")(x1f)
        x1f = Spike(self.spike)(x1f)

        zeros = nn.initializers.zeros
        offset = nn.Conv(g * p * 2, (1, 1), use_bias=True, kernel_init=zeros,
                         dtype=self.dtype, name="offset_conv",
                         conv_general_dilated=_packed_cgd(self.spike))(x1f)
        offset = BatchNorm(use_running_average=not train,
                           name="offset_bn")(offset)
        mask = nn.Conv(g * p, (1, 1), use_bias=True, kernel_init=zeros,
                       dtype=self.dtype, name="mask_conv",
                       conv_general_dilated=_packed_cgd(self.spike))(x1f)
        mask = BatchNorm(use_running_average=not train, name="mask_bn")(mask)
        if self.compat:
            # Reference quirk (modules/dcnv3.py:213-215): the offset/mask
            # heads run channels-FIRST and their outputs are reinterpreted
            # channels-last with a plain reshape — a fixed (channel, spatial)
            # shuffle the trained weights encode.  Replay it exactly.
            def _cf_reshuffle(y):
                tb = y.shape[0]
                return jnp.transpose(y, (0, 3, 1, 2)).reshape(
                    tb, h, w, y.shape[-1])

            offset = _cf_reshuffle(offset)
            mask = _cf_reshuffle(mask)
        mask = Spike(self.spike)(mask)

        valf, _ = fold_t(value)
        # Pallas sampling kernel (forward + custom backward kernels) on TPU,
        # XLA contraction path on CPU.
        out = dcnv3_core(
            valf, offset, mask,
            kernel_h=k, kernel_w=k,
            stride_h=self.stride, stride_w=self.stride,
            pad_h=self.pad, pad_w=self.pad,
            dilation_h=self.dilation, dilation_w=self.dilation,
            group=g, group_channels=self.channels // g,
            offset_scale=self.offset_scale)
        out = unfold_t(out, t)
        out = SepConv(name="output_proj", **sep_kw)(out, train)
        return out
