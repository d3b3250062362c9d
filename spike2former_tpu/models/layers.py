"""Spiking conv/BN building blocks shared by the SDTv2/SDTv3 backbones and
the MaskFormer head.

TPU design notes
----------------
* Layout is channels-last ``[T, B, H, W, C]`` (tokens: ``[T, B, N, C]``); the
  temporal axis is folded into batch for convs/BN, exactly mirroring the
  reference's ``x.flatten(0, 1)`` (e.g. sdtv2.py:172-178) but in the layout
  XLA tiles best onto the MXU.
* BatchNorm statistics are computed over ``(T*B, H, W)`` per channel — the
  same population the reference's ``nn.BatchNorm2d`` sees after flattening.
  Under a sharded ``jit``, XLA turns the batch reduction into a cross-chip
  collective automatically (SyncBN equivalent).
* The quantized spike nonlinearity is a pure op (see ``ops/spike.py``) and
  fuses into the surrounding convs.

Reference blocks reproduced here (file:line cite → class):
  sdtv2.py:48-109  BNAndPadLayer   → ``BNAndPad``
  sdtv2.py:112-132 RepConv         → ``RepConv``
  sdtv2.py:135-180 SepConv         → ``SepConv`` (2 spikes, no BN after dw)
  SNN_core.py:11-63 SepConv_Spike  → ``SepConv`` (3 spikes, BN after dw)
  sdtv2.py:183-219 MS_ConvBlock    → ``MSConvBlock``
  sdtv2.py:222-255 MS_MLP          → ``MSMLP``
  sdtv2.py:386-421 MS_DownSampling → ``DownSampling``
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.spike import (qspike, multispike_norm, multispike8,
                         spike_rate)

SpikeFn = Callable[[jax.Array], jax.Array]

SPIKE_FNS: dict[str, tuple[SpikeFn, float]] = {
    # name -> (fn, quantization level D used for firing-rate stats)
    "qspike": (qspike, 8.0),
    "multispike_norm": (multispike_norm, 4.0),
    "multispike8": (multispike8, 8.0),
}


def _packed_cgd(spike_kind: str | None):
    """``conv_general_dilated`` override for convs whose input is the
    output of a ``Spike(spike_kind)`` site: when packed residuals are
    enabled (ops/spike_op.py — the reference spike_op.py's compact spike
    caching, re-done as 4-bit packed codes), the conv's autodiff residual
    stores the spike CODES instead of the float activation.  Numerically
    identical either way; returns None (flax default) when disabled.
    """
    if spike_kind is None:
        return None
    from ..ops import spike_op

    if not spike_op.packed_enabled():
        return None
    return spike_op.packed_conv_fn(SPIKE_FNS[spike_kind][1])


def fold_t(x: jax.Array) -> tuple[jax.Array, int]:
    """[T, B, ...] -> [(T*B), ...]."""
    t = x.shape[0]
    return x.reshape((-1,) + x.shape[2:]), t


def unfold_t(x: jax.Array, t: int) -> jax.Array:
    return x.reshape((t, -1) + x.shape[1:])


class Spike(nn.Module):
    """Quantized spike site with optional firing-rate observation.

    Firing-rate statistics (``mean(output) * D`` per site, the quantity
    tools/cal_firing_num.py accumulates via forward hooks) are exposed via
    flax's ``sow`` into the ``spikes`` collection — ask for it with
    ``mutable=['spikes']`` instead of attaching hooks.
    """

    kind: str = "qspike"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fn, d = SPIKE_FNS[self.kind]
        y = fn(x)
        self.sow("spikes", "rate", spike_rate(y, d))
        # the vendored Monitor's second statistic (monitor.py:11-220):
        # fraction of sites that did NOT fire this forward
        self.sow("spikes", "nonfire", jnp.mean((y == 0).astype(jnp.float32)))
        return y


class BatchNorm(nn.Module):
    """BatchNorm over all leading axes (channel last), torch-compatible
    defaults (eps 1e-5, momentum 0.1)."""

    use_running_average: bool | None = None
    momentum: float = 0.9  # flax convention: ra = m*ra + (1-m)*batch
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        y = nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )(x)
        # flax promotes the output to the param dtype (f32); keep the
        # activation stream in the caller's compute dtype so bf16 models
        # don't silently double every BN output / residual chain in HBM.
        # Stats and normalization still compute in f32 inside nn.BatchNorm.
        return y if self.dtype is not None else y.astype(x.dtype)


class ConvBN(nn.Module):
    """Conv2d (+ optional bias) followed by BatchNorm, on [(T*B), H, W, C]."""

    features: int
    kernel: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: str | int = 0
    groups: int = 1
    use_bias: bool = False
    bn: bool = True
    dtype: jnp.dtype = jnp.float32
    # set to the preceding Spike site's kind when this conv's input is a
    # spike output — enables packed 4-bit residuals (see _packed_cgd)
    spike_input: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            conv_general_dilated=_packed_cgd(self.spike_input),
        )(x)
        if self.bn:
            x = BatchNorm(use_running_average=not train)(x)
        return x


class BNAndPad(nn.Module):
    """BatchNorm then pad the 1px border with the BN's zero-input response
    (bias - mean * gamma / sqrt(var + eps)), so a following VALID 3x3 conv
    sees the halo a padded-then-BN'd input would have produced.

    Matches BNAndPadLayer (sdtv2.py:48-109).
    """

    pad_pixels: int = 1
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x.astype(jnp.float32), axes)
            var = jnp.var(x.astype(jnp.float32), axes)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        y = ((x.astype(jnp.float32) - mean) * inv * scale + bias).astype(x.dtype)

        p = self.pad_pixels
        if p == 0:
            return y
        # Pad value = BN response to a zero input, from *running* stats with
        # detached affine params (sdtv2.py:67-78).
        pad_value = (jax.lax.stop_gradient(bias)
                     - ra_mean.value * jax.lax.stop_gradient(scale)
                     * jax.lax.rsqrt(ra_var.value + self.epsilon))
        pad_value = pad_value.astype(y.dtype)
        y = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))
        # overwrite borders with the constant pad value
        n, h, w, c = y.shape
        row = jnp.broadcast_to(pad_value, (n, p, w, c))
        y = y.at[:, :p].set(row).at[:, -p:].set(row)
        col = jnp.broadcast_to(pad_value, (n, h, p, c))
        y = y.at[:, :, :p].set(col).at[:, :, -p:].set(col)
        return y


class RepConv(nn.Module):
    """1x1 -> BNAndPad(1) -> [dw3x3 VALID -> 1x1 -> BN] (sdtv2.py:112-132)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    # preceding Spike kind when the module INPUT is a spike output —
    # packs the first 1x1's backward residual (the later convs see
    # BNAndPad/dw outputs, which are not quantized)
    spike_input: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        x = nn.Conv(c_in, (1, 1), use_bias=False, dtype=self.dtype,
                    conv_general_dilated=_packed_cgd(self.spike_input))(x)
        x = BNAndPad(pad_pixels=1)(x, train)
        x = nn.Conv(c_in, (3, 3), padding="VALID", feature_group_count=c_in,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train)(x)
        return x


class SepConv(nn.Module):
    """Inverted separable conv (MobileNetV2 style) with spike activations.

    ``dw_bn=False, num_spikes=2`` reproduces sdtv2's SepConv
    (spike→pw→BN→spike→dw→pw→BN); ``dw_bn=True, num_spikes=3`` reproduces
    SepConv_Spike (SNN_core.py:11-63 / sdtv3.py:99-148).
    Operates on [T, B, H, W, C].
    """

    dim: int
    expansion_ratio: int = 2
    kernel_size: int = 7
    padding: int = 3
    dw_bn: bool = False
    num_spikes: int = 2
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        med = int(self.expansion_ratio * self.dim)
        xf, t = fold_t(x)
        xf = Spike(self.spike)(xf)
        xf = ConvBN(med, (1, 1), dtype=self.dtype,
                    spike_input=self.spike)(xf, train)
        xf = Spike(self.spike)(xf)
        xf = nn.Conv(med, (self.kernel_size,) * 2,
                     padding=[(self.padding,) * 2] * 2,
                     feature_group_count=med, use_bias=False,
                     dtype=self.dtype,
                     conv_general_dilated=_packed_cgd(self.spike))(xf)
        if self.dw_bn:
            xf = BatchNorm(use_running_average=not train)(xf)
        if self.num_spikes >= 3:
            xf = Spike(self.spike)(xf)
        xf = ConvBN(self.dim, (1, 1), dtype=self.dtype,
                    spike_input=self.spike if self.num_spikes >= 3
                    else None)(xf, train)
        return unfold_t(xf, t)


class MSConvBlock(nn.Module):
    """x += SepConv(x); then spike→3x3(4x)→BN→spike→3x3→BN residual
    (sdtv2.py:183-219; sdtv3 variant uses SepConv_Spike + multispike)."""

    dim: int
    mlp_ratio: int = 4
    sepconv_dw_bn: bool = False
    sepconv_num_spikes: int = 2
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + SepConv(
            self.dim, dw_bn=self.sepconv_dw_bn,
            num_spikes=self.sepconv_num_spikes, spike=self.spike,
            dtype=self.dtype)(x, train)
        feat = x
        xf, t = fold_t(x)
        xf = Spike(self.spike)(xf)
        xf = ConvBN(self.dim * self.mlp_ratio, (3, 3), padding=1,
                    dtype=self.dtype, spike_input=self.spike)(xf, train)
        xf = Spike(self.spike)(xf)
        xf = ConvBN(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    spike_input=self.spike)(xf, train)
        return feat + unfold_t(xf, t)


class MSMLP(nn.Module):
    """Token MLP as pointwise convs over flattened N (sdtv2.py:222-255).

    Input [T, B, H, W, C] or [T, B, N, C]; pointwise so layout is free.
    """

    hidden: int
    out: int | None = None
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.out or x.shape[-1]
        xf, t = fold_t(x)
        xf = Spike(self.spike)(xf)
        xf = nn.Conv(self.hidden, (1,) * (xf.ndim - 2), use_bias=True,
                     dtype=self.dtype,
                     conv_general_dilated=_packed_cgd(self.spike))(xf)
        xf = BatchNorm(use_running_average=not train)(xf)
        xf = Spike(self.spike)(xf)
        xf = nn.Conv(out, (1,) * (xf.ndim - 2), use_bias=True,
                     dtype=self.dtype,
                     conv_general_dilated=_packed_cgd(self.spike))(xf)
        xf = BatchNorm(use_running_average=not train)(xf)
        return unfold_t(xf, t)


class DownSampling(nn.Module):
    """(spike→)conv(k,s,p)→BN stage-transition (sdtv2.py:386-421)."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    first_layer: bool = False
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xf, t = fold_t(x)
        if not self.first_layer:
            xf = Spike(self.spike)(xf)
        xf = nn.Conv(self.features, (self.kernel,) * 2,
                     strides=(self.stride,) * 2,
                     padding=[(self.padding,) * 2] * 2,
                     use_bias=True, dtype=self.dtype,
                     conv_general_dilated=_packed_cgd(
                         None if self.first_layer else self.spike))(xf)
        xf = BatchNorm(use_running_average=not train)(xf)
        return unfold_t(xf, t)
