"""Meta-SpikeFormer backbones: SDTv2 (``Spiking_vit_MetaFormer``) and
SDTv3 / E-SpikeFormer (``Spiking_vit_MetaFormerv2``).

Reference: Segmentation/mmseg/models/backbones/sdtv2.py:424-655 and
sdtv3.py:401-616.  Four stages of conv-BN-spike blocks + spike-driven linear
attention, run over ``T`` explicit time steps with normalized-integer spiking
activations.  Returns a 4-level pyramid ``[T, B, H/s, W/s, C_s]`` for
strides s in (2, 4, 8, 16) (``decode_mode='Qsnn'``/``'QTrick'``).

TPU notes:
* The spike-driven attention is softmax-free, so we associate the matmul
  chain as ``q @ (k^T v)`` — O(N * C^2/h) instead of O(N^2) — which is
  bit-identical up to float association to the reference's
  ``(q k^T) v`` (sdtv3.py:312-313) and exactly the order SDTv2 already uses
  (sdtv2.py:335-336).  Both matmuls land on the MXU.
* T is folded into the batch for every conv/BN (the reference's
  ``flatten(0,1)``), so a T=4 forward is one big batched conv stack, not four.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BatchNorm, ConvBN, DownSampling, MSConvBlock, MSMLP, RepConv, SepConv,
    Spike, fold_t, unfold_t,
)


class SpikeAttention(nn.Module):
    """Spike-driven linear attention.

    ``qkv_proj='repconv'`` reproduces SDTv2's MS_Attention_RepConv_qkv_id
    (sdtv2.py:258-344); ``qkv_proj='conv1x1'`` with ``lamda_ratio=4`` and
    ``scale_mult=2`` reproduces SDTv3's MS_Attention_linear
    (sdtv3.py:229-276).
    Input/output: [T, B, H, W, C].
    """

    dim: int
    num_heads: int = 8
    qkv_proj: str = "repconv"
    lamda_ratio: int = 1
    scale_mult: float = 1.0
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, b, h, w, c = x.shape
        n = h * w
        cv = self.dim * self.lamda_ratio
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5 * self.scale_mult

        xf, _ = fold_t(x)
        xf = Spike(self.spike)(xf)

        def proj(feats, name):
            if self.qkv_proj == "repconv":
                y = RepConv(feats, dtype=self.dtype, name=f"{name}_rep",
                            spike_input=self.spike)(xf, train)
                y = BatchNorm(use_running_average=not train,
                              name=f"{name}_bn")(y)
            else:
                y = ConvBN(feats, (1, 1), dtype=self.dtype,
                           name=f"{name}_conv",
                           spike_input=self.spike)(xf, train)
            return y

        q = Spike(self.spike)(proj(self.dim, "q"))
        k = Spike(self.spike)(proj(self.dim, "k"))
        v = Spike(self.spike)(proj(cv, "v"))

        def heads(y, feats):
            # [(T*B), H, W, F] -> [T*B, heads, N, F/heads]
            return y.reshape(t * b, n, self.num_heads,
                             feats // self.num_heads).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q, self.dim), heads(k, self.dim), heads(v, cv)
        kv = jnp.einsum("bhnc,bhnd->bhcd", kh, vh,
                        preferred_element_type=jnp.float32)
        out = jnp.einsum("bhnc,bhcd->bhnd", qh, kv.astype(qh.dtype),
                         preferred_element_type=jnp.float32)
        out = (out * scale).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(t * b, h, w, cv)

        out = Spike(self.spike)(out)
        if self.qkv_proj == "repconv":
            out = RepConv(self.dim, dtype=self.dtype, name="proj_rep",
                          spike_input=self.spike)(out, train)
            out = BatchNorm(use_running_average=not train, name="proj_bn")(out)
        else:
            out = ConvBN(self.dim, (1, 1), dtype=self.dtype,
                         name="proj_conv", spike_input=self.spike)(out, train)
        return unfold_t(out, t)


class CSWinSpikeAttention(nn.Module):
    """sdtv3MAE's striped spiking attention (``MS_Attention_linear_cswin``
    + ``LePEAttention``, sdtv3MAE.py:257-436): conv1x1 q/k, v widened by
    ``lamda_ratio``; channels split into two branches attending within
    horizontal / vertical stripes (``split_num=2``) — or one global branch
    when ``last_stage`` — with the softmax-free ``(q k^T) v * (scale*2)``
    form.  Input/output: [T, B, H, W, C]."""

    dim: int
    num_heads: int = 8
    lamda_ratio: int = 4
    split_num: int = 2
    last_stage: bool = False
    spike: str = "multispike8"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, b, h, w, c = x.shape
        cv = self.dim * self.lamda_ratio
        scale = (self.dim // self.num_heads) ** -0.5

        xf, _ = fold_t(x)
        xf = Spike(self.spike)(xf)
        q = Spike(self.spike)(ConvBN(self.dim, (1, 1), dtype=self.dtype,
                                     name="q_conv",
                                     spike_input=self.spike)(xf, train))
        k = Spike(self.spike)(ConvBN(self.dim, (1, 1), dtype=self.dtype,
                                     name="k_conv",
                                     spike_input=self.spike)(xf, train))
        v = Spike(self.spike)(ConvBN(cv, (1, 1), dtype=self.dtype,
                                     name="v_conv",
                                     spike_input=self.spike)(xf, train))

        def stripe_attn(qb, kb, vb, h_num, w_num, heads):
            # [(TB), H, W, Cb] -> stripes of (H/h_num, W/w_num) tokens
            tb, hh, ww, cb = qb.shape
            cvb = vb.shape[-1]
            assert hh % h_num == 0 and ww % w_num == 0, (hh, ww)
            hs, ws = hh // h_num, ww // w_num
            n = hs * ws

            def part(y, ch):
                y = y.reshape(tb, h_num, hs, w_num, ws, ch)
                y = y.transpose(0, 1, 3, 2, 4, 5)
                return y.reshape(tb * h_num * w_num, n, heads,
                                 ch // heads).transpose(0, 2, 1, 3)

            qh = part(qb, cb)
            kh = part(kb, cb)
            vh = part(vb, cvb)
            kv = jnp.einsum("snc,snd->scd", kh.reshape(-1, n, cb // heads),
                            vh.reshape(-1, n, cvb // heads),
                            preferred_element_type=jnp.float32)
            out = jnp.einsum(
                "snc,scd->snd", qh.reshape(-1, n, cb // heads),
                kv.astype(qh.dtype),
                preferred_element_type=jnp.float32) * (scale * 2)
            out = out.astype(qb.dtype).reshape(
                tb * h_num * w_num, heads, n, cvb // heads)
            out = out.transpose(0, 2, 1, 3).reshape(
                tb, h_num, w_num, hs, ws, cvb)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(tb, hh, ww, cvb)
            return out

        if self.last_stage:
            out = stripe_attn(q, k, v, 1, 1, self.num_heads)
        else:
            half, vhalf = c // 2, cv // 2
            bh = self.num_heads // 2
            o1 = stripe_attn(q[..., :half], k[..., :half], v[..., :vhalf],
                             1, self.split_num, bh)
            o2 = stripe_attn(q[..., half:], k[..., half:], v[..., vhalf:],
                             self.split_num, 1, bh)
            out = jnp.concatenate([o1, o2], axis=-1)

        out = Spike(self.spike)(out)
        out = ConvBN(self.dim, (1, 1), dtype=self.dtype,
                     name="proj_conv")(out, train)
        return unfold_t(out, t)


class MSBlockCSWin(nn.Module):
    """sdtv3MAE's ``MS_Block_cswin`` (sdtv3MAE.py:439-485): layer-scaled
    (init 1e-6) residuals over SepConv_Spike, CSWin attention, and MLP."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    last_stage: bool = False
    layer_scale: float = 1e-6
    spike: str = "multispike8"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def gamma(name):
            return self.param(name, nn.initializers.constant(
                self.layer_scale), (self.dim,))

        x = x + gamma("layer_scale1") * SepConv(
            self.dim, kernel_size=3, padding=1, dw_bn=True, num_spikes=3,
            spike=self.spike, dtype=self.dtype)(x, train)
        x = x + gamma("layer_scale2") * CSWinSpikeAttention(
            self.dim, self.num_heads, last_stage=self.last_stage,
            spike=self.spike, dtype=self.dtype)(x, train)
        x = x + gamma("layer_scale3") * MSMLP(
            self.dim * self.mlp_ratio, spike=self.spike,
            dtype=self.dtype)(x, train)
        return x


class MSBlock(nn.Module):
    """Transformer-ish block: (optional SepConv residual) + attn + MLP
    residuals (sdtv2.py:347-383 MS_Block; sdtv3.py:318-360
    MS_Block_Spike_SepConv when ``with_sepconv=True``)."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    with_sepconv: bool = False
    qkv_proj: str = "repconv"
    lamda_ratio: int = 1
    scale_mult: float = 1.0
    spike: str = "qspike"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.with_sepconv:
            x = x + SepConv(self.dim, kernel_size=3, padding=1, dw_bn=True,
                            num_spikes=3, spike=self.spike,
                            dtype=self.dtype)(x, train)
        x = x + SpikeAttention(
            self.dim, self.num_heads, qkv_proj=self.qkv_proj,
            lamda_ratio=self.lamda_ratio, scale_mult=self.scale_mult,
            spike=self.spike, dtype=self.dtype)(x, train)
        x = x + MSMLP(self.dim * self.mlp_ratio, spike=self.spike,
                      dtype=self.dtype)(x, train)
        return x


class SpikingMetaFormer(nn.Module):
    """4-stage spiking MetaFormer pyramid backbone.

    ``variant='sdtv2'``: Q_IFNode (D=8) spikes, RepConv qkv, plain SepConv
    conv-blocks — Spiking_vit_MetaFormer (sdtv2.py:424-655).
    ``variant='sdtv3'``: Multispike_norm (D=4) spikes, conv1x1 qkv with
    lamda_ratio=4 and doubled scale, SepConv_Spike conv-blocks, and an extra
    SepConv residual in attention blocks — Spiking_vit_MetaFormerv2
    (sdtv3.py:401-616).
    ``variant='sdtv3mae'``: the MAE-pretrain flavor Spiking_vit_MetaFormerv3
    (sdtv3MAE.py:526-750): round-half-up D=8 spikes, CSWin striped attention
    with layer-scaled (1e-6) blocks, NO stage-4 downsample (both deep stages
    at embed_dim[2], /16), outputs averaged over T (returned as T=1).
    """

    embed_dim: Sequence[int] = (64, 128, 256, 360)
    num_heads: int = 8
    mlp_ratio: int = 4
    in_channels: int = 3
    T: int = 1
    variant: str = "sdtv2"
    depths_stage3: int = 6
    depths_stage4: int = 2
    norm_eval: bool = False
    remat: bool = False
    collapse_t: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False):
        """images: [B, H, W, 3] -> list of 4 pyramid levels [T,B,h,w,c]."""
        # norm_eval: the reference trains with every backbone BN in eval mode
        # (sdtv2.py:571-575 `m.eval()` in _init_weights; config norm_eval=
        # True) — running statistics frozen, affine params still trained.
        # `train` only gates BN here, so clearing it is exactly that.
        train = train and not self.norm_eval
        # Optional rematerialization (jax.checkpoint) per block: trades
        # recompute for activation memory during training (the AvoidCUDAOOM
        # role of mmdet/utils/memory.py, done the XLA way).
        Conv = (nn.remat(MSConvBlock, static_argnums=(2,))
                if self.remat else MSConvBlock)
        Block = (nn.remat(MSBlock, static_argnums=(2,))
                 if self.remat else MSBlock)
        mae = self.variant == "sdtv3mae"
        v3 = self.variant == "sdtv3" or mae
        spike = ("multispike8" if mae
                 else "multispike_norm" if v3 else "qspike")
        conv_kw = dict(
            mlp_ratio=self.mlp_ratio,
            sepconv_dw_bn=v3, sepconv_num_spikes=3 if v3 else 2,
            spike=spike, dtype=self.dtype)
        block_kw = dict(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            with_sepconv=v3,
            qkv_proj="conv1x1" if v3 else "repconv",
            lamda_ratio=4 if v3 else 1,
            scale_mult=2.0 if v3 else 1.0,
            spike=spike, dtype=self.dtype)

        e = self.embed_dim
        # Timestep collapse: every spike family used by these variants
        # (qspike / multispike_norm / multispike8) is a stateless,
        # deterministic elementwise quantizer — there is no membrane state
        # carried across time steps (the reference's Qtrick architecture
        # replaces Q_IFNode with exactly these stateless quant functions,
        # mmseg/models/utils/Qtrick.py:8-53).  The input is the SAME image
        # broadcast to every step, and every downstream op folds T into the
        # batch, so all T time slices are provably identical and the head's
        # mean-over-T is the single-step value.  When ``collapse_t`` is on,
        # compute one step instead of T identical ones (exactness asserted
        # by tests/test_collapse_t.py).  Parameter shapes never contain T,
        # so checkpoints are unaffected.
        t_eff = 1 if self.collapse_t else self.T
        x = jnp.broadcast_to(images[None], (t_eff,) + images.shape)
        x = DownSampling(e[0] // 2, kernel=7, stride=2, padding=3,
                         first_layer=True, spike=spike, dtype=self.dtype,
                         name="down1_1")(x, train)
        x = Conv(e[0] // 2, name="conv1_1", **conv_kw)(x, train)
        x1 = x
        x = DownSampling(e[0], spike=spike, dtype=self.dtype,
                         name="down1_2")(x, train)
        x = Conv(e[0], name="conv1_2", **conv_kw)(x, train)
        x2 = x
        x = DownSampling(e[1], spike=spike, dtype=self.dtype,
                         name="down2")(x, train)
        x = Conv(e[1], name="conv2_1", **conv_kw)(x, train)
        x = Conv(e[1], name="conv2_2", **conv_kw)(x, train)
        x3 = x
        x = DownSampling(e[2], spike=spike, dtype=self.dtype,
                         name="down3")(x, train)
        if mae:
            CSBlock = (nn.remat(MSBlockCSWin, static_argnums=(2,)) if self.remat
                       else MSBlockCSWin)
            for i in range(self.depths_stage3):
                x = CSBlock(e[2], self.num_heads, self.mlp_ratio,
                            spike=spike, dtype=self.dtype,
                            name=f"block3_{i}")(x, train)
            # no downsample4 in the MAE variant (sdtv3MAE.py:736-743);
            # stage 4 stays at embed_dim[2], global attention
            for i in range(self.depths_stage4):
                x = CSBlock(e[2], self.num_heads, self.mlp_ratio,
                            last_stage=True, spike=spike, dtype=self.dtype,
                            name=f"block4_{i}")(x, train)
            x4 = x
            # MAE outputs are averaged over T (:745) — keep a T=1 axis
            return [y.mean(0, keepdims=True) for y in (x1, x2, x3, x4)]
        for i in range(self.depths_stage3):
            x = Block(e[2], name=f"block3_{i}", **block_kw)(x, train)
        x = DownSampling(e[3], stride=1, spike=spike, dtype=self.dtype,
                         name="down4")(x, train)
        for i in range(self.depths_stage4):
            x = Block(e[3], name=f"block4_{i}", **block_kw)(x, train)
        x4 = x
        return [x1, x2, x3, x4]
