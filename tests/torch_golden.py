"""Independent torch golden of the full Spike2Former reference model.

Written from scratch against the studied reference semantics (NOT copied):
* backbone: mmseg/models/backbones/sdtv2.py:424-655
* head: mmdet/models/dense_heads/maskformer_head.py:68-168, 498-586
* pixel decoder: mmdet/models/layers/pixel_decoder.py:316-472
* DCN encoder layer: mmdet/models/layers/transformer/detr_layers.py:263-339
* attention/FFN blocks: .../mmcv_spike/transformer.py:196-361, 710-831
* DCNv3: .../ops_dcnv3/modules/dcnv3.py:96-233

Module attribute names reproduce the reference state_dict key format so
``golden.state_dict()`` feeds ``engine/convert.py`` directly.  All the
reference's layout quirks are implemented faithfully (MSDA_FFN reshape
shuffle, MS_MLP output reshape, DCNv3 offset/mask channel-first reshape),
since the flax ``compat=True`` mode must match them bit-for-bit.

Eval-mode only: Q_IF spikes collapse to round(clamp(x,0,8))/8 and all BNs
use running stats.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from test_dcnv3 import torch_dcnv3_golden


def q8(x):
    return torch.round(torch.clamp(x, 0, 8)) / 8


def conv_bn(cin, cout, k=1, s=1, p=0, groups=1, bias=True):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, p, groups=groups, bias=bias),
        nn.BatchNorm2d(cout))


def conv1d_bn(cin, cout):
    return nn.Sequential(nn.Conv1d(cin, cout, 1), nn.BatchNorm1d(cout))


# ---------------------------------------------------------------------------
# Backbone (sdtv2)
# ---------------------------------------------------------------------------

class BNAndPadLayer(nn.Module):
    def __init__(self, num_features, pad_pixels=1):
        super().__init__()
        self.bn = nn.BatchNorm2d(num_features)
        self.pad_pixels = pad_pixels

    def forward(self, x):
        y = self.bn(x)
        pad_val = (self.bn.bias.detach()
                   - self.bn.running_mean * self.bn.weight.detach()
                   / torch.sqrt(self.bn.running_var + self.bn.eps)
                   ).view(1, -1, 1, 1)
        p = self.pad_pixels
        y = F.pad(y, [p] * 4)
        y[:, :, :p] = pad_val
        y[:, :, -p:] = pad_val
        y[:, :, :, :p] = pad_val
        y[:, :, :, -p:] = pad_val
        return y


class RepConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.body = nn.Sequential(
            nn.Conv2d(cin, cin, 1, bias=False),
            BNAndPadLayer(cin),
            nn.Sequential(
                nn.Conv2d(cin, cin, 3, padding=0, groups=cin, bias=False),
                nn.Conv2d(cin, cout, 1, bias=False),
                nn.BatchNorm2d(cout)))

    def forward(self, x):
        return self.body(x)


class SepConvV2(nn.Module):
    """sdtv2 SepConv: 2 spikes, no BN after dw (sdtv2.py:135-180)."""

    def __init__(self, dim, e=2, k=7, p=3):
        super().__init__()
        m = dim * e
        self.pwconv1 = nn.Conv2d(dim, m, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m)
        self.dwconv = nn.Conv2d(m, m, k, padding=p, groups=m, bias=False)
        self.pwconv2 = nn.Conv2d(m, dim, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(dim)

    def forward(self, x):  # [T, B, C, H, W]
        t, b, c, h, w = x.shape
        x = q8(x)
        x = self.bn1(self.pwconv1(x.flatten(0, 1))).reshape(t, b, -1, h, w)
        x = q8(x)
        x = self.dwconv(x.flatten(0, 1))
        x = self.bn2(self.pwconv2(x)).reshape(t, b, c, h, w)
        return x


class MSConvBlock(nn.Module):
    def __init__(self, dim, r=4):
        super().__init__()
        self.Conv = SepConvV2(dim)
        self.conv1 = nn.Conv2d(dim, dim * r, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(dim * r)
        self.conv2 = nn.Conv2d(dim * r, dim, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(dim)

    def forward(self, x):
        t, b, c, h, w = x.shape
        x = self.Conv(x) + x
        feat = x
        x = q8(x)
        x = self.bn1(self.conv1(x.flatten(0, 1))).reshape(t, b, -1, h, w)
        x = q8(x)
        x = self.bn2(self.conv2(x.flatten(0, 1))).reshape(t, b, c, h, w)
        return feat + x


class MSMLPBackbone(nn.Module):
    """sdtv2 MS_MLP (channels-first Conv1d over N; :222-255)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1_conv = nn.Conv1d(dim, hidden, 1)
        self.fc1_bn = nn.BatchNorm1d(hidden)
        self.fc2_conv = nn.Conv1d(hidden, dim, 1)
        self.fc2_bn = nn.BatchNorm1d(dim)
        self.hidden = hidden

    def forward(self, x):
        t, b, c, h, w = x.shape
        n = h * w
        x = x.flatten(3)
        x = q8(x)
        x = self.fc1_bn(self.fc1_conv(x.flatten(0, 1))).reshape(
            t, b, self.hidden, n)
        x = q8(x)
        x = self.fc2_bn(self.fc2_conv(x.flatten(0, 1))).reshape(t, b, c, h, w)
        return x


class MSAttention(nn.Module):
    """MS_Attention_RepConv_qkv_id (sdtv2.py:258-344)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.dim = dim
        self.q_conv = nn.Sequential(RepConv(dim, dim), nn.BatchNorm2d(dim))
        self.k_conv = nn.Sequential(RepConv(dim, dim), nn.BatchNorm2d(dim))
        self.v_conv = nn.Sequential(RepConv(dim, dim), nn.BatchNorm2d(dim))
        self.proj_conv = nn.Sequential(RepConv(dim, dim), nn.BatchNorm2d(dim))

    def forward(self, x):
        t, b, c, h, w = x.shape
        n = h * w
        x = q8(x)
        xf = x.flatten(0, 1)
        q = q8(self.q_conv(xf).reshape(t, b, c, h, w))
        k = q8(self.k_conv(xf).reshape(t, b, c, h, w))
        v = q8(self.v_conv(xf).reshape(t, b, c, h, w))

        def heads(y):
            return (y.flatten(3).transpose(-1, -2)
                    .reshape(t, b, n, self.h, c // self.h)
                    .permute(0, 1, 3, 2, 4))

        qh, kh, vh = heads(q), heads(k), heads(v)
        out = kh.transpose(-2, -1) @ vh
        out = (qh @ out) * (c // self.h) ** -0.5
        out = out.transpose(3, 4).reshape(t, b, c, n)
        out = q8(out).reshape(t, b, c, h, w)
        return self.proj_conv(out.flatten(0, 1)).reshape(t, b, c, h, w)


class MSBlock(nn.Module):
    def __init__(self, dim, heads, r=4):
        super().__init__()
        self.attn = MSAttention(dim, heads)
        self.mlp = MSMLPBackbone(dim, dim * r)

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.mlp(x)


class MSDownSampling(nn.Module):
    def __init__(self, cin, cout, k, s, p, first=False):
        super().__init__()
        self.encode_conv = nn.Conv2d(cin, cout, k, s, p)
        self.encode_bn = nn.BatchNorm2d(cout)
        self.first = first

    def forward(self, x):
        t, b = x.shape[:2]
        if not self.first:
            x = q8(x)
        x = self.encode_conv(x.flatten(0, 1))
        _, c, h, w = x.shape
        return self.encode_bn(x).reshape(t, b, c, h, w)


class GoldenBackbone(nn.Module):
    """Spiking_vit_MetaFormer, decode_mode='Qsnn' (sdtv2.py:424-655)."""

    def __init__(self, embed_dim=(64, 128, 256, 360), heads=8, T=1,
                 depths_stage3=6, depths_stage4=2):
        super().__init__()
        e = embed_dim
        self.T = T
        self.downsample1_1 = MSDownSampling(3, e[0] // 2, 7, 2, 3, first=True)
        self.ConvBlock1_1 = nn.ModuleList([MSConvBlock(e[0] // 2)])
        self.downsample1_2 = MSDownSampling(e[0] // 2, e[0], 3, 2, 1)
        self.ConvBlock1_2 = nn.ModuleList([MSConvBlock(e[0])])
        self.downsample2 = MSDownSampling(e[0], e[1], 3, 2, 1)
        self.ConvBlock2_1 = nn.ModuleList([MSConvBlock(e[1])])
        self.ConvBlock2_2 = nn.ModuleList([MSConvBlock(e[1])])
        self.downsample3 = MSDownSampling(e[1], e[2], 3, 2, 1)
        self.block3 = nn.ModuleList(
            [MSBlock(e[2], heads) for _ in range(depths_stage3)])
        self.downsample4 = MSDownSampling(e[2], e[3], 3, 1, 1)
        self.block4 = nn.ModuleList(
            [MSBlock(e[3], heads) for _ in range(depths_stage4)])

    def forward(self, x):  # [B, 3, H, W] normalized
        x = x.unsqueeze(0).repeat(self.T, 1, 1, 1, 1)
        x = self.downsample1_1(x)
        for blk in self.ConvBlock1_1:
            x = blk(x)
        x1 = x
        x = self.downsample1_2(x)
        for blk in self.ConvBlock1_2:
            x = blk(x)
        x2 = x
        x = self.downsample2(x)
        for blk in self.ConvBlock2_1:
            x = blk(x)
        for blk in self.ConvBlock2_2:
            x = blk(x)
        x3 = x
        x = self.downsample3(x)
        for blk in self.block3:
            x = blk(x)
        x = self.downsample4(x)
        for blk in self.block4:
            x = blk(x)
        return [x1, x2, x3, x]


# ---------------------------------------------------------------------------
# Backbone (sdtv3 / E-SpikeFormer + sdtv3MAE), reference key names
# ---------------------------------------------------------------------------

def ms4(x):
    """Multispike_norm: round(clamp(x, 0, 4)) / 4 (Qtrick.py:27-38)."""
    return torch.round(torch.clamp(x, 0, 4)) / 4


def ms8up(x):
    """sdtv3MAE Multispike: floor(clamp(x,0,8)+0.5)/8 (sdtv3MAE.py:136-159)."""
    return torch.floor(torch.clamp(x, 0, 8) + 0.5) / 8


class SepConvSpikeCF(nn.Module):
    """SepConv_Spike in backbone layout [T, B, C, H, W] (sdtv3.py:99-150):
    3 spikes, BN after every conv; key names pwconv1/dwconv/pwconv2.{0,1}."""

    def __init__(self, dim, e=2, k=7, p=3, spike=ms4):
        super().__init__()
        m = dim * e
        self.pwconv1 = conv_bn(dim, m, bias=False)
        self.dwconv = conv_bn(m, m, k, p=p, groups=m, bias=False)
        self.pwconv2 = conv_bn(m, dim, bias=False)
        self.spike = spike

    def forward(self, x):
        t, b, c, h, w = x.shape
        x = self.spike(x)
        x = self.pwconv1(x.flatten(0, 1)).reshape(t, b, -1, h, w)
        x = self.spike(x)
        x = self.dwconv(x.flatten(0, 1)).reshape(t, b, -1, h, w)
        x = self.spike(x)
        return self.pwconv2(x.flatten(0, 1)).reshape(t, b, c, h, w)


class MSConvBlockV3(nn.Module):
    """MS_ConvBlock_spike_SepConv (sdtv3.py:153-189) / the MAE file's
    MS_ConvBlock (sdtv3MAE.py:172-209)."""

    def __init__(self, dim, r=4, spike=ms4):
        super().__init__()
        self.Conv = SepConvSpikeCF(dim, spike=spike)
        self.conv1 = nn.Conv2d(dim, dim * r, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(dim * r)
        self.conv2 = nn.Conv2d(dim * r, dim, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(dim)
        self.spike = spike

    def forward(self, x):
        t, b, c, h, w = x.shape
        x = self.Conv(x) + x
        feat = x
        x = self.spike(x)
        x = self.bn1(self.conv1(x.flatten(0, 1))).reshape(t, b, -1, h, w)
        x = self.spike(x)
        x = self.bn2(self.conv2(x.flatten(0, 1))).reshape(t, b, c, h, w)
        return feat + x


class MSMLPV3(nn.Module):
    """MS_MLP (sdtv3.py:192-225): same key names as sdtv2's, multispike."""

    def __init__(self, dim, hidden, spike=ms4):
        super().__init__()
        self.fc1_conv = nn.Conv1d(dim, hidden, 1)
        self.fc1_bn = nn.BatchNorm1d(hidden)
        self.fc2_conv = nn.Conv1d(hidden, dim, 1)
        self.fc2_bn = nn.BatchNorm1d(dim)
        self.hidden = hidden
        self.spike = spike

    def forward(self, x):
        t, b, c, h, w = x.shape
        n = h * w
        x = x.flatten(3)
        x = self.spike(x)
        x = self.fc1_bn(self.fc1_conv(x.flatten(0, 1))).reshape(
            t, b, self.hidden, n)
        x = self.spike(x)
        return self.fc2_bn(self.fc2_conv(x.flatten(0, 1))).reshape(
            t, b, c, h, w)


class MSAttentionLinear(nn.Module):
    """MS_Attention_linear (sdtv3.py:228-318): conv1x1+BN q/k, v widened by
    lamda_ratio=4, softmax-free ``(q k^T) v * (scale*2)``."""

    def __init__(self, dim, heads, lamda=4, spike=ms4):
        super().__init__()
        self.h, self.dim, self.lamda = heads, dim, lamda
        cv = dim * lamda
        self.q_conv = conv_bn(dim, dim, bias=False)
        self.k_conv = conv_bn(dim, dim, bias=False)
        self.v_conv = conv_bn(dim, cv, bias=False)
        self.proj_conv = conv_bn(cv, dim, bias=False)
        self.spike = spike

    def forward(self, x):
        t, b, c, h, w = x.shape
        n = h * w
        cv = c * self.lamda
        x = self.spike(x)
        xf = x.flatten(0, 1)
        q = self.spike(self.q_conv(xf).reshape(t, b, c, h, w))
        k = self.spike(self.k_conv(xf).reshape(t, b, c, h, w))
        v = self.spike(self.v_conv(xf).reshape(t, b, cv, h, w))

        def heads(y, ch):
            return (y.flatten(3).transpose(-1, -2)
                    .reshape(t, b, n, self.h, ch // self.h)
                    .permute(0, 1, 3, 2, 4))

        qh, kh, vh = heads(q, c), heads(k, c), heads(v, cv)
        out = (qh @ kh.transpose(-2, -1)) @ vh
        out = out * ((c // self.h) ** -0.5 * 2)
        out = out.transpose(3, 4).reshape(t, b, cv, n)
        out = self.spike(out).reshape(t, b, cv, h, w)
        return self.proj_conv(out.flatten(0, 1)).reshape(t, b, c, h, w)


class MSBlockV3(nn.Module):
    """MS_Block_Spike_SepConv (sdtv3.py:321-360): x+conv, x+attn, x+mlp."""

    def __init__(self, dim, heads, r=4):
        super().__init__()
        self.conv = SepConvSpikeCF(dim, k=3, p=1)
        self.attn = MSAttentionLinear(dim, heads)
        self.mlp = MSMLPV3(dim, dim * r)

    def forward(self, x):
        x = x + self.conv(x)
        x = x + self.attn(x)
        return x + self.mlp(x)


class MSAttentionCSWin(nn.Module):
    """MS_Attention_linear_cswin + LePEAttention (sdtv3MAE.py:257-436):
    channels split into H-stripe / W-stripe branches (split_num=2), or one
    global branch when last_stage."""

    def __init__(self, dim, heads, lamda=4, last_stage=False, split=2):
        super().__init__()
        self.dim, self.h, self.lamda = dim, heads, lamda
        self.last, self.split = last_stage, split
        cv = dim * lamda
        self.q_conv = conv_bn(dim, dim, bias=False)
        self.k_conv = conv_bn(dim, dim, bias=False)
        self.v_conv = conv_bn(dim, cv, bias=False)
        self.proj_conv = conv_bn(cv, dim, bias=False)

    def _stripe(self, q, k, v, h_num, w_num, heads):
        t, b, c, hh, ww = q.shape
        cv = v.shape[2]
        hs, ws = hh // h_num, ww // w_num
        n = hs * ws

        def part(y, ch):
            y = y.reshape(t, b, ch, h_num, hs, w_num, ws)
            y = y.permute(0, 1, 3, 5, 4, 6, 2).reshape(t, -1, n, ch)
            return (y.reshape(t, -1, n, heads, ch // heads)
                    .permute(0, 1, 3, 2, 4))

        qh, kh, vh = part(q, c), part(k, c), part(v, cv)
        scale = (self.dim // self.h) ** -0.5
        out = (qh @ kh.transpose(-2, -1)) @ vh * (scale * 2)
        out = out.transpose(2, 3).reshape(t, -1, n, cv)
        out = out.reshape(t, b, h_num, w_num, hs, ws, cv)
        out = out.permute(0, 1, 2, 4, 3, 5, 6).reshape(t, b, hh, ww, cv)
        return out.permute(0, 1, 4, 2, 3)

    def forward(self, x):
        t, b, c, hh, ww = x.shape
        cv = c * self.lamda
        x = ms8up(x)
        xf = x.flatten(0, 1)
        q = ms8up(self.q_conv(xf).reshape(t, b, c, hh, ww))
        k = ms8up(self.k_conv(xf).reshape(t, b, c, hh, ww))
        v = ms8up(self.v_conv(xf).reshape(t, b, cv, hh, ww))
        if self.last:
            out = self._stripe(q, k, v, 1, 1, self.h)
        else:
            o1 = self._stripe(q[:, :, :c // 2], k[:, :, :c // 2],
                              v[:, :, :cv // 2], 1, self.split, self.h // 2)
            o2 = self._stripe(q[:, :, c // 2:], k[:, :, c // 2:],
                              v[:, :, cv // 2:], self.split, 1, self.h // 2)
            out = torch.cat([o1, o2], dim=2)
        out = ms8up(out)
        return self.proj_conv(out.flatten(0, 1)).reshape(t, b, c, hh, ww)


class MSBlockCSWin(nn.Module):
    """MS_Block_cswin (sdtv3MAE.py:439-483): layer-scaled residuals."""

    def __init__(self, dim, heads, r=4, last_stage=False):
        super().__init__()
        self.conv = SepConvSpikeCF(dim, k=3, p=1, spike=ms8up)
        self.attn = MSAttentionCSWin(dim, heads, last_stage=last_stage)
        self.mlp = MSMLPV3(dim, dim * r, spike=ms8up)
        self.layer_scale1 = nn.Parameter(1e-6 * torch.ones(dim))
        self.layer_scale2 = nn.Parameter(1e-6 * torch.ones(dim))
        self.layer_scale3 = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        def g(p):
            return p.view(1, 1, -1, 1, 1)

        x = x + self.conv(x) * g(self.layer_scale1)
        x = x + self.attn(x) * g(self.layer_scale2)
        return x + self.mlp(x) * g(self.layer_scale3)


class GoldenBackboneV3(nn.Module):
    """Spiking_vit_MetaFormerv2 (sdtv3.py:401-616) or, with ``mae=True``,
    Spiking_vit_MetaFormerv3 (sdtv3MAE.py:526-750: no downsample4, both deep
    stages at embed_dim[2], CSWin blocks, outputs averaged over T)."""

    def __init__(self, embed_dim=(64, 128, 256, 360), heads=8, T=1,
                 depths_stage3=6, depths_stage4=2, mae=False):
        super().__init__()
        e = embed_dim
        self.T, self.mae = T, mae
        spike = ms8up if mae else ms4
        self.downsample1_1 = MSDownSamplingV3(3, e[0] // 2, 7, 2, 3,
                                              first=True, spike=spike)
        self.ConvBlock1_1 = nn.ModuleList(
            [MSConvBlockV3(e[0] // 2, spike=spike)])
        self.downsample1_2 = MSDownSamplingV3(e[0] // 2, e[0], 3, 2, 1,
                                              spike=spike)
        self.ConvBlock1_2 = nn.ModuleList([MSConvBlockV3(e[0], spike=spike)])
        self.downsample2 = MSDownSamplingV3(e[0], e[1], 3, 2, 1, spike=spike)
        self.ConvBlock2_1 = nn.ModuleList([MSConvBlockV3(e[1], spike=spike)])
        self.ConvBlock2_2 = nn.ModuleList([MSConvBlockV3(e[1], spike=spike)])
        self.downsample3 = MSDownSamplingV3(e[1], e[2], 3, 2, 1, spike=spike)
        if mae:
            self.block3 = nn.ModuleList(
                [MSBlockCSWin(e[2], heads) for _ in range(depths_stage3)])
            self.block4 = nn.ModuleList(
                [MSBlockCSWin(e[2], heads, last_stage=True)
                 for _ in range(depths_stage4)])
        else:
            self.block3 = nn.ModuleList(
                [MSBlockV3(e[2], heads) for _ in range(depths_stage3)])
            self.downsample4 = MSDownSamplingV3(e[2], e[3], 3, 1, 1,
                                                spike=spike)
            self.block4 = nn.ModuleList(
                [MSBlockV3(e[3], heads) for _ in range(depths_stage4)])

    def forward(self, x):  # [B, 3, H, W] normalized
        x = x.unsqueeze(0).repeat(self.T, 1, 1, 1, 1)
        x = self.downsample1_1(x)
        for blk in self.ConvBlock1_1:
            x = blk(x)
        x1 = x
        x = self.downsample1_2(x)
        for blk in self.ConvBlock1_2:
            x = blk(x)
        x2 = x
        x = self.downsample2(x)
        for blk in self.ConvBlock2_1:
            x = blk(x)
        for blk in self.ConvBlock2_2:
            x = blk(x)
        x3 = x
        x = self.downsample3(x)
        for blk in self.block3:
            x = blk(x)
        if not self.mae:
            x = self.downsample4(x)
        for blk in self.block4:
            x = blk(x)
        if self.mae:  # mean over T, kept as a T=1 axis (sdtv3MAE.py:745)
            return [y.mean(0, keepdim=True) for y in (x1, x2, x3, x)]
        return [x1, x2, x3, x]


class MSDownSamplingV3(nn.Module):
    def __init__(self, cin, cout, k, s, p, first=False, spike=ms4):
        super().__init__()
        self.encode_conv = nn.Conv2d(cin, cout, k, s, p)
        self.encode_bn = nn.BatchNorm2d(cout)
        self.first = first
        self.spike = spike

    def forward(self, x):
        t, b = x.shape[:2]
        if not self.first:
            x = self.spike(x)
        x = self.encode_conv(x.flatten(0, 1))
        _, c, h, w = x.shape
        return self.encode_bn(x).reshape(t, b, c, h, w)


# ---------------------------------------------------------------------------
# Head blocks
# ---------------------------------------------------------------------------

class SepConvSpike(nn.Module):
    """SepConv_Spike: 3 spikes, BN after every conv (SNN_core.py:11-63)."""

    def __init__(self, dim, e=2, k=7, p=3):
        super().__init__()
        m = dim * e
        self.pwconv1 = conv_bn(dim, m, bias=False)
        self.dwconv = conv_bn(m, m, k, p=p, groups=m, bias=False)
        self.pwconv2 = conv_bn(m, dim, bias=False)

    def forward(self, x):  # [T, B, H, W, C] channels-last like the reference
        t, b, h, w, c = x.shape
        x = x.permute(0, 1, 4, 2, 3).contiguous()
        x = q8(x)
        x = self.pwconv1(x.flatten(0, 1)).reshape(t, b, -1, h, w)
        x = q8(x)
        x = self.dwconv(x.flatten(0, 1)).reshape(t, b, -1, h, w)
        x = q8(x)
        x = self.pwconv2(x.flatten(0, 1)).reshape(t, b, c, h, w)
        return x.permute(0, 1, 3, 4, 2).contiguous()


class MSMLPHead(nn.Module):
    """transformer.py MS_MLP — NOTE the quirky channels-first output
    reshape (:831)."""

    def __init__(self, dim, ffn):
        super().__init__()
        self.fc1_conv = nn.Conv1d(dim, ffn, 1)
        self.fc1_bn = nn.BatchNorm1d(ffn)
        self.fc2_conv = nn.Conv1d(ffn, dim, 1)
        self.fc2_bn = nn.BatchNorm1d(dim)
        self.ffn = ffn

    def forward(self, x):  # [T, B, H, W, C]
        t, b, h, w, c = x.shape
        n = h * w
        x = x.permute(0, 1, 4, 2, 3).contiguous().flatten(3)
        x = q8(x)
        x = self.fc1_bn(self.fc1_conv(x.flatten(0, 1))).reshape(
            t, b, self.ffn, n)
        x = q8(x)
        x = self.fc2_bn(self.fc2_conv(x.flatten(0, 1))).reshape(t, b, h, w, c)
        return x


class MSDAFFNGolden(nn.Module):
    """transformer.py MSDA_FFN — NOTE the quirky reshape in AND out
    (:777-781)."""

    def __init__(self, dim, ffn):
        super().__init__()
        self.fc1 = nn.Conv1d(dim, ffn, 1)
        self.bn1 = nn.BatchNorm1d(ffn)
        self.fc2 = nn.Conv1d(ffn, dim, 1)
        self.bn2 = nn.BatchNorm1d(dim)
        self.ffn = ffn

    def forward(self, x):  # [T, B, N, C]
        t, b, n, c = x.shape
        out = q8(x).reshape(t, b, c, n)  # reinterpret, not transpose
        out = self.bn1(self.fc1(out.flatten(0, 1))).reshape(
            t, b, self.ffn, n)
        out = q8(out)
        out = self.bn2(self.fc2(out.flatten(0, 1))).reshape(t, b, n, c)
        return out


class DCNv3Golden(nn.Module):
    """DCNv3_pytorch (modules/dcnv3.py:96-233) with the offset/mask
    channel-first reshape quirk (:213-215)."""

    def __init__(self, channels, group, dw_kernel_size=5, e=2):
        super().__init__()
        k = 3
        self.k, self.g, self.gc = k, group, channels // group
        dwp = (dw_kernel_size - 1) // 2
        self.dw_conv = conv_bn(channels, channels, dw_kernel_size, p=dwp,
                               groups=channels, bias=False)
        self.offset = conv_bn(channels, group * k * k * 2)
        self.mask = conv_bn(channels, group * k * k)
        self.input_proj = SepConvSpike(channels, e=e, k=dw_kernel_size, p=dwp)
        self.output_proj = SepConvSpike(channels, e=e, k=dw_kernel_size,
                                        p=dwp)

    def forward(self, x):  # [T, B, H, W, C]
        t, b, h, w, c = x.shape
        val = self.input_proj(x)

        x1 = x.permute(0, 1, 4, 2, 3).contiguous()
        x1 = q8(x1)
        x1 = self.dw_conv(x1.flatten(0, 1)).reshape(t, b, c, h, w)
        x1 = q8(x1)
        # channels-first conv output reinterpreted channels-last (:213-215)
        offset = self.offset(x1.flatten(0, 1)).reshape(t, b, h, w, -1)
        mask = self.mask(x1.flatten(0, 1)).reshape(t, b, h, w, -1)
        mask = q8(mask)

        out = torch_dcnv3_golden(
            val.flatten(0, 1).numpy(), offset.flatten(0, 1).numpy(),
            mask.flatten(0, 1).numpy(), self.k, self.k, 1, 1, 1, 1, 1, 1,
            self.g, self.gc, 1.0)
        out = torch.from_numpy(out).reshape(t, b, h, w, c)
        return self.output_proj(out)  # dcnv3.py:230


class DCNEncoderLayerGolden(nn.Module):
    """DCNDetrTransformerEncoderLayer (detr_layers.py:263-339)."""

    def __init__(self, dim, ffn, group, dw_kernel_size=5):
        super().__init__()
        self.Conv = SepConvSpike(dim, e=2, k=3, p=1)
        self.dcn = DCNv3Golden(dim, group, dw_kernel_size)
        self.ffn = MSMLPHead(dim, ffn)
        self.gamma1 = nn.Parameter(1e-6 * torch.ones(dim))
        self.gamma2 = nn.Parameter(1e-6 * torch.ones(dim))
        self.gamma3 = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma1 * self.Conv(x)
        x = x + self.gamma2 * self.dcn(x)
        x = x + self.gamma3 * self.ffn(x)
        return x


class SpikeMHAGolden(nn.Module):
    """MultiHeadAttentionBlock / CrossMultiHeadAttentionBlock
    (transformer.py:196-361): softmax-free scores / sqrt(embed_dims)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.h, self.dim = heads, dim
        self.q_conv = conv1d_bn(dim, dim)
        self.k_conv = conv1d_bn(dim, dim)
        self.v_conv = conv1d_bn(dim, dim)
        self.out_conv = conv1d_bn(dim, dim)

    def _proj(self, y, conv):
        t, b, n, c = y.shape
        y = q8(y).permute(0, 1, 3, 2)  # [t,b,c,n]
        y = conv(y.flatten(0, 1))
        return q8(y.permute(0, 2, 1).reshape(t, b, n, c))

    def forward(self, query, key, value):
        t, b, nq, c = query.shape
        nk = key.shape[2]
        q = self._proj(query, self.q_conv)
        k = self._proj(key, self.k_conv)
        v = self._proj(value, self.v_conv)

        def heads(y, n):
            return (y.reshape(t, b, n, self.h, c // self.h)
                    .permute(0, 1, 3, 2, 4))

        qh, kh, vh = heads(q, nq), heads(k, nk), heads(v, nk)
        scores = (qh @ kh.transpose(-2, -1)) / (self.dim ** 0.5)
        out = scores @ vh
        out = out.permute(0, 1, 3, 2, 4).reshape(t, b, nq, c)
        out = q8(out).permute(0, 1, 3, 2)
        out = self.out_conv(out.flatten(0, 1)).permute(0, 2, 1).reshape(
            t, b, nq, c)
        return out


class AttnWrapper(nn.Module):
    """MultiheadAttention wrapper: pos added to query/key (:626-629)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.attn = SpikeMHAGolden(dim, heads)

    def forward(self, query, key, value, query_pos, key_pos):
        return self.attn(query + query_pos, key + key_pos, value)


class DecoderLayerGolden(nn.Module):
    """DetrTransformerDecoderLayer: CA → SA → FFN (detr_layers.py:417-559)."""

    def __init__(self, dim, heads, ffn):
        super().__init__()
        self.self_attn = AttnWrapper(dim, heads)
        self.cross_attn = AttnWrapper(dim, heads)
        self.ffn = MSDAFFNGolden(dim, ffn)

    def forward(self, query, key, value, query_pos, key_pos):
        query = query + self.cross_attn(query, key, value, query_pos, key_pos)
        query = query + self.self_attn(query, query, query, query_pos,
                                       query_pos)
        return query + self.ffn(query)


class MLP3(nn.Module):
    """SNN_core.py MLP (3-layer Q-IF, quant_const=4)."""

    def __init__(self, dim, out_dim, quant_const=4.0):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim, bias=False)
        self.fc2 = nn.Linear(dim, dim, bias=False)
        self.fc_out = nn.Linear(dim, out_dim)
        self.qc = quant_const

    def forward(self, x):
        x = q8(self.fc1(x)) * self.qc
        x = q8(self.fc2(x)) * self.qc
        return self.fc_out(x)


def sine_pe(h, w, num_feats, device=None):
    """SinePositionalEncoding on an all-valid mask (normalize=True)."""
    y = torch.arange(1, h + 1, dtype=torch.float32)
    x = torch.arange(1, w + 1, dtype=torch.float32)
    y = y / (h + 1e-6) * 2 * math.pi
    x = x / (w + 1e-6) * 2 * math.pi
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    pos_x = x[None, :, None] / dim_t  # [1, w, nf] -> broadcast over h
    pos_y = y[:, None, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                        dim=3).reshape(1, w, -1).expand(h, w, num_feats)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                        dim=3).reshape(h, 1, -1).expand(h, w, num_feats)
    return torch.cat((pos_y, pos_x), dim=2)  # [h, w, 2*nf]


class GoldenPixelDecoder(nn.Module):
    """DCNTransformerEncoderPixelDecoder (pixel_decoder.py:316-472).  The
    forward indexes laterals downward (:455-466)."""

    def __init__(self, in_channels, feat, out, layers, ffn, group,
                 dw_kernel_size=5):
        super().__init__()
        n = len(in_channels)
        self.num_inputs = n
        self.lateral_convs = nn.ModuleList(
            [conv_bn(in_channels[i], feat) for i in range(n - 1)])
        self.output_convs = nn.ModuleList(
            [conv_bn(feat, feat, 3, p=1, groups=feat, bias=False)
             for _ in range(n - 1)])
        self.mask_feature = nn.Conv2d(feat, out, 1)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [DCNEncoderLayerGolden(feat, ffn, group, dw_kernel_size)
             for _ in range(layers)])
        self.encoder_in_proj = conv_bn(in_channels[-1], feat)
        self.encoder_out_proj = conv_bn(feat, feat)
        self.feat = feat

    def forward(self, feats):  # list of [T, B, C, H, W]
        t, b, c, h, w = feats[-1].shape
        x = q8(feats[-1])
        x = self.encoder_in_proj(x.flatten(0, 1)).reshape(
            t, b, self.feat, h, w)
        x = x.permute(0, 1, 3, 4, 2)  # channels-last for the encoder
        for layer in self.encoder.layers:
            x = layer(x)
        memory = x.permute(0, 1, 4, 2, 3).contiguous()
        memory = q8(memory)
        y = self.encoder_out_proj(memory.flatten(0, 1)).reshape(
            t, b, self.feat, h, w)

        out = [y]
        for i in range(self.num_inputs - 2, -1, -1):
            lx = q8(feats[i])
            cur = self.lateral_convs[i](lx.flatten(0, 1))
            y = cur + F.interpolate(y.flatten(0, 1), size=cur.shape[-2:],
                                    mode="bilinear", align_corners=False)
            bs2, c2, h2, w2 = y.shape
            y = q8(y.reshape(t, b, c2, h2, w2))
            y = self.output_convs[i](y.flatten(0, 1)).reshape(
                t, b, c2, h2, w2)
            out.append(y)

        ym = q8(y)
        mask_feature = self.mask_feature(ym.flatten(0, 1))
        mask_feature = mask_feature.reshape(t, b, -1, mask_feature.shape[-2],
                                            mask_feature.shape[-1])
        return mask_feature, memory, out[:3]


class GoldenHead(nn.Module):
    """mmdet MaskFormerHead incl. SDME (maskformer_head.py:68-168,
    498-586)."""

    def __init__(self, in_channels, feat, out, num_classes, num_queries,
                 dec_layers, enc_layers, heads=8, group=32,
                 dec_ffn=2048, enc_ffn=1024, num_feats=None):
        super().__init__()
        self.alpha = 4.0
        self.num_feats = num_feats or feat // 2
        self.num_levels = 3
        self.pixel_decoder = GoldenPixelDecoder(
            in_channels, feat, out, enc_layers, enc_ffn, group)
        self.transformer_decoder = nn.Module()
        self.transformer_decoder.layers = nn.ModuleList(
            [DecoderLayerGolden(feat, heads, dec_ffn)
             for _ in range(dec_layers)])
        self.query_embed = nn.Embedding(num_queries, out)
        self.query_feat = nn.Embedding(num_queries, out)
        self.level_embed = nn.Embedding(self.num_levels, feat)
        self.cls_embed = nn.Linear(feat, num_classes + 1)
        self.mask_embed = MLP3(feat, out)
        self.w = nn.Parameter(torch.ones(1))
        self.shortcut_conv = nn.Sequential(
            nn.Conv1d(num_queries, num_queries, 1, bias=False),
            nn.BatchNorm1d(num_queries))
        self.num_queries = num_queries

    def forward(self, feats):
        mask_features, memory, multi_scale = self.pixel_decoder(feats)
        t, b = memory.shape[0], memory.shape[1]
        nq = self.num_queries
        c = memory.shape[2]

        query_feat = self.query_feat.weight[None, None].repeat(t, b, 1, 1)
        query_embed = self.query_embed.weight[None].repeat(b, 1, 1)

        dec_inputs, dec_pes = [], []
        for i in range(self.num_levels):
            lvl = multi_scale[i]  # [T, B, C, h, w]
            hh, ww = lvl.shape[-2:]
            di = lvl.flatten(3).permute(0, 1, 3, 2)  # [T,B,N,C]
            di = di + self.level_embed.weight[i].view(1, 1, 1, -1)
            pe = sine_pe(hh, ww, self.num_feats).reshape(hh * ww, c)
            dec_inputs.append(di)
            dec_pes.append(pe[None].repeat(b, 1, 1))

        out_dec = [query_feat]
        for i, layer in enumerate(self.transformer_decoder.layers):
            lvl = i % self.num_levels
            query_feat = layer(query_feat, dec_inputs[lvl], dec_inputs[lvl],
                               query_embed, dec_pes[lvl])
            out_dec.append(query_feat)

        out = torch.stack(out_dec)  # [L+1, T, B, nq, C]
        ln = out.shape[0]
        out = torch.sigmoid(out)
        out_spiked = self.alpha * q8(out)
        all_cls_scores = self.cls_embed(out_spiked).mean(1)

        mask_embed = self.mask_embed(out_spiked)
        sc = self.alpha * q8(out)
        sc = self.shortcut_conv(sc.reshape(ln * t * b, nq, c)).view(
            ln, t, b, nq, c)
        mask_embed = mask_embed + self.w * sc
        mask_embed = self.alpha * q8(mask_embed)
        all_mask_preds = torch.einsum(
            "ltbqc,tbchw->ltbqhw", mask_embed, mask_features).mean(1)
        return all_cls_scores, all_mask_preds


class GoldenSpike2Former(nn.Module):
    def __init__(self, num_classes=5, embed_dim=(8, 16, 24, 32), heads=4,
                 T=1, feat=16, num_queries=4, dec_layers=2, enc_layers=2,
                 group=4, depths_stage3=1, depths_stage4=1,
                 variant="sdtv2"):
        super().__init__()
        e = embed_dim
        if variant == "sdtv2":
            self.backbone = GoldenBackbone(e, heads, T, depths_stage3,
                                           depths_stage4)
            last_c = e[3]
        else:
            self.backbone = GoldenBackboneV3(
                e, heads, T, depths_stage3, depths_stage4,
                mae=variant == "sdtv3mae")
            last_c = e[2] if variant == "sdtv3mae" else e[3]
        self.decode_head = GoldenHead(
            (e[0] // 2, e[0], e[1], last_c), feat, feat, num_classes,
            num_queries, dec_layers, enc_layers, heads=8, group=group)

    def forward(self, x):  # [B, 3, H, W] normalized
        feats = self.backbone(x)
        return self.decode_head(feats)


def randomize_torch(model, seed=0):
    """Random weights + non-trivial BN running stats, eval mode.

    Bare ``nn.Parameter``s (the encoder layer-scale gammas, the head's
    ``w``, attention ``alpha``s) are randomized to O(1) too — at their
    init values (1e-6 / 1) the residual branches they gate are numerically
    invisible, and a parity test run against such a golden would not
    notice a wrong (or missing) branch at all.
    """
    gen = torch.Generator().manual_seed(seed)
    covered = set()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.3, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0, 0.2, generator=gen)
                covered.update(id(p) for p in m.parameters(recurse=False))
            elif isinstance(m, (nn.Conv1d, nn.Conv2d, nn.Linear,
                                nn.Embedding)):
                # scales chosen so the integer-level q8 spikes (threshold
                # 0.5) keep firing through the SDME tail: at the old
                # (0.3, 0.1) the final mask_embed spike was almost always
                # silent and the mask-logit parity compared zeros
                m.weight.normal_(0, 0.5, generator=gen)
                if getattr(m, "bias", None) is not None:
                    m.bias.normal_(0, 0.5, generator=gen)
                covered.update(id(p) for p in m.parameters(recurse=False))
        for p in model.parameters():
            if id(p) not in covered:  # gammas, w, alphas, ...
                p.normal_(0.5, 0.2, generator=gen)
    model.eval()
    return model
