"""Module-level numerical parity vs independently-written torch equivalents.

SURVEY §7 flags "exact quantized-neuron semantics" and the conv-BN-spike
wiring as silent-mIoU-killers.  Each test here builds the flax module,
mirrors its parameters into a freshly written torch module implementing the
reference semantics, and compares outputs in eval mode (randomized BN
running stats so the statistics path is exercised too).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from spike2former_tpu.models.attention import MSDAFFN, SpikeMHA, TokenConvBN
from spike2former_tpu.models.layers import (
    BNAndPad, ConvBN, MSMLP, RepConv, SepConv)
from spike2former_tpu.models.sdtv2 import SpikeAttention

RNG = np.random.default_rng(0)


def q8(x):
    return torch.round(torch.clamp(x, 0, 8)) / 8


def f2t_conv(k):
    return torch.from_numpy(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())


def rand_bn_stats(shape_c):
    return (RNG.normal(0, 0.3, shape_c).astype(np.float32),
            RNG.uniform(0.5, 2.0, shape_c).astype(np.float32),
            RNG.normal(0, 0.2, shape_c).astype(np.float32),
            RNG.uniform(0.5, 1.5, shape_c).astype(np.float32))


def set_bn(tbn, stats_tree, params_tree):
    """Copy flax BatchNorm vars into a torch BN (eval)."""
    tbn.running_mean.data = torch.from_numpy(np.asarray(stats_tree["mean"]))
    tbn.running_var.data = torch.from_numpy(np.asarray(stats_tree["var"]))
    tbn.weight.data = torch.from_numpy(np.asarray(params_tree["scale"]))
    tbn.bias.data = torch.from_numpy(np.asarray(params_tree["bias"]))
    tbn.eval()


def randomize_variables(variables, key=1):
    """Replace init params/stats with random values (keeps structure)."""
    rng = np.random.default_rng(key)

    def rnd(path, x):
        name = getattr(path[-1], "key", "")
        x = np.asarray(x)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, x.shape), jnp.float32)
        return jnp.asarray(rng.normal(0, 0.3, x.shape), jnp.float32)

    return jax.tree_util.tree_map_with_path(rnd, jax.device_get(variables))


def bn_from(vars_, pfx_params, pfx_stats, torch_bn):
    set_bn(torch_bn, pfx_stats, pfx_params)


def test_bn_and_pad_parity():
    c = 6
    mod = BNAndPad(pad_pixels=1)
    x = RNG.normal(0, 1, (2, 5, 7, c)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p = vars_["params"]
    s = vars_["batch_stats"]
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    bn = nn.BatchNorm2d(c)
    set_bn(bn, s, p)
    y = bn(xt)
    pad_val = (bn.bias - bn.running_mean * bn.weight /
               torch.sqrt(bn.running_var + bn.eps)).view(1, -1, 1, 1)
    y = F.pad(y, [1, 1, 1, 1])
    y[:, :, :1] = pad_val
    y[:, :, -1:] = pad_val
    y[:, :, :, :1] = pad_val
    y[:, :, :, -1:] = pad_val
    want = y.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


class TorchRepConv(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.c1 = nn.Conv2d(c_in, c_in, 1, bias=False)
        self.bn_pad = nn.BatchNorm2d(c_in)
        self.dw = nn.Conv2d(c_in, c_in, 3, padding=0, groups=c_in, bias=False)
        self.pw = nn.Conv2d(c_in, c_out, 1, bias=False)
        self.bn = nn.BatchNorm2d(c_out)

    def forward(self, x):
        y = self.bn_pad(self.c1(x))
        pad_val = (self.bn_pad.bias - self.bn_pad.running_mean *
                   self.bn_pad.weight /
                   torch.sqrt(self.bn_pad.running_var + self.bn_pad.eps)
                   ).view(1, -1, 1, 1)
        y = F.pad(y, [1, 1, 1, 1])
        y[:, :, :1] = pad_val
        y[:, :, -1:] = pad_val
        y[:, :, :, :1] = pad_val
        y[:, :, :, -1:] = pad_val
        return self.bn(self.pw(self.dw(y)))


def test_repconv_parity():
    c_in, c_out = 6, 8
    mod = RepConv(c_out)
    x = RNG.normal(0, 1, (2, 6, 6, c_in)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p, s = vars_["params"], vars_["batch_stats"]
    t = TorchRepConv(c_in, c_out).eval()
    t.c1.weight.data = f2t_conv(p["Conv_0"]["kernel"])
    set_bn(t.bn_pad, s["BNAndPad_0"], p["BNAndPad_0"])
    t.dw.weight.data = f2t_conv(p["Conv_1"]["kernel"])
    t.pw.weight.data = f2t_conv(p["Conv_2"]["kernel"])
    set_bn(t.bn, s["BatchNorm_0"]["BatchNorm_0"],
           p["BatchNorm_0"]["BatchNorm_0"])
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=3e-5, rtol=1e-4)


class TorchSepConv(nn.Module):
    """sdtv2 SepConv: spike→pw→BN→spike→dw(7x7)→pw→BN (no BN after dw)."""

    def __init__(self, dim, e=2, k=7, p=3):
        super().__init__()
        m = dim * e
        self.pw1 = nn.Conv2d(dim, m, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m)
        self.dw = nn.Conv2d(m, m, k, padding=p, groups=m, bias=False)
        self.pw2 = nn.Conv2d(m, dim, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(dim)

    def forward(self, x):
        x = q8(x)
        x = self.bn1(self.pw1(x))
        x = q8(x)
        x = self.dw(x)
        return self.bn2(self.pw2(x))


def test_sepconv_parity():
    dim = 8
    mod = SepConv(dim)  # 2 spikes, no dw BN
    x = RNG.normal(0, 2, (2, 1, 9, 9, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p, s = vars_["params"], vars_["batch_stats"]
    t = TorchSepConv(dim).eval()
    t.pw1.weight.data = f2t_conv(p["ConvBN_0"]["Conv_0"]["kernel"])
    set_bn(t.bn1, s["ConvBN_0"]["BatchNorm_0"]["BatchNorm_0"],
           p["ConvBN_0"]["BatchNorm_0"]["BatchNorm_0"])
    t.dw.weight.data = f2t_conv(p["Conv_0"]["kernel"])
    t.pw2.weight.data = f2t_conv(p["ConvBN_1"]["Conv_0"]["kernel"])
    set_bn(t.bn2, s["ConvBN_1"]["BatchNorm_0"]["BatchNorm_0"],
           p["ConvBN_1"]["BatchNorm_0"]["BatchNorm_0"])
    xt = torch.from_numpy(
        x.reshape(2, 9, 9, dim).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = t(xt).numpy().transpose(0, 2, 3, 1).reshape(2, 1, 9, 9, dim)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


class TorchSpikeAttention(nn.Module):
    """sdtv2 MS_Attention_RepConv_qkv_id with conv1x1 stand-ins replaced by
    full RepConv — weights copied from the flax module."""

    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.dim = dim
        self.q = TorchRepConv(dim, dim)
        self.k = TorchRepConv(dim, dim)
        self.v = TorchRepConv(dim, dim)
        self.qbn = nn.BatchNorm2d(dim)
        self.kbn = nn.BatchNorm2d(dim)
        self.vbn = nn.BatchNorm2d(dim)
        self.proj = TorchRepConv(dim, dim)
        self.projbn = nn.BatchNorm2d(dim)

    def forward(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        xs = q8(x)
        qq = q8(self.qbn(self.q(xs)))
        kk = q8(self.kbn(self.k(xs)))
        vv = q8(self.vbn(self.v(xs)))

        def heads(y):
            return (y.flatten(2).transpose(1, 2)
                    .reshape(b, n, self.h, c // self.h)
                    .permute(0, 2, 1, 3))

        qh, kh, vh = heads(qq), heads(kk), heads(vv)
        out = kh.transpose(-2, -1) @ vh
        out = (qh @ out) * (c // self.h) ** -0.5
        out = out.transpose(2, 3).reshape(b, c, n)
        out = q8(out).reshape(b, c, hh, ww)
        return self.projbn(self.proj(out))


def _load_repconv(trc, p, s):
    trc.c1.weight.data = f2t_conv(p["Conv_0"]["kernel"])
    set_bn(trc.bn_pad, s["BNAndPad_0"], p["BNAndPad_0"])
    trc.dw.weight.data = f2t_conv(p["Conv_1"]["kernel"])
    trc.pw.weight.data = f2t_conv(p["Conv_2"]["kernel"])
    set_bn(trc.bn, s["BatchNorm_0"]["BatchNorm_0"],
           p["BatchNorm_0"]["BatchNorm_0"])


def test_spike_attention_parity():
    dim, heads = 16, 4
    mod = SpikeAttention(dim, heads)
    x = RNG.normal(0, 2, (1, 2, 6, 6, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p, s = vars_["params"], vars_["batch_stats"]
    t = TorchSpikeAttention(dim, heads).eval()
    for name, trc, tbn in [("q", t.q, t.qbn), ("k", t.k, t.kbn),
                           ("v", t.v, t.vbn)]:
        _load_repconv(trc, p[f"{name}_rep"], s[f"{name}_rep"])
        set_bn(tbn, s[f"{name}_bn"]["BatchNorm_0"],
               p[f"{name}_bn"]["BatchNorm_0"])
    _load_repconv(t.proj, p["proj_rep"], s["proj_rep"])
    set_bn(t.projbn, s["proj_bn"]["BatchNorm_0"], p["proj_bn"]["BatchNorm_0"])

    xt = torch.from_numpy(x.reshape(2, 6, 6, dim).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = t(xt).numpy().transpose(0, 2, 3, 1).reshape(1, 2, 6, 6, dim)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def q4(x):
    """Multispike_norm: round(clamp(x, 0, 4)) / 4 (mmseg Qtrick.py:27-38)."""
    return torch.round(torch.clamp(x, 0, 4)) / 4


class TorchSepConvSpike(nn.Module):
    """SDTv3 SepConv_Spike: 3 multispikes, BN after every conv
    (sdtv3.py:99-148)."""

    def __init__(self, dim, e=2, k=3, p=1):
        super().__init__()
        m = dim * e
        self.pw1 = nn.Conv2d(dim, m, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m)
        self.dw = nn.Conv2d(m, m, k, padding=p, groups=m, bias=False)
        self.bnd = nn.BatchNorm2d(m)
        self.pw2 = nn.Conv2d(m, dim, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(dim)

    def forward(self, x):
        x = self.bn1(self.pw1(q4(x)))
        x = self.bnd(self.dw(q4(x)))
        return self.bn2(self.pw2(q4(x)))


def _load_sepconv_spike(t, p, s):
    t.pw1.weight.data = f2t_conv(p["ConvBN_0"]["Conv_0"]["kernel"])
    set_bn(t.bn1, s["ConvBN_0"]["BatchNorm_0"]["BatchNorm_0"],
           p["ConvBN_0"]["BatchNorm_0"]["BatchNorm_0"])
    t.dw.weight.data = f2t_conv(p["Conv_0"]["kernel"])
    set_bn(t.bnd, s["BatchNorm_0"]["BatchNorm_0"],
           p["BatchNorm_0"]["BatchNorm_0"])
    t.pw2.weight.data = f2t_conv(p["ConvBN_1"]["Conv_0"]["kernel"])
    set_bn(t.bn2, s["ConvBN_1"]["BatchNorm_0"]["BatchNorm_0"],
           p["ConvBN_1"]["BatchNorm_0"]["BatchNorm_0"])


def test_sdtv3_sepconv_spike_parity():
    dim = 8
    mod = SepConv(dim, kernel_size=3, padding=1, dw_bn=True, num_spikes=3,
                  spike="multispike_norm")
    x = RNG.normal(0, 2, (2, 1, 9, 9, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    t = TorchSepConvSpike(dim).eval()
    _load_sepconv_spike(t, vars_["params"], vars_["batch_stats"])
    xt = torch.from_numpy(x.reshape(2, 9, 9, dim).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = t(xt).numpy().transpose(0, 2, 3, 1).reshape(2, 1, 9, 9, dim)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


class TorchV3Attention(nn.Module):
    """SDTv3 MS_Attention_linear (sdtv3.py:229-313): conv1x1 q/k, v widened
    by lamda_ratio=4, `(q k^T) v * (scale*2)` with N x N association."""

    def __init__(self, dim, heads, lamda=4):
        super().__init__()
        self.h, self.dim, self.lamda = heads, dim, lamda
        cv = dim * lamda
        self.q = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                               nn.BatchNorm2d(dim))
        self.k = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                               nn.BatchNorm2d(dim))
        self.v = nn.Sequential(nn.Conv2d(dim, cv, 1, bias=False),
                               nn.BatchNorm2d(cv))
        self.proj = nn.Sequential(nn.Conv2d(cv, dim, 1, bias=False),
                                  nn.BatchNorm2d(dim))

    def forward(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        cv = c * self.lamda
        xs = q4(x)
        qq, kk, vv = q4(self.q(xs)), q4(self.k(xs)), q4(self.v(xs))

        def heads(y, ch):
            return (y.flatten(2).transpose(1, 2)
                    .reshape(b, n, self.h, ch // self.h).permute(0, 2, 1, 3))

        qh, kh, vh = heads(qq, c), heads(kk, c), heads(vv, cv)
        out = (qh @ kh.transpose(-2, -1)) @ vh  # the reference association
        out = out * ((c // self.h) ** -0.5 * 2)
        out = out.transpose(2, 3).reshape(b, cv, n)
        out = q4(out).reshape(b, cv, hh, ww)
        return self.proj(out)


def _load_convbn(tseq_conv, tseq_bn, p, s):
    tseq_conv.weight.data = f2t_conv(p["Conv_0"]["kernel"])
    set_bn(tseq_bn, s["BatchNorm_0"]["BatchNorm_0"],
           p["BatchNorm_0"]["BatchNorm_0"])


def test_sdtv3_attention_parity():
    dim, heads = 16, 4
    mod = SpikeAttention(dim, heads, qkv_proj="conv1x1", lamda_ratio=4,
                         scale_mult=2.0, spike="multispike_norm")
    x = RNG.normal(0, 2, (1, 2, 6, 6, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p, s = vars_["params"], vars_["batch_stats"]
    t = TorchV3Attention(dim, heads).eval()
    for name, seq in [("q_conv", t.q), ("k_conv", t.k), ("v_conv", t.v),
                      ("proj_conv", t.proj)]:
        _load_convbn(seq[0], seq[1], p[name], s[name])
    xt = torch.from_numpy(x.reshape(2, 6, 6, dim).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = t(xt).numpy().transpose(0, 2, 3, 1).reshape(1, 2, 6, 6, dim)
    # (q k^T) v here vs q (k^T v) in flax: identical up to float association
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_sdtv3_full_block_parity():
    """MS_Block_Spike_SepConv (sdtv3.py:318-360): x+SepConv_Spike, x+attn,
    x+MS_MLP — the complete v3 transformer block."""
    from spike2former_tpu.models.sdtv2 import MSBlock

    dim, heads = 16, 4
    mod = MSBlock(dim, heads, mlp_ratio=2, with_sepconv=True,
                  qkv_proj="conv1x1", lamda_ratio=4, scale_mult=2.0,
                  spike="multispike_norm")
    x = RNG.normal(0, 2, (1, 2, 6, 6, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p, s = vars_["params"], vars_["batch_stats"]
    sep = TorchSepConvSpike(dim, k=3, p=1).eval()
    _load_sepconv_spike(sep, p["SepConv_0"], s["SepConv_0"])
    attn = TorchV3Attention(dim, heads).eval()
    for name, seq in [("q_conv", attn.q), ("k_conv", attn.k),
                      ("v_conv", attn.v), ("proj_conv", attn.proj)]:
        _load_convbn(seq[0], seq[1], p["SpikeAttention_0"][name],
                     s["SpikeAttention_0"][name])

    # MS_MLP (channels-first Conv1d over N, sdtv3.py MS_MLP)
    mp, ms = p["MSMLP_0"], s["MSMLP_0"]

    def mlp(yt):  # yt [B, C, H, W]
        b, c, hh, ww = yt.shape
        y = q4(yt).flatten(2)  # [B, C, N]
        w1 = torch.from_numpy(
            np.asarray(mp["Conv_0"]["kernel"])[0, 0].T.copy())  # [hid, C]
        y = torch.einsum("oc,bcn->bon", w1, y) \
            + torch.from_numpy(np.asarray(mp["Conv_0"]["bias"]))[None, :, None]
        bp, bs = mp["BatchNorm_0"]["BatchNorm_0"], ms["BatchNorm_0"]["BatchNorm_0"]
        y = ((y - torch.from_numpy(np.asarray(bs["mean"]))[None, :, None])
             / torch.sqrt(torch.from_numpy(np.asarray(bs["var"]))[None, :, None]
                          + 1e-5)
             * torch.from_numpy(np.asarray(bp["scale"]))[None, :, None]
             + torch.from_numpy(np.asarray(bp["bias"]))[None, :, None])
        y = q4(y)
        w2 = torch.from_numpy(
            np.asarray(mp["Conv_1"]["kernel"])[0, 0].T.copy())
        y = torch.einsum("oc,bcn->bon", w2, y) \
            + torch.from_numpy(np.asarray(mp["Conv_1"]["bias"]))[None, :, None]
        bp, bs = mp["BatchNorm_1"]["BatchNorm_0"], ms["BatchNorm_1"]["BatchNorm_0"]
        y = ((y - torch.from_numpy(np.asarray(bs["mean"]))[None, :, None])
             / torch.sqrt(torch.from_numpy(np.asarray(bs["var"]))[None, :, None]
                          + 1e-5)
             * torch.from_numpy(np.asarray(bp["scale"]))[None, :, None]
             + torch.from_numpy(np.asarray(bp["bias"]))[None, :, None])
        return y.reshape(b, c, hh, ww)

    xt = torch.from_numpy(x.reshape(2, 6, 6, dim).transpose(0, 3, 1, 2))
    with torch.no_grad():
        y = xt + sep(xt)
        y = y + attn(y)
        y = y + mlp(y)
    want = y.numpy().transpose(0, 2, 3, 1).reshape(1, 2, 6, 6, dim)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def q8up(x):
    """sdtv3MAE Multispike: floor(clamp(x,0,8)+0.5)/8 (round half UP)."""
    return torch.floor(torch.clamp(x, 0, 8) + 0.5) / 8


def test_multispike8_parity_and_grad():
    from spike2former_tpu.ops.spike import multispike8

    x = np.asarray([-1.0, 0.0, 0.49, 0.5, 3.5, 7.99, 8.0, 9.0], np.float32)
    got = np.asarray(multispike8(jnp.asarray(x)))
    want = q8up(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want)
    # half-up vs banker's: 0.5 -> 1/8 (round() would give 0)
    assert got[3] == 0.125
    g = np.asarray(jax.grad(lambda v: multispike8(v).sum())(jnp.asarray(x)))
    np.testing.assert_array_equal(g, [0, 0, 1, 1, 1, 1, 0, 0])


class TorchCSWinAttention(nn.Module):
    """sdtv3MAE MS_Attention_linear_cswin + LePEAttention
    (sdtv3MAE.py:257-436), independently written."""

    def __init__(self, dim, heads, lamda=4, last_stage=False, split=2):
        super().__init__()
        self.dim, self.h, self.lamda = dim, heads, lamda
        self.last, self.split = last_stage, split
        cv = dim * lamda
        self.q = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                               nn.BatchNorm2d(dim))
        self.k = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                               nn.BatchNorm2d(dim))
        self.v = nn.Sequential(nn.Conv2d(dim, cv, 1, bias=False),
                               nn.BatchNorm2d(cv))
        self.proj = nn.Sequential(nn.Conv2d(cv, dim, 1, bias=False),
                                  nn.BatchNorm2d(dim))

    def _stripe(self, q, k, v, h_num, w_num, heads):
        b, c, hh, ww = q.shape
        cv = v.shape[1]
        hs, ws = hh // h_num, ww // w_num
        n = hs * ws

        def part(y, ch):
            y = y.reshape(b, ch, h_num, hs, w_num, ws)
            y = y.permute(0, 2, 4, 3, 5, 1).reshape(-1, n, ch)
            return y.reshape(-1, n, heads, ch // heads).permute(0, 2, 1, 3)

        qh, kh, vh = part(q, c), part(k, c), part(v, cv)
        scale = (self.dim // self.h) ** -0.5
        out = (qh @ kh.transpose(-2, -1)) @ vh * (scale * 2)
        out = out.permute(0, 2, 1, 3).reshape(-1, n, cv)
        out = out.reshape(b, h_num, w_num, hs, ws, cv)
        out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cv)
        return out.permute(0, 3, 1, 2)

    def forward(self, x):
        xs = q8up(x)
        q = q8up(self.q(xs))
        k = q8up(self.k(xs))
        v = q8up(self.v(xs))
        c, cv = self.dim, self.dim * self.lamda
        if self.last:
            out = self._stripe(q, k, v, 1, 1, self.h)
        else:
            o1 = self._stripe(q[:, :c // 2], k[:, :c // 2], v[:, :cv // 2],
                              1, self.split, self.h // 2)
            o2 = self._stripe(q[:, c // 2:], k[:, c // 2:], v[:, cv // 2:],
                              self.split, 1, self.h // 2)
            out = torch.cat([o1, o2], dim=1)
        return self.proj(q8up(out))


@pytest.mark.parametrize("last_stage", [False, True])
def test_cswin_attention_parity(last_stage):
    from spike2former_tpu.models.sdtv2 import CSWinSpikeAttention

    dim, heads = 16, 4
    mod = CSWinSpikeAttention(dim, heads, last_stage=last_stage)
    x = RNG.normal(0, 2, (1, 2, 8, 8, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p, s = vars_["params"], vars_["batch_stats"]
    t = TorchCSWinAttention(dim, heads, last_stage=last_stage).eval()
    for name, seq in [("q_conv", t.q), ("k_conv", t.k), ("v_conv", t.v),
                      ("proj_conv", t.proj)]:
        _load_convbn(seq[0], seq[1], p[name], s[name])
    xt = torch.from_numpy(x.reshape(2, 8, 8, dim).transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = t(xt).numpy().transpose(0, 2, 3, 1).reshape(1, 2, 8, 8, dim)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_spike_mha_parity():
    """Softmax-free token attention: q/k/v conv1d+BN, scores/sqrt(C)."""
    dim, heads = 16, 4
    mod = SpikeMHA(dim, heads)
    qx = RNG.normal(0, 2, (1, 2, 5, dim)).astype(np.float32)
    kx = RNG.normal(0, 2, (1, 2, 7, dim)).astype(np.float32)
    vars_ = randomize_variables(
        mod.init(jax.random.PRNGKey(0), qx, kx, kx))
    got = np.asarray(mod.apply(vars_, jnp.asarray(qx), jnp.asarray(kx),
                               jnp.asarray(kx)))

    p, s = vars_["params"], vars_["batch_stats"]

    def tok(y, pfx):
        w = np.asarray(p[pfx]["Conv_0"]["kernel"])[0]  # [in, out]
        b = np.asarray(p[pfx]["Conv_0"]["bias"])
        y = q8(y) @ torch.from_numpy(w) + torch.from_numpy(b)
        bp = p[pfx]["BatchNorm_0"]["BatchNorm_0"]
        bs = s[pfx]["BatchNorm_0"]["BatchNorm_0"]
        mean = torch.from_numpy(np.asarray(bs["mean"]))
        var = torch.from_numpy(np.asarray(bs["var"]))
        sc = torch.from_numpy(np.asarray(bp["scale"]))
        bi = torch.from_numpy(np.asarray(bp["bias"]))
        return (y - mean) / torch.sqrt(var + 1e-5) * sc + bi

    qt = torch.from_numpy(qx[0])
    kt = torch.from_numpy(kx[0])
    qq, kk, vv = q8(tok(qt, "q")), q8(tok(kt, "k")), q8(tok(kt, "v"))

    def to_heads(y, n):
        return y.reshape(2, n, heads, dim // heads).permute(0, 2, 1, 3)

    qh, kh, vh = to_heads(qq, 5), to_heads(kk, 7), to_heads(vv, 7)
    scores = (qh @ kh.transpose(-2, -1)) / dim ** 0.5
    out = scores @ vh
    out = out.permute(0, 2, 1, 3).reshape(2, 5, dim)
    w = np.asarray(p["Conv_0"]["kernel"])[0]
    b = np.asarray(p["Conv_0"]["bias"])
    out = q8(out) @ torch.from_numpy(w) + torch.from_numpy(b)
    bp, bs = p["BatchNorm_0"]["BatchNorm_0"], s["BatchNorm_0"]["BatchNorm_0"]
    out = ((out - torch.from_numpy(np.asarray(bs["mean"])))
           / torch.sqrt(torch.from_numpy(np.asarray(bs["var"])) + 1e-5)
           * torch.from_numpy(np.asarray(bp["scale"]))
           + torch.from_numpy(np.asarray(bp["bias"])))
    np.testing.assert_allclose(got[0], out.numpy(), atol=5e-5, rtol=1e-3)


def _tok_proj(vars_, pfx, y):
    """TokenConvBN golden: q8 -> 1x1 conv -> BN(eval), on torch [B, N, C]."""
    p, s = vars_["params"], vars_["batch_stats"]
    w = np.asarray(p[pfx]["Conv_0"]["kernel"])[0]
    b = np.asarray(p[pfx]["Conv_0"]["bias"])
    y = q8(y) @ torch.from_numpy(w) + torch.from_numpy(b)
    bp = p[pfx]["BatchNorm_0"]["BatchNorm_0"]
    bs = s[pfx]["BatchNorm_0"]["BatchNorm_0"]
    return ((y - torch.from_numpy(np.asarray(bs["mean"])))
            / torch.sqrt(torch.from_numpy(np.asarray(bs["var"])) + 1e-5)
            * torch.from_numpy(np.asarray(bp["scale"]))
            + torch.from_numpy(np.asarray(bp["bias"])))


def _out_proj(vars_, y):
    p, s = vars_["params"], vars_["batch_stats"]
    w = np.asarray(p["Conv_0"]["kernel"])[0]
    b = np.asarray(p["Conv_0"]["bias"])
    y = q8(y) @ torch.from_numpy(w) + torch.from_numpy(b)
    bp = p["BatchNorm_0"]["BatchNorm_0"]
    bs = s["BatchNorm_0"]["BatchNorm_0"]
    return ((y - torch.from_numpy(np.asarray(bs["mean"])))
            / torch.sqrt(torch.from_numpy(np.asarray(bs["var"])) + 1e-5)
            * torch.from_numpy(np.asarray(bp["scale"]))
            + torch.from_numpy(np.asarray(bp["bias"])))


def test_linear_sa_parity():
    """MSMultiHeadAttentionBlock (LinearSA, transformer.py:442-502):
    kernelized attention q @ (k^T v) * head_scale, conv1d+BN projections."""
    from spike2former_tpu.models.attention import LinearSpikeMHA

    dim, heads = 16, 4
    mod = LinearSpikeMHA(dim, heads, mode="SA")
    qx = RNG.normal(0, 2, (1, 2, 5, dim)).astype(np.float32)
    kx = RNG.normal(0, 2, (1, 2, 7, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), qx, kx, kx))
    got = np.asarray(mod.apply(vars_, jnp.asarray(qx), jnp.asarray(kx),
                               jnp.asarray(kx)))

    qt, kt = torch.from_numpy(qx[0]), torch.from_numpy(kx[0])
    qq = q8(_tok_proj(vars_, "q", qt))
    kk = q8(_tok_proj(vars_, "k", kt))
    vv = q8(_tok_proj(vars_, "v", kt))

    def to_heads(y, n):
        return y.reshape(2, n, heads, dim // heads).permute(0, 2, 1, 3)

    qh, kh, vh = to_heads(qq, 5), to_heads(kk, 7), to_heads(vv, 7)
    kv = kh.transpose(-2, -1) @ vh                      # [b, h, ch, ch]
    out = (qh @ kv) * ((dim // heads) ** -0.5)
    out = out.permute(0, 2, 1, 3).reshape(2, 5, dim)
    want = _out_proj(vars_, out).numpy()
    np.testing.assert_allclose(got[0], want, atol=5e-5, rtol=1e-3)


def test_linear_ca_parity():
    """MultiHeadCrossAttentionBlock (LinearCA, transformer.py:364-438):
    RepConv k/v over a spatial key map, (k^T v)/sqrt(C) kernel, channel-
    attention shortcut (pooled conv of the spiked query) scaled by alpha."""
    from spike2former_tpu.models.attention import LinearSpikeMHA

    dim, heads, h, w = 16, 4, 3, 4
    mod = LinearSpikeMHA(dim, heads, mode="CA")
    qx = RNG.normal(0, 2, (1, 2, 5, dim)).astype(np.float32)
    kx = RNG.normal(0, 2, (1, 2, h, w, dim)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), qx, kx, kx))
    got = np.asarray(mod.apply(vars_, jnp.asarray(qx), jnp.asarray(kx),
                               jnp.asarray(kx)))

    p, s = vars_["params"], vars_["batch_stats"]
    qt = torch.from_numpy(qx[0])
    qq = q8(_tok_proj(vars_, "q", qt))

    def rep_golden(pfx, y_sp):
        t = TorchRepConv(dim, dim).eval()
        t.c1.weight.data = f2t_conv(p[pfx]["Conv_0"]["kernel"])
        set_bn(t.bn_pad, s[pfx]["BNAndPad_0"], p[pfx]["BNAndPad_0"])
        t.dw.weight.data = f2t_conv(p[pfx]["Conv_1"]["kernel"])
        t.pw.weight.data = f2t_conv(p[pfx]["Conv_2"]["kernel"])
        set_bn(t.bn, s[pfx]["BatchNorm_0"]["BatchNorm_0"],
               p[pfx]["BatchNorm_0"]["BatchNorm_0"])
        with torch.no_grad():
            y = t(q8(y_sp).permute(0, 3, 1, 2))         # [b, C, h, w]
        # k_spike after the projection, then flatten spatial (:410-417)
        return q8(y).flatten(2).permute(0, 2, 1)        # [b, h*w, C]

    kk = rep_golden("k_rep", torch.from_numpy(kx[0]))
    vv = rep_golden("v_rep", torch.from_numpy(kx[0]))

    def to_heads(y, n):
        return y.reshape(2, n, heads, dim // heads).permute(0, 2, 1, 3)

    qh, kh, vh = to_heads(qq, 5), to_heads(kk, h * w), to_heads(vv, h * w)
    kv = (kh.transpose(-2, -1) @ vh) / (dim ** 0.5)
    out = qh @ kv
    out = out.permute(0, 2, 1, 3).reshape(2, 5, dim)

    # channel-attention shortcut (:393-395,432-434)
    wc = torch.from_numpy(np.asarray(p["channel_conv"]["kernel"])[0])
    tgt = (q8(qt) @ wc).mean(dim=1, keepdim=True)       # [b, 1, C]
    alpha = torch.from_numpy(np.asarray(p["alpha"]))
    out = out * alpha + tgt

    want = _out_proj(vars_, out).numpy()
    np.testing.assert_allclose(got[0], want, atol=5e-5, rtol=1e-3)


def test_spike_multihead_attention_dispatch():
    """MultiheadAttention wrapper (transformer.py:505-638): pos added to
    query/key, block chosen by attn_type."""
    from spike2former_tpu.models.attention import SpikeMultiheadAttention

    dim = 16
    q = jnp.asarray(RNG.normal(0, 1, (1, 2, 5, dim)), jnp.float32)
    k_tok = jnp.asarray(RNG.normal(0, 1, (1, 2, 7, dim)), jnp.float32)
    k_sp = jnp.asarray(RNG.normal(0, 1, (1, 2, 3, 4, dim)), jnp.float32)
    pos = jnp.asarray(RNG.normal(0, 1, (2, 5, dim)), jnp.float32)
    for attn_type, key in (("SA", k_tok), ("CA", k_tok),
                           ("LinearSA", k_tok), ("LinearCA", k_sp)):
        mod = SpikeMultiheadAttention(dim, 4, attn_type=attn_type)
        vars_ = mod.init(jax.random.PRNGKey(0), q, key, key, pos)
        out = mod.apply(vars_, q, key, key, pos)
        assert out.shape == (1, 2, 5, dim), attn_type
        assert np.isfinite(np.asarray(out)).all(), attn_type


class TorchSnnBasicBlock(nn.Module):
    """BasicBlock_104/18 (MSResnet.py:144-181,:240-280): spike->3x3(s)->BN
    ->spike->3x3->BN(0-init) + (avg-pooled or strided) conv shortcut."""

    def __init__(self, cin, cout, stride, avgpool):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.avgpool = avgpool
        self.stride = stride
        self.need_sc = stride != 1 or cin != cout
        if self.need_sc:
            sc_stride = 1 if (avgpool and stride != 1) else stride
            self.sc_conv = nn.Conv2d(cin, cout, 1, sc_stride, bias=False)
            self.sc_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        y = self.bn1(self.conv1(q8(x)))
        y = self.bn2(self.conv2(q8(y)))
        sc = x
        if self.need_sc:
            if self.avgpool and self.stride != 1:
                sc = F.avg_pool2d(sc, self.stride, self.stride)
            sc = self.sc_bn(self.sc_conv(sc))
        return y + sc


@pytest.mark.parametrize("avgpool", [True, False])
def test_msresnet_basic_block_parity(avgpool):
    from spike2former_tpu.models.msresnet import SnnBasicBlock

    cin, cout, stride = 8, 12, 2
    mod = SnnBasicBlock(cout, stride=stride, avgpool_shortcut=avgpool)
    x = RNG.normal(0, 2, (2, 8, 8, cin)).astype(np.float32)
    vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    p, s = vars_["params"], vars_["batch_stats"]
    t = TorchSnnBasicBlock(cin, cout, stride, avgpool).eval()
    t.conv1.weight.data = f2t_conv(p["conv_bn_1"]["Conv_0"]["kernel"])
    set_bn(t.bn1, s["conv_bn_1"]["BatchNorm_0"],
           p["conv_bn_1"]["BatchNorm_0"])
    t.conv2.weight.data = f2t_conv(p["conv_bn_2"]["Conv_0"]["kernel"])
    set_bn(t.bn2, s["conv_bn_2"]["BatchNorm_0"],
           p["conv_bn_2"]["BatchNorm_0"])
    t.sc_conv.weight.data = f2t_conv(p["shortcut"]["Conv_0"]["kernel"])
    set_bn(t.sc_bn, s["shortcut"]["BatchNorm_0"],
           p["shortcut"]["BatchNorm_0"])
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=3e-5, rtol=1e-4)


def test_msresnet_pyramid_and_classifier():
    from spike2former_tpu.models.msresnet import MSResNet

    for variant in ("msresnet18", "msresnet104"):
        mod = MSResNet(variant=variant, width=8, T=2, num_classes=7)
        x = jnp.asarray(RNG.normal(100, 50, (1, 64, 64, 3)), jnp.float32)
        vars_ = mod.init(jax.random.PRNGKey(0), x, False, True)
        feats = mod.apply(vars_, x)
        assert [f.shape for f in feats] == [
            (2, 1, 16, 16, 8), (2, 1, 8, 8, 16),
            (2, 1, 4, 4, 32), (2, 1, 2, 2, 64)], variant
        logits = mod.apply(vars_, x, False, True)
        assert logits.shape == (1, 7)
        assert np.isfinite(np.asarray(logits)).all()


class TorchPEMCA(nn.Module):
    """PEM_CA golden (transformer.py:102-192), batch-first."""

    def __init__(self, d, heads):
        super().__init__()
        self.h, self.d = heads, d
        self.lr_bn = nn.BatchNorm2d(d)
        self.lr_dw = nn.Conv2d(d, d, 3, padding=1, groups=d)
        self.lr_out = nn.Linear(d, d)
        self.q_ln = nn.LayerNorm(d)
        self.q_lin = nn.Linear(d, d)
        self.proj = nn.Linear(d, d)
        self.final = nn.Linear(d, d)
        self.alpha = nn.Parameter(torch.ones(1, 1, d))

    def forward(self, tgt, memory, mask=None):
        b, hh, ww, c = memory.shape
        m = self.lr_dw(self.lr_bn(memory.permute(0, 3, 1, 2)))
        m = self.lr_out(m.flatten(2).permute(0, 2, 1))      # [B, N, C]
        q = self.q_lin(self.q_ln(tgt))                      # [B, Q, C]
        m = F.normalize(m, dim=-1)
        q = F.normalize(q, dim=-1)

        n, nq, hd = m.shape[1], q.shape[1], c // self.h
        mh = m.view(b, n, self.h, hd).permute(0, 2, 1, 3)
        qh = q.view(b, nq, self.h, hd).permute(0, 2, 1, 3)
        sim = torch.einsum("bhnc,bhqc->bhnq", mh, qh)
        if mask is not None:
            mk = (mask.flatten(2).permute(0, 2, 1).detach() < 0.0).bool()
            mk = mk.unsqueeze(1).expand(-1, self.h, -1, -1).clone()
            mk[torch.all(mk.sum(2) == mk.shape[2], dim=2)] = False
            sim = sim.masked_fill(mk, float("-inf"))
        idx = torch.argmax(sim, dim=2)
        picked = torch.gather(
            mh, 2, idx.unsqueeze(-1).expand(-1, -1, -1, hd))
        picked = picked.permute(0, 2, 1, 3).reshape(b, nq, c)
        out = (F.normalize(self.proj(picked * q), dim=1) * self.alpha
               + picked)
        return self.final(out)


def test_pem_ca_parity():
    from spike2former_tpu.models.attention import PEMCrossAttention

    d, heads, hh, ww, nq = 16, 4, 4, 5, 6
    mod = PEMCrossAttention(d, heads)
    tgt = RNG.normal(0, 1, (2, nq, d)).astype(np.float32)
    mem = RNG.normal(0, 1, (2, hh, ww, d)).astype(np.float32)
    mask = RNG.normal(0, 1, (2, nq, hh, ww)).astype(np.float32)
    mask[0, 0] = -1.0  # one query fully masked (stays masked: other
    # queries in its (b, h) slice are not, so no wipe)
    vars_ = randomize_variables(
        mod.init(jax.random.PRNGKey(0), tgt, mem, mask))
    got = np.asarray(mod.apply(vars_, jnp.asarray(tgt), jnp.asarray(mem),
                               jnp.asarray(mask)))

    p, s = vars_["params"], vars_["batch_stats"]
    t = TorchPEMCA(d, heads).eval()
    fp = p["feature_proj"]
    set_bn(t.lr_bn, s["feature_proj"]["bn"]["BatchNorm_0"],
           fp["bn"]["BatchNorm_0"])
    t.lr_dw.weight.data = f2t_conv(fp["dw"]["kernel"])
    t.lr_dw.bias.data = torch.from_numpy(np.asarray(fp["dw"]["bias"]))

    def set_linear(lin, tree):
        lin.weight.data = torch.from_numpy(
            np.asarray(tree["kernel"]).T.copy())
        lin.bias.data = torch.from_numpy(np.asarray(tree["bias"]))

    set_linear(t.lr_out, fp["out"])
    t.q_ln.weight.data = torch.from_numpy(
        np.asarray(p["query_norm"]["scale"]))
    t.q_ln.bias.data = torch.from_numpy(np.asarray(p["query_norm"]["bias"]))
    set_linear(t.q_lin, p["query_proj"])
    set_linear(t.proj, p["proj"])
    set_linear(t.final, p["final"])
    t.alpha.data = torch.from_numpy(np.asarray(p["alpha"]))

    with torch.no_grad():
        want = t(torch.from_numpy(tgt), torch.from_numpy(mem),
                 torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_cycle_fc_parity():
    """CycleFC (CycleMLP.py:54-131): per-channel staircase shift (zero
    fill) + 1x1 projection — golden computed directly in numpy."""
    from spike2former_tpu.models.cyclemlp import CycleFC

    b, hh, ww, c, cout, k = 2, 5, 7, 6, 4, 3
    x = RNG.normal(0, 1, (b, hh, ww, c)).astype(np.float32)
    for kernel, axis in (((1, k), 2), ((k, 1), 1)):
        mod = CycleFC(cout, kernel)
        vars_ = randomize_variables(mod.init(jax.random.PRNGKey(0), x))
        got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

        start = k // 2
        shifted = np.zeros_like(x)
        n = x.shape[axis]
        for i in range(c):
            s = (i + start) % k - k // 2
            src = np.take(x, np.arange(n) + s, axis=axis, mode="clip")
            # zero out-of-range (deform_conv2d zero padding)
            idx = np.arange(n) + s
            bad = (idx < 0) | (idx >= n)
            sl = [slice(None)] * 4
            sl[axis] = bad
            src = src.copy()
            src[tuple(sl)] = 0.0
            shifted[..., i] = src[..., i]
        wgt = np.asarray(vars_["params"]["Dense_0"]["kernel"])
        bias = np.asarray(vars_["params"]["Dense_0"]["bias"])
        want = shifted @ wgt + bias
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4), kernel


def test_cycle_mlp_block_shapes():
    from spike2former_tpu.models.cyclemlp import CycleBlock, CycleMLP

    x = jnp.asarray(RNG.normal(0, 1, (2, 6, 8, 16)), jnp.float32)
    mod = CycleMLP(16)
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(vars_, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

    blk = CycleBlock(16, skip_lam=2.0)
    vars_ = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(vars_, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_spike_mha_factored_equals_dense():
    """factored=True (right-associated q(k^T v), the TPU train path for
    decoder cross-attn) must match the dense-score path: with no softmax
    and no mask the attention output is linear in the scores, and the
    spike-quantized q/k/v make both summation orders exactly
    representable at these shapes."""
    dim, heads = 32, 4
    qx = RNG.normal(0, 2, (2, 2, 5, dim)).astype(np.float32)
    kx = RNG.normal(0, 2, (2, 2, 37, dim)).astype(np.float32)
    dense = SpikeMHA(dim, heads)
    fact = SpikeMHA(dim, heads, factored=True, factored_min_kv=1)
    vars_ = randomize_variables(
        dense.init(jax.random.PRNGKey(0), qx, kx, kx))
    a = np.asarray(dense.apply(vars_, qx, kx, kx))
    b = np.asarray(fact.apply(vars_, qx, kx, kx))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    # gradients agree too (the backward is the transposed association)
    def loss(mod):
        def f(v):
            out = mod.apply({**vars_, "params": v},
                            jnp.asarray(qx), jnp.asarray(kx),
                            jnp.asarray(kx))
            return jnp.sum(out ** 2)
        return jax.grad(f)(vars_["params"])

    ga, gb = loss(dense), loss(fact)
    ga = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(ga)}
    gb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    assert set(ga) == set(gb)
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)

    # masked attention must fall back to the dense path (linearity breaks)
    mask = RNG.random((2, 2, heads, 5, 37)) > 0.7
    am = np.asarray(dense.apply(vars_, qx, kx, kx, attn_mask=mask))
    bm = np.asarray(fact.apply(vars_, qx, kx, kx, attn_mask=mask))
    np.testing.assert_allclose(am, bm, atol=1e-6, rtol=1e-6)
