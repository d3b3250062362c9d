#!/usr/bin/env python
"""Torch-CPU reference throughput for bench.py's ``vs_baseline``.

The reference implementation (mmseg/mmdet stack) cannot run in this image,
so this script measures a from-scratch torch model with the same
architecture and shapes as the flagship Spike2Former (SDTv2 backbone +
DCN-MaskFormer head, 512x512, T=4, batch 1, fp32 inference on CPU): the
same conv/BN/quant stacks, linear attention, grid_sample-based DCNv3 core,
and decoder einsums.  It is this framework's own architecture expressed in
idiomatic torch — a fair stand-in for "reference images/sec on CPU".
"""
import argparse
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


def q(x):  # inference-only normalized integer spike
    return torch.round(torch.clamp(x, 0, 8)) / 8


class SepConv(nn.Module):
    def __init__(self, dim, k=7, p=3, e=2):
        super().__init__()
        m = dim * e
        self.pw1 = nn.Conv2d(dim, m, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m)
        self.dw = nn.Conv2d(m, m, k, padding=p, groups=m, bias=False)
        self.pw2 = nn.Conv2d(m, dim, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(dim)

    def forward(self, x):
        x = self.bn1(self.pw1(q(x)))
        x = self.dw(q(x))
        return self.bn2(self.pw2(x))


class ConvBlock(nn.Module):
    def __init__(self, dim, r=4):
        super().__init__()
        self.sep = SepConv(dim)
        self.c1 = nn.Conv2d(dim, dim * r, 3, padding=1, bias=False)
        self.b1 = nn.BatchNorm2d(dim * r)
        self.c2 = nn.Conv2d(dim * r, dim, 3, padding=1, bias=False)
        self.b2 = nn.BatchNorm2d(dim)

    def forward(self, x):
        x = x + self.sep(x)
        return x + self.b2(self.c2(q(self.b1(self.c1(q(x))))))


class Attn(nn.Module):
    def __init__(self, dim, heads=8):
        super().__init__()
        self.h = heads
        self.qkv = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                           nn.BatchNorm2d(dim)) for _ in range(3)])
        self.proj = nn.Sequential(nn.Conv2d(dim, dim, 1, bias=False),
                                  nn.BatchNorm2d(dim))

    def forward(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        xs = q(x)
        qk = [q(m(xs)).reshape(b, self.h, c // self.h, n) for m in self.qkv]
        kv = torch.einsum("bhcn,bhdn->bhcd", qk[1], qk[2])
        out = torch.einsum("bhcn,bhcd->bhdn", qk[0], kv) * (c // self.h) ** -0.5
        return self.proj(q(out.reshape(b, c, hh, ww)))


class Block(nn.Module):
    def __init__(self, dim, r=4):
        super().__init__()
        self.attn = Attn(dim)
        self.m1 = nn.Sequential(nn.Conv2d(dim, dim * r, 1), nn.BatchNorm2d(dim * r))
        self.m2 = nn.Sequential(nn.Conv2d(dim * r, dim, 1), nn.BatchNorm2d(dim))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.m2(q(self.m1(q(x))))


class Down(nn.Module):
    def __init__(self, i, o, k=3, s=2, p=1):
        super().__init__()
        self.c = nn.Conv2d(i, o, k, stride=s, padding=p)
        self.b = nn.BatchNorm2d(o)

    def forward(self, x):
        return self.b(self.c(q(x)))


class Backbone(nn.Module):
    def __init__(self, dims=(32, 64, 128, 256, 360)):
        super().__init__()
        d = dims
        self.d1 = nn.Sequential(nn.Conv2d(3, d[0], 7, 2, 3),
                                nn.BatchNorm2d(d[0]))
        self.s1 = ConvBlock(d[0])
        self.d2 = Down(d[0], d[1])
        self.s2 = ConvBlock(d[1])
        self.d3 = Down(d[1], d[2])
        self.s3 = nn.Sequential(ConvBlock(d[2]), ConvBlock(d[2]))
        self.d4 = Down(d[2], d[3])
        self.s4 = nn.Sequential(*[Block(d[3]) for _ in range(6)])
        self.d5 = Down(d[3], d[4], s=1)
        self.s5 = nn.Sequential(*[Block(d[4]) for _ in range(2)])

    def forward(self, x):
        x = self.s1(self.d1(x)); f1 = x
        x = self.s2(self.d2(x)); f2 = x
        x = self.s3(self.d3(x)); f3 = x
        x = self.s5(self.d5(self.s4(self.d4(x)))); f4 = x
        return f1, f2, f3, f4


class DCNLayer(nn.Module):
    def __init__(self, dim=256, g=32, p=9):
        super().__init__()
        self.g, self.p = g, p
        self.inp = SepConv(dim, k=5, p=2)
        self.outp = SepConv(dim, k=5, p=2)
        self.dw = nn.Conv2d(dim, dim, 5, padding=2, groups=dim, bias=False)
        self.off = nn.Conv2d(dim, g * p * 2, 1)
        self.msk = nn.Conv2d(dim, g * p, 1)
        self.ffn = nn.Sequential(nn.Conv2d(dim, 1024, 1), nn.BatchNorm2d(1024),
                                 nn.Conv2d(1024, dim, 1), nn.BatchNorm2d(dim))

    def forward(self, x):
        b, c, h, w = x.shape
        v = self.inp(x)
        y = q(self.dw(q(x)))
        off = self.off(y).reshape(b, self.g, self.p, 2, h, w)
        msk = q(self.msk(y)).reshape(b, self.g, self.p, h, w)
        base_y, base_x = torch.meshgrid(
            torch.linspace(-1, 1, h), torch.linspace(-1, 1, w), indexing="ij")
        vg = v.reshape(b * self.g, c // self.g, h, w)
        acc = 0.0
        for p in range(self.p):
            grid = torch.stack(
                [base_x + off[:, :, p, 0] * 0.01,
                 base_y + off[:, :, p, 1] * 0.01], dim=-1)
            grid = grid.reshape(b * self.g, h, w, 2)
            s = F.grid_sample(vg, grid, mode="bilinear",
                              padding_mode="zeros", align_corners=False)
            acc = acc + s * msk[:, :, p].reshape(b * self.g, 1, h, w)
        out = acc.reshape(b, c, h, w)
        out = self.outp(out)
        return x + out + self.ffn(q(x))


class Head(nn.Module):
    def __init__(self, dims=(32, 64, 128, 360), c=256, nq=100, ncls=150):
        super().__init__()
        self.inproj = nn.Conv2d(dims[3], c, 1)
        self.enc = nn.Sequential(*[DCNLayer(c) for _ in range(6)])
        self.lat = nn.ModuleList([nn.Conv2d(d, c, 1) for d in dims[2::-1]])
        self.outc = nn.ModuleList(
            [nn.Conv2d(c, c, 3, padding=1, groups=c, bias=False)
             for _ in range(3)])
        self.maskf = nn.Conv2d(c, c, 1)
        self.query = nn.Parameter(torch.randn(nq, c))
        self.dec_qkv = nn.ModuleList([nn.Linear(c, 3 * c) for _ in range(6)])
        self.dec_ffn = nn.ModuleList(
            [nn.Sequential(nn.Linear(c, 2048), nn.Linear(2048, c))
             for _ in range(6)])
        self.cls = nn.Linear(c, ncls + 1)
        self.membed = nn.Sequential(nn.Linear(c, c), nn.Linear(c, c),
                                    nn.Linear(c, c))

    def forward(self, feats):
        f1, f2, f3, f4 = feats
        y = self.enc(self.inproj(q(f4)))
        mem = y.flatten(2).transpose(1, 2)  # [b, n, c]
        for lat, oc, f in zip(self.lat, self.outc, (f3, f2, f1)):
            up = F.interpolate(y, size=f.shape[-2:], mode="bilinear",
                               align_corners=False)
            y = oc(q(lat(q(f)) + up))
        maskf = self.maskf(q(y))
        qr = self.query[None].expand(f4.shape[0], -1, -1)
        for qkv, ffn in zip(self.dec_qkv, self.dec_ffn):
            a = qkv(qr)
            qq, kk, vv = a.chunk(3, -1)
            att = torch.einsum("bqc,bnc->bqn", q(qq), q(mem[:, :qq.shape[1]]))
            qr = qr + torch.einsum("bqn,bnc->bqc", att, vv[:, :qq.shape[1]])
            qr = qr + ffn(q(qr))
        cls = self.cls(q(torch.sigmoid(qr)) * 4)
        me = self.membed(q(torch.sigmoid(qr)) * 4)
        masks = torch.einsum("bqc,bchw->bqhw", me, maskf)
        return cls, masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--T", type=int, default=4)
    args = ap.parse_args()
    torch.set_grad_enabled(False)

    bb = Backbone().eval()
    hd = Head().eval()
    x = torch.randn(1, 3, args.size, args.size)

    def fwd():
        # T explicit timesteps folded into batch exactly like the reference
        xt = x.repeat(args.T, 1, 1, 1)
        feats = bb(xt)
        cls, masks = hd(feats)
        # T-mean
        return cls.reshape(args.T, -1, *cls.shape[1:]).mean(0), masks

    fwd()  # warmup
    t0 = time.time()
    for _ in range(args.iters):
        fwd()
    dt = (time.time() - t0) / args.iters
    print(f"torch-cpu fp32 {args.size}x{args.size} T={args.T} batch1: "
          f"{dt*1000:.0f} ms/img = {1/dt:.3f} img/s")


if __name__ == "__main__":
    main()
