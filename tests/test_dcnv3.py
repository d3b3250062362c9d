"""DCNv3 core parity vs an independent torch grid_sample golden."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from spike2former_tpu.ops import dcnv3_core


def torch_dcnv3_golden(x, offset, mask, kh, kw, sh, sw, ph, pw, dh, dw,
                       g, gc, offset_scale):
    """Independent torch implementation of DCNv3 deformable sampling using
    F.grid_sample, written from the op's mathematical definition."""
    x = torch.from_numpy(x)
    offset = torch.from_numpy(offset)
    mask = torch.from_numpy(mask)
    n, h, w, c = x.shape
    xpad = F.pad(x.permute(0, 3, 1, 2), (pw, pw, ph, ph))  # N,C,Hp,Wp
    hp, wp = h + 2 * ph, w + 2 * pw
    ho = (hp - (dh * (kh - 1) + 1)) // sh + 1
    wo = (wp - (dw * (kw - 1) + 1)) // sw + 1
    p = kh * kw

    ref_y = ((dh * (kh - 1)) // 2 + 0.5 + torch.arange(ho) * sh) / hp
    ref_x = ((dw * (kw - 1)) // 2 + 0.5 + torch.arange(wo) * sw) / wp
    gy, gx = torch.meshgrid(ref_y, ref_x, indexing="ij")
    ref = torch.stack([gx, gy], -1).reshape(ho * wo, 2)

    ks_x = -((dw * (kw - 1)) // 2) + torch.arange(kw) * dw
    ks_y = -((dh * (kh - 1)) // 2) + torch.arange(kh) * dh
    mx, my = torch.meshgrid(ks_x.float(), ks_y.float(), indexing="ij")
    grid = torch.stack([mx / wp, my / hp], -1).reshape(p, 2)  # x-major order

    off = offset.reshape(n, ho * wo, g, p, 2)
    norm = torch.tensor([wp, hp], dtype=torch.float32)
    loc = ref[None, :, None, None, :] + grid[None, None, None, :, :] * offset_scale \
        + off * offset_scale / norm
    sample_grid = 2 * loc - 1  # [n, howo, g, p, 2]

    xg = xpad.reshape(n, g, gc, hp, wp).reshape(n * g, gc, hp, wp)
    sg = sample_grid.permute(0, 2, 1, 3, 4).reshape(n * g, ho * wo, p, 2)
    sampled = F.grid_sample(xg, sg, mode="bilinear", padding_mode="zeros",
                            align_corners=False)  # [n*g, gc, howo, p]
    m = mask.reshape(n, ho * wo, g, p).permute(0, 2, 1, 3).reshape(
        n * g, 1, ho * wo, p)
    out = (sampled * m).sum(-1)  # [n*g, gc, howo]
    out = out.reshape(n, g, gc, ho * wo).permute(0, 3, 1, 2).reshape(
        n, ho, wo, g * gc)
    return out.numpy()


def test_dcnv3_matches_torch_grid_sample():
    rng = np.random.default_rng(0)
    n, h, w, g, gc = 2, 7, 9, 4, 8
    c = g * gc
    kh = kw = 3
    p = kh * kw
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    offset = (rng.normal(size=(n, h, w, g * p * 2)) * 2.0).astype(np.float32)
    mask = rng.uniform(0, 1, size=(n, h, w, g * p)).astype(np.float32)

    want = torch_dcnv3_golden(x, offset, mask, kh, kw, 1, 1, 1, 1, 1, 1,
                              g, gc, 1.0)
    got = np.asarray(dcnv3_core(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        kernel_h=kh, kernel_w=kw, stride_h=1, stride_w=1, pad_h=1, pad_w=1,
        dilation_h=1, dilation_w=1, group=g, group_channels=gc,
        offset_scale=1.0))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_dcnv3_zero_offset_center_identity():
    """With zero offsets and a one-hot mask on the center point, the op is
    identity (stride 1, pad 1, 3x3)."""
    rng = np.random.default_rng(1)
    n, h, w, g, gc = 1, 6, 6, 2, 4
    x = rng.normal(size=(n, h, w, g * gc)).astype(np.float32)
    offset = np.zeros((n, h, w, g * 9 * 2), np.float32)
    mask = np.zeros((n, h, w, g * 9), np.float32)
    # center point of a 3x3 grid in x-major order (kx=1, ky=1) -> p = 1*3+1 = 4
    mask.reshape(n, h, w, g, 9)[..., 4] = 1.0
    got = np.asarray(dcnv3_core(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        group=g, group_channels=gc))
    np.testing.assert_allclose(got, x, atol=1e-5)


def test_dcnv3_pallas_interpret_matches_xla():
    """Pallas sampling kernel (interpret mode on CPU) vs the XLA path."""
    rng = np.random.default_rng(7)
    n, h, w, g, gc = 2, 6, 5, 2, 4
    p = 9
    x = rng.normal(size=(n, h, w, g * gc)).astype(np.float32)
    offset = (rng.normal(size=(n, h, w, g * p * 2)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, size=(n, h, w, g * p)).astype(np.float32)

    want = np.asarray(dcnv3_core(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        group=g, group_channels=gc, impl="xla"))

    import unittest.mock as mock
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        kw.pop("cost_estimate", None)
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = np.asarray(dcnv3_core(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            group=g, group_channels=gc, impl="pallas"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_dcnv3_pallas_backward_matches_xla_grad():
    """Hand-derived backward kernel (interpret mode) vs autodiff of the XLA
    formulation."""
    import unittest.mock as mock
    import jax
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(11)
    n, h, w, g, gc = 1, 5, 6, 2, 4
    p = 9
    x = rng.normal(size=(n, h, w, g * gc)).astype(np.float32)
    offset = (rng.normal(size=(n, h, w, g * p * 2))).astype(np.float32)
    mask = rng.uniform(0.2, 1, size=(n, h, w, g * p)).astype(np.float32)
    cot = rng.normal(size=(n, h, w, g * gc)).astype(np.float32)

    def loss(impl):
        def f(xx, oo, mm):
            out = dcnv3_core(xx, oo, mm, group=g, group_channels=gc,
                             impl=impl)
            return jnp.sum(out * jnp.asarray(cot))
        return f

    want = jax.grad(loss("xla"), argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask))

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        kw.pop("cost_estimate", None)
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", interp_call):
        got = jax.grad(loss("pallas"), argnums=(0, 1, 2))(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask))

    for gw, gg, name in zip(want, got, ("dx", "doffset", "dmask")):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), atol=3e-4, rtol=1e-3,
            err_msg=name)
