"""DCNv3 deformable sampling core for TPU.

TPU-native replacement for the reference's native DCNv3 CUDA extension
(Segmentation/mmdet/models/layers/transformer/ops_dcnv3/src/*) — the active
code path there is the pure-torch ``dcnv3_core_pytorch``
(ops_dcnv3/functions/dcnv3_func.py:91-189): reference-point + dilation-grid
construction followed by ``F.grid_sample`` bilinear gathers of
``group x kernel_h*kernel_w`` points, weighted by a (spiked, not softmaxed)
mask.

TPU formulation — no gathers
----------------------------
Scalar gathers serialize on TPU, so bilinear sampling is decomposed into its
separable form: a sample at (y, x) is ``r(y)ᵀ · F · c(x)`` where ``r``/``c``
are 2-tap one-hot row/column selector vectors (the bilinear weights).  For a
whole (batch, group) tile this becomes two dense contractions that run on
the MXU:

    G[o·p, (v,c)]  = Σ_u  R[o·p, u] · F[u, (v,c)]        (matmul)
    out[o, c]      = Σ_p Σ_v C[o, p, v] · G[o, p, v, c]   (fused reduce)

with the sampling mask folded into ``R``.  Out-of-range taps produce all-zero
selector rows, which reproduces ``grid_sample(padding_mode='zeros')``
exactly.  Selector construction is a VPU compare against an iota — cheap
because the selector length is only H+2·pad.

Equivalent to the reference op to float precision (see tests/test_dcnv3.py,
which checks against an independent torch ``F.grid_sample`` golden).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _reference_points(h_in, w_in, kernel_h, kernel_w, dilation_h, dilation_w,
                      stride_h, stride_w):
    """Normalized sampling-center grid, matching dcnv3_func.py:91-119."""
    h_out = (h_in - (dilation_h * (kernel_h - 1) + 1)) // stride_h + 1
    w_out = (w_in - (dilation_w * (kernel_w - 1) + 1)) // stride_w + 1
    base_y = (dilation_h * (kernel_h - 1)) // 2 + 0.5
    base_x = (dilation_w * (kernel_w - 1)) // 2 + 0.5
    ref_y = (base_y + np.arange(h_out) * stride_h) / h_in
    ref_x = (base_x + np.arange(w_out) * stride_w) / w_in
    ref = np.stack(np.meshgrid(ref_x, ref_y, indexing="xy"), axis=-1)
    return ref.reshape(h_out * w_out, 2), h_out, w_out


def _dilation_grid(h_in, w_in, kernel_h, kernel_w, dilation_h, dilation_w):
    """Per-kernel-point offsets (dcnv3_func.py:122-144), x-major point order
    (p = kx * kernel_h + ky) to match the torch meshgrid layout."""
    xs = -((dilation_w * (kernel_w - 1)) // 2) + np.arange(kernel_w) * dilation_w
    ys = -((dilation_h * (kernel_h - 1)) // 2) + np.arange(kernel_h) * dilation_h
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([gx / w_in, gy / h_in], axis=-1).reshape(-1, 2)


def _selector(pos: jax.Array, size: int, dtype) -> jax.Array:
    """Two-tap bilinear selector vectors.

    pos: [...] fractional pixel coordinates (half-pixel convention already
    applied).  Returns [..., size] with weight (1-f) at floor(pos) and f at
    floor(pos)+1; taps outside [0, size) vanish (zero padding).
    """
    p0 = jnp.floor(pos)
    frac = (pos - p0).astype(dtype)
    i0 = p0.astype(jnp.int32)
    iota = jnp.arange(size, dtype=jnp.int32)
    iota = iota.reshape((1,) * pos.ndim + (size,))
    i0e = i0[..., None]
    sel0 = (iota == i0e).astype(dtype)
    sel1 = (iota == i0e + 1).astype(dtype)
    return sel0 * (1.0 - frac)[..., None] + sel1 * frac[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _pallas_sample(feat, py, px, mask, num_points, h_in, w_in, group, cg):
    """Differentiable Pallas sampler: forward (v5: batched-point matmul +
    repeat-based channel expansion) + hand-derived backward kernels
    (see ops/pallas/dcnv3_kernel.py)."""
    from .pallas.dcnv3_kernel import dcnv3_sample_pallas_t5

    return dcnv3_sample_pallas_t5(
        feat, py, px, mask, num_points=num_points, h_in=h_in, w_in=w_in,
        group=group, group_channels=cg)


def _pallas_sample_fwd(feat, py, px, mask, num_points, h_in, w_in, group,
                       cg):
    out = _pallas_sample(feat, py, px, mask, num_points, h_in, w_in, group,
                         cg)
    return out, (feat, py, px, mask)


def _pallas_sample_bwd(num_points, h_in, w_in, group, cg, res, dout):
    from .pallas.dcnv3_kernel import dcnv3_sample_pallas_t5_bwd

    feat, py, px, mask = res
    dfeat, dpy, dpx, dm = dcnv3_sample_pallas_t5_bwd(
        feat, py, px, mask, dout, num_points=num_points, h_in=h_in,
        w_in=w_in, group=group, group_channels=cg)
    return dfeat, dpy, dpx, dm


_pallas_sample.defvjp(_pallas_sample_fwd, _pallas_sample_bwd)


def _use_pallas(impl: str) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    # auto: Pallas kernel on TPU, XLA contraction elsewhere (CPU tests)
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_h", "kernel_w", "stride_h", "stride_w", "pad_h", "pad_w",
        "dilation_h", "dilation_w", "group", "group_channels", "chunk",
        "impl",
    ),
)
def dcnv3_core(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    *,
    kernel_h: int = 3,
    kernel_w: int = 3,
    stride_h: int = 1,
    stride_w: int = 1,
    pad_h: int = 1,
    pad_w: int = 1,
    dilation_h: int = 1,
    dilation_w: int = 1,
    group: int = 32,
    group_channels: int = 8,
    offset_scale: float = 1.0,
    chunk: int = 4,
    impl: str = "auto",
) -> jax.Array:
    """Deformable group sampling, numerically equivalent to
    ``dcnv3_core_pytorch``.

    Args:
      x:      [N, H, W, group*group_channels] input (channels-last).
      offset: [N, H_out, W_out, group*P*2] per-point (x, y) offsets.
      mask:   [N, H_out, W_out, group*P] sampling weights (spiked, NOT
              softmaxed — dcnv3.py:213-215).
      chunk:  batch chunking for the intermediate contraction buffer.
    Returns:
      [N, H_out, W_out, group*group_channels].
    """
    n, h, w, c = x.shape
    p = kernel_h * kernel_w
    cg = group_channels
    # The reference pads the feature with a zero ring and computes sampling
    # coordinates in padded space (dcnv3_func.py:156-160).  Materializing
    # that pad is unnecessary here: the 2-tap selectors already produce zero
    # weight for taps outside [0, size) — grid_sample's zero padding — so
    # sampling the UNPADDED feature with coordinates shifted by -pad is
    # bit-exact (a tap landing on the pad ring contributes exactly 0 either
    # way).  This keeps the Pallas matmul's row dimension at W*Cg (= 256 for
    # the flagship, an exact multiple of the 128 MXU sublanes) instead of
    # (W+2)*Cg = 272 -> 3 sublane blocks: ~33%% less MXU work per layer.
    h_pad, w_pad = h + 2 * pad_h, w + 2 * pad_w
    h_in, w_in = h, w

    ref, h_out, w_out = _reference_points(
        h_pad, w_pad, kernel_h, kernel_w, dilation_h, dilation_w,
        stride_h, stride_w)
    grid = _dilation_grid(h_pad, w_pad, kernel_h, kernel_w, dilation_h,
                          dilation_w)
    base = jnp.asarray(ref[:, None, :] + grid[None, :, :] * offset_scale,
                       dtype=jnp.float32)  # [HoWo, P, 2] (x, y) normalized

    hw_out = h_out * w_out
    offset = offset.reshape(n, hw_out, group, p, 2).astype(jnp.float32)
    spatial_norm = jnp.asarray([w_pad, h_pad], jnp.float32)
    loc = base[None, :, None, :, :] + offset * (offset_scale / spatial_norm)
    # half-pixel convention of grid_sample(align_corners=False), shifted
    # from padded to unpadded pixel space
    px = loc[..., 0] * w_pad - 0.5 - pad_w  # [N, HoWo, G, P]
    py = loc[..., 1] * h_pad - 0.5 - pad_h

    dt = x.dtype
    mask = mask.reshape(n, hw_out, group, p)

    if _use_pallas(impl):
        feat = x.reshape(n, h_in, w_in, group, cg)
        feat = feat.transpose(0, 3, 1, 2, 4).reshape(
            n, group, h_in, w_in * cg)
        py_t = py.transpose(0, 2, 3, 1).astype(jnp.float32)  # [N,G,P,HoWo]
        px_t = px.transpose(0, 2, 3, 1).astype(jnp.float32)
        m_t = mask.transpose(0, 2, 3, 1).astype(jnp.float32)
        out = _pallas_sample(feat, py_t, px_t, m_t, p, h_in, w_in, group,
                             cg)  # [N, G, Cg, HoWo]
        out = out.transpose(0, 3, 1, 2).reshape(
            n, h_out, w_out, group * cg)
        return out

    # Grouped features: [N, G, Hin, Win*Cg]
    feat = x.reshape(n, h_in, w_in, group, cg)
    feat = feat.transpose(0, 3, 1, 2, 4).reshape(n, group, h_in, w_in * cg)

    def process(args):
        px_c, py_c, m_c, feat_c = args
        nc = px_c.shape[0]
        # selectors: [nc, HoWo, G, P, {Hin|Win}]; mask folded into rows
        rows = _selector(py_c, h_in, dt) * m_c.astype(dt)[..., None]
        cols = _selector(px_c, w_in, dt)
        # [nc, G, HoWo*P, Hin]
        r = rows.transpose(0, 2, 1, 3, 4).reshape(
            nc, group, hw_out * p, h_in)
        g_mid = jnp.einsum("bgou,bguv->bgov", r, feat_c,
                           preferred_element_type=jnp.float32)
        g_mid = g_mid.reshape(nc, group, hw_out, p, w_in, cg)
        cc = cols.transpose(0, 2, 1, 3, 4)  # [nc, G, HoWo, P, Win]
        out_c = jnp.einsum("bgopv,bgopvc->bgoc", cc.astype(jnp.float32),
                           g_mid)
        return out_c.astype(dt)

    if n <= chunk:
        out = process((px, py, mask, feat))
    else:
        assert n % chunk == 0
        def body(args):
            return process(args)
        px_r = px.reshape(n // chunk, chunk, *px.shape[1:])
        py_r = py.reshape(n // chunk, chunk, *py.shape[1:])
        m_r = mask.reshape(n // chunk, chunk, *mask.shape[1:])
        f_r = feat.reshape(n // chunk, chunk, *feat.shape[1:])
        out = jax.lax.map(body, (px_r, py_r, m_r, f_r))
        out = out.reshape(n, *out.shape[2:])

    # [N, G, HoWo, Cg] -> [N, Ho, Wo, G*Cg]
    out = out.transpose(0, 2, 1, 3).reshape(n, h_out, w_out, group * cg)
    return out
