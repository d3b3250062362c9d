"""DCNv3 deformable sampling core for TPU.

TPU-native replacement for the reference's native DCNv3 CUDA extension
(Segmentation/mmdet/models/layers/transformer/ops_dcnv3/src/*) — the active
code path there is actually the pure-torch ``dcnv3_core_pytorch``
(ops_dcnv3/functions/dcnv3_func.py:91-189): reference-point + dilation-grid
construction followed by ``F.grid_sample`` bilinear gathers of
``group x kernel_h*kernel_w`` points, weighted by a (spiked, not softmaxed)
mask.

Here the bilinear gather is expressed as four integer gathers with
zero-padding masks (grid_sample ``padding_mode='zeros'``,
``align_corners=False`` semantics), fully vectorized so XLA lowers it to
dense dynamic-gathers that pipeline well on TPU.  Layout is channels-last
``[N, H, W, C]``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _reference_points(h_in, w_in, kernel_h, kernel_w, dilation_h, dilation_w,
                      stride_h, stride_w):
    """Normalized sampling-center grid, matching dcnv3_func.py:91-119.

    Returns [H_out*W_out, 2] in (x, y) order, normalized by (W_in, H_in)
    of the *padded* input.
    """
    h_out = (h_in - (dilation_h * (kernel_h - 1) + 1)) // stride_h + 1
    w_out = (w_in - (dilation_w * (kernel_w - 1) + 1)) // stride_w + 1
    base_y = (dilation_h * (kernel_h - 1)) // 2 + 0.5
    base_x = (dilation_w * (kernel_w - 1)) // 2 + 0.5
    ref_y = (base_y + np.arange(h_out) * stride_h) / h_in
    ref_x = (base_x + np.arange(w_out) * stride_w) / w_in
    ref = np.stack(np.meshgrid(ref_x, ref_y, indexing="xy"), axis=-1)  # [Ho,Wo,2]
    return ref.reshape(h_out * w_out, 2), h_out, w_out


def _dilation_grid(h_in, w_in, kernel_h, kernel_w, dilation_h, dilation_w):
    """Per-kernel-point offsets, matching dcnv3_func.py:122-144.

    Returns [P, 2] in (x, y) order normalized by (W_in, H_in).  Note the
    reference builds the grid with ``meshgrid(x_range, y_range)`` (default
    'ij' indexing on two 1-D tensors), so the point order is
    x-major: p = kx * kernel_h + ky.
    """
    xs = -((dilation_w * (kernel_w - 1)) // 2) + np.arange(kernel_w) * dilation_w
    ys = -((dilation_h * (kernel_h - 1)) // 2) + np.arange(kernel_h) * dilation_h
    gx, gy = np.meshgrid(xs, ys, indexing="ij")  # x-major like torch.meshgrid
    grid = np.stack([gx / w_in, gy / h_in], axis=-1).reshape(-1, 2)
    return grid


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_h", "kernel_w", "stride_h", "stride_w", "pad_h", "pad_w",
        "dilation_h", "dilation_w", "group", "group_channels",
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
) -> jax.Array:
    """Deformable group sampling, numerically equivalent to
    ``dcnv3_core_pytorch``.

    Args:
      x:      [N, H, W, group*group_channels] input (channels-last).
      offset: [N, H_out, W_out, group*P*2] per-point (x, y) offsets in pixels
              of the padded input.
      mask:   [N, H_out, W_out, group*P] sampling weights.
    Returns:
      [N, H_out, W_out, group*group_channels].
    """
    n, h, w, c = x.shape
    p = kernel_h * kernel_w
    # Zero-pad spatially (grid_sample zero padding is handled by masking).
    xp = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    h_in, w_in = h + 2 * pad_h, w + 2 * pad_w

    ref, h_out, w_out = _reference_points(
        h_in, w_in, kernel_h, kernel_w, dilation_h, dilation_w, stride_h, stride_w)
    grid = _dilation_grid(h_in, w_in, kernel_h, kernel_w, dilation_h, dilation_w)
    # [HoWo, P, 2] normalized sampling centers (same for all groups).
    base = jnp.asarray(ref[:, None, :] + grid[None, :, :] * offset_scale,
                       dtype=x.dtype)

    hw_out = h_out * w_out
    offset = offset.reshape(n, hw_out, group, p, 2)
    spatial_norm = jnp.asarray([w_in, h_in], dtype=x.dtype)
    # Normalized locations in [0,1]; then to pixel coords with half-pixel
    # centers (align_corners=False): px = loc * size - 0.5.
    loc = base[None, :, None, :, :] + offset * (offset_scale / spatial_norm)
    px = loc[..., 0] * w_in - 0.5  # [N, HoWo, G, P]
    py = loc[..., 1] * h_in - 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Grouped view of the padded input: [N, Hin*Win, G, Cg]
    xg = xp.reshape(n, h_in * w_in, group, group_channels)

    def corner(yi, xi):
        valid = ((yi >= 0) & (yi < h_in) & (xi >= 0) & (xi < w_in))
        yc = jnp.clip(yi, 0, h_in - 1)
        xc = jnp.clip(xi, 0, w_in - 1)
        flat = yc * w_in + xc  # [N, HoWo, G, P]
        # Gather per (n, g): take_along_axis over the flattened spatial dim.
        idx = flat.transpose(0, 2, 1, 3).reshape(n, group, hw_out * p)
        src = xg.transpose(0, 2, 1, 3)  # [N, G, Hin*Win, Cg]
        out = jnp.take_along_axis(src, idx[..., None], axis=2)
        out = out.reshape(n, group, hw_out, p, group_channels)
        return out * valid.transpose(0, 2, 1, 3)[..., None].astype(x.dtype)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)

    wx1 = wx1.transpose(0, 2, 1, 3)[..., None]
    wy1 = wy1.transpose(0, 2, 1, 3)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    sampled = (v00 * wy0 * wx0 + v01 * wy0 * wx1 +
               v10 * wy1 * wx0 + v11 * wy1 * wx1)  # [N, G, HoWo, P, Cg]

    m = mask.reshape(n, hw_out, group, p).transpose(0, 2, 1, 3)[..., None]
    out = jnp.sum(sampled * m.astype(x.dtype), axis=3)  # [N, G, HoWo, Cg]
    out = out.transpose(0, 2, 1, 3).reshape(n, h_out, w_out, group * group_channels)
    return out
