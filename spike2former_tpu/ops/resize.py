"""Image resize ops with PyTorch-compatible sampling semantics.

The reference pipeline leans on ``F.interpolate`` in three places: FPN
top-down pathways (nearest + bilinear align_corners=False), mask upsampling
(bilinear align_corners=False), and GT downsampling (nearest).  These helpers
reproduce those exact samplings in XLA so a converted checkpoint scores the
same mIoU.

Layout is channels-last ``[..., H, W, C]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize, half-pixel centers == torch ``align_corners=False``
    with ``antialias=False`` (torch's default, used throughout the reference).

    ``jax.image.resize`` antialiases on downscale, so we gather manually.
    Accepts ``[..., H, W, C]``.
    """
    *lead, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if oh >= h and ow >= w:
        # Pure upscale: jax.image.resize (no antialias kicks in) is exactly
        # torch's half-pixel bilinear and lowers to MXU-friendly matmuls
        # instead of gathers.
        return jax.image.resize(x, (*lead, oh, ow, c), method="linear")

    def grid(in_size, out_size):
        # src = (dst + 0.5) * in/out - 0.5, clamped into the valid range
        s = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (
            in_size / out_size) - 0.5
        return jnp.clip(s, 0.0, in_size - 1)

    ys, xs = grid(h, oh), grid(w, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[:, None, None]
    wx = (xs - x0).astype(x.dtype)[None, :, None]

    def gather(yi, xi):
        return x[..., yi[:, None], xi[None, :], :]

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear_hw(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of the LAST TWO axes (``[..., H, W]``, i.e.
    channels-first), same torch half-pixel ``align_corners=False`` sampling
    as :func:`resize_bilinear`.

    Resizing the mask-logit stack ``[B, nq, H, W]`` in its native layout
    avoids two full HBM transpose passes (~2 GB of traffic per flagship
    batch) that the channels-last helper would require.
    """
    *lead, h, w = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if oh >= h and ow >= w:
        # pure upscale: same matmul lowering as resize_bilinear, applied to
        # the trailing axes directly
        return jax.image.resize(x, (*lead, oh, ow), method="linear")

    def grid(in_size, out_size):
        s = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (
            in_size / out_size) - 0.5
        return jnp.clip(s, 0.0, in_size - 1)

    ys, xs = grid(h, oh), grid(w, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[:, None]
    wx = (xs - x0).astype(x.dtype)[None, :]

    def gather(yi, xi):
        return x[..., yi[:, None], xi[None, :]]

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with ``align_corners=True`` (mmseg resize default in
    some heads)."""
    *lead, h, w, c = x.shape
    oh, ow = out_hw

    def grid(in_size, out_size):
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / (out_size - 1)
        )

    ys, xs = grid(h, oh), grid(w, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]

    def gather(yi, xi):
        return x[..., yi[:, None], xi[None, :], :]

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def resize_nearest_torch(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize matching torch ``F.interpolate(mode='nearest')``:
    ``src = floor(dst * in/out)`` (asymmetric, not half-pixel).

    Accepts ``[..., H, W, C]``.
    """
    *lead, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        # integer downscale: src = floor(dst*(h/oh)) = dst*f exactly — a
        # strided slice, not a gather.  The gather form below measured
        # ~12 ms per execution on the s32[16,512,512] train slot map
        # (TPU lowers computed-index gathers to a [hw, B] scalar-gather
        # with 16-wide lanes); the slice fuses into consumers for free.
        return x[..., ::h // oh, ::w // ow, :]
    if oh % h == 0 and ow % w == 0:
        # integer upscale: src = dst // f — pixel repetition, gather-free
        fy, fx = oh // h, ow // w
        x = jnp.broadcast_to(x[..., :, None, :, None, :],
                             (*lead, h, fy, w, fx, c))
        return x.reshape(*lead, oh, ow, c)
    ys = jnp.floor(jnp.arange(oh, dtype=jnp.float32) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow, dtype=jnp.float32) * (w / ow)).astype(jnp.int32)
    ys = jnp.minimum(ys, h - 1)
    xs = jnp.minimum(xs, w - 1)
    return x[..., ys[:, None], xs[None, :], :]
