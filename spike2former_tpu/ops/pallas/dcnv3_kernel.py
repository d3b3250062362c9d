"""Pallas TPU kernel for DCNv3 deformable bilinear sampling.

This is the TPU-native equivalent of the reference's CUDA im2col kernels
(ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh).  Strategy: one program per
(batch, group) tile; the group's feature map (~20 KB) lives in VMEM, and
bilinear sampling is decomposed into two MXU matmuls via one-hot selector
matrices built on the VPU:

  per kernel point p:
    R_p[o, u]   = 2-tap row selector (bilinear y-weights x sampling mask)
    G_p         = R_p @ F                 (F: [H_in, W_in*Cg], c-fastest)
    Cexp_p[o,j] = 2-tap column selector expanded over channels (j // Cg == v)
    T          += G_p * Cexp_p
  out           = T @ Sel                 (Sel[j, c] = 1 iff j % Cg == c)

Out-of-range taps produce all-zero selector rows == grid_sample's zero
padding.  No gathers, no in-kernel reshapes — everything is iota-compare,
elementwise math, and two matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sampling_kernel(py_ref, px_ref, m_ref, feat_ref, sel_ref, out_ref,
                     *, num_points: int, h_in: int, w_in: int, cg: int,
                     acc_dtype):
    feat = feat_ref[0, 0]          # [H_in, W_in*Cg]
    wincg = w_in * cg
    hw_out = py_ref.shape[-1]

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (hw_out, h_in), 1)
    jdiv = jax.lax.broadcasted_iota(jnp.int32, (hw_out, wincg), 1) // cg

    def point_body(p, t_acc):
        py = py_ref[0, 0, p]       # [HoWo] f32
        px = px_ref[0, 0, p]
        m = m_ref[0, 0, p]

        y0f = jnp.floor(py)
        fy = (py - y0f)[:, None].astype(acc_dtype)
        y0 = y0f.astype(jnp.int32)[:, None]
        row = ((iota_u == y0).astype(acc_dtype) * (1.0 - fy)
               + (iota_u == y0 + 1).astype(acc_dtype) * fy)
        row = row * m[:, None].astype(acc_dtype)

        g_p = jnp.dot(row.astype(feat.dtype), feat,
                      preferred_element_type=acc_dtype)

        x0f = jnp.floor(px)
        fx = (px - x0f)[:, None].astype(acc_dtype)
        x0 = x0f.astype(jnp.int32)[:, None]
        cexp = ((jdiv == x0).astype(acc_dtype) * (1.0 - fx)
                + (jdiv == x0 + 1).astype(acc_dtype) * fx)
        return t_acc + g_p * cexp

    t_acc = jax.lax.fori_loop(
        0, num_points, point_body, jnp.zeros((hw_out, wincg), acc_dtype))

    out = jnp.dot(t_acc.astype(feat.dtype), sel_ref[:, :],
                  preferred_element_type=acc_dtype)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _sampling_kernel_t(py_ref, px_ref, m_ref, feat_ref, expand_ref, sel_ref,
                       out_ref, *, num_points: int, h_in: int, w_in: int,
                       cg: int, acc_dtype):
    """Transposed-layout variant: every VPU tensor keeps the long HoWo axis
    in lanes (128-wide) so selector builds waste nothing, and the
    column-selector expansion over channels runs on the MXU
    (Cexp^T = Expand^T @ C_small^T).

    feat_ref block: [1, 1, W_in*Cg, H_in] (c-fastest rows, transposed).
    out block:      [1, 1, Cg, HoWo].
    """
    feat_t = feat_ref[0, 0]            # [WinCg, Hin]
    hw_out = py_ref.shape[-1]
    wincg = w_in * cg

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (h_in, hw_out), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (w_in, hw_out), 0)

    def point_body(p, t_acc):
        py = py_ref[0, 0, p][None, :]   # [1, HoWo]
        px = px_ref[0, 0, p][None, :]
        m = m_ref[0, 0, p][None, :]

        y0f = jnp.floor(py)
        fy = (py - y0f).astype(acc_dtype)
        y0 = y0f.astype(jnp.int32)
        row_t = ((iota_u == y0).astype(acc_dtype) * (1.0 - fy)
                 + (iota_u == y0 + 1).astype(acc_dtype) * fy)
        row_t = row_t * m.astype(acc_dtype)          # [Hin, HoWo]

        g_t = jnp.dot(feat_t, row_t.astype(feat_t.dtype),
                      preferred_element_type=acc_dtype)  # [WinCg, HoWo]

        x0f = jnp.floor(px)
        fx = (px - x0f).astype(acc_dtype)
        x0 = x0f.astype(jnp.int32)
        col_t = ((iota_v == x0).astype(acc_dtype) * (1.0 - fx)
                 + (iota_v == x0 + 1).astype(acc_dtype) * fx)  # [Win, HoWo]
        cexp_t = jnp.dot(expand_ref[:, :], col_t.astype(expand_ref.dtype),
                         preferred_element_type=acc_dtype)  # [WinCg, HoWo]
        return t_acc + g_t * cexp_t

    t_acc = jax.lax.fori_loop(
        0, num_points, point_body, jnp.zeros((wincg, hw_out), acc_dtype))
    out = jnp.dot(sel_ref[:, :], t_acc.astype(sel_ref.dtype),
                  preferred_element_type=acc_dtype)  # [Cg, HoWo]
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "h_in", "w_in", "group",
                     "group_channels"),
)
def dcnv3_sample_pallas_t(
    feat: jax.Array,   # [N, G, H_in, W_in*Cg] (c-fastest within a column)
    py: jax.Array,     # [N, G, P, HoWo]
    px: jax.Array,
    mask: jax.Array,
    *,
    num_points: int,
    h_in: int,
    w_in: int,
    group: int,
    group_channels: int,
) -> jax.Array:
    """Transposed-layout sampler.  Returns [N, G, Cg, HoWo]."""
    n, g = feat.shape[0], feat.shape[1]
    hw_out = py.shape[-1]
    cg = group_channels
    wincg = w_in * cg

    # Tile the output-token axis so the [WinCg, tile] working set fits VMEM
    # for large feature maps (e.g. Cityscapes /16 = 4096 tokens).
    budget = 8 * 1024 * 1024  # bytes for the ~3 f32 [WinCg, tile] buffers
    tile = hw_out
    while 3 * wincg * 4 * tile > budget and tile % 2 == 0:
        tile //= 2
    n_tiles = hw_out // tile

    feat_t = jnp.swapaxes(feat, -1, -2)  # [N, G, WinCg, Hin]

    expand = np.zeros((wincg, w_in), np.float32)
    expand[np.arange(wincg), np.arange(wincg) // cg] = 1.0
    expand = jnp.asarray(expand, feat.dtype)
    sel = np.zeros((cg, wincg), np.float32)
    sel[np.arange(wincg) % cg, np.arange(wincg)] = 1.0
    sel = jnp.asarray(sel, feat.dtype)

    kernel = functools.partial(
        _sampling_kernel_t, num_points=num_points, h_in=h_in, w_in=w_in,
        cg=cg, acc_dtype=jnp.float32)

    coord_spec = pl.BlockSpec((1, 1, num_points, tile),
                              lambda i, j, o: (i, j, 0, o),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, g, cg, hw_out), feat.dtype),
        grid=(n, g, n_tiles),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, wincg, h_in), lambda i, j, o: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wincg, w_in), lambda i, j, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cg, wincg), lambda i, j, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cg, tile),
                               lambda i, j, o: (i, j, 0, o),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * g * num_points * hw_out * h_in * wincg,
            bytes_accessed=feat.size * 2 + py.size * 4 * 3
            + n * g * hw_out * cg * 2,
            transcendentals=0,
        ),
    )(py, px, mask, feat_t, expand, sel)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "h_in", "w_in", "group",
                     "group_channels"),
)
def dcnv3_sample_pallas(
    feat: jax.Array,   # [N, G, H_in, W_in*Cg] (c-fastest within a column)
    py: jax.Array,     # [N, G, P, HoWo] fractional pixel y (half-pixel conv.)
    px: jax.Array,     # [N, G, P, HoWo]
    mask: jax.Array,   # [N, G, P, HoWo]
    *,
    num_points: int,
    h_in: int,
    w_in: int,
    group: int,
    group_channels: int,
) -> jax.Array:
    """Returns [N, G, HoWo, Cg]."""
    n, g = feat.shape[0], feat.shape[1]
    hw_out = py.shape[-1]
    cg = group_channels
    wincg = w_in * cg

    sel = np.zeros((wincg, cg), np.float32)
    sel[np.arange(wincg), np.arange(wincg) % cg] = 1.0
    sel = jnp.asarray(sel, feat.dtype)

    kernel = functools.partial(
        _sampling_kernel, num_points=num_points, h_in=h_in, w_in=w_in,
        cg=cg, acc_dtype=jnp.float32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, g, hw_out, cg), feat.dtype),
        grid=(n, g),
        in_specs=[
            pl.BlockSpec((1, 1, num_points, hw_out),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_points, hw_out),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_points, hw_out),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h_in, wincg),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wincg, cg), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hw_out, cg),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * g * num_points * hw_out * (h_in + cg) * wincg,
            bytes_accessed=feat.size * 2 + py.size * 4 * 3
            + n * g * hw_out * cg * 2,
            transcendentals=0,
        ),
    )(py, px, mask, feat, sel)


def _sampling_kernel_t4(py_ref, px_ref, m_ref, feat_ref, sel_ref,
                        out_ref, *, num_points: int, h_in: int, w_in: int,
                        cg: int, acc_dtype):
    """v4: like the transposed kernel but the column-selector expansion over
    channels is a sublane REPLICATION (``pltpu.repeat`` tiles the [Win,
    tile] block cg times) instead of a [WinCg, Win] @ [Win, tile] matmul —
    halves the MXU FLOPs per point.  Rows are ordered j = c*Win + v
    (v-fastest) so the tiled copy lines up: cexp[j] = col[j %% Win].
    feat_ref block: [1, 1, Cg*Win, Hin] in that row order."""
    feat_t = feat_ref[0, 0]            # [CgWin, Hin]
    hw_out = py_ref.shape[-1]
    wincg = w_in * cg

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (h_in, hw_out), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (w_in, hw_out), 0)

    def point_body(p, t_acc):
        py = py_ref[0, 0, p][None, :]
        px = px_ref[0, 0, p][None, :]
        m = m_ref[0, 0, p][None, :]

        y0f = jnp.floor(py)
        fy = (py - y0f).astype(acc_dtype)
        y0 = y0f.astype(jnp.int32)
        row_t = ((iota_u == y0).astype(acc_dtype) * (1.0 - fy)
                 + (iota_u == y0 + 1).astype(acc_dtype) * fy)
        row_t = row_t * m.astype(acc_dtype)

        g_t = jnp.dot(feat_t, row_t.astype(feat_t.dtype),
                      preferred_element_type=acc_dtype)  # [WinCg, tile]

        x0f = jnp.floor(px)
        fx = (px - x0f).astype(acc_dtype)
        x0 = x0f.astype(jnp.int32)
        col_t = ((iota_v == x0).astype(acc_dtype) * (1.0 - fx)
                 + (iota_v == x0 + 1).astype(acc_dtype) * fx)  # [Win, tile]
        # cexp[(c, v), o] = col[v, o]: tiled sublane replication
        cexp_t = pltpu.repeat(col_t, cg, axis=0)       # [CgWin, tile]
        return t_acc + g_t * cexp_t

    t_acc = jax.lax.fori_loop(
        0, num_points, point_body, jnp.zeros((wincg, hw_out), acc_dtype))
    out = jnp.dot(sel_ref[:, :], t_acc.astype(sel_ref.dtype),
                  preferred_element_type=acc_dtype)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "h_in", "w_in", "group",
                     "group_channels"),
)
def dcnv3_sample_pallas_t4(
    feat: jax.Array, py: jax.Array, px: jax.Array, mask: jax.Array, *,
    num_points: int, h_in: int, w_in: int, group: int, group_channels: int,
) -> jax.Array:
    """v4 transposed sampler (repeat-based column expansion).
    Returns [N, G, Cg, HoWo]."""
    n, g = feat.shape[0], feat.shape[1]
    hw_out = py.shape[-1]
    cg = group_channels
    wincg = w_in * cg

    budget = 8 * 1024 * 1024
    tile = hw_out
    while 3 * wincg * 4 * tile > budget and tile % 2 == 0:
        tile //= 2
    n_tiles = hw_out // tile

    # rows ordered j = c*Win + v (v-fastest) to match the tiled expansion
    feat_cv = feat.reshape(n, g, h_in, w_in, cg)
    feat_t = jnp.transpose(feat_cv, (0, 1, 4, 3, 2)).reshape(
        n, g, wincg, h_in)
    sel = np.zeros((cg, wincg), np.float32)
    sel[np.arange(wincg) // w_in, np.arange(wincg)] = 1.0
    sel = jnp.asarray(sel, feat.dtype)

    kernel = functools.partial(
        _sampling_kernel_t4, num_points=num_points, h_in=h_in, w_in=w_in,
        cg=cg, acc_dtype=jnp.float32)

    coord_spec = pl.BlockSpec((1, 1, num_points, tile),
                              lambda i, j, o: (i, j, 0, o),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, g, cg, hw_out), feat.dtype),
        grid=(n, g, n_tiles),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, wincg, h_in), lambda i, j, o: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cg, wincg), lambda i, j, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cg, tile),
                               lambda i, j, o: (i, j, 0, o),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * g * num_points * hw_out * h_in * wincg,
            bytes_accessed=feat.size * 2 + py.size * 4 * 3
            + n * g * hw_out * cg * 2,
            transcendentals=0,
        ),
    )(py, px, mask, feat_t, sel)


def _sampling_kernel_t5(py_ref, px_ref, m_ref, feat_ref, sel_ref,
                        out_ref, row_scr, col_scr, *, num_points: int,
                        h_in: int, w_in: int, cg: int, acc_dtype,
                        tent: bool = False):
    """v5: all kernel points' selectors are built first (VPU), then ONE
    [CgWin, Hin] @ [Hin, P*tile] matmul samples every point — MXU runs one
    long pipeline instead of P short ones, and VPU/MXU work no longer
    serialize per point.

    ``tent=True`` (v6) builds each 2-tap bilinear selector as the tent
    function ``relu(1 - |iota - p|)`` instead of two iota-compares + floor
    / frac — the same weights ((1-f) at floor(p), f at floor(p)+1, zero
    outside [0, size)) in ~half the VPU ops, with no int conversions."""
    feat_t = feat_ref[0, 0]            # [CgWin, Hin]
    tile = py_ref.shape[-1]
    wincg = w_in * cg

    if tent:
        # Mosaic's iota is integer-only; build i32 and convert once
        fiota_u = jax.lax.broadcasted_iota(
            jnp.int32, (h_in, tile), 0).astype(acc_dtype)
        fiota_v = jax.lax.broadcasted_iota(
            jnp.int32, (w_in, tile), 0).astype(acc_dtype)

        def build(p, _):
            py = py_ref[0, 0, p][None, :].astype(acc_dtype)
            px = px_ref[0, 0, p][None, :].astype(acc_dtype)
            m = m_ref[0, 0, p][None, :].astype(acc_dtype)
            row_t = jnp.maximum(1.0 - jnp.abs(fiota_u - py), 0.0)
            row_scr[:, pl.dslice(p * tile, tile)] = (
                row_t * m).astype(row_scr.dtype)
            col_scr[:, pl.dslice(p * tile, tile)] = jnp.maximum(
                1.0 - jnp.abs(fiota_v - px), 0.0).astype(col_scr.dtype)
            return 0
    else:
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (h_in, tile), 0)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (w_in, tile), 0)

        def build(p, _):
            py = py_ref[0, 0, p][None, :]
            px = px_ref[0, 0, p][None, :]
            m = m_ref[0, 0, p][None, :]
            y0f = jnp.floor(py)
            fy = (py - y0f).astype(acc_dtype)
            y0 = y0f.astype(jnp.int32)
            row_t = ((iota_u == y0).astype(acc_dtype) * (1.0 - fy)
                     + (iota_u == y0 + 1).astype(acc_dtype) * fy)
            row_scr[:, pl.dslice(p * tile, tile)] = (
                row_t * m.astype(acc_dtype)).astype(row_scr.dtype)
            x0f = jnp.floor(px)
            fx = (px - x0f).astype(acc_dtype)
            x0 = x0f.astype(jnp.int32)
            col_scr[:, pl.dslice(p * tile, tile)] = (
                (iota_v == x0).astype(acc_dtype) * (1.0 - fx)
                + (iota_v == x0 + 1).astype(acc_dtype) * fx
            ).astype(col_scr.dtype)
            return 0

    jax.lax.fori_loop(0, num_points, build, 0)

    g_all = jnp.dot(feat_t, row_scr[:, :].astype(feat_t.dtype),
                    preferred_element_type=acc_dtype)  # [CgWin, P*tile]
    prod = g_all * pltpu.repeat(
        col_scr[:, :].astype(acc_dtype), cg, axis=0)

    t_acc = prod[:, :tile]
    for p in range(1, num_points):  # static slices (P is small & static)
        t_acc = t_acc + prod[:, p * tile:(p + 1) * tile]
    out = jnp.dot(sel_ref[:, :], t_acc.astype(sel_ref.dtype),
                  preferred_element_type=acc_dtype)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "h_in", "w_in", "group",
                     "group_channels", "tent"),
)
def dcnv3_sample_pallas_t5(
    feat: jax.Array, py: jax.Array, px: jax.Array, mask: jax.Array, *,
    num_points: int, h_in: int, w_in: int, group: int, group_channels: int,
    tent: bool = True,
) -> jax.Array:
    """v5 batched-points sampler (``tent=True`` = v6 selector builds).
    Returns [N, G, Cg, HoWo]."""
    n, g = feat.shape[0], feat.shape[1]
    hw_out = py.shape[-1]
    cg = group_channels
    wincg = w_in * cg

    # VMEM: row [Hin, P*t] + col [Win, P*t] bf16 + g_all/prod [WinCg, P*t]
    # f32 + t_acc [WinCg, t].  13 MB admits tile=512 at the flagship /16
    # shapes (fewer, longer programs: measured 4.04 -> 3.66 ms/layer at
    # TB=16); the true peak including Mosaic temporaries stays under the
    # 16 MB VMEM cap (validated on-chip).
    budget = 13 * 1024 * 1024
    tile = hw_out

    def vmem(t):
        return (2 * h_in * num_points * t * feat.dtype.itemsize
                + 2 * wincg * num_points * t * 4 + wincg * t * 4)

    while vmem(tile) > budget and tile % 2 == 0:
        tile //= 2
    n_tiles = hw_out // tile

    feat_cv = feat.reshape(n, g, h_in, w_in, cg)
    feat_t = jnp.transpose(feat_cv, (0, 1, 4, 3, 2)).reshape(
        n, g, wincg, h_in)
    sel = np.zeros((cg, wincg), np.float32)
    sel[np.arange(wincg) // w_in, np.arange(wincg)] = 1.0
    sel = jnp.asarray(sel, feat.dtype)

    kernel = functools.partial(
        _sampling_kernel_t5, num_points=num_points, h_in=h_in, w_in=w_in,
        cg=cg, acc_dtype=jnp.float32, tent=tent)

    coord_spec = pl.BlockSpec((1, 1, num_points, tile),
                              lambda i, j, o: (i, j, 0, o),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, g, cg, hw_out), feat.dtype),
        grid=(n, g, n_tiles),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, wincg, h_in), lambda i, j, o: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cg, wincg), lambda i, j, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cg, tile),
                               lambda i, j, o: (i, j, 0, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_in, num_points * tile), feat.dtype),
            pltpu.VMEM((w_in, num_points * tile), feat.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * g * num_points * hw_out * h_in * wincg,
            bytes_accessed=feat.size * 2 + py.size * 4 * 3
            + n * g * hw_out * cg * 2,
            transcendentals=0,
        ),
    )(py, px, mask, feat_t, sel)


def _sampling_kernel_tg(py_ref, px_ref, m_ref, feat_ref, expand_ref, sel_ref,
                        out_ref, *, num_points: int, h_in: int, w_in: int,
                        cg: int, group: int, acc_dtype):
    """Group-coarsened transposed kernel: one program per (batch, tile)
    handles ALL groups in an in-kernel loop — amortizes the per-program
    launch/copy overhead that dominates the fine grid (1024 programs of
    ~3 µs MXU work each ran at ~9% utilization)."""
    hw_out = py_ref.shape[-1]
    wincg = w_in * cg

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (h_in, hw_out), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (w_in, hw_out), 0)

    def group_body(gi, _):
        feat_t = feat_ref[0, gi]          # [WinCg, Hin]

        def point_body(p, t_acc):
            py = py_ref[0, gi, p][None, :]
            px = px_ref[0, gi, p][None, :]
            m = m_ref[0, gi, p][None, :]

            y0f = jnp.floor(py)
            fy = (py - y0f).astype(acc_dtype)
            y0 = y0f.astype(jnp.int32)
            row_t = ((iota_u == y0).astype(acc_dtype) * (1.0 - fy)
                     + (iota_u == y0 + 1).astype(acc_dtype) * fy)
            row_t = row_t * m.astype(acc_dtype)

            g_t = jnp.dot(feat_t, row_t.astype(feat_t.dtype),
                          preferred_element_type=acc_dtype)

            x0f = jnp.floor(px)
            fx = (px - x0f).astype(acc_dtype)
            x0 = x0f.astype(jnp.int32)
            col_t = ((iota_v == x0).astype(acc_dtype) * (1.0 - fx)
                     + (iota_v == x0 + 1).astype(acc_dtype) * fx)
            cexp_t = jnp.dot(expand_ref[:, :],
                             col_t.astype(expand_ref.dtype),
                             preferred_element_type=acc_dtype)
            return t_acc + g_t * cexp_t

        t_acc = jax.lax.fori_loop(
            0, num_points, point_body,
            jnp.zeros((wincg, hw_out), acc_dtype))
        out_ref[0, gi] = jnp.dot(
            sel_ref[:, :], t_acc.astype(sel_ref.dtype),
            preferred_element_type=acc_dtype).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, group_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "h_in", "w_in", "group",
                     "group_channels"),
)
def dcnv3_sample_pallas_tg(
    feat: jax.Array,   # [N, G, H_in, W_in*Cg]
    py: jax.Array,     # [N, G, P, HoWo]
    px: jax.Array,
    mask: jax.Array,
    *,
    num_points: int,
    h_in: int,
    w_in: int,
    group: int,
    group_channels: int,
) -> jax.Array:
    """Group-coarsened transposed sampler.  Returns [N, G, Cg, HoWo]."""
    n, g = feat.shape[0], feat.shape[1]
    hw_out = py.shape[-1]
    cg = group_channels
    wincg = w_in * cg

    # VMEM: feat_t all groups (g*wincg*h_in*2B) + coords (3*g*P*tile*4B)
    # + out (g*cg*tile*2B) + working [wincg, tile] f32 buffers (~3x);
    # Mosaic double-buffers input blocks, so stay well under the 16MB cap
    budget = 6 * 1024 * 1024
    tile = hw_out

    def vmem(t):
        return (g * wincg * h_in * 2 + 3 * g * num_points * t * 4
                + g * cg * t * 2 + 3 * wincg * t * 4)

    while vmem(tile) > budget and tile % 2 == 0:
        tile //= 2
    n_tiles = hw_out // tile

    feat_t = jnp.swapaxes(feat, -1, -2)  # [N, G, WinCg, Hin]

    expand = np.zeros((wincg, w_in), np.float32)
    expand[np.arange(wincg), np.arange(wincg) // cg] = 1.0
    expand = jnp.asarray(expand, feat.dtype)
    sel = np.zeros((cg, wincg), np.float32)
    sel[np.arange(wincg) % cg, np.arange(wincg)] = 1.0
    sel = jnp.asarray(sel, feat.dtype)

    kernel = functools.partial(
        _sampling_kernel_tg, num_points=num_points, h_in=h_in, w_in=w_in,
        cg=cg, group=group, acc_dtype=jnp.float32)

    coord_spec = pl.BlockSpec((1, g, num_points, tile),
                              lambda i, o: (i, 0, 0, o),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, g, cg, hw_out), feat.dtype),
        grid=(n, n_tiles),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, g, wincg, h_in), lambda i, o: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wincg, w_in), lambda i, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cg, wincg), lambda i, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, cg, tile),
                               lambda i, o: (i, 0, 0, o),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * g * num_points * hw_out * h_in * wincg,
            bytes_accessed=feat.size * 2 + py.size * 4 * 3
            + n * g * hw_out * cg * 2,
            transcendentals=0,
        ),
    )(py, px, mask, feat_t, expand, sel)


def _sampling_kernel_t5_bwd(py_ref, px_ref, m_ref, feat_ref, sel_ref,
                            dout_ref, dfeat_ref, dpy_ref, dpx_ref, dm_ref,
                            row_scr, col_scr, *, num_points: int,
                            h_in: int, w_in: int, cg: int, acc_dtype,
                            tent: bool = False):
    """v5-style backward: selectors built once into scratch, then THREE
    batched matmuls (g_all, dfeat, drow_all) instead of 5 per point.
    Layout: feat rows j = c*Win + v (v-fastest), same as the v5 forward.

    ``tent=True`` builds selector VALUES as ``relu(1 - |iota - p|)`` (see
    the forward); the coordinate-gradient terms keep the compare-based
    s0/s1 taps so dpy/dpx at exactly-integer coordinates stay identical to
    grid_sample's floor-based subgradient (offsets are zero at init, which
    lands every coordinate on an integer — the one place it matters).
    """
    feat_t = feat_ref[0, 0]            # [CgWin, Hin]
    tile = py_ref.shape[-1]
    wincg = w_in * cg

    o_idx = pl.program_id(2)

    @pl.when(o_idx == 0)
    def _init():
        dfeat_ref[0, 0] = jnp.zeros_like(dfeat_ref[0, 0])

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (h_in, tile), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (w_in, tile), 0)

    if tent:
        # Mosaic's iota is integer-only; build i32 and convert once
        fiota_u = jax.lax.broadcasted_iota(
            jnp.int32, (h_in, tile), 0).astype(acc_dtype)
        fiota_v = jax.lax.broadcasted_iota(
            jnp.int32, (w_in, tile), 0).astype(acc_dtype)

        def build(p, _):
            py = py_ref[0, 0, p][None, :].astype(acc_dtype)
            px = px_ref[0, 0, p][None, :].astype(acc_dtype)
            m = m_ref[0, 0, p][None, :].astype(acc_dtype)
            row_t = jnp.maximum(1.0 - jnp.abs(fiota_u - py), 0.0)
            row_scr[:, pl.dslice(p * tile, tile)] = (
                row_t * m).astype(row_scr.dtype)
            col_scr[:, pl.dslice(p * tile, tile)] = jnp.maximum(
                1.0 - jnp.abs(fiota_v - px), 0.0).astype(col_scr.dtype)
            return 0
    else:
        def build(p, _):
            py = py_ref[0, 0, p][None, :]
            px = px_ref[0, 0, p][None, :]
            m = m_ref[0, 0, p][None, :]
            y0f = jnp.floor(py)
            fy = (py - y0f).astype(acc_dtype)
            y0 = y0f.astype(jnp.int32)
            row_t = ((iota_u == y0).astype(acc_dtype) * (1.0 - fy)
                     + (iota_u == y0 + 1).astype(acc_dtype) * fy)
            row_scr[:, pl.dslice(p * tile, tile)] = (
                row_t * m.astype(acc_dtype)).astype(row_scr.dtype)
            x0f = jnp.floor(px)
            fx = (px - x0f).astype(acc_dtype)
            x0 = x0f.astype(jnp.int32)
            col_scr[:, pl.dslice(p * tile, tile)] = (
                (iota_v == x0).astype(acc_dtype) * (1.0 - fx)
                + (iota_v == x0 + 1).astype(acc_dtype) * fx
            ).astype(col_scr.dtype)
            return 0

    jax.lax.fori_loop(0, num_points, build, 0)

    # upstream gradient expanded to the (c, v) lattice, tiled per point.
    # Every [CgWin, P*tile] intermediate lives in the FEATURE dtype (bf16
    # under the flagship recipe, f32 in the CPU parity tests): halves the
    # dominant VMEM/VPU traffic, doubles the token tile the VMEM budget
    # admits, and keeps the two large contractions in the MXU's native
    # bf16-operand + f32-accumulate mode (an f32xf32 matmul costs several
    # MXU passes).  Gradient precision matches every other bf16-backward
    # matmul in the model.
    lo = feat_t.dtype
    dout = dout_ref[0, 0].astype(acc_dtype)           # [Cg, tile]
    d_t = jax.lax.dot_general(
        sel_ref[:, :].astype(acc_dtype), dout,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype).astype(lo)  # [CgWin, tile]
    d_rep = pltpu.repeat(d_t, num_points, axis=1)     # [CgWin, P*tile]

    cexp_all = pltpu.repeat(col_scr[:, :], cg, axis=0)
    g_all = jnp.dot(feat_t, row_scr[:, :],
                    preferred_element_type=acc_dtype).astype(lo)

    dg_all = d_rep * cexp_all
    dcexp_all = d_rep * g_all

    # feature gradient: dF += dg_all @ row_all^T (K = P*tile — efficient)
    dfeat_ref[0, 0] = dfeat_ref[0, 0] + jax.lax.dot_general(
        dg_all, row_scr[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype).astype(dfeat_ref.dtype)

    # row gradients for every point in one matmul: [Hin, P*tile]
    drow_all = jax.lax.dot_general(
        feat_t, dg_all,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)

    # col gradients: sum dcexp over the cg channel blocks (rows j=c*Win+v)
    dcol_all = dcexp_all[:w_in, :].astype(acc_dtype)
    for k in range(1, cg):
        dcol_all = dcol_all + dcexp_all[k * w_in:(k + 1) * w_in, :]

    for p in range(num_points):  # static (P small); value slices need it
        py = py_ref[0, 0, p][None, :]
        px = px_ref[0, 0, p][None, :]
        m = m_ref[0, 0, p][None, :].astype(acc_dtype)
        y0 = jnp.floor(py).astype(jnp.int32)
        s0 = (iota_u == y0).astype(acc_dtype)
        s1 = (iota_u == y0 + 1).astype(acc_dtype)
        fy = (py - jnp.floor(py)).astype(acc_dtype)
        row_u = s0 * (1.0 - fy) + s1 * fy
        drow = drow_all[:, p * tile:(p + 1) * tile]
        dm_ref[0, 0, p] = jnp.sum(drow * row_u, axis=0).astype(dm_ref.dtype)
        dpy_ref[0, 0, p] = (m[0] * jnp.sum(drow * (s1 - s0), axis=0)
                            ).astype(dpy_ref.dtype)
        x0 = jnp.floor(px).astype(jnp.int32)
        t0 = (iota_v == x0).astype(acc_dtype)
        t1 = (iota_v == x0 + 1).astype(acc_dtype)
        dcol = dcol_all[:, p * tile:(p + 1) * tile]
        dpx_ref[0, 0, p] = jnp.sum(dcol * (t1 - t0), axis=0).astype(
            dpx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "h_in", "w_in", "group",
                     "group_channels", "tent"),
)
def dcnv3_sample_pallas_t5_bwd(feat, py, px, mask, dout, *, num_points,
                               h_in, w_in, group, group_channels,
                               tent=True):
    """Backward of ``dcnv3_sample_pallas_t5``.  Same I/O contract as the
    v2 backward: feat [N,G,Hin,Win*Cg] (v-major caller layout),
    dout [N,G,Cg,HoWo]; returns (dfeat in caller layout, dpy, dpx, dmask).
    """
    n, g = feat.shape[0], feat.shape[1]
    hw_out = py.shape[-1]
    cg = group_channels
    wincg = w_in * cg

    budget = 13 * 1024 * 1024
    tile = hw_out

    def vmem(t):
        # row/col scratch + ~5 live [CgWin, P*t] intermediates, all in the
        # feature dtype (see the kernel)
        it = feat.dtype.itemsize
        return (2 * h_in * num_points * t * it
                + 5 * wincg * num_points * t * it)

    while vmem(tile) > budget and tile % 2 == 0:
        tile //= 2
    n_tiles = hw_out // tile

    feat_cv = feat.reshape(n, g, h_in, w_in, cg)
    feat_t = jnp.transpose(feat_cv, (0, 1, 4, 3, 2)).reshape(
        n, g, wincg, h_in)
    sel = np.zeros((cg, wincg), np.float32)
    sel[np.arange(wincg) // w_in, np.arange(wincg)] = 1.0
    sel = jnp.asarray(sel, feat.dtype)

    kernel = functools.partial(
        _sampling_kernel_t5_bwd, num_points=num_points, h_in=h_in,
        w_in=w_in, cg=cg, acc_dtype=jnp.float32, tent=tent)

    coord_spec = pl.BlockSpec((1, 1, num_points, tile),
                              lambda i, j, o: (i, j, 0, o),
                              memory_space=pltpu.VMEM)
    dfeat_t, dpy, dpx, dm = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, g, wincg, h_in), jnp.float32),
            jax.ShapeDtypeStruct((n, g, num_points, hw_out), jnp.float32),
            jax.ShapeDtypeStruct((n, g, num_points, hw_out), jnp.float32),
            jax.ShapeDtypeStruct((n, g, num_points, hw_out), jnp.float32),
        ),
        grid=(n, g, n_tiles),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, wincg, h_in), lambda i, j, o: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cg, wincg), lambda i, j, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cg, tile), lambda i, j, o: (i, j, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, wincg, h_in), lambda i, j, o: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((h_in, num_points * tile), feat.dtype),
            pltpu.VMEM((w_in, num_points * tile), feat.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * g * num_points * hw_out * h_in * wincg,
            bytes_accessed=feat.size * 4 + py.size * 4 * 6,
            transcendentals=0,
        ),
    )(py, px, mask, feat_t, sel, dout)

    # rows j = c*Win + v back to the caller's [Hin, Win*Cg] (v-major)
    dfeat = jnp.transpose(
        dfeat_t.reshape(n, g, cg, w_in, h_in),
        (0, 1, 4, 3, 2)).reshape(n, g, h_in, wincg).astype(feat.dtype)
    return dfeat, dpy, dpx, dm


# ---------------------------------------------------------------------------
# Backward kernel (training): gradients of the transposed-layout sampler.
# All terms are the same selector builds + MXU contractions as the forward:
#   dT    = Sel^T dOut                      (channel -> (v,c) expansion)
#   dG_p  = dT ⊙ Cexp_p ;  dCexp_p = dT ⊙ G_p (G_p recomputed, one matmul)
#   dF   += dG_p row_p^T                    (feature gradient, accumulated)
#   drow  = F^T dG_p ;  dcol = Expand^T dCexp_p
#   dm_p  = Σ_u drow ⊙ row_unmasked ;  dpy_p = m·Σ_u drow ⊙ (s1 - s0)
#   dpx_p = Σ_v dcol ⊙ (t1 - t0)
# (floor() taps carry no gradient — identical to grid_sample / the XLA
# formulation's autodiff.)
# ---------------------------------------------------------------------------


def _sampling_kernel_t_bwd(py_ref, px_ref, m_ref, feat_ref, expand_ref,
                           sel_ref, dout_ref, dfeat_ref, dpy_ref, dpx_ref,
                           dm_ref, *, num_points: int, h_in: int, w_in: int,
                           cg: int, acc_dtype):
    feat_t = feat_ref[0, 0]            # [WinCg, Hin]
    hw_t = py_ref.shape[-1]            # tile size
    wincg = w_in * cg

    o_idx = pl.program_id(2)

    @pl.when(o_idx == 0)
    def _init():
        dfeat_ref[0, 0] = jnp.zeros_like(dfeat_ref[0, 0])

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (h_in, hw_t), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (w_in, hw_t), 0)

    dout = dout_ref[0, 0].astype(acc_dtype)      # [Cg, tile]
    d_t = jax.lax.dot_general(
        sel_ref[:, :].astype(acc_dtype), dout,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)        # [WinCg, tile]

    def point_body(p, dfeat_acc):
        py = py_ref[0, 0, p][None, :]
        px = px_ref[0, 0, p][None, :]
        m = m_ref[0, 0, p][None, :].astype(acc_dtype)

        y0f = jnp.floor(py)
        fy = (py - y0f).astype(acc_dtype)
        y0 = y0f.astype(jnp.int32)
        s0 = (iota_u == y0).astype(acc_dtype)
        s1 = (iota_u == y0 + 1).astype(acc_dtype)
        row_u = s0 * (1.0 - fy) + s1 * fy        # unmasked [Hin, tile]
        row_t = row_u * m

        x0f = jnp.floor(px)
        fx = (px - x0f).astype(acc_dtype)
        x0 = x0f.astype(jnp.int32)
        t0 = (iota_v == x0).astype(acc_dtype)
        t1 = (iota_v == x0 + 1).astype(acc_dtype)
        col_t = t0 * (1.0 - fx) + t1 * fx        # [Win, tile]
        cexp_t = jnp.dot(expand_ref[:, :].astype(acc_dtype), col_t,
                         preferred_element_type=acc_dtype)  # [WinCg, tile]

        g_t = jnp.dot(feat_t, row_t.astype(feat_t.dtype),
                      preferred_element_type=acc_dtype)     # [WinCg, tile]

        dg = d_t * cexp_t
        dcexp = d_t * g_t

        # feature grad: [WinCg, Hin]
        dfeat_acc = dfeat_acc + jax.lax.dot_general(
            dg, row_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype)

        # row grad: [Hin, tile]
        drow = jax.lax.dot_general(
            feat_t.astype(acc_dtype), dg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        dm_ref[0, 0, p] = jnp.sum(drow * row_u, axis=0).astype(
            dm_ref.dtype)
        dpy_ref[0, 0, p] = (m[0] * jnp.sum(drow * (s1 - s0), axis=0)
                            ).astype(dpy_ref.dtype)

        # col grad: [Win, tile]
        dcol = jax.lax.dot_general(
            expand_ref[:, :].astype(acc_dtype), dcexp,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        dpx_ref[0, 0, p] = jnp.sum(dcol * (t1 - t0), axis=0).astype(
            dpx_ref.dtype)
        return dfeat_acc

    dfeat = jax.lax.fori_loop(
        0, num_points, point_body,
        jnp.zeros((wincg, h_in), acc_dtype))
    dfeat_ref[0, 0] = dfeat_ref[0, 0] + dfeat.astype(dfeat_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "h_in", "w_in", "group",
                     "group_channels"),
)
def dcnv3_sample_pallas_t_bwd(feat, py, px, mask, dout, *, num_points,
                              h_in, w_in, group, group_channels):
    """Backward of ``dcnv3_sample_pallas_t``.

    dout: [N, G, Cg, HoWo].  Returns (dfeat [N,G,Hin,WinCg] — caller
    layout, dpy, dpx, dmask [N,G,P,HoWo])."""
    n, g = feat.shape[0], feat.shape[1]
    hw_out = py.shape[-1]
    cg = group_channels
    wincg = w_in * cg

    budget = 6 * 1024 * 1024
    tile = hw_out
    while 5 * wincg * 4 * tile > budget and tile % 2 == 0:
        tile //= 2
    n_tiles = hw_out // tile

    feat_t = jnp.swapaxes(feat, -1, -2)

    expand = np.zeros((wincg, w_in), np.float32)
    expand[np.arange(wincg), np.arange(wincg) // cg] = 1.0
    expand = jnp.asarray(expand, feat.dtype)
    sel = np.zeros((cg, wincg), np.float32)
    sel[np.arange(wincg) % cg, np.arange(wincg)] = 1.0
    sel = jnp.asarray(sel, feat.dtype)

    kernel = functools.partial(
        _sampling_kernel_t_bwd, num_points=num_points, h_in=h_in,
        w_in=w_in, cg=cg, acc_dtype=jnp.float32)

    coord_spec = pl.BlockSpec((1, 1, num_points, tile),
                              lambda i, j, o: (i, j, 0, o),
                              memory_space=pltpu.VMEM)
    dfeat_t, dpy, dpx, dm = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, g, wincg, h_in), jnp.float32),
            jax.ShapeDtypeStruct((n, g, num_points, hw_out), jnp.float32),
            jax.ShapeDtypeStruct((n, g, num_points, hw_out), jnp.float32),
            jax.ShapeDtypeStruct((n, g, num_points, hw_out), jnp.float32),
        ),
        grid=(n, g, n_tiles),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, wincg, h_in), lambda i, j, o: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wincg, w_in), lambda i, j, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cg, wincg), lambda i, j, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cg, tile), lambda i, j, o: (i, j, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, wincg, h_in), lambda i, j, o: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * g * num_points * hw_out * h_in * wincg,
            bytes_accessed=feat.size * 4 + py.size * 4 * 6,
            transcendentals=0,
        ),
    )(py, px, mask, feat_t, expand, sel, dout)

    dfeat = jnp.swapaxes(dfeat_t, -1, -2).astype(feat.dtype)
    return dfeat, dpy, dpx, dm
