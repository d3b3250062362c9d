"""Spike-aware conv/linear with packed low-bit activation residuals.

TPU-native equivalent of the reference's ``spike_op.py``
(Segmentation/Qtrick_architecture/clock_driven/spike_op.py:79-506):
there, ``spikeConvolution``/``spikeLinear`` exploit the fact that their
input is a SPIKE tensor by caching it as 1-bit via ``tensor_cache`` and
calling cuDNN's backward kernels directly, cutting BPTT activation
memory.

The Qtrick architecture's spike sites emit *graded* spikes with at most
9 distinct values (``round(clamp(x,0,D))/D``, D ∈ {4, 8} — ops/spike.py),
so the exact activation fits a 4-bit integer code.  ``spike_conv`` /
``spike_linear`` are drop-in ``lax.conv_general_dilated`` / ``@`` with a
``jax.custom_vjp`` whose saved residual is the code packed two-per-byte
(4x smaller than a bf16 activation, 8x smaller than f32).  The backward
unpacks and re-runs XLA's own transposed convolutions, so gradients are
BIT-IDENTICAL to the uncompressed op (``k/D`` with k ≤ 8 is exact in
every float dtype).

Unlike the reference there is no raw-kernel plumbing: XLA already owns
the best conv kernels for the MXU; the only thing worth owning is WHAT
gets saved between forward and backward.

Wiring: :func:`packed_conv_fn` returns a function with the signature
flax's ``nn.Conv(conv_general_dilated=...)`` expects, so models swap it
in WITHOUT changing the parameter tree (checkpoints/converters see the
same ``Conv_N`` modules).  The model-wide switch is
:func:`enable_packed_residuals` — a process-level knob read at trace
time (set it before building/jitting a train step; flipping it does not
invalidate already-compiled functions).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "pack_codes", "unpack_codes", "spike_conv", "spike_linear",
    "packed_conv_fn", "enable_packed_residuals", "packed_enabled",
]

_PACKED_ENABLED = False


def enable_packed_residuals(enabled: bool = True) -> None:
    """Process-wide switch for packed spike residuals at Spike→Conv sites.

    Read at TRACE time by the model layers; call before building the
    train step.  Forward/gradients are bit-identical either way — the
    switch only changes what autodiff saves between forward and
    backward (packed uint8 codes vs the float activation).
    """
    global _PACKED_ENABLED
    _PACKED_ENABLED = bool(enabled)


def packed_enabled() -> bool:
    return _PACKED_ENABLED


def pack_codes(k: jax.Array) -> jax.Array:
    """Pack integer codes (values 0..15) two-per-byte.

    k: any-shape uint8/int array with values < 16.  Returns a flat uint8
    array of ``ceil(size/2)`` bytes (low nibble = first half of the flat
    array, high nibble = second half).  Half-split pairing, NOT adjacent
    pairing: an adjacent scheme needs a [N/2, 2] view, whose pair axis
    lands in the TPU's 128-lane dimension and pads 64x (measured: a
    bf16[67M, 2] temp padded to 16 GB OOM'd the B=16 packed-residuals
    train step).  Here every intermediate stays 1-D.
    """
    flat = k.reshape(-1).astype(jnp.uint8)
    n = flat.shape[0]
    if n % 2:
        flat = jnp.concatenate([flat, jnp.zeros((1,), jnp.uint8)])
    half = flat.shape[0] // 2
    return flat[:half] | (flat[half:] << 4)


def unpack_codes(packed: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Inverse of :func:`pack_codes` for a target ``shape``."""
    flat = jnp.concatenate([packed & 0xF, packed >> 4])
    return flat[: math.prod(shape)].reshape(shape)


def _conv(y, w, *, strides, padding, lhs_dilation, rhs_dilation, dn,
          feature_group_count, precision):
    return lax.conv_general_dilated(
        y, w, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dn, feature_group_count=feature_group_count,
        precision=precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(2, 11)))
def _spike_conv_p(y, w, code_scale, strides, padding, lhs_dilation,
                  rhs_dilation, dn, feature_group_count, precision,
                  y_meta):
    return _conv(y, w, strides=strides, padding=padding,
                 lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
                 dn=dn, feature_group_count=feature_group_count,
                 precision=precision)


def _spike_conv_fwd(y, w, code_scale, strides, padding, lhs_dilation,
                    rhs_dilation, dn, feature_group_count, precision,
                    y_meta):
    out = _conv(y, w, strides=strides, padding=padding,
                lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
                dn=dn, feature_group_count=feature_group_count,
                precision=precision)
    k = jnp.round(y.astype(jnp.float32) * code_scale).astype(jnp.uint8)
    return out, (pack_codes(k), w)


def _spike_conv_bwd(code_scale, strides, padding, lhs_dilation,
                    rhs_dilation, dn, feature_group_count, precision,
                    y_meta, res, g):
    packed, w = res
    y_shape, y_dtype = y_meta
    k = unpack_codes(packed, y_shape)
    # k / code_scale with k <= 15 is exact in bf16/f16/f32
    y = (k.astype(jnp.float32) * (1.0 / code_scale)).astype(
        jnp.dtype(y_dtype))
    _, vjp = jax.vjp(
        lambda yy, ww: _conv(
            yy, ww, strides=strides, padding=padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation, dn=dn,
            feature_group_count=feature_group_count, precision=precision),
        y, w)
    return vjp(g)


_spike_conv_p.defvjp(_spike_conv_fwd, _spike_conv_bwd)


def _hashable_padding(padding):
    if isinstance(padding, (list, tuple)) and not isinstance(padding, str):
        return tuple(tuple(p) for p in padding)
    return padding


def spike_conv(y: jax.Array, w: jax.Array, code_scale: float = 8.0,
               strides=(1, 1), padding="SAME", *,
               lhs_dilation=None, rhs_dilation=None,
               dimension_numbers=("NHWC", "HWIO", "NHWC"),
               feature_group_count: int = 1, precision=None) -> jax.Array:
    """Convolution of a graded-spike activation with packed residuals.

    y: spike output with values ``k / code_scale``, k integer in 0..15
       (qspike: code_scale=8; multispike_norm: 4; unnormalized
       multispike4: 1).
    Forward/backward are numerically identical to
    ``lax.conv_general_dilated``; only the autodiff residual differs
    (packed 4-bit codes instead of the float activation).
    """
    dn = lax.conv_dimension_numbers(y.shape, w.shape, dimension_numbers)
    return _spike_conv_p(
        y, w, float(code_scale), tuple(strides),
        _hashable_padding(padding),
        None if lhs_dilation is None else tuple(lhs_dilation),
        None if rhs_dilation is None else tuple(rhs_dilation),
        dn, feature_group_count, precision,
        (tuple(y.shape), jnp.dtype(y.dtype).name))


def packed_conv_fn(code_scale: float):
    """A ``lax.conv_general_dilated`` stand-in for flax's
    ``nn.Conv(conv_general_dilated=...)`` hook, saving packed residuals.

    The returned callable matches the exact call flax makes
    (flax/linen/linear.py:700-710).
    """

    def conv_general_dilated(lhs, rhs, window_strides=None, padding=None,
                             lhs_dilation=None, rhs_dilation=None,
                             dimension_numbers=None,
                             feature_group_count=1, precision=None):
        if isinstance(lhs, jax.core.ShapedArray) or not isinstance(
                lhs, jax.Array):
            # flax probes output shapes via eval_shape with abstract args
            return lax.conv_general_dilated(
                lhs, rhs, window_strides, padding,
                lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
                dimension_numbers=dimension_numbers,
                feature_group_count=feature_group_count,
                precision=precision)
        return spike_conv(
            lhs, rhs, code_scale, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision)

    return conv_general_dilated


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _spike_linear_p(y, w, code_scale, y_meta):
    return jnp.matmul(y, w)


def _spike_linear_fwd(y, w, code_scale, y_meta):
    k = jnp.round(y.astype(jnp.float32) * code_scale).astype(jnp.uint8)
    return jnp.matmul(y, w), (pack_codes(k), w)


def _spike_linear_bwd(code_scale, y_meta, res, g):
    packed, w = res
    y_shape, y_dtype = y_meta
    k = unpack_codes(packed, y_shape)
    y = (k.astype(jnp.float32) * (1.0 / code_scale)).astype(
        jnp.dtype(y_dtype))
    dy = jnp.matmul(g, w.T).astype(y.dtype)
    dw = jnp.matmul(
        y.reshape(-1, y.shape[-1]).T, g.reshape(-1, g.shape[-1])
    ).astype(w.dtype)
    return dy, dw


_spike_linear_p.defvjp(_spike_linear_fwd, _spike_linear_bwd)


def spike_linear(y: jax.Array, w: jax.Array,
                 code_scale: float = 8.0) -> jax.Array:
    """``y @ w`` for a graded-spike ``y`` with a packed 4-bit residual.

    y: [..., K] spikes (values k/code_scale), w: [K, M].
    """
    return _spike_linear_p(y, w, float(code_scale),
                           (tuple(y.shape), jnp.dtype(y.dtype).name))
