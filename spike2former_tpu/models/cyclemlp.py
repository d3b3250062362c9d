"""CycleMLP token mixer.

Reference: mmdet/models/layers/transformer/mmcv_spike/CycleMLP.py —
``CycleFC`` (:54-131): a 1x1 "FC" whose input channels are first shifted
along ONE spatial axis by the fixed staircase pattern
``s_i = (i + K//2) % K - K//2`` (realized there via torchvision
``deform_conv2d`` with constant integer offsets and zero padding);
``CycleMLP`` (:147-175): h/w staircase branches + a channel MLP branch,
fused by a softmax reweighting MLP; ``CycleBlock`` (:177-197):
pre-LN residual block.

TPU-native: the constant integer per-channel offsets make the deform op a
sum of K zero-filled shifts gated by channel masks — static slices and
elementwise math, no gather — followed by a dense 1x1 contraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _shift_zero(x: jax.Array, s: int, axis: int) -> jax.Array:
    """Shift by s along axis, filling with zeros (deform_conv2d's
    zero-padding semantics): out[w] = x[w + s]."""
    if s == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if s > 0:
        pad[axis] = (0, s)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(s, s + n)
    else:
        pad[axis] = (-s, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
    return jnp.pad(x, pad)[tuple(sl)]


class CycleFC(nn.Module):
    """Staircase FC: per-channel shift along one axis + 1x1 projection.

    ``kernel_size`` is (1, K) for a horizontal staircase or (K, 1) for a
    vertical one (CycleFC.gen_offset, CycleMLP.py:106-122).
    """

    features: int
    kernel_size: tuple[int, int] = (1, 3)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [..., H, W, C] → [..., H, W, features]."""
        kh, kw = self.kernel_size
        assert kh == 1 or kw == 1, self.kernel_size
        k = kh * kw
        axis = x.ndim - 2 if kh == 1 else x.ndim - 3  # W or H
        c = x.shape[-1]
        start = k // 2

        ch = np.arange(c)
        shifts = (ch + start) % k - k // 2  # per-channel offset
        shifted = jnp.zeros_like(x)
        for s in range(-(k // 2), k - k // 2):
            mask = jnp.asarray(shifts == s, x.dtype)
            shifted = shifted + _shift_zero(x, s, axis) * mask
        return nn.Dense(self.features, use_bias=self.use_bias,
                        dtype=self.dtype)(shifted)


class CycleMLP(nn.Module):
    """Three-branch staircase mixer with softmax reweighting
    (CycleMLP.py:147-175)."""

    dim: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, C]."""
        h = CycleFC(self.dim, (1, 3), dtype=self.dtype, name="sfc_h")(x)
        w = CycleFC(self.dim, (3, 1), dtype=self.dtype, name="sfc_w")(x)
        ch = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype,
                      name="mlp_c")(x)

        a = jnp.mean(h + w + ch, axis=(1, 2))            # [B, C]
        a = nn.Dense(self.dim // 4, dtype=self.dtype, name="re_fc1")(a)
        a = nn.gelu(a, approximate=False)
        a = nn.Dense(self.dim * 3, dtype=self.dtype, name="re_fc2")(a)
        a = jax.nn.softmax(a.reshape(-1, self.dim, 3), axis=-1)
        a = a[:, None, None]                             # [B,1,1,C,3]

        out = h * a[..., 0] + w * a[..., 1] + ch * a[..., 2]
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class CycleBlock(nn.Module):
    """Pre-LN residual block (CycleMLP.py:177-197, skip_lam scaling)."""

    dim: int
    mlp_ratio: float = 4.0
    skip_lam: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CycleMLP(self.dim, dtype=self.dtype,
                         name="attn")(y) / self.skip_lam
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y / self.skip_lam
