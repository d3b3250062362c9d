"""Temporal BatchNorm variants — equivalents of the vendored SpikingJelly
``layer.py`` containers (SeqToANNContainer :827 == our fold_t/unfold_t) and
temporal-effective BN (TEBN :1226-1352) / threshold-dependent BN (TDBN).
"""
from __future__ import annotations

import jax
from flax import linen as nn

from .layers import BatchNorm


class TEBN(nn.Module):
    """Temporal Effective BatchNorm: shared BN over (T*B) statistics plus a
    learned per-timestep affine rescale."""

    T: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: [T, B, ..., C]."""
        t = x.shape[0]
        xf = x.reshape((-1,) + x.shape[2:])
        xf = BatchNorm(use_running_average=not train)(xf)
        y = xf.reshape(x.shape)
        p = self.param("temporal_scale", nn.initializers.ones,
                       (self.T,) + (1,) * (x.ndim - 1))
        return y * p[:t]


class TDBN(nn.Module):
    """Threshold-dependent BN: BN scaled by ``alpha * v_threshold``
    so pre-activations land in the neuron's sensitive range."""

    v_threshold: float = 1.0
    alpha: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        t = x.shape[0]
        xf = x.reshape((-1,) + x.shape[2:])
        xf = BatchNorm(use_running_average=not train)(xf)
        return xf.reshape(x.shape) * (self.alpha * self.v_threshold)
