"""Normalized integer spike (quantized activation) primitives.

These are the TPU-native equivalents of the reference's spiking-neuron
substrate (BICLab/Spike2Former):

- ``quant_ste(x, D)``  — forward ``round(clamp(x, 0, D))``, straight-through
  gradient masked to ``0 <= x <= D``.  Matches the torch autograd functions
  ``Quant`` (Segmentation/mmseg/models/utils/Qtrick.py:8-24, D=4) and
  ``quant`` (Segmentation/Qtrick_architecture/clock_driven/surrogate.py:522-538,
  D=8).
- ``qspike(x)``        — the ``Q_IFNode(surrogate_function=Quant())`` fast
  path: with membrane voltage reset to 0 before every forward (the reference's
  ``ResetModelHook`` guarantees this), ``Q_IFNode.forward`` collapses to
  ``round(clamp(x, 0, 8)) / 8``
  (Qtrick_architecture/clock_driven/neuron.py:395-550,197).
- ``multispike_norm(x)`` — SDTv3's stateless neuron ``round(clamp(x,0,4))/4``
  (mmseg/models/utils/Qtrick.py:27-38).
- ``multispike4(x)``   — the unnormalized ``MultiSpike_4`` variant
  (mmdet/models/utils/Qtrick.py:27-53).

All are pure functions of their input — the membrane state ``v`` of the
reference's Q_IFNode is a dead value across forwards (always reset), so on TPU
the temporal loop over T carries no neuron state between calls and these ops
jit/fuse into the surrounding matmuls/convs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def quant_ste(x: jax.Array, d: float = 8.0, lo: float = 0.0) -> jax.Array:
    """``round(clamp(x, lo, d))`` with straight-through gradients.

    Gradient is the identity inside ``[lo, d]`` and zero outside, exactly
    matching the reference autograd (boundary values pass gradient).
    """
    return jnp.round(jnp.clip(x, lo, d))


def _quant_ste_fwd(x, d, lo):
    return quant_ste(x, d, lo), x


def _quant_ste_bwd(d, lo, x, g):
    mask = (x >= lo) & (x <= d)
    return (jnp.where(mask, g, jnp.zeros_like(g)),)


quant_ste.defvjp(_quant_ste_fwd, _quant_ste_bwd)


def qspike(x: jax.Array) -> jax.Array:
    """Q_IFNode with Quant surrogate: ``round(clamp(x, 0, 8)) / 8``.

    Output values lie in {0, 1/8, ..., 1}. This is the neuron used ~60x in
    the SDTv2 backbone, the pixel decoder and the transformer decoder.
    """
    return quant_ste(x, 8.0) * 0.125


def multispike_norm(x: jax.Array) -> jax.Array:
    """SDTv3 stateless neuron: ``round(clamp(x, 0, 4)) / 4``."""
    return quant_ste(x, 4.0) * 0.25


def multispike4(x: jax.Array) -> jax.Array:
    """Unnormalized 4-level quantization: ``round(clamp(x, 0, 4))``."""
    return quant_ste(x, 4.0)


@jax.custom_vjp
def multispike8(x: jax.Array) -> jax.Array:
    """sdtv3MAE's ``Multispike``: ``floor(clamp(x, 0, 8) + 0.5) / 8`` —
    round-HALF-UP (not banker's rounding) with an STE gradient gated to the
    OPEN interval 0 < x < 8 (mmseg/models/backbones/sdtv3MAE.py:136-160)."""
    return jnp.floor(jnp.clip(x, 0.0, 8.0) + 0.5) * 0.125


def _ms8_fwd(x):
    return multispike8(x), x


def _ms8_bwd(x, g):
    mask = (x > 0.0) & (x < 8.0)
    return (jnp.where(mask, g, jnp.zeros_like(g)),)


multispike8.defvjp(_ms8_fwd, _ms8_bwd)


def spike_rate(y: jax.Array, d: float) -> jax.Array:
    """Firing-rate statistic of a spike-site output ``y``.

    The reference accumulates ``output.mean() * quant`` per spike site
    (tools/cal_firing_num.py:140-160); ``y`` here is the normalized output,
    ``d`` its quantization level.
    """
    return jnp.mean(y.astype(jnp.float32)) * d
