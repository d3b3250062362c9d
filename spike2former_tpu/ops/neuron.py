"""Stateful multi-step spiking neurons as fused ``lax.scan`` loops.

TPU-native equivalent of the vendored SpikingJelly neuron zoo
(Segmentation/Qtrick_architecture/clock_driven/neuron.py:237-1750) and its
CuPy fused multistep CUDA kernels (neuron_kernel.py).  On TPU the fused
"multi-step" forward+backward is simply a ``lax.scan`` over the leading T
axis — XLA keeps the membrane state in registers/VMEM across steps, so the
temporal loop never round-trips HBM, and autodiff through the scan yields the
same BPTT gradients the CuPy backward kernels implement by hand.

Surrogate gradients mirror the reference zoo
(Qtrick_architecture/clock_driven/surrogate.py): sigmoid, atan, and the
Quant/Quant4 straight-through functions.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .spike import quant_ste

# ---------------------------------------------------------------------------
# Surrogate spike functions: forward heaviside(v - v_th), custom backward.
# ---------------------------------------------------------------------------


def _heaviside(v):
    return (v >= 0.0).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def sigmoid_surrogate(v: jax.Array, alpha: float = 4.0) -> jax.Array:
    """Heaviside forward; sigmoid-derivative backward (surrogate.py Sigmoid)."""
    return _heaviside(v)


def _sig_fwd(v, alpha):
    return _heaviside(v), v


def _sig_bwd(alpha, v, g):
    s = jax.nn.sigmoid(alpha * v)
    return (g * alpha * s * (1.0 - s),)


sigmoid_surrogate.defvjp(_sig_fwd, _sig_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def atan_surrogate(v: jax.Array, alpha: float = 2.0) -> jax.Array:
    """Heaviside forward; arctan-derivative backward (surrogate.py ATan)."""
    return _heaviside(v)


def _atan_fwd(v, alpha):
    return _heaviside(v), v


def _atan_bwd(alpha, v, g):
    denom = 1.0 + (0.5 * jnp.pi * alpha * v) ** 2
    return (g * (alpha / 2.0) / denom,)


atan_surrogate.defvjp(_atan_fwd, _atan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def erf_surrogate(v: jax.Array, alpha: float = 2.0) -> jax.Array:
    """Heaviside forward; Gaussian backward (surrogate.py erf:1087-1103:
    g · exp(-(αv)²) · α/√π)."""
    return _heaviside(v)


def _erf_fwd(v, alpha):
    return _heaviside(v), v


def _erf_bwd(alpha, v, g):
    return (g * jnp.exp(-(alpha * v) ** 2) * (alpha / jnp.sqrt(jnp.pi)),)


erf_surrogate.defvjp(_erf_fwd, _erf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def soft_sign_surrogate(v: jax.Array, alpha: float = 2.0) -> jax.Array:
    """Heaviside forward; soft-sign backward (surrogate.py soft_sign:
    750-763: g / (2α(1/α + |v|)²))."""
    return _heaviside(v)


def _ss_fwd(v, alpha):
    return _heaviside(v), v


def _ss_bwd(alpha, v, g):
    return (g / (2.0 * alpha * (1.0 / alpha + jnp.abs(v)) ** 2),)


soft_sign_surrogate.defvjp(_ss_fwd, _ss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def piecewise_quadratic_surrogate(v: jax.Array,
                                  alpha: float = 1.0) -> jax.Array:
    """Heaviside forward; triangular backward (surrogate.py
    piecewise_quadratic:166-181: g·(α - α²|v|), zero for |v| > 1/α)."""
    return _heaviside(v)


def _pq_fwd(v, alpha):
    return _heaviside(v), v


def _pq_bwd(alpha, v, g):
    grad = g * (alpha - alpha * alpha * jnp.abs(v))
    return (jnp.where(jnp.abs(v) > 1.0 / alpha, 0.0, grad),)


piecewise_quadratic_surrogate.defvjp(_pq_fwd, _pq_bwd)


SURROGATES: dict[str, Callable] = {
    "sigmoid": sigmoid_surrogate,
    "atan": atan_surrogate,
    "erf": erf_surrogate,
    "soft_sign": soft_sign_surrogate,
    "piecewise_quadratic": piecewise_quadratic_surrogate,
}


class NeuronOutput(NamedTuple):
    spikes: jax.Array  # [T, ...] spike train
    v: jax.Array  # final membrane potential [...]


def _step(v, x, *, decay_fn, surrogate, v_threshold, v_reset, detach_reset):
    v = decay_fn(v, x)
    spike = surrogate(v - v_threshold)
    spike_d = jax.lax.stop_gradient(spike) if detach_reset else spike
    if v_reset is None:  # soft reset
        v = v - spike_d * v_threshold
    else:  # hard reset
        v = (1.0 - spike_d) * v + spike_d * v_reset
    return v, spike


def multistep_if(
    x_seq: jax.Array,
    v_threshold: float = 1.0,
    v_reset: float | None = 0.0,
    surrogate: str | Callable = "sigmoid",
    detach_reset: bool = False,
    v_init: jax.Array | None = None,
) -> NeuronOutput:
    """Multi-step IF neuron: ``V[t] = V[t-1] + X[t]`` then fire/reset.

    Equivalent to SpikingJelly ``MultiStepIFNode`` with the fused CUDA kernel
    (neuron_kernel.py MultiStepIFNodePTT), expressed as a scan over T.
    """
    sg = SURROGATES[surrogate] if isinstance(surrogate, str) else surrogate
    v0 = jnp.zeros(x_seq.shape[1:], x_seq.dtype) if v_init is None else v_init
    step = functools.partial(
        _step,
        decay_fn=lambda v, x: v + x,
        surrogate=sg,
        v_threshold=v_threshold,
        v_reset=v_reset,
        detach_reset=detach_reset,
    )
    v, spikes = jax.lax.scan(step, v0, x_seq)
    return NeuronOutput(spikes, v)


def multistep_lif(
    x_seq: jax.Array,
    tau: float = 2.0,
    v_threshold: float = 1.0,
    v_reset: float | None = 0.0,
    surrogate: str | Callable = "sigmoid",
    detach_reset: bool = False,
    decay_input: bool = True,
    v_init: jax.Array | None = None,
) -> NeuronOutput:
    """Multi-step LIF neuron.

    ``decay_input=True``:  ``V[t] = V[t-1] + (X[t] - (V[t-1] - v_rest)) / tau``
    ``decay_input=False``: ``V[t] = V[t-1] - (V[t-1] - v_rest) / tau + X[t]``
    with ``v_rest = v_reset or 0`` — matching SpikingJelly ``MultiStepLIFNode``.
    """
    sg = SURROGATES[surrogate] if isinstance(surrogate, str) else surrogate
    v_rest = 0.0 if v_reset is None else v_reset
    inv_tau = 1.0 / tau

    if decay_input:
        decay = lambda v, x: v + (x - (v - v_rest)) * inv_tau
    else:
        decay = lambda v, x: v - (v - v_rest) * inv_tau + x

    v0 = jnp.zeros(x_seq.shape[1:], x_seq.dtype) if v_init is None else v_init
    step = functools.partial(
        _step,
        decay_fn=decay,
        surrogate=sg,
        v_threshold=v_threshold,
        v_reset=v_reset,
        detach_reset=detach_reset,
    )
    v, spikes = jax.lax.scan(step, v0, x_seq)
    return NeuronOutput(spikes, v)


def multistep_plif(
    x_seq: jax.Array,
    w: jax.Array,
    v_threshold: float = 1.0,
    v_reset: float | None = 0.0,
    surrogate: str | Callable = "sigmoid",
    detach_reset: bool = False,
    v_init: jax.Array | None = None,
) -> NeuronOutput:
    """Parametric LIF: learnable time constant ``1/tau = sigmoid(w)``.

    Equivalent to SpikingJelly ``MultiStepParametricLIFNode``; ``w`` is a
    scalar parameter trained jointly with the network.
    """
    sg = SURROGATES[surrogate] if isinstance(surrogate, str) else surrogate
    v_rest = 0.0 if v_reset is None else v_reset
    inv_tau = jax.nn.sigmoid(w)

    v0 = jnp.zeros(x_seq.shape[1:], x_seq.dtype) if v_init is None else v_init
    step = functools.partial(
        _step,
        decay_fn=lambda v, x: v + (x - (v - v_rest)) * inv_tau,
        surrogate=sg,
        v_threshold=v_threshold,
        v_reset=v_reset,
        detach_reset=detach_reset,
    )
    v, spikes = jax.lax.scan(step, v0, x_seq)
    return NeuronOutput(spikes, v)


def multistep_eif(
    x_seq: jax.Array,
    tau: float = 2.0,
    delta_t: float = 1.0,
    theta_rh: float = 0.8,
    v_threshold: float = 1.0,
    v_reset: float | None = 0.0,
    surrogate: str | Callable = "sigmoid",
    detach_reset: bool = False,
    v_init: jax.Array | None = None,
) -> NeuronOutput:
    """Exponential integrate-and-fire neuron.

    Charge (neuron.py EIFNode:1422-1520):
    ``V[t] = V[t-1] + (X[t] + v_rest - V[t-1]
             + Δ_T · exp((V[t-1] - θ_rh)/Δ_T)) / τ``
    — the exponential term models the soft spike-initiation upstroke.
    Equivalent to SpikingJelly ``MultiStepEIFNode`` (:1523+) as a scan.
    """
    sg = SURROGATES[surrogate] if isinstance(surrogate, str) else surrogate
    v_rest = 0.0 if v_reset is None else v_reset
    inv_tau = 1.0 / tau

    def charge(v, x):
        return v + (x + v_rest - v
                    + delta_t * jnp.exp((v - theta_rh) / delta_t)) * inv_tau

    v0 = jnp.zeros(x_seq.shape[1:], x_seq.dtype) if v_init is None else v_init
    step = functools.partial(
        _step,
        decay_fn=charge,
        surrogate=sg,
        v_threshold=v_threshold,
        v_reset=v_reset,
        detach_reset=detach_reset,
    )
    v, spikes = jax.lax.scan(step, v0, x_seq)
    return NeuronOutput(spikes, v)


def multistep_qif(
    x_seq: jax.Array,
    v_init: jax.Array | None = None,
) -> NeuronOutput:
    """True multi-step Q_IFNode: IF charge, Quant(0..8) fire, soft reset, /8.

    When the membrane is reset before the sequence (the only mode the
    reference ever runs — ResetModelHook fires before every image) and the
    whole ``[T, ...]`` tensor is passed through the node in ONE call (as every
    call site in the reference does), this is equivalent to ``qspike`` applied
    elementwise.  This scan form exists for T-step recurrent semantics where
    the node is called once per step with carried state
    (neuron.py:459-461 ``neuronal_charge``; 131 fire; 153 soft reset; 197 /8).
    """

    def step(v, x):
        v = v + x
        spike = quant_ste(v, 8.0)
        v = v - spike  # soft reset with v_threshold == 1 applied per level
        return v, spike * 0.125

    v0 = jnp.zeros(x_seq.shape[1:], x_seq.dtype) if v_init is None else v_init
    v, spikes = jax.lax.scan(step, v0, x_seq)
    return NeuronOutput(spikes, v)
