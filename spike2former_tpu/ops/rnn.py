"""Spiking recurrent cells (LSTM / GRU / vanilla) as ``lax.scan`` loops.

Reference: Qtrick_architecture/clock_driven/rnn.py —
``SpikingLSTMCell`` (:496-701: gates from one fused ih+hh linear, i/f/o
spiked by surrogate-1, g by surrogate-2, ``c = c·f + i·g``, ``h = c·o``),
``SpikingGRUCell`` (:848-881: spiked r/z gates, candidate
``n = sg2(y_ih + r·y_hh)``, ``h = (1-z)·n + z·h``) and
``SpikingVanillaRNNCell`` (:817-833).  The default surrogate is Erf, as
upstream.

TPU-native: cells are pure functions ``(carry, x) -> (carry, h)`` run
under ``lax.scan`` over the leading T axis (state stays on-chip across
steps; BPTT falls out of autodiff), with flax modules owning the fused
gate projections.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .neuron import SURROGATES


def _sg(surrogate: str | Callable) -> Callable:
    return SURROGATES[surrogate] if isinstance(surrogate, str) else surrogate


def spiking_lstm_cell(gates: jax.Array, h: jax.Array, c: jax.Array,
                      surrogate1="erf", surrogate2=None):
    """One LSTM step from pre-activation ``gates`` [..., 4H] (already
    ``linear_ih(x) + linear_hh(h)``).  Returns (h, c)."""
    sg1 = _sg(surrogate1)
    sg2 = sg1 if surrogate2 is None else _sg(surrogate2)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = sg1(i), sg1(f), sg1(o)
    g = sg2(g)
    c = c * f + i * g
    h = c * o
    return h, c


class SpikingLSTM(nn.Module):
    """Multi-step spiking LSTM over ``x_seq`` [T, B, input_size]."""

    hidden_size: int
    use_bias: bool = True
    surrogate1: str = "erf"
    surrogate2: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_seq: jax.Array, hc=None):
        ih = nn.Dense(4 * self.hidden_size, use_bias=self.use_bias,
                      dtype=self.dtype, name="linear_ih")
        # recurrent weights as plain params: flax submodule calls inside a
        # lax.scan body would leak tracers
        whh = self.param("hh_kernel", nn.initializers.lecun_normal(),
                         (self.hidden_size, 4 * self.hidden_size))
        bhh = (self.param("hh_bias", nn.initializers.zeros,
                          (4 * self.hidden_size,))
               if self.use_bias else 0.0)

        def hh(h):
            return h @ whh + bhh

        b = x_seq.shape[1]
        if hc is None:
            h0 = jnp.zeros((b, self.hidden_size), x_seq.dtype)
            c0 = jnp.zeros_like(h0)
        else:
            h0, c0 = hc

        x_proj = ih(x_seq)                    # [T, B, 4H] — one big matmul

        def step(carry, xp):
            h, c = carry
            h, c = spiking_lstm_cell(xp + hh(h), h, c,
                                     self.surrogate1, self.surrogate2)
            return (h, c), h

        (h, c), hs = jax.lax.scan(step, (h0, c0), x_proj)
        return hs, (h, c)


class SpikingGRU(nn.Module):
    """Multi-step spiking GRU over ``x_seq`` [T, B, input_size]."""

    hidden_size: int
    use_bias: bool = True
    surrogate1: str = "erf"
    surrogate2: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_seq: jax.Array, h=None):
        ih = nn.Dense(3 * self.hidden_size, use_bias=self.use_bias,
                      dtype=self.dtype, name="linear_ih")
        whh = self.param("hh_kernel", nn.initializers.lecun_normal(),
                         (self.hidden_size, 3 * self.hidden_size))
        bhh = (self.param("hh_bias", nn.initializers.zeros,
                          (3 * self.hidden_size,))
               if self.use_bias else 0.0)

        def hh(h):
            return h @ whh + bhh

        sg1 = _sg(self.surrogate1)
        sg2 = sg1 if self.surrogate2 is None else _sg(self.surrogate2)
        b = x_seq.shape[1]
        if h is None:
            h = jnp.zeros((b, self.hidden_size), x_seq.dtype)

        x_proj = ih(x_seq)

        def step(h, xp):
            y_ih = jnp.split(xp, 3, axis=-1)
            y_hh = jnp.split(hh(h), 3, axis=-1)
            r = sg1(y_ih[0] + y_hh[0])
            z = sg1(y_ih[1] + y_hh[1])
            n = sg2(y_ih[2] + r * y_hh[2])
            h = (1.0 - z) * n + z * h
            return h, h

        h, hs = jax.lax.scan(step, h, x_proj)
        return hs, h


class SpikingVanillaRNN(nn.Module):
    """Multi-step spiking vanilla RNN: ``h = sg(W_ih x + W_hh h)``."""

    hidden_size: int
    use_bias: bool = True
    surrogate: str = "erf"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_seq: jax.Array, h=None):
        ih = nn.Dense(self.hidden_size, use_bias=self.use_bias,
                      dtype=self.dtype, name="linear_ih")
        whh = self.param("hh_kernel", nn.initializers.lecun_normal(),
                         (self.hidden_size, self.hidden_size))
        bhh = (self.param("hh_bias", nn.initializers.zeros,
                          (self.hidden_size,))
               if self.use_bias else 0.0)

        def hh(h):
            return h @ whh + bhh

        sg = _sg(self.surrogate)
        b = x_seq.shape[1]
        if h is None:
            h = jnp.zeros((b, self.hidden_size), x_seq.dtype)

        x_proj = ih(x_seq)

        def step(h, xp):
            h = sg(xp + hh(h))
            return h, h

        h, hs = jax.lax.scan(step, h, x_proj)
        return hs, h
