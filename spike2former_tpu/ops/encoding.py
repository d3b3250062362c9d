"""Spike encoders — equivalents of the vendored SpikingJelly
``clock_driven/encoding.py`` (Poisson and latency encoders used to turn
static images into spike trains for event-free SNN pipelines)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def poisson_encode(x: jax.Array, t: int, rng: jax.Array) -> jax.Array:
    """Rate coding: P(spike at step) = x (x in [0, 1]).
    Returns [T, ...] binary spikes."""
    u = jax.random.uniform(rng, (t,) + x.shape)
    return (u < x).astype(jnp.float32)


def latency_encode(x: jax.Array, t: int) -> jax.Array:
    """Temporal coding: stronger inputs spike earlier.  Spike time
    ``round((1 - x) * (t - 1))``; one spike per element.
    Returns [T, ...] binary spikes."""
    step = jnp.round((1.0 - jnp.clip(x, 0.0, 1.0)) * (t - 1)).astype(
        jnp.int32)
    steps = jnp.arange(t).reshape((t,) + (1,) * x.ndim)
    return (steps == step[None]).astype(jnp.float32)


def repeat_encode(x: jax.Array, t: int) -> jax.Array:
    """Constant-current coding: the analog input repeated T times — the
    encoding Spike2Former itself uses (sdtv2.py:617 unsqueeze+repeat)."""
    return jnp.broadcast_to(x[None], (t,) + x.shape)
