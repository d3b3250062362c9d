"""Lava / Loihi exchange: export spiking blocks to lava-dl's NetX format.

TPU-native equivalent of the reference's ``lava_exchange.py``
(Segmentation/Qtrick_architecture/clock_driven/lava_exchange.py:62-303):

* :func:`step_quantize` / :func:`quantize_8bit` — the STE weight
  quantizers lava-dl applies before mapping to Loihi (:62-110).
* :func:`to_cuba_params` — IF/LIF neuron config → CUBA neuron
  parameters, with the reference's validity rules (v_reset must be 0,
  LIF must not decay its input; :128-155).
* :func:`linear_to_synapse` / :func:`conv_to_synapse` — flax
  Dense/Conv kernels → lava synapse weight layout (torch OI / OIHW
  order, the shape ``slayer.synapse.Dense/Conv`` stores; :166-230).
* :func:`export_hdf5` — writes a lava-dl **netx** HDF5 file
  (``lava.lib.dl.netx.hdf5.Network``-loadable: ``simulation`` group +
  numbered ``layer/<i>`` groups with type/shape/neuron/weight entries).
  The reference returns live ``slayer.block`` objects and therefore
  hard-requires lava at import; here lava is never imported — the
  exchange format itself is the contract, and ``h5py`` is the only
  (gated) dependency.

Loihi fixed-point conventions follow lava-dl: decays are 12-bit
(``decay * 4096``), thresholds are mantissas at the weight exponent
(<< 6).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "step_quantize", "quantize_8bit", "to_cuba_params",
    "linear_to_synapse", "conv_to_synapse", "export_hdf5",
]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def step_quantize(x: jax.Array, step: float = 1.0) -> jax.Array:
    """``round(x / step) * step`` with a straight-through gradient
    (lava_exchange.py:62-100)."""
    return jnp.round(x / step) * step


def _sq_fwd(x, step):
    return step_quantize(x, step), None


def _sq_bwd(step, _, g):
    return (g,)


step_quantize.defvjp(_sq_fwd, _sq_bwd)


def quantize_8bit(x: jax.Array, scale: int = 64,
                  descale: bool = False) -> jax.Array:
    """lava-dl's pre-synapse weight quantizer (lava_exchange.py:103-107):
    steps of ``2/scale``, clamped to the signed-8-bit range."""
    q = jnp.clip(step_quantize(x, 2.0 / scale), -256.0 / scale,
                 255.0 / scale)
    return q * scale if descale else q


def to_cuba_params(kind: str, v_threshold: float = 1.0,
                   v_reset: float | None = 0.0, tau: float = 2.0,
                   decay_input: bool = False,
                   scale: int = 1 << 6) -> dict:
    """IF/LIF neuron settings → lava CUBA neuron parameter dict.

    Mirrors ``to_lava_neuron_param_dict`` (lava_exchange.py:128-155):
    IF → voltage_decay 0, LIF → voltage_decay 1/tau; both with
    current_decay 1.  The same validity rules apply.
    """
    if v_reset not in (0, 0.0, None):
        raise ValueError("lava only supports v_reset == 0")
    if kind == "if":
        v_decay = 0.0
    elif kind == "lif":
        if decay_input:
            raise ValueError("lava only supports decay_input == False")
        v_decay = 1.0 / tau
    else:
        raise NotImplementedError(f"no CUBA mapping for neuron {kind!r}")
    return {
        "threshold": float(v_threshold),
        "current_decay": 1.0,
        "voltage_decay": float(v_decay),
        "tau_grad": 1, "scale_grad": 1, "scale": scale,
        "shared_param": True, "persistent_state": True,
        "requires_grad": False, "graded_spike": False,
    }


def linear_to_synapse(kernel: jax.Array, bias=None) -> np.ndarray:
    """flax Dense kernel [in, out] → lava dense weight [out, in]
    (lava_exchange.py:166-183; lava does not support synapse bias)."""
    if bias is not None:
        raise ValueError("lava does not support dense synapse bias")
    if kernel.ndim != 2:
        raise ValueError(f"expected [in, out] kernel, got {kernel.shape}")
    return np.asarray(kernel, np.float32).T


def conv_to_synapse(kernel: jax.Array, bias=None) -> np.ndarray:
    """flax Conv kernel [kh, kw, in, out] → lava conv weight
    [out, in, kh, kw] (lava_exchange.py:186-210)."""
    if bias is not None:
        raise ValueError("lava does not support conv synapse bias")
    if kernel.ndim != 4:
        raise ValueError(
            f"expected [kh, kw, in, out] kernel, got {kernel.shape}")
    return np.asarray(kernel, np.float32).transpose(3, 2, 0, 1)


def _neuron_group(g, params: dict):
    n = g.create_group("neuron")
    n.create_dataset("iDecay", data=int(params["current_decay"] * 4096))
    n.create_dataset("vDecay", data=int(params["voltage_decay"] * 4096))
    n.create_dataset("vThMant", data=int(round(params["threshold"]
                                               * params["scale"])))
    n.create_dataset("refDelay", data=1)
    n.create_dataset("gradedSpike", data=int(params["graded_spike"]))
    n.create_dataset("type", data=np.bytes_("CUBA"))


def export_hdf5(layers: list[dict], path: str, t_sample: int = 32) -> None:
    """Write a lava-dl netx HDF5 network.

    layers: list of dicts, each one of
      {"type": "input", "shape": (H, W, C) | (F,)}
      {"type": "dense", "weight": [out, in], "neuron": cuba-dict}
      {"type": "conv", "weight": [out, in, kh, kw], "neuron": cuba-dict,
       "stride": int, "padding": int, "dilation": int, "groups": int,
       "shape": output (H, W, C)}
    Weights are 8-bit step-quantized on write (quantize_8bit, descale),
    as lava-dl blocks do by default (lava_exchange.py:262-267).
    """
    try:
        import h5py
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "export_hdf5 needs h5py (not installed in this env)") from e

    with h5py.File(path, "w") as f:
        sim = f.create_group("simulation")
        sim.create_dataset("Ts", data=1)
        sim.create_dataset("tSample", data=int(t_sample))
        lg = f.create_group("layer")
        for i, spec in enumerate(layers):
            g = lg.create_group(str(i))
            kind = spec["type"]
            g.create_dataset("type", data=np.bytes_(kind))
            if kind == "input":
                g.create_dataset("shape",
                                 data=np.asarray(spec["shape"], np.int64))
                continue
            w = np.asarray(spec["weight"], np.float32)
            scale = spec.get("neuron", {}).get("scale", 64)
            wq = np.asarray(
                quantize_8bit(jnp.asarray(w), scale, descale=True))
            g.create_dataset("weight", data=wq)
            _neuron_group(g, spec["neuron"])
            if kind == "dense":
                g.create_dataset("inFeatures", data=w.shape[1])
                g.create_dataset("outFeatures", data=w.shape[0])
                g.create_dataset("shape",
                                 data=np.asarray([w.shape[0]], np.int64))
            elif kind == "conv":
                g.create_dataset("inChannels", data=w.shape[1])
                g.create_dataset("outChannels", data=w.shape[0])
                g.create_dataset("kernelSize",
                                 data=np.asarray(w.shape[2:4], np.int64))
                for key, default in (("stride", 1), ("padding", 0),
                                     ("dilation", 1), ("groups", 1)):
                    g.create_dataset(key, data=int(spec.get(key, default)))
                g.create_dataset("shape",
                                 data=np.asarray(spec["shape"], np.int64))
            else:
                raise NotImplementedError(f"layer type {kind!r}")
