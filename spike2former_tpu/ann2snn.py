"""ANN→SNN conversion: rate-coded IF networks from trained ReLU ANNs.

TPU-native equivalent of the reference's ann2snn package
(Segmentation/Qtrick_architecture/clock_driven/ann2snn/converter.py:7-106,
modules.py VoltageHook/VoltageScaler):

* ``Converter.calibrate`` runs calibration batches through the ANN and
  records, per ReLU site, the activation scale ``s`` — the max (mode
  'max') or a quantile (mode '99.9%' / float in (0, 1]) of the ReLU
  output, exactly VoltageHook's statistic.
* ``Converter.convert`` returns an SNN forward whose every ReLU is
  replaced by ``VoltageScaler(1/s) → IFNode(v_threshold=1,
  v_reset=None) → VoltageScaler(s)`` (converter.py:93-106): soft-reset
  IF, rate-decoded over ``T`` steps.

Design: instead of torch module surgery, the ANN is described as a flat
sequence of flax modules and ``"relu"`` markers (the same scope the
reference converts — feedforward CNNs).  One module serves all three
phases (ANN inference, calibration, SNN inference) so the parameter
tree is shared; the SNN forward broadcasts the input over ``T``, runs
stateless layers on the folded ``T*B`` batch, and each IF site as a
``lax.scan`` over T carrying its membrane — one jit, no Python step
loop.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ops.neuron import multistep_if

__all__ = ["AnnSequential", "Converter"]


class AnnSequential(nn.Module):
    """A feedforward ANN as a sequence of flax modules and ``"relu"``
    markers.

    * default: plain ANN forward on ``x [B, ...]``.
    * ``calibrate=True``: additionally sow per-ReLU-site max/quantile
      statistics into the ``calib`` collection (VoltageHook).
    * ``snn_scales=[...]``: SNN forward — returns the rate-decoded mean
      output over ``t`` steps with soft-reset IF neurons at ReLU sites.
    """

    layers: tuple

    @nn.compact
    def __call__(self, x, *, calibrate: bool = False,
                 percentile: float | None = None,
                 snn_scales: tuple | None = None, t: int = 32):
        snn = snn_scales is not None
        if snn:
            x = jnp.broadcast_to(x[None], (t,) + x.shape)
        site = 0
        for layer in self.layers:
            if layer == "relu":
                if snn:
                    s = float(snn_scales[site])
                    out = multistep_if(x / s, v_threshold=1.0,
                                       v_reset=None, surrogate="sigmoid")
                    x = out.spikes * s
                else:
                    x = nn.relu(x)
                    if calibrate:
                        if percentile is None:
                            stat = jnp.max(x)
                        else:
                            stat = jnp.quantile(
                                x.astype(jnp.float32).reshape(-1),
                                percentile)
                        self.sow("calib", f"site{site}", stat,
                                 init_fn=lambda: jnp.zeros(()),
                                 reduce_fn=jnp.maximum)
                site += 1
            elif snn:
                flat = x.reshape((-1,) + x.shape[2:])
                flat = layer(flat)
                x = flat.reshape((t, -1) + flat.shape[1:])
            else:
                x = layer(x)
        return jnp.mean(x, axis=0) if snn else x


@dataclass
class Converter:
    """ANN→SNN converter (max / percentile voltage-scaling modes).

    mode: 'max' (default), a string like '99.9%', or a float in (0, 1].
    Matches the reference Converter's three modes (converter.py:56-80).
    """

    mode: str | float = "max"

    def _percentile(self) -> float | None:
        if isinstance(self.mode, str):
            if self.mode.lower() == "max":
                return None
            if self.mode.endswith("%"):
                return float(self.mode[:-1]) / 100.0
            raise ValueError(f"unknown conversion mode {self.mode!r}")
        p = float(self.mode)
        if not 0.0 < p <= 1.0:
            raise ValueError(f"mode float must be in (0, 1], got {p}")
        return p

    def calibrate(self, ann: AnnSequential, variables, batches):
        """Returns per-ReLU-site scales from calibration data."""
        pct = self._percentile()
        num_sites = sum(1 for l in ann.layers if l == "relu")
        scales = [0.0] * num_sites

        @jax.jit
        def stats(x):
            _, aux = ann.apply(variables, x, calibrate=True,
                               percentile=pct, mutable=["calib"])
            return aux["calib"]

        for x in batches:
            calib = stats(x)
            for i in range(num_sites):
                v = calib[f"site{i}"]  # sow w/ reduce_fn: bare scalar
                # max mode: running max; percentile mode: per-batch
                # quantiles combined by running max (conservative)
                scales[i] = max(scales[i], float(v))
        if any(s <= 0.0 for s in scales):
            raise ValueError(
                f"calibration produced non-positive scales {scales}; "
                "use more/representative calibration data")
        return scales

    def convert(self, ann: AnnSequential, variables, batches, t: int = 32):
        """Calibrate and return ``(snn_apply, scales)``;
        ``snn_apply(x, t=...)`` is the jittable rate-decoded SNN."""
        scales = tuple(self.calibrate(ann, variables, batches))

        def snn_apply(x, t: int = t):
            return ann.apply(variables, x, snn_scales=scales, t=t)

        return snn_apply, scales
