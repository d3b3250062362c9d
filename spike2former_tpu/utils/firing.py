"""Firing-rate analysis — the tools/cal_firing_num.py equivalent.

The reference registers forward hooks on every Q_IFNode and accumulates
``output.mean() * quant`` per site over N validation images
(cal_firing_num.py:140-174).  Here every spike site ``sow``s the same
statistic into the ``spikes`` collection (models/layers.py Spike), so one
``apply(..., mutable=['spikes'])`` returns all rates with stable
module-path names — no hooks needed.
"""
from __future__ import annotations

from typing import Any

import numpy as np


def firing_rates(model, variables, images, method=None) -> dict[str, float]:
    """Run one forward and return {site_name: mean_activation x quant}."""
    kwargs = {} if method is None else {"method": method}
    _, aux = model.apply(variables, images, mutable=["spikes"], **kwargs)
    flat = _flatten(aux["spikes"])
    return {k: float(np.asarray(v[0] if isinstance(v, tuple) else v))
            for k, v in flat.items()}


def accumulate_firing(model, variables, image_iter, max_images=200,
                      method=None) -> dict[str, float]:
    """Average per-site firing rate over an image stream
    (cal_firing_num.py accumulates mean/iter over 200 val images)."""
    totals: dict[str, float] = {}
    n = 0
    for images in image_iter:
        rates = firing_rates(model, variables, images, method)
        for k, v in rates.items():
            totals[k] = totals.get(k, 0.0) + v
        n += 1
        if n >= max_images:
            break
    return {k: v / max(n, 1) for k, v in totals.items()}


def _flatten(tree: Any, prefix: str = "") -> dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def energy_proxy(rates: dict[str, float]) -> float:
    """Mean firing rate across sites — the paper's spike-count energy
    proxy aggregate."""
    if not rates:
        return 0.0
    return float(np.mean(list(rates.values())))
