"""FLOPs / parameter counting — tools/analysis_tools/get_flops.py
equivalent, via jax's cost analysis of the compiled HLO (exact, not
hook-based estimation)."""
from __future__ import annotations

import jax


def count_params(variables) -> int:
    params = variables.get("params", variables)
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def cost_analysis(fn, *args) -> dict:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    return dict(costs or {})


def model_flops(model, variables, images, method=None) -> dict:
    kwargs = {} if method is None else {"method": method}

    def fn(v, im):
        return model.apply(v, im, **kwargs)

    costs = cost_analysis(fn, variables, images)
    return {
        "flops": costs.get("flops", float("nan")),
        "params": count_params(variables),
        "bytes_accessed": costs.get("bytes accessed", float("nan")),
    }
