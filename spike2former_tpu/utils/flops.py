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


def dcn_sampling_flops(batch: int, crop_hw: tuple[int, int], *,
                       num_layers: int = 6, group: int = 32,
                       group_channels: int = 8, points: int = 9,
                       stride: int = 16, train: bool = False) -> float:
    """Analytic FLOPs of the Pallas DCNv3 sampling kernels per step.

    XLA's ``cost_analysis`` may not include custom-call FLOPs, so the
    MFU accounting needs this separately (BENCH_NOTES).  Uses the
    kernels' own CostEstimate formulas (ops/pallas/dcnv3_kernel.py):
    forward ``2·N·G·P·HoWo·Hin·(Win·Cg)``, backward 3x forward.
    Counts the one-hot-matmul formulation's ACTUAL matmul FLOPs (the
    ~100x-inflated number the MXU really executes), not the intrinsic
    4-tap cost.
    """
    h, w = crop_hw[0] // stride, crop_hw[1] // stride
    fwd = 2.0 * batch * group * points * (h * w) * h * (w * group_channels)
    per_layer = fwd * (4.0 if train else 1.0)  # bwd kernel = 3x fwd
    return num_layers * per_layer
