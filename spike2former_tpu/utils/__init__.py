from .firing import firing_rates, accumulate_firing, energy_proxy
from .flops import count_params, cost_analysis, model_flops
from .initfast import fast_variables
from .profiling import profile_time, trace, IterTimer

__all__ = [
    "firing_rates", "accumulate_firing", "energy_proxy",
    "count_params", "cost_analysis", "model_flops",
    "fast_variables",
    "profile_time", "trace", "IterTimer",
]
