from .spike import (
    quant_ste,
    qspike,
    multispike_norm,
    multispike4,
    spike_rate,
)
from .neuron import (
    multistep_if,
    multistep_lif,
    multistep_plif,
    multistep_qif,
    multistep_eif,
    sigmoid_surrogate,
    atan_surrogate,
)
from .rnn import (
    SpikingLSTM,
    SpikingGRU,
    SpikingVanillaRNN,
)
from .dcnv3 import dcnv3_core
from .msda import ms_deform_attn
from .resize import (
    resize_bilinear,
    resize_bilinear_align_corners,
    resize_bilinear_hw,
    resize_nearest_torch,
)

__all__ = [
    "quant_ste", "qspike", "multispike_norm", "multispike4", "spike_rate",
    "multistep_if", "multistep_lif", "multistep_plif", "multistep_qif",
    "multistep_eif", "SpikingLSTM", "SpikingGRU", "SpikingVanillaRNN",
    "sigmoid_surrogate", "atan_surrogate",
    "dcnv3_core", "ms_deform_attn",
    "resize_bilinear", "resize_bilinear_align_corners",
    "resize_bilinear_hw", "resize_nearest_torch",
]
