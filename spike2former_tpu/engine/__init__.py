from .optim import make_optimizer, poly_warmup_schedule
from .train import TrainState, init_state, make_train_step, make_train_step_panoptic
from .inference import (whole_logits, slide_logits, postprocess_pred,
                        whole_panoptic, bucket_hw)
from .config import Config, ModelConfig, get_config, build_model, PRESETS
from .checkpoint import (
    save_state, restore_state, latest_checkpoint, load_torch_state_dict,
    load_reference_backbone,
)

__all__ = [
    "make_optimizer", "poly_warmup_schedule",
    "TrainState", "init_state", "make_train_step", "make_train_step_panoptic",
    "whole_logits", "slide_logits", "postprocess_pred",
    "whole_panoptic", "bucket_hw",
    "Config", "ModelConfig", "get_config", "build_model", "PRESETS",
    "save_state", "restore_state", "latest_checkpoint",
    "load_torch_state_dict", "load_reference_backbone",
]
