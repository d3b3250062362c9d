from .optim import make_optimizer, poly_warmup_schedule
from .train import TrainState, init_state, make_train_step
from .inference import whole_logits, slide_logits, postprocess_pred

__all__ = [
    "make_optimizer", "poly_warmup_schedule",
    "TrainState", "init_state", "make_train_step",
    "whole_logits", "slide_logits", "postprocess_pred",
]
