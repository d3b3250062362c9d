from .losses import weighted_cross_entropy, sigmoid_focal_loss, dice_loss
from .matcher import (
    classification_cost, focal_mask_cost, dice_mask_cost, match_costs,
    hungarian_host, auction_match,
)
from .criterion import (GroundTruth, semantic_to_instances, maskformer_loss,
                        classification_targets)

__all__ = [
    "weighted_cross_entropy", "sigmoid_focal_loss", "dice_loss",
    "classification_cost", "focal_mask_cost", "dice_mask_cost",
    "match_costs", "hungarian_host", "auction_match",
    "GroundTruth", "semantic_to_instances", "maskformer_loss",
    "classification_targets",
]
