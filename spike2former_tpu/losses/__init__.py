from .losses import weighted_cross_entropy, sigmoid_focal_loss, dice_loss
from .matcher import (
    classification_cost, focal_mask_cost, dice_mask_cost, match_costs,
    hungarian_host, auction_match,
)
from .criterion import (GroundTruth, LazyMasks, semantic_to_instances,
                        maskformer_loss, classification_targets)
from .point_sample import (point_sample, point_sample_slot,
                           uncertain_point_coords, get_uncertainty)
from .pixel import (
    pixel_cross_entropy, pixel_accuracy, lovasz_softmax_loss,
    lovasz_hinge_loss, tversky_loss, boundary_loss, ohem_cross_entropy,
    hausdorff_distance_loss, edt_sq, build_pixel_loss, PIXEL_LOSSES,
)

__all__ = [
    "weighted_cross_entropy", "sigmoid_focal_loss", "dice_loss",
    "classification_cost", "focal_mask_cost", "dice_mask_cost",
    "match_costs", "hungarian_host", "auction_match",
    "GroundTruth", "LazyMasks", "semantic_to_instances", "maskformer_loss",
    "classification_targets",
    "point_sample", "point_sample_slot", "uncertain_point_coords",
    "get_uncertainty",
    "pixel_cross_entropy", "pixel_accuracy", "lovasz_softmax_loss",
    "lovasz_hinge_loss", "tversky_loss", "boundary_loss",
    "ohem_cross_entropy", "hausdorff_distance_loss", "edt_sq",
    "build_pixel_loss", "PIXEL_LOSSES",
]
