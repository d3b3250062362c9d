from .iou_metric import IoUState, init_iou, update_iou, compute_iou

__all__ = ["IoUState", "init_iou", "update_iou", "compute_iou"]
