from .iou_metric import (IoUState, init_iou, update_iou, update_iou_np,
                         compute_iou)

__all__ = ["IoUState", "init_iou", "update_iou", "update_iou_np",
           "compute_iou"]
