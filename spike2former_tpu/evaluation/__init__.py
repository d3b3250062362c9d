from .iou_metric import (IoUState, init_iou, update_iou, update_iou_np,
                         compute_iou)
from .panoptic import PQStat, pq_update, compute_pq
from .cityscapes_metric import CityscapesEval, evaluate_cityscapes_dir

__all__ = ["IoUState", "init_iou", "update_iou", "update_iou_np",
           "compute_iou", "PQStat", "pq_update", "compute_pq",
           "CityscapesEval", "evaluate_cityscapes_dir"]
