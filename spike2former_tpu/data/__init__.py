from .metainfo import DATASETS, DatasetMeta, ADE20K, CITYSCAPES, VOC2012
from .dataset import SegDataset, make_dataset
from .loader import TrainLoader, eval_batches
from .panoptic import (
    PanopticDataset, panoptic_maps, panoptic_to_instances,
    panoptic_train_batches, decode_pan_png, encode_pan_png,
)
from . import transforms

__all__ = [
    "DATASETS", "DatasetMeta", "ADE20K", "CITYSCAPES", "VOC2012",
    "SegDataset", "make_dataset", "TrainLoader", "eval_batches",
    "PanopticDataset", "panoptic_maps", "panoptic_to_instances",
    "panoptic_train_batches", "decode_pan_png", "encode_pan_png",
    "transforms",
]
