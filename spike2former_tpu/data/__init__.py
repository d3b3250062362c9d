from .metainfo import DATASETS, DatasetMeta, ADE20K, CITYSCAPES, VOC2012
from .dataset import SegDataset, make_dataset
from .loader import TrainLoader, eval_batches
from . import transforms

__all__ = [
    "DATASETS", "DatasetMeta", "ADE20K", "CITYSCAPES", "VOC2012",
    "SegDataset", "make_dataset", "TrainLoader", "eval_batches",
    "transforms",
]
