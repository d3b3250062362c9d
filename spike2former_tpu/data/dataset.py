"""Dataset file-listing + pipeline application.

Reference: mmseg/datasets/basesegdataset.py:15-274 (BaseSegDataset) — image/
annotation pair discovery via suffix matching under (img_dir, ann_dir).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from .metainfo import DatasetMeta, DATASETS
from .transforms import Sample, load_annotation, load_image


@dataclass
class SegDataset:
    meta: DatasetMeta
    data_root: str
    split: str = "train"
    with_ann: bool = True
    # decode each file once and keep the raw (pre-transform) arrays in
    # RAM — random transforms still vary per epoch.  Worth it on
    # few-core hosts where jpeg/png decode would out-cost the TPU step
    # (the synthetic-evidence run trains from a 2.1 GB decoded set).
    cache: bool = False

    def __post_init__(self):
        self._cache: dict[int, Sample] = {}
        img_dir, ann_dir = self.meta.splits[self.split]
        self.img_dir = os.path.join(self.data_root, img_dir)
        self.ann_dir = os.path.join(self.data_root, ann_dir)
        self.samples: list[tuple[str, str | None]] = []
        for root, _, files in sorted(os.walk(self.img_dir)):
            for f in sorted(files):
                if not f.endswith(self.meta.img_suffix):
                    continue
                stem = f[: -len(self.meta.img_suffix)]
                rel = os.path.relpath(root, self.img_dir)
                ann = os.path.join(
                    self.ann_dir, rel, stem + self.meta.seg_suffix)
                self.samples.append((
                    os.path.join(root, f),
                    ann if self.with_ann and os.path.exists(ann) else None))

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, idx: int) -> Sample:
        if self.cache and idx in self._cache:
            c = self._cache[idx]
            return {"image": c["image"], "sem_seg": c["sem_seg"],
                    "meta": dict(c["meta"])}
        img_path, ann_path = self.samples[idx]
        sample: Sample = {
            "image": load_image(img_path),
            "sem_seg": (load_annotation(ann_path,
                                        self.meta.reduce_zero_label)
                        if ann_path else None),
            "meta": {"img_path": img_path,
                     "ori_shape": None},
        }
        sample["meta"]["ori_shape"] = sample["image"].shape[:2]
        if self.cache:
            self._cache[idx] = {"image": sample["image"],
                                "sem_seg": sample["sem_seg"],
                                "meta": dict(sample["meta"])}
        return sample


def make_dataset(name: str, data_root: str, split: str = "train",
                 **kw) -> SegDataset:
    return SegDataset(DATASETS[name], data_root, split, **kw)
