"""Threaded prefetching data loader producing static-shape numpy batches.

Replaces the reference's torch DataLoader (16 worker processes per GPU,
configs ...ade20k.py:182).  Decode + augmentation run in a thread pool
(PIL/numpy release the GIL for the heavy parts); a bounded queue
double-buffers batches ahead of the accelerator.  The optional native
runtime (spike2former_tpu/runtime) accelerates JPEG decode + resize in C++.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from .dataset import SegDataset
from .transforms import train_pipeline, train_pipeline_mix


class TrainLoader:
    def __init__(self, dataset: SegDataset, batch_size: int,
                 crop_size=(512, 512), seed: int = 0, num_workers: int = 8,
                 prefetch: int = 4, infinite: bool = True,
                 process_id: int = 0, process_count: int = 1,
                 mosaic_prob: float = 0.0):
        """``batch_size`` is the per-process (local) batch.  In multi-host
        training every process builds the SAME epoch permutation (shared
        seed) and consumes its disjoint ``process_id``-strided slice — the
        DistSamplerSeedHook / InfiniteSampler sharding convention.

        ``mosaic_prob`` > 0 enables the MultiImageMixDataset-style mosaic
        mix (transforms.train_pipeline_mix): the loader owns dataset
        access, so the multi-image transform draws its 3 extra raw samples
        here — no wrapper dataset class needed."""
        self.ds = dataset
        self.bs = batch_size
        self.crop = crop_size
        self.rng = np.random.default_rng(seed)
        self.pid, self.pcount = process_id, process_count
        self.mosaic_prob = mosaic_prob
        self.pool = ThreadPoolExecutor(num_workers)
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self.infinite = infinite
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _load_one(self, idx: int, seed: int):
        rng = np.random.default_rng(seed)
        if self.mosaic_prob > 0:
            extra = lambda: self.ds.load(int(rng.integers(len(self.ds))))
            s = train_pipeline_mix(self.ds.load(idx), extra, rng,
                                   self.crop, self.mosaic_prob)
        else:
            s = train_pipeline(self.ds.load(idx), rng, self.crop)
        return s["image"], s["sem_seg"]

    def _producer(self):
        epoch = 0
        while not self._stop.is_set():
            order = self.rng.permutation(len(self.ds))
            if self.pcount > 1:
                order = order[self.pid::self.pcount]
            for i in range(0, len(order) - self.bs + 1, self.bs):
                idxs = order[i:i + self.bs]
                seeds = self.rng.integers(0, 2**31, size=self.bs)
                try:
                    futs = [self.pool.submit(self._load_one, int(j), int(sd))
                            for j, sd in zip(idxs, seeds)]
                except RuntimeError:
                    return  # pool shut down at interpreter exit
                imgs, segs = zip(*(f.result() for f in futs))
                batch = (np.stack(imgs).astype(np.float32),
                         np.stack(segs).astype(np.int32))
                while not self._stop.is_set():
                    try:
                        self.q.put(batch, timeout=1.0)
                        break
                    except queue.Full:
                        continue
            epoch += 1
            if not self.infinite:
                self.q.put(None)
                return

    def __iter__(self) -> Iterator:
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item

    def close(self):
        self._stop.set()


def eval_batches(dataset: SegDataset, batch_size: int = 1,
                 scale=(2048, 512), size_divisor: int = 32,
                 bucket: int = 0):
    """Sequential eval iterator: yields (images [B,H,W,3] f32,
    sem_seg [B,H,W] i32 or None, metas).

    ``bucket`` > 0 pads every image up to multiples of ``bucket`` (static
    shape buckets — a handful of XLA compilations instead of one per
    distinct keep-ratio shape); pass ``meta['img_shape']`` as ``valid_hw``
    to ``whole_logits`` so padded tokens are masked.

    Following the reference protocol (mmseg BaseSegmentor.postprocess_result:
    predictions are resized back to the ORIGINAL image resolution and scored
    against full-resolution GT), the yielded ``sem_seg`` is the original,
    un-resized annotation; metas carry ``ori_shape`` plus the post-resize
    ``img_shape`` (the valid region inside the padded input) so callers can
    run ``postprocess_pred`` before the IoU update.
    """
    from .transforms import test_pipeline

    for i in range(len(dataset)):
        raw = dataset.load(i)
        ori_shape = raw["image"].shape[:2]
        ori_seg = raw.pop("sem_seg", None)  # keep GT at full resolution
        s = test_pipeline(raw, scale, size_divisor=size_divisor,
                          bucket=bucket)
        img = s["image"][None].astype(np.float32)
        seg = None if ori_seg is None else ori_seg[None].astype(np.int32)
        meta = dict(s["meta"], ori_shape=ori_shape)
        meta.setdefault("pad_shape", meta["img_shape"])
        yield img, seg, [meta]
