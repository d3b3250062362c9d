"""Micro-batching serving queue around the single-image inference API.

The reference serves one image per ``inference_model`` call
(mmseg/apis/inference.py:96-130).  On TPU that leaves most of the chip
idle: the measured single-chip sweet spot is B=16 (BENCH_NOTES), ~13x the
B=1 throughput.  ``ServingEngine`` accepts concurrent single-image
requests, groups them by resolution bucket, micro-batches up to
``max_batch`` per forward, and keeps ONE resident compilation per
(bucket shape, padded batch size) pair:

* requests are keep-ratio resized to ``test_scale`` and padded to
  ``bucket``-multiples — a handful of bucket shapes total;
* within a bucket, the batch is padded up to the next size in
  ``batch_sizes`` (powers of two up to ``max_batch``), so low-load
  latency stays low while the compilation count stays bounded;
* the padded region is masked via ``valid_hw`` (mask-aware PE + masked
  CA keys), the same mechanism as bucketed eval;
* per-request postprocessing (crop -> bilinear logits resize to the
  original shape -> argmax) runs on the host, so arbitrary original
  resolutions never trigger device recompiles.

Latency/throughput statistics (p50/p99) are tracked per request.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .api import InferenceModel, init_model
from .data.transforms import load_image, pad_to, resize_keep_ratio
from .engine.inference import bucket_hw, whole_logits


def _resize_bilinear_np(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Host bilinear resize (align_corners=False, half-pixel centers) —
    matches ops/resize.resize_bilinear semantics for the postprocess path.
    x: [H, W, C] float."""
    h, w = x.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    ys = (np.arange(oh, dtype=np.float64) + 0.5) * (h / oh) - 0.5
    xs = (np.arange(ow, dtype=np.float64) + 0.5) * (w / ow) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(x.dtype)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0).astype(x.dtype)[None, :, None]
    a = x[y0][:, x0]
    b = x[y0][:, x1]
    c = x[y1][:, x0]
    d = x[y1][:, x1]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


@dataclass
class _Request:
    image: np.ndarray          # padded bucket-shape uint8/float image
    img_shape: tuple[int, int]  # valid region inside the bucket
    ori_shape: tuple[int, int]
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.perf_counter)


class ServingEngine:
    """Concurrent single-image segmentation server.

    Usage::

        eng = ServingEngine("SDTv2_maskformer_DCNpixelDecoder_ade20k",
                            checkpoint=..., max_batch=16)
        fut = eng.submit(image)        # returns concurrent.futures.Future
        pred = fut.result()            # [H, W] int32 class map
        print(eng.stats())
        eng.close()
    """

    def __init__(self, config: Any, checkpoint: str | None = None,
                 overrides: list[str] | None = None, *,
                 model: InferenceModel | None = None,
                 max_batch: int = 16, bucket: int = 128,
                 max_queue: int = 256, wait_ms: float = 2.0):
        self.im = model if model is not None else init_model(
            config, checkpoint, overrides)
        self.max_batch = max_batch
        self.bucket = bucket
        self.wait_s = wait_ms / 1e3
        self.batch_sizes = []
        b = 1
        while b < max_batch:
            self.batch_sizes.append(b)
            b *= 2
        self.batch_sizes.append(max_batch)

        self._q: queue.Queue = queue.Queue(maxsize=max_queue)
        self._pending: dict[tuple[int, int], list[_Request]] = {}
        self._latencies: list[float] = []
        self._lock = threading.Lock()
        self._n_done = 0
        self._t_start = time.perf_counter()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---------------------------------------------------------------- client
    def submit(self, image: str | np.ndarray) -> Future:
        """Enqueue one image (path or RGB array). Returns a Future that
        resolves to the [H, W] int32 class map at original resolution."""
        if self._stop.is_set():
            raise RuntimeError("ServingEngine is closed")
        img = load_image(image) if isinstance(image, str) else image
        ori_shape = img.shape[:2]
        sample = {"image": img, "sem_seg": None, "meta": {}}
        sample = resize_keep_ratio(sample, *self.im.cfg.data.test_scale)
        h, w = sample["image"].shape[:2]
        bh, bw = bucket_hw(h, w, self.bucket)
        sample = pad_to(sample, (bh, bw))
        req = _Request(sample["image"], (h, w), ori_shape)
        self._q.put(req)
        return req.future

    def __call__(self, image) -> np.ndarray:
        return self.submit(image).result()

    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self._latencies, np.float64)
            n = self._n_done
        dt = time.perf_counter() - self._t_start
        out = {"requests": n, "throughput": n / dt if dt > 0 else 0.0}
        if len(lat):
            out["p50_ms"] = float(np.percentile(lat, 50) * 1e3)
            out["p99_ms"] = float(np.percentile(lat, 99) * 1e3)
        return out

    def close(self):
        self._stop.set()
        self._worker.join(timeout=60)
        # fail anything still queued
        for reqs in self._pending.values():
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(RuntimeError("engine closed"))
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if not r.future.done():
                r.future.set_exception(RuntimeError("engine closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------------- worker
    def _drain(self):
        """Move queued requests into per-bucket pending lists."""
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                return
            self._pending.setdefault(req.image.shape[:2], []).append(req)

    def _pick_bucket(self):
        """Fullest bucket first (maximizes batch efficiency)."""
        if not self._pending:
            return None
        return max(self._pending, key=lambda k: len(self._pending[k]))

    def _run(self):
        while not self._stop.is_set() or not self._q.empty() or self._pending:
            self._drain()
            key = self._pick_bucket()
            if key is None:
                if self._stop.is_set():
                    return
                time.sleep(self.wait_s)
                continue
            # brief coalescing window: if the fullest bucket is below
            # max_batch, wait once for stragglers
            if (len(self._pending[key]) < self.max_batch
                    and not self._stop.is_set()):
                time.sleep(self.wait_s)
                self._drain()
                key = self._pick_bucket()
            reqs = self._pending[key][:self.max_batch]
            self._pending[key] = self._pending[key][len(reqs):]
            if not self._pending.get(key):
                self._pending.pop(key, None)
            try:
                self._process(reqs)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _process(self, reqs: list[_Request]):
        n = len(reqs)
        nb = next(b for b in self.batch_sizes if b >= n)
        h, w = reqs[0].image.shape[:2]
        batch = np.zeros((nb, h, w, 3), np.float32)
        valid = np.zeros((nb, 2), np.int32)
        for i, r in enumerate(reqs):
            batch[i] = r.image
            valid[i] = r.img_shape
        valid[n:] = (h, w)  # padding rows: fully valid dummy

        logits = whole_logits(self.im.model, self.im.variables,
                              jnp.asarray(batch), valid_hw=valid)
        logits = np.asarray(logits, np.float32)
        for i, r in enumerate(reqs):
            vh, vw = r.img_shape
            lg = _resize_bilinear_np(logits[i, :vh, :vw], r.ori_shape)
            r.future.set_result(np.argmax(lg, axis=-1).astype(np.int32))
            with self._lock:
                self._latencies.append(time.perf_counter() - r.t_submit)
                self._n_done += 1
