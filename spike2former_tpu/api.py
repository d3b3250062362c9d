"""Single-image inference API — mmseg/apis equivalents.

Reference: mmseg/apis/inference.py (``init_model`` :23-90,
``inference_model`` :96-130) and MMSegInferencer (mmseg_inferencer.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .data.metainfo import DATASETS
from .data.transforms import load_image, pad_to, resize_keep_ratio
from .engine.checkpoint import restore_state
from .engine.config import Config, build_model, get_config
from .models.segmentor import preprocess


@dataclass
class InferenceModel:
    cfg: Config
    model: Any
    variables: Any
    _jit_fn: Any = None

    @property
    def num_classes(self) -> int:
        return self.cfg.model.num_classes

    @property
    def classes(self) -> tuple:
        return DATASETS[self.cfg.data.dataset].classes


def init_model(config: str | Config, checkpoint: str | None = None,
               overrides: list[str] | None = None) -> InferenceModel:
    """Build a model from a config preset and optionally load a
    checkpoint."""
    cfg = get_config(config, overrides) if isinstance(config, str) else config
    model = build_model(cfg.model)
    sample = jnp.zeros((1, *cfg.data.crop_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    if checkpoint:
        variables = restore_state(checkpoint, variables)
    return InferenceModel(cfg, model, variables)


def inference_model(im: InferenceModel, image: str | np.ndarray
                    ) -> np.ndarray:
    """Run whole-image inference on one image (path or RGB array).
    Returns the predicted class map at original resolution [H, W] int32."""
    from .ops.resize import resize_bilinear

    img = load_image(image) if isinstance(image, str) else image
    ori_shape = img.shape[:2]
    sample = {"image": img, "sem_seg": None, "meta": {}}
    sample = resize_keep_ratio(sample, *im.cfg.data.test_scale)
    h, w = sample["image"].shape[:2]
    div = im.cfg.data.size_divisor or 1
    sample = pad_to(sample, (-(-h // div) * div, -(-w // div) * div))

    x = preprocess(jnp.asarray(sample["image"][None], jnp.float32))
    if im._jit_fn is None:
        im._jit_fn = jax.jit(lambda v, a: im.model.apply(
            v, a, method=type(im.model).predict_logits))
    logits = im._jit_fn(im.variables, x)
    logits = logits[:, :h, :w]  # crop padding
    logits = resize_bilinear(logits, ori_shape)
    return np.asarray(jnp.argmax(logits, -1)[0], np.int32)


class Inferencer:
    """Batch inference wrapper — the MMSegInferencer equivalent
    (mmseg/apis/mmseg_inferencer.py): accepts one image or a list
    (paths or RGB arrays), returns class maps, optionally writes
    palette-overlay visualizations."""

    def __init__(self, config: str | Config, checkpoint: str | None = None,
                 overrides: list[str] | None = None):
        self.im = init_model(config, checkpoint, overrides)

    @property
    def classes(self) -> tuple:
        return self.im.classes

    def __call__(self, inputs, out_dir: str | None = None,
                 opacity: float = 0.5) -> dict:
        """Returns {'predictions': [pred [H,W] int32, ...],
        'visualization': [path, ...] if out_dir else []}."""
        import os

        single = not isinstance(inputs, (list, tuple))
        items = [inputs] if single else list(inputs)
        preds, vis_paths = [], []
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        for i, item in enumerate(items):
            pred = inference_model(self.im, item)
            preds.append(pred)
            if out_dir:
                from PIL import Image

                from .data.metainfo import DATASETS
                from .evaluation.visualize import draw_sem_seg

                img = load_image(item) if isinstance(item, str) else item
                meta = DATASETS[self.im.cfg.data.dataset]
                pal = (np.asarray(meta.palette, np.uint8)
                       if meta.palette is not None else None)
                vis = draw_sem_seg(img.astype(np.uint8), pred,
                                   palette=pal, alpha=opacity)
                name = (os.path.splitext(os.path.basename(item))[0]
                        if isinstance(item, str) else f"img_{i}")
                path = os.path.join(out_dir, f"{name}_pred.png")
                Image.fromarray(vis).save(path)
                vis_paths.append(path)
        return {"predictions": preds, "visualization": vis_paths}
