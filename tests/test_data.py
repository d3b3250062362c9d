"""Data pipeline tests on a synthetic on-disk dataset."""
import os

import numpy as np
import pytest
from PIL import Image

from spike2former_tpu.data import TrainLoader, eval_batches, make_dataset
from spike2former_tpu.data.transforms import (
    load_annotation, pad_to, random_crop, random_flip, resize_keep_ratio,
    resize_shortest_edge, train_pipeline)


@pytest.fixture(scope="module")
def ade_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ade")
    rng = np.random.default_rng(0)
    for split in ("training", "validation"):
        os.makedirs(root / "images" / split)
        os.makedirs(root / "annotations" / split)
        for i in range(3):
            h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            seg = rng.integers(0, 20, (h, w), np.uint8)
            Image.fromarray(img).save(
                root / "images" / split / f"img_{i}.jpg")
            Image.fromarray(seg).save(
                root / "annotations" / split / f"img_{i}.png")
    return str(root)


def test_dataset_listing(ade_root):
    ds = make_dataset("ade20k", ade_root, "train")
    assert len(ds) == 3
    s = ds.load(0)
    assert s["image"].ndim == 3 and s["sem_seg"].ndim == 2


def test_reduce_zero_label(tmp_path):
    seg = np.asarray([[0, 1], [2, 255]], np.uint8)
    Image.fromarray(seg).save(tmp_path / "s.png")
    out = load_annotation(str(tmp_path / "s.png"), True)
    np.testing.assert_array_equal(out, [[255, 0], [1, 255]])


def test_resize_shortest_edge():
    s = {"image": np.zeros((100, 200, 3), np.uint8),
         "sem_seg": np.zeros((100, 200), np.int32), "meta": {}}
    out = resize_shortest_edge(s, 64, 2560)
    assert out["image"].shape == (64, 128, 3)
    out = resize_shortest_edge(s, 64, 100)  # max_size clamps
    assert out["image"].shape[1] == 100


def test_random_rotate():
    from spike2former_tpu.data.transforms import random_rotate

    rng = np.random.default_rng(3)
    img = np.full((20, 20, 3), 100, np.uint8)
    seg = np.full((20, 20), 2, np.int32)
    s = {"image": img, "sem_seg": seg, "meta": {}}
    out = random_rotate(s, rng, prob=1.0, degree=30.0)
    assert out["image"].shape == img.shape
    assert out["sem_seg"].shape == seg.shape
    # exposed corners get pad values (0 for image, 255 for seg)
    assert (out["sem_seg"] == 255).any()
    assert set(np.unique(out["sem_seg"])) <= {2, 255}
    # prob=0 is identity
    out2 = random_rotate(s, rng, prob=0.0)
    np.testing.assert_array_equal(out2["image"], img)


def test_fixed_palettes_and_real_class_names():
    from spike2former_tpu.data.metainfo import DATASETS, ade_palette

    assert DATASETS["pascal_context"].classes[:3] == (
        "background", "aeroplane", "bag")
    assert DATASETS["synapse"].num_classes == 9
    assert DATASETS["coco_stuff164k"].classes[0] == "person"
    assert len(ade_palette()) == 150 and ade_palette()[0] == [120, 120, 120]
    assert len(DATASETS["cityscapes"].palette) == 19


def test_crop_flip_pad():
    rng = np.random.default_rng(0)
    s = {"image": np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3),
         "sem_seg": np.ones((40, 60), np.int32), "meta": {}}
    c = random_crop(s, rng, (32, 32), cat_max_ratio=1.0)
    assert c["image"].shape == (32, 32, 3)
    f = random_flip(c, rng, prob=1.0)
    np.testing.assert_array_equal(f["image"][:, ::-1], c["image"])
    p = pad_to(c, (48, 48), seg_pad_val=255)
    assert p["image"].shape == (48, 48, 3)
    assert (p["sem_seg"][40:] == 255).all()


def test_train_pipeline_static_shape(ade_root):
    ds = make_dataset("ade20k", ade_root, "train")
    rng = np.random.default_rng(1)
    s = train_pipeline(ds.load(1), rng, crop_size=(64, 64))
    assert s["image"].shape == (64, 64, 3)
    assert s["sem_seg"].shape == (64, 64)


def test_train_loader_batches(ade_root):
    ds = make_dataset("ade20k", ade_root, "train")
    loader = TrainLoader(ds, batch_size=2, crop_size=(64, 64),
                         num_workers=2)
    it = iter(loader)
    imgs, segs = next(it)
    assert imgs.shape == (2, 64, 64, 3) and segs.shape == (2, 64, 64)
    loader.close()


def test_eval_batches_divisor(ade_root):
    ds = make_dataset("ade20k", ade_root, "val")
    img, seg, metas = next(eval_batches(ds, scale=(128, 96)))
    assert img.shape[1] % 32 == 0 and img.shape[2] % 32 == 0
    assert seg is not None
    # GT stays at ORIGINAL resolution (reference scoring protocol); metas
    # carry everything postprocess_pred needs.
    m = metas[0]
    assert seg.shape[1:] == tuple(m["ori_shape"])
    assert "pad_shape" in m and "img_shape" in m
    assert m["pad_shape"][0] <= img.shape[1]
