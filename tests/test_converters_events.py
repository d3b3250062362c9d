"""Dataset-converter breadth (round-3 VERDICT item 9): voc_aug .mat
conversion, pascal_context Detail-JSON conversion with self-contained RLE
decoding, event voxelization, and the DDD17 .npy pipeline end-to-end at a
non-square eval resolution."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

_spec = importlib.util.spec_from_file_location(
    "dataset_converters",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "dataset_converters.py"))
dc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dc)


def test_voc_aug_converter(tmp_path):
    from scipy.io import savemat

    sbd = tmp_path / "sbd"
    voc = tmp_path / "voc"
    (sbd / "dataset" / "cls").mkdir(parents=True)
    (voc / "ImageSets" / "Segmentation").mkdir(parents=True)

    rng = np.random.default_rng(0)
    segs = {}
    for stem in ("2008_000001", "2008_000002", "2008_000003"):
        seg = rng.integers(0, 21, (6, 8)).astype(np.uint8)
        segs[stem] = seg
        savemat(str(sbd / "dataset" / "cls" / f"{stem}.mat"),
                {"GTcls": {"Segmentation": seg}})
    # VOC's own lists: one SBD image is in val -> excluded from trainaug
    (voc / "ImageSets" / "Segmentation" / "train.txt").write_text(
        "2008_000010\n")
    (voc / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "2008_000002\n")

    n = dc.convert_voc_aug(str(sbd), str(voc))
    assert n == 3
    for stem, seg in segs.items():
        got = np.asarray(Image.open(voc / "SegmentationClassAug"
                                    / f"{stem}.png"))
        np.testing.assert_array_equal(got, seg)
    aug = (voc / "ImageSets" / "Segmentation"
           / "trainaug.txt").read_text().split()
    assert aug == ["2008_000001", "2008_000003", "2008_000010"]


def _rle_encode_counts(mask: np.ndarray) -> list[int]:
    """Column-major run lengths (starting with a 0-run) — the COCO RLE
    counts convention."""
    flat = mask.T.ravel()
    counts = []
    val, run = 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run)
            val, run = px, 1
    counts.append(run)
    return counts


def _rle_to_string(counts: list[int]) -> str:
    """pycocotools rleToString: 5-bit groups, +48 ascii, delta-coded from
    the 3rd element."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and \
                   not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_decode_rle_uncompressed_and_compressed():
    rng = np.random.default_rng(1)
    mask = (rng.random((7, 11)) < 0.4).astype(np.uint8)
    counts = _rle_encode_counts(mask)

    got_u = dc.decode_rle({"size": [7, 11], "counts": counts})
    np.testing.assert_array_equal(got_u, mask)

    # delta-coded compressed string must decode to the same mask
    s = _rle_to_string(counts)
    got_c = dc.decode_rle({"size": [7, 11], "counts": s})
    np.testing.assert_array_equal(got_c, mask)


def test_pascal_context_converter(tmp_path):
    voc = tmp_path / "voc"
    voc.mkdir()
    h, w = 6, 9
    # one annotation of raw category 2 (mapped index 1) as uncompressed RLE
    mask = np.zeros((h, w), np.uint8)
    mask[2:5, 3:7] = 1
    anno = {"image_id": 7, "category_id": 2,
            "segmentation": {"size": [h, w],
                             "counts": _rle_encode_counts(mask)}}
    # an out-of-subset category must be ignored (stays background)
    bogus = {"image_id": 7, "category_id": 999,
             "segmentation": {"size": [h, w],
                              "counts": _rle_encode_counts(
                                  np.ones((h, w), np.uint8))}}
    data = {"images": [{"image_id": 7, "file_name": "2008_000099.jpg",
                        "height": h, "width": w, "phase": "train"}],
            "annos_segmentation": [bogus, anno]}
    jp = tmp_path / "trainval_merged.json"
    jp.write_text(json.dumps(data))

    n = dc.convert_pascal_context(str(jp), str(voc))
    assert n == 1
    out = np.asarray(Image.open(
        voc / "SegmentationClassContext" / "2008_000099.png"))
    want = np.zeros((h, w), np.uint8)
    want[2:5, 3:7] = np.digitize(2, dc.PASCAL_CONTEXT_MAPPING, right=True)
    np.testing.assert_array_equal(out, want)
    lst = (voc / "ImageSets" / "SegmentationContext"
           / "train.txt").read_text().split()
    assert lst == ["2008_000099"]


def test_voxelize_events():
    # events: (t, x, y, p)
    ev = np.array([[0.0, 1, 2, 1], [0.1, 1, 2, 1], [0.9, 3, 0, 0],
                   [1.0, 3, 0, 0]], np.float64)
    out = dc.voxelize_events(ev, (4, 5), t_bins=2)
    assert out.shape == (2, 4, 5, 2)
    assert out[0, 2, 1, 1] == 2      # two positive events, first bin
    assert out[1, 0, 3, 0] == 2      # two negative events, last bin
    assert out.sum() == 4


def test_ddd17_pipeline_end_to_end(tmp_path):
    """DDD17 layout (.npy event frames + .png GT) through make_dataset,
    the train loader, and non-square bucketless eval batches — the
    iou_metric non-square case."""
    from spike2former_tpu.data import TrainLoader, make_dataset
    from spike2former_tpu.data.loader import eval_batches
    from spike2former_tpu.evaluation import (compute_iou, init_iou,
                                             update_iou_np)

    rng = np.random.default_rng(0)
    root = tmp_path / "ddd17"
    h, w = 100, 176  # non-square, the DDD17 aspect
    for split in ("training", "validation"):
        (root / "images" / split).mkdir(parents=True)
        (root / "annotations" / split).mkdir(parents=True)
        for i in range(3):
            frame = rng.integers(0, 20, (h, w, 2)).astype(np.uint8)
            np.save(root / "images" / split / f"rec{i}.npy", frame)
            Image.fromarray(rng.integers(0, 6, (h, w)).astype(
                np.uint8)).save(root / "annotations" / split / f"rec{i}.png")

    ds = make_dataset("ddd17", str(root), "train")
    assert len(ds) == 3
    s = ds.load(0)
    assert s["image"].shape == (h, w, 3)
    assert s["image"].dtype == np.uint8
    assert s["image"][..., 2].max() == 0  # zero-filled third channel
    assert s["sem_seg"].shape == (h, w)

    loader = TrainLoader(ds, batch_size=2, crop_size=(64, 64), seed=0,
                         num_workers=1, infinite=False)
    images, segs = next(iter(loader))
    loader.close()
    assert images.shape == (2, 64, 64, 3)
    assert segs.shape == (2, 64, 64)

    val = make_dataset("ddd17", str(root), "val")
    iou = init_iou(6)
    n = 0
    for images, sem, metas in eval_batches(val, scale=(176, 100),
                                           size_divisor=32, bucket=0):
        assert images.shape[1] != images.shape[2]  # non-square exercised
        pred = rng.integers(0, 6, sem.shape[1:])
        iou = update_iou_np(iou, pred, sem[0], 6)
        n += 1
    assert n == 3
    res = compute_iou(iou)
    assert np.isfinite(res["mIoU"])


@pytest.mark.skipif(sys.platform != "linux", reason="linux only")
def test_events_dir_conversion_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    src = tmp_path / "raw" / "training"
    src.mkdir(parents=True)
    ev = np.stack([np.sort(rng.random(500)),
                   rng.integers(0, 352, 500),
                   rng.integers(0, 200, 500),
                   rng.integers(0, 2, 500)], axis=1)
    np.save(src / "drive0.npy", ev)
    n = dc.convert_events_dir(str(tmp_path / "raw"), str(tmp_path / "out"),
                              (200, 352), 4)
    assert n == 1
    frame = np.load(tmp_path / "out" / "training" / "drive0.npy")
    assert frame.shape == (200, 352, 2)
    assert frame.dtype == np.uint8
