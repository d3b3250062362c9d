"""COCO-panoptic stack: dataset (JSON + id-PNG), GT conversion, PQ metric
(panopticapi protocol), and the e2e panoptic inference/training paths."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from spike2former_tpu.data import (
    PanopticDataset, decode_pan_png, encode_pan_png, panoptic_maps,
    panoptic_to_instances, panoptic_train_batches)
from spike2former_tpu.evaluation import PQStat, compute_pq, pq_update


@pytest.fixture(scope="module")
def pan_root(tmp_path_factory):
    """Tiny COCO-panoptic layout: 2 categories of things, 1 stuff."""
    root = tmp_path_factory.mktemp("coco_pan")
    rng = np.random.default_rng(0)
    cats = [
        {"id": 7, "name": "cat", "isthing": 1},
        {"id": 11, "name": "dog", "isthing": 1},
        {"id": 21, "name": "grass", "isthing": 0},
    ]
    images, annotations = [], []
    for split in ("train", "val"):
        os.makedirs(root / f"{split}2017")
        os.makedirs(root / "annotations" / f"panoptic_{split}2017",
                    exist_ok=True)
        for i in range(3):
            h, w = 96, 128
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            # segment ids: 1001 (cat instance), 1002 (dog), 2000 (grass)
            pan = np.full((h, w), 2000, np.int32)
            pan[10:40, 10:50] = 1001
            pan[50:90, 60:120] = 1002
            pan[:5, :5] = 0  # VOID
            name = f"{split}_{i:04d}"
            Image.fromarray(img).save(root / f"{split}2017" / f"{name}.jpg")
            Image.fromarray(encode_pan_png(pan)).save(
                root / "annotations" / f"panoptic_{split}2017" /
                f"{name}.png")
            images.append({"id": len(images), "file_name": f"{name}.jpg",
                           "width": w, "height": h})
            annotations.append({
                "image_id": images[-1]["id"],
                "file_name": f"{name}.png",
                "segments_info": [
                    {"id": 1001, "category_id": 7, "iscrowd": 0,
                     "area": 1200},
                    {"id": 1002, "category_id": 11, "iscrowd": 0,
                     "area": 2400},
                    {"id": 2000, "category_id": 21, "iscrowd": 0,
                     "area": 9000},
                ],
            })
        meta = {"images": images[-3:], "annotations": annotations[-3:],
                "categories": cats}
        with open(root / "annotations" /
                  f"panoptic_{split}2017.json", "w") as f:
            json.dump(meta, f)
    return str(root)


def test_png_id_roundtrip():
    ids = np.asarray([[0, 1001], [70000, 16777215]], np.int32)
    np.testing.assert_array_equal(decode_pan_png(encode_pan_png(ids)), ids)


def test_panoptic_dataset_contiguous_labels(pan_root):
    ds = PanopticDataset(pan_root, "val")
    assert ds.num_things == 2 and ds.num_stuff == 1
    assert ds.classes == ("cat", "dog", "grass")
    s = ds.load(0)
    assert s["pan_ids"].shape == s["image"].shape[:2]
    labels = {lab for _, lab, _ in s["segments"]}
    assert labels == {0, 1, 2}  # things 0..1, stuff 2


def test_panoptic_to_instances(pan_root):
    ds = PanopticDataset(pan_root, "val")
    s = ds.load(0)
    labels, masks, valid = panoptic_to_instances(
        s["pan_ids"], s["segments"], max_gt=8, num_things=2)
    assert valid.sum() == 3
    assert masks[valid.argmax()].sum() == 30 * 40  # the cat instance
    # crowd segments are skipped
    segs = [(1001, 0, 1)] + s["segments"][1:]
    _, _, v2 = panoptic_to_instances(s["pan_ids"], segs, 8, 2)
    assert v2.sum() == 2


def test_pq_perfect_prediction():
    gt_label = np.asarray([[0, 0, 1], [2, 2, -1]])
    gt_inst = np.asarray([[1, 1, 2], [0, 0, 0]])
    stat = pq_update(PQStat(3), gt_label, gt_inst, gt_label, gt_inst)
    res = compute_pq(stat, num_things=2)
    assert res["PQ"] == 100.0 and res["SQ"] == 100.0 and res["RQ"] == 100.0


def test_pq_partial_and_fp_fn():
    # GT: one 4x4 segment of class 0. Pred: covers 3 of 4 columns (IoU .75)
    gt_label = np.zeros((4, 4), np.int32)
    gt_inst = np.ones((4, 4), np.int32)
    pred_label = np.full((4, 4), -1, np.int32)
    pred_label[:, :3] = 0
    pred_inst = np.where(pred_label == 0, 5, 0)
    stat = pq_update(PQStat(2), pred_label, pred_inst, gt_label, gt_inst)
    # NB void subtraction: pred∩void=0; union = 12+16-12 = 16 -> IoU 0.75
    assert stat.tp[0] == 1 and abs(stat.iou[0] - 0.75) < 1e-6
    assert stat.fp.sum() == 0 and stat.fn.sum() == 0

    # a sub-threshold overlap is FP + FN
    pred_label2 = np.full((4, 4), -1, np.int32)
    pred_label2[:1] = 0  # 4 of 16 pixels
    pred_inst2 = np.where(pred_label2 == 0, 9, 0)
    st2 = pq_update(PQStat(2), pred_label2, pred_inst2, gt_label, gt_inst)
    assert st2.tp[0] == 0 and st2.fp[0] == 1 and st2.fn[0] == 1


def test_pq_void_and_crowd_rules():
    gt_label = np.zeros((4, 4), np.int32)
    gt_inst = np.ones((4, 4), np.int32)
    # prediction entirely inside VOID is not a FP
    gt_label_v = np.full((4, 4), -1, np.int32)
    pred_label = np.zeros((4, 4), np.int32)
    pred_inst = np.ones((4, 4), np.int32)
    st = pq_update(PQStat(2), pred_label, pred_inst, gt_label_v,
                   np.zeros((4, 4), np.int32))
    assert st.fp.sum() == 0

    # crowd GT: not matched, not FN; same-class pred over crowd not FP
    crowd = np.ones((4, 4), bool)
    st2 = pq_update(PQStat(2), pred_label, pred_inst, gt_label, gt_inst,
                    gt_crowd=crowd)
    assert st2.tp.sum() == 0 and st2.fn.sum() == 0 and st2.fp.sum() == 0


def test_panoptic_train_batches_and_step(pan_root):
    from spike2former_tpu.engine import (
        init_state, make_optimizer, make_train_step_panoptic)
    from spike2former_tpu.models import Spike2Former

    ds = PanopticDataset(pan_root, "train")
    it = panoptic_train_batches(ds, batch_size=2, crop_size=(64, 64),
                                max_gt=6, seed=0)
    images, labels, masks, valid = next(it)
    assert images.shape == (2, 64, 64, 3)
    assert labels.shape == (2, 6) and masks.shape == (2, 6, 64, 64)
    assert valid.any()

    model = Spike2Former(
        num_classes=3, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1, dcn_group=4)
    x = jnp.asarray(images)
    tx = make_optimizer(model.init(jax.random.PRNGKey(0), x, True)["params"])
    state = init_state(model, tx, jax.random.PRNGKey(0), x)
    step = jax.jit(make_train_step_panoptic(model, tx, num_classes=3))
    state2, metrics = step(state, x, jnp.asarray(labels),
                           jnp.asarray(masks), jnp.asarray(valid))
    assert np.isfinite(float(metrics["total"]))
    assert int(state2.step) == 1


def test_whole_panoptic_e2e(pan_root):
    from spike2former_tpu.engine import whole_panoptic
    from spike2former_tpu.models import Spike2Former

    ds = PanopticDataset(pan_root, "val")
    s = ds.load(0)
    model = Spike2Former(
        num_classes=3, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1, dcn_group=4)
    img = jnp.asarray(s["image"][None].astype(np.float32))
    vars_ = model.init(jax.random.PRNGKey(0),
                       jnp.zeros_like(img))
    sem, inst = whole_panoptic(model, vars_, img, num_things=2)
    assert sem.shape == (1, *s["image"].shape[:2])
    assert inst.shape == sem.shape
    assert int(jnp.min(sem)) >= -1 and int(jnp.max(sem)) < 3
    # the maps feed the PQ metric without error
    gt_label, gt_inst, gt_crowd = panoptic_maps(s["pan_ids"], s["segments"])
    stat = pq_update(PQStat(3), np.asarray(sem[0]), np.asarray(inst[0]),
                     gt_label, gt_inst, gt_crowd)
    res = compute_pq(stat, num_things=2)
    assert np.isfinite(res["PQ"]) or res["PQ"] == 0.0
