"""API / TTA / panoptic / visualization tests."""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.evaluation.tta import panoptic_inference, tta_logits
from spike2former_tpu.evaluation.visualize import (
    draw_sem_seg, write_cityscapes_pred)


def test_tta_flip_consistency():
    """For a flip-equivariant predictor, TTA must equal the plain
    prediction."""
    def predict(x):
        return jnp.stack([x[..., 0], -x[..., 0]], axis=-1)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 8, 10, 3)), jnp.float32)
    plain = predict(imgs)
    avg = tta_logits(predict, imgs, scales=(1.0,), flip=True)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(plain),
                               atol=1e-6)


def test_tta_multiscale_shape():
    def predict(x):
        return jnp.zeros(x.shape[:3] + (5,))

    imgs = jnp.zeros((1, 16, 16, 3))
    out = tta_logits(predict, imgs, scales=(0.5, 1.0, 1.5))
    assert out.shape == (1, 16, 16, 5)


def test_panoptic_inference():
    b, nq, h, w, k = 1, 3, 6, 6, 4
    cls = jnp.full((b, nq, k + 1), -10.0)
    cls = cls.at[0, 0, 1].set(10.0)   # query0 -> class1 confident
    cls = cls.at[0, 1, 3].set(10.0)   # query1 -> class3 confident
    cls = cls.at[0, 2, k].set(10.0)   # query2 -> background
    masks = jnp.full((b, nq, h, w), -10.0)
    masks = masks.at[0, 0, :3].set(10.0)
    masks = masks.at[0, 1, 3:].set(10.0)
    sem, inst = panoptic_inference(cls, masks, num_things=4)
    assert (np.asarray(sem[0, :3]) == 1).all()
    assert (np.asarray(sem[0, 3:]) == 3).all()
    assert (np.asarray(inst[0, :3]) == 1).all()
    assert (np.asarray(inst[0, 3:]) == 2).all()


def test_draw_sem_seg_and_cityscapes_writer(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    seg = np.asarray([[0, 1, 2, 255]] * 4, np.int32)
    out = draw_sem_seg(img, seg)
    assert out.shape == img.shape
    # ignore pixels keep the source image
    np.testing.assert_array_equal(out[:, 3], img[:, 3])

    p = write_cityscapes_pred(seg.clip(0, 18).astype(np.int32),
                              str(tmp_path / "pred.png"))
    from PIL import Image
    ids = np.asarray(Image.open(p))
    assert ids[0, 0] == 7  # road trainId 0 -> labelId 7


def test_init_and_inference_model(tmp_path):
    """api.init_model/inference_model end-to-end on a tiny config."""
    import os

    import numpy as np
    from PIL import Image

    from spike2former_tpu.api import inference_model, init_model
    from spike2former_tpu.engine.config import get_config

    cfg = get_config("SDTv2_maskformer_DCNpixelDecoder_ade20k")
    cfg.model.embed_dim = (8, 16, 24, 32)
    cfg.model.backbone_heads = 4
    cfg.model.feat_channels = 16
    cfg.model.num_queries = 4
    cfg.model.num_decoder_layers = 1
    cfg.model.num_encoder_layers = 1
    cfg.model.depths_stage3 = 1
    cfg.model.depths_stage4 = 1
    cfg.model.dcn_group = 4
    cfg.model.num_classes = 12
    cfg.data.crop_size = (32, 32)
    cfg.data.test_scale = (96, 64)

    m = init_model(cfg)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 70, 3), np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(img).save(p)
    pred = inference_model(m, str(p))
    assert pred.shape == (50, 70)
    assert pred.dtype == np.int32
    assert pred.min() >= 0 and pred.max() < 12


def test_cityscapes_official_protocol(tmp_path):
    """Native reimplementation of cityscapesscripts'
    evalPixelLevelSemanticLabeling core: hand-computed IoUs, void-GT
    exclusion, and the directory protocol via the submission writer."""
    import os

    from PIL import Image

    from spike2former_tpu.evaluation import (
        CityscapesEval, evaluate_cityscapes_dir)
    from spike2former_tpu.evaluation.visualize import (
        CITYSCAPES_TRAIN2LABEL, write_cityscapes_pred)

    # GT: left half road(7), right half sky(23); top row void(0)
    gt = np.full((8, 8), 7, np.uint8)
    gt[:, 4:] = 23
    gt[0, :] = 0
    # pred in trainIds: road=0, sky=10; get half the sky wrong as road
    pred_train = np.zeros((8, 8), np.int32)
    pred_train[:, 4:] = 10
    pred_train[:, 6:] = 0  # wrong: road where GT says sky
    pred_label = CITYSCAPES_TRAIN2LABEL[pred_train]

    ev = CityscapesEval()
    ev.update(pred_label, gt)
    res = ev.compute()
    # valid pixels: 7 rows; road GT 7x4=28 all correct, road FP 7x2=14
    # -> IoU_road = 28/42; sky: TP 14, FN 14 -> 0.5
    np.testing.assert_allclose(res["classes"]["road"], 100 * 28 / 42)
    np.testing.assert_allclose(res["classes"]["sky"], 50.0)

    # directory protocol via the submission writer
    pdir = tmp_path / "pred"
    gdir = tmp_path / "gt" / "val" / "city"
    os.makedirs(gdir)
    write_cityscapes_pred(pred_train,
                          str(pdir / "val" / "city" / "x_leftImg8bit.png"))
    Image.fromarray(gt).save(gdir / "x_gtFine_labelIds.png")
    out = evaluate_cityscapes_dir(str(pdir), str(tmp_path / "gt"))
    assert out["images"] == 1
    np.testing.assert_allclose(out["classes"]["sky"], 50.0)

    # perfect prediction -> 100
    ev2 = CityscapesEval()
    ev2.update(gt, gt)
    assert ev2.compute()["mIoU"] == 100.0


def test_inferencer_batch_and_visualization(tmp_path):
    """MMSegInferencer equivalent: list input, overlay writing."""
    import numpy as np

    from spike2former_tpu.api import Inferencer
    from spike2former_tpu.engine.config import get_config

    cfg = get_config("SDTv2_maskformer_DCNpixelDecoder_ade20k", [
        "model.num_classes=5", "model.embed_dim=(8,16,24,32)",
        "model.backbone_heads=4", "model.feat_channels=16",
        "model.num_queries=4", "model.num_decoder_layers=1",
        "model.num_encoder_layers=1", "model.depths_stage3=1",
        "model.depths_stage4=1", "model.dcn_group=4",
        "data.crop_size=(64,64)", "data.test_scale=(96,64)"])
    inf = Inferencer(cfg)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (70, 90, 3)).astype(np.uint8)
            for _ in range(2)]
    out = inf(imgs, out_dir=str(tmp_path))
    assert len(out["predictions"]) == 2
    assert out["predictions"][0].shape == (70, 90)
    assert len(out["visualization"]) == 2
    import os
    assert all(os.path.exists(p) for p in out["visualization"])
    assert len(inf.classes) == 150  # metainfo classes of the preset dataset
