"""mosaic / cutout / CLAHE transforms (mmseg transforms.py RandomMosaic,
RandomCutOut, CLAHE)."""
import numpy as np

from spike2former_tpu.data.transforms import clahe, mosaic, random_cutout


def _sample(h, w, val, seg_val):
    return {"image": np.full((h, w, 3), val, np.uint8),
            "sem_seg": np.full((h, w), seg_val, np.int32), "meta": {}}


def test_mosaic_quadrants_and_padding():
    rng = np.random.default_rng(0)
    samples = [_sample(60, 70, 10 * (i + 1), i) for i in range(4)]
    out = mosaic(samples, rng, img_scale=(64, 64))
    img, seg = out["image"], out["sem_seg"]
    assert img.shape == (128, 128, 3) and seg.shape == (128, 128)
    vals = set(np.unique(img).tolist())
    assert vals <= {0, 10, 20, 30, 40}  # pad + the 4 sources
    assert {10, 20, 30, 40} <= vals     # every quadrant contributed
    segs = set(np.unique(seg).tolist())
    assert {0, 1, 2, 3} <= segs and segs <= {0, 1, 2, 3, 255}
    # the four source regions tile around one center: the quadrant
    # corner pixel values must match their quadrant's source
    cyx = np.argwhere(img[..., 0] == 10)
    assert cyx.size  # top-left block present


def test_cutout_fills_image_and_ignores_seg():
    rng = np.random.default_rng(1)
    s = _sample(64, 64, 100, 5)
    out = random_cutout(s, rng, prob=1.0, fill_in=(7, 7, 7))
    assert (out["image"] == 7).any()
    assert (out["sem_seg"] == 255).any()
    # untouched elsewhere
    assert (out["image"][out["sem_seg"] == 5] == 100).all()
    # prob=0 is identity
    out2 = random_cutout(s, np.random.default_rng(2), prob=0.0)
    np.testing.assert_array_equal(out2["image"], s["image"])


def test_clahe_properties():
    rng = np.random.default_rng(2)
    # uniform image: CLAHE must not invent structure (≈ constant out)
    flat = {"image": np.full((64, 64, 3), 128, np.uint8)}
    out = clahe(flat)["image"]
    assert len(np.unique(out)) <= 2  # rounding may split one level

    # low-contrast noisy image: local contrast must increase
    base = (rng.normal(128, 4, (64, 64, 3))).clip(0, 255).astype(np.uint8)
    s = {"image": base}
    out = clahe(s)["image"]
    assert out.shape == base.shape and out.dtype == np.uint8
    assert out.std() > base.std() * 1.5
    # deterministic
    np.testing.assert_array_equal(out, clahe(s)["image"])


def test_multi_image_mix_pipeline_and_loader(tmp_path):
    """MultiImageMixDataset equivalence (mmseg dataset_wrappers.py): the
    loader's mosaic_prob knob must route 4 raw samples through mosaic and
    the standard pipeline, yielding static-shape batches whose content
    mixes multiple source images."""
    import os
    from PIL import Image
    from spike2former_tpu.data import TrainLoader, make_dataset
    from spike2former_tpu.data.transforms import train_pipeline_mix

    root = tmp_path / "ade"
    for split in ("training",):
        os.makedirs(root / "images" / split)
        os.makedirs(root / "annotations" / split)
        for i in range(4):
            # constant-color images so source attribution is readable
            img = np.full((96, 96, 3), 40 * (i + 1), np.uint8)
            seg = np.full((96, 96), i, np.uint8)
            Image.fromarray(img).save(root / "images" / split / f"i{i}.jpg")
            Image.fromarray(seg).save(
                root / "annotations" / split / f"i{i}.png")

    ds = make_dataset("ade20k", str(root), "train")

    # pipeline level: mosaic_prob=1 must mix content from >1 source
    rng = np.random.default_rng(3)
    order = iter([1, 2, 3])
    s = train_pipeline_mix(
        ds.load(0), lambda: ds.load(next(order)), rng,
        crop_size=(64, 64), mosaic_prob=1.0)
    assert s["image"].shape == (64, 64, 3)
    assert s["sem_seg"].shape == (64, 64)
    # ade20k reduce_zero_label maps stored {0..3} -> {255, 0, 1, 2}
    srcs = set(np.unique(s["sem_seg"]).tolist()) - {255}
    assert len(srcs) >= 2, f"mosaic crop drew from one source: {srcs}"

    # loader level: the knob is wired end to end
    loader = TrainLoader(ds, batch_size=2, crop_size=(64, 64),
                         num_workers=2, mosaic_prob=1.0, seed=0)
    imgs, segs = next(iter(loader))
    assert imgs.shape == (2, 64, 64, 3) and segs.shape == (2, 64, 64)
    loader.close()
