"""Native C++ runtime tests (build + parity with PIL/torch semantics)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from spike2former_tpu import runtime


@pytest.fixture(scope="module")
def lib_ok():
    if not runtime.available():
        pytest.skip("native runtime not buildable")
    return True


def test_decode_jpeg_roundtrip(lib_ok, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 3), np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=95)
    got = runtime.decode_image(str(p))
    want = np.asarray(Image.open(p).convert("RGB"))
    assert got.shape == want.shape
    # JPEG decoders may differ by a few LSBs
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 2.0


def test_decode_png_exact(lib_ok, tmp_path):
    rng = np.random.default_rng(1)
    seg = rng.integers(0, 200, (25, 31), np.uint8)
    p = tmp_path / "s.png"
    Image.fromarray(seg).save(p)
    got = runtime.decode_image(str(p))
    np.testing.assert_array_equal(got[..., 0], seg)


def test_resize_bilinear_matches_torch(lib_ok):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (40, 60, 3), np.uint8)
    got = runtime.resize_bilinear_u8(img, 80, 120).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None],
        size=(80, 120), mode="bilinear", align_corners=False
    )[0].permute(1, 2, 0).numpy()
    assert np.abs(got - want).max() <= 1.0  # u8 rounding


def test_resize_nearest_matches_torch(lib_ok):
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 150, (33, 47), np.int32)
    got = runtime.resize_nearest_i32(seg, 17, 23)
    want = F.interpolate(
        torch.from_numpy(seg.astype(np.float32))[None, None],
        size=(17, 23), mode="nearest")[0, 0].numpy().astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_normalize(lib_ok):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (8, 9, 3), np.uint8)
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    got = runtime.normalize_f32(img, mean, std)
    want = (img.astype(np.float32) - mean) / std
    # C++ uses multiply-by-reciprocal; allow one ulp of divergence
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
