"""Resize parity vs torch F.interpolate."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from spike2former_tpu.ops import (
    resize_bilinear, resize_bilinear_align_corners, resize_nearest_torch)


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    t = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    kwargs = {} if align_corners is None else {"align_corners": align_corners}
    out = F.interpolate(t, size=size, mode=mode, **kwargs)
    return out.permute(0, 2, 3, 1).numpy()


def test_bilinear_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    for size in [(32, 48), (7, 11), (16, 24), (5, 64)]:
        want = _torch_resize(x, size, "bilinear", False)
        got = np.asarray(resize_bilinear(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_bilinear_align_corners_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 9, 13, 4)).astype(np.float32)
    for size in [(18, 26), (5, 7)]:
        want = _torch_resize(x, size, "bilinear", True)
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_nearest_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 10, 14, 2)).astype(np.float32)
    for size in [(20, 28), (3, 5), (17, 9)]:
        want = _torch_resize(x, size, "nearest")
        got = np.asarray(resize_nearest_torch(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want)


def test_bilinear_hw_matches_torch_channels_first():
    from spike2former_tpu.ops.resize import resize_bilinear_hw

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 11, 15)).astype(np.float32)  # [B, C, H, W]
    for size in [(22, 30), (6, 8), (32, 32)]:
        want = F.interpolate(torch.from_numpy(x), size=size,
                             mode="bilinear", align_corners=False).numpy()
        got = np.asarray(resize_bilinear_hw(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
