"""Point-sampled loss parity vs torch (mmcv point_sample = grid_sample
align_corners=False + zero padding; mmdet get_uncertain_point_coords_with_
randomness, point_sample.py:34-88) and criterion integration."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from spike2former_tpu.losses.criterion import (
    GroundTruth, maskformer_loss, semantic_to_instances)
from spike2former_tpu.losses.point_sample import (
    point_sample, point_sample_slot, uncertain_point_coords)


def torch_point_sample(masks: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """mmcv point_sample transcription: denormalize to [-1, 1] then
    grid_sample(bilinear, align_corners=False, padding zeros)."""
    inp = torch.from_numpy(masks).float().unsqueeze(1)  # [N, 1, H, W]
    grid = torch.from_numpy(coords).float() * 2.0 - 1.0  # [N, P, 2]
    out = F.grid_sample(inp, grid.unsqueeze(2), mode="bilinear",
                        align_corners=False, padding_mode="zeros")
    return out.squeeze(3).squeeze(1).numpy()  # [N, P]


def test_point_sample_matches_torch_grid_sample():
    rng = np.random.default_rng(0)
    masks = rng.normal(size=(5, 9, 13)).astype(np.float32)
    coords = rng.uniform(size=(5, 37, 2)).astype(np.float32)
    # exercise the zero-padding edge: exact 0/1 coords read half a pixel
    # outside and must blend with zeros, not clamp
    coords[:, :4] = np.array([[0, 0], [1, 1], [0, 1], [1, 0]], np.float32)
    got = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))
    want = torch_point_sample(masks, coords)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_point_sample_leading_dims():
    rng = np.random.default_rng(1)
    masks = rng.normal(size=(2, 3, 6, 7)).astype(np.float32)
    coords = rng.uniform(size=(2, 3, 11, 2)).astype(np.float32)
    got = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))
    want = torch_point_sample(masks.reshape(6, 6, 7),
                              coords.reshape(6, 11, 2)).reshape(2, 3, 11)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_point_sample_slot_equals_dense():
    """Slot-map sampling must be bit-equal to bilinearly sampling the dense
    per-slot binary masks — shared and per-pair coords."""
    rng = np.random.default_rng(2)
    b, g, h, w = 2, 4, 8, 10
    slot_map = rng.integers(0, g + 1, (b, h, w)).astype(np.int32)
    dense = (slot_map[:, None] == np.arange(g)[None, :, None, None]
             ).astype(np.float32)

    shared = rng.uniform(size=(b, 17, 2)).astype(np.float32)
    got = np.asarray(point_sample_slot(
        jnp.asarray(slot_map), g, jnp.asarray(shared)))
    want = np.asarray(point_sample(
        jnp.asarray(dense),
        jnp.broadcast_to(jnp.asarray(shared)[:, None], (b, g, 17, 2))))
    np.testing.assert_allclose(got, want, atol=1e-6)

    per_pair = rng.uniform(size=(b, g, 17, 2)).astype(np.float32)
    got = np.asarray(point_sample_slot(
        jnp.asarray(slot_map), g, jnp.asarray(per_pair)))
    want = np.asarray(point_sample(jnp.asarray(dense),
                                   jnp.asarray(per_pair)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_uncertain_point_coords_reference_semantics():
    """Given the exact uniforms the jax fn draws, the selection must equal
    the reference algorithm (oversample -> sample logits -> -|logit| topk
    -> refill random), transcribed here in numpy."""
    rng = np.random.default_rng(3)
    logits = rng.normal(scale=3.0, size=(4, 12, 12)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    num_points, osr, imp = 16, 3.0, 0.75

    got = np.asarray(uncertain_point_coords(
        key, jnp.asarray(logits), num_points, osr, imp))

    r1, r2 = jax.random.split(key)
    n_sampled = int(num_points * osr)
    n_imp = int(imp * num_points)
    coords = np.asarray(jax.random.uniform(r1, (4, n_sampled, 2)))
    sampled = torch_point_sample(logits, coords)
    unc = -np.abs(sampled)
    idx = np.argsort(-unc, axis=1, kind="stable")[:, :n_imp]
    want_imp = np.take_along_axis(coords, idx[..., None], axis=1)
    rand = np.asarray(jax.random.uniform(
        r2, (4, num_points - n_imp, 2)))

    assert got.shape == (4, num_points, 2)
    np.testing.assert_allclose(got[:, n_imp:], rand, atol=1e-6)
    # topk vs argsort may order ties differently; compare as sorted sets
    np.testing.assert_allclose(np.sort(got[:, :n_imp], axis=1),
                               np.sort(want_imp, axis=1), atol=1e-6)


def _toy_inputs(seed=0, b=2, nq=5, g=4, k=3, h=8, w=8, gh=16, gw=16, L=2):
    rng = np.random.default_rng(seed)
    cls_scores = jnp.asarray(rng.normal(size=(L, b, nq, k + 1)), jnp.float32)
    mask_preds = jnp.asarray(rng.normal(size=(L, b, nq, h, w)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, k, (b, gh, gw)), jnp.int32)
    gt = semantic_to_instances(sem, k, g)
    return cls_scores, mask_preds, gt


def test_criterion_point_mode_runs_and_grads_flow():
    cls_scores, mask_preds, gt = _toy_inputs()

    def total(mp):
        return maskformer_loss(
            cls_scores, mp, gt, num_classes=3, matcher="auction",
            num_points=32, rng=jax.random.PRNGKey(0))["total"]

    val, grad = jax.value_and_grad(total)(mask_preds)
    assert np.isfinite(float(val))
    gnorm = float(jnp.linalg.norm(grad))
    assert np.isfinite(gnorm) and gnorm > 0

    # deterministic given the rng key
    val2 = total(mask_preds)
    assert float(val) == float(val2)
    # a different key draws different points
    val3 = maskformer_loss(
        cls_scores, mask_preds, gt, num_classes=3, matcher="auction",
        num_points=32, rng=jax.random.PRNGKey(1))["total"]
    assert float(val) != float(val3)


def test_criterion_point_mode_dense_masks_and_compact():
    """Dense-mask GT and the compact_gt cond path both work under points."""
    cls_scores, mask_preds, gt = _toy_inputs(seed=1)
    dense = GroundTruth(gt.labels, gt.dense_masks(), gt.valid)
    out = maskformer_loss(
        cls_scores, mask_preds, dense, num_classes=3, matcher="auction",
        num_points=32, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(out["total"]))

    compact = maskformer_loss(
        cls_scores, mask_preds, gt, num_classes=3, matcher="auction",
        compact_gt=2, num_points=32, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(compact["total"]))


def test_point_focal_converges_to_exact_with_uniform_points():
    """With importance=0 (pure uniform) the point focal loss is a
    Monte-Carlo estimate of the exact GT-resolution focal loss: same
    FIXED assignment, large-ish shapes (the zero-padded half-pixel
    boundary band shrinks with resolution), large P -> close values.
    (Dice is a ratio — consistent but not unbiased — sanity bound only.)"""
    from spike2former_tpu.losses.criterion import _layer_loss

    rng = np.random.default_rng(4)
    b, nq, g, k, h, w, gh, gw = 1, 6, 4, 3, 32, 32, 64, 64
    cls_scores = jnp.asarray(rng.normal(size=(b, nq, k + 1)), jnp.float32)
    mask_preds = jnp.asarray(rng.normal(size=(b, nq, h, w)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, k, (b, gh, gw)), jnp.int32)
    gt = semantic_to_instances(sem, k, g)
    g = gt.labels.shape[1]  # compacted to min(max_gt, num_classes)
    matched_q = jnp.where(gt.valid, jnp.arange(g)[None], -1)
    from spike2former_tpu.ops.resize import resize_nearest_torch
    slot_ds = resize_nearest_torch(gt.slot_map[..., None], (h, w))[..., 0]
    kw = dict(num_classes=k,
              class_weight=jnp.asarray([1.0] * k + [0.1], jnp.float32),
              focal_weight=20.0, dice_weight=1.0,
              num_total_masks=jnp.sum(gt.valid.astype(jnp.float32)))

    exact = _layer_loss(cls_scores, mask_preds, matched_q, gt,
                        None, slot_ds, loss_at="gt", **kw)
    pts = _layer_loss(cls_scores, mask_preds, matched_q, gt,
                      None, slot_ds, point_cfg=(16384, 1.0, 0.0, jnp.float32),
                      rng=jax.random.PRNGKey(0), **kw)
    assert float(pts["loss_cls"]) == float(exact["loss_cls"])
    np.testing.assert_allclose(float(pts["loss_mask"]),
                               float(exact["loss_mask"]), rtol=0.12)
    np.testing.assert_allclose(float(pts["loss_dice"]),
                               float(exact["loss_dice"]), rtol=0.25)


def test_point_sample_shared_equals_broadcast():
    rng = np.random.default_rng(7)
    b, q, h, w, p = 2, 5, 9, 11, 17
    masks = rng.normal(size=(b, q, h, w)).astype(np.float32)
    coords = rng.uniform(-0.05, 1.05, size=(b, p, 2)).astype(np.float32)

    from spike2former_tpu.losses.point_sample import point_sample_shared

    got = np.asarray(point_sample_shared(jnp.asarray(masks),
                                         jnp.asarray(coords)))
    want = np.asarray(point_sample(
        jnp.asarray(masks),
        jnp.broadcast_to(jnp.asarray(coords)[:, None], (b, q, p, 2))))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and vs torch grid_sample directly
    ref = torch_point_sample(
        masks.reshape(b * q, h, w),
        np.broadcast_to(coords[:, None], (b, q, p, 2)).reshape(b * q, p, 2))
    np.testing.assert_allclose(got.reshape(b * q, p), ref, atol=1e-5)


def test_point_sample_chunked_matches_unchunked_and_grads():
    rng = np.random.default_rng(3)
    n, h, w, p = 3, 8, 8, 53
    masks = rng.normal(size=(n, h, w)).astype(np.float32)
    coords = rng.uniform(0, 1, size=(n, p, 2)).astype(np.float32)
    mj, cj = jnp.asarray(masks), jnp.asarray(coords)
    full = point_sample(mj, cj, chunk=4096)
    chunked = point_sample(mj, cj, chunk=16)  # forces padding + lax.map
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-6)

    # the mask gradient must agree between the chunked and unchunked paths
    # (chunked backward runs through lax.map + checkpoint)
    def loss(m, chunk):
        return (point_sample(m, cj, chunk=chunk) ** 2).sum()

    g_full = jax.grad(lambda m: loss(m, 4096))(mj)
    g_chunk = jax.grad(lambda m: loss(m, 16))(mj)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk),
                               atol=1e-5)
    # and vs torch autograd through grid_sample
    mt = torch.from_numpy(masks).requires_grad_(True)
    inp = mt.unsqueeze(1)
    grid = torch.from_numpy(coords) * 2.0 - 1.0
    out = F.grid_sample(inp, grid.unsqueeze(2), mode="bilinear",
                        align_corners=False, padding_mode="zeros")
    (out.squeeze(3).squeeze(1) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(g_full), mt.grad.numpy(),
                               atol=1e-4)


def test_point_sample_bf16_close_to_f32():
    """The loss_points_dtype knob: bf16 selector contractions track the
    f32 (mmcv-exact) sampler to lerp-weight rounding (~0.4%)."""
    rng = np.random.default_rng(5)
    masks = jnp.asarray(rng.standard_normal((2, 3, 16, 16)), jnp.float32)
    coords = jnp.asarray(rng.uniform(size=(2, 3, 64, 2)), jnp.float32)
    f32 = np.asarray(point_sample(masks, coords))
    b16 = np.asarray(point_sample(masks, coords, dtype=jnp.bfloat16))
    np.testing.assert_allclose(b16, f32, rtol=0.02, atol=0.02)
