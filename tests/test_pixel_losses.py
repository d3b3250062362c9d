"""Parity tests for the mmseg pixel-loss zoo (losses/pixel.py).

Goldens are independent numpy/scipy implementations of the published
formulas (Lovasz-Softmax Alg.1, Tversky index, PIDNet balanced BCE and
OHEM selection, SegWithDistMap Hausdorff-DT loss) with explicit removal
of ignored pixels — the dynamic-shape semantics the masked JAX versions
must reproduce.
"""
import numpy as np
import pytest

from spike2former_tpu.losses.pixel import (
    boundary_loss, edt_sq, hausdorff_distance_loss, lovasz_hinge_loss,
    lovasz_softmax_loss, ohem_cross_entropy, tversky_loss)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _lovasz_grad_np(gt_sorted):
    gts = gt_sorted.sum()
    inter = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jac = 1.0 - inter / union
    out = jac.copy()
    out[1:] = jac[1:] - jac[:-1]
    return out


def _lovasz_softmax_np(probs, labels, ignore=255, classes="present"):
    """probs [P, C], labels [P]; ignored pixels removed before sorting."""
    keep = labels != ignore
    probs, labels = probs[keep], labels[keep]
    losses = []
    for c in range(probs.shape[1]):
        fg = (labels == c).astype(np.float64)
        if classes == "present" and fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        order = np.argsort(-errors, kind="stable")
        losses.append(
            np.dot(errors[order], _lovasz_grad_np(fg[order])))
    return np.mean(losses) if losses else 0.0


def _lovasz_hinge_np(logits, labels, ignore=255):
    keep = labels != ignore
    logits, labels = logits[keep], labels[keep]
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = np.argsort(-errors, kind="stable")
    return np.dot(np.maximum(errors[order], 0.0),
                  _lovasz_grad_np(labels[order].astype(np.float64)))


def test_lovasz_softmax_parity():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 13, 17, 5
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    labels[0, :3, :5] = 255
    got = float(lovasz_softmax_loss(logits, labels))
    want = _lovasz_softmax_np(
        _softmax(logits.astype(np.float64)).reshape(-1, c),
        labels.reshape(-1))
    assert got == pytest.approx(want, abs=1e-5)


def test_lovasz_softmax_all_classes_and_per_image():
    rng = np.random.default_rng(1)
    b, h, w, c = 2, 9, 11, 4
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c - 1, size=(b, h, w)).astype(np.int32)
    got = float(lovasz_softmax_loss(logits, labels, classes="all",
                                    per_image=True))
    probs = _softmax(logits.astype(np.float64))
    want = np.mean([
        _lovasz_softmax_np(probs[i].reshape(-1, c), labels[i].reshape(-1),
                           classes="all")
        for i in range(b)])
    assert got == pytest.approx(want, abs=1e-5)


def test_lovasz_hinge_parity():
    rng = np.random.default_rng(2)
    b, h, w = 2, 12, 10
    logits = rng.normal(size=(b, h, w)).astype(np.float32) * 2
    labels = rng.integers(0, 2, size=(b, h, w)).astype(np.int32)
    labels[1, :2] = 255
    got = float(lovasz_hinge_loss(logits, labels))
    want = _lovasz_hinge_np(
        logits.astype(np.float64).reshape(-1), labels.reshape(-1))
    assert got == pytest.approx(want, abs=1e-5)


def test_tversky_parity():
    rng = np.random.default_rng(3)
    b, h, w, c = 2, 8, 9, 6
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    labels[0, 0] = 255
    alpha, beta, smooth = 0.3, 0.7, 1.0
    got = float(tversky_loss(logits, labels, alpha, beta, smooth))

    pred = _softmax(logits.astype(np.float64)).reshape(b, -1, c)
    onehot = np.eye(c)[np.clip(labels, 0, c - 1)].reshape(b, -1, c)
    valid = (labels != 255).reshape(b, -1, 1).astype(np.float64)
    tp = (pred * onehot * valid).sum(1)
    fp = (pred * (1 - onehot) * valid).sum(1)
    fn = ((1 - pred) * onehot * valid).sum(1)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    want = np.mean((1 - tv).sum(-1) / c)
    assert got == pytest.approx(want, rel=1e-5)


def test_boundary_loss_parity():
    rng = np.random.default_rng(4)
    b, h, w = 2, 16, 16
    logits = rng.normal(size=(b, h, w)).astype(np.float32)
    gt = rng.integers(0, 2, size=(b, h, w)).astype(np.int32)
    got = float(boundary_loss(logits, gt))

    lg = logits.astype(np.float64).reshape(-1)
    tg = gt.astype(np.float64).reshape(-1)
    pos, neg = tg == 1, tg == 0
    wgt = np.where(pos, neg.sum() / tg.size,
                   np.where(neg, pos.sum() / tg.size, 0.0))
    bce = np.maximum(lg, 0) - lg * tg + np.log1p(np.exp(-np.abs(lg)))
    assert got == pytest.approx(np.mean(wgt * bce), rel=1e-5)


def test_ohem_cross_entropy_parity():
    rng = np.random.default_rng(5)
    b, h, w, c = 2, 14, 15, 7
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32) * 3
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    labels[0, :4] = 255
    thresh, min_kept = 0.7, 50
    got = float(ohem_cross_entropy(logits, labels, thresh, min_kept))

    flat = logits.astype(np.float64).reshape(-1, c)
    lab = labels.reshape(-1)
    keep0 = lab != 255
    probs = _softmax(flat)
    safe = np.where(keep0, lab, 0)
    gt_prob = probs[np.arange(lab.size), safe]
    logp = flat - np.log(np.exp(flat).sum(-1, keepdims=True))
    nll = -logp[np.arange(lab.size), safe]
    sorted_valid = np.sort(gt_prob[keep0])
    kth = min(min_kept, sorted_valid.size - 1)
    threshold = max(sorted_valid[kth], thresh)
    sel = keep0 & (gt_prob < threshold)
    want = nll[sel].mean()
    assert got == pytest.approx(want, rel=1e-5)


def test_edt_matches_scipy():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(6)
    mask = (rng.random((3, 24, 31)) > 0.4).astype(np.int32)
    mask[:, 0, 0] = 0  # guarantee reachable background
    got = np.asarray(edt_sq(mask))
    for i in range(mask.shape[0]):
        want = scipy_nd.distance_transform_edt(mask[i]) ** 2
        np.testing.assert_allclose(got[i], want, atol=1e-3)


def test_hausdorff_loss_parity():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(7)
    b, h, w, c = 2, 16, 18, 4
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    labels[0, :2, :2] = 255
    got = float(hausdorff_distance_loss(logits, labels))

    soft = _softmax(logits.astype(np.float64))
    valid = labels != 255
    tgt = np.where(valid, labels, 0)
    gt_dtm = np.stack([scipy_nd.distance_transform_edt(tgt[i] != 0)
                       for i in range(b)])
    seg = soft.argmax(-1)
    seg_dtm = np.stack([scipy_nd.distance_transform_edt(seg[i] != 0)
                        for i in range(b)])
    dtm2 = gt_dtm ** 2 + seg_dtm ** 2
    total = 0.0
    for i in range(1, c):
        delta = (soft[..., i] - tgt.astype(np.float64)) ** 2
        total += np.mean(delta * dtm2)
    want = total / c
    assert got == pytest.approx(want, rel=1e-4)


def test_losses_are_jittable_and_finite():
    import jax
    rng = np.random.default_rng(8)
    logits = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(1, 8, 8)).astype(np.int32)
    for fn in (lovasz_softmax_loss, tversky_loss, ohem_cross_entropy,
               hausdorff_distance_loss):
        val = jax.jit(fn)(logits, labels)
        assert np.isfinite(float(val))
