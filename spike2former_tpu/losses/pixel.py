"""Per-pixel segmentation losses for the FPN heads.

Reference: mmseg/models/decode_heads/decode_head.py:292-340 (loss_by_feat:
resize logits to GT, CE with ignore_index=255, avg over valid pixels) and
the mmseg loss zoo (mmseg/models/losses/): accuracy.py, lovasz_loss.py,
tversky_loss.py, boundary_loss.py, ohem_cross_entropy_loss.py,
huasdorff_distance_loss.py.

TPU-native design: every loss here is jittable with STATIC shapes — the
reference's boolean-indexing removal of ignored pixels is replaced by
masking that is provably equivalent (ignored entries are arranged to
contribute exactly zero to the reduction), and its per-class Python loops
become one vectorized sort/contraction over a class axis.  The Hausdorff
loss's `scipy.ndimage.distance_transform_edt` host call is replaced by an
exact on-device Euclidean distance transform (`edt_sq`): a two-scan
vertical pass + a chunked brute-force parabola minimization, all VPU work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def pixel_cross_entropy(logits: jax.Array, sem_seg: jax.Array,
                        ignore_index: int = 255) -> jax.Array:
    """logits [B, h, w, K] (any resolution), sem_seg [B, H, W] int."""
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    valid = sem_seg != ignore_index
    labels = jnp.where(valid, sem_seg, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def pixel_accuracy(logits: jax.Array, sem_seg: jax.Array,
                   ignore_index: int = 255) -> jax.Array:
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    pred = jnp.argmax(logits, -1)
    valid = sem_seg != ignore_index
    correct = (pred == sem_seg) & valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# Lovasz losses (mmseg/models/losses/lovasz_loss.py).
#
# The Lovasz extension gradient of the Jaccard index is computed on errors
# sorted in descending order; ignored pixels are NOT removed (dynamic shape)
# but mapped to entries that provably contribute 0 to the final dot product:
#   * softmax flavor: error := 0 (>= 0 errors sort them into the zero tail,
#     and a zero error contributes 0 regardless of its Lovasz weight);
#   * hinge flavor: error := -BIG (sorts last; relu() zeroes it).
# Since grad[i] only depends on the cumsum of sorted foreground up to i,
# trailing zero-contribution entries cannot perturb live entries.
# ---------------------------------------------------------------------------


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovasz extension w.r.t. descending-sorted errors.

    gt_sorted: [..., P] float (0/1 foreground indicator, sorted by error).
    """
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1)


def _lovasz_softmax_flat(probs: jax.Array, labels: jax.Array,
                         valid: jax.Array, classes: str = "present",
                         class_weight=None) -> jax.Array:
    """probs [P, C] softmax, labels [P] int, valid [P] bool."""
    num_classes = probs.shape[-1]
    fg = (jax.nn.one_hot(labels, num_classes).T
          * valid[None, :].astype(probs.dtype))        # [C, P]
    errors = jnp.abs(fg - probs.T) * valid[None, :]    # ignored -> exactly 0
    order = jnp.argsort(-errors, axis=-1)
    errors_sorted = jnp.take_along_axis(errors, order, axis=-1)
    fg_sorted = jnp.take_along_axis(fg, order, axis=-1)
    per_class = jnp.sum(errors_sorted * _lovasz_grad(fg_sorted), axis=-1)
    if class_weight is not None:
        per_class = per_class * jnp.asarray(class_weight, per_class.dtype)
    if classes == "present":
        present = jnp.sum(fg, axis=-1) > 0
        return (jnp.sum(jnp.where(present, per_class, 0.0))
                / jnp.maximum(jnp.sum(present), 1))
    return jnp.mean(per_class)


def lovasz_softmax_loss(logits: jax.Array, sem_seg: jax.Array,
                        classes: str = "present", per_image: bool = False,
                        class_weight=None,
                        ignore_index: int = 255) -> jax.Array:
    """Multi-class Lovasz-Softmax loss.

    logits [B, h, w, C]; sem_seg [B, H, W] int.  Matches
    lovasz_loss.py:129-170 (softmax applied by the wrapper, per-image or
    whole-batch flattening, 'present'/'all' class averaging).
    """
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid = sem_seg != ignore_index
    labels = jnp.where(valid, sem_seg, 0)
    if per_image:
        b = probs.shape[0]
        flat = jax.vmap(
            lambda p, l, v: _lovasz_softmax_flat(
                p.reshape(-1, p.shape[-1]), l.reshape(-1), v.reshape(-1),
                classes, class_weight))
        return jnp.mean(flat(probs, labels, valid))
    return _lovasz_softmax_flat(
        probs.reshape(-1, probs.shape[-1]), labels.reshape(-1),
        valid.reshape(-1), classes, class_weight)


def lovasz_hinge_loss(logits: jax.Array, labels: jax.Array,
                      per_image: bool = False,
                      ignore_index: int = 255) -> jax.Array:
    """Binary Lovasz hinge loss; logits [B, H, W], labels [B, H, W] in {0,1}.

    Matches lovasz_loss.py:61-127 (errors = 1 - logits*sign, descending
    sort, relu(errors) . lovasz_grad).
    """
    valid = labels != ignore_index

    def flat(lg, lb, v):
        lb = jnp.where(v, lb, 0)
        signs = 2.0 * lb.astype(jnp.float32) - 1.0
        errors = jnp.where(v, 1.0 - lg.astype(jnp.float32) * signs, -1e9)
        order = jnp.argsort(-errors)
        errors_sorted = jnp.take_along_axis(errors, order, axis=-1)
        gt_sorted = jnp.take_along_axis(
            lb.astype(jnp.float32) * v.astype(jnp.float32), order, axis=-1)
        return jnp.sum(jax.nn.relu(errors_sorted) * _lovasz_grad(gt_sorted))

    if per_image:
        return jnp.mean(jax.vmap(
            lambda lg, lb, v: flat(lg.reshape(-1), lb.reshape(-1),
                                   v.reshape(-1)))(logits, labels, valid))
    return flat(logits.reshape(-1), labels.reshape(-1), valid.reshape(-1))


# ---------------------------------------------------------------------------
# Tversky loss (mmseg/models/losses/tversky_loss.py).
# ---------------------------------------------------------------------------


def tversky_loss(logits: jax.Array, sem_seg: jax.Array, alpha: float = 0.3,
                 beta: float = 0.7, smooth: float = 1.0, class_weight=None,
                 ignore_index: int = 255) -> jax.Array:
    """logits [B, h, w, C]; sem_seg [B, H, W] int.

    Per class c: 1 - (TP+s)/(TP + a·FP + b·FN + s) over valid pixels,
    summed over classes / C, averaged over the batch (tversky_loss.py
    14-57 with the module's softmax + clamped one-hot, :100-121).
    """
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    num_classes = logits.shape[-1]
    pred = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pred = pred.reshape(pred.shape[0], -1, num_classes)       # [B, P, C]
    onehot = jax.nn.one_hot(
        jnp.clip(sem_seg, 0, num_classes - 1), num_classes).reshape(
        sem_seg.shape[0], -1, num_classes)
    valid = (sem_seg != ignore_index).reshape(
        sem_seg.shape[0], -1, 1).astype(jnp.float32)
    tp = jnp.sum(pred * onehot * valid, axis=1)               # [B, C]
    fp = jnp.sum(pred * (1.0 - onehot) * valid, axis=1)
    fn = jnp.sum((1.0 - pred) * onehot * valid, axis=1)
    tversky = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    per_class = 1.0 - tversky
    if class_weight is not None:
        per_class = per_class * jnp.asarray(class_weight, per_class.dtype)
    return jnp.mean(jnp.sum(per_class, axis=-1) / num_classes)


# ---------------------------------------------------------------------------
# Boundary loss (mmseg/models/losses/boundary_loss.py — PIDNet-style
# class-balanced BCE on a binary boundary map).
# ---------------------------------------------------------------------------


def boundary_loss(bd_logits: jax.Array, bd_gt: jax.Array) -> jax.Array:
    """bd_logits [B, H, W] (or [B, H, W, 1]); bd_gt [B, H, W] in {0, 1}.

    Weighted BCE-with-logits where positive pixels are weighted by the
    negative-pixel fraction and vice versa; the mean runs over ALL pixels
    (zero-weight entries included), matching boundary_loss.py:33-58.
    """
    logit = bd_logits.reshape(-1).astype(jnp.float32)
    target = bd_gt.reshape(-1).astype(jnp.float32)
    pos = target == 1.0
    neg = target == 0.0
    pos_num = jnp.sum(pos)
    neg_num = jnp.sum(neg)
    total = jnp.maximum(pos_num + neg_num, 1)
    weight = jnp.where(pos, neg_num / total,
                       jnp.where(neg, pos_num / total, 0.0))
    bce = jax.nn.relu(logit) - logit * target + jnp.log1p(
        jnp.exp(-jnp.abs(logit)))
    return jnp.mean(weight * bce)


# ---------------------------------------------------------------------------
# OHEM cross-entropy (mmseg/models/losses/ohem_cross_entropy_loss.py —
# PIDNet-style: keep hard pixels whose GT-class probability falls below
# max(thresh, k-th smallest GT probability)).
# ---------------------------------------------------------------------------


def ohem_cross_entropy(logits: jax.Array, sem_seg: jax.Array,
                       thresh: float = 0.7, min_kept: int = 100000,
                       class_weight=None,
                       ignore_index: int = 255) -> jax.Array:
    """logits [B, h, w, C]; sem_seg [B, H, W] int.

    Static-shape OHEM: invalid pixels get GT-probability +inf so they sort
    after every valid pixel and can never be selected; the reference's
    `sorted_probs[min(min_kept, n_valid - 1)]` dynamic index becomes a
    clipped jnp.take (ohem_cross_entropy_loss.py:53-95).
    """
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    num_classes = logits.shape[-1]
    valid = (sem_seg != ignore_index).reshape(-1)
    labels = jnp.where(sem_seg == ignore_index, 0, sem_seg).reshape(-1)
    flat = logits.reshape(-1, num_classes).astype(jnp.float32)

    logp = jax.nn.log_softmax(flat, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        nll = nll * cw[labels]

    gt_prob = jnp.take_along_axis(
        jax.nn.softmax(flat, axis=-1), labels[:, None], axis=-1)[:, 0]
    gt_prob = jnp.where(valid, gt_prob, jnp.inf)
    sorted_prob = jnp.sort(gt_prob)
    n_valid = jnp.sum(valid)
    kth = jnp.minimum(min_kept, jnp.maximum(n_valid - 1, 0))
    min_value = jnp.take(sorted_prob, kth)
    threshold = jnp.maximum(min_value, thresh)

    keep = valid & (gt_prob < threshold)
    return (jnp.sum(jnp.where(keep, nll, 0.0))
            / jnp.maximum(jnp.sum(keep), 1))


# ---------------------------------------------------------------------------
# Hausdorff-distance loss (mmseg/models/losses/huasdorff_distance_loss.py)
# with an on-device exact Euclidean distance transform in place of the
# reference's scipy.ndimage host round-trip.
# ---------------------------------------------------------------------------


def edt_sq(mask: jax.Array, chunk: int = 128) -> jax.Array:
    """Exact SQUARED Euclidean distance transform of a binary mask.

    mask [..., H, W] (nonzero = foreground).  Returns, per pixel, the
    squared distance to the nearest zero pixel (0 on background; "no
    background anywhere" rows saturate at an INF surrogate, matching
    scipy's unreachable-background behavior closely enough for loss use).

    Separable exact algorithm: a forward+backward scan per column finds
    g[i, j] = min_i' |i - i'| over background rows; the second pass takes
    D^2[i, j] = min_j' ((j - j')^2 + g[i, j']^2), evaluated in column
    chunks with a running minimum (VPU-only, no host callback).
    """
    h, w = mask.shape[-2], mask.shape[-1]
    fg = (mask != 0)
    big = jnp.float32(1e12)

    # vertical pass (along H): distance in rows to nearest background
    def down(carry, row):
        d = jnp.where(row, carry + 1.0, 0.0)
        return d, d

    init = jnp.full(mask.shape[:-2] + (w,), 1e6, jnp.float32)
    _, gd = jax.lax.scan(down, init, jnp.moveaxis(fg, -2, 0))

    def up(carry, row):
        d = jnp.where(row[0], jnp.minimum(row[1], carry + 1.0), 0.0)
        return d, d

    _, gu = jax.lax.scan(
        up, init, (jnp.moveaxis(fg, -2, 0)[::-1], gd[::-1]))
    g = jnp.moveaxis(gu[::-1], 0, -2)                    # [..., H, W]
    g2 = jnp.minimum(g * g, big)

    # horizontal pass: chunked brute-force parabola min
    cols = jnp.arange(w, dtype=jnp.float32)
    out = jnp.full_like(g2, big)
    for start in range(0, w, chunk):
        stop = min(start + chunk, w)
        src = cols[start:stop]                           # [c]
        dist2 = (cols[:, None] - src[None, :]) ** 2      # [W, c]
        cand = g2[..., None, start:stop] + dist2         # [..., H, W, c]
        out = jnp.minimum(out, jnp.min(cand, axis=-1))
    return out


def hausdorff_distance_loss(logits: jax.Array, sem_seg: jax.Array,
                            class_weight=None,
                            ignore_index: int = 255) -> jax.Array:
    """logits [B, h, w, C]; sem_seg [B, H, W] int.

    Faithful to huasdorff_distance_loss.py:40-156: softmax, target zeroed
    at ignored pixels, foreground distance maps of the (binarized) GT and
    of the argmax prediction shared across channels 1..C-1, and per class
    mean((p_c - gt)^2 * (dtm_gt^2 + dtm_seg^2)) summed / C.
    """
    if logits.shape[1:3] != sem_seg.shape[1:3]:
        logits = resize_bilinear(logits, sem_seg.shape[1:3])
    num_classes = logits.shape[-1]
    soft = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid = sem_seg != ignore_index
    target = jnp.where(valid, sem_seg, 0)

    gt_dtm2 = edt_sq(target)                             # [B, H, W] squared
    seg_dtm2 = edt_sq(jnp.argmax(soft, axis=-1))
    dtm = jax.lax.stop_gradient(gt_dtm2 + seg_dtm2)

    tgt = target.astype(jnp.float32)[..., None]
    delta = (soft[..., 1:] - tgt) ** 2                   # classes 1..C-1
    per_class = jnp.mean(delta * dtm[..., None], axis=(0, 1, 2))
    if class_weight is not None:
        per_class = per_class * jnp.asarray(
            class_weight, per_class.dtype)[1:]
    return jnp.sum(per_class) / num_classes


# ---------------------------------------------------------------------------
# loss_decode registry — the reference's per-head configurable decode loss
# (mmseg BaseDecodeHead accepts a single loss dict or a list of them;
# decode_head.py:115-128).  A spec is a sequence of
# (name, weight) or (name, weight, kwargs) tuples.
# ---------------------------------------------------------------------------

PIXEL_LOSSES = {
    "ce": pixel_cross_entropy,
    "lovasz": lovasz_softmax_loss,
    "tversky": tversky_loss,
    "ohem": ohem_cross_entropy,
    "hausdorff": hausdorff_distance_loss,
    # 'boundary' takes a binary boundary map, not a class map — it is a
    # separate-head loss (PIDNet) and not valid in a decode spec.
}


def build_pixel_loss(spec):
    """spec: sequence of (name, weight[, kwargs]).  Returns
    ``fn(logits, sem_seg) -> (total, {loss_<name>: value})``."""
    parsed = []
    for item in spec:
        name, weight = item[0], float(item[1])
        kwargs = dict(item[2]) if len(item) > 2 else {}
        if name not in PIXEL_LOSSES:
            raise KeyError(
                f"unknown pixel loss {name!r}; have {sorted(PIXEL_LOSSES)}")
        parsed.append((name, weight, kwargs))

    def loss_fn(logits, sem_seg):
        total = jnp.float32(0.0)
        metrics = {}
        for name, weight, kwargs in parsed:
            value = PIXEL_LOSSES[name](logits, sem_seg, **kwargs)
            metrics[f"loss_{name}"] = value
            total = total + weight * value
        return total, metrics

    return loss_fn
