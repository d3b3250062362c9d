"""MaskFormer training criterion: Hungarian-matched CE + focal + dice, with
deep supervision over every decoder layer.

Reference: mmdet/models/dense_heads/maskformer_head.py —
``loss_by_feat`` (:367-408), ``_get_targets_single`` (:296-365),
``_loss_by_feat_single`` (:410-496).  Faithful details:
* GT masks are nearest-downsampled to the mask-prediction resolution for
  matching (:329-334), but the dice/focal losses upsample predictions
  (bilinear) to the GT resolution (:475-479).
* The focal "mask loss" trains on the *complement* ``1 - mask_target``
  (:493-494) with avg_factor ``num_total_masks * h * w``.
* ``num_total_masks`` is the cross-replica mean of matched-GT counts
  (``reduce_mean``, :459) — here a global batch mean that XLA turns into a
  collective under a sharded jit.

TPU design: GT is padded to a static ``max_gt`` instances per image.  When
the per-slot masks are DISJOINT (always true for semantic and panoptic
targets) the ground truth is carried as a compact ``slot_map`` [B, H, W]
int32 (pixel -> slot index, G = no slot) instead of dense [B, G, H, W]
masks: per-slot binary targets become iota-compares that fuse into the
loss elementwise code, which removes gigabytes of materialized mask
buffers from the train step (the dense f32 stack plus its layout copies
dominated the round-2 step).  Dense masks remain supported for arbitrary
(possibly overlapping) instance targets.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear, resize_nearest_torch
from .losses import dice_loss, sigmoid_focal_loss, weighted_cross_entropy
from .matcher import auction_match, hungarian_host, match_costs
from .point_sample import (point_sample, point_sample_shared,
                           point_sample_slot, uncertain_point_coords)


class LazyMasks(NamedTuple):
    """Deep-supervision mask predictions in factored form.

    The dense per-layer logits are ``einsum('tbqc,tbhwc->bqhw',
    embeds[l], feats) / T`` — the SDME tail of the head
    (models/maskformer_head.py ``sdme``).  Materializing all L layers at
    the flagship train shape is a f32[7,16,100,256,256] (2.7 GB) HLO temp
    (+ a same-size copy), the single largest train-step allocation; the
    loss only ever needs one layer (and only its G matched slots) at a
    time, so the factored form is carried instead and each scan body
    contracts what it needs on the fly.
    """

    embeds: jax.Array  # [L, T, B, nq, C] post-SDME mask embeddings
    feats: jax.Array   # [T, B, h, w, C] mask features

    @property
    def dtype(self):
        return jnp.float32

    @property
    def mask_hw(self) -> tuple[int, int]:
        return self.feats.shape[2], self.feats.shape[3]

    def layer(self, embeds_l: jax.Array) -> jax.Array:
        """Dense [B, nq, h, w] f32 logits for one layer's embeddings."""
        t = self.feats.shape[0]
        return jnp.einsum(
            "tbqc,tbhwc->bqhw", embeds_l, self.feats,
            preferred_element_type=jnp.float32) / t

    def layer_flat(self, embeds_l: jax.Array) -> jax.Array:
        """[B, nq, h*w] f32 logits for one layer — flat pixel axis for the
        matching-cost contractions.  Producing [B, nq, h, w] and reshaping
        forced two ~26 ms layout copies per step at B=16 (trace round 5:
        copy.5275 + reshape.17878); the [T,B,h,w,C] -> [T,B,hw,C] reshape
        here is free (adjacent row-major dims)."""
        t, b, h, w, c = self.feats.shape
        return jnp.einsum(
            "tbqc,tbpc->bqp", embeds_l, self.feats.reshape(t, b, h * w, c),
            preferred_element_type=jnp.float32) / t

    def layer_slots(self, embeds_l: jax.Array, q_idx: jax.Array
                    ) -> jax.Array:
        """Dense [B, G, h, w] f32 logits for the ``q_idx`` [B, G] queries
        of one layer — contracts only the matched slots."""
        t = self.feats.shape[0]
        emb = jnp.take_along_axis(
            embeds_l, q_idx[None, :, :, None], axis=2)  # [T, B, G, C]
        return jnp.einsum(
            "tbgc,tbhwc->bghw", emb, self.feats,
            preferred_element_type=jnp.float32) / t


class GroundTruth(NamedTuple):
    """Padded mask-classification targets.

    Either ``masks`` (dense [B, G, H, W] {0,1}; bool preferred) or
    ``slot_map`` ([B, H, W] int32 pixel->slot, G = unassigned; requires
    disjoint per-slot masks) must be set.  ``slot_map`` is the fast path.
    """

    labels: jax.Array  # [B, G] int32 (class id; arbitrary where invalid)
    masks: jax.Array | None  # [B, G, H, W] {0,1} or None (slot mode)
    valid: jax.Array   # [B, G] bool
    # classes present in the image but dropped because more than G were
    # present (top-k overflow); None when the producer can't overflow
    dropped: jax.Array | None = None  # [B] int32
    slot_map: jax.Array | None = None  # [B, H, W] int32 in [0, G]

    def dense_masks(self) -> jax.Array:
        """Dense bool masks [B, G, H, W] (derived in slot mode)."""
        if self.masks is not None:
            return self.masks
        g = self.labels.shape[1]
        slots = jnp.arange(g, dtype=jnp.int32)
        return self.slot_map[:, None] == slots[None, :, None, None]

    @property
    def gt_hw(self) -> tuple[int, int]:
        src = self.masks if self.masks is not None else self.slot_map
        return src.shape[-2], src.shape[-1]


def slot_map_from_masks(masks: jax.Array, valid: jax.Array) -> jax.Array:
    """[B, G, H, W] disjoint {0,1} masks -> [B, H, W] slot map (G = none).

    Exact when masks are disjoint (semantic / panoptic GT by construction).
    """
    b, g = masks.shape[:2]
    m = masks.astype(bool) & valid[:, :, None, None]
    hit = jnp.any(m, axis=1)
    first = jnp.argmax(m, axis=1).astype(jnp.int32)
    return jnp.where(hit, first, g)


def semantic_to_instances(sem_seg: jax.Array, num_classes: int,
                          max_gt: int, ignore_index: int = 255
                          ) -> GroundTruth:
    """Per-class binary targets from a semantic map (the mmseg shim's
    ``_seg_data_to_instance_data``, mmseg maskformer_head.py:84-105), with
    static shapes: the present class ids are compacted into ``max_gt``
    slots via top-k, so ``max_gt`` only needs to cover the number of
    *distinct classes per image* (<= ~50 on ADE20K crops), not the class
    vocabulary.  Targets are emitted as a compact ``slot_map`` (slots are
    disjoint by construction), not dense masks.

    sem_seg: [B, H, W] int.
    """
    b, h, w = sem_seg.shape
    class_ids = jnp.arange(num_classes, dtype=jnp.int32)
    onehot = (sem_seg[:, None, :, :] == class_ids[None, :, None, None])
    present = jnp.any(onehot, axis=(2, 3))  # [B, K]

    k = min(max_gt, num_classes)
    # deterministic selection: present classes first, ordered by class id
    score = jnp.where(present,
                      (num_classes - class_ids).astype(jnp.float32)[None],
                      0.0)
    _, sel = jax.lax.top_k(score, k)  # [B, k] class ids (present first)
    sel = sel.astype(jnp.int32)
    valid = jnp.take_along_axis(present, sel, axis=1)

    # pixel -> slot WITHOUT a per-pixel table gather (a [B, H*W]
    # take_along_axis into the per-image class->slot table measured
    # 43 ms/iter at B=16 — the ~100M scalar-gathers/s TPU ceiling).
    # Selected slot labels are distinct per image, so at most one slot
    # matches a pixel's class: the slot index is a compare-weighted SUM
    # over the k slots — one fused VPU reduction, no gather.  Ignore
    # (255) and dropped classes match no valid slot -> background k.
    sem_c = sem_seg.astype(jnp.int32)[:, None]          # [B, 1, H, W]
    lab = jnp.where(valid, sel, -1)[:, :, None, None]   # [B, k, 1, 1]
    hitk = sem_c == lab                                  # [B, k, H, W]
    slot_rev = jnp.arange(k, 0, -1, dtype=jnp.int32)    # k - slot
    slot_map = k - jnp.max(
        hitk * slot_rev[None, :, None, None], axis=1)

    n_present = jnp.sum(present, axis=1, dtype=jnp.int32)
    n_kept = jnp.sum(valid, axis=1, dtype=jnp.int32)
    return GroundTruth(
        labels=sel,
        masks=None,
        valid=valid,
        # silently-truncated GT classes (distinct classes > max_gt) —
        # surfaced as the train metric 'dropped_gt' so overflow is visible
        dropped=n_present - n_kept,
        slot_map=slot_map,
    )


def classification_targets(matched_q: jax.Array, gt_labels: jax.Array,
                           nq: int, num_classes: int) -> jax.Array:
    """Per-query class targets from a (possibly invalid) assignment.

    matched_q [B, G] (query index, or <0 for unmatched/padded GT rows);
    gt_labels [B, G].  Returns [B, nq] int32 where matched queries get
    their GT label and everything else gets background (``num_classes``).

    Invalid rows are routed to the out-of-bounds index ``nq`` and DROPPED
    by the scatter (mode='drop') — aliasing them to a real query would
    clobber that query's matched label (duplicate scatter indices have
    unspecified order).  Ref: maskformer_head.py:352-357 writes only
    matched (pos) slots.
    """
    b = matched_q.shape[0]
    drop_q = jnp.where(matched_q >= 0, matched_q, nq)
    return jnp.full((b, nq), num_classes, jnp.int32).at[
        jnp.arange(b)[:, None], drop_q
    ].set(gt_labels.astype(jnp.int32), mode="drop")


def _phase_terms(ph: jax.Array, tf: jax.Array,
                 gamma: float = 2.0, alpha: float = 0.25) -> tuple:
    """Per-pixel sigmoid + focal terms with ONE shared ``exp(-|x|)``
    (losses.focal_terms semantics, py_sigmoid_focal_loss
    focal_loss.py:12-60).  The phase-loss block streams [B, G, 256, 256]
    f32 tensors 4 phases x 7 layers deep, so transcendental count per
    element is the cost: this form needs exp + log1p where the naive
    sigmoid-then-BCE form needs three."""
    e = jnp.exp(-jnp.abs(ph))
    p = jnp.where(ph >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    pt = (1.0 - p) * tf + p * (1.0 - tf)
    ptg = pt * pt if gamma == 2.0 else pt ** gamma
    focal_w = (alpha * tf + (1.0 - alpha) * (1.0 - tf)) * ptg
    bce = jnp.maximum(ph, 0) - ph * tf + jnp.log1p(e)
    return p, bce * focal_w


def _gt_phase_losses(pred_s: jax.Array, slot_map: jax.Array,
                     pair_w: jax.Array, num_total_masks) -> tuple:
    """Mask losses at GT resolution for an exact integer upscale, WITHOUT
    materializing the upsampled stack.

    The reference upsamples predictions bilinearly to GT resolution and
    evaluates focal+dice there (maskformer_head.py:475-494).  For an
    integer-factor half-pixel upsample every output pixel belongs to one
    of s_y*s_x polyphase grids whose values are fixed 2-tap lerps of
    adjacent source pixels (edge-clamped — identical to
    ``jax.image.resize(method='linear')`` / torch align_corners=False):
    output index ``s*k + r`` reads source coordinate ``k + (2r+1-s)/(2s)``.

    Each phase's loss terms are elementwise in source-resolution tensors
    and reduce immediately, so the [B, G, s_y*h, s_x*w] f32 buffers (and
    their backward copies) never exist — at the flagship recipe (masks /4,
    GT 512², 16 phases) the dense path materializes 268 MB per decoder
    layer.  Targets come from the slot map's matching phase grid as fused
    iota-compares.  Total elementwise work equals the dense path's (the
    phase grids partition the output pixels).

    pred_s: [B, G, h, w] logits (matched per-GT predictions);
    slot_map: [B, s_y*h, s_x*w] int32.  Returns (loss_dice, loss_focal)
    scalars equal (to float rounding) to the dense upsample path.
    """
    b, g, h, w = pred_s.shape
    gh, gw = slot_map.shape[-2:]
    sy, sx = gh // h, gw // w
    x = pred_s.astype(jnp.float32)
    slots = jnp.arange(g, dtype=jnp.int32)

    def shifts(v, axis):
        lead = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
        tail = jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis],
                                    axis=axis)
        prev = jnp.concatenate(
            [lead, jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1,
                                        axis=axis)], axis=axis)
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis), tail],
            axis=axis)
        return prev, nxt

    def variants(v, axis, s):
        """The s fixed 2-tap phase lerps of ``v`` along ``axis``."""
        prev, nxt = shifts(v, axis)
        out = []
        for r in range(s):
            num = 2 * r + 1 - s  # coord offset numerator over 2s
            if num < 0:
                f = 1.0 + num / (2 * s)
                out.append((-num / (2 * s)) * prev + f * v)
            elif num == 0:
                out.append(v)
            else:
                f = num / (2 * s)
                out.append((1.0 - f) * v + f * nxt)
        return out

    a = jnp.zeros((b, g), jnp.float32)
    sp = jnp.zeros((b, g), jnp.float32)
    st = jnp.zeros((b, g), jnp.float32)
    focal = jnp.zeros((b, g), jnp.float32)
    for ar, r in enumerate(variants(x, 2, sy)):
        for ac, ph in enumerate(variants(r, 3, sx)):
            t = (slot_map[:, ar::sy, ac::sx][:, None]
                 == slots[None, :, None, None])
            tf = t.astype(jnp.float32)
            p, fterm = _phase_terms(ph, tf)
            a = a + jnp.sum(p * tf, axis=(2, 3))
            sp = sp + jnp.sum(p, axis=(2, 3))
            st = st + jnp.sum(tf, axis=(2, 3))
            focal = focal + jnp.sum(fterm, axis=(2, 3))

    eps = 1.0
    d = 1.0 - (2 * a + eps) / (sp + st + eps)
    nt = jnp.maximum(num_total_masks, 1e-12)
    loss_dice = jnp.sum(d * pair_w) / nt
    loss_focal = jnp.sum(focal * pair_w) / (nt * gh * gw)
    return loss_dice, loss_focal


def _layer_loss(cls_scores, mask_preds, matched_q, gt: GroundTruth,
                gt_ds, slot_ds, *,
                num_classes: int, class_weight,
                focal_weight: float, dice_weight: float,
                num_total_masks, loss_at: str = "pred",
                point_cfg: tuple | None = None, rng=None
                ) -> dict[str, jax.Array]:
    """Loss for one decoder layer, given its (precomputed) assignment.

    cls_scores [B, nq, K+1]; mask_preds [B, nq, h, w] (mask resolution);
    matched_q [B, G] (query per GT column, -1 = unmatched); gt_ds / slot_ds
    the nearest-downsampled targets at mask resolution (dense / slot form —
    exactly one is not None).

    ``loss_at='gt'`` reproduces the reference exactly (predictions
    bilinearly upsampled to GT resolution, :475-479); ``'pred'``
    computes mask losses at prediction resolution with nearest-downsampled
    GT — numerically near-identical gradients at ~4x less HBM, the same
    trade Mask2Former makes with point sampling.

    ``point_cfg = (num_points, oversample, importance)`` switches the mask
    losses to the Mask2Former point-sampled recipe
    (mask2former_track_head.py:405-436): per matched pair, sample
    ``num_points`` uncertainty-importance points from the prediction (under
    stop_gradient), evaluate dice (avg_factor num_total_masks) and the
    focal mask loss (avg_factor num_total_masks * num_points) on the
    bilinearly point-sampled pred/GT values.  GT is sampled at its native
    resolution, so this is GT-fidelity supervision at ~num_points/(gh*gw)
    of the exact path's cost.
    """
    b, nq = cls_scores.shape[:2]
    g = gt.labels.shape[1]
    # ``mask_preds`` is either the dense [B, nq, h, w] layer logits or a
    # (LazyMasks, embeds_l) pair — in the lazy form only the G matched
    # slots are ever contracted to pixels (LazyMasks docstring).
    if isinstance(mask_preds, LazyMasks):
        # LazyMasks is itself a tuple: without this guard it would silently
        # unpack as (lm, embeds_l) and compute garbage.  Callers pass the
        # whole-stack LazyMasks to ``maskformer_loss``, never here.
        raise TypeError(
            "_layer_loss takes a (LazyMasks, embeds_l) pair per layer, "
            "not a bare LazyMasks")
    lazy = isinstance(mask_preds, tuple)
    if lazy:
        lm, embeds_l = mask_preds
        h, w = lm.mask_hw
    else:
        h, w = mask_preds.shape[-2:]
    gh, gw = gt.gt_hw

    # ---- classification targets ----
    labels = classification_targets(matched_q, gt.labels, nq, num_classes)
    safe_q = jnp.where(matched_q >= 0, matched_q, 0)

    loss_cls = weighted_cross_entropy(
        cls_scores.reshape(b * nq, -1), labels.reshape(-1), class_weight)

    # ---- mask losses on matched pairs ----
    if lazy:
        pred_at_gt = lm.layer_slots(embeds_l, safe_q)  # [B, G, h, w]
    else:
        pred_at_gt = jax.vmap(
            lambda mp, q: mp[q])(mask_preds, safe_q)  # [B, G, h, w]
    pair_w = (gt.valid & (matched_q >= 0)).astype(jnp.float32)  # [B, G]

    if point_cfg is not None:
        n_pts, osr, imp, pdt = point_cfg
        # coords under no_grad (reference :409-414), per matched pair.
        # Stop-gradient samplers run their one-hot contractions in bf16
        # (uncertainty only ranks candidates; GT {0,1} targets get <=0.4%
        # lerp-weight rounding on boundary points) — the gradient-carrying
        # pred sampling runs in ``pdt`` (train.loss_points_dtype): f32
        # default = mmcv-exact bilinear; bf16 is the measured-speed knob
        # for bf16 models (whose logits carry bf16 information anyway —
        # the one-hot selector matmuls are the point path's dominant
        # MXU cost, ~0.84 TFLOP/layer f32 fwd + same again bwd).
        coords = uncertain_point_coords(
            rng, jax.lax.stop_gradient(pred_at_gt.astype(jnp.float32)),
            n_pts, osr, imp, dtype=jnp.bfloat16)  # [B, G, P, 2]
        pred_pts = point_sample(pred_at_gt, coords, dtype=pdt)  # [B, G, P]
        if gt.masks is None:
            tgt_pts = point_sample_slot(gt.slot_map, g, coords,
                                        dtype=jnp.bfloat16)
        else:
            tgt_pts = point_sample(gt.masks.astype(jnp.bfloat16), coords,
                                   dtype=jnp.bfloat16)
        tgt_pts = jax.lax.stop_gradient(tgt_pts)
        loss_dice = dice_loss(
            pred_pts.reshape(b * g, n_pts), tgt_pts.reshape(b * g, n_pts),
            weight=pair_w.reshape(-1), eps=1.0, naive=True, activate=True,
            avg_factor=num_total_masks)
        loss_focal = sigmoid_focal_loss(
            pred_pts, tgt_pts, weight=pair_w[..., None],
            avg_factor=num_total_masks * n_pts)
        return dict(loss_cls=loss_cls, loss_mask=loss_focal * focal_weight,
                    loss_dice=loss_dice * dice_weight)

    if (loss_at == "gt" and slot_ds is not None
            and gh % h == 0 and gw % w == 0 and (gh > h or gw > w)):
        # phase-decomposed exact path: no [B, G, gh, gw] buffers
        loss_dice, loss_focal = _gt_phase_losses(
            pred_at_gt, gt.slot_map, pair_w, num_total_masks)
        return dict(loss_cls=loss_cls,
                    loss_mask=loss_focal * focal_weight,
                    loss_dice=loss_dice * dice_weight)

    slots = jnp.arange(g, dtype=jnp.int32)
    if loss_at == "gt":
        pred_m = resize_bilinear(
            pred_at_gt[..., None], (gh, gw))[..., 0]  # [B, G, gh, gw]
        if slot_ds is not None:
            tgt_m = (gt.slot_map[:, None] == slots[None, :, None, None])
        else:
            tgt_m = gt.masks
        lh, lw = gh, gw
    else:
        pred_m = pred_at_gt
        if slot_ds is not None:
            tgt_m = (slot_ds[:, None] == slots[None, :, None, None])
        else:
            tgt_m = gt_ds
        lh, lw = h, w

    loss_dice = dice_loss(
        pred_m.reshape(b * g, lh, lw), tgt_m.reshape(b * g, lh, lw),
        weight=pair_w.reshape(-1), eps=1.0, naive=True, activate=True,
        avg_factor=num_total_masks)

    # The reference calls ``loss_mask(mask_preds, 1 - mask_targets)``
    # (:493-494), but mmdet's FocalLoss treats that tensor as a *class
    # index* and one-hots it (focal_loss.py:220-224 / the CUDA op's
    # target-index convention): index 0 — i.e. mask == 1 — selects the
    # positive of the single logit channel.  The effective float target is
    # therefore the mask itself.
    loss_focal = sigmoid_focal_loss(
        pred_m, tgt_m,
        weight=pair_w[..., None, None],
        avg_factor=num_total_masks * lh * lw)

    # Scale by the configured weights (the same ones the matcher uses) so
    # non-default focal/dice weights never desync costs from losses.
    return dict(loss_cls=loss_cls, loss_mask=loss_focal * focal_weight,
                loss_dice=loss_dice * dice_weight)


def maskformer_loss(
    all_cls_scores: jax.Array,   # [L, B, nq, K+1]
    all_mask_preds,              # [L, B, nq, h, w] dense or LazyMasks
    gt: GroundTruth,
    *,
    num_classes: int,
    bg_class_weight: float = 0.1,
    focal_weight: float = 20.0,
    dice_weight: float = 1.0,
    matcher: str = "host",
    loss_at: str = "pred",
    compact_gt: int | None = None,
    num_points: int = 0,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    points_dtype=jnp.float32,
    rng: jax.Array | None = None,
    unroll: bool = False,
) -> dict[str, jax.Array]:
    """Deep-supervised loss over all decoder layers (loss_by_feat :367-408).

    Returns per-layer loss dict {loss_cls, loss_mask, loss_dice,
    d{i}.loss_*} exactly like the reference logger keys.

    ``compact_gt``: EXACT fast path for the padded GT axis.  Every mask
    loss / cost term scales with the static ``max_gt`` padding (64 for the
    flagship) although a typical crop has <20 distinct classes.  Because
    ``semantic_to_instances`` packs valid slots into a prefix (top-k,
    present-first), truncating the GT axis to ``compact_gt`` slots is
    lossless whenever no slot beyond it is valid — invalid columns carry
    BIG_COST and zero pair weight, so neither the assignment restricted to
    valid columns nor any loss term changes.  A ``lax.cond`` dispatches to
    the full-width branch on the (rare, ``dropped_gt``-style observable)
    overflow, so the result is bit-identical to ``compact_gt=None`` for
    every input — except under ``num_points``, where the narrower G axis
    changes which threefry uniforms each pair draws (same distribution,
    different stream; see the inline note).  The host matcher is excluded
    (pure_callback inside cond branches is not supported on all backends).

    ``num_points > 0`` switches matching costs and mask losses to the
    point-sampled Mask2Former recipe (see ``_layer_loss`` and
    losses/point_sample.py; upstream K = 12544, oversample 3.0,
    importance 0.75) — requires ``rng``.

    ``unroll`` fully unrolls the two layer scans (costs + losses) into
    straight-line HLO.  The scans compile the body once, but on TPU the
    while loops carry the LazyMasks feats (bf16 536 MB at the flagship
    B=16) and the GT slot map through the loop tuple — the round-5 train
    trace attributes ~half the loss block to while/cond tuple plumbing
    rather than loss math.  Unrolled, those become hoisted constants.
    Trade-off is compile time (L=7 copies of the loss body), so it's a
    knob (train.unroll_loss) rather than unconditional.
    """
    if loss_at not in ("pred", "gt"):
        raise ValueError(f"loss_at must be 'pred' or 'gt', got {loss_at!r}")
    if num_points and rng is None:
        raise ValueError("num_points > 0 requires an rng key")
    g_full = gt.labels.shape[1]
    # Compact-width caveat in point mode: threefry assigns uniforms by
    # flattened position, so per-pair point draws under the narrower G
    # axis differ numerically from full-width draws — same distribution,
    # different stream.  Losses are therefore exactly-equal to
    # ``compact_gt=None`` only up to the point draw; everything the
    # points are USED for (uncertainty selection, sampling, loss
    # formulas) is unchanged.  The payoff is real: every per-pair point
    # cost (uncertainty oversampling, loss sampling fwd+bwd, GT target
    # sampling) scales with B*G, and G_full=64 vs ~16 valid slots was a
    # measured 2-4x on the point-path step.
    if (compact_gt is not None and compact_gt < g_full
            and matcher != "host"):
        gc = compact_gt
        kw = dict(num_classes=num_classes, bg_class_weight=bg_class_weight,
                  focal_weight=focal_weight, dice_weight=dice_weight,
                  matcher=matcher, loss_at=loss_at,
                  num_points=num_points, oversample_ratio=oversample_ratio,
                  importance_sample_ratio=importance_sample_ratio,
                  points_dtype=points_dtype, rng=rng, unroll=unroll)

        # prefix-valid ordering makes "any valid slot beyond gc" the exact
        # overflow predicate even for producers that don't sort (panoptic
        # targets): validity anywhere past the prefix triggers full width
        overflow = jnp.any(gt.valid[:, gc:])
        small_gt = GroundTruth(
            labels=gt.labels[:, :gc],
            masks=None if gt.masks is None else gt.masks[:, :gc],
            valid=gt.valid[:, :gc],
            dropped=gt.dropped,
            # slots >= gc are invalid here; gc is the truncated "no slot" id
            slot_map=(None if gt.slot_map is None
                      else jnp.minimum(gt.slot_map, gc)),
        )
        return jax.lax.cond(
            overflow,
            lambda: maskformer_loss(all_cls_scores, all_mask_preds, gt,
                                    **kw),
            lambda: maskformer_loss(all_cls_scores, all_mask_preds,
                                    small_gt, **kw),
        )
    class_weight = jnp.asarray(
        [1.0] * num_classes + [bg_class_weight], jnp.float32)

    # num_total_masks: the reference takes the cross-replica *mean* of the
    # per-rank matched-GT count (reduce_mean, :459).  With a single global
    # batch under jit-sharding the equivalent normalizer is the global count
    # scaled by 1/num_shards; we keep the global count and fold the shard
    # factor into the data-parallel loss scaling (see engine/train.py).
    num_total = jnp.maximum(jnp.sum(gt.valid.astype(jnp.float32)), 1.0)

    num_layers, b = all_cls_scores.shape[:2]
    g = gt.labels.shape[1]
    lazy = isinstance(all_mask_preds, LazyMasks)
    h, w = (all_mask_preds.mask_hw if lazy
            else all_mask_preds.shape[-2:])

    # ---- downsampled targets at mask resolution ----
    # (point mode samples GT at native resolution instead — the dense
    # mask-resolution stack is never built)
    slot_mode = gt.masks is None
    slot_ds = gt_ds = gt_cost = None
    if slot_mode:
        if not num_points:
            slot_ds = resize_nearest_torch(
                gt.slot_map[..., None], (h, w))[..., 0]  # [B, h, w] int32
            slots = jnp.arange(g, dtype=jnp.int32)
            gt_cost = (slot_ds[:, None]
                       == slots[None, :, None, None]).astype(
                all_mask_preds.dtype)
    else:
        if not num_points:
            gt_ds = resize_nearest_torch(gt.masks[..., None], (h, w))[..., 0]
            gt_cost = gt_ds

    # ---- matching, ALL layers in one assignment call ----
    # Every decoder layer is matched independently (the reference's
    # multi_apply over layers, :391-393), so the L per-layer problems fold
    # into one batch of L*B cost matrices.  This matters on TPU: the
    # auction is a sequential while-loop whose latency is iterations x
    # dispatch — batching layers divides that latency by L instead of
    # paying it once per layer inside the scan.  The cost MATRICES are
    # computed in a scan over layers (not one L-stacked vmap): the f32
    # sigmoid/pos/neg intermediates then live one layer at a time.
    cost_fn = jax.vmap(functools.partial(
        match_costs, focal_weight=focal_weight, dice_weight=dice_weight))

    if num_points:
        # point-sampled matching (mask2former_track_head.py:300-319): ONE
        # shared uniform point set per image per layer; pred and GT masks
        # are bilinearly point-sampled and the cost formulas run on the
        # [*, P] point vectors instead of [*, h*w] pixels
        match_keys = jax.random.split(
            jax.random.fold_in(rng, 0), num_layers)
        loss_keys = jax.random.split(
            jax.random.fold_in(rng, 1), num_layers)

        def cost_body(_, cm):
            cls_l, mask_l, key_l = cm
            if lazy:
                mask_l = all_mask_preds.layer(mask_l)  # embeds -> dense
            coords = jax.random.uniform(
                key_l, (b, num_points, 2), jnp.float32)
            pred_pts = point_sample_shared(mask_l, coords)
            if slot_mode:
                gt_pts = point_sample_slot(gt.slot_map, g, coords)
            else:
                gt_pts = point_sample_shared(gt.masks, coords)
            c = cost_fn(cls_l, pred_pts, gt.labels, gt_pts, gt.valid)
            return None, jax.lax.stop_gradient(c)

        _, costs = jax.lax.scan(
            cost_body, None,
            (all_cls_scores,
             all_mask_preds.embeds if lazy else all_mask_preds,
             match_keys), unroll=unroll)  # [L, B, nq, G]
    else:
        def cost_body(_, cm):
            cls_l, mask_l = cm
            if lazy:
                # flat [B, nq, hw]: the cost terms reshape to a flat pixel
                # axis anyway, so never materialize the [B, nq, h, w] form.
                # bf16 models hand the cost terms bf16 logits (the dtype
                # the cost machinery keys its contractions on — costs only
                # rank and the cost streams are the scan's bandwidth).
                mask_l = all_mask_preds.layer_flat(mask_l).astype(
                    all_mask_preds.feats.dtype)
            c = cost_fn(cls_l, mask_l, gt.labels, gt_cost, gt.valid)
            return None, jax.lax.stop_gradient(c)

        _, costs = jax.lax.scan(
            cost_body, None,
            (all_cls_scores,
             all_mask_preds.embeds if lazy
             else all_mask_preds), unroll=unroll)  # [L, B, nq, G]
    costs = costs.reshape(num_layers * b, -1, g)
    if matcher == "host":
        all_matched = hungarian_host(costs)  # one host round-trip, not L
        repaired = jnp.zeros((), jnp.int32)
    else:
        all_matched, repaired = auction_match(costs, with_stats=True)
    all_matched = all_matched.reshape(num_layers, b, g)
    all_matched = jnp.where(gt.valid[None], all_matched, -1)

    layer_fn = functools.partial(
        _layer_loss, gt=gt, gt_ds=gt_ds, slot_ds=slot_ds,
        num_classes=num_classes, class_weight=class_weight,
        focal_weight=focal_weight, dice_weight=dice_weight,
        num_total_masks=num_total, loss_at=loss_at,
        point_cfg=((num_points, oversample_ratio, importance_sample_ratio,
                    points_dtype) if num_points else None))

    # One scan over decoder layers: the loss body is traced and compiled
    # ONCE instead of L times.  The body is rematerialized: without
    # jax.checkpoint, autodiff saves every layer's loss intermediates —
    # recomputing the cheap loss math in the backward pass keeps one
    # layer's buffers live at a time.
    layer_fn_ckpt = jax.checkpoint(layer_fn)

    mask_xs = all_mask_preds.embeds if lazy else all_mask_preds

    def as_layer(mask_l):
        # lazy: hand _layer_loss the (LazyMasks, embeds_l) pair so it only
        # contracts the matched slots to pixels (never [B, nq, h, w])
        return (all_mask_preds, mask_l) if lazy else mask_l

    if num_points:
        def body(_, inputs):
            cls_l, mask_l, matched_l, key_l = inputs
            li = layer_fn_ckpt(cls_l, as_layer(mask_l), matched_l,
                               rng=key_l)
            return None, li

        _, stacked = jax.lax.scan(
            body, None,
            (all_cls_scores, mask_xs, all_matched, loss_keys),
            unroll=unroll)
    else:
        def body(_, inputs):
            cls_l, mask_l, matched_l = inputs
            li = layer_fn_ckpt(cls_l, as_layer(mask_l), matched_l)
            return None, li

        _, stacked = jax.lax.scan(
            body, None, (all_cls_scores, mask_xs, all_matched),
            unroll=unroll)

    losses: dict[str, jax.Array] = {}
    for k in ("loss_cls", "loss_mask", "loss_dice"):
        losses[k] = stacked[k][-1]
        for i in range(num_layers - 1):
            losses[f"d{i}.{k}"] = stacked[k][i]
    losses["total"] = sum(jnp.sum(v) for v in stacked.values())
    # observability: auction iteration-cap edge — valid GT columns the raw
    # auction left unmatched and the greedy repair then filled
    # (matcher.py _greedy_repair).  Supersedes the old always-zero-now
    # ``unmatched_gt`` counter: repair + the always-complete host matcher
    # mean no valid column ever goes without loss.
    losses["repaired_gt"] = repaired.astype(jnp.float32)
    return losses
