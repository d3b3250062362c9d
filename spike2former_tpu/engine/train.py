"""Training step: forward + Hungarian-matched loss + AdamW update, designed
to be ``jit``-ed over a device mesh.

Equivalent of the reference's mmengine IterBasedTrainLoop + OptimWrapper
(tools/train.py + configs ...ade20k.py:149-167) — but as one pure function:
no hooks, no membrane-reset bookkeeping (the spike ops are stateless, see
ops/spike.py), gradients/metrics reduced by XLA collectives instead of NCCL.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..losses import maskformer_loss, semantic_to_instances
from ..models.segmentor import Spike2Former, preprocess


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def init_state(model: Spike2Former, tx: optax.GradientTransformation,
               rng: jax.Array, sample_images: jax.Array) -> TrainState:
    variables = model.init({"params": rng, "dropout": rng},
                           sample_images, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model: Spike2Former, tx: optax.GradientTransformation,
                    num_classes: int, max_gt: int = 64,
                    matcher: str = "auction", loss_at: str = "gt",
                    accum_steps: int = 1, compact_gt: int = 32,
                    num_points: int = 0, oversample_ratio: float = 3.0,
                    importance_sample_ratio: float = 0.75,
                    points_dtype: str = "float32", seed: int = 0,
                    unroll_loss: bool = False):
    """Returns ``train_step(state, images_u8, sem_seg) -> (state, metrics)``.

    images_u8: [B, H, W, 3] RGB; sem_seg: [B, H, W] int32 class map with 255
    as ignore.  All shapes static; GT is padded per ``semantic_to_instances``.

    ``accum_steps > 1`` splits the batch into that many sequential
    microbatches inside one jitted step (gradients averaged, ONE optimizer
    update) — how a single chip reaches the reference's global batch 48
    (configs ...ade20k.py:181-182) without 48 activations in HBM.  The
    microbatch loop is a ``lax.scan``, so compile time stays flat.

    ``num_points > 0`` trains with the Mask2Former point-sampled
    matching/mask losses (losses/point_sample.py; upstream K=12544) —
    point coords derive from ``fold_in(seed, step)``, so runs are
    reproducible and resume-stable.
    """

    def loss_fn(params, batch_stats, images, sem_seg, rng):
        x = preprocess(images)
        (cls_scores, mask_preds), updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, True,
            mutable=["batch_stats"])
        gt = semantic_to_instances(sem_seg, num_classes, max_gt)
        losses = maskformer_loss(
            cls_scores, mask_preds, gt, num_classes=num_classes,
            matcher=matcher, loss_at=loss_at,
            compact_gt=compact_gt or None,
            num_points=num_points, oversample_ratio=oversample_ratio,
            importance_sample_ratio=importance_sample_ratio,
            points_dtype=jnp.dtype(points_dtype), rng=rng,
            unroll=unroll_loss)
        losses["dropped_gt"] = gt.dropped.sum().astype(jnp.float32)
        return losses["total"], (losses, updates["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, images, sem_seg):  # noqa: C901
        rng = (jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
               if num_points else None)
        if accum_steps == 1:
            (_, (losses, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, images, sem_seg, rng)
        else:
            b = images.shape[0]
            assert b % accum_steps == 0, (b, accum_steps)
            mb = b // accum_steps
            im_s = images.reshape(accum_steps, mb, *images.shape[1:])
            seg_s = sem_seg.reshape(accum_steps, mb, *sem_seg.shape[1:])
            mb_idx = jnp.arange(accum_steps, dtype=jnp.uint32)

            def body(carry, xs):
                stats, grad_acc = carry
                mb_rng = (jax.random.fold_in(rng, xs[2])
                          if num_points else None)
                (_, (losses, stats)), grads = grad_fn(
                    state.params, stats, xs[0], xs[1], mb_rng)
                grad_acc = jax.tree_util.tree_map(
                    jnp.add, grad_acc, grads)
                return (stats, grad_acc), losses

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, grads), losses_s = jax.lax.scan(
                body, (state.batch_stats, zero), (im_s, seg_s, mb_idx))
            grads = jax.tree_util.tree_map(
                lambda g: g / accum_steps, grads)
            losses = jax.tree_util.tree_map(
                lambda v: v.mean(0), losses_s)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_stats,
                          new_opt), metrics

    return train_step


def make_train_step_fpn(model, tx: optax.GradientTransformation,
                        loss_decode=(("ce", 1.0),)):
    """Train step for the FPN per-pixel family (SURVEY §2.9; reference
    configs/FPN/*).  ``loss_decode`` mirrors the mmseg head's configurable
    decode loss (single or list — decode_head.py:115-128): a sequence of
    (name, weight[, kwargs]) over the pixel-loss zoo (losses/pixel.py:
    ce / lovasz / tversky / ohem / hausdorff).
    """
    from ..losses.pixel import build_pixel_loss, pixel_accuracy

    pixel_loss = build_pixel_loss(loss_decode)

    def loss_fn(params, batch_stats, images, sem_seg, rng):
        x = preprocess(images)
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        if isinstance(logits, (list, tuple)):
            # cascade: every stage gets its own decode loss, summed under a
            # decode_<i> prefix (cascade_encoder_decoder.py:90-116)
            total = jnp.float32(0.0)
            metrics = {}
            for i, stage_logits in enumerate(logits):
                stage_total, stage_metrics = pixel_loss(stage_logits,
                                                        sem_seg)
                total = total + stage_total
                metrics.update({f"decode_{i}.{k}": v
                                for k, v in stage_metrics.items()})
            metrics["acc_seg"] = pixel_accuracy(logits[-1], sem_seg)
        else:
            total, metrics = pixel_loss(logits, sem_seg)
            metrics["acc_seg"] = pixel_accuracy(logits, sem_seg)
        return total, (metrics, updates["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, images, sem_seg):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        (total, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, sem_seg, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["total"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_stats,
                          new_opt), metrics

    return train_step


def make_train_step_panoptic(model: Spike2Former,
                             tx: optax.GradientTransformation,
                             num_classes: int, matcher: str = "auction",
                             loss_at: str = "gt", compact_gt: int = 32,
                             num_points: int = 0,
                             oversample_ratio: float = 3.0,
                             importance_sample_ratio: float = 0.75,
                             points_dtype: str = "float32",
                             seed: int = 0, unroll_loss: bool = False):
    """Panoptic training step: GT arrives as padded instance targets
    (labels [B, G], masks [B, G, H, W], valid [B, G]) built by
    ``data.panoptic.panoptic_train_batches`` — things keep instance
    identity, stuff is one segment per class (preprocess_panoptic_gt
    semantics).  The loss/matching pipeline is shared with the semantic
    path."""
    from ..losses.criterion import GroundTruth, slot_map_from_masks

    def loss_fn(params, batch_stats, images, labels, masks, valid, rng):
        x = preprocess(images)
        (cls_scores, mask_preds), updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, True,
            mutable=["batch_stats"])
        # panoptic segments are disjoint by construction (id-PNG source),
        # so the compact slot-map form applies (see criterion docstring)
        gt = GroundTruth(labels, None, valid,
                         slot_map=slot_map_from_masks(masks, valid))
        losses = maskformer_loss(
            cls_scores, mask_preds, gt, num_classes=num_classes,
            matcher=matcher, loss_at=loss_at,
            compact_gt=compact_gt or None,
            num_points=num_points, oversample_ratio=oversample_ratio,
            importance_sample_ratio=importance_sample_ratio,
            points_dtype=jnp.dtype(points_dtype), rng=rng,
            unroll=unroll_loss)
        return losses["total"], (losses, updates["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, images, labels, masks, valid):
        rng = (jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
               if num_points else None)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, labels, masks, valid,
            rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, new_params, new_stats,
                          new_opt), metrics

    return train_step
