"""Optimizer/schedule factory matching the reference training recipe.

Reference: configs/Spike2Former/SDTv2_maskformer_DCNpixelDecoder_ade20k.py
:138-167 — AdamW(lr=1e-3, betas=(0.9, 0.999), weight_decay=0.005), gradient
clipping at global-norm 0.01, LinearLR warmup (factor 1e-6 → 1 over 1500
iters) then PolyLR (power 1.0, eta_min 0) to 160k; param-wise multipliers:
backbone lr x0.1, query/level embeddings weight-decay 0.
"""
from __future__ import annotations

from typing import Any

import jax
import optax


def poly_warmup_schedule(base_lr: float = 1e-3, warmup_iters: int = 1500,
                         total_iters: int = 160_000,
                         warmup_start_factor: float = 1e-6,
                         power: float = 1.0,
                         eta_min: float = 0.0) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (warmup_start_factor
                          + (1 - warmup_start_factor) * step / warmup_iters)
        frac = jnp.clip((step - warmup_iters) /
                        max(total_iters - warmup_iters, 1), 0.0, 1.0)
        poly = (base_lr - eta_min) * (1.0 - frac) ** power + eta_min
        return jnp.where(step < warmup_iters, warm, poly)

    return schedule


def _param_labels(params: Any) -> Any:
    """Label each parameter with its optimizer group.

    * ``backbone``: lr x0.1 (custom_keys 'backbone', :142-147)
    * ``embed``: zero weight decay (query_embed / query_feat / level_embed)
    * ``default``: everything else
    """

    def label(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys)
        if "backbone" in joined:
            return "backbone"
        if any(k in joined for k in ("query_embed", "query_feat",
                                     "level_embed")):
            return "embed"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(params: Any,
                   base_lr: float = 1e-3,
                   weight_decay: float = 0.005,
                   backbone_lr_mult: float = 0.1,
                   clip_norm: float = 0.01,
                   warmup_iters: int = 1500,
                   total_iters: int = 160_000,
                   layer_decay_rate: float | None = None
                   ) -> optax.GradientTransformation:
    """AdamW + warmup-poly schedule + param groups (see module docstring).

    ``layer_decay_rate`` additionally applies layer-wise lr decay to the
    backbone (LearningRateDecayOptimizerConstructor; the shipped configs use
    the plain ``backbone lr_mult=0.1`` instead — :142-147)."""
    def adamw(lr_mult: float, wd: float):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.add_decayed_weights(wd),
            optax.scale_by_schedule(
                poly_warmup_schedule(base_lr * lr_mult, warmup_iters,
                                     total_iters)),
            optax.scale(-1.0),
        )

    tx = optax.multi_transform(
        {
            "backbone": adamw(backbone_lr_mult, weight_decay),
            "embed": adamw(1.0, 0.0),
            "default": adamw(1.0, weight_decay),
        },
        _param_labels(params),
    )
    parts = [optax.clip_by_global_norm(clip_norm), tx]
    if layer_decay_rate is not None:
        scales = layerwise_decay_scales(params, layer_decay_rate)
        parts.append(optax.GradientTransformation(
            lambda _: optax.EmptyState(),
            lambda updates, state, params=None: (
                jax.tree_util.tree_map(lambda u, s: u * s, updates, scales),
                state),
        ))
    return optax.chain(*parts)


def layerwise_decay_scales(params: Any, decay_rate: float = 0.9,
                           num_layers: int = 12) -> Any:
    """Layer-wise lr decay — LearningRateDecayOptimizerConstructor
    equivalent (mmseg engine/optimizers/layer_decay_optimizer_constructor
    .py:104-207): deeper blocks get lr x decay^(num_layers - depth).

    Returns a pytree of scalar multipliers matching ``params``; combine
    with ``optax.scale_by_trust_ratio``-style masking or multiply into
    per-group learning rates.
    """
    import re

    def depth_of(path) -> int:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        m = re.search(r"block(\d)_(\d+)", joined)
        if m:
            stage, idx = int(m.group(1)), int(m.group(2))
            return min(2 * stage + idx, num_layers)
        m = re.search(r"(down|conv)(\d)_?", joined)
        if m:
            return int(m.group(2))
        return num_layers  # head params: no decay

    return jax.tree_util.tree_map_with_path(
        lambda path, _: decay_rate ** (num_layers - depth_of(path)), params)
