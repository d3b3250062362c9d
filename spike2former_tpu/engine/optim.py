"""Optimizer/schedule factory matching the reference training recipe.

Reference: configs/Spike2Former/SDTv2_maskformer_DCNpixelDecoder_ade20k.py
:138-167 — AdamW(lr=1e-3, betas=(0.9, 0.999), weight_decay=0.005), gradient
clipping at global-norm 0.01, LinearLR warmup (factor 1e-6 → 1 over 1500
iters) then PolyLR (power 1.0, eta_min 0) to 160k; param-wise multipliers:
backbone lr x0.1, query/level embeddings weight-decay 0.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
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


class FlatAdamWState(NamedTuple):
    """State of the fused flat AdamW: moments live as ONE vector each.

    ``lr_mult``/``wd`` are the per-element group multipliers in raveled
    layout, built once at ``init`` — carrying them in the state keeps them
    out of the jaxpr as 137 MB constants."""

    count: jax.Array
    mu: jax.Array
    nu: jax.Array
    lr_mult: jax.Array
    wd: jax.Array


def _flat_adamw(params_template: Any, base_lr, weight_decay,
                backbone_lr_mult, clip_norm, warmup_iters, total_iters,
                layer_decay_rate,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
                ) -> optax.GradientTransformation:
    """Fused AdamW over the raveled parameter vector.

    Numerically identical (same-op-order floating point, asserted in
    tests/test_extras.py) to the ``multi_transform`` chain below, but the
    per-parameter work is ~15 whole-vector ops instead of ~10 ops on each
    of ~1000 leaves — the pytree chain measured 19 ms/step on chip at the
    flagship size (~8% of the whole train step), almost all of it kernel
    dispatch on sub-4k-element leaves."""
    from jax.flatten_util import ravel_pytree

    labels = _param_labels(params_template)
    decay = (layerwise_decay_scales(params_template, layer_decay_rate)
             if layer_decay_rate is not None else None)
    sched = poly_warmup_schedule(base_lr, warmup_iters, total_iters)

    def init(params):
        flat, _ = ravel_pytree(params)
        flat = flat.astype(jnp.float32)

        def fill(tree):
            return ravel_pytree(jax.tree_util.tree_map(
                lambda p, v: jnp.full(p.shape, v, jnp.float32),
                params, tree))[0]

        lr_mult = fill(jax.tree_util.tree_map(
            lambda lb: backbone_lr_mult if lb == "backbone" else 1.0,
            labels))
        if decay is not None:
            lr_mult = lr_mult * fill(decay)
        wd = fill(jax.tree_util.tree_map(
            lambda lb: 0.0 if lb == "embed" else weight_decay, labels))
        return FlatAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(flat), nu=jnp.zeros_like(flat),
            lr_mult=lr_mult, wd=wd)

    def update(grads, state, params):
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        p, _ = ravel_pytree(params)
        p = p.astype(jnp.float32)

        # clip_by_global_norm (optax semantics: scale only when over)
        g_norm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, clip_norm / jnp.maximum(g_norm, 1e-16))

        count = state.count + 1
        cf = count.astype(jnp.float32)
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * g * g
        mu_hat = mu / (1.0 - b1 ** cf)
        nu_hat = nu / (1.0 - b2 ** cf)
        u = mu_hat / (jnp.sqrt(nu_hat) + eps)
        u = u + state.wd * p
        # schedule is linear in base_lr (eta_min = 0), so per-element lr
        # multipliers commute with it
        u = u * (-sched(state.count) * state.lr_mult)
        return unravel(u), FlatAdamWState(count, mu, nu, state.lr_mult,
                                          state.wd)

    return optax.GradientTransformation(init, update)


def make_optimizer(params: Any,
                   base_lr: float = 1e-3,
                   weight_decay: float = 0.005,
                   backbone_lr_mult: float = 0.1,
                   clip_norm: float = 0.01,
                   warmup_iters: int = 1500,
                   total_iters: int = 160_000,
                   layer_decay_rate: float | None = None,
                   flat: bool = True
                   ) -> optax.GradientTransformation:
    """AdamW + warmup-poly schedule + param groups (see module docstring).

    ``layer_decay_rate`` additionally applies layer-wise lr decay to the
    backbone (LearningRateDecayOptimizerConstructor; the shipped configs use
    the plain ``backbone lr_mult=0.1`` instead — :142-147).

    ``flat=True`` (default) runs the mathematically-identical fused
    implementation over the raveled parameter vector (see ``_flat_adamw``);
    ``flat=False`` keeps the optax pytree chain (reference formulation,
    used as the equivalence oracle in tests)."""
    if flat:
        return _flat_adamw(params, base_lr, weight_decay, backbone_lr_mult,
                           clip_norm, warmup_iters, total_iters,
                           layer_decay_rate)

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
