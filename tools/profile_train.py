#!/usr/bin/env python
"""Component-level timing of the TRAIN step on the real chip — where do
the milliseconds go (round-3 VERDICT weak #1): forward, backward, matching,
mask losses, optimizer update.

Pieces are timed as separately-jitted programs, so the numbers are
indicative (XLA fuses differently inside the full step) but they bound the
component costs.  The model and every loss call are built from the SAME
config the shipped train path uses (``get_config``/``build_model``), so
defaults like ``lazy_masks``/``remat``/``compact_gt`` are honored — a
round-4 advisor finding: direct ``Spike2Former(...)`` construction here
silently measured the pre-LazyMasks dense-mask program (and OOM'd at
B=16).

Env knobs: B (batch), T, LOSS_AT (gt|pred), MATCHER (auction|host),
CFG (preset name), CFG_OPTS (space-separated --cfg-options overrides,
e.g. "train.loss_points=12544 model.remat=True").
"""
import os
import shlex
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(tree):
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(leaf.reshape(-1)[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters * 1000


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp
    import numpy as np
    import optax

    from spike2former_tpu.engine import make_optimizer, make_train_step
    from spike2former_tpu.engine.config import build_model, get_config
    from spike2former_tpu.engine.train import TrainState
    from spike2former_tpu.losses.criterion import (LazyMasks,
                                                   maskformer_loss,
                                                   semantic_to_instances)
    from spike2former_tpu.losses.matcher import auction_match, match_costs
    from spike2former_tpu.models.segmentor import preprocess
    from spike2former_tpu.utils import fast_variables

    batch = int(os.environ.get("B", 16))
    cfg = get_config(os.environ.get(
        "CFG", "SDTv2_maskformer_DCNpixelDecoder_ade20k"),
        shlex.split(os.environ.get("CFG_OPTS", "")))
    cfg.model.dtype = "bfloat16"
    if "T" in os.environ:
        cfg.model.T = int(os.environ["T"])
    if "LOSS_AT" in os.environ:
        cfg.train.loss_at = os.environ["LOSS_AT"]
    if "MATCHER" in os.environ:
        cfg.train.matcher = os.environ["MATCHER"]
    num_classes = cfg.model.num_classes
    tr = cfg.train

    loss_kw = dict(num_classes=num_classes, matcher=tr.matcher,
                   loss_at=tr.loss_at, compact_gt=tr.compact_gt or None,
                   num_points=tr.loss_points,
                   oversample_ratio=tr.loss_points_oversample,
                   importance_sample_ratio=tr.loss_points_importance)
    loss_rng = jax.random.PRNGKey(tr.seed) if tr.loss_points else None

    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (batch, 512, 512, 3)), jnp.float32)
    # realistic GT: ~16 distinct classes per crop (blocky), matching real
    # ADE20K crops; uniform-random pixels would put all 150 classes in
    # every image and force the loss pipeline's padded worst case
    table = rng.choice(num_classes, size=16, replace=False)
    blocks = table[rng.integers(0, 16, (batch, 32, 32))]
    sem = jnp.asarray(
        np.repeat(np.repeat(blocks, 16, axis=1), 16, axis=2), jnp.int32)
    variables = fast_variables(model, x)
    tx = make_optimizer(variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    print(f"B={batch} T={cfg.model.T} loss_at={tr.loss_at} "
          f"matcher={tr.matcher} lazy_masks={cfg.model.lazy_masks} "
          f"remat={cfg.model.remat} loss_points={tr.loss_points}")

    # 1. full train step (identical knobs to tools/train.py)
    step = jax.jit(make_train_step(
        model, tx, num_classes=num_classes, max_gt=tr.max_gt,
        matcher=tr.matcher, loss_at=tr.loss_at, compact_gt=tr.compact_gt,
        num_points=tr.loss_points,
        oversample_ratio=tr.loss_points_oversample,
        importance_sample_ratio=tr.loss_points_importance,
        points_dtype=tr.loss_points_dtype, seed=tr.seed,
        unroll_loss=tr.unroll_loss))
    t_full = timeit(lambda s: step(s, x, sem)[1]["total"], state)
    print(f"full train step:          {t_full:8.1f} ms")

    # 2. train-mode forward only (model apply with mutable BN)
    def fwd_raw(params, stats):
        xx = preprocess(x)
        (cls, masks), upd = model.apply(
            {"params": params, "batch_stats": stats}, xx, True,
            mutable=["batch_stats"])
        return cls, masks

    def fwd(params, stats):
        cls, masks = fwd_raw(params, stats)
        if isinstance(masks, LazyMasks):
            return cls[-1], masks.embeds[-1]
        return cls[-1], masks[-1]

    fwd_j = jax.jit(fwd)
    t_fwd = timeit(lambda: fwd_j(state.params, state.batch_stats))
    print(f"forward (train mode):     {t_fwd:8.1f} ms")

    # 3. forward + full loss, no grad
    def loss_only(params, stats):
        cls, masks = fwd_raw(params, stats)
        gt = semantic_to_instances(sem, num_classes, tr.max_gt)
        return maskformer_loss(cls, masks, gt, rng=loss_rng,
                               **loss_kw)["total"]

    loss_j = jax.jit(loss_only)
    t_loss = timeit(lambda: loss_j(state.params, state.batch_stats))
    print(f"forward + losses:         {t_loss:8.1f} ms "
          f"(matching+losses ~= {t_loss - t_fwd:.1f})")

    # 4. forward + loss + grad (no optimizer)
    grad_j = jax.jit(lambda p, s: jax.grad(
        lambda pp: loss_only(pp, s))(p))
    t_grad = timeit(lambda: grad_j(state.params, state.batch_stats))
    print(f"forward + loss + grad:    {t_grad:8.1f} ms "
          f"(backward ~= {t_grad - t_loss:.1f})")

    # 4b. model-only backward (no losses: grad of a scalar readout) —
    # isolates the conv/DCN-kernel backward from the loss backward
    def model_scalar(params, stats):
        c, m = fwd(params, stats)
        return jnp.sum(c.astype(jnp.float32)) + jnp.sum(
            m.astype(jnp.float32))

    mgrad_j = jax.jit(lambda p, s: jax.grad(
        lambda pp: model_scalar(pp, s))(p))
    t_mgrad = timeit(lambda: mgrad_j(state.params, state.batch_stats))
    print(f"model-only fwd+grad:      {t_mgrad:8.1f} ms "
          f"(model bwd ~= {t_mgrad - t_fwd:.1f})")

    # 4c. loss pipeline alone on FIXED predictions (fwd excluded):
    # matching + deep-supervised losses + their backward.  Fixed preds are
    # carried in the same form the model emits (factored when lazy_masks).
    nq = cfg.model.num_queries
    nl = cfg.model.num_decoder_layers + 1
    key = jax.random.PRNGKey(0)
    cls_fix = jax.random.normal(key, (nl, batch, nq, num_classes + 1),
                                jnp.float32)
    if cfg.model.lazy_masks:
        c = cfg.model.feat_channels
        t_steps = 1 if cfg.model.collapse_t else cfg.model.T
        mask_fix = LazyMasks(
            jax.random.normal(key, (nl, t_steps, batch, nq, c),
                              jnp.bfloat16),
            jax.random.normal(key, (t_steps, batch, 128, 128, c),
                              jnp.bfloat16))
        fix_args = (cls_fix, mask_fix.embeds, mask_fix.feats)

        def fixed_loss(cls, embeds, feats):
            gt = semantic_to_instances(sem, num_classes, tr.max_gt)
            return maskformer_loss(cls, LazyMasks(embeds, feats), gt,
                                   rng=loss_rng, **loss_kw)["total"]
    else:
        mask_fix = jax.random.normal(key, (nl, batch, nq, 128, 128),
                                     jnp.float32)
        fix_args = (cls_fix, mask_fix)

        def fixed_loss(cls, masks):
            gt = semantic_to_instances(sem, num_classes, tr.max_gt)
            return maskformer_loss(cls, masks, gt, rng=loss_rng,
                                   **loss_kw)["total"]

    lf_j = jax.jit(fixed_loss)
    t_lf = timeit(lambda: lf_j(*fix_args))
    lfg_j = jax.jit(jax.grad(fixed_loss,
                             argnums=tuple(range(len(fix_args)))))
    t_lfg = timeit(lambda: lfg_j(*fix_args))
    print(f"losses on fixed preds:    {t_lf:8.1f} ms fwd, "
          f"{t_lfg:8.1f} ms fwd+bwd")

    # 4d. submodule fwd / fwd+bwd — localize the model backward:
    # backbone vs the head (pixel decoder + transformer decoder)
    def backbone_scalar(params, stats):
        xx = preprocess(x)
        feats, _ = model.apply(
            {"params": params, "batch_stats": stats}, xx, True,
            mutable=["batch_stats"],
            method=lambda m, im, trn: m.backbone(im, trn))
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    bb_j = jax.jit(backbone_scalar)
    t_bb = timeit(lambda: bb_j(state.params, state.batch_stats))
    bbg_j = jax.jit(lambda p, s: jax.grad(
        lambda pp: backbone_scalar(pp, s))(p))
    t_bbg = timeit(lambda: bbg_j(state.params, state.batch_stats))
    print(f"backbone fwd / fwd+bwd:   {t_bb:8.1f} / {t_bbg:8.1f} ms")

    # head on FIXED backbone features (fwd excluded from the grad)
    feats_fix = jax.jit(
        lambda p, s: model.apply(
            {"params": p, "batch_stats": s}, preprocess(x), True,
            mutable=["batch_stats"],
            method=lambda m, im, trn: m.backbone(im, trn))[0]
    )(state.params, state.batch_stats)
    feats_fix = jax.tree_util.tree_map(
        jax.lax.stop_gradient, feats_fix)

    def head_scalar(params, stats):
        (cls, masks), _ = model.apply(
            {"params": params, "batch_stats": stats}, feats_fix, True,
            mutable=["batch_stats"],
            method=lambda m, fs, trn: m.head(fs, trn))
        m_last = (masks.embeds[-1] if isinstance(masks, LazyMasks)
                  else masks[-1])
        return (jnp.sum(cls[-1].astype(jnp.float32))
                + jnp.sum(m_last.astype(jnp.float32)))

    hd_j = jax.jit(head_scalar)
    t_hd = timeit(lambda: hd_j(state.params, state.batch_stats))
    hdg_j = jax.jit(lambda p, s: jax.grad(
        lambda pp: head_scalar(pp, s))(p))
    t_hdg = timeit(lambda: hdg_j(state.params, state.batch_stats))
    print(f"head fwd / fwd+bwd:       {t_hd:8.1f} / {t_hdg:8.1f} ms")

    # 5. optimizer update alone
    grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def opt(g, st):
        updates, new_opt = tx.update(g, st.opt_state, st.params)
        return optax.apply_updates(st.params, updates)

    opt_j = jax.jit(opt)
    t_opt = timeit(lambda: opt_j(grads, state))
    print(f"optimizer update:         {t_opt:8.1f} ms")

    # 6. matching alone at the final-layer shapes (downsampled GT)
    def match_only(params, stats):
        cls, masks = fwd_raw(params, stats)
        mask_last = (masks.layer(masks.embeds[-1])
                     if isinstance(masks, LazyMasks) else masks[-1])
        gt = semantic_to_instances(sem, num_classes, tr.max_gt)
        from spike2former_tpu.ops.resize import resize_nearest_torch
        gtm = resize_nearest_torch(
            gt.dense_masks()[..., None], mask_last.shape[-2:])[..., 0]
        cost = jax.vmap(functools.partial(match_costs))(
            cls[-1], mask_last, gt.labels, gtm, gt.valid)
        return auction_match(cost)

    if tr.matcher == "auction":
        match_j = jax.jit(match_only)
        t_match = timeit(lambda: match_j(state.params, state.batch_stats))
        print(f"forward + 1-layer match:  {t_match:8.1f} ms "
              f"(one matching ~= {t_match - t_fwd:.1f})")


if __name__ == "__main__":
    main()
