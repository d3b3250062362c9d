#!/usr/bin/env python
"""Component-level timing of the TRAIN step on the real chip — where do
the milliseconds go (round-3 VERDICT weak #1): forward, backward, matching,
mask losses, optimizer update.

Pieces are timed as separately-jitted programs, so the numbers are
indicative (XLA fuses differently inside the full step) but they bound the
component costs.  Env knobs: B (batch), T, LOSS_AT (gt|pred),
MATCHER (auction|host).
"""
import os
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
    import jax.numpy as jnp
    import numpy as np
    import optax

    from spike2former_tpu.engine import make_optimizer, make_train_step
    from spike2former_tpu.engine.train import TrainState
    from spike2former_tpu.losses.criterion import (maskformer_loss,
                                                   semantic_to_instances)
    from spike2former_tpu.losses.matcher import auction_match, match_costs
    from spike2former_tpu.models import Spike2Former
    from spike2former_tpu.models.segmentor import preprocess
    from spike2former_tpu.utils import fast_variables

    batch = int(os.environ.get("B", 16))
    T = int(os.environ.get("T", 4))
    loss_at = os.environ.get("LOSS_AT", "gt")
    matcher = os.environ.get("MATCHER", "auction")
    num_classes = 150

    model = Spike2Former(num_classes=num_classes, T=T, dtype=jnp.bfloat16)
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
    print(f"B={batch} T={T} loss_at={loss_at} matcher={matcher}")

    # 1. full train step
    step = jax.jit(make_train_step(model, tx, num_classes=num_classes,
                                   matcher=matcher, loss_at=loss_at))
    t_full = timeit(lambda s: step(s, x, sem)[1]["total"], state)
    print(f"full train step:          {t_full:8.1f} ms")

    # 2. train-mode forward only (model apply with mutable BN)
    def fwd(params, stats):
        xx = preprocess(x)
        (cls, masks), upd = model.apply(
            {"params": params, "batch_stats": stats}, xx, True,
            mutable=["batch_stats"])
        return cls[-1], masks[-1]

    fwd_j = jax.jit(fwd)
    t_fwd = timeit(lambda: fwd_j(state.params, state.batch_stats))
    print(f"forward (train mode):     {t_fwd:8.1f} ms")

    # 3. forward + full loss, no grad
    def loss_only(params, stats):
        xx = preprocess(x)
        (cls, masks), _ = model.apply(
            {"params": params, "batch_stats": stats}, xx, True,
            mutable=["batch_stats"])
        gt = semantic_to_instances(sem, num_classes, 64)
        return maskformer_loss(cls, masks, gt, num_classes=num_classes,
                               matcher=matcher, loss_at=loss_at,
                               compact_gt=32)["total"]

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
    # matching + deep-supervised losses + their backward
    def fixed_loss(cls, masks):
        gt = semantic_to_instances(sem, num_classes, 64)
        return maskformer_loss(cls, masks, gt, num_classes=num_classes,
                               matcher=matcher, loss_at=loss_at,
                               compact_gt=32)["total"]

    key = jax.random.PRNGKey(0)
    cls_fix = jax.random.normal(key, (7, batch, 100, num_classes + 1),
                                jnp.float32)
    mask_fix = jax.random.normal(key, (7, batch, 100, 128, 128),
                                 jnp.float32)
    lf_j = jax.jit(fixed_loss)
    t_lf = timeit(lambda: lf_j(cls_fix, mask_fix))
    lfg_j = jax.jit(jax.grad(fixed_loss, argnums=(0, 1)))
    t_lfg = timeit(lambda: lfg_j(cls_fix, mask_fix))
    print(f"losses on fixed preds:    {t_lf:8.1f} ms fwd, "
          f"{t_lfg:8.1f} ms fwd+bwd")

    # 4d. submodule fwd / fwd+bwd — localize the model backward:
    # backbone vs the head (pixel decoder + transformer decoder)
    def backbone_scalar(params, stats):
        xx = preprocess(x)
        feats, _ = model.apply(
            {"params": params, "batch_stats": stats}, xx, True,
            mutable=["batch_stats"],
            method=lambda m, im, tr: m.backbone(im, tr))
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
            method=lambda m, im, tr: m.backbone(im, tr))[0]
    )(state.params, state.batch_stats)
    feats_fix = jax.tree_util.tree_map(
        jax.lax.stop_gradient, feats_fix)

    def head_scalar(params, stats):
        (cls, masks), _ = model.apply(
            {"params": params, "batch_stats": stats}, feats_fix, True,
            mutable=["batch_stats"],
            method=lambda m, fs, tr: m.head(fs, tr))
        return (jnp.sum(cls[-1].astype(jnp.float32))
                + jnp.sum(masks[-1].astype(jnp.float32)))

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
        import functools

        xx = preprocess(x)
        (cls, masks), _ = model.apply(
            {"params": params, "batch_stats": stats}, xx, True,
            mutable=["batch_stats"])
        gt = semantic_to_instances(sem, num_classes, 64)
        from spike2former_tpu.ops.resize import resize_nearest_torch
        gtm = resize_nearest_torch(
            gt.dense_masks()[..., None], masks[-1].shape[-2:])[..., 0]
        cost = jax.vmap(functools.partial(match_costs))(
            cls[-1], masks[-1], gt.labels, gtm, gt.valid)
        return auction_match(cost)

    if matcher == "auction":
        match_j = jax.jit(match_only)
        t_match = timeit(lambda: match_j(state.params, state.batch_stats))
        print(f"forward + 1-layer match:  {t_match:8.1f} ms "
              f"(one matching ~= {t_match - t_fwd:.1f})")


if __name__ == "__main__":
    main()
