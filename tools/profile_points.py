#!/usr/bin/env python
"""Isolate the point-sampled-loss cliff (round-4 fixup: 2,912 ms/iter B=4,
13,062 ms/iter B=16 vs 194/536 ms dense): time each point-path component
at flagship shapes on the real chip.

Components (per decoder layer; L=7 in the full step):
  A. uncertain_point_coords on [B*G, h, w] logits (3x oversample, top-k)
  B.   - its inner point_sample at 3P uniform points (fwd only)
  C.   - lax.top_k alone on [B*G, 3P]
  D. point_sample fwd at P (the loss-path sampling)
  E. point_sample fwd+grad at P (the only gradient-carrying sampler)
  F. point_sample_slot per-pair GT sampling on [B, 512, 512] slot map
  G. point_sample_shared matching-cost sampling [B, nq, h, w] @ shared P
  H. point_sample_slot shared-coords GT cost sampling
  I. full maskformer_loss(num_points=P) fwd / fwd+bwd on fixed preds

Env: B (default 16), G (64), P (12544), NQ (100), H (256).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=5, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.time() - t0) / iters * 1000


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from spike2former_tpu.losses.criterion import (GroundTruth,
                                                   maskformer_loss)
    from spike2former_tpu.losses.point_sample import (
        point_sample, point_sample_shared, point_sample_slot,
        uncertain_point_coords)

    b = int(os.environ.get("B", 16))
    g = int(os.environ.get("G", 64))
    p = int(os.environ.get("P", 12544))
    nq = int(os.environ.get("NQ", 100))
    h = w = int(os.environ.get("H", 256))
    gh = gw = 2 * h
    n = b * g
    osr = 3.0
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    logits = jax.random.normal(k1, (b, g, h, w), jnp.float32)
    coords_pp = jax.random.uniform(k2, (b, g, p, 2), jnp.float32)
    coords_sh = jax.random.uniform(k2, (b, p, 2), jnp.float32)
    slot_map = jax.random.randint(k3, (b, gh, gw), 0, g + 1)
    masks_nq = jax.random.normal(k4, (b, nq, h, w), jnp.float32)
    print(f"B={b} G={g} P={p} NQ={nq} mask {h}x{w}, GT {gh}x{gw}")

    # A. uncertainty coords (fwd only, stop_gradient semantics)
    ua = jax.jit(lambda lg: uncertain_point_coords(
        jax.random.PRNGKey(1), lg, p, osr, 0.75))
    print(f"A uncertain_point_coords:      {timeit(ua, logits):9.1f} ms")

    # B. inner oversampled point_sample (fwd)
    n_s = int(p * osr)
    cov = jax.random.uniform(k2, (b, g, n_s, 2), jnp.float32)
    pb = jax.jit(lambda m, c: point_sample(m, c))
    print(f"B point_sample fwd @3P:        {timeit(pb, logits, cov):9.1f} ms")

    # C. top_k alone at the uncertainty shape
    unc = jax.random.normal(k1, (n, n_s), jnp.float32)
    tk = jax.jit(lambda u: jax.lax.top_k(u, int(0.75 * p))[1])
    print(f"C top_k [{n},{n_s}] k={int(0.75*p)}: {timeit(tk, unc):9.1f} ms")

    # D/E. gradient-carrying loss-path sampling
    pd = jax.jit(lambda m, c: point_sample(m, c))
    print(f"D point_sample fwd @P:         "
          f"{timeit(pd, logits, coords_pp):9.1f} ms")
    pe = jax.jit(jax.grad(lambda m, c: point_sample(m, c).sum()))
    print(f"E point_sample fwd+grad @P:    "
          f"{timeit(pe, logits, coords_pp):9.1f} ms")

    # F. per-pair GT slot sampling (fwd, no grad)
    pf = jax.jit(lambda s, c: point_sample_slot(s, g, c))
    print(f"F point_sample_slot per-pair:  "
          f"{timeit(pf, slot_map, coords_pp):9.1f} ms")

    # G. matching-cost pred sampling (shared coords)
    pg = jax.jit(lambda m, c: point_sample_shared(m, c))
    print(f"G point_sample_shared [B,nq]:  "
          f"{timeit(pg, masks_nq, coords_sh):9.1f} ms")

    # H. matching-cost GT sampling (shared coords, slot map)
    ph = jax.jit(lambda s, c: point_sample_slot(s, g, c))
    print(f"H point_sample_slot shared:    "
          f"{timeit(ph, slot_map, coords_sh):9.1f} ms")

    # I. full point-mode loss on fixed preds (all 7 layers)
    nl = 7
    cls_fix = jax.random.normal(k1, (nl, b, nq, 151), jnp.float32)
    mask_fix = jax.random.normal(k4, (nl, b, nq, h, w), jnp.float32)
    labels = jax.random.randint(k3, (b, g), 0, 150)
    valid = jnp.ones((b, g), bool).at[:, 16:].set(False)
    gt = GroundTruth(labels=labels, masks=None, valid=valid,
                     slot_map=jnp.where(slot_map > 16, g, slot_map))

    def floss(cls, masks):
        return maskformer_loss(
            cls, masks, gt, num_classes=150, matcher="auction",
            num_points=p, rng=jax.random.PRNGKey(2))["total"]

    fi = jax.jit(floss)
    print(f"I loss(points) fwd:            "
          f"{timeit(fi, cls_fix, mask_fix, iters=3):9.1f} ms")
    fig = jax.jit(jax.grad(floss, argnums=(0, 1)))
    print(f"I loss(points) fwd+bwd:        "
          f"{timeit(fig, cls_fix, mask_fix, iters=3):9.1f} ms")


if __name__ == "__main__":
    main()
