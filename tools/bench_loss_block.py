"""Isolated fwd+bwd benchmark of the MaskFormer training loss block.

Times ``value_and_grad(maskformer_loss)`` alone at flagship train shapes
(LazyMasks factored inputs, realistic blocky GT) so loss-path perf work can
iterate in seconds instead of full-model compile cycles.  The loss block
(matching + deep-supervision losses) was ~250 of 525 ms/iter in the round-5
B=16 train trace (work_dirs/trace_train_b16_v2.log: cond.84 + conditional).

Reference semantics being measured: mmdet maskformer_head.py loss_by_feat
(:367-496) at loss_at='gt' fidelity.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--layers", type=int, default=7)
    ap.add_argument("--classes", type=int, default=150)
    ap.add_argument("--gt-classes", type=int, default=16,
                    help="distinct classes per image (ADE crops: ~8-20)")
    ap.add_argument("--max-gt", type=int, default=64)
    ap.add_argument("--compact-gt", type=int, default=32)
    ap.add_argument("--loss-at", default="gt")
    ap.add_argument("--num-points", type=int, default=0)
    ap.add_argument("--unroll", action="store_true",
                    help="fully unroll the per-layer loss/cost scans")
    ap.add_argument("--mask-hw", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--device", default=None)
    ap.add_argument("--trace", default=None,
                    help="capture a device trace to this dir and print "
                         "top ops (trace_ops.top_ops)")
    args = ap.parse_args()

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from spike2former_tpu.losses.criterion import (LazyMasks,
                                                   maskformer_loss,
                                                   semantic_to_instances)

    b, L, nq, C, T = args.batch_size, args.layers, 100, 256, 1
    h = w = args.mask_hw
    gh = gw = 2 * args.mask_hw
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((T, b, h, w, C)) * 0.3,
                        jnp.bfloat16)
    embeds = jnp.asarray(rng.standard_normal((L, T, b, nq, C)) * 0.1,
                         jnp.bfloat16)
    cls = jnp.asarray(rng.standard_normal((L, b, nq, args.classes + 1)),
                      jnp.float32)
    table = rng.choice(args.classes, size=args.gt_classes, replace=False)
    bs = gh // 32
    blocks = table[rng.integers(0, args.gt_classes, (b, 32, 32))]
    sem = jnp.asarray(np.repeat(np.repeat(blocks, bs, 1), bs, 2), jnp.int32)
    key = jax.random.PRNGKey(0)

    def loss_fn(embeds, feats, cls):
        gt = semantic_to_instances(sem, args.classes, args.max_gt)
        out = maskformer_loss(
            cls, LazyMasks(embeds, feats), gt,
            num_classes=args.classes, matcher="auction",
            loss_at=args.loss_at, compact_gt=args.compact_gt,
            num_points=args.num_points,
            rng=key if args.num_points else None,
            unroll=args.unroll)
        return out["total"]

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2)))

    t0 = time.time()
    val, _ = step(embeds, feats, cls)
    float(val)  # host read = real sync over the axon relay
    print(f"compile+first: {time.time() - t0:.1f}s  loss={float(val):.3f}")

    t0 = time.time()
    for _ in range(args.iters):
        val, grads = step(embeds, feats, cls)
    float(val)
    dt = (time.time() - t0) / args.iters * 1000
    print(f"loss block fwd+bwd: {dt:.1f} ms/iter "
          f"(B={b} L={L} G<= {args.compact_gt}/{args.max_gt} "
          f"mask {h}x{w} loss_at={args.loss_at} points={args.num_points} "
          f"unroll={args.unroll})")

    if args.trace:
        from trace_ops import top_ops
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                val, _ = step(embeds, feats, cls)
            float(val)
        top_ops(args.trace, 40)


if __name__ == "__main__":
    main()
