#!/usr/bin/env python
"""Training burn-in: a long synthetic-data run of the REAL train step on
the real chip, exercising checkpoint + mid-run resume + periodic val, and
recording loss/grad-norm stability (VERDICT round-1 item 7).

Synthetic task: blocky class maps rendered into images (class id -> gray
level + noise) so the loss has real signal and descent is measurable.

Usage:
  python tools/burnin.py --steps 5000 --batch-size 4 --ckpt-every 1000 \
      --resume-at 2500 --val-every 1000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_batch(rng, b, hw, num_classes, cells=4):
    import numpy as np

    base = rng.integers(0, num_classes, (b, cells, cells))
    sem = np.kron(base, np.ones((hw // cells, hw // cells),
                                np.int64)).astype(np.int32)
    gray = (sem.astype(np.float32) / num_classes) * 200.0 + 25.0
    img = gray[..., None] + rng.normal(0, 12, (b, hw, hw, 3))
    return np.clip(img, 0, 255).astype(np.float32), sem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--accum-steps", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--num-classes", type=int, default=150)
    ap.add_argument("--T", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--packed-residuals", action="store_true",
                    help="packed 4-bit spike residuals (ops/spike_op.py)")
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--resume-at", type=int, default=0,
                    help="simulate a failure at this step: rebuild state "
                         "from the latest checkpoint and continue")
    ap.add_argument("--val-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--work-dir", default="/tmp/burnin")
    ap.add_argument("--device", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CI smoke; seconds instead of minutes)")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.engine import (
        init_state, make_optimizer, make_train_step, whole_logits)
    from spike2former_tpu.engine.checkpoint import (
        latest_checkpoint, restore_state, save_state)
    from spike2former_tpu.models import Spike2Former

    if args.packed_residuals:
        from spike2former_tpu.ops.spike_op import enable_packed_residuals

        enable_packed_residuals(True)

    os.makedirs(args.work_dir, exist_ok=True)
    tiny_kw = dict(embed_dim=(8, 16, 24, 32), backbone_heads=4,
                   feat_channels=16, num_queries=4, num_decoder_layers=1,
                   num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
                   dcn_group=4) if args.tiny else {}
    model = Spike2Former(num_classes=args.num_classes, T=args.T,
                         dtype=getattr(jnp, args.dtype), **tiny_kw)
    hw = args.image_size
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((args.batch_size, hw, hw, 3), jnp.float32)
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), x0, True)["params"],
        warmup_iters=min(500, args.steps // 10), total_iters=args.steps)
    state = init_state(model, tx, jax.random.PRNGKey(0), x0)
    # donate the TrainState (XLA reuses param/opt buffers across steps —
    # one full state copy less in HBM, less fragmentation next to the
    # periodic-val inference executable)
    step_fn = jax.jit(make_train_step(
        model, tx, num_classes=args.num_classes, max_gt=64,
        accum_steps=args.accum_steps), donate_argnums=0)

    log_path = os.path.join(args.work_dir, "burnin.jsonl")
    log = open(log_path, "a")
    losses, gnorms = [], []
    resumed = False
    # Device-resident batch pool: per-step host->device upload of a fresh
    # 25 MB synthetic batch costs ~1.5 s over the axon relay and would
    # dominate the run; cycling a pool of pre-staged device batches keeps
    # the burn-in measuring the train step, not the tunnel.
    pool = []
    for _ in range(16):
        images, sem = synth_batch(rng, args.batch_size, hw,
                                  args.num_classes)
        pool.append((jax.device_put(jnp.asarray(images)),
                     jax.device_put(jnp.asarray(sem))))
    t0 = time.time()
    i = 0
    while i < args.steps:
        if args.resume_at and i == args.resume_at and not resumed:
            # simulate a crash: throw the live state away, restore latest
            ckpt = latest_checkpoint(args.work_dir)
            assert ckpt, "no checkpoint to resume from"
            fresh = init_state(model, tx, jax.random.PRNGKey(1), x0)
            state = restore_state(ckpt, fresh)
            i = int(state.step)
            resumed = True
            print(f"[burnin] simulated failure: resumed from {ckpt} "
                  f"at step {i}", flush=True)
        images, sem = pool[i % len(pool)]
        state, metrics = step_fn(state, images, sem)
        i += 1
        if i % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            losses.append(m["total"])
            gnorms.append(m["grad_norm"])
            rec = {"step": i, "loss": m["total"],
                   "grad_norm": m["grad_norm"],
                   "sec": round(time.time() - t0, 1)}
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(f"[burnin] step {i}/{args.steps} loss {m['total']:.3f} "
                  f"gnorm {m['grad_norm']:.3f}", flush=True)
            assert np.isfinite(m["total"]), f"NaN loss at step {i}"
        if i % args.ckpt_every == 0:
            save_state(args.work_dir, state, i)
        if args.val_every and i % args.val_every == 0:
            # small val batch: the whole-image inference executable and its
            # workspace live next to the train step's — keep it lean
            vimg, vsem = synth_batch(np.random.default_rng(42),
                                     min(args.batch_size, 2), hw,
                                     args.num_classes)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            logits = whole_logits(model, variables, jnp.asarray(vimg))
            acc = float((jnp.argmax(logits, -1) == jnp.asarray(vsem)
                         ).mean())
            print(f"[burnin] step {i} synthetic val pixel-acc {acc:.3f}",
                  flush=True)
            log.write(json.dumps({"step": i, "val_acc": acc}) + "\n")
            log.flush()

    dt = time.time() - t0
    if not losses:  # steps < log_every: summarize from the final metrics
        m = {k: float(v) for k, v in metrics.items()}
        losses.append(m["total"])
        gnorms.append(m["grad_norm"])
    n = max(len(losses) // 10, 1)
    print(json.dumps({
        "steps": args.steps,
        "wall_min": round(dt / 60, 1),
        "img_per_sec": round(args.steps * args.batch_size / dt, 2),
        "loss_first10%": round(float(np.mean(losses[:n])), 3),
        "loss_last10%": round(float(np.mean(losses[-n:])), 3),
        "grad_norm_max": round(float(np.max(gnorms)), 3),
        "resumed_mid_run": resumed,
        "all_finite": bool(np.isfinite(losses).all()),
    }))


if __name__ == "__main__":
    main()
