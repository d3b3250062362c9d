#!/usr/bin/env python
"""FPS benchmark — tools/analysis_tools/benchmark.py equivalent: N-iter
average with warmup, batch configurable, real device sync each timing
block."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config",
                    default="SDTv2_maskformer_DCNpixelDecoder_ade20k",
                    nargs="?")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--num-iters", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--image-size", type=int, nargs=2, default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="benchmark the jitted TRAIN step instead of "
                         "inference (synthetic GT)")
    ap.add_argument("--accum-steps", type=int, default=1)
    ap.add_argument("--mfu", action="store_true",
                    help="report XLA-exact FLOPs and model FLOPs "
                         "utilization (peak from --peak-tflops)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak bf16 TFLOP/s (v5e: 197)")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--device", default=None,
                    help="force backend, e.g. cpu (the image pins "
                         "JAX_PLATFORMS=axon via sitecustomize)")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.engine.config import build_model, get_config
    from spike2former_tpu.utils.initfast import fast_variables

    cfg = get_config(args.config, args.cfg_options)
    cfg.model.dtype = args.dtype
    if cfg.train.packed_residuals:
        from spike2former_tpu.ops.spike_op import enable_packed_residuals

        enable_packed_residuals(True)
    model = build_model(cfg.model)
    size = tuple(args.image_size or cfg.data.crop_size)

    # --batch-size is the per-accumulation microbatch; the train step takes
    # the full global batch and splits it into accum_steps microbatches
    # (engine/train.py), so the input arrays carry batch*accum images.
    total_batch = args.batch_size * (args.accum_steps if args.train else 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(120, 60, (total_batch, *size, 3)),
                    jnp.float32)
    variables = fast_variables(model, x)

    if args.train:
        from spike2former_tpu.engine import (
            init_state, make_optimizer, make_train_step)

        tx = make_optimizer(variables["params"])
        from spike2former_tpu.engine.train import TrainState
        import optax

        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]))
        # realistic GT: ~16 distinct classes per crop as nearest-upsampled
        # blocks (ADE20K crops average ~10; uniform-random pixels would
        # claim all 150 classes present and drive the loss pipeline into
        # its padded worst case — see criterion.maskformer_loss compact_gt)
        distinct = min(16, cfg.model.num_classes)
        table = rng.choice(cfg.model.num_classes, size=distinct,
                           replace=False)
        blocks = table[rng.integers(0, distinct,
                                    (total_batch, 32, 32))]
        sem = jnp.asarray(np.repeat(np.repeat(
            blocks, size[0] // 32, axis=1), size[1] // 32, axis=2)[
                :, :size[0], :size[1]], jnp.int32)
        step = jax.jit(make_train_step(
            model, tx, num_classes=cfg.model.num_classes,
            max_gt=cfg.train.max_gt, matcher=cfg.train.matcher,
            loss_at=cfg.train.loss_at, accum_steps=args.accum_steps,
            compact_gt=cfg.train.compact_gt,
            num_points=cfg.train.loss_points,
            oversample_ratio=cfg.train.loss_points_oversample,
            importance_sample_ratio=cfg.train.loss_points_importance,
            points_dtype=cfg.train.loss_points_dtype,
            seed=cfg.train.seed,
            unroll_loss=cfg.train.unroll_loss))

        def run(st):
            st, metrics = step(st, x, sem)
            return st, metrics

        for _ in range(args.warmup):
            state, metrics = run(state)
        float(metrics["total"])
        t0 = time.time()
        for _ in range(args.num_iters):
            state, metrics = run(state)
        float(metrics["total"])
        dt = (time.time() - t0) / args.num_iters
        flops_str = ""
        if args.mfu:
            from spike2former_tpu.utils.flops import (cost_analysis,
                                                      dcn_sampling_flops)

            if args.accum_steps > 1:
                # XLA's cost analysis counts a while/scan body ONCE, so the
                # full accum program under-reports by ~accum_steps (the
                # round-4 "2.8% MFU at accum-3" anomaly was exactly this:
                # 1598 ms ≈ 3 x the 536 ms single-microbatch step, but the
                # FLOPs stayed at one microbatch's).  Cost the accum=1
                # program on one microbatch and scale; the (accum-1) extra
                # optimizer-update countings are <0.1% of a step.
                step1 = jax.jit(make_train_step(
                    model, tx, num_classes=cfg.model.num_classes,
                    max_gt=cfg.train.max_gt, matcher=cfg.train.matcher,
                    loss_at=cfg.train.loss_at, accum_steps=1,
                    compact_gt=cfg.train.compact_gt,
                    num_points=cfg.train.loss_points,
                    oversample_ratio=cfg.train.loss_points_oversample,
                    importance_sample_ratio=cfg.train.loss_points_importance,
            points_dtype=cfg.train.loss_points_dtype,
                    seed=cfg.train.seed,
            unroll_loss=cfg.train.unroll_loss))
                costs = cost_analysis(
                    lambda s, i, g: step1(s, i, g), state,
                    x[:args.batch_size], sem[:args.batch_size])
                fl = costs.get("flops", float("nan")) * args.accum_steps
            else:
                costs = cost_analysis(lambda s, i, g: step(s, i, g),
                                      state, x, sem)
                fl = costs.get("flops", float("nan"))
            mfu = fl / dt / (args.peak_tflops * 1e12)
            flops_str = f", {fl/1e12:.2f} TFLOP/step, MFU {mfu*100:.1f}%"
            if (jax.default_backend() == "tpu"
                    and cfg.model.kind == "maskformer"):
                pfl = dcn_sampling_flops(
                    total_batch, size,
                    num_layers=cfg.model.num_encoder_layers,
                    group=min(cfg.model.dcn_group, cfg.model.feat_channels),
                    group_channels=cfg.model.feat_channels
                    // min(cfg.model.dcn_group, cfg.model.feat_channels),
                    train=True)
                mfu2 = (fl + pfl) / dt / (args.peak_tflops * 1e12)
                flops_str += (f" [Pallas sampling est {pfl/1e12:.2f} TFLOP"
                              f" → MFU {mfu2*100:.1f}% if uncounted]")
        mem_str = ""
        stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
        if stats and stats.get("peak_bytes_in_use"):
            mem_str = (f", peak HBM "
                       f"{stats['peak_bytes_in_use'] / 2**30:.2f} GiB")
        print(f"{cfg.name} TRAIN: {dt*1000:.2f} ms/iter, "
              f"{total_batch/dt:.2f} img/s (batch {args.batch_size}, "
              f"{size[0]}x{size[1]}, T={cfg.model.T}, "
              f"accum {args.accum_steps}{flops_str}{mem_str})")
        return

    fwd = jax.jit(lambda v, im: model.apply(
        v, im, method=type(model).predict_logits))
    for _ in range(args.warmup):
        out = fwd(variables, x)
    float(out.mean())

    t0 = time.time()
    for _ in range(args.num_iters):
        out = fwd(variables, x)
    float(out.mean())  # device sync
    dt = (time.time() - t0) / args.num_iters
    fps = args.batch_size / dt
    flops_str = ""
    if args.mfu:
        from spike2former_tpu.utils.flops import (cost_analysis,
                                                  dcn_sampling_flops)

        costs = cost_analysis(
            lambda v, im: model.apply(v, im,
                                      method=type(model).predict_logits),
            variables, x)
        fl = costs.get("flops", float("nan"))
        mfu = fl / dt / (args.peak_tflops * 1e12)
        flops_str = f", {fl/1e12:.2f} TFLOP/fwd, MFU {mfu*100:.1f}%"
        if jax.default_backend() == "tpu" and cfg.model.kind == "maskformer":
            g = min(cfg.model.dcn_group, cfg.model.feat_channels)
            pfl = dcn_sampling_flops(
                args.batch_size, size,
                num_layers=cfg.model.num_encoder_layers, group=g,
                group_channels=cfg.model.feat_channels // g)
            mfu2 = (fl + pfl) / dt / (args.peak_tflops * 1e12)
            flops_str += (f" [Pallas sampling est {pfl/1e12:.2f} TFLOP"
                          f" → MFU {mfu2*100:.1f}% if uncounted]")
    print(f"{cfg.name}: {dt*1000:.2f} ms/iter, {fps:.2f} img/s "
          f"(batch {args.batch_size}, {size[0]}x{size[1]}, "
          f"T={cfg.model.T}{flops_str})")


if __name__ == "__main__":
    main()
