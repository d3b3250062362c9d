#!/usr/bin/env python
"""Training CLI — the tools/train.py equivalent.

Usage:
  python tools/train.py SDTv2_maskformer_DCNpixelDecoder_ade20k \
      --data-root /data/ade --cfg-options model.T=4 train.total_iters=1000
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def evaluate(cfg, model, state, max_images, vis_interval=0, vis_dir=None):
    """Periodic validation (mmengine val loop + save_best equivalent).

    ``vis_interval > 0`` renders every Nth val prediction as a palette
    overlay into ``vis_dir`` — the train-loop counterpart of the
    reference's SegVisualizationHook(draw=True, interval=N)
    (mmseg/engine/hooks/visualization_hook.py), which draws during the
    periodic val loop; the test-time equivalent is tools/test.py
    --show-dir.
    """
    import jax.numpy as jnp

    import numpy as np

    from spike2former_tpu.data import eval_batches, make_dataset
    from spike2former_tpu.engine import postprocess_pred, whole_logits
    from spike2former_tpu.evaluation import (
        compute_iou, init_iou, update_iou_np)

    try:
        ds = make_dataset(cfg.data.dataset, cfg.data.data_root, "val")
    except FileNotFoundError:
        return float("nan")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    iou = init_iou(cfg.model.num_classes)
    n = 0
    for images, sem, metas in eval_batches(
            ds, scale=cfg.data.test_scale,
            size_divisor=cfg.data.size_divisor, bucket=cfg.test.bucket):
        if sem is None:
            continue
        valid = ([metas[0]["img_shape"]] if cfg.test.bucket else None)
        logits = whole_logits(model, variables, jnp.asarray(images),
                              valid_hw=valid)
        pred = postprocess_pred(logits, metas[0].get("pad_shape"),
                                metas[0]["ori_shape"])
        iou = update_iou_np(iou, np.asarray(pred), sem,
                            cfg.model.num_classes)
        if vis_interval and n % vis_interval == 0:
            from PIL import Image

            from spike2former_tpu.evaluation.visualize import draw_sem_seg

            os.makedirs(vis_dir, exist_ok=True)
            palette = (np.asarray(ds.meta.palette, np.uint8)
                       if ds.meta.palette else None)
            # overlay at network-input resolution (tools/test.py --show-dir
            # convention)
            disp = np.asarray(jnp.argmax(logits, -1)[0], np.int32)
            img = np.clip(np.asarray(images)[0], 0, 255).astype(np.uint8)
            overlay = draw_sem_seg(img, disp, palette)
            Image.fromarray(overlay).save(
                os.path.join(vis_dir, f"val_{n:05d}.png"))
        n += 1
        if n >= max_images:
            break
    return compute_iou(iou)["mIoU"] if n else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="preset name (see engine/config.py)")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--work-dir", default=None,
                    help="checkpoint dir; multi-host runs MUST share one "
                         "path (orbax saves are collective)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--log-interval", type=int, default=50)
    ap.add_argument("--eval-images", type=int, default=100,
                    help="val images per periodic eval (0 disables)")
    ap.add_argument("--vis-interval", type=int, default=0,
                    help="draw every Nth val prediction during periodic "
                         "eval into work_dir/vis/iter_N/ (the reference's "
                         "SegVisualizationHook interval; 0 disables)")
    ap.add_argument("--device", default=None,
                    help="force backend, e.g. cpu (the axon sitecustomize "
                         "pins JAX_PLATFORMS, so env vars alone don't work)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize (the "
                         "dist_train.sh/slurm world; auto-detects on TPU "
                         "pods)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator host:port (CPU multi-process runs)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    pid, pcount = 0, 1
    if args.distributed or args.coordinator:
        from spike2former_tpu.parallel import distributed_init

        pid, pcount = distributed_init(
            args.coordinator, args.num_processes, args.process_id)
        print(f"distributed: process {pid}/{pcount}, "
              f"{jax.device_count()} global devices", flush=True)
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.data import TrainLoader, make_dataset
    from spike2former_tpu.engine import (
        init_state, make_optimizer, make_train_step)
    from spike2former_tpu.engine.checkpoint import (
        latest_checkpoint, restore_state, save_state)
    from spike2former_tpu.engine.config import build_model, get_config
    from spike2former_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = get_config(args.config, args.cfg_options)
    if args.data_root:
        cfg.data.data_root = args.data_root
    work_dir = args.work_dir or os.path.join(cfg.work_dir, cfg.name)
    os.makedirs(work_dir, exist_ok=True)

    if cfg.train.packed_residuals:
        # before any trace: Spike→Conv backward residuals as 4-bit codes
        from spike2former_tpu.ops.spike_op import enable_packed_residuals

        enable_packed_residuals(True)

    model = build_model(cfg.model)
    panoptic = cfg.data.dataset == "coco_panoptic"
    # cfg batch_size is GLOBAL; each process loads its local share
    assert cfg.data.batch_size % pcount == 0, (cfg.data.batch_size, pcount)
    local_bs = cfg.data.batch_size // pcount
    if panoptic:
        from spike2former_tpu.data import (
            PanopticDataset, panoptic_train_batches)

        ds = PanopticDataset(cfg.data.data_root, "train")
        loader = None
        batches = panoptic_train_batches(
            ds, local_bs, cfg.data.crop_size, cfg.train.max_gt,
            seed=cfg.train.seed + pid)
    else:
        ds = make_dataset(cfg.data.dataset, cfg.data.data_root, "train",
                          cache=cfg.data.cache)
        loader = TrainLoader(ds, local_bs, cfg.data.crop_size,
                             seed=cfg.train.seed,
                             num_workers=cfg.data.num_workers,
                             process_id=pid, process_count=pcount,
                             mosaic_prob=cfg.data.mosaic_prob)

    sample = jnp.zeros((cfg.data.batch_size, *cfg.data.crop_size, 3),
                       jnp.float32)
    rng0 = jax.random.PRNGKey(cfg.train.seed)
    params0 = model.init({"params": rng0, "dropout": rng0}, sample,
                         True)["params"]
    base_lr = cfg.train.base_lr
    if cfg.train.auto_scale_lr:
        # linear scaling rule vs the recipe's base batch (mmengine
        # auto_scale_lr, ade20k config :212; batch_size is GLOBAL here)
        scale = cfg.data.batch_size * cfg.train.accum_steps \
            / cfg.train.auto_scale_lr_base_batch
        base_lr = cfg.train.base_lr * scale
        print(f"auto_scale_lr: base_lr {cfg.train.base_lr} -> {base_lr} "
              f"(x{scale:.3f})")
    tx = make_optimizer(
        params0, base_lr=base_lr,
        weight_decay=cfg.train.weight_decay,
        backbone_lr_mult=cfg.train.backbone_lr_mult,
        clip_norm=cfg.train.clip_norm,
        warmup_iters=cfg.train.warmup_iters,
        total_iters=cfg.train.total_iters,
        layer_decay_rate=cfg.train.layer_decay_rate or None)
    state = init_state(model, tx, jax.random.PRNGKey(cfg.train.seed), sample)
    start = 0
    if args.resume:
        ckpt = latest_checkpoint(work_dir)
        if ckpt:
            state = restore_state(ckpt, state)
            start = int(state.step)
            print(f"resumed from {ckpt} at step {start}")

    mesh = make_mesh()
    state = replicate(mesh, state)
    if cfg.model.kind in ("fpn", "cascade"):
        from spike2former_tpu.engine.train import make_train_step_fpn

        step_fn = jax.jit(make_train_step_fpn(
            model, tx, loss_decode=cfg.train.loss_decode),
            donate_argnums=0)
    elif panoptic:
        from spike2former_tpu.engine import make_train_step_panoptic

        # donate the incoming TrainState: XLA reuses its param/opt
        # buffers for the outputs (one full state copy less in HBM)
        step_fn = jax.jit(make_train_step_panoptic(
            model, tx, num_classes=cfg.model.num_classes,
            matcher=cfg.train.matcher, loss_at=cfg.train.loss_at,
            compact_gt=cfg.train.compact_gt,
            num_points=cfg.train.loss_points,
            oversample_ratio=cfg.train.loss_points_oversample,
            importance_sample_ratio=cfg.train.loss_points_importance,
            points_dtype=cfg.train.loss_points_dtype,
            seed=cfg.train.seed,
            unroll_loss=cfg.train.unroll_loss),
            donate_argnums=0)
    else:
        step_fn = jax.jit(make_train_step(
            model, tx, num_classes=cfg.model.num_classes,
            max_gt=cfg.train.max_gt, matcher=cfg.train.matcher,
            loss_at=cfg.train.loss_at, accum_steps=cfg.train.accum_steps,
            compact_gt=cfg.train.compact_gt,
            num_points=cfg.train.loss_points,
            oversample_ratio=cfg.train.loss_points_oversample,
            importance_sample_ratio=cfg.train.loss_points_importance,
            points_dtype=cfg.train.loss_points_dtype,
            seed=cfg.train.seed,
            unroll_loss=cfg.train.unroll_loss),
            donate_argnums=0)

    from spike2former_tpu.engine.logging import ScalarLogger

    slog = ScalarLogger(work_dir)
    best_miou = -1.0
    t0 = time.time()
    it = batches if panoptic else iter(loader)
    for i in range(start, cfg.train.total_iters):
        if panoptic:
            batch = shard_batch(mesh, tuple(jnp.asarray(x)
                                            for x in next(it)))
            state, metrics = step_fn(state, *batch)
        else:
            images, sem = next(it)
            images, sem = shard_batch(mesh, (jnp.asarray(images),
                                             jnp.asarray(sem)))
            state, metrics = step_fn(state, images, sem)
        if (i + 1) % args.log_interval == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = (time.time() - t0) / args.log_interval
            t0 = time.time()
            parts = " ".join(f"{k.removeprefix('loss_')} {v:.4f}"
                             for k, v in sorted(m.items())
                             if k.startswith(("loss_", "acc_")))
            print(f"iter {i+1}/{cfg.train.total_iters} "
                  f"loss {m['total']:.4f} {parts} {dt:.3f}s/iter",
                  flush=True)
            slog.log(i + 1, sec_per_iter=dt, **m)
        if (cfg.train.checkpoint_interval
                and (i + 1) % cfg.train.checkpoint_interval == 0):
            # async save (device->host copy inline, IO in background);
            # retention per max_keep_ckpts
            save_state(work_dir, state, i + 1,
                       keep=cfg.train.max_keep_ckpts or None)
        if (args.eval_images and cfg.train.val_interval and not panoptic
                and (i + 1) % cfg.train.val_interval == 0):
            miou = evaluate(
                cfg, model, state, args.eval_images,
                vis_interval=args.vis_interval,
                vis_dir=os.path.join(work_dir, "vis", f"iter_{i + 1}"))
            print(f"iter {i+1} val mIoU {miou:.2f} "
                  f"(best {best_miou:.2f})", flush=True)
            slog.log(i + 1, mIoU=miou)
            if miou > best_miou:
                best_miou = miou
                # save_best='mIoU' — separate best/ subdir so retention
                # pruning and resume (latest ckpt_*) never touch it;
                # keep=1 replaces the previous best (mmengine behavior)
                save_state(os.path.join(work_dir, "best"), state, i + 1,
                           keep=1)
    save_state(work_dir, state, cfg.train.total_iters, wait=True)
    if loader is not None:
        loader.close()


if __name__ == "__main__":
    main()
