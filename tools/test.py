#!/usr/bin/env python
"""Evaluation CLI — the tools/test.py equivalent: run whole/slide inference
over a val split and report mIoU/mAcc/aAcc."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def evaluate_panoptic(cfg, model, variables, ds, args):
    """PQ evaluation over the panoptic val split: keep-ratio resize +
    bucket pad, panoptic merge on device, maps resized back to the
    original shape (nearest), panopticapi-protocol PQ on host."""
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from spike2former_tpu.data import panoptic_maps
    from spike2former_tpu.data.transforms import test_pipeline
    from spike2former_tpu.engine import whole_panoptic
    from spike2former_tpu.evaluation import PQStat, compute_pq, pq_update

    stat = PQStat(cfg.model.num_classes)
    n = 0
    for i in range(len(ds)):
        raw = ds.load(i)
        oh, ow = raw["meta"]["ori_shape"]
        s = test_pipeline({"image": raw["image"], "meta": {}},
                          cfg.data.test_scale,
                          size_divisor=cfg.data.size_divisor,
                          bucket=cfg.test.bucket)
        img = jnp.asarray(s["image"][None].astype(np.float32))
        sem, inst = whole_panoptic(
            model, variables, img, num_things=cfg.model.num_things or 80)
        vh, vw = s["meta"]["img_shape"]

        def back(m):  # crop valid region, nearest-resize to ori shape
            arr = Image.fromarray(np.asarray(m[0, :vh, :vw], np.int32), "I")
            return np.asarray(arr.resize((ow, oh), Image.NEAREST), np.int32)

        gt_label, gt_inst, gt_crowd = panoptic_maps(
            raw["pan_ids"], raw["segments"])
        stat = pq_update(stat, back(sem), back(inst),
                         gt_label, gt_inst, gt_crowd)
        n += 1
        if args.max_images and n >= args.max_images:
            break
    res = compute_pq(stat, num_things=cfg.model.num_things or 80)
    print(f"images: {n}")
    print(f"PQ {res['PQ']:.2f}  SQ {res['SQ']:.2f}  RQ {res['RQ']:.2f}  "
          f"PQ_th {res['PQ_th']:.2f}  PQ_st {res['PQ_st']:.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--torch-checkpoint", default=None,
                    help="reference .pth EncoderDecoder checkpoint; implies "
                         "model.compat=True (layout-quirk replay)")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--show-dir", default=None,
                    help="write prediction overlays (SegVisualizationHook)")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.data import eval_batches, make_dataset
    from spike2former_tpu.engine import (
        postprocess_pred, slide_logits, whole_logits)
    from spike2former_tpu.engine.checkpoint import restore_variables
    from spike2former_tpu.engine.config import build_model, get_config
    from spike2former_tpu.evaluation import (
        compute_iou, init_iou, update_iou_np)

    cfg = get_config(args.config, args.cfg_options)
    if args.data_root:
        cfg.data.data_root = args.data_root
    if args.torch_checkpoint:
        cfg.model.compat = True

    model = build_model(cfg.model)
    panoptic = cfg.data.dataset == "coco_panoptic"
    if panoptic:
        from spike2former_tpu.data import PanopticDataset

        ds = PanopticDataset(cfg.data.data_root, "val")
    else:
        ds = make_dataset(cfg.data.dataset, cfg.data.data_root, "val")

    if args.torch_checkpoint:
        from spike2former_tpu.engine.checkpoint import load_reference_model

        variables = load_reference_model(
            args.torch_checkpoint,
            variant=cfg.model.variant,
            depths_stage3=cfg.model.depths_stage3,
            depths_stage4=cfg.model.depths_stage4,
            num_encoder_layers=cfg.model.num_encoder_layers,
            num_decoder_layers=cfg.model.num_decoder_layers)
    else:
        sample = jnp.zeros((1, *cfg.data.crop_size, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), sample)
        if args.checkpoint:
            variables = restore_variables(args.checkpoint, variables)

    num_classes = cfg.model.num_classes
    if panoptic:
        evaluate_panoptic(cfg, model, variables, ds, args)
        return
    iou = init_iou(num_classes)
    n = 0
    for images, sem, metas in eval_batches(
            ds, scale=cfg.data.test_scale,
            size_divisor=cfg.data.size_divisor,
            bucket=0 if cfg.test.mode == "slide" else cfg.test.bucket):
        if cfg.test.mode == "slide":
            logits = slide_logits(model, variables, jnp.asarray(images),
                                  cfg.test.crop_size, cfg.test.stride,
                                  num_classes)
        else:
            valid = ([metas[0]["img_shape"]] if cfg.test.bucket else None)
            logits = whole_logits(model, variables, jnp.asarray(images),
                                  valid_hw=valid)
        # reference protocol: unpad, resize logits back to the original image
        # shape, argmax, score vs full-resolution GT (BaseSegmentor.
        # postprocess_result, base.py:127-200).
        meta = metas[0]
        pred = postprocess_pred(logits, meta.get("pad_shape"),
                                meta["ori_shape"])
        iou = update_iou_np(iou, np.asarray(pred), sem, num_classes)
        if args.show_dir:
            import os as _os

            from PIL import Image

            from spike2former_tpu.evaluation.visualize import draw_sem_seg

            _os.makedirs(args.show_dir, exist_ok=True)
            disp = np.asarray(jnp.argmax(logits, -1)[0], np.int32)
            pal = (np.asarray(ds.meta.palette, np.uint8)
                   if ds.meta.palette else None)
            overlay = draw_sem_seg(images[0].astype(np.uint8), disp,
                                   palette=pal)
            Image.fromarray(overlay).save(
                _os.path.join(args.show_dir, f"pred_{n:05d}.png"))
        n += 1
        if args.max_images and n >= args.max_images:
            break

    res = compute_iou(iou)
    print(f"images: {n}")
    print(f"mIoU {res['mIoU']:.2f}  mAcc {res['mAcc']:.2f}  "
          f"aAcc {res['aAcc']:.2f}")


if __name__ == "__main__":
    main()
