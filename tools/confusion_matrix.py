#!/usr/bin/env python
"""Confusion matrix over a val split — tools/analysis_tools/
confusion_matrix.py equivalent."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--max-images", type=int, default=50)
    ap.add_argument("--out", default="confusion_matrix.csv")
    ap.add_argument("--device", default=None)
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.data import eval_batches, make_dataset
    from spike2former_tpu.engine import postprocess_pred, whole_logits
    from spike2former_tpu.engine.checkpoint import restore_variables
    from spike2former_tpu.engine.config import build_model, get_config

    cfg = get_config(args.config, args.cfg_options)
    if args.data_root:
        cfg.data.data_root = args.data_root
    model = build_model(cfg.model)
    ds = make_dataset(cfg.data.dataset, cfg.data.data_root, "val")
    k = cfg.model.num_classes

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.data.crop_size, 3), jnp.float32))
    if args.checkpoint:
        variables = restore_variables(args.checkpoint, variables)

    cm = np.zeros((k, k), np.int64)
    n = 0
    for images, sem, metas in eval_batches(
            ds, scale=cfg.data.test_scale,
            size_divisor=cfg.data.size_divisor):
        logits = whole_logits(model, variables, jnp.asarray(images))
        pred = np.asarray(postprocess_pred(
            logits, metas[0].get("pad_shape"), metas[0]["ori_shape"]))
        gt = np.asarray(sem)
        valid = gt != 255
        idx = gt[valid] * k + pred[valid]
        cm += np.bincount(idx.reshape(-1), minlength=k * k).reshape(k, k)
        n += 1
        if n >= args.max_images:
            break

    np.savetxt(args.out, cm, fmt="%d", delimiter=",")
    diag = np.diag(cm).sum()
    print(f"{n} images; pixel accuracy {diag / max(cm.sum(), 1):.4f}; "
          f"matrix -> {args.out}")


if __name__ == "__main__":
    main()
