#!/usr/bin/env python
"""Render augmented training samples (image + GT overlay) to a directory.

Equivalent of the reference's tools/misc/browse_dataset.py: runs the train
pipeline on a few samples so augmentation/annotation alignment can be
inspected visually.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out-dir", default="work_dirs/browse")
    ap.add_argument("--num", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from spike2former_tpu.data import make_dataset
    from spike2former_tpu.data.metainfo import DATASETS
    from spike2former_tpu.data.transforms import train_pipeline
    from spike2former_tpu.engine.config import get_config
    from spike2former_tpu.evaluation.visualize import draw_sem_seg

    cfg = get_config(args.config, args.cfg_options)
    if args.data_root:
        cfg.data.data_root = args.data_root
    ds = make_dataset(cfg.data.dataset, cfg.data.data_root, "train")
    meta = DATASETS[cfg.data.dataset]
    os.makedirs(args.out_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    for i in range(min(args.num, len(ds))):
        sample = train_pipeline(ds.load(i), rng, cfg.data.crop_size)
        img = sample["image"].astype(np.uint8)
        pal = (np.asarray(meta.palette, np.uint8)
               if meta.palette is not None else None)
        vis = draw_sem_seg(img, sample["sem_seg"].astype(np.int32),
                           palette=pal)
        Image.fromarray(img).save(f"{args.out_dir}/sample_{i}_img.png")
        Image.fromarray(vis).save(f"{args.out_dir}/sample_{i}_gt.png")
        present = sorted(int(v) for v in np.unique(sample["sem_seg"])
                         if v != 255)
        print(f"wrote sample_{i} (classes present: {present})")


if __name__ == "__main__":
    main()
