#!/usr/bin/env python
"""Per-spike-site firing-rate statistics (tools/cal_firing_num.py
equivalent): runs N val images (CenterCrop 512) through the model and dumps
a per-layer CSV + JSON of mean activation x quant level."""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--num-images", type=int, default=200)
    ap.add_argument("--out", default="firing_rates")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--device", default=None,
                    help="force backend, e.g. cpu")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.data import make_dataset
    from spike2former_tpu.data.transforms import pad_to, resize_keep_ratio
    from spike2former_tpu.engine.checkpoint import restore_state
    from spike2former_tpu.engine.config import build_model, get_config
    from spike2former_tpu.models.segmentor import preprocess
    from spike2former_tpu.utils.firing import accumulate_firing, energy_proxy

    cfg = get_config(args.config, args.cfg_options)
    if args.data_root:
        cfg.data.data_root = args.data_root
    # literal replay: the reference's hooks see every decoder layer and
    # every time step go through the spike sites, even the ones inference
    # discards — measure exactly that
    cfg.model.eval_last_only = False
    cfg.model.collapse_t = False
    model = build_model(cfg.model)

    crop = cfg.data.crop_size
    sample = jnp.zeros((1, *crop, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    if args.checkpoint:
        variables = restore_state(args.checkpoint, variables)

    def center_crop(img):
        h, w = img.shape[:2]
        y = max((h - crop[0]) // 2, 0)
        x = max((w - crop[1]) // 2, 0)
        out = img[y:y + crop[0], x:x + crop[1]]
        s = {"image": out, "sem_seg": None, "meta": {}}
        return pad_to(s, crop)["image"]

    def images():
        ds = make_dataset(cfg.data.dataset, cfg.data.data_root, "val")
        for i in range(min(len(ds), args.num_images)):
            s = resize_keep_ratio(ds.load(i), 2048, 512)
            img = center_crop(s["image"])
            yield preprocess(jnp.asarray(img[None], jnp.float32))

    rates = accumulate_firing(model, variables, images(),
                              max_images=args.num_images)
    print(f"{len(rates)} spike sites; mean firing rate "
          f"{energy_proxy(rates):.4f}")

    with open(args.out + ".json", "w") as f:
        json.dump(rates, f, indent=2)
    with open(args.out + ".csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["site", "firing_rate"])
        for k, v in sorted(rates.items()):
            w.writerow([k, f"{v:.6f}"])
    print(f"wrote {args.out}.json / {args.out}.csv")


if __name__ == "__main__":
    main()
