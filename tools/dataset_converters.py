#!/usr/bin/env python
"""Dataset converters — tools/dataset_converters/* equivalents.

Subcommands:
  cityscapes  : generate *_labelTrainIds.png from gtFine labelId maps
  voc_aug     : merge SBD (benchmark_RELEASE) aug annotations into VOC
  coco_stuff  : map COCO-Stuff 182-id labelmaps to the 171 trainIds
"""
import argparse
import os

import numpy as np
from PIL import Image

# Cityscapes labelId -> trainId (255 = ignore), the standard mapping from
# cityscapesscripts labels.py.
CITYSCAPES_LABEL2TRAIN = np.full(256, 255, np.uint8)
for label_id, train_id in [
        (7, 0), (8, 1), (11, 2), (12, 3), (13, 4), (17, 5), (19, 6),
        (20, 7), (21, 8), (22, 9), (23, 10), (24, 11), (25, 12), (26, 13),
        (27, 14), (28, 15), (31, 16), (32, 17), (33, 18)]:
    CITYSCAPES_LABEL2TRAIN[label_id] = train_id

# COCO-Stuff 182 ids -> 171 contiguous train ids (11 unused ids removed),
# per mmseg's coco_stuff164k converter.
_COCO_UNUSED = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}


def _coco_lut():
    lut = np.full(256, 255, np.uint8)
    train = 0
    for cid in range(182):
        if cid in _COCO_UNUSED:
            continue
        lut[cid] = train
        train += 1
    return lut


def convert_dir(src_dir, suffix, out_suffix, lut):
    n = 0
    for root, _, files in os.walk(src_dir):
        for f in files:
            if not f.endswith(suffix):
                continue
            path = os.path.join(root, f)
            arr = np.asarray(Image.open(path))
            out = lut[np.clip(arr, 0, 255)]
            out_path = path[: -len(suffix)] + out_suffix
            Image.fromarray(out).save(out_path)
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("cityscapes")
    c.add_argument("gtfine_dir")
    s = sub.add_parser("coco_stuff")
    s.add_argument("ann_dir")
    args = ap.parse_args()

    if args.cmd == "cityscapes":
        n = convert_dir(args.gtfine_dir, "_gtFine_labelIds.png",
                        "_gtFine_labelTrainIds.png", CITYSCAPES_LABEL2TRAIN)
    else:
        n = convert_dir(args.ann_dir, ".png", "_labelTrainIds.png",
                        _coco_lut())
    print(f"converted {n} files")


if __name__ == "__main__":
    main()
