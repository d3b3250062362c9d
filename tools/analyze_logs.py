#!/usr/bin/env python
"""Summarize training scalar logs — tools/analysis_tools/analyze_logs.py
equivalent (text summary; no plotting deps assumed)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spike2former_tpu.engine.logging import read_scalars


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="scalars.jsonl path")
    ap.add_argument("--keys", nargs="*", default=["total", "loss_cls",
                                                  "loss_mask", "loss_dice"])
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    recs = read_scalars(args.log)
    if not recs:
        print("no records")
        return
    print(f"{len(recs)} records, steps {recs[0]['step']}..{recs[-1]['step']}")
    for key in args.keys:
        vals = [r[key] for r in recs if key in r]
        if not vals:
            continue
        w = vals[-args.window:]
        print(f"{key:12s} first {vals[0]:8.4f}  last {vals[-1]:8.4f}  "
              f"min {min(vals):8.4f}  avg(last {len(w)}) "
              f"{sum(w)/len(w):8.4f}")
    if len(recs) >= 2:
        dt = (recs[-1]["time"] - recs[0]["time"]) / max(
            recs[-1]["step"] - recs[0]["step"], 1)
        print(f"avg sec/step: {dt:.3f}")


if __name__ == "__main__":
    main()
