#!/usr/bin/env python
"""Print the fully-resolved config for a preset (+ overrides).

Equivalent of the reference's tools/misc/print_config.py: shows the exact
configuration a train/test run would use after --cfg-options merging.
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None,
                    help="preset name; omit to list all presets")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--json", action="store_true",
                    help="machine-readable JSON instead of pretty text")
    args = ap.parse_args()

    from spike2former_tpu.engine.config import PRESETS, get_config

    if args.config is None:
        for name in sorted(PRESETS):
            print(name)
        return

    cfg = get_config(args.config, args.cfg_options)
    tree = dataclasses.asdict(cfg)
    if args.json:
        print(json.dumps(tree, indent=2, default=str))
        return
    for section, values in tree.items():
        if not isinstance(values, dict):
            print(f"{section} = {values!r}")
            continue
        print(f"[{section}]")
        for k, v in values.items():
            print(f"  {k} = {v!r}")


if __name__ == "__main__":
    main()
