#!/usr/bin/env python
"""Deployment export — the tools/deployment/pytorch2torchscript.py
equivalent: serialize the jitted inference function to StableHLO via
jax.export (runnable from any StableHLO consumer / PJRT runtime)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="model.stablehlo")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from spike2former_tpu.engine.checkpoint import restore_state
    from spike2former_tpu.engine.config import build_model, get_config

    cfg = get_config(args.config, args.cfg_options)
    model = build_model(cfg.model)
    x = jnp.zeros((args.batch_size, *cfg.data.crop_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    if args.checkpoint:
        variables = restore_state(args.checkpoint, variables)

    def infer(images):
        return model.apply(variables, images,
                           method=type(model).predict_logits)

    exported = jax_export.export(jax.jit(infer))(x)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {cfg.name} -> {args.out} "
          f"({len(blob)/1e6:.1f} MB, input {x.shape})")
    with open(args.out + ".txt", "w") as f:
        f.write(exported.mlir_module())
    print(f"stablehlo text -> {args.out}.txt")


if __name__ == "__main__":
    main()
