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
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.engine.config import build_model, get_config
    from spike2former_tpu.utils.initfast import fast_variables

    cfg = get_config(args.config, args.cfg_options)
    cfg.model.dtype = args.dtype
    model = build_model(cfg.model)
    size = tuple(args.image_size or cfg.data.crop_size)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(120, 60, (args.batch_size, *size, 3)),
                    jnp.float32)
    variables = fast_variables(model, x)

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
    print(f"{cfg.name}: {dt*1000:.2f} ms/iter, {fps:.2f} img/s "
          f"(batch {args.batch_size}, {size[0]}x{size[1]}, T={cfg.model.T})")


if __name__ == "__main__":
    main()
