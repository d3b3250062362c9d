#!/usr/bin/env python
"""Component-level timing of the flagship model on the real chip —
where do the milliseconds go (backbone / pixel decoder / DCN kernel /
decoder+SDME / semantic einsum)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.time() - t0) / iters * 1000


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.models import Spike2Former
    from spike2former_tpu.models.maskformer_head import semantic_inference
    from spike2former_tpu.ops.resize import resize_bilinear
    from spike2former_tpu.utils import fast_variables

    batch = int(os.environ.get("B", 16))
    T = int(os.environ.get("T", 4))
    model = Spike2Former(num_classes=150, T=T, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(120.0, 60.0, (batch, 512, 512, 3)),
                    jnp.float32)
    variables = fast_variables(model, x)

    part = os.environ.get("PART", "all")
    print(f"B={batch} T={T} PART={part}")
    if part in ("all", "full"):
        full = jax.jit(lambda v, im: model.apply(
            v, im, method=Spike2Former.predict_logits))
        print(f"full predict_logits: {timeit(full, variables, x):7.1f} ms")

    bb = jax.jit(lambda v, im: model.apply(
        v, im, method=lambda m, i: m.backbone(i, False)))
    feats = bb(variables, x)
    if part in ("all", "full"):
        print(f"backbone:            {timeit(bb, variables, x):7.1f} ms")

    if part in ("all", "head"):
        head = jax.jit(lambda v, f: model.apply(
            v, f, method=lambda m, ff: m.head(ff, False)))
        print(f"head (all):          {timeit(head, variables, feats):7.1f} ms")

    from spike2former_tpu.models.pixel_decoder import DCNPixelDecoder

    pdm = DCNPixelDecoder(in_channels=(32, 64, 128, 360),
                          dtype=jnp.bfloat16)
    pd_vars = {
        "params": variables["params"]["head"]["pixel_decoder"],
        "batch_stats": variables["batch_stats"]["head"]["pixel_decoder"],
    }
    if part in ("all", "pd"):
        pd = jax.jit(lambda v, f: pdm.apply(v, f, False))
        print(f"pixel decoder:       {timeit(pd, pd_vars, feats):7.1f} ms")
    del feats

    # DCN kernel alone at the /16 shapes
    from spike2former_tpu.ops.dcnv3 import dcnv3_core
    tb, hh, ww, c = T * batch, 32, 32, 256
    g, p = 32, 9
    val = jnp.asarray(rng.normal(0, 1, (tb, hh, ww, c)), jnp.bfloat16)
    off = jnp.asarray(rng.normal(0, 2, (tb, hh, ww, g * p * 2)),
                      jnp.float32)
    msk = jnp.asarray(rng.uniform(0, 1, (tb, hh, ww, g * p)), jnp.float32)
    core = jax.jit(lambda a, b, m: dcnv3_core(
        a, b, m, kernel_h=3, kernel_w=3, stride_h=1, stride_w=1,
        pad_h=1, pad_w=1, dilation_h=1, dilation_w=1, group=g,
        group_channels=c // g, offset_scale=1.0))
    print(f"DCN core (1 layer):  {timeit(core, val, off, msk):7.1f} ms")

    # mask upsample + semantic einsum tail
    cls = jnp.asarray(rng.normal(0, 1, (batch, 100, 151)), jnp.float32)
    mask = jnp.asarray(rng.normal(0, 1, (batch, 100, 256, 256)),
                       jnp.float32)

    def tail(cc, mm):
        m2 = resize_bilinear(mm.transpose(0, 2, 3, 1),
                             (512, 512)).transpose(0, 3, 1, 2)
        return semantic_inference(cc, m2)

    print(f"mask-up + sem einsum:{timeit(jax.jit(tail), cls, mask):7.1f} ms")


if __name__ == "__main__":
    main()
