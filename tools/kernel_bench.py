#!/usr/bin/env python
"""Micro-benchmark of the DCNv3 Pallas sampling kernels (fwd + bwd) at the
flagship /16 shapes, comparing selector-build formulations.

Timings below ~2 ms include ~1.8 ms of axon dispatch overhead — compare
variants against each other, not against zero.  Env knobs: N (batch),
HIN/WIN, ITERS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.ops.pallas.dcnv3_kernel import (
        dcnv3_sample_pallas_t5, dcnv3_sample_pallas_t5_bwd)

    n = int(os.environ.get("N", 16))
    h_in = w_in = int(os.environ.get("HIN", 32))
    iters = int(os.environ.get("ITERS", 30))
    g, cg, p = 32, 8, 9
    hw = h_in * w_in

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(n, g, h_in, w_in * cg)),
                       jnp.bfloat16)
    py = jnp.asarray(rng.uniform(-1, h_in, (n, g, p, hw)), jnp.float32)
    px = jnp.asarray(rng.uniform(-1, w_in, (n, g, p, hw)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, g, p, hw)), jnp.float32)
    dout = jnp.asarray(rng.normal(size=(n, g, cg, hw)), jnp.bfloat16)
    kw = dict(num_points=p, h_in=h_in, w_in=w_in, group=g,
              group_channels=cg)

    def timeit(fn, *args, **kwargs):
        out = fn(*args, **kwargs)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a[..., :1, :1]), out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a[..., :1, :1]), out)
        return (time.time() - t0) / iters * 1000, out

    results = {}
    for tent in (False, True):
        t_f, out_f = timeit(dcnv3_sample_pallas_t5, feat, py, px, mask,
                            tent=tent, **kw)
        t_b, out_b = timeit(dcnv3_sample_pallas_t5_bwd, feat, py, px, mask,
                            dout, tent=tent, **kw)
        name = "tent(v6)" if tent else "onehot(v5)"
        results[tent] = (out_f, out_b)
        print(f"{name:>12}:  fwd {t_f:6.2f} ms   bwd {t_b:6.2f} ms"
              f"   (N={n}, {h_in}x{w_in}, G={g}, Cg={cg}, P={p})")

    # correctness: tent must reproduce the one-hot build
    f5, b5 = results[False]
    f6, b6 = results[True]
    df = float(jnp.max(jnp.abs(f5.astype(jnp.float32)
                               - f6.astype(jnp.float32))))
    print(f"max |fwd diff| = {df:.2e}")
    for a, b, nm in zip(b5, b6, ("dfeat", "dpy", "dpx", "dm")):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        print(f"max |{nm} diff| = {d:.2e}")


if __name__ == "__main__":
    main()
