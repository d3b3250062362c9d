#!/usr/bin/env python
"""fwd vs bwd cost of the conv primitives the backbone uses, at its actual
stage shapes — hunting the 3.6x backbone bwd/fwd ratio."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return (time.time() - t0) / iters * 1000

    b = int(os.environ.get("B", 4))
    rng = np.random.default_rng(0)

    # (tag, HxW, Cin, Cout, k, depthwise)
    cases = [
        ("stage1 dw7x7", 128, 128, 128, 7, True),
        ("stage1 pw 1x1 x2", 128, 64, 128, 1, False),
        ("stage2 dw7x7", 64, 256, 256, 7, True),
        ("stage12 rep dw3", 128, 64, 64, 3, True),
        ("stage1 conv3x3", 128, 64, 64, 3, False),
        ("head dw5x5 /16", 32, 512, 512, 5, True),
        ("stem conv3x3 s1", 256, 32, 32, 3, False),
    ]
    for tag, hw, cin, cout, k, dw in cases:
        x = jnp.asarray(rng.normal(size=(b, hw, hw, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(
            size=(k, k, 1 if dw else cin, cout)), jnp.bfloat16)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=cin if dw else 1)

        fwd = jax.jit(conv)

        def loss(x, w):
            return jnp.sum(conv(x, w).astype(jnp.float32))

        gboth = jax.jit(jax.grad(loss, argnums=(0, 1)))
        gx = jax.jit(jax.grad(loss, argnums=0))
        gw = jax.jit(jax.grad(loss, argnums=1))
        t_f = timeit(fwd, x, w)
        t_b = timeit(gboth, x, w)
        t_x = timeit(gx, x, w)
        t_w = timeit(gw, x, w)
        print(f"{tag:>18} [{b},{hw},{hw},{cin}]->{cout} k={k}"
              f"{' dw' if dw else '   '}: fwd {t_f:6.2f}  bwd(all)"
              f" {t_b:6.2f}  dgx {t_x:6.2f}  dgw {t_w:6.2f} ms")


if __name__ == "__main__":
    main()
