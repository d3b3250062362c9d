#!/usr/bin/env python
"""Where does the model BACKWARD go?  Times fwd and fwd+grad of (a) the
backbone alone, (b) the full model, (c) the full model with the XLA DCN
sampling path, isolating backbone bwd / head bwd / DCN-kernel bwd.
Env: B, T."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    import numpy as np

    def sync(out):
        # fetch ONE element — materializing a grad tree would drag ~140 MB
        # through the axon tunnel and swamp the measurement
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0])

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
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
    from spike2former_tpu.models.segmentor import preprocess
    from spike2former_tpu.utils import fast_variables

    batch = int(os.environ.get("B", 4))
    T = int(os.environ.get("T", 4))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (batch, 512, 512, 3)), jnp.float32)

    def bench_model(model, tag):
        variables = fast_variables(model, x)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def fwd_scalar(p):
            xx = preprocess(x)
            (cls, masks), _ = model.apply(
                {"params": p, "batch_stats": stats}, xx, True,
                mutable=["batch_stats"])
            return (jnp.sum(cls[-1].astype(jnp.float32))
                    + jnp.sum(masks[-1].astype(jnp.float32)))

        t_f = timeit(jax.jit(fwd_scalar), params)
        t_g = timeit(jax.jit(jax.grad(fwd_scalar)), params)
        print(f"{tag:>28}: fwd {t_f:7.1f} ms   fwd+grad {t_g:7.1f} ms"
              f"   (bwd ~= {t_g - t_f:.1f})")
        return t_f, t_g

    def bench_backbone(model, tag):
        variables = fast_variables(model, x)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        def fwd_scalar(p):
            xx = preprocess(x)
            feats, _ = model.apply(
                {"params": p, "batch_stats": stats}, xx, True,
                mutable=["batch_stats"],
                method=lambda m, img, train: m.backbone(img, train))
            return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

        t_f = timeit(jax.jit(fwd_scalar), params)
        t_g = timeit(jax.jit(jax.grad(fwd_scalar)), params)
        print(f"{tag:>28}: fwd {t_f:7.1f} ms   fwd+grad {t_g:7.1f} ms"
              f"   (bwd ~= {t_g - t_f:.1f})")

    print(f"B={batch} T={T}")
    model = Spike2Former(num_classes=150, T=T, dtype=jnp.bfloat16)
    n_params = sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(
        fast_variables(model, x)["params"]))
    print(f"params: {n_params/1e6:.1f} M")
    bench_backbone(model, "backbone only")
    bench_model(model, "full model (pallas DCN)")


if __name__ == "__main__":
    main()
