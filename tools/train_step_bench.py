#!/usr/bin/env python
"""Time ONLY the full train step at a given config.  Env: B, T, LOSS_AT,
MATCHER, REMAT (0/1), ACCUM, ITERS."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.engine import make_optimizer, make_train_step
    from spike2former_tpu.engine.config import build_model, get_config
    from spike2former_tpu.engine.train import TrainState
    from spike2former_tpu.utils import fast_variables

    batch = int(os.environ.get("B", 4))
    T = int(os.environ.get("T", 4))
    loss_at = os.environ.get("LOSS_AT", "gt")
    matcher = os.environ.get("MATCHER", "auction")
    remat = os.environ.get("REMAT", "0") == "1"
    accum = int(os.environ.get("ACCUM", 1))
    iters = int(os.environ.get("ITERS", 10))

    # build via the config system so train-path defaults (lazy_masks)
    # match the shipped train program
    cfg = get_config("SDTv2_maskformer_DCNpixelDecoder_ade20k")
    cfg.model.T = T
    cfg.model.remat = remat
    cfg.model.dtype = "bfloat16"
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (batch, 512, 512, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 150, (batch, 512, 512)), jnp.int32)
    variables = fast_variables(model, x[: max(batch // accum, 1)])
    tx = make_optimizer(variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step = jax.jit(make_train_step(model, tx, num_classes=150,
                                   matcher=matcher, loss_at=loss_at,
                                   accum_steps=accum), donate_argnums=0)

    state, m = step(state, x, sem)
    float(m["total"])  # sync
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, x, sem)
    float(m["total"])
    dt = (time.time() - t0) / iters * 1000
    print(f"B={batch} T={T} loss_at={loss_at} matcher={matcher} "
          f"remat={remat} accum={accum}: {dt:.1f} ms/step "
          f"({batch / dt * 1000:.1f} img/s)")


if __name__ == "__main__":
    main()
