#!/usr/bin/env python
"""Measure the CPU-reference throughput used as bench.py's baseline:
this framework's flagship forward on CPU, fp32, batch 1, 512x512, T=4."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from spike2former_tpu.models import Spike2Former
from spike2former_tpu.utils import fast_variables


def main():
    model = Spike2Former(num_classes=150, T=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(120, 60, (1, 512, 512, 3)), jnp.float32)
    variables = fast_variables(model, x)
    fwd = jax.jit(lambda v, im: model.apply(
        v, im, method=Spike2Former.predict_logits))
    t0 = time.time()
    out = fwd(variables, x)
    float(out.mean())
    print(f"compile+first: {time.time() - t0:.1f}s")
    n = 3
    t0 = time.time()
    for _ in range(n):
        out = fwd(variables, x)
    float(out.mean())
    dt = (time.time() - t0) / n
    print(f"cpu fp32 batch1: {dt*1000:.0f} ms/img = {1/dt:.3f} img/s")


if __name__ == "__main__":
    main()
