"""Fast model-variable creation for benchmarking.

``model.init`` traces and executes the full forward just to produce
parameter shapes; over the TPU tunnel that compile alone takes minutes.
``fast_variables`` gets the variable tree from ``jax.eval_shape`` (pure
tracing, no compile) and materializes small random parameters directly —
fine for throughput benchmarks whose compute is weight-agnostic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_variables(model, *init_args, seed: int = 0, scale: float = 0.05):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args)
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    arrays = []
    for s in leaves:
        if jnp.issubdtype(s.dtype, jnp.floating) and s.ndim >= 1:
            arrays.append(jnp.asarray(
                rng.normal(0.0, scale, s.shape), s.dtype))
        else:
            arrays.append(jnp.zeros(s.shape, s.dtype))
    tree = jax.tree_util.tree_unflatten(treedef, arrays)

    def fix(path, x):
        # BN variances must be positive
        if any(getattr(p, "key", "") == "var" for p in path):
            return jnp.ones_like(x)
        return x

    return jax.tree_util.tree_map_with_path(fix, tree)
