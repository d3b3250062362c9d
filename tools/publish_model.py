#!/usr/bin/env python
"""Publish a training checkpoint: strip optimizer state, save a
variables-only (params + batch_stats) checkpoint stamped with a content
hash.

Equivalent of the reference's tools/misc/publish_model.py (which strips
the optimizer from a .pth and appends a sha256 prefix to the filename).
"""
import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="preset the checkpoint was trained with")
    ap.add_argument("checkpoint", help="TrainState checkpoint dir")
    ap.add_argument("out_dir", help="output dir (hash suffix appended)")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--device", default=None,
                    help="force backend, e.g. cpu")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from spike2former_tpu.engine import init_state, make_optimizer
    from spike2former_tpu.engine.checkpoint import restore_state
    from spike2former_tpu.engine.config import build_model, get_config

    cfg = get_config(args.config, args.cfg_options)
    model = build_model(cfg.model)
    sample = jnp.zeros((1, *cfg.data.crop_size, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(
        model.init({"params": rng, "dropout": rng}, sample,
                   True)["params"])
    state = restore_state(
        args.checkpoint, init_state(model, tx, rng, sample))

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}

    digest = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(variables):
        digest.update(np.ascontiguousarray(leaf).tobytes())
    suffix = digest.hexdigest()[:8]

    out = os.path.abspath(f"{args.out_dir.rstrip('/')}-{suffix}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, variables, force=True)
    ckptr.wait_until_finished()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    print(f"published {out}  ({n_params/1e6:.2f}M params, "
          f"step {int(state.step)}, sha256 {suffix})")


if __name__ == "__main__":
    main()
