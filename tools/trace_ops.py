#!/usr/bin/env python
"""Capture a jax.profiler device trace of the train step (or model fwd+grad)
and print the top HLO ops by device self-time — the op-level view the
aggregate component timers can't give.  Env: B, T, MODE=train|grad|fwd,
TOP=40."""
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def top_ops(trace_dir, top):
    """Parse the xplane protobuf (XLA Ops line) for per-op device totals.

    Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the vendored
    tf protos predate the installed C++ protobuf runtime)."""
    import collections
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not xs:
        print("no xplane captured!")
        return
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(xs[-1], "rb").read())

    def classify(n):
        m = re.match(r"%?([a-zA-Z0-9_.\-]+)", n)
        base = m.group(1) if m else n
        return re.sub(r"[.\d]+$", "", base)

    for plane in sp.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            full = collections.Counter()
            for ev in line.events:
                name = md[ev.metadata_id].name
                c = classify(name)
                tot[c] += ev.duration_ps
                cnt[c] += 1
                full[name[:140]] += ev.duration_ps
            print(f"XLA Ops total {sum(tot.values())/1e9:.1f} ms "
                  f"(all traced iterations)")
            print("-- by op family --")
            for name, ps in tot.most_common(top):
                print(f"  {ps/1e9:9.2f} ms  x{cnt[name]:<6} {name}")
            print("-- top individual ops --")
            for name, ps in full.most_common(top):
                print(f"  {ps/1e9:9.2f} ms  {name}")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spike2former_tpu.engine import make_optimizer, make_train_step
    from spike2former_tpu.engine.train import TrainState
    from spike2former_tpu.models import Spike2Former
    from spike2former_tpu.models.segmentor import preprocess
    from spike2former_tpu.utils import fast_variables

    batch = int(os.environ.get("B", 4))
    T = int(os.environ.get("T", 4))
    mode = os.environ.get("MODE", "grad")
    loss_points = int(os.environ.get("LOSS_POINTS", 0))
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/jax_trace")

    # lazy_masks matches the shipped train program (ModelConfig default);
    # the dense stack would trace a different (OOM-prone at B=16) program
    model = Spike2Former(num_classes=150, T=T, dtype=jnp.bfloat16,
                         lazy_masks=mode == "train")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (batch, 512, 512, 3)), jnp.float32)
    variables = fast_variables(model, x)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    if mode == "train":
        # realistic blocky GT (~16 distinct classes per crop), same as
        # tools/benchmark.py — uniform-random pixel labels would claim all
        # 150 classes present and trace the compact_gt OVERFLOW branch
        # (G=64 worst case) instead of the program the benchmarks measure
        table = rng.choice(150, size=16, replace=False)
        blocks = table[rng.integers(0, 16, (batch, 32, 32))]
        sem = jnp.asarray(np.repeat(np.repeat(
            blocks, 512 // 32, axis=1), 512 // 32, axis=2), jnp.int32)
        tx = make_optimizer(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=stats, opt_state=tx.init(params))
        step = jax.jit(make_train_step(model, tx, num_classes=150,
                                       num_points=loss_points))

        def run():
            return step(state, x, sem)[1]["total"]
    else:
        def fwd_scalar(p):
            xx = preprocess(x)
            (cls, masks), _ = model.apply(
                {"params": p, "batch_stats": stats}, xx, True,
                mutable=["batch_stats"])
            return (jnp.sum(cls[-1].astype(jnp.float32))
                    + jnp.sum(masks[-1].astype(jnp.float32)))

        fn = jax.jit(fwd_scalar if mode == "fwd" else jax.grad(fwd_scalar))

        def run():
            return fn(params)

    # warm up / compile outside the trace
    out = run()
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = run()
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    top_ops(trace_dir, int(os.environ.get("TOP", 40)))


if __name__ == "__main__":
    main()
