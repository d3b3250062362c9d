#!/usr/bin/env python
"""Driver benchmark: flagship ADE20K 512x512 T=4 batched inference
throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured images/sec/chip divided by the reference
implementation's CPU throughput for the same workload.  The torch/CPU
reference cannot run here (mmcv/mmengine are not installed in this image),
so the baseline constant below is the throughput of this framework's own
forward on CPU (fp32, batch 1, same shapes) measured on this machine —
a same-architecture stand-in for "CPU reference images/sec/chip"
(BASELINE.md: target >= 5x).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Same-architecture torch CPU forward, fp32, batch 1, 512x512, T=4
# (measured on this host via tools/torch_cpu_ref.py: 33.1 s/img; see
# BENCH_NOTES.md).
CPU_REF_IMG_PER_SEC = 0.030


def _wait_for_backend(attempts: int = 6, probe_timeout: int = 300) -> None:
    """Block until the TPU backend initializes in a probe subprocess.

    The axon backend can be transiently unavailable (observed: init hangs
    ~35 min then raises UNAVAILABLE).  Probing in a killable subprocess
    with retries gives the tunnel a bounded window to recover instead of
    hanging this process inside backend init.
    """
    import subprocess

    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout, capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: TPU backend unavailable (probe {attempt + 1}/"
              f"{attempts}); retrying in 60s", file=sys.stderr, flush=True)
        time.sleep(60)
    print("bench: TPU backend did not come up; aborting", file=sys.stderr)
    raise SystemExit(2)


def main():
    _wait_for_backend()
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.models import Spike2Former
    from spike2former_tpu.utils import fast_variables

    batch = 16
    model = Spike2Former(num_classes=150, T=4, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(120.0, 60.0, (batch, 512, 512, 3)),
                    jnp.float32)
    variables = fast_variables(model, x)

    fwd = jax.jit(lambda v, im: model.apply(
        v, im, method=Spike2Former.predict_logits))

    for _ in range(3):
        out = fwd(variables, x)
    float(out.mean())  # real device sync (block_until_ready is unreliable
    #                    over the axon relay)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = fwd(variables, x)
    float(out.mean())
    dt = (time.time() - t0) / iters
    img_per_sec = batch / dt

    print(json.dumps({
        "metric": "ade20k_512x512_T4_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / CPU_REF_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
