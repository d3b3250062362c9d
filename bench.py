#!/usr/bin/env python
"""Driver benchmark: flagship ADE20K 512x512 T=4 batched inference
throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — and it
prints that line on EVERY exit path.  If the TPU backend is unreachable
(the axon tunnel flaps for hours at a time; round-3 capture was lost to
it) the line carries the last chip-measured value with ``"degraded":
true`` so the driver's ``parsed`` is never null.

Worst-case wall time is bounded to ~3.5 min of probing + the measured run
(<2 min warm) so it always fits inside the driver's budget (the round-3
failure mode was a 6x(300s+60s) probe loop outlasting the driver timeout).

``vs_baseline`` is measured images/sec/chip divided by the reference
implementation's CPU throughput for the same workload.  The torch/CPU
reference cannot run here (mmcv/mmengine are not installed in this image),
so the baseline constant below is the throughput of this framework's own
forward on CPU (fp32, batch 1, same shapes) measured on this machine —
a same-architecture stand-in for "CPU reference images/sec/chip"
(BASELINE.md: target >= 5x).  Reference benchmark protocol:
Segmentation/tools/analysis_tools/benchmark.py:57-110 (200 iters, warmup,
pure fwd time).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Same-architecture torch CPU forward, fp32, batch 1, 512x512, T=4
# (measured on this host via tools/torch_cpu_ref.py: 33.1 s/img; see
# BENCH_NOTES.md).
CPU_REF_IMG_PER_SEC = 0.030

# Fallback when even the LKG file is missing: last chip-measured value
# (work_dirs/chip_campaign.log, v5e, 2026-08-19).  Every successful run
# persists its measurement to LKG_PATH, so this constant only matters on
# a fresh checkout during an outage.
LAST_KNOWN_GOOD = 211.34
LAST_KNOWN_GOOD_DATE = "2026-08-19"
LKG_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "work_dirs", "bench_lkg.json")

METRIC = "ade20k_512x512_T4_images_per_sec_per_chip"


def _read_lkg():
    """(value, measured_at) of the last successful chip measurement."""
    try:
        with open(LKG_PATH) as f:
            rec = json.load(f)
        return float(rec["value"]), rec.get("measured_at")
    except Exception:
        return LAST_KNOWN_GOOD, LAST_KNOWN_GOOD_DATE


def _write_lkg(value):
    try:
        os.makedirs(os.path.dirname(LKG_PATH), exist_ok=True)
        with open(LKG_PATH, "w") as f:
            json.dump({"value": round(value, 2),
                       "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z")},
                      f)
    except Exception as e:  # persisting LKG must never fail the bench
        print(f"bench: could not persist LKG ({e})", file=sys.stderr,
              flush=True)


def _emit(value, degraded=False, measured_at=None):
    rec = {
        "metric": METRIC,
        "value": None if value is None else round(value, 2),
        "unit": "img/s",
        "vs_baseline": (None if value is None
                        else round(value / CPU_REF_IMG_PER_SEC, 2)),
    }
    if degraded:
        rec["degraded"] = True
        # when the fallback value was actually measured, so a stale
        # number can never masquerade as fresh (round-4 weak #4)
        rec["measured_at"] = measured_at
    print(json.dumps(rec), flush=True)


def _backend_up(attempts: int = 3, probe_timeout: int = 60) -> bool:
    """Probe the TPU backend in killable subprocesses; bounded total time.

    3 x 60s = 3 min worst case (plus ~10s of inter-probe pause) — far
    inside any sane driver budget, unlike the round-3 loop.
    """
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout, capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: TPU backend unavailable (probe {attempt + 1}/"
              f"{attempts})", file=sys.stderr, flush=True)
        if attempt + 1 < attempts:
            time.sleep(5)
    return False


def _measure() -> float:
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
    return batch / dt


def main():
    lkg, lkg_at = _read_lkg()
    if not _backend_up():
        print("bench: backend down; emitting last-known-good (degraded)",
              file=sys.stderr, flush=True)
        _emit(lkg, degraded=True, measured_at=lkg_at)
        return
    # The measurement ALSO runs in a killable subprocess: the tunnel can
    # flap between the probe and the in-process backend init, and a hung
    # init (~35 min during outages) raises nothing — an in-process
    # try/except would never fire and the driver timeout would kill us
    # before the JSON line prints (the round-3 failure mode).
    #
    # TWO attempts: a cold persistent-compile-cache run can outlast the
    # first timeout (the round-4 failure mode — 207.19 re-emitted hours
    # after 211.34 was measured), but the killed attempt has already
    # written the compile cache, so the retry compiles warm in ~40 s.
    for attempt, tmo in enumerate((420, 300)):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                timeout=tmo, capture_output=True, text=True)
            sys.stderr.write(r.stderr)
            for line in r.stdout.splitlines():
                if line.startswith("BENCH_VALUE "):
                    value = float(line.split()[1])
                    _write_lkg(value)
                    _emit(value)
                    return
            print(f"bench: inner run produced no value "
                  f"(rc={r.returncode}, attempt {attempt + 1})",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"bench: inner run timed out (attempt {attempt + 1}; "
                  "compile cache now warm, retrying)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # never leave the scoreboard empty
            print(f"bench: measurement failed ({type(e).__name__}: {e})",
                  file=sys.stderr, flush=True)
    print("bench: all attempts failed; emitting last-known-good (degraded)",
          file=sys.stderr, flush=True)
    _emit(lkg, degraded=True, measured_at=lkg_at)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        print(f"BENCH_VALUE {_measure()}", flush=True)
    else:
        main()
