#!/usr/bin/env python
"""Micro-bench candidate fixes for the point-loss cliff (round-5).

Variants, at flagship shapes (B=16, G in {64, 32}, P=12544, mask 256^2,
GT 512^2):

  1. selection: top_k + coords take_along_axis   (current)
     vs lax.sort co-sorting (key=-unc, x, y)     (gather-free)
     vs top_k + packed-complex64 coords gather   (2x fewer gathers)
  2. oversampled uncertainty sampling: f32 vs bf16 one-hot matmuls
  3. per-pair GT slot sampling: take_along_axis scalar gathers (current)
     vs one-hot matmul on (slot==g) bf16 dense masks
  4. shared GT slot sampling: 4 scalar gathers vs ONE packed-int32 gather
     (4 neighboring slot ids <= 255 packed into one i32 table)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=5, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1).astype("float32")[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1).astype("float32")[0])
    return (time.time() - t0) / iters * 1000


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from spike2former_tpu.losses.point_sample import point_sample, _taps

    b = int(os.environ.get("B", 16))
    g = int(os.environ.get("G", 32))
    p = int(os.environ.get("P", 12544))
    h = w = 256
    gh = gw = 512
    n = b * g
    n_s = int(p * 3.0)
    k = int(0.75 * p)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    print(f"B={b} G={g} N={n} P={p} 3P={n_s} k={k}")

    unc = jax.random.normal(k1, (n, n_s), jnp.float32)
    coords = jax.random.uniform(k2, (n, n_s, 2), jnp.float32)

    # --- 1. selection variants ---
    def sel_topk(u, c):
        _, idx = jax.lax.top_k(u, k)
        return jnp.take_along_axis(c, idx[..., None], axis=-2)

    def sel_sort(u, c):
        key_neg = -u
        _, x, y = jax.lax.sort(
            (key_neg, c[..., 0], c[..., 1]), num_keys=1)
        return jnp.stack([x[..., :k], y[..., :k]], axis=-1)

    def sel_topk_packed(u, c):
        _, idx = jax.lax.top_k(u, k)
        packed = jax.lax.complex(c[..., 0], c[..., 1])  # [n, n_s] c64
        sel = jnp.take_along_axis(packed, idx, axis=-1)
        return jnp.stack([jnp.real(sel), jnp.imag(sel)], axis=-1)

    print(f"sel sort-cosort:   {timeit(jax.jit(sel_sort), unc, coords):8.1f} ms",
          flush=True)
    print(f"sel topk+packed:   {timeit(jax.jit(sel_topk_packed), unc, coords):8.1f} ms",
          flush=True)
    if os.environ.get("SLOW_VARIANTS"):
        # the current-code path: take_along_axis coords gather (measured
        # pathological — minutes at these shapes; keep off the default run)
        print(f"sel topk+gather:   {timeit(jax.jit(sel_topk), unc, coords):8.1f} ms",
              flush=True)

    # --- 2. oversampled sampling dtype ---
    logits = jax.random.normal(k1, (b, g, h, w), jnp.float32)
    cov = jax.random.uniform(k2, (b, g, n_s, 2), jnp.float32)
    ps32 = jax.jit(lambda m, c: point_sample(m, c))
    print(f"oversample f32:    {timeit(ps32, logits, cov):8.1f} ms", flush=True)
    ps16 = jax.jit(lambda m, c: point_sample(m, c, dtype=jnp.bfloat16))
    print(f"oversample bf16:   {timeit(ps16, logits, cov):8.1f} ms", flush=True)

    # --- 3. per-pair GT slot sampling ---
    slot_map = jax.random.randint(k3, (b, gh, gw), 0, g + 1, jnp.int32)
    cpp = jax.random.uniform(k2, (b, g, p, 2), jnp.float32)

    from spike2former_tpu.losses.point_sample import point_sample_slot
    f_old = jax.jit(lambda s, c: point_sample_slot(s, g, c))
    print(f"F gathers (old):   {timeit(f_old, slot_map, cpp):8.1f} ms", flush=True)

    def f_matmul(s, c):
        slots = jnp.arange(g, dtype=jnp.int32)
        dense = (s[:, None] == slots[None, :, None, None]).astype(
            jnp.bfloat16)
        return point_sample(dense, c, dtype=jnp.bfloat16)

    try:
        t = timeit(jax.jit(f_matmul), slot_map, cpp)
        print(f"F one-hot bf16:    {t:8.1f} ms", flush=True)
    except Exception as e:
        print(f"F one-hot bf16:    n/a ({type(e).__name__}: {e})")

    # --- 4. shared GT sampling: packed-int32 single gather ---
    csh = jax.random.uniform(k2, (b, p, 2), jnp.float32)

    h_old = jax.jit(lambda s, c: point_sample_slot(s, g, c))
    print(f"H gathers (old):   {timeit(h_old, slot_map, csh):8.1f} ms", flush=True)

    def h_packed(s, c):
        # pack each 2x2 neighborhood of slot ids (<=255) of the 1px-padded
        # map into one i32; ONE gather (at index y0+1, x0+1 of the padded
        # grid, always in range) yields all four taps.  255 marks
        # out-of-bounds and never matches a slot.
        sp = jnp.pad(s.astype(jnp.uint32), ((0, 0), (1, 1), (1, 1)),
                     constant_values=255)
        tab = (sp[:, :-1, :-1]
               | (sp[:, :-1, 1:] << 8)
               | (sp[:, 1:, :-1] << 16)
               | (sp[:, 1:, 1:] << 24)).astype(jnp.int32)
        th, tw = gh + 1, gw + 1
        flat = tab.reshape(b, th * tw)
        taps = _taps(c, gh, gw)
        y0 = jnp.floor(c[..., 1] * gh - 0.5).astype(jnp.int32)
        x0 = jnp.floor(c[..., 0] * gw - 0.5).astype(jnp.int32)
        idx = (y0 + 1) * tw + (x0 + 1)
        packed = jnp.take_along_axis(flat, idx, axis=1).astype(jnp.uint32)
        ids = [(packed & 0xFF), (packed >> 8) & 0xFF,
               (packed >> 16) & 0xFF, (packed >> 24) & 0xFF]
        slots = jnp.arange(g, dtype=jnp.uint32)
        out = jnp.zeros((b, g, p), jnp.float32)
        for sid, (yi, xi, wgt, inb) in zip(ids, taps):
            hit = sid[:, None, :] == slots[None, :, None]
            out = out + jnp.where(hit, 1.0, 0.0) * wgt[:, None, :]
        return out

    print(f"H packed-i32:      {timeit(jax.jit(h_packed), slot_map, csh):8.1f} ms", flush=True)

    # correctness spot-checks on the real shapes
    ref_h = h_old(slot_map, csh)
    d = jnp.max(jnp.abs(h_packed(slot_map, csh) - ref_h))
    print(f"H packed vs old max|d|: {float(d):.2e}")
    ref_f = f_old(slot_map, cpp)
    d = jnp.max(jnp.abs(f_matmul(slot_map, cpp) - ref_f))
    print(f"F matmul vs old max|d|: {float(d):.2e}")
    if os.environ.get("SLOW_VARIANTS"):
        d = jnp.max(jnp.abs(jax.jit(sel_sort)(unc, coords)
                            - jax.jit(sel_topk)(unc, coords)))
        print(f"sel sort vs topk max|d| (ties may differ): {float(d):.2e}")


if __name__ == "__main__":
    main()
