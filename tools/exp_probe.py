"""Decompose gather_candidate_planes cost: probe-key gathers vs point-row
gathers, and test a sliding-window key layout (keys_win u32[C,R]: row i holds
keys[i..i+R-1]) that turns 884k scalar gathers into 55k 64-byte row gathers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

C = 1 << 18
P = 30
R = 16
M = 2048 * 27  # candidates


def chained(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, size=(C,), dtype=np.uint32))
    counts = jnp.asarray(rng.integers(0, P, size=(C,), dtype=np.int32))
    points = jnp.asarray(rng.random((C, 3 * P), dtype=np.float32))
    h = jnp.asarray(rng.integers(0, C, size=(M,), dtype=np.uint32))
    k2 = jnp.asarray(rng.integers(0, 2**32, size=(M,), dtype=np.uint32))

    # --- A: current scheme: [M, R] scalar gathers of keys
    @jax.jit
    def probe_scalar(keys, h):
        probes = jnp.arange(R, dtype=jnp.uint32)
        slots = ((h[:, None] + probes) & jnp.uint32(C - 1)).astype(jnp.int32)
        return keys[slots]

    t = chained(probe_scalar, keys, h)
    print(f"A probe keys [M,{R}] scalar gather:  {t:7.3f} ms", flush=True)

    # --- B: sliding-window table build + row gather
    @jax.jit
    def build_win(keys):
        return jnp.stack([jnp.roll(keys, -r) for r in range(R)], axis=1)

    t = chained(build_win, keys)
    print(f"B1 build keys_win [C,{R}]:           {t:7.3f} ms", flush=True)
    keys_win = build_win(keys)

    @jax.jit
    def probe_win(keys_win, h):
        return keys_win[h.astype(jnp.int32)]

    t = chained(probe_win, keys_win, h)
    print(f"B2 probe keys_win row gather [M]:    {t:7.3f} ms", flush=True)

    # --- C: point-row gather [M] rows of 3P floats
    slots = (h % C).astype(jnp.int32)

    @jax.jit
    def rows_gather(points, slots):
        return points[slots]

    t = chained(rows_gather, points, slots)
    print(f"C point rows [M,{3*P}] gather:        {t:7.3f} ms", flush=True)

    # --- D: count scalar gather
    @jax.jit
    def cnt_gather(counts, slots):
        return counts[slots]

    t = chained(cnt_gather, counts, slots)
    print(f"D count [M] scalar gather:           {t:7.3f} ms", flush=True)

    # --- E: full find_slots equivalent math after probe (select first match)
    @jax.jit
    def select(keys_probe, k2, h):
        probes = jnp.arange(R, dtype=jnp.uint32)
        slots = ((h[:, None] + probes) & jnp.uint32(C - 1)).astype(jnp.int32)
        is_empty = keys_probe == 0
        is_match = keys_probe == k2[:, None]
        before_empty = jnp.cumsum(is_empty.astype(jnp.int32), axis=-1) == 0
        hit = is_match & before_empty
        any_hit = jnp.any(hit, axis=-1)
        first = jnp.argmax(hit, axis=-1)
        found = jnp.take_along_axis(slots, first[:, None], axis=-1)[:, 0]
        return jnp.where(any_hit, found, -1)

    kp = probe_win(keys_win, h)
    t = chained(select, kp, k2, h)
    print(f"E select-first-match math:           {t:7.3f} ms", flush=True)

    # --- F: fused window probe: build win + row gather + select
    @jax.jit
    def fused(keys, h, k2):
        win = jnp.stack([jnp.roll(keys, -r) for r in range(R)], axis=1)
        kp = win[h.astype(jnp.int32)]
        return select(kp, k2, h)

    t = chained(fused, keys, h, k2)
    print(f"F fused win+gather+select:           {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
