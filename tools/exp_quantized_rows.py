"""Measure the quantized point-row layout hypothesis (the claimed residual
path to 10x, docs/PERF.md round 4): would storing map point rows as u16
voxel-relative offsets (12 um resolution at 0.8 m voxels) actually cut the
insert scatter and candidate-gather costs?

Loop-truth methodology (fori repetition inside one dispatch, carry-threaded
so XLA cannot CSE) at driving-bench shapes:
  * fused 3-plane scatter of 16k accepted points into [C, 3P] — f32 vs u16
  * candidate row gather [1536*27 rows] from [C, 3P] — f32 vs u16
    (PERF's standing claim: row gathers cost per ROW, not per byte)

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_quantized_rows.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from tools._timing import force_sync_mode

C = 1 << 18
P = 30
N_INS = 16384
N_GATHER = 1536 * 27


def timed(fn, *args, n=6):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000


def per_iter(build, r1=4, r2=24):
    f1, f2 = build(r1), build(r2)
    t1, t2 = timed(f1), timed(f2)
    return (t2 - t1) / (r2 - r1)


def main():
    force_sync_mode()
    rng = np.random.default_rng(0)
    idx3 = jnp.asarray(rng.choice(C * P * 3, 3 * N_INS, replace=False)
                       .astype(np.int32))
    rows_idx = jnp.asarray(rng.integers(0, C, N_GATHER).astype(np.int32))

    for dtype, label in ((jnp.float32, "f32"), (jnp.uint16, "u16")):
        buf = jnp.zeros((C, 3 * P), dtype)
        val = jnp.asarray(rng.uniform(0, 100, 3 * N_INS)).astype(dtype)

        def build_scatter(reps, buf=buf, val=val):
            @jax.jit
            def f(b, v):
                def body(i, carry):
                    b = carry
                    flat = b.reshape(-1)
                    flat = flat.at[idx3].set(
                        v + i.astype(v.dtype), mode="drop",
                        unique_indices=True)
                    return flat.reshape(C, 3 * P)
                return jax.lax.fori_loop(0, reps, body, b)
            return lambda: f(buf, val)

        def build_gather(reps, buf=buf):
            @jax.jit
            def f(b):
                def body(i, acc):
                    r = b[(rows_idx + i) % C]
                    return acc + r.astype(jnp.float32).sum()
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
            return lambda: f(buf)

        sc = per_iter(build_scatter)
        ga = per_iter(build_gather)
        print(f"{label}: scatter(3x{N_INS}) {sc:6.3f} ms/iter, "
              f"row-gather({N_GATHER}) {ga:6.3f} ms/iter "
              f"(buffer {C * 3 * P * jnp.dtype(dtype).itemsize >> 20} MB)",
              flush=True)


if __name__ == "__main__":
    main()
