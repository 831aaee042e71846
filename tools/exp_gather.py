"""Measure the TPU cost law of row gathers / scatters that dominate the
odometry hot path, to steer kernel design.

Questions:
  1. Is `table[slots]` cost per-ROW or per-BYTE? (vary N rows and row width)
  2. Does dtype narrowing (f32 -> i16) pay?
  3. What does mask-compaction (prefix-sum pack) of the index list cost?
  4. What can a Pallas per-row DMA gather sustain (descriptor overhead)?

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_gather.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def main():
    print("device:", jax.devices()[0])
    C = 1 << 18
    rng = np.random.default_rng(0)

    for width, dtype in [(128, jnp.float32), (64, jnp.float32),
                         (128, jnp.int16), (8, jnp.float32),
                         (1, jnp.float32)]:
        table = jnp.asarray(rng.standard_normal((C, width)), dtype=dtype)
        for N in [16384, 32768, 110592]:
            slots = jnp.asarray(rng.integers(0, C, N), jnp.int32)
            f = jax.jit(lambda t, s: t[s])
            t = timeit(f, table, slots)
            by = N * width * table.dtype.itemsize / t * 1e3 / 1e9
            print(f"gather rows N={N:7d} width={width:4d} {str(dtype.__name__):8s}"
                  f" {t:7.2f} ms  ({N / t * 1e3 / 1e6:6.1f} Mrows/s, {by:5.2f} GB/s)")

    # sorted vs random indices
    N = 110592
    slots = jnp.asarray(np.sort(rng.integers(0, C, N)), jnp.int32)
    table = jnp.asarray(rng.standard_normal((C, 128)), jnp.float32)
    f = jax.jit(lambda t, s: t[s])
    print(f"gather rows sorted N={N} width=128: {timeit(f, table, slots):7.2f} ms")

    # element gather (1D table) — the find_slots key probe pattern
    keys = jnp.asarray(rng.integers(0, 2**31, C), jnp.uint32)
    for N in [110592, 110592 * 16]:
        idx = jnp.asarray(rng.integers(0, C, N), jnp.int32)
        t = timeit(f, keys, idx)
        print(f"element gather N={N:8d} u32: {t:7.2f} ms ({N / t * 1e3 / 1e6:6.1f} Melem/s)")

    # compaction: mask -> packed indices
    mask = jnp.asarray(rng.random(110592) < 0.2)

    @jax.jit
    def compact(m):
        idx = jnp.cumsum(m.astype(jnp.int32)) - 1
        out = jnp.zeros((110592,), jnp.int32).at[
            jnp.where(m, idx, 110592)].set(
                jnp.arange(110592, dtype=jnp.int32), mode="drop")
        return out, idx[-1] + 1

    print(f"compact 110592 mask:  {timeit(compact, mask):7.2f} ms")

    # scatter throughput (the sampling dedup primitive)
    for N in [16384, 65536, 131072]:
        tgt = jnp.zeros((C,), jnp.int32)
        sl = jnp.asarray(rng.integers(0, C, N), jnp.int32)
        vals = jnp.asarray(rng.integers(0, 100, N), jnp.int32)
        g = jax.jit(lambda t_, s, v: t_.at[s].min(v, mode="drop"))
        t = timeit(g, tgt, sl, vals)
        print(f"scatter-min N={N:7d} i32: {t:7.2f} ms ({N / t * 1e3 / 1e6:6.1f} Mrows/s)")

    # ---- Pallas DMA row gather: grid over blocks of rows, per-row DMAs with
    # a ring of in-flight copies. slots via scalar prefetch (SMEM).
    ROWS_PER_BLOCK = 512
    INFLIGHT = 8

    def dma_gather_kernel(slots_ref, table_ref, out_ref, sems):
        blk = pl.program_id(0)
        base = blk * ROWS_PER_BLOCK

        def get_dma(i):
            s = slots_ref[base + i]
            return pltpu.make_async_copy(
                table_ref.at[s], out_ref.at[i], sems.at[i % INFLIGHT])

        for i in range(INFLIGHT):
            get_dma(i).start()

        def body(i, _):
            get_dma(i).wait()

            @pl.when(i + INFLIGHT < ROWS_PER_BLOCK)
            def _():
                get_dma(i + INFLIGHT).start()
            return 0

        jax.lax.fori_loop(0, ROWS_PER_BLOCK, body, 0)

    def dma_gather(table, slots):
        n = slots.shape[0]
        grid = n // ROWS_PER_BLOCK
        return pl.pallas_call(
            dma_gather_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (ROWS_PER_BLOCK, table.shape[1]),
                    lambda i, slots_ref: (i, 0),
                    memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((INFLIGHT,))],
            ),
            out_shape=jax.ShapeDtypeStruct((n, table.shape[1]), table.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(slots, table)

    table = jnp.asarray(rng.standard_normal((C, 128)), jnp.float32)
    for N in [16384, 110592]:
        slots = jnp.asarray(rng.integers(0, C, N), jnp.int32)
        f = jax.jit(dma_gather)
        try:
            ref = np.asarray(table)[np.asarray(slots)]
            got = np.asarray(f(table, slots))
            ok = np.allclose(ref, got)
            t = timeit(f, table, slots)
            by = N * 128 * 4 / t * 1e3 / 1e9
            print(f"pallas DMA gather N={N:7d} w=128 f32: {t:7.2f} ms "
                  f"({N / t * 1e3 / 1e6:6.1f} Mrows/s, {by:5.2f} GB/s) ok={ok}")
        except Exception as e:
            print(f"pallas DMA gather N={N}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
