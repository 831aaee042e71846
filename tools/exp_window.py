"""Isolate probe-window build vs row-gather cost at robust shapes."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000, out


def main():
    from ct_icp_tpu.mapping import voxel_map as vm

    _ = np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones(8)))  # force sync mode

    rng = np.random.default_rng(0)
    for cap_log2 in (18, 19):
        c = 1 << cap_log2
        keys = jnp.asarray(rng.integers(0, 2**32, c, dtype=np.uint64)
                           .astype(np.uint32))
        counts = jnp.asarray(rng.integers(0, 40, c).astype(np.uint32))

        t, win = timeit(jax.jit(
            lambda k, ct: jnp.concatenate(
                [vm._key_window(k), vm._key_window(ct)], axis=1)),
            keys, counts)
        print(f"C=2^{cap_log2}: window build [C,16]:        {t:7.2f} ms")

        for m in (2048 * 27, 2048 * 125):
            idx = jnp.asarray(rng.integers(0, c, m).astype(np.int32))
            t, _ = timeit(jax.jit(lambda w, i: w[i]), win, idx)
            print(f"C=2^{cap_log2}: row gather [{m},16] (prebuilt): {t:7.2f} ms")

            # fused build+gather (what find_slots_with_count does today)
            def fused(k, ct, i):
                w = jnp.concatenate(
                    [vm._key_window(k), vm._key_window(ct)], axis=1)
                return w[i]
            t, _ = timeit(jax.jit(fused), keys, counts, idx)
            print(f"C=2^{cap_log2}: build+gather  [{m},16] fused:   {t:7.2f} ms")


if __name__ == "__main__":
    main()
