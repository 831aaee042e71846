"""Which primitive flips dispatch into slow mode? sort/scatter/cumsum/...

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_overhead4.py
(each candidate also tested in a subprocess-fresh order by editing ORDER)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def chained(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


@jax.jit
def triv(h):
    return h * jnp.uint32(3) + jnp.uint32(1)


def probe_ms(tag, h):
    t = chained(triv, h)
    print(f"{tag}: {t:7.3f} ms", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("device:", jax.devices()[0], "| testing:", which, flush=True)
    h = jnp.asarray(np.arange(55296, dtype=np.uint32))
    probe_ms("fresh            ", h)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((131072,), np.float32))
    xi = jnp.asarray(rng.integers(0, 1 << 20, (131072,), np.int64).astype(np.int32))

    cands = {
        "sort": jax.jit(lambda v: jnp.sort(v)),
        "argsort": jax.jit(lambda v: jnp.argsort(v)),
        "lexsort2": jax.jit(lambda v: jnp.lexsort((v, v))),
        "scatter_set": jax.jit(lambda v: jnp.zeros((131072,), v.dtype)
                               .at[(v * 1000).astype(jnp.int32)].set(v)),
        "scatter_min": jax.jit(lambda v: jnp.full((131072,), 9, v.dtype)
                               .at[(v * 1000).astype(jnp.int32)].min(v)),
        "cumsum": jax.jit(lambda v: jnp.cumsum(v)),
        "gather": jax.jit(lambda v: v[(v * 999).astype(jnp.int32)]),
        "while": jax.jit(lambda v: jax.lax.while_loop(
            lambda c: c[0] < 3, lambda c: (c[0] + 1, c[1] * 2), (0, v))[1]),
        "cond": jax.jit(lambda v: jax.lax.cond(v[0] > 0.5,
                                               lambda: v * 2, lambda: v * 3)),
        "sort_i32": jax.jit(lambda v: jnp.sort(v)),
    }
    for name, fn in cands.items():
        if which not in ("all", name):
            continue
        arg = xi if name.endswith("_i32") else x
        out = fn(arg)
        jax.block_until_ready(out)
        probe_ms(f"after {name:<12}", h)


if __name__ == "__main__":
    main()
