"""Histogram formulation shootout for the k-NN radius cap.

PYTHONPATH=/root/repo python -u tools/exp_knn_hist2.py
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000


def main():
    np.asarray(jnp.zeros(()) + 1)  # force sync tunnel mode
    rng = np.random.default_rng(0)
    m, o, p, B = 4096, 27, 30, 16
    d2 = jnp.asarray((rng.uniform(0, 1, (m, o, p)) ** 2).astype(np.float32))
    ok = jnp.asarray(rng.uniform(size=(m, o, p)) < 0.7)
    r = 0.75
    k = jnp.int32(20)

    # baseline: same-shape trivial reduce (dispatch floor)
    t = timeit(jax.jit(lambda a: jnp.sum(a, axis=(1, 2))), d2)
    print(f"floor reduce: {t:.3f} ms")

    edges = (np.arange(1, B + 1) / B).astype(np.float32) * r
    edges2 = jnp.asarray(edges ** 2)

    def pick(cnt_b):
        reach = cnt_b >= k
        idx = jnp.argmax(reach, axis=-1)
        found = jnp.any(reach, axis=-1)
        return jnp.where(found, edges2[idx], r * r)

    # 1: broadcast-compare one pass
    def bc(d2, ok):
        cmp = (d2[..., None] <= edges2) & ok[..., None]
        cnt_b = jnp.sum(cmp, axis=(1, 2))
        return pick(cnt_b)
    print(f"broadcast-compare B={B}: {timeit(jax.jit(bc), d2, ok):.3f} ms")

    # 2: python loop of B reductions
    def pyloop(d2, ok):
        cnt_b = jnp.stack([jnp.sum((d2 <= e) & ok, axis=(1, 2))
                           for e in edges2], axis=-1)
        return pick(cnt_b)
    print(f"python-loop B={B}: {timeit(jax.jit(pyloop), d2, ok):.3f} ms")

    # 3: bisection, 6 fori iterations
    def bisect(d2, ok):
        lo = jnp.zeros((m,), jnp.float32)
        hi = jnp.full((m,), r * r, jnp.float32)
        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((d2 <= mid[:, None, None]) & ok, axis=(1, 2))
            good = cnt >= k
            return jnp.where(good, lo, mid), jnp.where(good, mid, hi)
        lo, hi = jax.lax.fori_loop(0, 6, body, (lo, hi))
        return hi
    print(f"bisect 6: {timeit(jax.jit(bisect), d2, ok):.3f} ms")

    # 4: bucketize + one-hot matmul (MXU)
    def onehot_mm(d2, ok):
        dn = jnp.sqrt(d2) / r
        q = jnp.clip((dn * B).astype(jnp.int32), 0, B - 1)
        oh = jax.nn.one_hot(q, B, dtype=jnp.bfloat16) \
            * ok[..., None].astype(jnp.bfloat16)
        cnt_hist = jnp.sum(oh.reshape(m, -1, B), axis=1).astype(jnp.float32)
        cnt_b = jnp.cumsum(cnt_hist, axis=-1)
        return pick(cnt_b)
    print(f"one-hot matmul B={B}: {timeit(jax.jit(onehot_mm), d2, ok):.3f} ms")


if __name__ == "__main__":
    main()
