"""Isolate the cost of the k-NN histogram cap in moments_from_planes.

PYTHONPATH=/root/repo python -u tools/exp_knn_hist.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from ct_icp_tpu.mapping import voxel_map as vm


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000, out


def main():
    # force sync mode
    np.asarray(jnp.zeros(()) + 1)
    rng = np.random.default_rng(0)
    m, o, p = 4096, 27, 30
    rows = jnp.asarray(rng.normal(size=(m, o, 3 * p)).astype(np.float32))
    cnt = jnp.asarray(rng.integers(0, p, (m, o)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))

    f_off = jax.jit(lambda r, c, qq: vm.moments_from_planes(r, c, qq, 0.75))
    f_on = jax.jit(lambda r, c, qq: vm.moments_from_planes(
        r, c, qq, 0.75, k_nearest=jnp.int32(20)))
    t0, _ = timeit(f_off, rows, cnt, q)
    t1, _ = timeit(f_on, rows, cnt, q)
    print(f"moments off: {t0:.3f} ms   on: {t1:.3f} ms   delta: {t1-t0:.3f}")

    # histogram alone
    def hist_only(r, c, qq):
        x, y, z = vm._xyz_planes(r, p)
        dx = x - qq[:, None, 0:1]
        dy = y - qq[:, None, 1:2]
        dz = z - qq[:, None, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        ok = jnp.arange(p)[None, None, :] < c[..., None]
        return vm._knn_radius2(d2, ok, jnp.full((m,), 0.75), jnp.int32(20), 32)
    t2, _ = timeit(jax.jit(hist_only), rows, cnt, q)
    print(f"hist alone: {t2:.3f} ms")


if __name__ == "__main__":
    main()
