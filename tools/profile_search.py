"""Micro-profile of the neighbor-search pipeline pieces on the device."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000, out


def main():
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.ops.neighborhood import compute_description

    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    # driving-like map level: 2^18 slots, P=30, ~100k voxels occupied
    level = vm.make_level(18, 30)
    pts = rng.uniform(-60, 60, (120000, 3)).astype(np.float32)
    level, n = vm.insert_points(level, jnp.asarray(pts),
                                jnp.ones(len(pts), bool), 0.8, 0.0,
                                jnp.zeros(3, jnp.float32), 1 << 15)
    print("map points:", int(n))

    m = 4096
    q = jnp.asarray(pts[:m])
    qv = jnp.ones(m, bool)
    nv, res, radius = 1, 0.8, 0.75

    from ct_icp_tpu.ops import voxel as vx
    offsets = vm._neighbor_offsets(nv)
    cand_coords = (vx.voxel_coords(q, res)[:, None, :]
                   + offsets[None, :, :]).reshape(-1, 3)

    t, slots = timeit(jax.jit(vm.find_slots), level, cand_coords)
    print(f"find_slots ({cand_coords.shape[0]} lookups): {t:7.2f} ms")

    slots2 = slots.reshape(m, -1)

    @jax.jit
    def gather_pts(level, slots2):
        slot_c = jnp.where(slots2 >= 0, slots2, 0)
        rows = level.points[slot_c]
        p = level.max_points
        return jnp.stack([rows[..., 0:p], rows[..., p:2*p], rows[..., 2*p:3*p]], axis=-1)

    t, gathered = timeit(gather_pts, level, slots2)
    print(f"points gather [{m},{slots2.shape[1]},30,3]:  {t:7.2f} ms")

    @jax.jit
    def dist_mask(level, slots2, gathered, q):
        cnt = jnp.where(slots2 >= 0, level.count[jnp.where(slots2 >= 0, slots2, 0)], 0)
        in_cap = jnp.arange(30)[None, None, :] < cnt[..., None]
        d = jnp.linalg.norm(gathered - q[:, None, None, :], axis=-1)
        ok = in_cap & (d <= 0.75)
        return d, ok

    t, (d, okm) = timeit(dist_mask, level, slots2, gathered, q)
    print(f"distances+mask:                  {t:7.2f} ms")

    cand = gathered.reshape(m, -1, 3)
    mask = okm.reshape(m, -1)

    t, desc = timeit(jax.jit(compute_description), cand, mask, q)
    print(f"compute_description ({cand.shape[1]} cand): {t:7.2f} ms")

    t, _ = timeit(vm.ball_search, level, q, qv, jnp.float32(radius),
                  jnp.float32(res), nv=nv)
    print(f"ball_search total:               {t:7.2f} ms")

    t, _ = timeit(vm.radius_search, level, q, qv, jnp.float32(radius),
                  jnp.float32(res), nv=nv, k=20)
    print(f"radius_search total:             {t:7.2f} ms")


if __name__ == "__main__":
    main()
