"""nv=2 candidate-search decomposition + the union-structure ROI check.

PERF.md round-2 item 4 proposed a shared gathered-union candidate
structure across keypoints (~4x probe-volume cut). This measures, at
current robust shapes on real hardware:
  (a) the probe ([K,125] window row-gather + first-match),
  (b) the occupancy compaction (top-k to 48),
  (c) the 48-row plane gather,
and the floor costs of the union alternative's primitive mix
(per-key dedup scatter + compacted probe), to decide whether the
restructure can pay at the measured gather/scatter rates.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000


def main():
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.ops import voxel as vx

    rng = np.random.default_rng(0)
    level = vm.make_level(19, 40)
    # surface-like map: points on a slab (realistic occupancy, not uniform)
    pts = rng.uniform(-60, 60, (120_000, 3)).astype(np.float32)
    pts[:, 2] = (np.abs(pts[:, 2]) % 4.0)
    level, n_ins = vm.insert_points(
        level, jnp.asarray(pts), jnp.ones(pts.shape[0], bool),
        jnp.float32(0.5), jnp.float32(0.1), jnp.zeros(3, jnp.float32),
        1 << 15, max_rounds=16)
    # force sync mode before timing (docs/PERF.md)
    print("inserted:", int(n_ins), flush=True)

    K = 4096
    q = rng.uniform(-50, 50, (K, 3)).astype(np.float32)
    q[:, 2] = np.abs(q[:, 2]) % 4.0
    qd = jnp.asarray(q)
    valid = jnp.ones((K,), bool)
    res, radius = jnp.float32(0.5), jnp.float32(0.8)

    full = jax.jit(lambda lv, qq: vm.gather_candidate_planes(
        lv, qq, valid, res, 2, qq[0], False, jnp.int32(1),
        max_candidates=48))
    t_full = timeit(full, level, qd)
    print(f"gather_candidate_planes nv=2 cap48: {t_full:7.2f} ms", flush=True)

    # (a) probe alone: [K,125] find_slots_with_count
    offs = jnp.asarray(np.stack(np.meshgrid(*([np.arange(-2, 3)] * 3),
                                            indexing="ij"),
                                -1).reshape(-1, 3).astype(np.int32))

    @jax.jit
    def probe_only(lv, qq):
        c = vx.voxel_coords(qq, res)[:, None, :] + offs[None]
        return vm.find_slots_with_count(lv, c)

    t_probe = timeit(probe_only, level, qd)
    print(f"probe [K,125]:              {t_probe:7.2f} ms", flush=True)

    # union floor: dedup K*125 keys via one scatter claim + K*125 scalar
    # re-lookup (the cheapest conceivable union build), then probe the
    # ~distinct voxels once
    @jax.jit
    def union_floor(lv, qq):
        c = vx.voxel_coords(qq, res)[:, None, :] + offs[None]
        keys = vm.voxel_key_u32(c).reshape(-1)
        h = (vx.voxel_hash_u32(c.reshape(-1, 3))
             & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        table = jnp.zeros((1 << 20,), jnp.uint32).at[h].set(keys)
        mine = table[h] == keys          # winner-per-voxel mask (approx)
        return jnp.sum(mine)

    t_union = timeit(union_floor, level, qd)
    print(f"union dedup floor (scatter+lookup): {t_union:7.2f} ms",
          flush=True)

    # occupied distinct candidates (how much the union could shrink work)
    c = np.trunc(q / 0.5).astype(np.int64)[:, None, :] + \
        np.asarray(offs)[None].astype(np.int64)
    keys = (c[..., 0] << 42) ^ (c[..., 1] << 21) ^ c[..., 2]
    distinct = len(np.unique(keys))
    print(f"distinct candidate voxels: {distinct} of {K * 125} "
          f"({K * 125 / max(distinct, 1):.2f}x shared)", flush=True)


if __name__ == "__main__":
    main()
