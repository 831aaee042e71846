"""Decompose gather_candidate_planes cost at bench shapes (driving profile).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_gather3.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tools._timing import chained, force_sync_mode

from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops import voxel as vx


def main():
    force_sync_mode()
    rng = np.random.default_rng(0)
    res = 0.8
    # realistic table: ~60k occupied voxels out of 2^18
    level = vm.make_level(18, 30)
    pts = rng.uniform(-60, 60, (200000, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) % 8.0
    for i in range(0, 200000, 50000):
        level, _ = vm.insert_points(
            level, jnp.asarray(pts[i:i + 50000]),
            jnp.ones(50000, bool), res, 0.1, jnp.zeros(3, jnp.float32),
            1 << 12, with_normals=False)
    jax.block_until_ready(level.keys)
    print("occupied voxels:", int(jnp.sum(level.keys > 1)),
          "points:", int(level.num_points), flush=True)

    m = 2048
    queries = jnp.asarray(pts[rng.choice(200000, m, replace=False)]
                          + rng.normal(scale=0.1, size=(m, 3)).astype(np.float32))
    qvalid = jnp.ones((m,), bool)

    # (a) full gather
    gather = jax.jit(lambda lv, q, v: vm.gather_candidate_planes(
        lv, q, v, jnp.float32(res), 1))
    t = chained(gather, level, queries, qvalid)
    print(f"full gather_candidate_planes:  {t:7.2f} ms", flush=True)

    # (b) find_slots_with_count on [M, 27]
    offs = vm._neighbor_offsets(1)
    fsc = jax.jit(lambda lv, q: vm.find_slots_with_count(
        lv, (vx.voxel_coords(q, jnp.float32(res))[:, None, :]
             + offs[None, :, :])))
    t = chained(fsc, level, queries)
    print(f"find_slots_with_count [M,27]:  {t:7.2f} ms", flush=True)

    # (c) window build alone
    wb = jax.jit(vm.build_window)
    t = chained(wb, level.keys, level.count)
    print(f"window build [C,16]:           {t:7.2f} ms", flush=True)

    # (d) window row gather alone (precomputed window)
    win = wb(level.keys, level.count)
    jax.block_until_ready(win)
    coords = vx.voxel_coords(queries, jnp.float32(res))[:, None, :] + offs[None, :, :]
    h = vx.voxel_hash_u32(coords.reshape(-1, 3))
    idx = (h & jnp.uint32((1 << 18) - 1)).astype(jnp.int32)
    rg = jax.jit(lambda w, i: w[i])
    t = chained(rg, win, idx)
    print(f"window row gather [55k,16]:    {t:7.2f} ms", flush=True)

    # (e) points row gather alone [M*27 rows of 3P]
    slots, cnt = vm.find_slots_with_count(level, coords.reshape(m, -1, 3))
    slot_c = jnp.where(slots >= 0, slots, 0)
    jax.block_until_ready(slot_c)
    pg = jax.jit(lambda p, s: p[s])
    t = chained(pg, level.points, slot_c)
    print(f"points row gather [M,27,3P]:   {t:7.2f} ms", flush=True)

    # (f) match+select logic alone (window rows precomputed)
    rows = win[idx]
    k2 = vm.voxel_key_u32(coords.reshape(-1, 3))
    jax.block_until_ready(rows)

    def match(rows, k2):
        j, any_hit = vm._select_first_match(rows[:, :vm.PROBE_WINDOW], k2)
        cnt = jnp.take_along_axis(
            rows[:, vm.PROBE_WINDOW:], j[:, None], axis=-1)[:, 0]
        return j, any_hit, cnt
    t = chained(jax.jit(match), rows, k2)
    print(f"select_first_match [55k]:      {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
