"""Decompose insert_points cost at driving bench shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_insert.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from tools._timing import chained, force_sync_mode
from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops import voxel as vx


def main():
    force_sync_mode()
    rng = np.random.default_rng(0)
    res, min_dist = 0.8, 0.1

    # a steady-state-like map + a fresh batch of 16384 world points
    level = vm.make_level(18, 30)
    base = np.zeros((200000, 3), np.float32)
    base[:, 0] = rng.uniform(-60, 60, 200000)
    base[:, 1] = rng.uniform(-12, 12, 200000)
    base[:100000, 2] = 0.0
    base[100000:, 2] = rng.uniform(0, 8, 100000)
    base += rng.normal(scale=0.03, size=base.shape).astype(np.float32)
    for i in range(0, 200000, 50000):
        level, _ = vm.insert_points(
            level, jnp.asarray(base[i:i + 50000]), jnp.ones(50000, bool),
            res, min_dist, jnp.zeros(3, jnp.float32), 1 << 12,
            with_normals=False)
    jax.block_until_ready(level.keys)
    print("map:", int(level.num_points), "pts,",
          int(jnp.sum(level.keys > 1)), "voxels", flush=True)

    n = 16384
    batch = jnp.asarray(
        base[rng.choice(200000, n, replace=False)]
        + np.array([1.5, 0.0, 0.0], np.float32)
        + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32))
    valid = jnp.ones((n,), bool)
    z3 = jnp.zeros(3, jnp.float32)

    # full insert (no donation here — measures include one map copy)
    full = jax.jit(lambda lv, b: vm.insert_points(
        lv, b, valid, res, min_dist, z3, 1 << 12, with_normals=False))
    t = chained(full, level, batch)
    print(f"insert_points (full, no donate): {t:7.2f} ms", flush=True)

    fulld = jax.jit(lambda lv, b: vm.insert_points(
        lv, b, valid, res, min_dist, z3, 1 << 12, with_normals=False),
        donate_argnums=(0,))
    lvl2 = jax.tree_util.tree_map(lambda x: x + 0, level)
    jax.block_until_ready(lvl2)
    import time
    reps = 20
    st = lvl2
    st, _ = fulld(st, batch)
    jax.block_until_ready(st.count)
    t0 = time.time()
    for _ in range(reps):
        st, _ = fulld(st, batch)
    jax.block_until_ready(st.count)
    print(f"insert_points (donated):         "
          f"{(time.time()-t0)/reps*1e3:7.2f} ms", flush=True)

    # pieces
    coords = vx.voxel_coords(batch, jnp.float32(res))
    h = vx.voxel_hash_u32(coords)
    keys = vm.voxel_key_u32(coords)
    jax.block_until_ready(keys)

    claim = jax.jit(lambda lv, k, hh: vm._resolve_or_claim_slots(
        lv.keys, k, hh, valid, keys_window=lv.win[:, :vm.PROBE_WINDOW]))
    t = chained(claim, level, keys, h)
    print(f"resolve_or_claim:                {t:7.2f} ms", flush=True)

    table, assigned, resolved = claim(level, keys, h)
    slot = jnp.where(resolved, assigned, 0)
    jax.block_until_ready(slot)

    mind = jax.jit(lambda lv, s, b: (lv.points[s], lv.count[s]))
    t = chained(mind, level, slot, batch)
    print(f"min-dist row gather [16k]:       {t:7.2f} ms", flush=True)

    elect = jax.jit(lambda s: vm._elect_ranks(s, valid, 1 << 18, 4))
    t = chained(elect, slot)
    print(f"elect_ranks:                     {t:7.2f} ms", flush=True)

    wb = jax.jit(vm.build_window)
    t = chained(wb, level.keys, level.count)
    print(f"window rebuild:                  {t:7.2f} ms", flush=True)

    triv = jax.jit(lambda b: jnp.sum(b * 2.0, axis=0))
    t = chained(triv, batch)
    print(f"(dispatch floor: trivial op      {t:7.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
