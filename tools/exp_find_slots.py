"""Bisect find_slots' 8 ms with the real map level.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_find_slots.py
"""

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


def main():
    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.ops import voxel as vx
    from ct_icp_tpu.odometry.odometry import Odometry

    o = default_driving_profile()
    print("device:", jax.devices()[0], flush=True)
    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, 2.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    odo = Odometry(o)
    for i in range(8):
        fr = acq.frame(i)
        odo.register_frame(fr["xyz"], fr["timestamps"], i)
    level = odo.map_state.levels[0]
    res = jnp.float32(0.8)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((2048, 3), np.float32) * 40)

    offsets = vm._neighbor_offsets(1)

    @jax.jit
    def coords_fn(q):
        qc = vx.voxel_coords(q, res)
        cand = qc[:, None, :] + offsets[None, :, :]
        return cand.reshape(-1, 3)

    t = chained(coords_fn, q)
    print(f"coords+offsets:        {t:7.3f} ms", flush=True)
    cand = coords_fn(q)

    @jax.jit
    def hash_fn(cand):
        return vx.voxel_hash_u32(cand), vm.voxel_key_u32(cand)

    t = chained(hash_fn, cand)
    print(f"hash+key:              {t:7.3f} ms", flush=True)
    h, k2 = hash_fn(cand)

    @jax.jit
    def probe_fn(keys, h):
        c = keys.shape[0]
        slots = vm._probe_slots(h, c)
        return keys[slots]

    t = chained(probe_fn, level.keys, h)
    print(f"probe gather [M,16]:   {t:7.3f} ms", flush=True)
    keys_p = probe_fn(level.keys, h)

    @jax.jit
    def select_fn(keys_p, k2, h):
        c = level.keys.shape[0]
        slots = vm._probe_slots(h, c)
        is_empty = keys_p == vm.EMPTY
        is_match = keys_p == k2[..., None]
        before_empty = jnp.cumsum(is_empty.astype(jnp.int32), axis=-1) == 0
        hit = is_match & before_empty
        any_hit = jnp.any(hit, axis=-1)
        first = jnp.argmax(hit, axis=-1)
        found = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
        return jnp.where(any_hit, found, -1)

    t = chained(select_fn, keys_p, k2, h)
    print(f"select:                {t:7.3f} ms", flush=True)

    # full find_slots, monolithic jit
    @jax.jit
    def full(keys_arr, cand):
        lvl = level._replace(keys=keys_arr)
        return vm.find_slots(lvl, cand)

    t = chained(full, level.keys, cand)
    print(f"find_slots (fused):    {t:7.3f} ms", flush=True)

    # same but q -> coords inside
    @jax.jit
    def full2(keys_arr, q):
        qc = vx.voxel_coords(q, res)
        cand = (qc[:, None, :] + offsets[None, :, :]).reshape(-1, 3)
        lvl = level._replace(keys=keys_arr)
        return vm.find_slots(lvl, cand)

    t = chained(full2, level.keys, q)
    print(f"coords+find_slots:     {t:7.3f} ms", flush=True)

    # key stats: how loaded is the table?
    occ = int(jnp.sum(level.keys > 1))
    print(f"table occupancy: {occ}/{level.keys.shape[0]}"
          f" ({occ/level.keys.shape[0]*100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
