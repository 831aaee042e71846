"""Decompose gather_candidate_planes with REAL map state at bench shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_gather2.py
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
    res = jnp.float32(o.map_options.resolutions[0].resolution)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((2048, 3), np.float32) * 40)
    qv = jnp.ones((2048,), bool)

    full = jax.jit(lambda lv, q, v: vm.gather_candidate_planes(lv, q, v, res, 1))
    t = chained(full, level, q, qv)
    print(f"full gather_candidate_planes:  {t:7.3f} ms", flush=True)

    # stage 1: coords + offsets + find_slots
    @jax.jit
    def stage_slots(lv, q):
        offsets = vm._neighbor_offsets(1)
        qc = vx.voxel_coords(q, res)
        cand = qc[:, None, :] + offsets[None, :, :]
        return vm.find_slots(lv, cand.reshape(-1, 3)).reshape(2048, 27)

    t = chained(stage_slots, level, q)
    print(f"  find_slots stage:            {t:7.3f} ms", flush=True)
    slots = stage_slots(level, q)

    # stage 2: count gather + masks
    @jax.jit
    def stage_cnt(lv, slots):
        valid_slot = slots >= 0
        slot_c = jnp.where(valid_slot, slots, 0)
        return jnp.where(valid_slot, lv.count[slot_c], 0)

    t = chained(stage_cnt, level, slots)
    print(f"  count gather:                {t:7.3f} ms", flush=True)

    # stage 3: rows gather flat [M*27, 90]
    slot_c = jnp.where(slots >= 0, slots, 0)

    @jax.jit
    def stage_rows_flat(lv, slot_c):
        return lv.points[slot_c.reshape(-1)]

    t = chained(stage_rows_flat, level, slot_c)
    print(f"  rows gather flat [55296,90]: {t:7.3f} ms", flush=True)

    # stage 4: rows gather shaped [M, 27, 90]
    @jax.jit
    def stage_rows(lv, slot_c):
        return lv.points[slot_c]

    t = chained(stage_rows, level, slot_c)
    print(f"  rows gather [2048,27,90]:    {t:7.3f} ms", flush=True)

    # stage 5: plane split + ok mask from gathered rows
    rows = stage_rows(level, slot_c)
    cnt = stage_cnt(level, slots)

    @jax.jit
    def stage_planes(rows, cnt, qv):
        p = 30
        x, y, z = vm._xyz_planes(rows, p)
        in_cap = jnp.arange(p, dtype=jnp.int32)[None, None, :] < cnt[..., None]
        ok = in_cap & (cnt >= 1)[..., None] & qv[:, None, None]
        return x, y, z, ok

    t = chained(stage_planes, rows, cnt, qv)
    print(f"  plane split + mask:          {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
