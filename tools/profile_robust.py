"""Per-stage timing of the ROBUST odometry path (robust_driving profile).

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_robust.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000, out


def main():
    import bench
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry import pipeline as pl

    o = robust_driving_profile()
    print("device:", jax.devices()[0])
    print("map levels:", [(r.resolution, r.max_num_points, r.capacity_log2)
                          for r in o.map_options.resolutions])
    lvl_idx, nv = o.map_options.search_params(o.map_options.default_radius)
    print(f"search level={lvl_idx} nv={nv} "
          f"({(2 * nv + 1) ** 3} candidate voxels)")
    print("icp iters:", o.ct_icp_options.num_iters_icp,
          "lm iters:", o.ct_icp_options.ls_max_num_iters)

    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, 2.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    odo = Odometry(o)
    preps = []
    for i in range(10):
        fr = acq.frame(i)
        preps.append(odo.prepare_frame(fr["xyz"], fr["timestamps"], i))
    for i in range(9):
        odo.register_frame_prepared(preps[i])

    # whole register_frame (host loop + dispatches)
    t0 = time.time()
    s = odo.register_frame_prepared(preps[9])
    t_frame = (time.time() - t0) * 1000
    print(f"register_frame (attempts={s.number_of_attempts}): "
          f"{t_frame:8.2f} ms")

    # --- one fused attempt dispatch in isolation (replay last frame)
    prep = preps[9]
    frame = odo.trajectory[-1]
    pose_init = odo._pose_init_packed(frame)
    prior = odo.default_motion_model.device_prior(odo.origin)
    dyn = odo.registration.dynamics(o.ct_icp_options)
    fs = np.asarray([
        o.voxel_size, o.sample_voxel_size, 1e30, 1.0, -1.0,
        o.insertion_ego_rotation_threshold, 0.0,
        o.insertion_threshold_frames_skipped,
        o.distance_error_threshold, o.orientation_error_threshold, 0.0,
        np.inf, np.inf, np.inf, 0.0,
    ], dtype=np.float32)

    def attempt():
        ms, packed, kp, world = odo._frame_step(
            jax.tree_util.tree_map(
                lambda x: x + 0 if x.dtype != bool else x, odo.map_state),
            prep["scan_dev"], jnp.int32(prep["n"]),
            jnp.asarray(pose_init), jnp.asarray(prior), jnp.asarray(dyn),
            jnp.asarray(fs))
        return packed
    t, _ = timeit(attempt, n=5)
    print(f"one attempt dispatch (no insert):    {t:8.2f} ms")

    # --- constituents
    raw, alphas = jax.jit(pl.unpack_scan)(prep["scan_dev"])
    valid = jnp.arange(raw.shape[0]) < prep["n"]
    t, (sub_raw, sub_alphas, sub_valid, cnt) = timeit(
        pl.preprocess, raw, alphas, valid, jnp.float32(o.voxel_size),
        o.max_subsampled_points)
    print(f"  preprocess ({prep['n']}->{int(cnt)}):       {t:8.2f} ms")

    t, (kp_raw, kp_alphas, kp_valid, kcnt) = timeit(
        pl.sample_keypoints, sub_raw, sub_alphas, sub_valid,
        jnp.float32(o.sample_voxel_size), o.max_keypoints)
    print(f"  sample_keypoints (->{int(kcnt)}):      {t:8.2f} ms")

    level = odo.map_state.levels[lvl_idx]
    res_ = o.map_options.resolutions[lvl_idx].resolution
    print("  level occupancy:", int(level.count.sum()), "pts,",
          int((level.count > 0).sum()), "voxels of", level.count.shape[0])
    t, _ = timeit(vm.ball_search, level, kp_raw, kp_valid,
                  jnp.float32(o.map_options.default_radius),
                  jnp.float32(res_), nv=nv)
    print(f"  ball_search (K={kp_raw.shape[0]}, nv={nv}):   {t:8.2f} ms")

    fn = odo.registration._fn
    qb, tb = jnp.asarray(pose_init[0:4]), jnp.asarray(pose_init[4:7])
    qe, te = jnp.asarray(pose_init[7:11]), jnp.asarray(pose_init[11:14])
    t, out = timeit(fn, level, kp_raw, kp_alphas, kp_valid, qb, tb, qe, te,
                    jnp.asarray(prior), jnp.asarray(dyn))
    print(f"  solver ({int(out.num_iters)} outer iters):        {t:8.2f} ms")

    opts1 = dataclasses.replace(o.ct_icp_options, num_iters_icp=1,
                                ls_max_num_iters=1)
    dyn1 = odo.registration.dynamics(opts1)
    t, _ = timeit(fn, level, kp_raw, kp_alphas, kp_valid, qb, tb, qe, te,
                  jnp.asarray(prior), jnp.asarray(dyn1))
    print(f"  solver (1 outer, 1 lm):            {t:8.2f} ms")

    opts5 = dataclasses.replace(o.ct_icp_options, num_iters_icp=5)
    dyn5 = odo.registration.dynamics(opts5)
    t, out5 = timeit(fn, level, kp_raw, kp_alphas, kp_valid, qb, tb, qe, te,
                     jnp.asarray(prior), jnp.asarray(dyn5))
    print(f"  solver (5 outer, {int(out5.num_iters)} used):        {t:8.2f} ms")

    # map update (3 levels)
    world_pts = pl.transform_points(sub_raw, sub_alphas, qb, tb, qe, te)
    st = jax.tree_util.tree_map(lambda x: x + 0, odo.map_state)
    jax.block_until_ready(st)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        st2, _ = odo._update_map(st, world_pts, sub_valid, tb, te,
                                 jnp.float32(o.max_distance),
                                 jnp.asarray(True))
        jax.block_until_ready(st2.levels[0].count)
        st = st2
    print(f"  update_map ({len(o.map_options.resolutions)} levels):   "
          f"         {(time.time() - t0) / reps * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
