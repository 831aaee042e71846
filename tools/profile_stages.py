"""Per-stage timing of the odometry pipeline on the current default device.

Times the fused frame step and each constituent with block_until_ready and
proper warmup. Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_stages.py
"""

import time

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
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.icp.registration import make_prior
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry import pipeline as pl

    o = default_driving_profile()
    print("device:", jax.devices()[0])

    # realistic workload: warm the odometry with a few bench frames
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
    for i in range(8):
        fr = acq.frame(i)
        preps.append(odo.prepare_frame(fr["xyz"], fr["timestamps"], i))
    for i in range(6):
        odo.register_frame_prepared(preps[i])

    # ---- fused frame step in isolation (replay frame 6 style inputs)
    prep = preps[6]
    import dataclasses
    frame = odo.trajectory[-1]
    pose_init = np.concatenate([
        frame.begin_pose.quat, frame.begin_pose.tr - odo.origin,
        frame.end_pose.quat, frame.end_pose.tr - odo.origin]).astype(np.float32)
    prior = odo.default_motion_model.device_prior(odo.origin)
    dyn = odo.registration.dynamics(o.ct_icp_options)
    fs = np.asarray([o.voxel_size, o.sample_voxel_size, o.max_distance,
                     1.0, 0.0, o.insertion_ego_rotation_threshold, 0.0,
                     o.insertion_threshold_frames_skipped,
                     o.distance_error_threshold,
                     o.orientation_error_threshold, 0.0,
                     np.inf, np.inf, np.inf, 0.0], np.float32)

    def fused():
        # non-donating copy so we can repeat
        ms, packed, *_ = odo._frame_step(
            jax.tree_util.tree_map(lambda x: x + 0 if x.dtype != bool else x,
                                   odo.map_state),
            prep["scan_dev"], jnp.int32(prep["n"]),
            jnp.asarray(pose_init), jnp.asarray(prior), jnp.asarray(dyn),
            jnp.asarray(fs))
        return packed

    t, _ = timeit(fused, n=5)
    print(f"fused frame step (total):            {t:8.2f} ms")

    # ---- constituents
    from ct_icp_tpu.odometry import pipeline as _pl
    raw, alphas = jax.jit(_pl.unpack_scan)(prep["scan_dev"])
    valid = jnp.arange(o.max_scan_points) < prep["n"]
    t, (sub_raw, sub_alphas, sub_valid, cnt) = timeit(
        pl.preprocess, raw, alphas, valid, jnp.float32(o.voxel_size),
        o.max_subsampled_points)
    print(f"  preprocess ({prep['n']}->{int(cnt)}):     {t:8.2f} ms")

    t, (kp_raw, kp_alphas, kp_valid, kcnt) = timeit(
        pl.sample_keypoints, sub_raw, sub_alphas, sub_valid,
        jnp.float32(o.sample_voxel_size), o.max_keypoints)
    print(f"  sample_keypoints (->{int(kcnt)}):     {t:8.2f} ms")

    level = odo.map_state.levels[0]
    level_idx, nv = o.map_options.search_params(o.map_options.default_radius)
    res_ = o.map_options.resolutions[0].resolution
    world = kp_raw
    t, _ = timeit(vm.ball_search, level, world, kp_valid,
                  jnp.float32(o.map_options.default_radius),
                  jnp.float32(res_), nv=nv)
    print(f"  ball_search (K={o.max_keypoints}, nv={nv}):  {t:8.2f} ms")

    t, _ = timeit(vm.radius_search, level, world, kp_valid,
                  jnp.float32(o.map_options.default_radius),
                  jnp.float32(res_), nv=nv, k=20)
    print(f"  radius_search(top-k):              {t:8.2f} ms")

    fn = odo.registration._fn
    qb = jnp.asarray(pose_init[0:4])
    tb = jnp.asarray(pose_init[4:7])
    qe = jnp.asarray(pose_init[7:11])
    te = jnp.asarray(pose_init[11:14])
    t, out = timeit(fn, level, kp_raw, kp_alphas, kp_valid, qb, tb, qe, te,
                    jnp.asarray(prior), jnp.asarray(dyn))
    print(f"  solver ({int(out.num_iters)} outer iters):  {t:8.2f} ms")

    # solver with 1 outer iteration (per-iteration cost)
    opts1 = dataclasses.replace(o.ct_icp_options, num_iters_icp=1)
    dyn1 = slv.pack_dynamics(opts1, odo.registration.search_radius,
                             odo.registration.voxel_resolution)
    t, out1 = timeit(fn, level, kp_raw, kp_alphas, kp_valid, qb, tb, qe, te,
                     jnp.asarray(prior), jnp.asarray(dyn1))
    print(f"  solver (1 outer iter):             {t:8.2f} ms")

    world_pts = pl.transform_points(sub_raw, sub_alphas, qb, tb, qe, te)
    upd = odo._update_map
    state0 = jax.tree_util.tree_map(lambda x: x + 0, odo.map_state)
    jax.block_until_ready(state0)
    t0 = time.time()
    reps = 5
    st = state0
    for _ in range(reps):
        st2, _ = upd(st, world_pts, sub_valid,
                     tb, te, jnp.float32(o.max_distance), jnp.asarray(True))
        jax.block_until_ready(st2.levels[0].count)
        st = st2
    print(f"  update_map (prune+insert):         "
          f"{(time.time() - t0) / reps * 1000:8.2f} ms")

    # insert only (no prune)
    st = jax.tree_util.tree_map(lambda x: x + 0, odo.map_state)
    upd_np = odo._update_map
    jax.block_until_ready(st)
    t0 = time.time()
    for _ in range(reps):
        st2, _ = upd_np(st, world_pts, sub_valid, tb, te,
                        jnp.float32(o.max_distance), jnp.asarray(True),
                        prune=False)
        jax.block_until_ready(st2.levels[0].count)
        st = st2
    print(f"  update_map (insert only):          "
          f"{(time.time() - t0) / reps * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
