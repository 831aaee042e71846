"""Per-stage DEVICE timing (chained dispatches, block once) of the odometry
pipeline at driving-bench shapes — per-call block_until_ready timing
conflates tunnel/dispatch overhead with device time (see tools/exp_rtt.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_stages2.py
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp


def chained(fn, *args, n=10):
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
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry import pipeline as pl
    from ct_icp_tpu.ops import sampling as smp

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
    preps = []
    for i in range(8):
        fr = acq.frame(i)
        preps.append(odo.prepare_frame(fr["xyz"], fr["timestamps"], i))
    for i in range(7):
        odo.register_frame_prepared(preps[i])

    prep = preps[7]
    from ct_icp_tpu.odometry import pipeline as _pl
    raw, alphas = jax.jit(_pl.unpack_scan)(prep["scan_dev"])
    n = prep["n"]
    valid = jnp.arange(o.max_scan_points) < n

    # stage 1: subsample at the 65536 rung (bench steady state)
    sub_fn = jax.jit(lambda r, v: smp.voxel_subsample_indices(
        r[:65536], v[:65536], jnp.float32(o.voxel_size),
        o.max_subsampled_points))
    t = chained(sub_fn, raw, valid)
    idx, ok, cnt = sub_fn(raw, valid)
    print(f"subsample@65536 ({n}->{int(cnt)}):  {t:7.2f} ms", flush=True)

    sub_raw, sub_alphas, sub_valid = raw[idx], alphas[idx], ok

    # stage 2: keypoint sampling at the 16384 rung
    kp_fn = jax.jit(lambda r, v: smp.voxel_subsample_indices(
        r[:16384], v[:16384], jnp.float32(o.sample_voxel_size),
        o.max_keypoints))
    t = chained(kp_fn, sub_raw, sub_valid)
    kidx, kok, kcnt = kp_fn(sub_raw, sub_valid)
    print(f"keypoints@16384 (->{int(kcnt)}):   {t:7.2f} ms", flush=True)

    kp_raw = sub_raw[kidx][:2048]
    kp_alphas = sub_alphas[kidx][:2048]
    kp_valid = kok[:2048]

    # stage 3: solver at the 2048 rung
    statics = dataclasses.replace(odo.registration.statics, num_keypoints=2048)
    reg = jax.jit(slv.build_register_fn(statics))
    frame = odo.trajectory[-1]
    qb = jnp.asarray(frame.begin_pose.quat, jnp.float32)
    tb = jnp.asarray(frame.begin_pose.tr - odo.origin, jnp.float32)
    qe = jnp.asarray(frame.end_pose.quat, jnp.float32)
    te = jnp.asarray(frame.end_pose.tr - odo.origin, jnp.float32)
    prior = jnp.asarray(odo.default_motion_model.device_prior(odo.origin))
    level = odo.map_state.levels[0]

    for iters, inner in [(5, 5), (1, 5), (1, 1), (5, 1)]:
        opts = dataclasses.replace(o.ct_icp_options, num_iters_icp=iters,
                                   ls_max_num_iters=inner)
        dyn = jnp.asarray(slv.pack_dynamics(
            opts, odo.registration.search_radius,
            odo.registration.voxel_resolution))
        t = chained(reg, level, kp_raw, kp_alphas, kp_valid, qb, tb, qe, te,
                    prior, dyn)
        print(f"solver outer={iters} inner={inner}:      {t:7.2f} ms",
              flush=True)

    # stage 4: candidate gather alone (the cached-plane producer)
    gather = jax.jit(lambda lv, q, v: vm.gather_candidate_planes(
        lv, q, v, jnp.float32(o.map_options.resolutions[0].resolution), 1))
    t = chained(gather, level, kp_raw, kp_valid)
    print(f"gather_candidate_planes@2048: {t:7.2f} ms", flush=True)

    # stage 5: transform + insert at the 16384 rung (non-donating copy cost
    # excluded by chaining on the donated update)
    world = pl.transform_points(sub_raw, sub_alphas, qb, tb, qe, te)
    upd = pl.make_update_map_fn(o.map_options, o.max_dirty_voxels)

    st = jax.tree_util.tree_map(lambda x: x + 0, odo.map_state)
    jax.block_until_ready(st)
    w16, v16 = world[:16384], sub_valid[:16384]
    # warmup (compile) before timing — the first call costs ~20-40 s of XLA
    st, _ = upd(st, w16, v16, tb, te, jnp.float32(o.max_distance),
                jnp.asarray(True), prune=True)
    jax.block_until_ready(st.levels[0].count)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        st, _ = upd(st, w16, v16, tb, te, jnp.float32(o.max_distance),
                    jnp.asarray(True), prune=True)
    jax.block_until_ready(st.levels[0].count)
    print(f"update_map@16384 (chained):   {(time.time()-t0)/reps*1e3:7.2f} ms",
          flush=True)

    # transform alone
    tr_fn = jax.jit(pl.transform_points)
    t = chained(tr_fn, sub_raw, sub_alphas, qb, tb, qe, te)
    print(f"transform_points@65536:       {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
