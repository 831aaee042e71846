"""HONEST per-stage device profiling on axon.

The axon client boots in a DEFERRED mode where block_until_ready returns at
enqueue (measured: 4096^3 matmul chains at "5000 TFLOP/s" — 26x hardware
peak, i.e. a lie). The FIRST device->host readback permanently switches the
client to synchronous execution, where dependent-chain timing is real
(matmuls then measure 90 TFLOP/s — plausible). Therefore: ALWAYS force a
readback before timing anything, and subtract the per-dispatch tax.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_honest.py
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

DISPATCH_TAX_MS = None


def force_sync_mode():
    """Flip the axon client into honest synchronous mode via one readback."""
    x = jax.jit(lambda v: v + 1.0)(jnp.ones(8))
    _ = np.asarray(x)


def chained(fn, *args, n=10):
    """Honest only AFTER force_sync_mode(). Includes ~DISPATCH_TAX_MS/call."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def measure_tax():
    global DISPATCH_TAX_MS
    f = jax.jit(lambda v: v * 2.0)
    v = jnp.ones(128)
    DISPATCH_TAX_MS = chained(f, v, n=30)
    return DISPATCH_TAX_MS


def main():
    print("device:", jax.devices()[0], flush=True)
    force_sync_mode()
    tax = measure_tax()
    print(f"dispatch tax: {tax:.3f} ms/call (subtract from everything)",
          flush=True)

    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry import pipeline as pl
    from ct_icp_tpu.ops import sampling as smp, voxel as vx

    o = default_driving_profile()
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
    raw, alphas = jax.jit(pl.unpack_scan)(prep["scan_dev"])
    n = prep["n"]
    valid = jnp.arange(o.max_scan_points) < n

    def rpt(name, t):
        print(f"{name:<42} {t:7.2f} ms  (net {t - tax:7.2f})", flush=True)

    # ---- the whole fused step, one dispatch
    pose_init = np.zeros(14, np.float32); pose_init[0] = pose_init[7] = 1.0
    prior_np = np.asarray(odo.default_motion_model.device_prior(odo.origin),
                          np.float32)
    dyn_np = odo.registration.dynamics(o.ct_icp_options)
    fs = np.asarray([o.voxel_size, o.sample_voxel_size, o.max_distance,
                     1.0, -1.0, o.insertion_ego_rotation_threshold, 0.0,
                     o.insertion_threshold_frames_skipped,
                     o.distance_error_threshold,
                     o.orientation_error_threshold], np.float32)

    # non-donating copy of the step for repeatability
    core = pl._make_frame_core(o.map_options, odo.registration.statics,
                               o.max_subsampled_points, o.max_dirty_voxels,
                               False)

    @jax.jit
    def step_nodonate(ms, scan, n_points, pose, prior, dyn, fs_):
        raw_, al_ = pl.unpack_scan(scan)
        new_levels, packed, kp, world, _ = core(
            ms, raw_, al_, n_points, pose[0:4], pose[4:7], pose[7:11],
            pose[11:14], prior, dyn, fs_, fs_[3], fs_[4], fs_[6])
        return packed

    t = chained(step_nodonate, odo.map_state, prep["scan_dev"],
                jnp.int32(n), jnp.asarray(pose_init), jnp.asarray(prior_np),
                jnp.asarray(dyn_np), jnp.asarray(fs), n=5)
    rpt("FULL fused step (no insert writeback)", t)

    # ---- stage 1: subsample (ladder rung 65536)
    sub_fn = jax.jit(lambda r, v: smp.voxel_subsample_indices(
        r[:65536], v[:65536], jnp.float32(o.voxel_size),
        o.max_subsampled_points))
    t = chained(sub_fn, raw, valid)
    idx, ok, cnt = sub_fn(raw, valid)
    rpt(f"subsample@65536 ({int(np.asarray(cnt))} kept)", t)
    sub_raw, sub_alphas, sub_valid = raw[idx], alphas[idx], ok

    # ---- stage 2: keypoints @16384
    kp_fn = jax.jit(lambda r, v: smp.voxel_subsample_indices(
        r[:16384], v[:16384], jnp.float32(o.sample_voxel_size),
        o.max_keypoints))
    t = chained(kp_fn, sub_raw, sub_valid)
    kidx, kok, kcnt = kp_fn(sub_raw, sub_valid)
    rpt(f"keypoints@16384 ({int(np.asarray(kcnt))} kept)", t)
    kp_raw = sub_raw[kidx][:2048]
    kp_alphas = sub_alphas[kidx][:2048]
    kp_valid = kok[:2048]

    # ---- stage 3: solver @2048 (5 outer, 5 inner / 1,1)
    statics = dataclasses.replace(odo.registration.statics, num_keypoints=2048)
    reg = jax.jit(slv.build_register_fn(statics))
    frame = odo.trajectory[-1]
    qb = jnp.asarray(frame.begin_pose.quat, jnp.float32)
    tb = jnp.asarray(frame.begin_pose.tr - odo.origin, jnp.float32)
    qe = jnp.asarray(frame.end_pose.quat, jnp.float32)
    te = jnp.asarray(frame.end_pose.tr - odo.origin, jnp.float32)
    prior = jnp.asarray(prior_np)
    level = odo.map_state.levels[0]
    for iters, inner in [(5, 5), (1, 1)]:
        opts = dataclasses.replace(o.ct_icp_options, num_iters_icp=iters,
                                   ls_max_num_iters=inner)
        dyn = jnp.asarray(slv.pack_dynamics(
            opts, odo.registration.search_radius,
            odo.registration.voxel_resolution))
        t = chained(reg, level, kp_raw, kp_alphas, kp_valid, qb, tb, qe, te,
                    prior, dyn, n=5)
        rpt(f"solver outer={iters} inner={inner}", t)

    # ---- candidate gather decomposition
    res = jnp.float32(o.map_options.resolutions[0].resolution)
    gather = jax.jit(lambda lv, q, v: vm.gather_candidate_planes(lv, q, v, res, 1))
    t = chained(gather, level, kp_raw, kp_valid)
    rpt("gather_candidate_planes@2048", t)

    offsets = vm._neighbor_offsets(1)

    @jax.jit
    def stage_slots(lv, q):
        qc = vx.voxel_coords(q, res)
        cand = qc[:, None, :] + offsets[None, :, :]
        return vm.find_slots(lv, cand.reshape(-1, 3)).reshape(2048, 27)

    t = chained(stage_slots, level, kp_raw)
    rpt("  find_slots [55296]", t)
    slots = stage_slots(level, kp_raw)
    slot_c = jnp.where(slots >= 0, slots, 0)

    t = chained(jax.jit(lambda lv, s: lv.points[s]), level, slot_c)
    rpt("  rows gather [2048,27,90]", t)
    t = chained(jax.jit(lambda lv, s: lv.count[s]), level, slot_c)
    rpt("  count gather [2048,27]", t)

    # ---- moments rescoring (the cached-planes fast path)
    rows_c, cnt_ok = gather(level, kp_raw, kp_valid)
    t = chained(jax.jit(lambda r, c, q: vm.moments_from_planes(
        r, c, q, 0.75)), rows_c, cnt_ok, kp_raw)
    rpt("  moments_from_planes (rescore)", t)

    # ---- insert + prune @16384
    w16, v16 = sub_raw[:16384], sub_valid[:16384]
    ins = jax.jit(lambda lvl, p, v: vm.insert_points(
        lvl, p, v, 0.8, 0.1, tb, o.max_dirty_voxels))
    t = chained(ins, level, w16, v16, n=5)
    rpt("insert_points@16384", t)
    t = chained(jax.jit(lambda lvl: vm.prune_level(lvl, te, jnp.float32(
        o.max_distance))), level)
    rpt("prune_level", t)

    # ---- transforms
    t = chained(jax.jit(pl.transform_points), sub_raw, sub_alphas, qb, tb,
                qe, te)
    rpt("transform_points@65536", t)
    t = chained(jax.jit(pl.unpack_scan), prep["scan_dev"])
    rpt("unpack_scan@131072", t)


if __name__ == "__main__":
    main()
