"""Instrument the speculative robust streaming loop phase by phase."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene, straight_trajectory


def main():
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry import pipeline as pl
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.config.options import (Initialization, MotionCompensation)

    scene = build_scene()
    traj = straight_trajectory(400, 48 * 0.1 + 0.5, speed=8.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(
            num_points_per_frame=100_000, frame_duration=0.1,
            max_range=50.0, min_range=2.0, noise_sigma=0.01),
        seed=3)
    frames = [acq.frame(i) for i in range(48)]

    o = robust_driving_profile()
    odo = Odometry(o)
    BATCH = 8
    preps = [odo.prepare_frame(fr["xyz"], fr["timestamps"], i, upload=False,
                               pad_rung=o.max_scan_points)
             for i, fr in enumerate(frames)]

    multi_step = pl.make_multi_step_fn(
        odo.map_options, odo.registration.statics,
        sub_capacity=o.max_subsampled_points, max_dirty=o.max_dirty_voxels,
        distort_constant_velocity=False,
        const_velocity=(o.initialization
                        == Initialization.INIT_CONSTANT_VELOCITY),
        continuous=(o.motion_compensation == MotionCompensation.CONTINUOUS),
        always_insert=False, do_no_insert=False, batch=BATCH,
        robust_gated=True)

    betas_dev = jnp.asarray(np.asarray(
        [o.default_motion_model.beta_location_consistency,
         o.default_motion_model.beta_orientation_consistency,
         o.default_motion_model.beta_constant_velocity,
         o.default_motion_model.beta_small_velocity], np.float32))
    odo._odo_state = odo._odo_state_from_host()
    cp = pl.make_device_copy_fn()

    for g0 in range(0, 48, BATCH):
        group = preps[g0:g0 + BATCH]
        t0 = time.time()
        rung = max(p["scan_host"].shape[0] for p in group)
        scans = np.zeros((BATCH, rung, 4), np.uint16)
        dyns, fss, ns = [], [], []
        for b, prep in enumerate(group):
            info = prep["info"]
            dyns.append(odo.registration.dynamics(
                odo._effective_icp_options(info)))
            fss.append(odo._robust_frame_scalars(info))
            ns.append(prep["n"])
            scans[b, :prep["scan_host"].shape[0]] = prep["scan_host"]
        scans_dev = jnp.asarray(scans)
        ns_dev = jnp.asarray(np.asarray(ns, np.int32))
        dyns_dev = jnp.asarray(np.stack(dyns))
        fss_dev = jnp.asarray(np.stack(fss))
        t_stack = time.time() - t0

        t0 = time.time()
        ckpt = cp(odo.map_state)
        jax.block_until_ready(ckpt.levels[0].count)
        t_ckpt = time.time() - t0

        t0 = time.time()
        odo.map_state, odo._odo_state, packed_all = multi_step(
            odo.map_state, odo._odo_state, scans_dev, ns_dev, betas_dev,
            dyns_dev, fss_dev)
        t_dispatch = time.time() - t0

        t0 = time.time()
        rows = np.asarray(packed_all)
        t_read = time.time() - t0

        t0 = time.time()
        del ckpt
        t_del = time.time() - t0
        steady = (rows[:, 22] > 0) & (rows[:, 23] > 0)
        print(f"batch@{g0}: rung={rung} stack={t_stack*1e3:7.1f} "
              f"ckpt={t_ckpt*1e3:7.1f} dispatch={t_dispatch*1e3:7.1f} "
              f"read={t_read*1e3:7.1f} del={t_del*1e3:6.1f} ms "
              f"steady={int(steady.sum())}/{BATCH}")


if __name__ == "__main__":
    main()
