"""Separate device-compute time from host<->device round-trip latency.

The remote-TPU tunnel adds dispatch/sync latency that per-call
block_until_ready timing conflates with device execution time. Measures:
  1. trivial op round trip (pure RTT)
  2. fused frame step, blocking every call  (what the odometry loop pays)
  3. fused frame step, back-to-back chained, block once (device time only)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_rtt.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry

    print("device:", jax.devices()[0])

    # 1. pure round-trip latency
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1)
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(f(x))
    print(f"trivial dispatch+block RTT:   {(time.time() - t0) / 20 * 1e3:7.2f} ms")

    t0 = time.time()
    y = x
    for _ in range(20):
        y = f(y)
    jax.block_until_ready(y)
    print(f"trivial chained (block once): {(time.time() - t0) / 20 * 1e3:7.2f} ms")

    # 2/3. the fused frame step
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
    for i in range(6):
        odo.register_frame_prepared(preps[i])

    prep = preps[6]
    frame = odo.trajectory[-1]
    pose_init = np.concatenate([
        frame.begin_pose.quat, frame.begin_pose.tr - odo.origin,
        frame.end_pose.quat, frame.end_pose.tr - odo.origin]).astype(np.float32)
    prior = jnp.asarray(odo.default_motion_model.device_prior(odo.origin))
    dyn = jnp.asarray(odo.registration.dynamics(o.ct_icp_options))
    fs = jnp.asarray(np.asarray(
        [o.voxel_size, o.sample_voxel_size, o.max_distance, 1.0, 0.0,
         o.insertion_ego_rotation_threshold, 0.0,
         o.insertion_threshold_frames_skipped, o.distance_error_threshold,
         o.orientation_error_threshold, 0.0,
         np.inf, np.inf, np.inf, 0.0], np.float32))
    pose_dev = jnp.asarray(pose_init)
    n_dev = jnp.int32(prep["n"])

    state = odo.map_state
    # warm
    state, packed, kp, wd = odo._frame_step(
        state, prep["scan_dev"], n_dev, pose_dev, prior,
        dyn, fs)
    jax.block_until_ready(packed)

    reps = 10
    t0 = time.time()
    for _ in range(reps):
        state, packed, kp, wd = odo._frame_step(
            state, prep["scan_dev"], n_dev, pose_dev,
            prior, dyn, fs)
        np.asarray(packed)   # what the odometry loop does: sync every frame
    print(f"fused step, sync every call:  {(time.time() - t0) / reps * 1e3:7.2f} ms")

    t0 = time.time()
    for _ in range(reps):
        state, packed, kp, wd = odo._frame_step(
            state, prep["scan_dev"], n_dev, pose_dev,
            prior, dyn, fs)
    jax.block_until_ready(packed)
    print(f"fused step, chained:          {(time.time() - t0) / reps * 1e3:7.2f} ms")

    # overlap test: dispatch next before reading current result
    t0 = time.time()
    prev_packed = None
    for _ in range(reps):
        state, packed, kp, wd = odo._frame_step(
            state, prep["scan_dev"], n_dev, pose_dev,
            prior, dyn, fs)
        if prev_packed is not None:
            np.asarray(prev_packed)   # read k-1 while k runs
        prev_packed = packed
    np.asarray(prev_packed)
    print(f"fused step, 1-frame pipeline: {(time.time() - t0) / reps * 1e3:7.2f} ms")


if __name__ == "__main__" and "stream" not in __import__("sys").argv:
    main()


def stream_probe():
    """Time odometry.stream_frames with pre-built preps (no prefetch thread)
    vs with the PrefetchIterator, to locate host-side throughput gaps."""
    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator

    o = default_driving_profile()
    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, 4.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    frames = [acq.frame(i) for i in range(30)]

    # pre-built preps, no thread
    odo = Odometry(default_driving_profile())
    preps = [odo.prepare_frame(fr["xyz"], fr["timestamps"], i)
             for i, fr in enumerate(frames)]
    t0 = None
    n = 0
    for i, s in enumerate(odo.stream_frames(iter(preps))):
        if i == 7:
            t0 = time.time()
        elif i > 7:
            n += 1
    print(f"stream, preps prebuilt:       {(time.time() - t0) / n * 1e3:7.2f} ms")

    odo2 = Odometry(default_driving_profile())

    def _prep(item):
        i, fr = item
        return odo2.prepare_frame(fr["xyz"], fr["timestamps"], i)

    it = PrefetchIterator(enumerate(frames), depth=2, transform=_prep)
    t0 = None
    n = 0
    for i, s in enumerate(odo2.stream_frames(it)):
        if i == 7:
            t0 = time.time()
        elif i > 7:
            n += 1
    print(f"stream, prefetch thread:      {(time.time() - t0) / n * 1e3:7.2f} ms")


if __name__ == "__main__" and "stream" in __import__("sys").argv:
    stream_probe()
