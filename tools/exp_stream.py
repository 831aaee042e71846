"""Locate host-side throughput gaps in streaming mode: pre-built preps
(no prep cost in loop) vs PrefetchIterator (worker-thread prep).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_stream.py
"""

import time

import jax


def main():
    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator

    print("device:", jax.devices()[0], flush=True)
    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, 3.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    frames = [acq.frame(i) for i in range(28)]

    def run(tag, odo, it):
        t0 = None
        n = 0
        for i, s in enumerate(odo.stream_frames(it)):
            if i == 7:
                t0 = time.time()
            elif i > 7:
                n += 1
        print(f"{tag}: {(time.time() - t0) / n * 1e3:7.2f} ms/frame",
              flush=True)

    odo = Odometry(default_driving_profile())
    preps = [odo.prepare_frame(fr["xyz"], fr["timestamps"], i)
             for i, fr in enumerate(frames)]
    run("stream, preps prebuilt ", odo, iter(preps))

    odo2 = Odometry(default_driving_profile())

    def _prep(item):
        i, fr = item
        return odo2.prepare_frame(fr["xyz"], fr["timestamps"], i)

    run("stream, prefetch thread", odo2,
        PrefetchIterator(enumerate(frames), depth=2, transform=_prep))

    # prep cost alone (serial, main thread)
    odo3 = Odometry(default_driving_profile())
    t0 = time.time()
    for i, fr in enumerate(frames):
        p = odo3.prepare_frame(fr["xyz"], fr["timestamps"], i)
    jax.block_until_ready(p["scan_dev"])
    print(f"prepare_frame serial    : {(time.time() - t0) / len(frames) * 1e3:7.2f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
