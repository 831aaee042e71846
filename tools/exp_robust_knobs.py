"""In-situ robust-path frame-time decomposition (bench --robust pipeline
with dynamic solver knobs overridden — same method as exp_bench_knobs)."""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import bench
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator

    overrides = {}
    num_frames = 48
    batch = 8
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        overrides[k] = float(v) if "." in v else int(v)

    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, num_frames * 0.1 + 0.5, speed=8.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj, syn.SyntheticAcquisitionOptions(
            num_points_per_frame=100_000, frame_duration=0.1,
            max_range=50.0, min_range=2.0, noise_sigma=0.01), seed=3)
    frames = [acq.frame(i) for i in range(num_frames)]

    opts = robust_driving_profile()
    if overrides:
        opts = dataclasses.replace(opts, ct_icp_options=dataclasses.replace(
            opts.ct_icp_options, **overrides))
    odo = Odometry(opts)

    def _prepare(item):
        i, fr = item
        return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)

    warmup = 2 * batch
    prepared = PrefetchIterator(enumerate(frames), depth=2 * batch,
                                transform=_prepare, workers=3)
    t0 = None
    timed = 0
    for i, s in enumerate(odo.stream_frames(prepared, batch=batch)):
        if i == warmup - 1:
            t0 = time.time()
        elif i >= warmup:
            timed += 1
    spf = (time.time() - t0) / max(timed, 1)
    first_gt = frames[0]["begin_pose"]
    errs = [np.linalg.norm(est.end_pose.tr
                           - (first_gt.inverse() * fr["end_pose"]).tr)
            for est, fr in zip(odo.get_trajectory(), frames)]
    print(json.dumps({"overrides": overrides, "ms_per_frame":
                      round(spf * 1e3, 2), "fps": round(1 / spf, 1),
                      "mean_ape_m": round(float(np.mean(errs)), 4)}))


if __name__ == "__main__":
    main()
