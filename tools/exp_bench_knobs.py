"""In-situ frame-time decomposition via the bench workload itself.

Runs the exact bench pipeline (streaming megastep, prefetch, 16-frame
batches) with dynamic solver knobs overridden — num_iters_icp /
ls_max_num_iters / regather_iters are DYNAMIC scalars, so every variant
reuses the same compiled megastep and the fps deltas are clean in-situ
stage costs (unlike single-dispatch timings, which carry ~25 ms of tunnel
RTT noise).

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_bench_knobs.py \
      num_iters_icp=1 ls_max_num_iters=2
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator

    overrides = {}
    num_frames = 48
    batch = 16
    for arg in sys.argv[1:]:
        if arg.startswith("batch="):
            batch = int(arg.split("=")[1])
        elif "=" in arg:
            k, v = arg.split("=", 1)
            overrides[k] = float(v) if "." in v else int(v)
        else:
            num_frames = int(arg)

    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, num_frames * 0.1 + 0.5)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(
            num_points_per_frame=100_000, frame_duration=0.1,
            max_range=50.0, min_range=2.0, noise_sigma=0.01),
        seed=3)
    frames = [acq.frame(i) for i in range(min(num_frames, acq.num_frames()))]

    base = default_driving_profile()
    icp_kw = {k: v for k, v in overrides.items()
              if k in {f.name for f in dataclasses.fields(base.ct_icp_options)}}
    odo_kw = {k: v for k, v in overrides.items() if k not in icp_kw}
    opts = dataclasses.replace(
        base, ct_icp_options=dataclasses.replace(base.ct_icp_options,
                                                 **icp_kw), **odo_kw)
    odo = Odometry(opts)

    def _prepare(item):
        i, fr = item
        return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)

    warmup = 2 * batch
    timed = 0
    t_start = None
    failures = 0
    prepared = PrefetchIterator(enumerate(frames), depth=2 * batch,
                                transform=_prepare)
    for i, summary in enumerate(odo.stream_frames(prepared, batch=batch)):
        if i == warmup - 1:
            t_start = time.time()
        elif i >= warmup:
            timed += 1
        if not summary.success:
            failures += 1
    spf = (time.time() - t_start) / timed if timed else float("inf")

    first_gt = frames[0]["begin_pose"]
    errs = [np.linalg.norm(est.end_pose.tr
                           - (first_gt.inverse() * fr["end_pose"]).tr)
            for est, fr in zip(odo.get_trajectory(), frames)]
    print(json.dumps({
        "overrides": overrides, "batch": batch, "frames": timed,
        "ms_per_frame": round(spf * 1e3, 2),
        "fps": round(1.0 / spf, 1),
        "mean_ape_m": round(float(np.mean(errs)), 4),
        "failures": failures,
    }))


if __name__ == "__main__":
    main()
