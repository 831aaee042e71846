"""A/B accuracy harness: trajectory error of the bench workload under
controlled solver/pipeline variants, at a FIXED frame count.

Quantifies the TPU-path deviations the reference doesn't have
(VERDICT round-1 tasks 1-2):
  * streaming megastep vs per-frame staged dispatch
  * candidate-plane cache (regather_iters=1) vs fresh gathers every iteration
  * ball neighborhood (all in-radius) vs exact k-NN (reference
    neighborhood_strategy.h:60-85)
  * anchor choice for num_closest_neighbors (reference ct_icp.cpp:593-604)

Reports mean APE, final drift, and drift-% of distance travelled.

Run on TPU:
  PYTHONPATH=/root/repo python -u tools/ab_accuracy.py [num_frames]
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_variant(frames, options, streaming: bool, batch: int = 16):
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator

    odo = Odometry(options)
    t0 = time.time()
    failures = 0
    if streaming:
        def _prepare(item):
            i, fr = item
            return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                     registered_fid=i, frame_id=i,
                                     upload=False,
                                     pad_rung=odo.options.max_scan_points)
        prepared = PrefetchIterator(enumerate(frames), depth=2 * batch,
                                    transform=_prepare)
        for summary in odo.stream_frames(prepared, batch=batch):
            if not summary.success:
                failures += 1
    else:
        for i, fr in enumerate(frames):
            summary = odo.register_frame(fr["xyz"], fr["timestamps"],
                                         frame_id=i)
            if not summary.success:
                failures += 1
    wall = time.time() - t0

    first_gt = frames[0]["begin_pose"]
    errs = []
    dist = 0.0
    prev = None
    for est, fr in zip(odo.get_trajectory(), frames):
        rel_gt = first_gt.inverse() * fr["end_pose"]
        errs.append(np.linalg.norm(est.end_pose.tr - rel_gt.tr))
        if prev is not None:
            dist += np.linalg.norm(rel_gt.tr - prev)
        prev = rel_gt.tr
    errs = np.asarray(errs)
    return {
        "mean_ape_m": round(float(errs.mean()), 4),
        "max_ape_m": round(float(errs.max()), 4),
        "final_drift_m": round(float(errs[-1]), 4),
        "drift_pct": round(float(errs[-1] / max(dist, 1e-9) * 100), 4),
        "dist_m": round(float(dist), 1),
        "failures": failures,
        "sec_per_frame": round(wall / len(frames), 4),
    }


def main():
    import bench
    from ct_icp_tpu.config.options import default_driving_profile

    num_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, num_frames * 0.1 + 0.5)
    from ct_icp_tpu.datasets import synthetic as syn
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(
            num_points_per_frame=100_000, frame_duration=0.1,
            max_range=50.0, min_range=2.0, noise_sigma=0.01),
        seed=3)
    frames = [acq.frame(i) for i in range(min(num_frames, acq.num_frames()))]

    base = default_driving_profile()
    icp = base.ct_icp_options

    def with_icp(**kw):
        return dataclasses.replace(base,
                                   ct_icp_options=dataclasses.replace(icp, **kw))

    variants = {
        "streaming_default": (base, True),
        "staged_default": (base, False),
        "staged_regather_all": (with_icp(regather_iters=64), False),
        "streaming_regather_all": (with_icp(regather_iters=64), True),
        "staged_knn": (with_icp(ball_neighborhood=False), False),
        "streaming_knn": (with_icp(ball_neighborhood=False), True),
        "staged_wholeball": (with_icp(knn_moments=False), False),
        "streaming_wholeball": (with_icp(knn_moments=False), True),
    }
    results = {}
    for name, (opts, streaming) in variants.items():
        if only and name not in only:
            continue
        res = run_variant(frames, opts, streaming)
        results[name] = res
        print(json.dumps({"variant": name, **res}), flush=True)
    return results


if __name__ == "__main__":
    main()
