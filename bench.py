"""Benchmark: steady-state odometry throughput on a synthetic driving scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference's driving-sequence regression runtimes on CPU,
0.076-0.095 s/frame (BASELINE.md; test/regression/regression_config_short_drive.yaml)
-> midpoint 0.0855 s/frame = 11.7 frames/s. ``vs_baseline`` is the speedup
over that midpoint.

The workload mirrors a KITTI-like driving frame: ~100k-point scans rendered
from a synthetic urban corridor, driving-profile odometry options (CERES-path
solver semantics, grid keypoints, multi-resolution map).
"""

import json
import sys
import time

import numpy as np

BASELINE_FRAMES_PER_SEC = 1.0 / 0.0855

# Hard accuracy gate: the bench exits nonzero if the mean APE over the
# synthetic drive exceeds this bound. Pinned to current-best 0.0593 m
# (2026-08-21, 80 frames, deterministic — exact host-side dedup improved
# it from 0.0707) + ~18 % headroom, so a deliberate 20 % accuracy
# regression fails the bench (round-1 verdict: APE drifted 0.07 -> 0.18 m
# under perf work with no gate firing; this is the gate).
APE_BOUND_M = 0.07


def build_scene():
    from ct_icp_tpu.datasets import synthetic as syn

    prims = []
    # a 250 m urban corridor: ground + two building walls with openings.
    # The scene sampler is uniform by area (like the reference's synthetic
    # generator), so the corridor is kept compact and the sensor range short
    # enough that the sampled density matches a real close-range LiDAR sweep.
    for x0 in range(-20, 250, 40):
        prims += syn.rectangle([x0, -12, 0], [36, 0, 0], [0, 0, 8])
        prims += syn.rectangle([x0 + 2, 10, 0], [36, 0, 0], [0, 0, 8])
    prims += syn.rectangle([-20, -13, 0], [290, 0, 0], [0, 26, 0])  # ground
    # facade relief every ~8 m: doorways/pillars jutting out of the walls —
    # cross-track surfaces make the along-corridor direction observable
    for x0 in range(-16, 248, 8):
        prims += syn.rectangle([x0, -12, 0], [0, 1.5, 0], [0, 0, 4])
        prims += syn.rectangle([x0 + 4, 10, 0], [0, -1.5, 0], [0, 0, 4])
    # some parked obstacles
    rng = np.random.default_rng(0)
    for i in range(30):
        c = np.array([rng.uniform(0, 230), rng.uniform(-8, 8), 1.0])
        prims.append(syn.Ball(c, 0.8))
    return syn.Scene(prims)


def straight_trajectory(num_poses, total_time, speed=10.0, accel=2.5):
    """Drive profile: accelerate from rest to ``speed`` (like real driving
    sequences, which begin at standstill — ICP's capture range is the search
    radius, so frame-to-frame motion must ramp up for the constant-velocity
    initialization to track)."""
    from ct_icp_tpu.core import se3_np as s3n
    from ct_icp_tpu.core.pose import Pose
    from ct_icp_tpu.core.trajectory import LinearContinuousTrajectory

    t_ramp = speed / accel
    poses = []
    for i in range(num_poses):
        t = i / (num_poses - 1) * total_time
        if t < t_ramp:
            x = 0.5 * accel * t * t
        else:
            x = 0.5 * accel * t_ramp ** 2 + speed * (t - t_ramp)
        yaw = 0.08 * np.sin(0.5 * t)
        q = s3n.quat_from_rotvec(np.array([0.0, 0.0, yaw]))
        poses.append(Pose(q, np.array([x, 0.3 * np.sin(0.2 * t), 1.7]),
                          timestamp=t))
    return LinearContinuousTrajectory(poses)


def main():
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry

    # 80 frames = 3 timed megastep bursts after the 2-burst warmup (enough
    # for the median to reject one tunnel stall; the APE bound is pinned to
    # this exact horizon — changing the count re-pins the gate)
    num_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 80

    scene = build_scene()
    traj = straight_trajectory(400, num_frames * 0.1 + 0.5)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(
            num_points_per_frame=100_000, frame_duration=0.1,
            max_range=50.0, min_range=2.0, noise_sigma=0.01),
        seed=3)

    # pre-render frames so host-side scene sampling isn't measured
    frames = [acq.frame(i) for i in range(min(num_frames, acq.num_frames()))]

    odo = Odometry(default_driving_profile())

    def _prepare(item):
        i, fr = item
        # pinned wire rung: scan sizes that straddle a power of two
        # mid-sequence would otherwise force a fresh multi-second XLA
        # compile of the megastep inside the timed window
        return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)

    # streaming megastep mode: BATCH frames ride one dispatch (lax.scan
    # program) with one stacked upload and one packed readback, so the
    # per-dispatch tax and readback round trip (~1 ms each over the tunnel)
    # amortize across the batch (odometry.stream_frames(batch=...))
    import os
    BATCH = int(os.environ.get("BENCH_BATCH", "16"))
    # warmup must be a whole number of megasteps: summaries arrive in
    # bursts of BATCH, so a mid-burst t_start would credit frames whose
    # compute happened before the clock started
    warmup = 2 * BATCH
    failures = 0
    timed = 0
    t_start = None
    burst_ends = []  # wall time at the end of each post-warmup batch burst
    # prefetch worker: scan packing overlaps device compute
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    prepared = PrefetchIterator(enumerate(frames), depth=2 * BATCH,
                                transform=_prepare, workers=3)
    for i, summary in enumerate(odo.stream_frames(prepared, batch=BATCH)):
        if i == warmup - 1:
            t_start = time.time()
            burst_ends.append(t_start)
        elif i >= warmup:
            timed += 1
            if (i + 1) % BATCH == 0:
                burst_ends.append(time.time())
        if not summary.success:
            failures += 1
    sec_per_frame = ((time.time() - t_start) / timed
                     if timed else float("inf"))
    # primary metric: MEDIAN per-megastep frame time. The remote-TPU tunnel
    # occasionally wedges for seconds (docs/PERF.md); one stall inside the
    # timed window would misreport steady-state throughput by 2-10x. The
    # median over per-batch durations measures the sustained rate; the
    # wall-clock number is reported alongside.
    bursts = np.diff(burst_ends)
    med_spf = (float(np.median(bursts)) / BATCH if len(bursts)
               else sec_per_frame)
    fps = 1.0 / med_spf

    # accuracy vs the synthetic ground truth (estimate starts at GT frame 0)
    first_gt = frames[0]["begin_pose"]
    errs = []
    for est, fr in zip(odo.get_trajectory(), frames):
        rel_gt = first_gt.inverse() * fr["end_pose"]
        errs.append(np.linalg.norm(est.end_pose.tr - rel_gt.tr))
    ape = float(np.mean(errs)) if errs else float("nan")

    result = {
        "metric": "synthetic_driving_odometry_throughput",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 3),
        "sec_per_frame": round(med_spf, 4),
        "wall_sec_per_frame": round(sec_per_frame, 4),
        "frames": timed,
        "failures": failures,
        "map_points": odo.map_size(),
        "mean_ape_m": round(ape, 4),
        "final_drift_m": round(float(errs[-1]), 4) if errs else None,
        "accuracy_ok": bool(ape <= APE_BOUND_M),
        "ape_bound_m": APE_BOUND_M,
    }
    print(json.dumps(result))
    if not result["accuracy_ok"]:
        print(f"ACCURACY GATE FAILED: mean APE {ape:.4f} m > "
              f"bound {APE_BOUND_M} m", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
