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

# Hard accuracy gate: the bench exits nonzero if the MEAN APE over three
# scan-realization seeds exceeds this bound. History: round 2 pinned a
# single-seed 0.0593/0.07, but round 3 found that number was overfit to
# the seed-3 realization — frame 1 passed the min_number_neighbors
# bootstrap by luck (36 residuals); every other seed death-spiraled (79/80
# failures, 23 m APE). With the robust bootstrap budget
# (OdometryOptions.bootstrap_insert_rounds=12) every draw tracks; the
# scan shuffle (reference InitializeFrame parity — fixes the early-alpha
# keypoint bias that left the end pose underconstrained) then halved the
# 3-seed mean to 0.0576 (seeds 0.0508/0.0601/0.0620). Single-draw APE
# still swings chaotically with the realization, so the gate averages
# three seeds (throughput is still measured on the seed-3 run only).
APE_BOUND_M = 0.07
APE_SEEDS = (3, 4, 5)


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


# Long-horizon gate (--long): 500-frame synthetic urban drive graded by
# KITTI segment-RPE %Tr — the metric the reference's regression harness
# actually grades 500-frame drives with
# (test/regression/regression_config_short_drive.yaml:19-48, 0.5-1.0 %Tr).
# Pinned to current-best 0.5687 % (2026-08-21, deterministic 500-frame
# run; driving profile, default bootstrap budget) + ~14 % relative
# headroom, mirroring the reference's tolerance discipline. For scale: the
# reference's real-KITTI regression baselines are 0.5-1.0 %Tr on 500-frame
# drives. History: pre-shuffle this measured 0.4028 — the scan shuffle
# (reference InitializeFrame parity) raised long-drive cruise drift ~0.17
# while HALVING corridor APE (0.108 -> 0.058) and robust APE
# (0.100 -> 0.050); net accuracy across the suite strongly favors it.
LONG_TR_BOUND_PCT = 0.65
LONG_CONFIG = "configs/synthetic_long_drive.yaml"


def run_long():
    """500-frame drive -> one JSON line; exit 1 if %Tr exceeds the bound."""
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.config.yaml_config import synthetic_sequence_from_yaml
    from ct_icp_tpu.evaluation.kitti import evaluate_poses
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry
    import os

    import dataclasses

    num_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    seq = synthetic_sequence_from_yaml(LONG_CONFIG)
    acq = seq.acq
    num_frames = min(num_frames, acq.num_frames())

    odo = Odometry(default_driving_profile())
    BATCH = int(os.environ.get("BENCH_BATCH", "16"))

    def _prepare(i):
        # rendering happens in the prefetch workers, overlapped with device
        # compute (scene sampling is ~40 ms/frame — off the critical path)
        fr = acq.frame(i)
        prep = odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)
        return prep, fr["begin_pose"], fr["end_pose"]

    gt_ends = [None] * num_frames
    begin0 = [None]

    def prep_iter():
        for item in PrefetchIterator(range(num_frames), depth=2 * BATCH,
                                     transform=_prepare, workers=3):
            prep, bp, ep = item
            i = prep["info"].registered_fid
            gt_ends[i] = ep
            if i == 0:
                begin0[0] = bp
            yield prep

    t0 = time.time()
    failures = sum(1 for s in odo.stream_frames(prep_iter(), batch=BATCH)
                   if not s.success)
    wall = time.time() - t0

    # estimate starts at GT frame 0: conjugate GT into the estimate frame
    first_gt = begin0[0]
    gt = [first_gt.inverse() * p for p in gt_ends[:len(odo.trajectory)]]
    est = [f.end_pose for f in odo.get_trajectory()]
    err = evaluate_poses(gt, est, driving=True)

    result = {
        "metric": "synthetic_long_drive_segment_rpe",
        "value": round(err.mean_rpe, 4),
        "unit": "%Tr",
        "vs_baseline": round(1.0 / max(err.mean_rpe, 1e-9), 3),
        "frames": len(est),
        "failures": failures,
        "wall_sec_per_frame": round(wall / max(len(est), 1), 4),
        "mean_ape_m": round(err.mean_ape, 4),
        "max_ape_m": round(err.max_ape, 4),
        "segments": len(err.tab_errors),
        "tr_bound_pct": LONG_TR_BOUND_PCT,
        "accuracy_ok": bool(err.mean_rpe <= LONG_TR_BOUND_PCT),
    }
    print(json.dumps(result))
    if not result["accuracy_ok"]:
        print(f"LONG-HORIZON GATE FAILED: {err.mean_rpe:.4f} %Tr > "
              f"bound {LONG_TR_BOUND_PCT} %", file=sys.stderr)
        sys.exit(1)


# Robust-path gate (--robust): the same corridor scene driven through the
# speculative ROBUST escalation path (the NCLT-regimen analog; reference
# baseline 0.26 s/frame, regression_config_short_nclt.yaml:22). APE bound
# pinned 2026-08-21 post-shuffle: 3-seed mean 0.0503 (seeds
# 0.0486/0.0508/0.0515, deterministic) + ~15 % headroom.
ROBUST_BASELINE_SEC_PER_FRAME = 0.26
ROBUST_APE_BOUND_M = 0.058


def run_robust():
    """Robust-escalation throughput + accuracy -> one JSON line."""
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry
    import os

    num_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    scene = build_scene()
    # cruise below 1 m/frame: the reference robust profile REJECTS frames
    # whose begin->end translation exceeds robust_relative_trans_threshold
    # (1.0 m, odometry.h:102) and burns all attempts on them — benching
    # inside that regime measures threshold thrash, not throughput
    traj = straight_trajectory(400, num_frames * 0.1 + 0.5, speed=8.0)

    def render(seed):
        acq = syn.SyntheticSensorAcquisition(
            scene, traj,
            syn.SyntheticAcquisitionOptions(
                num_points_per_frame=100_000, frame_duration=0.1,
                max_range=50.0, min_range=2.0, noise_sigma=0.01),
            seed=seed)
        return [acq.frame(i)
                for i in range(min(num_frames, acq.num_frames()))]

    BATCH = int(os.environ.get("BENCH_BATCH", "8"))
    warmup = 2 * BATCH

    def run(frames, timing):
        odo = Odometry(robust_driving_profile())

        def _prepare(item):
            i, fr = item
            return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                     registered_fid=i, frame_id=i,
                                     upload=False,
                                     pad_rung=odo.options.max_scan_points)

        prepared = PrefetchIterator(enumerate(frames), depth=2 * BATCH,
                                    transform=_prepare, workers=3)
        stats = {"failures": 0, "attempts": 0, "timed": 0}
        t_start = None
        burst_ends = []
        for i, s in enumerate(odo.stream_frames(prepared, batch=BATCH)):
            if i == warmup - 1:
                t_start = time.time()
                burst_ends.append(t_start)
            elif i >= warmup:
                stats["timed"] += 1
                stats["attempts"] += s.number_of_attempts
                if (i + 1) % BATCH == 0:
                    burst_ends.append(time.time())
            if not s.success:
                stats["failures"] += 1
        bursts = np.diff(burst_ends)
        med_spf = (float(np.median(bursts)) / BATCH if len(bursts)
                   else float("inf"))
        first_gt = frames[0]["begin_pose"]
        errs = [np.linalg.norm(est.end_pose.tr
                               - (first_gt.inverse() * fr["end_pose"]).tr)
                for est, fr in zip(odo.get_trajectory(), frames)]
        return med_spf, float(np.mean(errs)), stats

    med_spf, ape0, stats = run(render(APE_SEEDS[0]), timing=True)
    apes = [ape0]
    for seed in APE_SEEDS[1:]:
        _, a, _ = run(render(seed), timing=False)
        apes.append(a)
    ape = float(np.mean(apes))
    fps = 1.0 / med_spf

    result = {
        "metric": "synthetic_robust_odometry_throughput",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps * ROBUST_BASELINE_SEC_PER_FRAME, 3),
        "sec_per_frame": round(med_spf, 4),
        "frames": stats["timed"],
        "failures": stats["failures"],
        "mean_attempts": round(stats["attempts"] / max(stats["timed"], 1), 3),
        "mean_ape_m": round(ape, 4),
        "ape_per_seed": [round(a, 4) for a in apes],
        "accuracy_ok": bool(ape <= ROBUST_APE_BOUND_M),
        "ape_bound_m": ROBUST_APE_BOUND_M,
    }
    print(json.dumps(result))
    if not result["accuracy_ok"]:
        print(f"ROBUST ACCURACY GATE FAILED: mean APE {ape:.4f} m > "
              f"bound {ROBUST_APE_BOUND_M} m", file=sys.stderr)
        sys.exit(1)


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

    def render(seed):
        acq = syn.SyntheticSensorAcquisition(
            scene, traj,
            syn.SyntheticAcquisitionOptions(
                num_points_per_frame=100_000, frame_duration=0.1,
                max_range=50.0, min_range=2.0, noise_sigma=0.01),
            seed=seed)
        return [acq.frame(i)
                for i in range(min(num_frames, acq.num_frames()))]

    # pre-render frames so host-side scene sampling isn't measured
    frames = render(APE_SEEDS[0])

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
    def seq_ape(o, frs):
        first_gt = frs[0]["begin_pose"]
        es = [np.linalg.norm(est.end_pose.tr
                             - (first_gt.inverse() * fr["end_pose"]).tr)
              for est, fr in zip(o.get_trajectory(), frs)]
        return es

    errs = seq_ape(odo, frames)
    apes = [float(np.mean(errs))]
    # two more realization seeds, accuracy-only (untimed): the gate grades
    # the MEAN across draws, not one lucky realization
    for seed in APE_SEEDS[1:]:
        frs = render(seed)
        o2 = Odometry(default_driving_profile())
        p2 = PrefetchIterator(enumerate(frs), depth=2 * BATCH,
                              transform=lambda item: o2.prepare_frame(
                                  item[1]["xyz"], item[1]["timestamps"],
                                  registered_fid=item[0], frame_id=item[0],
                                  upload=False,
                                  pad_rung=o2.options.max_scan_points),
                              workers=3)
        for _ in o2.stream_frames(p2, batch=BATCH):
            pass
        apes.append(float(np.mean(seq_ape(o2, frs))))
    ape = float(np.mean(apes))

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
        "ape_per_seed": [round(a, 4) for a in apes],
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
    if len(sys.argv) > 1 and sys.argv[1] == "--long":
        run_long()
    elif len(sys.argv) > 1 and sys.argv[1] == "--robust":
        run_robust()
    else:
        main()
