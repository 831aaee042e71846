"""Benchmark gates: the self-proving TPU performance + accuracy artifact.

Default (``python bench.py``, what the driver runs) executes ALL gates and
prints one JSON line per gate:

  driving    — steady-state odometry throughput on a synthetic urban
               corridor, 3-seed mean APE gate + a pinned throughput floor
  robust     — the same corridor through the speculative ROBUST escalation
               path (NCLT-regimen analog), APE gate + throughput floor
  escalation — a yaw jolt that genuinely FAILS robust level 0: proves the
               on-device assessment -> rollback -> per-frame escalation
               replay machinery runs on TPU (attempts > 1, level >= 1)
  indoor     — handheld multi-room walk through the low-inertia profile,
               graded with INDOOR segment lengths (3 seeds)
  long       — 500-frame urban drive graded by KITTI segment-RPE %Tr
               (3 scene-realization seeds) + a wall-clock floor
  backend    — the long-drive workload with the CT-BA sliding-window
               backend ON at production batching: pins the
               beyond-reference accuracy capability (%Tr well under the
               backend-off level) and its zero-fps-cost integration

The process exits nonzero if ANY gate fails either its accuracy bound or
its throughput floor — a regression in either dimension cannot ship green
(the reference's regression harness gates runtime too,
test/regression/regression_run.cxx:145-146).

Baselines: the reference's driving-sequence regression runtimes on CPU,
0.076-0.095 s/frame (BASELINE.md; regression_config_short_drive.yaml)
-> midpoint 0.0855 s/frame = 11.7 frames/s; NCLT robust regimen
0.26 s/frame (regression_config_short_nclt.yaml:22). ``vs_baseline`` is
the speedup over those.

Single gates: ``--driving [N]``, ``--robust [N]``, ``--escalation [N]``,
``--indoor [N]``, ``--long [N]``, ``--backend [N]``.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FRAMES_PER_SEC = 1.0 / 0.0855

# Hard accuracy gate: the driving bench exits nonzero if the MEAN APE over
# three scan-realization seeds exceeds this bound. History: round 2 pinned a
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

# Throughput floors (vs_baseline multiples). A value below the floor exits
# nonzero even when accuracy holds: the TPU story IS the speedup, and a 2x
# throughput regression previously shipped green (round-3 verdict weak #4).
# Pinned 2026-08-21 (round 5, after the compacted-claim insert fix,
# docs/PERF.md): driving measured 11.74x (137.3 fps) / robust 12.83x
# (49.3 fps); floors ratcheted per the round-4 verdict to defend the
# round-5 gains with ~15 % headroom for tunnel jitter.
DRIVING_FLOOR_X = 10.0
ROBUST_FLOOR_X = 11.0

# Long-horizon gate (--long): 500-frame synthetic urban drive graded by
# KITTI segment-RPE %Tr — the metric the reference's regression harness
# actually grades 500-frame drives with
# (test/regression/regression_config_short_drive.yaml:19-48, 0.5-1.0 %Tr).
# Graded as the MEAN over three scan-realization seeds (the same
# de-lucking discipline as the APE gates; round 3 built this gate
# single-seed the very round it learned that lesson). Bound ≤ 0.5 %Tr is
# the BASELINE.md north star (the reference's real-KITTI baselines are
# 0.5-1.0 % on 500-frame drives); reached by adopting
# max_number_neighbors=40 in the driving profile after the round-4
# cross-gate A/B (docs/PARITY.md). Throughput floor: the timed seed must
# sustain the pinned frames/s (median megastep burst, warmup excluded,
# frames pre-rendered). Floor 40: measured sustained rate varies 48-78
# fps across round-4 quiet runs; after the round-5 compacted-claim fix
# the sustained rate measured 58.6 fps, and the median-burst statistic
# already rejects isolated tunnel stalls, so the floor ratchets 40 -> 45
# (round-4 verdict weak #5: defend the gains; 45 catches a ~25 %
# sustained regression while keeping headroom for the residual
# session-to-session spread). The driving/robust floors (10x/11x,
# low-variance 80-frame windows) carry the precise throughput story.
LONG_TR_BOUND_PCT = 0.50
LONG_SEEDS = (7, 8, 9)
LONG_FLOOR_FPS = 45.0
LONG_CONFIG = "configs/synthetic_long_drive.yaml"

# Robust-path gate (--robust): the same corridor scene driven through the
# speculative ROBUST escalation path (the NCLT-regimen analog; reference
# baseline 0.26 s/frame, regression_config_short_nclt.yaml:22). APE bound
# pinned 2026-08-21 post-shuffle: 3-seed mean 0.0503 (seeds
# 0.0486/0.0508/0.0515, deterministic) + ~15 % headroom.
ROBUST_BASELINE_SEC_PER_FRAME = 0.26
ROBUST_APE_BOUND_M = 0.058

# Indoor / low-inertia gate (--indoor): a handheld walk through a
# multi-room interior (tight spaces, doorway turns capped at 50 deg/s =
# 5 deg/frame — a real carrier slows to turn, synthetic.py
# max_yaw_rate_dps; 2.5-degree intra-scan sway, 0.8 m/s cruise) driven
# through the third profile default_robust_outdoor_low_inertia
# (odometry.cpp:92-151) and graded with INDOOR segment lengths {10..80} m
# (SlamCore/eval.cxx:55-60) — NCLT's actual regime. 3 scene-realization
# seeds. Round-5 root cause of the old chaotic 0.87-2.50 per-seed spread:
# the waypoint generator injected 100-250 deg/s heading snaps at the
# diamond vertices (tools/exp_indoor_transient.py) — physically absurd
# for the walking regime the gate documents; with the yaw-rate cap the
# regime matches the intent and the seeds tightened to a near-
# deterministic 1.18/1.18/1.19 (mean 1.186 %Tr, APE 0.0465-0.0475).
# Bound 1.3 keeps ~10 % headroom over a spread of ~0.01 and sits UNDER
# the reference's real-NCLT 1.36 %Tr (regression_config_short_nclt.yaml).
# Throughput: the timed seed is pre-rendered and graded on the median
# megastep burst like the driving gate; floor vs the reference's NCLT
# regimen (0.26 s/frame). Measured 2026-08-22: 9.9 fps = 2.59x at
# batch 4 with LEVEL-1 SPECULATION (the streamer batches turn frames at
# their persistent escalated level instead of draining them per-frame —
# odometry._stream_frames_robust; was 8.0 fps = 2.08x before). The
# remaining cost is genuine level-1 device compute: every turn frame
# legitimately runs the escalated 50-iteration solve. Floor 2.0x
# (ratcheted 1.5 -> 2.0 after two quiet-chip runs at 2.57x/2.59x) defends
# the speculation gain — a regression to the pre-speculation per-frame
# drain (2.08x) now fails the gate — while keeping ~22 % headroom for
# level-transition rollback variance; the faster-than-reference claim
# here is 2.6x, not the driving gate's 11x.
INDOOR_TR_BOUND_PCT = 1.3
INDOOR_APE_BOUND_M = 0.10
INDOOR_FLOOR_X = 2.0
INDOOR_SEEDS = (7, 8, 9)
INDOOR_CONFIG = "configs/synthetic_indoor_walk.yaml"


def run_indoor(num_frames=None):
    """Handheld indoor walk through the low-inertia profile, INDOOR-graded."""
    from ct_icp_tpu.config.options import default_robust_outdoor_low_inertia
    from ct_icp_tpu.config.yaml_config import synthetic_sequence_from_yaml
    from ct_icp_tpu.evaluation.kitti import evaluate_poses
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    num_frames = num_frames or 240
    # batch 4: turn-heavy stretches drain per-frame after a rollback, so a
    # large speculative batch mostly wastes re-dispatched work here
    BATCH = int(os.environ.get("BENCH_BATCH", "4"))
    warmup = 4 * BATCH

    def run(seed, timing=False):
        seq = synthetic_sequence_from_yaml(INDOOR_CONFIG, seed=seed)
        acq = seq.acq
        n = min(num_frames, acq.num_frames())
        if timing:
            n = max(BATCH, (n // BATCH) * BATCH)   # whole megasteps
        odo = Odometry(default_robust_outdoor_low_inertia())
        # timed seed: pre-render so the floor measures the framework, not
        # the synthetic renderer (the round-4 gate's 0.92 wall s/frame was
        # render-starved — the same lesson as the long gate)
        cache = [acq.frame(i) for i in range(n)] if timing else None

        def _prepare(i):
            fr = cache[i] if cache is not None else acq.frame(i)
            prep = odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                     registered_fid=i, frame_id=i,
                                     upload=False,
                                     pad_rung=odo.options.max_scan_points)
            return prep, fr["begin_pose"], fr["end_pose"]

        gt_ends = [None] * n
        begin0 = [None]

        def prep_iter():
            for item in PrefetchIterator(range(n), depth=2 * BATCH,
                                         transform=_prepare, workers=3):
                prep, bp, ep = item
                i = prep["info"].registered_fid
                gt_ends[i] = ep
                if i == 0:
                    begin0[0] = bp
                yield prep

        failures = 0
        attempts = 0
        t_start = None
        timed = 0
        burst_ends = []
        for i, s in enumerate(odo.stream_frames(prep_iter(), batch=BATCH)):
            if timing and i == warmup - 1:
                t_start = time.time()
                burst_ends.append(t_start)
            elif timing and i >= warmup:
                timed += 1
                if (i + 1) % BATCH == 0:
                    burst_ends.append(time.time())
            attempts += s.number_of_attempts
            if not s.success:
                failures += 1
        bursts = np.diff(burst_ends)
        spf = (float(np.median(bursts)) / BATCH
               if (timing and len(bursts)) else float("nan"))
        first_gt = begin0[0]
        gt = [first_gt.inverse() * p for p in gt_ends[:len(odo.trajectory)]]
        est = [f.end_pose for f in odo.get_trajectory()]
        err = evaluate_poses(gt, est, driving=False)   # INDOOR segments
        return err, failures, attempts, len(est), spf

    err0, failures, attempts, frames0, spf = run(INDOOR_SEEDS[0],
                                                 timing=True)
    tr_per_seed = [err0.mean_rpe]
    ape_per_seed = [err0.mean_ape]
    total_failures = failures
    for seed in INDOOR_SEEDS[1:]:
        e, f, _, _, _ = run(seed)
        tr_per_seed.append(e.mean_rpe)
        ape_per_seed.append(e.mean_ape)
        total_failures += f
    mean_tr = float(np.mean(tr_per_seed))
    fps = 1.0 / spf if spf and np.isfinite(spf) else 0.0
    vs = fps * ROBUST_BASELINE_SEC_PER_FRAME   # vs the NCLT 0.26 s/frame
    smoke = not np.isfinite(spf)

    return {
        "metric": "synthetic_indoor_low_inertia_segment_rpe",
        "value": round(mean_tr, 4),
        "unit": "%Tr_indoor",
        "vs_baseline": round(1.36 / max(mean_tr, 1e-9), 3),
        "frames": frames0,
        "failures": total_failures,
        "mean_attempts": round(attempts / max(frames0, 1), 3),
        "tr_per_seed": [round(t, 4) for t in tr_per_seed],
        "mean_ape_m": round(float(np.mean(ape_per_seed)), 4),
        "ape_per_seed": [round(a, 4) for a in ape_per_seed],
        "segments": len(err0.tab_errors),
        "sec_per_frame": round(spf, 4) if not smoke else None,
        "frames_per_sec": round(fps, 2) if not smoke else None,
        "throughput_x": round(vs, 2) if not smoke else None,
        "tr_bound_pct": INDOOR_TR_BOUND_PCT,
        "ape_bound_m": INDOOR_APE_BOUND_M,
        "accuracy_ok": bool(mean_tr <= INDOOR_TR_BOUND_PCT
                            and float(np.mean(ape_per_seed))
                            <= INDOOR_APE_BOUND_M
                            and total_failures == 0),
        "throughput_ok": bool(smoke or vs >= INDOOR_FLOOR_X),
        "floor_x": INDOOR_FLOOR_X,
    }


# Escalation gate (--escalation): two insults in one run.
#
# 1. A yaw jolt — an aggressive S-swerve whose heading rate (~11 deg/
# frame peak) exceeds the robust profile's 5-degree rotation thresholds —
# genuinely fails the level-0 on-device assessment ("Large rotations
# require a robust_level of at least 1", reference AssessRegistration
# odometry.cpp:652-668 + robust_num_attempts_when_rotation), so the
# speculative streamer must roll the map back and replay the batch
# through per-frame escalation ON DEVICE (odometry.cpp:780-852,
# 996-1018). Asserted: attempts > 1 somewhere in the window (the
# rollback+replay) AND the window ran at robust_level >= 1 (frames after
# the first escalation are PRE-escalated via next_robust_level,
# odometry.cpp:890-901, so they legitimately take 1 attempt), and
# tracking survives (post-burst APE).
#
# 2. A SPEED SURGE: the platform lunges 8 -> 14 m/s for a few frames, so
# the within-scan begin->end translation genuinely exceeds
# robust_relative_trans_threshold (1.0 m, odometry.h:102). By the
# reference's own semantics such frames CANNOT pass assessment at any
# level (the rotation rungs only gate level 0, AssessRegistration
# odometry.cpp:621-635), so the per-frame escalation climbs the FULL
# IncreaseRobustnessLevel ladder — sample-voxel shrink, sigma growth,
# +iters (odometry.cpp:996-1018) — executing every deep rung ON DEVICE
# under real timing (round-4 verdict weak #3: depth >= 2 had never run
# on TPU; no RECOVERABLE insult reaches it — sweeps of yaw jolts to
# 120 deg + 10x scan dropout + FOV occlusion all re-converge at level 1,
# tools/exp_esc_depth.py, because the solver out-tracks the assessment's
# plausibility envelope). The solver still registers the surge frames
# correctly (the map fully overlaps), so the committed poses are right,
# exactly the surge frames report failure, nothing is inserted from
# them; the surge is the run's final segment (no tracking claim extends
# past frames that by design cannot pass assessment).
# The gate runs the reference's own robust attempt budget
# (robust_num_attempts=3, regression_config_short_nclt.yaml:
# robust_num_attempts) rather than the driving profile's 10: burning 10
# attempts multiplies ls_sigma by 1.2^9 and max_dist_to_plane by 1.5^9
# (~19 m) — the deep rungs then ADMIT garbage associations and a 6-frame
# surge measurably diverges (post-APE 3.1 m, first A/B of this gate);
# at the reference's budget the ladder still reaches level 2 on every
# super-threshold frame while the options stay sane. Asserted: >= 2
# frames burned ALL attempts, the ladder reached robust_level >= 2, the
# exhausted frames cluster at the surge, and post-surge APE holds.
#
# Pinned 2026-08-22 (round 5, deterministic): burst attempts 1.167 /
# level 1.0; exhausted frames 35-40 at attempts 3 / max level 3;
# post-surge APE ~0.05 m.
ESC_BURST = (18, 24)          # [first, last) jolt frame indices
ESC_YAW_AMP_DEG = 45.0        # look-around ramp over the jolt window
ESC_SURGE = (40, 48)          # [first, last) speed-surge frame indices
ESC_SURGE_SPEED = 14.0        # m/s inside the surge (cruise 8)
ESC_POST_APE_BOUND_M = 0.15
ESC_MIN_BURST_ATTEMPTS = 1.1  # mean attempts over the jolt window
ESC_MIN_BURST_LEVEL = 0.7     # mean robust_level over the jolt window
ESC_MIN_GAP_LEVEL = 2         # the deep-ladder assertion
ESC_MIN_EXHAUSTED_FRAMES = 2  # frames that must climb the full ladder


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


def render_corridor(scene, traj, num_frames, seed, max_range=50.0):
    from ct_icp_tpu.datasets import synthetic as syn

    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(
            num_points_per_frame=100_000, frame_duration=0.1,
            max_range=max_range, min_range=2.0, noise_sigma=0.01),
        seed=seed)
    return [acq.frame(i) for i in range(min(num_frames, acq.num_frames()))]


def seq_ape(odo, frames):
    """Per-frame end-pose translation errors vs GT (estimate starts at GT
    frame 0: conjugate GT into the estimate frame)."""
    first_gt = frames[0]["begin_pose"]
    return [np.linalg.norm(est.end_pose.tr
                           - (first_gt.inverse() * fr["end_pose"]).tr)
            for est, fr in zip(odo.get_trajectory(), frames)]


def emit(result) -> bool:
    """Print the gate's JSON line; report failures on stderr."""
    print(json.dumps(result), flush=True)
    ok = True
    if not result.get("accuracy_ok", True):
        print(f"{result['metric']}: ACCURACY GATE FAILED", file=sys.stderr)
        ok = False
    if not result.get("throughput_ok", True):
        fps = result.get("frames_per_sec") or result.get("value")
        floor = (result.get("floor_fps") or result.get("floor_x")
                 or result.get("tr_bound_pct"))
        print(f"{result['metric']}: THROUGHPUT FLOOR FAILED "
              f"({fps} < floor {floor})", file=sys.stderr)
        ok = False
    return ok


def run_driving(num_frames=None):
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    # 80 frames = 3 timed megastep bursts after the 2-burst warmup (enough
    # for the median to reject one tunnel stall; the APE bound is pinned to
    # this exact horizon — changing the count re-pins the gate)
    num_frames = num_frames or 80
    scene = build_scene()
    traj = straight_trajectory(400, num_frames * 0.1 + 0.5)
    frames = render_corridor(scene, traj, num_frames, APE_SEEDS[0])

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

    errs = seq_ape(odo, frames)
    apes = [float(np.mean(errs))]
    # two more realization seeds, accuracy-only (untimed): the gate grades
    # the MEAN across draws, not one lucky realization
    for seed in APE_SEEDS[1:]:
        frs = render_corridor(scene, traj, num_frames, seed)
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

    vs = fps / BASELINE_FRAMES_PER_SEC
    # smoke mode: fewer frames than the warmup window leaves nothing to
    # time — report accuracy only, never a vacuous 0-fps floor failure
    smoke = timed == 0
    return {
        "metric": "synthetic_driving_odometry_throughput",
        "value": round(fps, 3) if not smoke else None,
        "unit": "frames/s",
        "vs_baseline": round(vs, 3) if not smoke else None,
        "sec_per_frame": round(med_spf, 4) if not smoke else None,
        "wall_sec_per_frame": (round(sec_per_frame, 4)
                               if not smoke else None),
        "frames": timed,
        "failures": failures,
        "map_points": odo.map_size(),
        "mean_ape_m": round(ape, 4),
        "ape_per_seed": [round(a, 4) for a in apes],
        "final_drift_m": round(float(errs[-1]), 4) if errs else None,
        "accuracy_ok": bool(ape <= APE_BOUND_M and failures == 0),
        "ape_bound_m": APE_BOUND_M,
        "throughput_ok": bool(smoke or vs >= DRIVING_FLOOR_X),
        "floor_x": DRIVING_FLOOR_X,
    }


def run_robust(num_frames=None):
    """Robust-escalation throughput + accuracy."""
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    num_frames = num_frames or 80
    scene = build_scene()
    # cruise below 1 m/frame: the reference robust profile REJECTS frames
    # whose begin->end translation exceeds robust_relative_trans_threshold
    # (1.0 m, odometry.h:102) and burns all attempts on them — benching
    # inside that regime measures threshold thrash, not throughput (the
    # escalation gate covers the failing regime)
    traj = straight_trajectory(400, num_frames * 0.1 + 0.5, speed=8.0)

    BATCH = int(os.environ.get("BENCH_BATCH", "8"))
    warmup = 2 * BATCH

    def run(frames):
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
        return med_spf, float(np.mean(seq_ape(odo, frames))), stats

    med_spf, ape0, stats = run(
        render_corridor(scene, traj, num_frames, APE_SEEDS[0]))
    apes = [ape0]
    for seed in APE_SEEDS[1:]:
        _, a, _ = run(render_corridor(scene, traj, num_frames, seed))
        apes.append(a)
    ape = float(np.mean(apes))
    fps = 1.0 / med_spf

    vs = fps * ROBUST_BASELINE_SEC_PER_FRAME
    smoke = stats["timed"] == 0
    return {
        "metric": "synthetic_robust_odometry_throughput",
        "value": round(fps, 3) if not smoke else None,
        "unit": "frames/s",
        "vs_baseline": round(vs, 3) if not smoke else None,
        "sec_per_frame": round(med_spf, 4) if not smoke else None,
        "frames": stats["timed"],
        "failures": stats["failures"],
        "mean_attempts": round(stats["attempts"] / max(stats["timed"], 1), 3),
        "mean_ape_m": round(ape, 4),
        "ape_per_seed": [round(a, 4) for a in apes],
        "accuracy_ok": bool(ape <= ROBUST_APE_BOUND_M),
        "ape_bound_m": ROBUST_APE_BOUND_M,
        "throughput_ok": bool(smoke or vs >= ROBUST_FLOOR_X),
        "floor_x": ROBUST_FLOOR_X,
    }


def _jolt_trajectory(num_poses, total_time, burst_t0, burst_t1,
                     speed=8.0, accel=2.5, amp_deg=ESC_YAW_AMP_DEG,
                     surge_t0=None, surge_t1=None, surge_speed=14.0):
    """straight_trajectory + an S-swerve yaw jolt inside [t0, t1] (heading
    swings +amp over the window while the position stays on the corridor
    line — a violent steering correction with the scene fully visible) +
    an optional SPEED SURGE inside [surge_t0, surge_t1] (the platform
    lunges to surge_speed so the within-scan translation exceeds the
    robust plausibility threshold — see the escalation gate docstring)."""
    from ct_icp_tpu.core import se3_np as s3n
    from ct_icp_tpu.core.pose import Pose
    from ct_icp_tpu.core.trajectory import LinearContinuousTrajectory

    amp = np.deg2rad(amp_deg)
    ts = np.linspace(0.0, total_time, num_poses)
    v = np.minimum(accel * ts, speed)        # standstill ramp
    if surge_t0 is not None:
        ramp = 0.2                            # s to reach surge speed
        up = np.clip((ts - surge_t0) / ramp, 0.0, 1.0)
        down = np.clip((surge_t1 - ts) / ramp, 0.0, 1.0)
        boost = (surge_speed - speed) * np.minimum(up, down)
        # only inside the window — a bare max(v, speed + boost) would
        # floor v at cruise speed EVERYWHERE and erase the standstill ramp
        v = np.where(boost > 0.0, np.maximum(v, speed + boost), v)
    x = np.concatenate([[0.0], np.cumsum(0.5 * (v[1:] + v[:-1])
                                         * np.diff(ts))])
    poses = []
    for i in range(num_poses):
        t = ts[i]
        yaw = 0.08 * np.sin(0.5 * t)
        # constant-rate look-around ramp: every frame inside the window
        # sees the same super-threshold heading rate (a sine swerve only
        # trips the check near its peak slope)
        frac = np.clip((t - burst_t0) / (burst_t1 - burst_t0), 0.0, 1.0)
        yaw += amp * frac
        q = s3n.quat_from_rotvec(np.array([0.0, 0.0, yaw]))
        poses.append(Pose(q, np.array([x[i], 0.3 * np.sin(0.2 * t), 1.7]),
                          timestamp=t))
    return LinearContinuousTrajectory(poses)


def run_escalation(num_frames=None):
    """Yaw-jolt scenario through the robust path: the jolt frames trip the
    rotation thresholds of the level-0 on-device assessment and force the
    speculative streamer's rollback + per-frame escalation replay
    (odometry._stream_frames_robust) to actually run on the device."""
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    num_frames = num_frames or 48
    scene = build_scene()
    b0, b1 = ESC_BURST
    s0, s1 = ESC_SURGE
    # the surge only enters when the horizon reaches it (smoke runs skip);
    # it is the FINAL segment of the run: frames inside it are the
    # reference's documented thrash regime (every attempt fails the
    # plausibility bound BY DESIGN), so no tracking claim extends past it
    surge = num_frames >= s1
    traj = _jolt_trajectory(
        400, num_frames * 0.1 + 0.5,
        burst_t0=b0 * 0.1, burst_t1=b1 * 0.1, amp_deg=ESC_YAW_AMP_DEG,
        surge_t0=s0 * 0.1 if surge else None,
        surge_t1=s1 * 0.1 if surge else None,
        surge_speed=ESC_SURGE_SPEED)
    frames = render_corridor(scene, traj, num_frames, APE_SEEDS[0])

    import dataclasses as _dc
    odo = Odometry(_dc.replace(robust_driving_profile(),
                               robust_num_attempts=3))
    BATCH = int(os.environ.get("BENCH_BATCH", "8"))

    def _prepare(item):
        i, fr = item
        return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)

    prepared = PrefetchIterator(enumerate(frames), depth=2 * BATCH,
                                transform=_prepare, workers=3)
    attempts = []
    levels = []
    failures = 0
    t0 = time.time()
    for s in odo.stream_frames(prepared, batch=BATCH):
        attempts.append(s.number_of_attempts)
        levels.append(s.robust_level)
        if not s.success:
            failures += 1
    wall = time.time() - t0

    errs = seq_ape(odo, frames)
    burst_attempts = attempts[b0:b1]
    burst_levels = levels[b0:b1]
    # tracking is asserted through the recoverable jolt up to the surge
    post_errs = errs[b1 + 4:(s0 - 1 if surge else len(errs))]
    mean_burst_attempts = float(np.mean(burst_attempts))
    mean_burst_level = float(np.mean(burst_levels))
    post_ape = float(np.mean(post_errs)) if post_errs else float("inf")

    # number_of_attempts counts attempts made NOW; a frame pre-escalated
    # by next_robust_level (reference odometry.cpp:890-901) runs at level
    # >= 1 with ONE attempt — both signals together prove the machinery:
    # rollback + escalation happened (attempts > 1 somewhere) AND the
    # burst ran escalated (mean robust_level)
    machinery_ran = (mean_burst_attempts >= ESC_MIN_BURST_ATTEMPTS
                     and mean_burst_level >= ESC_MIN_BURST_LEVEL)
    recovered = post_ape <= ESC_POST_APE_BOUND_M
    # speed-surge deep-ladder assertions (see gate docstring): the
    # super-threshold frames must climb the FULL ladder on device, reach
    # level >= ESC_MIN_GAP_LEVEL, and be the run's only failures
    exhausted = [i for i, a in enumerate(attempts)
                 if a >= odo.options.robust_num_attempts]
    if surge:
        surge_ok = (len(exhausted) >= ESC_MIN_EXHAUSTED_FRAMES
                    and all(i >= s0 - 1 for i in exhausted)
                    and max(levels) >= ESC_MIN_GAP_LEVEL)
    else:
        surge_ok = True
    return {
        "metric": "synthetic_robust_escalation_recovery",
        "value": round(post_ape, 4),
        "unit": "m_post_burst_ape",
        "vs_baseline": round(mean_burst_attempts, 3),
        "frames": len(errs),
        "failures": failures,
        "mean_burst_attempts": round(mean_burst_attempts, 3),
        "mean_burst_level": round(mean_burst_level, 3),
        "max_attempts": int(max(attempts)) if attempts else 0,
        "max_level": int(max(levels)) if levels else 0,
        "burst_frames": [b0, b1],
        "surge_frames": [s0, s1] if surge else None,
        "exhausted_frames": exhausted,
        "wall_sec_per_frame": round(wall / max(len(errs), 1), 4),
        "mean_ape_m": round(float(np.mean(errs)), 4),
        "accuracy_ok": bool(machinery_ran and recovered and surge_ok),
        "post_ape_bound_m": ESC_POST_APE_BOUND_M,
        "min_burst_attempts": ESC_MIN_BURST_ATTEMPTS,
        "min_burst_level": ESC_MIN_BURST_LEVEL,
        "min_gap_level": ESC_MIN_GAP_LEVEL,
    }


def run_long(num_frames=None):
    """500-frame drive, 3 scene-realization seeds; %Tr + wall floor."""
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.config.yaml_config import synthetic_sequence_from_yaml
    from ct_icp_tpu.evaluation.kitti import evaluate_poses
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    num_frames = num_frames or 500
    BATCH = int(os.environ.get("BENCH_BATCH", "16"))
    warmup = 2 * BATCH

    def run(seed, timing):
        seq = synthetic_sequence_from_yaml(LONG_CONFIG, seed=seed)
        acq = seq.acq
        n = min(num_frames, acq.num_frames())
        # whole megasteps only: a partial tail batch compiles a SECOND
        # multi-step program (~47 s) — inside the timed window it would
        # report the XLA compiler, not the framework
        n = max(BATCH, (n // BATCH) * BATCH)
        odo = Odometry(default_driving_profile())

        # TIMED seed: pre-render the whole sequence so the floor measures
        # the framework (prep workers + device), not the synthetic
        # renderer — in-worker rendering (~150 ms/frame of numpy under the
        # GIL) starves the pipeline to ~4 fps and would gate the scene
        # generator instead. Accuracy-only seeds render in the workers
        # (wall time irrelevant there).
        cache = [acq.frame(i) for i in range(n)] if timing else None

        def _prepare(i):
            fr = cache[i] if cache is not None else acq.frame(i)
            prep = odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                     registered_fid=i, frame_id=i,
                                     upload=False,
                                     pad_rung=odo.options.max_scan_points)
            return prep, fr["begin_pose"], fr["end_pose"]

        gt_ends = [None] * n
        begin0 = [None]

        def prep_iter():
            for item in PrefetchIterator(range(n), depth=2 * BATCH,
                                         transform=_prepare, workers=3):
                prep, bp, ep = item
                i = prep["info"].registered_fid
                gt_ends[i] = ep
                if i == 0:
                    begin0[0] = bp
                yield prep

        failures = 0
        t_start = None
        timed = 0
        burst_ends = []
        for i, s in enumerate(odo.stream_frames(prep_iter(), batch=BATCH)):
            if i == warmup - 1:
                t_start = time.time()
                burst_ends.append(t_start)
            elif i >= warmup:
                timed += 1
                if (i + 1) % BATCH == 0:
                    burst_ends.append(time.time())
            if not s.success:
                failures += 1
        # MEDIAN per-megastep frame time, like the driving gate: the tunnel
        # occasionally wedges for seconds (docs/PERF.md), and over a 30-burst
        # window a couple of stalls shift the MEAN by 30-50 % — the median
        # measures the sustained rate the floor is pinned against
        bursts = np.diff(burst_ends)
        spf = (float(np.median(bursts)) / BATCH
               if (timing and len(bursts)) else float("nan"))
        wall_spf = ((time.time() - t_start) / timed
                    if (timing and timed) else float("nan"))

        first_gt = begin0[0]
        gt = [first_gt.inverse() * p for p in gt_ends[:len(odo.trajectory)]]
        est = [f.end_pose for f in odo.get_trajectory()]
        err = evaluate_poses(gt, est, driving=True)
        return err, failures, spf, wall_spf, len(est)

    err0, failures, spf, wall_spf, frames0 = run(LONG_SEEDS[0], timing=True)
    tr_per_seed = [err0.mean_rpe]
    ape_per_seed = [err0.mean_ape]
    total_failures = failures
    for seed in LONG_SEEDS[1:]:
        e, f, _, _, _ = run(seed, timing=False)
        tr_per_seed.append(e.mean_rpe)
        ape_per_seed.append(e.mean_ape)
        total_failures += f
    mean_tr = float(np.mean(tr_per_seed))
    fps = 1.0 / spf if spf and np.isfinite(spf) else 0.0

    # failure accounting mirrors the fast gates: scattered frame failures
    # must not hide behind surviving segments that still grade well
    return {
        "metric": "synthetic_long_drive_segment_rpe",
        "value": round(mean_tr, 4),
        "unit": "%Tr",
        "vs_baseline": round(1.0 / max(mean_tr, 1e-9), 3),
        "frames": frames0,
        "failures": total_failures,
        "tr_per_seed": [round(t, 4) for t in tr_per_seed],
        "sec_per_frame": round(spf, 4) if np.isfinite(spf) else None,
        "wall_sec_per_frame": (round(wall_spf, 4)
                               if np.isfinite(wall_spf) else None),
        "frames_per_sec": round(fps, 2),
        "mean_ape_m": round(float(np.mean(ape_per_seed)), 4),
        "ape_per_seed": [round(a, 4) for a in ape_per_seed],
        "segments": len(err0.tab_errors),
        "tr_bound_pct": LONG_TR_BOUND_PCT,
        "accuracy_ok": bool(mean_tr <= LONG_TR_BOUND_PCT
                            and total_failures == 0),
        "throughput_ok": bool(fps >= LONG_FLOOR_FPS),
        "floor_fps": LONG_FLOOR_FPS,
    }


# Backend gate (--backend): the long-drive workload with the CT-BA
# sliding-window backend ON at production batching (batch=16) — the repo's
# headline beyond-reference capability (the reference has no backend), made
# gate-visible per the round-4 verdict (weak #6: 0.372 %Tr existed only in
# a tools/ table and could regress silently). Round 5 made it production-
# speed: the megastep's keypoints are reconstructed on host
# (odometry._host_keypoints) and refinements apply DEFERRED (one packed
# readback a period later, no pipeline stall) — measured backend-on fps ==
# backend-off fps, %Tr 0.354-0.374 vs 0.450-0.459 off (tools/ab_backend.py,
# 320/500 frames). Bound 0.42: the measured backend-on %Tr + headroom,
# UNDER the backend-off level (~0.46) — the gate fails if refinement stops
# helping — and under the 0.5 north star. Floor: same machinery as the
# long gate (median burst, pre-rendered frames); backend-on costs ~0 fps,
# so the long gate's floor class applies. Measured 2026-08-22: 0.341 %Tr
# at 45.7 fps (40 refinements over 320 frames; backend-off long gate ran
# 58.6 fps the same hour — the ~4.8 ms/frame delta is the refine's
# device work riding the queue). Floor 40 (ratcheted 35 -> 40 after
# quiet-chip runs at 45.7/52.2/48.4 fps): the accuracy bound is this
# gate's primary pin, but the floor must at least reject a relapse into
# the round-4 synchronous refine (8.1 fps) or a pipeline stall that eats
# a third of the rate; the precise throughput story lives in the
# driving/robust/long gates, and a one-run A/B against the long gate is
# the right tool for backend-cost regressions.
BACKEND_TR_BOUND_PCT = 0.42
BACKEND_FLOOR_FPS = 40.0
BACKEND_FRAMES = 320
BACKEND_SEED = 7


def run_backend(num_frames=None):
    """Long-drive with backend.enabled at batch=16 (single timed seed)."""
    import dataclasses
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.config.yaml_config import synthetic_sequence_from_yaml
    from ct_icp_tpu.evaluation.kitti import evaluate_poses
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    num_frames = num_frames or BACKEND_FRAMES
    BATCH = int(os.environ.get("BENCH_BATCH", "16"))
    warmup = 2 * BATCH

    seq = synthetic_sequence_from_yaml(LONG_CONFIG, seed=BACKEND_SEED)
    acq = seq.acq
    n = min(num_frames, acq.num_frames())
    n = max(BATCH, (n // BATCH) * BATCH)
    opts = default_driving_profile()
    opts = dataclasses.replace(
        opts, backend=dataclasses.replace(opts.backend, enabled=True))
    odo = Odometry(opts)
    cache = [acq.frame(i) for i in range(n)]   # pre-render (see run_long)

    def _prepare(i):
        fr = cache[i]
        prep = odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)
        return prep, fr["begin_pose"], fr["end_pose"]

    gt_ends = [None] * n
    begin0 = [None]

    def prep_iter():
        for item in PrefetchIterator(range(n), depth=2 * BATCH,
                                     transform=_prepare, workers=3):
            prep, bp, ep = item
            i = prep["info"].registered_fid
            gt_ends[i] = ep
            if i == 0:
                begin0[0] = bp
            yield prep

    failures = 0
    t_start = None
    timed = 0
    burst_ends = []
    for i, s in enumerate(odo.stream_frames(prep_iter(), batch=BATCH)):
        if i == warmup - 1:
            t_start = time.time()
            burst_ends.append(t_start)
        elif i >= warmup:
            timed += 1
            if (i + 1) % BATCH == 0:
                burst_ends.append(time.time())
        if not s.success:
            failures += 1
    bursts = np.diff(burst_ends)
    spf = float(np.median(bursts)) / BATCH if len(bursts) else float("nan")
    fps = 1.0 / spf if np.isfinite(spf) else 0.0

    first_gt = begin0[0]
    gt = [first_gt.inverse() * p for p in gt_ends[:len(odo.trajectory)]]
    est = [f.end_pose for f in odo.get_trajectory()]   # flushes the backend
    err = evaluate_poses(gt, est, driving=True)
    refinements = odo.backend.refinements if odo.backend else 0
    smoke = timed == 0
    return {
        "metric": "synthetic_backend_long_drive_segment_rpe",
        "value": round(err.mean_rpe, 4),
        "unit": "%Tr",
        "vs_baseline": round(1.0 / max(err.mean_rpe, 1e-9), 3),
        "frames": len(est),
        "failures": failures,
        "refinements": refinements,
        "mean_ape_m": round(err.mean_ape, 4),
        "sec_per_frame": round(spf, 4) if not smoke else None,
        "frames_per_sec": round(fps, 2) if not smoke else None,
        "tr_bound_pct": BACKEND_TR_BOUND_PCT,
        "accuracy_ok": bool(err.mean_rpe <= BACKEND_TR_BOUND_PCT
                            and failures == 0 and refinements > 0),
        "throughput_ok": bool(smoke or fps >= BACKEND_FLOOR_FPS),
        "floor_fps": BACKEND_FLOOR_FPS,
    }


GATES = {
    "--driving": run_driving,
    "--robust": run_robust,
    "--escalation": run_escalation,
    "--indoor": run_indoor,
    "--long": run_long,
    "--backend": run_backend,
}


def main():
    args = sys.argv[1:]
    if args and args[0] in GATES:
        n = int(args[1]) if len(args) > 1 else None
        ok = emit(GATES[args[0]](n))
        sys.exit(0 if ok else 1)
    # default: ALL gates, one JSON line each, nonzero exit if any fails —
    # the driver's BENCH artifact is self-proving (round-3 verdict task 2)
    n = int(args[0]) if args else None
    ok = True
    results = {}
    for flag in ("--driving", "--robust", "--escalation", "--indoor",
                 "--long", "--backend"):
        r = GATES[flag](n if flag == "--driving" else None)
        results[flag.lstrip("-")] = r
        ok = emit(r) and ok
    # canonical summary as the LAST line (what a tail-parser reads):
    # headline = the driving gate, with every gate's verdict embedded
    d = results["driving"]
    print(json.dumps({
        "metric": "six_gate_summary",
        "value": d["value"], "unit": "frames/s",
        "vs_baseline": d["vs_baseline"],
        "gates_green": sum(
            1 for r in results.values()
            if r.get("accuracy_ok", True) and r.get("throughput_ok", True)),
        "gates_total": len(results),
        "driving_ape_m": d["mean_ape_m"],
        "robust_vs_baseline": results["robust"]["vs_baseline"],
        "robust_ape_m": results["robust"]["mean_ape_m"],
        "escalation_ok": results["escalation"]["accuracy_ok"],
        "indoor_tr_pct": results["indoor"]["value"],
        "indoor_x": results["indoor"].get("throughput_x"),
        "long_tr_pct": results["long"]["value"],
        "long_fps": results["long"]["frames_per_sec"],
        "backend_tr_pct": results["backend"]["value"],
        "backend_fps": results["backend"]["frames_per_sec"],
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
