"""Find an insult that genuinely fails robust level 1 so the deeper
IncreaseRobustnessLevel rungs (sample-voxel shrink, sigma growth, +iters —
reference odometry.cpp:996-1018) execute on TPU (round-4 verdict weak #3:
escalation proven only at depth 1).

Scenario: the bench corridor's yaw jolt (bench.ESC_BURST) PLUS a scan
degradation during the burst — azimuth field-of-view restriction and/or
point dropout — so the level-1 retry still breaches the assessment
thresholds and escalates to level >= 2. Prints per-frame attempts/levels/
APE around the burst for parameter sweeps.

  PYTHONPATH=/root/repo python -u tools/exp_esc_depth.py [fov_deg] [keep_frac] [amp_deg]
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def degrade(fr, rng, fov_deg, keep_frac):
    """Restrict azimuth FOV to +-fov_deg/2 (about +x) and keep keep_frac
    of the remaining points."""
    xyz = fr["xyz"]
    az = np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0]))
    keep = np.abs(az) <= fov_deg / 2
    idx = np.nonzero(keep)[0]
    if keep_frac < 1.0:
        idx = rng.choice(idx, max(int(len(idx) * keep_frac), 500),
                         replace=False)
        idx.sort()
    return {**fr, "xyz": xyz[idx], "timestamps": fr["timestamps"][idx]}


def main():
    fov = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    keep = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    amp = float(sys.argv[3]) if len(sys.argv) > 3 else 45.0
    import bench
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    num_frames = 48
    b0, b1 = bench.ESC_BURST
    scene = bench.build_scene()
    traj = bench._jolt_trajectory(400, num_frames * 0.1 + 0.5,
                                  burst_t0=b0 * 0.1, burst_t1=b1 * 0.1,
                                  amp_deg=amp)
    frames = bench.render_corridor(scene, traj, num_frames, bench.APE_SEEDS[0])
    rng = np.random.default_rng(0)
    for i in range(b0, b1):
        frames[i] = degrade(frames[i], rng, fov, keep)

    odo = Odometry(robust_driving_profile())

    def _prepare(item):
        i, fr = item
        return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)

    prepared = PrefetchIterator(enumerate(frames), depth=16,
                                transform=_prepare, workers=3)
    rows = []
    for s in odo.stream_frames(prepared, batch=8):
        rows.append((s.number_of_attempts, s.robust_level, int(s.success),
                     s.number_of_residuals))
    errs = bench.seq_ape(odo, frames)
    for i in range(b0 - 2, min(len(rows), b1 + 6)):
        r = rows[i]
        print(f"  f{i:2d} att={r[0]} lvl={r[1]} ok={r[2]} nres={r[3]:4d} "
              f"ape={errs[i]:.3f}", flush=True)
    burst = rows[b0:b1]
    post = errs[b1 + 4:]
    print(json.dumps({
        "fov": fov, "keep": keep, "amp": amp,
        "max_level": max(r[1] for r in rows),
        "max_attempts": max(r[0] for r in rows),
        "mean_burst_attempts": round(np.mean([r[0] for r in burst]), 3),
        "mean_burst_level": round(np.mean([r[1] for r in burst]), 3),
        "failures": sum(1 for r in rows if not r[2]),
        "post_ape": round(float(np.mean(post)), 4) if post else None,
    }), flush=True)


if __name__ == "__main__":
    main()
