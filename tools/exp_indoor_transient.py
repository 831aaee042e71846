"""Root-cause the indoor doorway-turn transient (round-4 verdict weak #2:
seeds swing 0.87-2.50 %Tr from ~1 m transients at doorway turns that
recover — a symptom to attribute, not a bound to widen).

Per-frame trace of the indoor walk through the low-inertia profile:
APE vs GT, attempts, robust_level, GT yaw rate, estimated-vs-GT relative
rotation, n_res, outer iterations. Prints the worst-APE windows with
context so the failing frames' regime (yaw rate, residual count, attempt
pattern) is visible, plus per-seed segment-RPE.

  PYTHONPATH=/root/repo python -u tools/exp_indoor_transient.py [seed ...]

Knob overrides for A/B (env):
  IND_SAMPLE_VOXEL=1.0     sample_voxel_size override
  IND_REL_ORI=2.0          robust_threshold_relative_orientation
  IND_REGATHER=2           ct_icp regather_iters
  IND_ITERS=30             num_iters_icp
  IND_VOXEL=0.3            scan subsample voxel
  IND_BATCH=4
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def run_seed(seed):
    import dataclasses
    from ct_icp_tpu.config.options import default_robust_outdoor_low_inertia
    from ct_icp_tpu.config.yaml_config import synthetic_sequence_from_yaml
    from ct_icp_tpu.evaluation.kitti import evaluate_poses
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.core import se3_np as s3n

    num_frames = int(os.environ.get("IND_FRAMES", "240"))
    batch = int(os.environ.get("IND_BATCH", "4"))
    seq = synthetic_sequence_from_yaml("configs/synthetic_indoor_walk.yaml",
                                       seed=seed)
    acq = seq.acq
    n = min(num_frames, acq.num_frames())
    opts = default_robust_outdoor_low_inertia()
    if os.environ.get("IND_SAMPLE_VOXEL"):
        opts = dataclasses.replace(
            opts, sample_voxel_size=float(os.environ["IND_SAMPLE_VOXEL"]))
    if os.environ.get("IND_VOXEL"):
        opts = dataclasses.replace(
            opts, voxel_size=float(os.environ["IND_VOXEL"]))
    if os.environ.get("IND_REL_ORI"):
        v = float(os.environ["IND_REL_ORI"])
        opts = dataclasses.replace(
            opts, robust_threshold_relative_orientation=v,
            robust_threshold_ego_orientation=v)
    icp = opts.ct_icp_options
    if os.environ.get("IND_REGATHER"):
        icp = dataclasses.replace(
            icp, regather_iters=int(os.environ["IND_REGATHER"]))
    if os.environ.get("IND_ITERS"):
        icp = dataclasses.replace(
            icp, num_iters_icp=int(os.environ["IND_ITERS"]))
    if icp is not opts.ct_icp_options:
        opts = dataclasses.replace(opts, ct_icp_options=icp)

    odo = Odometry(opts)

    def _prepare(i):
        fr = acq.frame(i)
        prep = odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)
        return prep, fr["begin_pose"], fr["end_pose"]

    gt_ends = [None] * n
    begin0 = [None]

    def prep_iter():
        for item in PrefetchIterator(range(n), depth=2 * batch,
                                     transform=_prepare, workers=3):
            prep, bp, ep = item
            i = prep["info"].registered_fid
            gt_ends[i] = ep
            if i == 0:
                begin0[0] = bp
            yield prep

    rows = []
    for s in odo.stream_frames(prep_iter(), batch=batch):
        rows.append((s.number_of_attempts, s.robust_level, int(s.success),
                     s.number_of_residuals, s.icp_summary.num_iters,
                     s.relative_orientation, s.ego_orientation))

    first_gt = begin0[0]
    gt = [first_gt.inverse() * p for p in gt_ends[:len(odo.trajectory)]]
    est = [f.end_pose for f in odo.get_trajectory()]
    err = evaluate_poses(gt, est, driving=False)
    apes = [float(np.linalg.norm(e.tr - g.tr)) for e, g in zip(est, gt)]
    # GT yaw rate per frame (deg/frame, end-to-end)
    yaw = []
    for i in range(len(gt)):
        if i == 0:
            yaw.append(0.0)
        else:
            yaw.append(gt[i - 1].angular_distance(gt[i]))

    print(json.dumps({"seed": seed, "tr_pct": round(err.mean_rpe, 4),
                      "ape_mean": round(float(np.mean(apes)), 4),
                      "ape_max": round(float(np.max(apes)), 4),
                      "failures": sum(1 for r in rows if not r[2]),
                      "attempts_mean": round(np.mean([r[0] for r in rows]), 3),
                      }), flush=True)
    worst = np.argsort(apes)[::-1][:6]
    shown = set()
    for w in sorted(worst):
        if any(abs(w - s) <= 3 for s in shown):
            continue
        shown.add(w)
        for i in range(max(0, w - 4), min(len(apes), w + 5)):
            r = rows[i]
            print(f"  f{i:3d} ape={apes[i]:.3f} yawgt={yaw[i]:5.2f} "
                  f"att={r[0]} lvl={r[1]} ok={r[2]} nres={r[3]:4d} "
                  f"it={r[4]:2d} rel_or={r[5]:5.2f} ego={r[6]:5.2f}",
                  flush=True)
        print("  ---")
    return err.mean_rpe


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [7, 8, 9]
    trs = [run_seed(s) for s in seeds]
    print(json.dumps({"mean_tr": round(float(np.mean(trs)), 4),
                      "per_seed": [round(t, 4) for t in trs]}), flush=True)


if __name__ == "__main__":
    main()
