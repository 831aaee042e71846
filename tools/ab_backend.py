"""CT-BA backend A/B on the flagship long-drive workload (VERDICT round-3
task 9): %Tr delta and fps cost of backend.enabled at bench shapes.

Round 5: the backend now composes with batched streaming (the host
keypoint-prefix reconstruction, odometry._host_keypoints), so the
headline variant is on/batch=16. Variants:

  off/batch=16       — the production bench configuration
  on/batch=16        — backend enabled at production batching (round-5)
  off/batch=1        — the old backend-compatible baseline
  on/batch=1         — backend at the round-4 batch=1 constraint
  on+replay/batch=1  — backend with map replay (the traversal failure
                       mode: refine->replay->re-localize feedback)

Frames are pre-rendered once and shared so fps numbers measure the
framework, not the renderer.

  PYTHONPATH=/root/repo python -u tools/ab_backend.py [frames] [seed]
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


_CACHE = {}


def rendered(frames, seed):
    from ct_icp_tpu.config.yaml_config import synthetic_sequence_from_yaml
    key = (frames, seed)
    if key not in _CACHE:
        acq = synthetic_sequence_from_yaml(
            "configs/synthetic_long_drive.yaml", seed=seed).acq
        n = min(frames, acq.num_frames())
        _CACHE.clear()
        _CACHE[key] = [acq.frame(i) for i in range(n)]
    return _CACHE[key]


def run(frames, seed, backend_on, batch, replay=False):
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.evaluation.kitti import evaluate_poses
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    cache = rendered(frames, seed)
    n = (len(cache) // batch) * batch   # whole megasteps (no tail compile)
    opts = default_driving_profile()
    if backend_on:
        opts = dataclasses.replace(
            opts, backend=dataclasses.replace(opts.backend, enabled=True,
                                              replay=replay))
    odo = Odometry(opts)

    def _prepare(i):
        fr = cache[i]
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

    warmup = 2 * batch
    failures = 0
    timed = 0
    t_start = None
    for i, s in enumerate(odo.stream_frames(prep_iter(), batch=batch)):
        if i == warmup - 1:
            t_start = time.time()
        elif i >= warmup:
            timed += 1
        if not s.success:
            failures += 1
    spf = (time.time() - t_start) / max(timed, 1)

    first_gt = begin0[0]
    gt = [first_gt.inverse() * p for p in gt_ends[:len(odo.trajectory)]]
    est = [f.end_pose for f in odo.get_trajectory()]
    err = evaluate_poses(gt, est, driving=True)
    out = {
        "backend": backend_on, "replay": replay, "batch": batch,
        "tr_pct": round(err.mean_rpe, 4),
        "ape_m": round(err.mean_ape, 4),
        "fps": round(1.0 / spf, 2),
        "failures": failures,
    }
    if backend_on and odo.backend is not None:
        out["refinements"] = odo.backend.refinements
    return out


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    for backend_on, batch, replay in ((False, 16, False), (True, 16, False),
                                      (False, 1, False), (True, 1, False),
                                      (True, 1, True)):
        r = run(frames, seed, backend_on, batch, replay)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
