"""In-situ ablation decomposition of the driving megastep (round-4 verdict
weak #1: the ~2 ms/frame "unattributable megastep residue" must become a
measured decomposition, not an assertion).

Method: run the PRODUCTION streaming odometry (driving profile, batch=16)
over the bench corridor to a warm steady state, snapshot (map, odo) device
state, and capture the next R batches' exact stacked inputs (scans, ns,
dyns, fss). Then, for each ablation variant of the SAME megastep program
(pipeline.make_multi_step_fn(ablate=...)), replay the captured window from
a device copy of the snapshot and time the dependent chain
  copy -> megastep(B0) -> ... -> megastep(B_{R-1}) -> readback
with the copy's own time measured separately and subtracted. Every variant
sees identical inputs and identical warm-map occupancy; deltas between
variants are the in-situ cost of the removed stage INCLUDING its share of
scan-carry selects and fusion effects — what the staged fori-loop stage
truths (tools/profile_stage_loops.py) cannot see.

Variants:
  full                      production program
  no_insert                 insert ladder + prune removed
  no_solver                 registration passthrough (gather+rescore+LM out)
  no_solver,no_insert       both removed
  no_insert,no_carry        map NOT threaded through the lax.scan carry
  no_solver,no_insert,no_carry  the scan-machinery floor
plus dynamic-knob points on the full program (num_iters_icp=1,
ls_max_num_iters=1) for the per-outer/inner-iteration cost.

  PYTHONPATH=/root/repo python -u tools/ablate_megastep.py [reps]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

BATCH = 16
WARM_FRAMES = 3 * BATCH    # production warmup to steady state
WINDOW_BATCHES = 2         # replayed window (32 frames: keeps map overlap)


def build_inputs():
    """Warm production state + captured next-window inputs."""
    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.odometry.odometry import Odometry, PRUNE_PERIOD

    total = WARM_FRAMES + WINDOW_BATCHES * BATCH
    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, total * 0.1 + 0.5)
    frames = bench.render_corridor(scene, traj, total, 3)

    odo = Odometry(default_driving_profile())
    o = odo.options
    preps = [odo.prepare_frame(fr["xyz"], fr["timestamps"], registered_fid=i,
                               frame_id=i, upload=False,
                               pad_rung=o.max_scan_points)
             for i, fr in enumerate(frames)]
    for _ in odo.stream_frames(iter(preps[:WARM_FRAMES]), batch=BATCH):
        pass
    assert odo.registered_frames == WARM_FRAMES

    # capture the next WINDOW_BATCHES batches' stacked inputs exactly as
    # _stream_frames_batched.stack_upload builds them
    def frame_scalars(prep):
        info = prep["info"]
        k = info.registered_fid
        startup = k < o.init_num_frames
        fs1 = o.init_sample_voxel_size if startup else o.sample_voxel_size
        return np.asarray([
            o.init_voxel_size if startup else o.voxel_size, fs1,
            o.max_distance, 0.0, 0.0,
            o.insertion_ego_rotation_threshold, 0.0,
            o.insertion_threshold_frames_skipped,
            o.distance_error_threshold, o.orientation_error_threshold,
            1.0 if k % PRUNE_PERIOD == 0 else 0.0,
            np.inf, np.inf, np.inf, 0.0,
            float(o.bootstrap_insert_rounds) if k < o.bootstrap_frames
            else 4.0,
            odo._kp_prefix_scalar(prep, fs1),
        ], dtype=np.float32)

    batches = []
    for b in range(WINDOW_BATCHES):
        group = preps[WARM_FRAMES + b * BATCH: WARM_FRAMES + (b + 1) * BATCH]
        rung = max(p["scan_host"].shape[0] for p in group)
        scans = np.zeros((BATCH, rung, 4), np.uint16)
        dyns, fss, ns = [], [], []
        for i, prep in enumerate(group):
            dyns.append(odo.registration.dynamics(
                odo._effective_icp_options(prep["info"])))
            fss.append(frame_scalars(prep))
            ns.append(prep["n"])
            sh = prep["scan_host"]
            scans[i, :sh.shape[0]] = sh
        batches.append((jnp.asarray(scans),
                        jnp.asarray(np.asarray(ns, np.int32)),
                        jnp.asarray(np.stack(dyns)),
                        jnp.asarray(np.stack(fss))))
    mm = o.default_motion_model
    betas = jnp.asarray(np.asarray([mm.beta_location_consistency,
                                    mm.beta_orientation_consistency,
                                    mm.beta_constant_velocity,
                                    mm.beta_small_velocity], np.float32))
    return odo, batches, betas


def make_variant(odo, ablate, dyn_override=None):
    from ct_icp_tpu.config.options import (Initialization,
                                           MotionCompensation)
    from ct_icp_tpu.odometry import pipeline as pl
    o = odo.options
    return pl.make_multi_step_fn(
        o.map_options, odo.registration.statics,
        sub_capacity=o.max_subsampled_points, max_dirty=o.max_dirty_voxels,
        distort_constant_velocity=(
            o.motion_compensation == MotionCompensation.CONSTANT_VELOCITY),
        const_velocity=(o.initialization
                        == Initialization.INIT_CONSTANT_VELOCITY),
        continuous=(o.motion_compensation == MotionCompensation.CONTINUOUS),
        always_insert=o.always_insert, do_no_insert=o.do_no_insert,
        batch=BATCH, host_prededuped=o.host_subsample, ablate=ablate)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    from ct_icp_tpu.odometry import pipeline as pl

    odo, batches, betas = build_inputs()
    snapshot = (odo.map_state, odo._odo_state)
    copy_fn = pl.make_device_copy_fn()
    # force the axon client into synchronous mode (docs/PERF.md)
    jax.block_until_ready(np.asarray(odo._odo_state))

    def time_copy():
        ts = []
        for _ in range(reps):
            t0 = time.time()
            c = copy_fn(snapshot)
            jax.block_until_ready(c)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    def time_chain(step, dyn_mod=None):
        """copy -> R megasteps -> small readback; returns (sec, rows)."""
        ts, rows = [], None
        for _ in range(reps):
            t0 = time.time()
            ms, os_ = copy_fn(snapshot)
            packed = None
            for scans, ns, dyns, fss in batches:
                if dyn_mod is not None:
                    dyns = dyn_mod(dyns)
                ms, os_, packed = step(ms, os_, scans, ns, betas, dyns, fss)
            rows = np.asarray(packed)      # sync point (tiny readback)
            ts.append(time.time() - t0)
        return float(np.median(ts)), rows

    t_copy = time_copy()
    n_frames = WINDOW_BATCHES * BATCH
    print(json.dumps({"copy_ms": round(t_copy * 1e3, 2),
                      "frames_per_chain": n_frames, "reps": reps}),
          flush=True)

    results = {}
    variants = ["", "no_insert", "no_solver", "no_solver,no_insert",
                "no_insert,no_carry", "no_solver,no_insert,no_carry",
                # insert sub-stage decomposition (round-5: insert measured
                # 6.6 ms in situ vs 2.3 staged — find the gap)
                "ins_no_scatter", "ins_no_elect", "ins_no_window",
                "ins_no_ladder", "insert_full_rung",
                "ins_no_scatter,ins_no_elect,ins_no_window"]
    # ABL_VARIANTS="v1;v2" runs just those (plus full) — iteration mode
    import os
    if os.environ.get("ABL_VARIANTS"):
        variants = [""] + [v.strip() for v
                           in os.environ["ABL_VARIANTS"].split(";")]
    for abl in variants:
        step = make_variant(odo, abl)
        t, rows = time_chain(step)      # first call compiles; timing below
        t, rows = time_chain(step)
        per_frame = (t - t_copy) / n_frames * 1e3
        results[abl or "full"] = per_frame
        print(json.dumps({
            "variant": abl or "full",
            "ms_per_frame": round(per_frame, 3),
            "mean_n_res": round(float(rows[:, 14].mean()), 1),
            "mean_iters": round(float(rows[:, 15].mean()), 2),
            "mean_inserted": round(float(rows[:, 20].mean()), 1),
        }), flush=True)

    # dynamic-knob points on the FULL program (no recompile)
    from ct_icp_tpu.icp import solver as slv
    i_icp = 0
    i_ls = 1
    full = make_variant(odo, "")
    for name, idx, val in (("icp_iters=1", i_icp, 1.0),
                           ("ls_iters=1", i_ls, 1.0)):
        def mod(d, idx=idx, val=val):
            return d.at[:, idx].set(val)
        t, rows = time_chain(full, dyn_mod=mod)
        per_frame = (t - t_copy) / n_frames * 1e3
        results[name] = per_frame
        print(json.dumps({
            "variant": name, "ms_per_frame": round(per_frame, 3),
            "mean_iters": round(float(rows[:, 15].mean()), 2),
        }), flush=True)

    f = results["full"]
    if os.environ.get("ABL_VARIANTS"):
        return
    print(json.dumps({
        "decomposition_ms": {
            "insert": round(f - results["no_insert"], 3),
            "solver": round(f - results["no_solver"], 3),
            "solver+insert": round(f - results["no_solver,no_insert"], 3),
            "map_scan_carry": round(results["no_insert"]
                                    - results["no_insert,no_carry"], 3),
            "scan_machinery_floor": round(
                results["no_solver,no_insert,no_carry"], 3),
            "outer_iter_cost": round(f - results["icp_iters=1"], 3),
            "inner_iter_cost": round(f - results["ls_iters=1"], 3),
            "ins_scatter": round(f - results["ins_no_scatter"], 3),
            "ins_elect": round(f - results["ins_no_elect"], 3),
            "ins_window": round(f - results["ins_no_window"], 3),
            "ins_ladder_cond": round(f - results["ins_no_ladder"], 3),
            "outer_ladder_cond": round(f - results["insert_full_rung"], 3),
            "full": round(f, 3),
        }}, indent=None), flush=True)


if __name__ == "__main__":
    main()
