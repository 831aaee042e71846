"""End-to-end odometry on a synthetic scene (reference testint_odometry.cpp
analog): a room + interior structure, circular GT trajectory with per-point
interpolated-pose timestamps; every registration must succeed and the
estimated trajectory must track ground truth closely.
"""

import dataclasses

import numpy as np
import pytest

from ct_icp_tpu.config.options import (MultiResolutionVoxelMapOptions,
                                       OdometryOptions, ResolutionParam,
                                       CTICPOptions, MotionCompensation)
from ct_icp_tpu.datasets import synthetic as syn
from ct_icp_tpu.odometry.odometry import Odometry

TEST_MAP = MultiResolutionVoxelMapOptions(
    resolutions=(
        ResolutionParam(0.2, 0.03, 30, 16),
        ResolutionParam(0.5, 0.1, 25, 15),
        ResolutionParam(1.5, 0.15, 25, 13),
    ),
    default_radius=0.8)


def small_options(**kw) -> OdometryOptions:
    return OdometryOptions(
        map_options=TEST_MAP,
        max_scan_points=8192,
        max_subsampled_points=8192,
        max_keypoints=2048,
        max_dirty_voxels=4096,
        init_num_frames=5,
        max_distance=100.0,
        ct_icp_options=CTICPOptions(
            num_iters_icp=6, ls_max_num_iters=2, min_number_neighbors=10,
            min_num_residuals=50),
        **kw)


def make_acquisition(seed=0, num_frames=25, noise=0.0):
    prims = syn.box_room(half_extent=12.0, height=5.0)
    prims.append(syn.Sphere(np.array([0.0, 0.0, 2.0]), 2.0))
    prims.append(syn.Ball(np.array([5.0, -4.0, 1.0]), 1.0))
    prims += syn.rectangle([-4, 2, 0], [3, 0, 0], [0, 0, 3])  # interior wall
    scene = syn.Scene(prims)
    traj = syn.circular_trajectory(radius=6.0, height=1.5, num_poses=200,
                                   total_time=num_frames * 0.1 + 0.2,
                                   angle_span=np.pi / 2)
    opts = syn.SyntheticAcquisitionOptions(
        num_points_per_frame=6000, frame_duration=0.1, max_range=60.0,
        noise_sigma=noise)
    return syn.SyntheticSensorAcquisition(scene, traj, opts, seed=seed)


@pytest.mark.slow
def test_odometry_tracks_synthetic_trajectory():
    acq = make_acquisition(seed=3)
    num_frames = min(acq.num_frames(), 25)
    odo = Odometry(small_options())

    gt_ends = []
    for i in range(num_frames):
        fr = acq.frame(i)
        summary = odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
        assert summary.success, \
            f"frame {i} failed: {summary.error_message}"
        gt_ends.append(fr["end_pose"])

    # The first frames anchor the map; GT starts away from the origin, so the
    # whole estimate lives in the frame of the first pose: compare relatively.
    traj = odo.get_trajectory()
    first_gt = gt_ends[0]
    first_est = traj[0].end_pose
    errs_t, errs_r = [], []
    for est, gt in zip(traj[1:], gt_ends[1:]):
        rel_gt = first_gt.inverse() * gt
        rel_est = first_est.inverse() * est.end_pose
        errs_t.append(rel_gt.location_distance(rel_est))
        errs_r.append(rel_gt.angular_distance(rel_est))
    errs_t, errs_r = np.array(errs_t), np.array(errs_r)
    # 0.13: this scenario starts at FULL speed (0.38 m/frame, no ramp), so
    # the frame-1 lock-on from an identity init is marginal and leaves a
    # persistent base offset whose size is realization-sensitive (measured
    # 0.08-0.12 across seeds after the reference-parity scan shuffle). The
    # realistic ramped benches gate accuracy much tighter (bench.py 3-seed
    # mean 0.058); this bound pins gross tracking, not the lock-on draw.
    assert errs_t.max() < 0.13, errs_t
    # 1.3: like the translation bound — the no-ramp lock-on rotation draw
    # is realization-sensitive (the reference-parity scan shuffle redrew
    # it to ~1.03 deg); gross-tracking bound, not a precision pin
    assert errs_r.max() < 1.3, errs_r
    # MEDIAN pins (round-3 advisor): the persistent lock-on offset
    # dominates every frame, so the median is nearly as large as the max
    # but far less single-draw-sensitive — measured 0.093 m / 0.85 deg on
    # this seed; a systematic tracking regression trips here before it
    # reaches the loosened max bounds
    assert np.median(errs_t) < 0.11, np.median(errs_t)
    assert np.median(errs_r) < 1.1, np.median(errs_r)
    assert odo.map_size() > 1000


@pytest.mark.slow
def test_odometry_constant_velocity_mode():
    acq = make_acquisition(seed=7)
    odo = Odometry(small_options(
        motion_compensation=MotionCompensation.CONSTANT_VELOCITY))
    for i in range(8):
        fr = acq.frame(i)
        summary = odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
        assert summary.success


@pytest.mark.slow
def test_odometry_robust_regimen():
    acq = make_acquisition(seed=11)
    opts = small_options(robust_registration=True, robust_num_attempts=3)
    odo = Odometry(opts)
    for i in range(8):
        fr = acq.frame(i)
        summary = odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
        assert summary.success


@pytest.mark.slow
def test_robust_streaming_matches_register_frame():
    """Speculative robust streaming (batched robust-level-0 attempts with
    device-gated insertion) must track the per-frame robust path closely;
    steady-state summaries report attempt counts and success."""
    acq = make_acquisition(seed=3)
    n = 12
    frames = [acq.frame(i) for i in range(n)]
    opts = small_options(robust_registration=True, robust_num_attempts=3)

    odo_a = Odometry(opts)
    for i, fr in enumerate(frames):
        s = odo_a.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
        assert s.success
    odo_b = Odometry(opts)
    preps = (odo_b.prepare_frame(fr["xyz"], fr["timestamps"], i)
             for i, fr in enumerate(frames))
    summaries = list(odo_b.stream_frames(preps, batch=4))
    assert len(summaries) == n
    assert all(s.success for s in summaries)
    ta, tb = odo_a.get_trajectory(), odo_b.get_trajectory()
    for fa, fb in zip(ta, tb):
        assert fa.end_pose.location_distance(fb.end_pose) < 0.05
        assert fa.end_pose.angular_distance(fb.end_pose) < 0.5
    assert odo_b.map_size() > 1000


@pytest.mark.slow
def test_robust_streaming_rebase_mid_batch():
    """A tiny rebase distance forces floating-origin rebases inside a
    streamed batch; every row of a batch must be finished against the
    DISPATCH-time origin, not the origin a mid-batch rebase moved."""
    acq = make_acquisition(seed=3)
    n = 12
    frames = [acq.frame(i) for i in range(n)]
    opts = small_options(robust_registration=True, robust_num_attempts=3)

    odo_a = Odometry(opts)
    odo_a.rebase_distance = 1.0
    summaries_a = []
    for i, fr in enumerate(frames):
        summaries_a.append(
            odo_a.register_frame(fr["xyz"], fr["timestamps"], frame_id=i))
    odo_b = Odometry(opts)
    odo_b.rebase_distance = 1.0
    preps = (odo_b.prepare_frame(fr["xyz"], fr["timestamps"], i)
             for i, fr in enumerate(frames))
    summaries = list(odo_b.stream_frames(preps, batch=4))
    assert all(s.success for s in summaries)
    # attempts/levels are EXACT per-frame semantics (frame 0 excepted: the
    # per-frame path reports 0 attempts for the non-registering bootstrap
    # frame, streamed commits report 1 — pre-existing convention)
    for s_a, s_b in zip(summaries_a[1:], summaries[1:]):
        assert s_a.number_of_attempts == s_b.number_of_attempts
        assert s_a.robust_level == s_b.robust_level
    # Parity here is SEMANTIC, not bitwise: since the round-5 prefix
    # commit, this run steadily commits a megastep batch (frames 4-7, a
    # level transition on its last frame) that the older streamer replayed
    # per-frame wholesale — so the measured ~1e-5 f32 program-difference
    # seed between the scan-fused and per-frame compilations amplifies
    # through one association-sensitive frame (0.10 m at frame 7, CPU)
    # and re-converges against the shared map (0.03 m by the end). An
    # ORIGIN bug — the property this test pins — shows up as a systematic
    # meter-scale offset on every frame, far beyond these bounds.
    traj_a, traj_b = odo_a.get_trajectory(), odo_b.get_trajectory()
    for fa, fb in zip(traj_a, traj_b):
        assert fa.end_pose.location_distance(fb.end_pose) < 0.25
    assert traj_a[-1].end_pose.location_distance(traj_b[-1].end_pose) < 0.08
    # the run actually exercised the new machinery: one steady commit at
    # level 1 ending in a level transition, one mid-batch prefix commit
    assert odo_b.speculative_batches_committed.get(1, 0) >= 1
    assert odo_b.speculative_prefix_commits >= 1


@pytest.mark.slow
def test_robust_streaming_rollback_replay():
    """With an impossible distance threshold every speculative batch fails
    its on-device assessment; the streamer must roll the map back and
    replay per-frame — ending in EXACTLY the per-frame path's state."""
    acq = make_acquisition(seed=11)
    # 12 frames / batch 4 = two in-flight groups ahead of the first resolve:
    # the rollback must also drain the already-dispatched SECOND batch
    # through the per-frame path (2-deep speculation)
    n = 12
    frames = [acq.frame(i) for i in range(n)]
    opts = small_options(robust_registration=True, robust_num_attempts=2,
                         distance_error_threshold=1e-4)

    odo_a = Odometry(opts)
    for i, fr in enumerate(frames):
        odo_a.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
    odo_b = Odometry(opts)
    preps = (odo_b.prepare_frame(fr["xyz"], fr["timestamps"], i)
             for i, fr in enumerate(frames))
    summaries = list(odo_b.stream_frames(preps, batch=4))
    assert len(summaries) == n
    # frames 1+ exhaust attempts in both paths (replay IS the per-frame path)
    assert summaries[1].number_of_attempts == 2
    assert odo_b.robust_num_consecutive_failures == \
        odo_a.robust_num_consecutive_failures
    assert odo_b.next_robust_level == odo_a.next_robust_level
    ta, tb = odo_a.get_trajectory(), odo_b.get_trajectory()
    assert len(ta) == len(tb) == n
    for fa, fb in zip(ta, tb):
        assert fa.end_pose.location_distance(fb.end_pose) < 1e-5
    assert odo_a.map_size() == odo_b.map_size()


@pytest.mark.slow
def test_odometry_robust_escalation_exhaustion():
    """An impossible distance threshold exhausts every attempt; per reference
    semantics the final attempt is still accepted, points still land in the
    map via the deferred decision, and the robust level climbs for the next
    frame (odometry.cpp:780-852, 890-901)."""
    acq = make_acquisition(seed=11)
    opts = small_options(robust_registration=True, robust_num_attempts=2,
                         distance_error_threshold=1e-4,
                         # the robust orientation insertion gates
                         # (odometry.cpp:880-889) are not what this test
                         # pins; disarm them so the deferred-insertion
                         # assertion is about EXHAUSTED-ATTEMPT acceptance,
                         # not the estimate's orientation draw
                         robust_threshold_ego_orientation=360.0,
                         robust_threshold_relative_orientation=360.0)
    odo = Odometry(opts)
    fr = acq.frame(0)
    s0 = odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=0)
    assert s0.success
    size0 = odo.map_size()
    fr = acq.frame(1)
    s1 = odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=1)
    assert s1.number_of_attempts == 2          # exhausted, still accepted
    assert odo.robust_num_consecutive_failures == 1
    assert odo.next_robust_level >= 1          # escalated for the next frame
    assert s1.points_added                      # deferred insertion applied
    assert odo.map_size() > size0
    assert len(odo.get_trajectory()) == 2


@pytest.mark.slow
def test_insertion_tracker_and_map_growth():
    acq = make_acquisition(seed=5)
    odo = Odometry(small_options())
    fr = acq.frame(0)
    s0 = odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=0)
    assert s0.points_added
    size0 = odo.map_size()
    assert size0 > 500
    fr = acq.frame(1)
    s1 = odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=1)
    assert odo.map_size() >= size0
    assert len(odo.get_trajectory()) == 2


@pytest.mark.slow
def test_streaming_matches_register_frame():
    """Streaming mode (device-resident motion init + tracker, 1-frame
    pipelining) must track the frame-by-frame API closely (device motion
    init is float32; the hosted path extrapolates in float64)."""
    acq = make_acquisition(seed=3)
    n = 12
    frames = [acq.frame(i) for i in range(n)]

    odo_a = Odometry(small_options())
    for i, fr in enumerate(frames):
        s = odo_a.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
        assert s.success
    odo_b = Odometry(small_options())
    preps = (odo_b.prepare_frame(fr["xyz"], fr["timestamps"], i)
             for i, fr in enumerate(frames))
    summaries = list(odo_b.stream_frames(preps))
    assert len(summaries) == n
    assert all(s.success for s in summaries)
    ta, tb = odo_a.get_trajectory(), odo_b.get_trajectory()
    assert len(tb) == n
    for a, b in zip(ta, tb):
        assert a.end_pose.location_distance(b.end_pose) < 0.02
        assert a.end_pose.angular_distance(b.end_pose) < 0.5


@pytest.mark.slow
def test_map_points_export_and_visibility():
    """GetMapPoints / GetVisibleMapPoints parity (reference map.h:354-407):
    exported points carry oriented normals, and the visible subset keeps
    only normals facing the view point."""
    acq = make_acquisition(seed=7)
    opts = small_options()
    odo = Odometry(opts)
    for i in range(4):
        fr = acq.frame(i)
        odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
    # level 1 (0.5 m): dense enough that >=5-point voxels carry normals
    # (level 0's 0.2 m voxels rarely reach 5 points in 4 frames)
    pn = odo.get_map_points(1)
    assert pn.shape[1] == 6 and pn.shape[0] > 100
    view = odo.get_trajectory()[-1].end_pose.tr
    vis = odo.get_visible_map_points(view, 1)
    assert 0 < vis.shape[0] <= pn.shape[0]
    # every visible point's normal faces the viewer
    scal = np.sum(vis[:, 3:6] * (vis[:, 0:3] - view), axis=1)
    assert np.all(scal < 0.0)
    # unoriented (zero-normal) points are never "visible"
    oriented = pn[np.linalg.norm(pn[:, 3:6], axis=1) > 0.5]
    assert vis.shape[0] <= oriented.shape[0] < pn.shape[0]


@pytest.mark.slow
def test_degenerate_scans_are_handled():
    """Non-finite returns are dropped before quantization; empty scans
    raise; a hopeless 1-point scan fails the registration rather than
    corrupting state."""
    acq = make_acquisition(seed=1)
    odo = Odometry(small_options())
    fr = acq.frame(0)
    assert odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=0).success

    fr2 = acq.frame(1)
    xyz = fr2["xyz"].copy()
    xyz[10:20] = np.nan
    xyz[20:25] = np.inf
    s = odo.register_frame(xyz, fr2["timestamps"], frame_id=1)
    assert s.success
    assert np.isfinite(s.frame.end_pose.tr).all()
    # the map must not contain quantized-NaN garbage near the wire extremes
    pts = odo.get_map_points(1)
    assert np.abs(pts[:, :3]).max() < 1e3

    with pytest.raises(ValueError):
        odo.register_frame(np.zeros((0, 3)), np.zeros((0,)), frame_id=2)

    s = odo.register_frame(np.array([[1.0, 2.0, 0.5]]), np.array([0.25]),
                           frame_id=2)
    assert not s.success


@pytest.mark.slow
def test_streaming_batch_size_invariance():
    """Non-robust megastep streaming must give the same trajectory at any
    batch size: the lax.scan over frames only restructures DISPATCH, never
    semantics (each frame's body is the same stream_body). Guard pinned
    tight — batch-dependent results would mean the scan carry or the
    motion-init state diverged from the per-frame path."""
    acq = make_acquisition(seed=9)
    n = 12
    frames = [acq.frame(i) for i in range(n)]

    def run(batch):
        odo = Odometry(small_options())
        preps = (odo.prepare_frame(fr["xyz"], fr["timestamps"], i)
                 for i, fr in enumerate(frames))
        summaries = list(odo.stream_frames(preps, batch=batch))
        assert len(summaries) == n and all(s.success for s in summaries)
        return odo.get_trajectory()

    t1, t4, t8 = run(1), run(4), run(8)
    for a, b in zip(t1, t4):
        assert a.end_pose.location_distance(b.end_pose) < 1e-5
        assert a.end_pose.angular_distance(b.end_pose) < 1e-3
    for a, b in zip(t1, t8):
        assert a.end_pose.location_distance(b.end_pose) < 1e-5


@pytest.mark.slow
def test_robust_streaming_level1_speculation_parity():
    """Sustained rotation above tightened robust thresholds keeps
    next_robust_level at 1 (the low-inertia turn regime): the round-5
    streamer must SPECULATE AT LEVEL 1 (batches dispatched with
    once-escalated options) instead of draining every frame per-frame —
    and end bit-close to the per-frame path's state."""
    import dataclasses
    acq = make_acquisition(seed=13)
    n = 16
    frames = [acq.frame(i) for i in range(n)]
    # the circular walk turns ~3.6 deg/frame; thresholds at 2 degrees keep
    # every post-startup frame's implied next level at 1 (rot NOT within)
    import dataclasses as _dc
    opts = _dc.replace(
        small_options(robust_registration=True, robust_num_attempts=3,
                      robust_threshold_relative_orientation=2.0,
                      robust_threshold_ego_orientation=2.0),
        init_num_frames=3)

    odo_a = Odometry(opts)
    for i, fr in enumerate(frames):
        odo_a.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
    odo_b = Odometry(opts)
    preps = (odo_b.prepare_frame(fr["xyz"], fr["timestamps"], i)
             for i, fr in enumerate(frames))
    summaries = list(odo_b.stream_frames(preps, batch=4))
    assert len(summaries) == n
    # the streamer actually speculated at level 1 (not per-frame drains)
    assert odo_b.speculative_batches_committed.get(1, 0) >= 1, \
        odo_b.speculative_batches_committed
    assert odo_b.next_robust_level == odo_a.next_robust_level
    ta, tb = odo_a.get_trajectory(), odo_b.get_trajectory()
    # pose parity is SEMANTIC, not bitwise: a ~1e-5 float seed (measured,
    # f32 program differences between the per-frame and scan-fused
    # compilations) amplifies chaotically through one association-
    # sensitive stretch (up to ~1 cm where a residual flips in/out of the
    # cap) and RE-CONVERGES because the map anchors both estimates
    # (measured 1.5e-6 at the final frame). Pin the shape: bounded
    # transient + converged tail + exact semantic state.
    ds = [fa.end_pose.location_distance(fb.end_pose)
          for fa, fb in zip(ta, tb)]
    assert max(ds) < 0.02, ds
    assert ds[-1] < 1e-3, ds
    assert odo_a.map_size() == odo_b.map_size()
    assert all(s.robust_level in (0, 1) for s in summaries)
