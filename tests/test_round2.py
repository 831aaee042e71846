"""Round-2 features: k-NN moment locality, frame retention ring, profiled
per-phase ICP timings, logged-value parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.mapping.frame_ring import FrameRing
from ct_icp_tpu.core.pose import Pose, TrajectoryFrame

from test_odometry import make_acquisition, small_options


def test_knn_radius2_matches_exact_kth_distance():
    """The histogram-selected radius must bracket the exact k-th nearest
    distance within one shell width (radius/bins)."""
    rng = np.random.default_rng(0)
    m, o, p, k, bins = 64, 27, 30, 20, 32
    radius = 0.75
    d = rng.uniform(0, radius * 1.2, (m, o, p)).astype(np.float32)
    d2 = jnp.asarray(d * d)
    ok = jnp.asarray(rng.uniform(size=(m, o, p)) < 0.8)
    r_eff2 = np.asarray(vm._knn_radius2(
        d2, ok, jnp.full((m,), radius, jnp.float32), jnp.int32(k), bins))
    r_eff = np.sqrt(r_eff2)
    shell = radius / bins
    for i in range(m):
        dd = np.sort(d[i][np.asarray(ok[i])])
        dd = dd[dd <= radius]
        if len(dd) >= k:
            kth = dd[k - 1]
            assert kth <= r_eff[i] + 1e-6, (i, kth, r_eff[i])
            assert r_eff[i] <= kth + shell + 1e-6, (i, kth, r_eff[i])
            # the capped count is >= k and within the next shell's population
            n_in = (dd <= r_eff[i] + 1e-6).sum()
            assert n_in >= k
        else:
            assert abs(r_eff[i] - radius) < 1e-6


def test_knn_radius2_disabled_keeps_full_radius():
    d2 = jnp.asarray(np.full((4, 3, 5), 0.01, np.float32))
    ok = jnp.ones((4, 3, 5), bool)
    r_eff2 = np.asarray(vm._knn_radius2(
        d2, ok, jnp.full((4,), 0.75, jnp.float32), jnp.int32(0), 32))
    np.testing.assert_allclose(r_eff2, 0.75 ** 2, rtol=1e-6)


def test_frame_ring_retention_and_replay():
    ring = FrameRing(3)
    xyz = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    ts = np.array([0.0, 0.1])
    for fid in range(5):
        fr = TrajectoryFrame(
            Pose(tr=np.array([float(fid), 0, 0]), timestamp=0.0,
                 frame_id=fid),
            Pose(tr=np.array([float(fid) + 0.1, 0, 0]), timestamp=0.1,
                 frame_id=fid))
        ring.push(fid, xyz, ts, fr)
    assert ring.frame_ids() == [2, 3, 4]          # oldest clouds dropped
    rec = ring.get_frame(4)
    assert rec is not None
    # continuous transform: first point at begin pose, second at end pose
    np.testing.assert_allclose(rec["world"][0], [5.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(rec["world"][1], [4.1, 1.0, 0.0], atol=1e-9)
    assert ring.get_frame(0) is None
    allpts = ring.all_world_points()
    assert allpts.shape == (6, 3)

    # replay against an updated trajectory
    moved = TrajectoryFrame(
        Pose(tr=np.array([100.0, 0, 0]), timestamp=0.0, frame_id=4),
        Pose(tr=np.array([100.1, 0, 0]), timestamp=0.1, frame_id=4))
    ring.update_trajectory([moved])
    rec = ring.get_frame(4)
    np.testing.assert_allclose(rec["world"][0], [101.0, 0.0, 0.0], atol=1e-9)


@pytest.mark.slow
def test_odometry_populates_frame_ring():
    import dataclasses

    from ct_icp_tpu.odometry.odometry import Odometry

    opts = dataclasses.replace(
        small_options(),
        map_options=dataclasses.replace(
            small_options().map_options, max_frames_to_keep=4))
    acq = make_acquisition(seed=1)
    odo = Odometry(opts)
    n = 6
    for i in range(n):
        fr = acq.frame(i)
        odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
    assert len(odo.frame_ring) == 4               # ring bounded
    assert odo.frame_ring.frame_ids()[-1] == n - 1
    rec = odo.frame_ring.get_frame(n - 1)
    assert rec["world"].shape == rec["xyz"].shape
    # world points must lie near the map (both are in world frame)
    assert np.isfinite(rec["world"]).all()
    odo.reset()
    assert len(odo.frame_ring) == 0


@pytest.mark.slow
def test_profiled_registration_fills_durations():
    import dataclasses

    from ct_icp_tpu.odometry.odometry import Odometry

    opts = dataclasses.replace(small_options(), profile_registration=True)
    acq = make_acquisition(seed=2)
    odo = Odometry(opts)
    summaries = [odo.register_frame(acq.frame(i)["xyz"],
                                    acq.frame(i)["timestamps"])
                 for i in range(3)]
    s = summaries[-1]
    icp = s.icp_summary
    assert icp.num_iters >= 1
    assert icp.duration_init > 0.0
    assert icp.avg_duration_neighborhood > 0.0
    assert icp.avg_duration_solve > 0.0
    assert icp.avg_duration_iter > 0.0
    assert icp.duration_total >= icp.avg_duration_iter * icp.num_iters
    # LogSummary parity keys (reference odometry.cpp:505-520)
    for key in ("icp_duration_neighborhood", "icp_duration_solve",
                "icp_total_duration", "icp_num_iters",
                "odometry_num_keypoints"):
        assert key in s.logged_values
    assert s.logged_values["icp_duration_solve"] > 0.0


@pytest.mark.slow
def test_profiled_matches_fused_poses():
    """The profiled path must agree with the default path on the estimate.

    Round-3 regression guard: the profiled frame now COMMITS the production
    fused-step result (same dispatch), so the trajectories must be
    bit-identical — and the staged timing replay (which runs the same
    solver body, solver._loop_pieces, split at the phase boundary) must
    land on the same poses up to XLA fusion-level float noise."""
    import dataclasses

    from ct_icp_tpu.odometry.odometry import Odometry

    acq = make_acquisition(seed=5)
    frames = [acq.frame(i) for i in range(4)]
    a = Odometry(small_options())
    b = Odometry(dataclasses.replace(small_options(),
                                     profile_registration=True))
    summaries = []
    for i, fr in enumerate(frames):
        a.register_frame(fr["xyz"], fr["timestamps"])
        summaries.append(b.register_frame(fr["xyz"], fr["timestamps"]))
    for fa, fb in zip(a.get_trajectory(), b.get_trajectory()):
        assert fa.end_pose.location_distance(fb.end_pose) < 1e-9
        assert fa.begin_pose.location_distance(fb.begin_pose) < 1e-9
    # the staged replay reproduces the fused solver's result (one body,
    # two execution strategies — any gap is float reassociation noise)
    diffs = [s.logged_values["profile_replay_pose_diff_m"]
             for s in summaries[1:]]
    assert max(diffs) < 1e-3, diffs


def test_moments_cached_radius_semantics():
    """The knn-cap radius cached across rescore iterations (round-4 perf):
    with use_fresh=True the cached value is ignored (bit-equal to a fresh
    histogram); with use_fresh=False the provided radius is applied as-is."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    m, o, p = 32, 27, 30
    rows = jnp.asarray(rng.uniform(-1, 1, (m, o, 3 * p)).astype(np.float32))
    cnt = jnp.asarray(rng.integers(0, p + 1, (m, o)).astype(np.int32))
    q = jnp.asarray(rng.uniform(-0.2, 0.2, (m, 3)).astype(np.float32))
    k = jnp.int32(20)

    fresh = vm.moments_from_planes(rows, cnt, q, 0.75, k_nearest=k,
                                   return_r_eff2=True)
    # fresh-with-cache-present == fresh (the cache is ignored)
    refreshed = vm.moments_from_planes(
        rows, cnt, q, 0.75, k_nearest=k,
        cached_r_eff2=jnp.full((m,), 1e-6, jnp.float32),
        use_fresh=jnp.asarray(True), return_r_eff2=True)
    for a, b in zip(fresh, refreshed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # reuse: the cached radius is applied verbatim
    reused = vm.moments_from_planes(
        rows, cnt, q, 0.75, k_nearest=k, cached_r_eff2=fresh[5],
        use_fresh=jnp.asarray(False), return_r_eff2=True)
    np.testing.assert_array_equal(np.asarray(reused[5]), np.asarray(fresh[5]))
    np.testing.assert_array_equal(np.asarray(reused[0]), np.asarray(fresh[0]))
