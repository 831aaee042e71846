"""End-to-end solver test on a synthetic planes room.

Mirrors the reference integration test intent (test/integration/
testint_odometry.cpp: 6 axis-aligned planes, per-point interpolated-pose
timestamps, registration must succeed): build a voxel map of the room, render
an elastic scan from a known (begin, end) trajectory, perturb the initial
estimate, and require the CT solver to recover both poses.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from ct_icp_tpu.config.options import (CTICPOptions, MultiResolutionVoxelMapOptions,
                                       ResolutionParam, PoseParametrization)
from ct_icp_tpu.config.options import IcpDistance
from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.core.pose import Pose, TrajectoryFrame
from ct_icp_tpu.icp.registration import CTICPRegistration, make_prior
from ct_icp_tpu.mapping import voxel_map as vm


def room_surface_points(rng, n, half=5.0):
    """Random points on the 6 faces of a cube [-half, half]^3."""
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-half, half, (n, 2))
    pts = np.zeros((n, 3))
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0)
    for i in range(n):
        a = axis[i]
        rest = [j for j in range(3) if j != a]
        pts[i, a] = sign[i] * half
        pts[i, rest[0]] = uv[i, 0]
        pts[i, rest[1]] = uv[i, 1]
    return pts


def make_room_map(rng, map_options):
    level = vm.make_level(map_options.resolutions[0].capacity_log2,
                          map_options.resolutions[0].max_num_points)
    pts = room_surface_points(rng, 60000)
    level, n = vm.insert_points(
        level, jnp.asarray(pts, dtype=jnp.float32),
        jnp.ones(pts.shape[0], bool),
        map_options.resolutions[0].resolution,
        map_options.resolutions[0].min_distance_between_points,
        jnp.zeros(3, dtype=jnp.float32), 1 << 14,
        max_rounds=64)  # bulk one-call map build: no per-frame insert cap
    assert int(n) > 10000
    return vm.MapState(levels=(level,))


MAP_OPTIONS = MultiResolutionVoxelMapOptions(
    resolutions=(ResolutionParam(0.5, 0.05, 40, 16),),
    default_radius=0.8)


def render_scan(rng, n, frame: TrajectoryFrame):
    """Sample room surface points, express them in the (moving) sensor frame
    with per-point timestamps in [t0, t1]."""
    world = room_surface_points(rng, n)
    ts = rng.uniform(frame.begin_pose.timestamp, frame.end_pose.timestamp, n)
    alphas = frame.begin_pose.alpha_timestamp(ts, frame.end_pose)
    q, t = s3n.se3_interpolate(
        np.broadcast_to(frame.begin_pose.quat, (n, 4)),
        np.broadcast_to(frame.begin_pose.tr, (n, 3)),
        np.broadcast_to(frame.end_pose.quat, (n, 4)),
        np.broadcast_to(frame.end_pose.tr, (n, 3)), alphas)
    qi, ti = s3n.se3_inverse(q, t)
    raw = s3n.quat_rotate(qi, world) + ti
    return raw, ts


@pytest.fixture(scope="module")
def room():
    rng = np.random.default_rng(5)
    return make_room_map(rng, MAP_OPTIONS)


def _gt_frame():
    rot = s3n.quat_from_rotvec(np.array([0.0, 0.0, np.deg2rad(2.0)]))
    begin = Pose(timestamp=0.0)
    end = Pose(rot, np.array([0.3, 0.1, 0.0]), timestamp=1.0)
    return TrajectoryFrame(begin, end)


def test_ct_registration_recovers_elastic_pose(room):
    rng = np.random.default_rng(9)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 800, gt)

    opts = CTICPOptions(num_iters_icp=15, ls_max_num_iters=5,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6,
                        min_number_neighbors=10)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)

    init = TrajectoryFrame(
        Pose(s3n.quat_from_rotvec(np.array([0, 0, np.deg2rad(0.5)])),
             np.array([0.05, -0.05, 0.02]), timestamp=0.0),
        Pose(s3n.quat_from_rotvec(np.array([0, 0, np.deg2rad(1.0)])),
             np.array([0.2, 0.2, -0.03]), timestamp=1.0))

    summary = reg.register(room, raw, ts, init)
    assert summary.success
    assert summary.num_residuals_used > 400

    err_b_t = np.linalg.norm(init.begin_pose.tr - gt.begin_pose.tr)
    err_e_t = np.linalg.norm(init.end_pose.tr - gt.end_pose.tr)
    err_b_r = init.begin_pose.angular_distance(gt.begin_pose)
    err_e_r = init.end_pose.angular_distance(gt.end_pose)
    assert err_b_t < 0.02, err_b_t
    assert err_e_t < 0.02, err_e_t
    assert err_b_r < 0.15, err_b_r
    assert err_e_r < 0.15, err_e_r


def test_simple_parametrization_rigid(room):
    rng = np.random.default_rng(13)
    # rigid frame: begin == end pose, SIMPLE parametrization optimizes end only
    rot = s3n.quat_from_rotvec(np.array([0.0, 0.0, np.deg2rad(1.0)]))
    pose = Pose(rot, np.array([0.2, 0.0, 0.0]), timestamp=1.0)
    gt = TrajectoryFrame(Pose(pose.quat.copy(), pose.tr.copy(), timestamp=0.0),
                         pose)
    raw, ts = render_scan(rng, 600, gt)

    opts = CTICPOptions(num_iters_icp=12, ls_max_num_iters=4,
                        parametrization=PoseParametrization.SIMPLE,
                        min_number_neighbors=10,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(room, raw, ts, init)
    assert summary.success
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.02
    assert init.end_pose.angular_distance(gt.end_pose) < 0.15


def test_registration_with_motion_prior(room):
    rng = np.random.default_rng(21)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 700, gt)
    prev = TrajectoryFrame(
        Pose(timestamp=-1.0), Pose(tr=np.array([0.0, 0.0, 0.0]), timestamp=0.0))

    from ct_icp_tpu.config.options import MotionModelOptions
    prior = make_prior(prev, MotionModelOptions(), np.zeros(3))
    opts = CTICPOptions(num_iters_icp=15, ls_max_num_iters=5,
                        min_number_neighbors=10,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(room, raw, ts, init, prior=prior)
    assert summary.success
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.03


def test_failure_on_empty_map():
    empty = vm.MapState(levels=(vm.make_level(10, 8),))
    opts = CTICPOptions(min_number_neighbors=10)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=128)
    rng = np.random.default_rng(3)
    raw = rng.uniform(-1, 1, (100, 3))
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(empty, raw, np.linspace(0, 1, 100), init)
    assert not summary.success


@pytest.mark.slow
def test_robust_solver_classified_residuals(room):
    """ROBUST solver (reference DoRegisterRobust, ct_icp.cpp:1180-1370):
    classify neighborhoods, mixed residual types, outlier gating."""
    from ct_icp_tpu.config.options import Solver
    rng = np.random.default_rng(31)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 800, gt)
    opts = CTICPOptions(num_iters_icp=15, ls_max_num_iters=5,
                        solver=Solver.ROBUST,
                        min_number_neighbors=10,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(room, raw, ts, init)
    assert summary.success
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.03
    assert init.end_pose.angular_distance(gt.end_pose) < 0.2


@pytest.mark.slow
def test_gn_solver(room):
    from ct_icp_tpu.config.options import Solver
    rng = np.random.default_rng(41)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 800, gt)
    opts = CTICPOptions(num_iters_icp=20, ls_max_num_iters=1,
                        solver=Solver.GN, min_number_neighbors=10,
                        max_dist_to_plane_ct_icp=1.0,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(room, raw, ts, init)
    assert summary.success
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.03


@pytest.mark.slow
def test_point_to_distribution_distance(room):
    from ct_icp_tpu.config.options import IcpDistance
    rng = np.random.default_rng(51)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 800, gt)
    opts = CTICPOptions(num_iters_icp=15, ls_max_num_iters=5,
                        distance=IcpDistance.POINT_TO_DISTRIBUTION,
                        min_number_neighbors=10,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(room, raw, ts, init)
    assert summary.success
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.05


@pytest.mark.slow
def test_distance_based_strategy(room):
    """DistanceBasedStrategy (reference neighborhood_strategy.h:95-146):
    per-point search radius growing with sensor range + normal filter."""
    from ct_icp_tpu.config.options import DistanceBasedStrategyOptions
    rng = np.random.default_rng(61)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 800, gt)
    strategy = DistanceBasedStrategyOptions(radius_min=0.3, radius_max=1.5)
    opts = CTICPOptions(num_iters_icp=15, ls_max_num_iters=5,
                        min_number_neighbors=8,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024,
                            distance_strategy=strategy)
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(room, raw, ts, init)
    assert summary.success
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.03


def test_prediction_consistency_rows_match_reference_functors():
    """residuals.prediction_consistency_residuals reproduces the reference
    functor values (cost_functions.h:231-314) for a random state."""
    import jax
    from ct_icp_tpu.icp import residuals as res
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.odometry.motion_model import (
        PredictionConsistencyModel, PredictionConsistencyOptions)

    rng = np.random.default_rng(7)
    opts = PredictionConsistencyOptions(
        alpha_begin_tr_constraint=3.0, alpha_begin_rot_constraint=2.0,
        alpha_end_tr_constraint=5.0, alpha_end_rot_constraint=4.0,
        alpha_relative_rot_constraint=100.0, alpha_relative_tr_constraint=60.0)
    model = PredictionConsistencyModel(opts)
    pred = TrajectoryFrame(
        Pose(s3n.quat_from_rotvec(rng.normal(scale=0.1, size=3)),
             rng.normal(size=3), timestamp=0.0),
        Pose(s3n.quat_from_rotvec(rng.normal(scale=0.1, size=3)),
             rng.normal(size=3), timestamp=1.0))
    model.set_prediction(pred)
    packed = model.device_prior(np.zeros(3))
    assert packed.shape == (41,)

    qb = s3n.quat_from_rotvec(rng.normal(scale=0.05, size=3)).astype(np.float32)
    tb = rng.normal(size=3).astype(np.float32)
    qe = s3n.quat_from_rotvec(rng.normal(scale=0.05, size=3)).astype(np.float32)
    te = rng.normal(size=3).astype(np.float32)
    rows = np.asarray(jax.jit(
        lambda *a: res.prediction_consistency_residuals(
            a[0], a[1], a[2], a[3], slv.unpack_prior(a[4])))(
        jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(qe), jnp.asarray(te),
        jnp.asarray(packed)))
    assert rows.shape == (12,)

    # numpy recomputation straight from the functor definitions
    o = opts
    w_b_tr = o.alpha_begin_tr_constraint / o.beta_scale_tr_m
    w_b_rot = o.alpha_begin_rot_constraint / o.beta_scale_rot_deg
    w_e_tr = o.alpha_end_tr_constraint / o.beta_scale_tr_m
    w_e_rot = o.alpha_end_rot_constraint / o.beta_scale_rot_deg
    w_r_rot = o.alpha_relative_rot_constraint / o.beta_scale_rot_deg
    w_r_tr = o.alpha_relative_tr_constraint / o.beta_scale_tr_m

    exp = np.zeros(12)
    exp[0:3] = w_b_tr * (tb - pred.begin_pose.tr)
    dq = float(np.dot(s3n.quat_normalize(qb),
                      s3n.quat_normalize(pred.begin_pose.quat)))
    exp[3] = w_b_rot * (1.0 - dq * dq)
    exp[4:7] = w_e_tr * (te - pred.end_pose.tr)
    dq = float(np.dot(s3n.quat_normalize(qe),
                      s3n.quat_normalize(pred.end_pose.quat)))
    exp[7] = w_e_rot * (1.0 - dq * dq)
    rel_pred = pred.begin_pose.inverse() * pred.end_pose
    rq, rt = s3n.se3_compose(*s3n.se3_inverse(s3n.quat_normalize(qb), tb),
                             s3n.quat_normalize(qe), te)
    dq = float(np.dot(s3n.quat_normalize(rq),
                      s3n.quat_normalize(rel_pred.quat)))
    exp[8] = w_r_rot * (1.0 - dq * dq)
    exp[9:12] = w_r_tr * (rt - rel_pred.tr)
    np.testing.assert_allclose(rows, exp, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_prediction_consistency_model_constrains_registration(room):
    """A strong prediction-consistency prior pulls the solution toward the
    prediction when the point evidence is ambiguous, and the packed [41]
    prior flows through the registration entry point."""
    from ct_icp_tpu.odometry.motion_model import (
        PredictionConsistencyModel, PredictionConsistencyOptions)
    rng = np.random.default_rng(33)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 700, gt)

    model = PredictionConsistencyModel(PredictionConsistencyOptions(
        alpha_begin_tr_constraint=1.0, alpha_begin_rot_constraint=1.0))
    model.set_prediction(gt.copy())
    prior = model.device_prior(np.zeros(3))

    opts = CTICPOptions(num_iters_icp=15, ls_max_num_iters=5,
                        min_number_neighbors=10,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
    init = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
    summary = reg.register(room, raw, ts, init, prior=prior)
    assert summary.success
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.03
    assert model.is_valid(init)

    # an inconsistent optimized frame fails the relative validity check
    bad = gt.copy()
    bad.end_pose.tr = bad.end_pose.tr + np.array([2.0, 0.0, 0.0])
    assert not model.is_valid(bad)


def test_debug_problem_outputs(room):
    """The per-point debug outputs (reference OutputBuilder semantics,
    output_weights/normals/residuals): arrays for the valid prefix, normals
    unit-length where a neighborhood exists, residuals small at GT."""
    rng = np.random.default_rng(41)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 500, gt)
    reg = CTICPRegistration(CTICPOptions(min_number_neighbors=10),
                            MAP_OPTIONS, num_keypoints=1024)
    dbg = reg.debug_problem(room, raw, ts, gt.copy())
    n = raw.shape[0]
    assert dbg["world"].shape == (n, 3)
    ok = dbg["ok"]
    assert ok.sum() > 300
    nn = np.linalg.norm(dbg["normals"][ok], axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-3)
    assert np.abs(dbg["residuals"][ok]).mean() < 0.05
    assert (dbg["weights"][ok] > 0).all()


@pytest.mark.slow
@pytest.mark.parametrize("distance", [IcpDistance.POINT_TO_PLANE,
                                      IcpDistance.POINT_TO_POINT,
                                      IcpDistance.POINT_TO_LINE,
                                      IcpDistance.POINT_TO_DISTRIBUTION])
def test_analytic_ct_jacobian_matches_autodiff(distance):
    """The cross-product CT Jacobian (reference ct_icp.cpp:813-850) must
    match 12-tangent autodiff through the slerp to first order. With
    identical begin/end quats the endpoint-transport approximation is exact,
    so the match is tight; a small relative rotation bounds the error."""
    import jax
    from ct_icp_tpu.icp import residuals as res

    rng = np.random.default_rng(5)
    k = 64
    raw = jnp.asarray(rng.uniform(-5, 5, (k, 3)).astype(np.float32))
    alphas = jnp.asarray(rng.uniform(0, 1, k).astype(np.float32))
    anchors = jnp.asarray((np.asarray(raw)
                           + rng.normal(0, 0.05, (k, 3))).astype(np.float32))
    normals = rng.normal(size=(k, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = jnp.asarray(normals.astype(np.float32))
    lines = jnp.asarray(rng.normal(size=(k, 3)).astype(np.float32))
    a_mat = rng.normal(size=(k, 3, 3)).astype(np.float32)
    cov_inv = jnp.asarray(a_mat @ a_mat.transpose(0, 2, 1)
                          + 0.5 * np.eye(3, dtype=np.float32))
    geom_w = jnp.asarray(rng.uniform(0.5, 1.0, k).astype(np.float32))

    qb = jnp.asarray(s3n.quat_from_rotvec(np.array([0.0, 0.0, 0.01]))
                     .astype(np.float32))
    tb = jnp.asarray(np.array([0.1, -0.2, 0.05], np.float32))
    qe = jnp.asarray(s3n.quat_from_rotvec(np.array([0.0, 0.002, 0.015]))
                     .astype(np.float32))
    te = jnp.asarray(np.array([0.9, -0.15, 0.07], np.float32))

    def rfun(d):
        q0, t0, q1, t1 = res.apply_delta(d, qb, tb, qe, te)
        world = res.interp_world_points(q0, t0, q1, t1, raw, alphas)
        r, _ = res.geometric_residuals_and_grad(
            distance, world, anchors, normals, lines, cov_inv, geom_w)
        return r.reshape(-1)

    jac_ad = np.asarray(jax.jacfwd(rfun)(jnp.zeros(12, jnp.float32)))

    world = res.interp_world_points(qb, tb, qe, te, raw, alphas)
    r, g = res.geometric_residuals_and_grad(
        distance, world, anchors, normals, lines, cov_inv, geom_w)
    jac_an = np.asarray(res.ct_jacobian_from_world_grad(
        g, world, tb, te, alphas)).reshape(jac_ad.shape)

    scale = np.abs(jac_ad).max()
    # translation columns are exact; rotation columns carry the O(theta_rel)
    # transport error (theta_rel ~ 0.02 rad here)
    np.testing.assert_allclose(jac_an[:, 3:6], jac_ad[:, 3:6],
                               atol=1e-5 * scale)
    np.testing.assert_allclose(jac_an[:, 9:12], jac_ad[:, 9:12],
                               atol=1e-5 * scale)
    np.testing.assert_allclose(jac_an, jac_ad, atol=0.03 * scale)


@pytest.mark.slow
def test_analytic_and_autodiff_solvers_agree(room):
    """Full registration with analytic vs autodiff Jacobians must land on
    the same pose (both drive the residual to the same fixed point)."""
    opts = CTICPOptions(num_iters_icp=15, ls_max_num_iters=5,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6,
                        min_number_neighbors=10)
    results = []
    for analytic in (True, False):
        rng = np.random.default_rng(9)
        gt = _gt_frame()
        raw, ts = render_scan(rng, 800, gt)
        reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
        import ct_icp_tpu.icp.solver as slv
        reg.statics = dataclasses.replace(reg.statics,
                                          analytic_jacobian=analytic)
        reg._fn = slv.jitted_register_fn(reg.statics)
        init = TrajectoryFrame(
            Pose(s3n.quat_from_rotvec(np.array([0, 0, np.deg2rad(0.5)])),
                 np.array([0.05, -0.05, 0.02]), timestamp=0.0),
            Pose(s3n.quat_from_rotvec(np.array([0, 0, np.deg2rad(1.0)])),
                 np.array([0.2, 0.2, -0.03]), timestamp=1.0))
        summary = reg.register(room, raw, ts, init)
        assert summary.success
        results.append(init)
    a, b = results
    assert np.linalg.norm(a.end_pose.tr - b.end_pose.tr) < 5e-3
    assert np.linalg.norm(a.begin_pose.tr - b.begin_pose.tr) < 5e-3
    assert a.end_pose.angular_distance(b.end_pose) < 0.05


@pytest.mark.slow
def test_num_closest_neighbors_k_residuals(room):
    """kc>1 emits k residuals per keypoint anchored at the k nearest
    neighbors (reference ct_icp.cpp:554,593-604) and still recovers the
    pose; unsupported combinations raise instead of degrading to 1."""
    from ct_icp_tpu.config.options import Solver
    from ct_icp_tpu.icp import solver as slv

    rng = np.random.default_rng(21)
    gt = _gt_frame()
    raw, ts = render_scan(rng, 800, gt)

    opts = CTICPOptions(num_iters_icp=12, ls_max_num_iters=5,
                        threshold_orientation_norm=1e-5,
                        threshold_translation_norm=1e-6,
                        min_number_neighbors=10,
                        num_closest_neighbors=2)
    reg = CTICPRegistration(opts, MAP_OPTIONS, num_keypoints=1024)
    # the builder must have flipped to the exact k-NN neighborhood
    assert not reg.statics.ball_neighborhood
    assert reg.statics.num_closest_neighbors == 2

    init = TrajectoryFrame(
        Pose(s3n.quat_from_rotvec(np.array([0, 0, np.deg2rad(0.5)])),
             np.array([0.05, -0.05, 0.02]), timestamp=0.0),
        Pose(s3n.quat_from_rotvec(np.array([0, 0, np.deg2rad(1.0)])),
             np.array([0.2, 0.2, -0.03]), timestamp=1.0))
    summary = reg.register(room, raw, ts, init)
    assert summary.success
    # n_res counts residual ROWS: with kc=2 the used count must exceed the
    # single-anchor keypoint population (spot check the mode is really on)
    assert summary.num_residuals_used > 800
    assert np.linalg.norm(init.end_pose.tr - gt.end_pose.tr) < 0.02
    assert init.end_pose.angular_distance(gt.end_pose) < 0.15

    # unsupported combos fail loudly at build time
    with pytest.raises(ValueError, match="ball_neighborhood"):
        slv.build_register_fn(dataclasses.replace(
            reg.statics, ball_neighborhood=True))
    with pytest.raises(ValueError, match="CERES"):
        slv.build_register_fn(dataclasses.replace(
            reg.statics, solver=Solver.ROBUST))
    with pytest.raises(ValueError, match="max_number_neighbors"):
        slv.build_register_fn(dataclasses.replace(
            reg.statics, max_neighbors=1))
