"""Golden tests for the SE3/quaternion core (host f64 and device f32 instances).

Closed-form cases mirror the reference semantics they replicate:
  * compose/inverse/apply       — reference include/SlamCore/types.h:343-365
  * slerp+lerp interpolation    — reference include/SlamCore/types.h:361-366
  * GetAlphaTimestamp clamping  — reference include/SlamCore/types.h:192-219
  * AngularDistance degrees     — reference include/SlamCore/types.h:141-150
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ct_icp_tpu.core import se3 as s3j
from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.core.pose import Pose, TrajectoryFrame
from ct_icp_tpu.core.trajectory import LinearContinuousTrajectory


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("m", [s3n, s3j])
def test_quat_rotate_matches_matrix(m, rng):
    q = random_quat(rng, (32,))
    v = rng.normal(size=(32, 3))
    got = np.asarray(m.quat_rotate(q, v))
    mats = np.asarray(m.quat_to_matrix(q))
    want = np.einsum("nij,nj->ni", mats, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("m", [s3n, s3j])
def test_quat_matrix_roundtrip(m, rng):
    q = random_quat(rng, (64,))
    q2 = np.asarray(m.quat_from_matrix(m.quat_to_matrix(q)))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


@pytest.mark.parametrize("m", [s3n, s3j])
def test_compose_inverse(m, rng):
    qa, qb = random_quat(rng, (8,)), random_quat(rng, (8,))
    ta, tb = rng.normal(size=(8, 3)), rng.normal(size=(8, 3))
    q, t = m.se3_compose(qa, ta, qb, tb)
    v = rng.normal(size=(8, 3))
    # (a*b) v == a (b v)
    np.testing.assert_allclose(
        np.asarray(m.se3_apply(q, t, v)),
        np.asarray(m.se3_apply(qa, ta, m.se3_apply(qb, tb, v))),
        atol=1e-5,
    )
    qi, ti = m.se3_inverse(q, t)
    qe, te = m.se3_compose(q, t, qi, ti)
    np.testing.assert_allclose(np.abs(np.asarray(qe)[..., 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)


@pytest.mark.parametrize("m", [s3n, s3j])
def test_slerp_endpoints_and_midpoint(m):
    q0 = np.array([1.0, 0.0, 0.0, 0.0])
    # 90 degrees around z
    q1 = np.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(np.asarray(m.quat_slerp(q0, q1, 0.0)), q0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.quat_slerp(q0, q1, 1.0)), q1, atol=1e-6)
    mid = np.asarray(m.quat_slerp(q0, q1, 0.5))
    want = np.array([np.cos(np.pi / 8), 0.0, 0.0, np.sin(np.pi / 8)])
    np.testing.assert_allclose(mid, want, atol=1e-6)
    # shortest path: slerp(q0, -q1) goes the same way
    mid2 = np.asarray(m.quat_slerp(q0, -q1, 0.5))
    np.testing.assert_allclose(np.abs(np.dot(mid2, want)), 1.0, atol=1e-6)


@pytest.mark.parametrize("m", [s3n, s3j])
def test_slerp_near_identical(m):
    q0 = np.array([1.0, 0.0, 0.0, 0.0])
    out = np.asarray(m.quat_slerp(q0, q0, 0.3))
    np.testing.assert_allclose(out, q0, atol=1e-6)
    assert not np.any(np.isnan(out))


def test_slerp_differentiable_near_identity():
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    grad = jax.grad(lambda t: s3j.quat_slerp(q0, q0, t)[0])(0.5)
    assert not np.isnan(np.asarray(grad))


@pytest.mark.parametrize("m", [s3n, s3j])
def test_alpha_timestamp_clamping(m):
    # reference types.h:192-219: below-min -> 0, above-max -> 0, equal -> 1
    a = np.asarray(m.alpha_timestamp(np.array([0.25]), 0.0, 1.0))
    np.testing.assert_allclose(a, [0.25], atol=1e-6)
    assert float(np.asarray(m.alpha_timestamp(np.array([-0.5]), 0.0, 1.0))[0]) == 0.0
    assert float(np.asarray(m.alpha_timestamp(np.array([1.5]), 0.0, 1.0))[0]) == 0.0
    assert float(np.asarray(m.alpha_timestamp(np.array([5.0]), 5.0, 5.0))[0]) == 1.0


@pytest.mark.parametrize("m", [s3n, s3j])
def test_angular_distance_degrees(m):
    q0 = np.array([1.0, 0.0, 0.0, 0.0])
    for deg in [0.0, 10.0, 90.0, 179.0]:
        half = np.deg2rad(deg) / 2
        q1 = np.array([np.cos(half), np.sin(half), 0.0, 0.0])
        got = float(np.asarray(m.angular_distance_deg(q0, q1)))
        assert abs(got - deg) < 1e-2, (deg, got)


def test_rotvec_exp(rng):
    rv = rng.normal(size=(16, 3)) * 0.5
    q = np.asarray(s3n.quat_from_rotvec(rv))
    angle = np.linalg.norm(rv, axis=-1)
    np.testing.assert_allclose(q[:, 0], np.cos(angle / 2), atol=1e-8)
    # tiny rotation: still unit quaternions, no NaN
    tiny = np.asarray(s3n.quat_from_rotvec(np.full((1, 3), 1e-12)))
    np.testing.assert_allclose(np.linalg.norm(tiny, axis=-1), 1.0, atol=1e-8)


class TestPose:
    def test_interpolate_pose(self):
        p0 = Pose(timestamp=0.0)
        half = np.deg2rad(90.0) / 2
        p1 = Pose(np.array([np.cos(half), 0, 0, np.sin(half)]),
                  np.array([2.0, 0.0, 0.0]), timestamp=1.0)
        mid = p0.interpolate(p1, 0.5)
        np.testing.assert_allclose(mid.tr, [1.0, 0.0, 0.0], atol=1e-9)
        assert abs(mid.angular_distance(p0) - 45.0) < 1e-6

    def test_continuous_transform(self):
        p0 = Pose(timestamp=0.0)
        p1 = Pose(tr=np.array([1.0, 0.0, 0.0]), timestamp=1.0)
        pts = np.zeros((3, 3))
        ts = np.array([0.0, 0.5, 1.0])
        w = p0.continuous_transform(pts, p1, ts)
        np.testing.assert_allclose(w[:, 0], [0.0, 0.5, 1.0], atol=1e-9)

    def test_mul_and_inverse(self, ):
        rng = np.random.default_rng(0)
        a = Pose(random_quat(rng), rng.normal(size=3))
        b = Pose(random_quat(rng), rng.normal(size=3))
        c = a * b
        v = rng.normal(size=(5, 3))
        np.testing.assert_allclose(c.apply(v), a.apply(b.apply(v)), atol=1e-9)
        ident = a * a.inverse()
        np.testing.assert_allclose(ident.tr, 0.0, atol=1e-9)

    def test_trajectory_frame(self):
        f = TrajectoryFrame(Pose(timestamp=0.0), Pose(timestamp=1.0))
        assert f.ego_angular_distance() < 1e-9
        assert f.mid_pose().shape == (4, 4)


class TestLinearContinuousTrajectory:
    def test_interpolation(self):
        poses = [Pose(tr=np.array([float(i), 0, 0]), timestamp=float(i))
                 for i in range(5)]
        traj = LinearContinuousTrajectory(poses)
        p = traj.interpolate_pose(2.5)
        np.testing.assert_allclose(p.tr, [2.5, 0, 0], atol=1e-9)
        # clamped outside
        p = traj.interpolate_pose(10.0)
        np.testing.assert_allclose(p.tr, [4.0, 0, 0], atol=1e-9)

    def test_transform_points(self):
        poses = [Pose(tr=np.array([0.0, 0, 0]), timestamp=0.0),
                 Pose(tr=np.array([1.0, 0, 0]), timestamp=1.0)]
        traj = LinearContinuousTrajectory(poses)
        pts = np.zeros((2, 3))
        w = traj.transform_points(pts, np.array([0.25, 0.75]))
        np.testing.assert_allclose(w[:, 0], [0.25, 0.75], atol=1e-9)

    def test_relative_roundtrip(self):
        rng = np.random.default_rng(3)
        poses = [Pose(random_quat(rng), rng.normal(size=3), timestamp=float(i))
                 for i in range(4)]
        traj = LinearContinuousTrajectory(poses)
        rel = traj.to_relative_poses()
        back = LinearContinuousTrajectory.from_relative_poses(rel)
        for p, q in zip(traj.poses, back.poses):
            assert p.location_distance(q) < 1e-9
            assert p.angular_distance(q) < 1e-7
