"""Tests for evaluation metrics, PLY/trajectory IO, and the YAML config layer."""

import os

import numpy as np
import pytest

from ct_icp_tpu.config import options as O
from ct_icp_tpu.config.yaml_config import (load_runner_config,
                                           yaml_to_odometry_options)
from ct_icp_tpu.core.pose import Pose, TrajectoryFrame
from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.evaluation import kitti as ev
from ct_icp_tpu.io import ply as ply_io
from ct_icp_tpu.io import trajectory_io as tio


class TestKittiEval:
    def _straight(self, n, step, jitter=0.0, rng=None):
        poses = []
        for i in range(n):
            tr = np.array([i * step, 0.0, 0.0])
            if jitter and rng is not None:
                tr = tr + rng.normal(scale=jitter, size=3)
            poses.append(Pose(tr=tr, timestamp=float(i)))
        return poses

    def test_perfect_trajectory_zero_error(self):
        gt = self._straight(200, 1.0)
        err = ev.evaluate_poses(gt, gt, driving=True)
        assert err.mean_rpe == 0.0
        assert err.mean_ape == 0.0
        assert err.max_local_err == 0.0

    def test_scaled_trajectory_rpe(self):
        # 1% scale error -> ~1% RPE
        gt = self._straight(1200, 1.0)
        est = self._straight(1200, 1.01)
        err = ev.evaluate_poses(gt, est, driving=True)
        assert 0.9 < err.mean_rpe < 1.1, err.mean_rpe

    def test_indoor_lengths(self):
        gt = self._straight(300, 0.5)
        est = self._straight(300, 0.505)
        err = ev.evaluate_poses(gt, est, driving=False)
        assert 0.8 < err.mean_rpe < 1.2

    def test_continuous_eval_interpolates(self):
        gt = self._straight(50, 1.0)
        frames = [Pose(tr=np.array([float(i), 0, 0]), timestamp=float(i))
                  for i in range(0, 51, 2)]  # cover the full GT time span
        from ct_icp_tpu.core.trajectory import LinearContinuousTrajectory
        traj = LinearContinuousTrajectory(frames)
        err = ev.evaluate_continuous_trajectory(gt, traj, driving=False)
        assert err.mean_ape < 1e-9

    def test_metrics_yaml(self):
        gt = self._straight(20, 1.0)
        err = ev.evaluate_poses(gt, gt, driving=True)
        text = ev.generate_metrics_yaml({"00": err})
        import yaml
        loaded = yaml.safe_load(text)
        assert loaded["00"]["MEAN_RPE"] == 0.0


class TestPlyIO:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(100, 3))
        ts = rng.uniform(0, 1, 100)
        path = tmp_path / "test.ply"
        ply_io.write_ply_xyzt(path, xyz, ts)
        xyz2, ts2 = ply_io.read_ply_xyzt(path)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_allclose(ts2, ts, atol=1e-12)

    def test_ascii_read(self, tmp_path):
        path = tmp_path / "a.ply"
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n1 2 3\n4 5 6\n")
        xyz, ts = ply_io.read_ply_xyzt(path)
        np.testing.assert_allclose(xyz, [[1, 2, 3], [4, 5, 6]])
        assert ts is None

    def test_double_properties(self, tmp_path):
        path = tmp_path / "d.ply"
        ply_io.write_ply(path, {"x": np.array([1.0]), "y": np.array([2.0]),
                                "z": np.array([3.0]),
                                "timestamp": np.array([0.25])})
        cols = ply_io.read_ply(path)
        assert cols["timestamp"][0] == 0.25


class TestTrajectoryIO:
    def test_ct_trajectory_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        frames = []
        for i in range(5):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            frames.append(TrajectoryFrame(
                Pose(q, rng.normal(size=3), float(i), i),
                Pose(q, rng.normal(size=3), float(i) + 0.5, i)))
        path = tmp_path / "traj.txt"
        tio.save_trajectory_frames(path, frames)
        loaded = tio.load_trajectory_frames(path)
        assert len(loaded) == 5
        for a, b in zip(frames, loaded):
            assert a.begin_pose.location_distance(b.begin_pose) < 1e-12
            assert a.begin_pose.angular_distance(b.begin_pose) < 1e-6
            assert abs(a.end_pose.timestamp - b.end_pose.timestamp) < 1e-12

    def test_kitti_format_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        poses = []
        for i in range(4):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            poses.append(Pose(q, rng.normal(size=3), float(i), i))
        path = tmp_path / "poses.txt"
        tio.save_poses_kitti_format(path, poses)
        loaded = tio.load_poses_kitti_format(path)
        for a, b in zip(poses, loaded):
            assert a.location_distance(b) < 1e-9
            assert a.angular_distance(b) < 1e-5


DRIVING_YAML = """
output_dir: .outputs
dataset_options:
  - dataset: PLY_DIRECTORY
    root_path: /tmp/nonexistent
odometry_options:
  motion_compensation: CONTINUOUS
  initialization: INIT_CONSTANT_VELOCITY
  sample_voxel_size: 1.5
  voxel_size: 0.5
  max_distance: 100.0
  distance_error_threshold: 5.0
  neighborhood_strategy:
    type: NEAREST_NEIGHBOR_STRATEGY
    max_num_neighbors: 20
    min_num_neighbors: 10
  map_options:
    map_type: MULTI_RESOLUTION_VOXEL_HASHMAP
    default_radius: 0.75
    resolutions:
      - resolution: 0.8
        max_num_points: 30
        min_distance_between_points: 0.1
  ct_icp_options:
    num_iters_icp: 5
    parametrization: CONTINUOUS_TIME
    distance: POINT_TO_PLANE
    solver: CERES
    max_num_residuals: 900
    weight_alpha: 0.9
    loss_function: CAUCHY
    ls_max_num_iters: 5
    ls_sigma: 0.1
"""


class TestYamlConfig:
    def test_parse_driving_config(self, tmp_path):
        path = tmp_path / "cfg.yaml"
        path.write_text(DRIVING_YAML)
        cfg = load_runner_config(str(path))
        o = cfg.odometry_options
        assert o.sample_voxel_size == 1.5
        assert o.map_options.default_radius == 0.75
        assert len(o.map_options.resolutions) == 1
        assert o.map_options.resolutions[0].resolution == 0.8
        assert o.map_options.resolutions[0].max_num_points == 30
        assert o.ct_icp_options.max_num_residuals == 900
        assert o.ct_icp_options.loss_function == O.LeastSquares.CAUCHY
        assert o.ct_icp_options.solver == O.Solver.CERES
        assert o.neighborhood_strategy.min_num_neighbors == 10
        assert len(cfg.dataset_options) == 1

    def test_unknown_keys_ignored(self):
        opts = yaml_to_odometry_options({"nonexistent_key": 4,
                                         "voxel_size": 0.7})
        assert opts.voxel_size == 0.7

    def test_profiles_match_reference_defaults(self):
        d = O.default_driving_profile()
        assert d.ct_icp_options.num_iters_icp == 5
        assert d.ct_icp_options.solver == O.Solver.CERES
        r = O.robust_driving_profile()
        assert r.robust_registration and r.robust_num_attempts == 10
        assert r.ct_icp_options.ls_max_num_iters == 20
        n = O.default_robust_outdoor_low_inertia()
        assert n.ct_icp_options.num_iters_icp == 30
        assert n.ct_icp_options.max_num_residuals == 600
        assert n.initialization == O.Initialization.INIT_NONE


class TestGeometryUtils:
    """slam::geometry parity (reference geometry.h / geometry.cxx)."""

    def test_orthogonal_procrustes_recovers_rigid_transform(self):
        from ct_icp_tpu.core.geometry import orthogonal_procrustes
        rng = np.random.default_rng(3)
        ref = rng.normal(size=(50, 3))
        q_gt = s3n.quat_from_rotvec(np.array([0.2, -0.1, 0.4]))
        t_gt = np.array([1.0, -2.0, 0.5])
        tgt = s3n.quat_rotate(q_gt, ref) + t_gt
        quat, tr = orthogonal_procrustes(ref, tgt)
        np.testing.assert_allclose(tr, t_gt, atol=1e-10)
        assert s3n.angular_distance_deg(quat, q_gt) < 1e-6
        # reflection fix: degenerate planar set still yields det(R)=+1
        ref2 = ref.copy()
        ref2[:, 2] = 0.0
        tgt2 = s3n.quat_rotate(q_gt, ref2) + t_gt
        quat2, _ = orthogonal_procrustes(ref2, tgt2)
        r2 = s3n.quat_to_matrix(quat2)
        assert np.linalg.det(r2) > 0.0

    def test_geometric_median_robust_to_outlier(self):
        from ct_icp_tpu.core.geometry import geometric_median
        pts = np.zeros((11, 3))
        pts[:10] = np.random.default_rng(4).normal(scale=0.01, size=(10, 3))
        pts[10] = [100.0, 0.0, 0.0]  # gross outlier drags the mean, not the median
        mean, median = geometric_median(pts)
        assert np.linalg.norm(mean) > 5.0
        assert np.linalg.norm(median) < 0.1


class TestTrajectoryMetrics:
    """slam::ComputeTrajectoryMetrics parity (reference eval.cxx:184-292)."""

    def _straight_gt(self, n=60, step=0.5):
        poses = []
        for i in range(n):
            poses.append(Pose(tr=np.array([i * step, 0.0, 0.0]),
                              timestamp=float(i)))
        return poses

    def test_perfect_trajectory(self):
        from ct_icp_tpu.evaluation.trajectory_metrics import (
            compute_trajectory_metrics)
        gt = self._straight_gt()
        m = compute_trajectory_metrics(gt, [p.copy() for p in gt],
                                       segment_length=10.0)
        assert m.mean_ate < 1e-9
        assert m.max_ate < 1e-9
        assert m.total_distance == pytest.approx(59 * 0.5)
        assert len(m.trajectory_segments) >= 2
        assert m.segment_mean_ate < 1e-9

    def test_rigidly_displaced_trajectory_has_zero_ate(self):
        # a global rigid offset is removed by the Procrustes alignment
        from ct_icp_tpu.evaluation.trajectory_metrics import (
            compute_trajectory_metrics)
        gt = self._straight_gt()
        q = s3n.quat_from_rotvec(np.array([0.0, 0.0, 0.3]))
        est = []
        for p in gt:
            est.append(Pose(q.copy(), s3n.quat_rotate(q, p.tr)
                            + np.array([5.0, -3.0, 1.0]),
                            timestamp=p.timestamp))
        m = compute_trajectory_metrics(gt, est, segment_length=10.0)
        assert m.mean_ate < 1e-9

    def test_local_error_shows_in_segments(self):
        from ct_icp_tpu.evaluation.trajectory_metrics import (
            compute_trajectory_metrics, generate_trajectory_metrics_yaml)
        gt = self._straight_gt()
        est = [p.copy() for p in gt]
        est[30].tr = est[30].tr + np.array([0.0, 0.8, 0.0])  # a local kink
        m = compute_trajectory_metrics(gt, est, segment_length=10.0)
        assert m.max_ate_idx == 30
        assert m.segment_mean_ate > 0.01
        y = generate_trajectory_metrics_yaml(m)
        assert "SEGMENT_MEAN_ATE" in y and "TOTAL_DISTANCE" in y
