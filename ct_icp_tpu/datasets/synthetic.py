"""Synthetic scenes: geometric primitives + a GT trajectory -> simulated scans.

Counterpart of the reference's synthetic-scene subsystem
(reference include/SlamCore/experimental/synthetic.h:1-246,
src/SlamCore/experimental/synthetic.cxx), which doubles as the test fixture:
primitives (triangle / line / sphere / ball) sampled into point clouds, a
Scene aggregating them, and a SyntheticSensorAcquisition producing per-frame
point clouds with exact per-point interpolated-pose timestamps, plus uniform
pose-noise injection (synthetic.h:233-242).

Scenes can be described as plain dicts (the YAML surface of config/yaml.py
parses the reference-style scene files into these).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.core.pose import Pose
from ct_icp_tpu.core.trajectory import LinearContinuousTrajectory


class Primitive:
    def sample(self, n: int, rng) -> np.ndarray:
        raise NotImplementedError

    def area_weight(self) -> float:
        return 1.0


@dataclasses.dataclass
class Triangle(Primitive):
    a: np.ndarray
    b: np.ndarray
    c: np.ndarray

    def sample(self, n, rng):
        u = rng.uniform(0, 1, (n, 1))
        v = rng.uniform(0, 1, (n, 1))
        flip = (u + v) > 1.0
        u = np.where(flip, 1.0 - u, u)
        v = np.where(flip, 1.0 - v, v)
        return (np.asarray(self.a) + u * (np.asarray(self.b) - np.asarray(self.a))
                + v * (np.asarray(self.c) - np.asarray(self.a)))

    def area_weight(self):
        ab = np.asarray(self.b) - np.asarray(self.a)
        ac = np.asarray(self.c) - np.asarray(self.a)
        return 0.5 * float(np.linalg.norm(np.cross(ab, ac)))


@dataclasses.dataclass
class Line(Primitive):
    a: np.ndarray
    b: np.ndarray

    def sample(self, n, rng):
        t = rng.uniform(0, 1, (n, 1))
        return np.asarray(self.a) + t * (np.asarray(self.b) - np.asarray(self.a))

    def area_weight(self):
        return float(np.linalg.norm(np.asarray(self.b) - np.asarray(self.a)))


@dataclasses.dataclass
class Sphere(Primitive):
    center: np.ndarray
    radius: float

    def sample(self, n, rng):
        v = rng.normal(size=(n, 3))
        v /= np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return np.asarray(self.center) + self.radius * v

    def area_weight(self):
        return 4.0 * np.pi * self.radius ** 2


@dataclasses.dataclass
class Ball(Primitive):
    center: np.ndarray
    radius: float

    def sample(self, n, rng):
        v = rng.normal(size=(n, 3))
        v /= np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        r = self.radius * rng.uniform(0, 1, (n, 1)) ** (1.0 / 3.0)
        return np.asarray(self.center) + r * v

    def area_weight(self):
        return 4.0 * np.pi * self.radius ** 2


def rectangle(corner, edge_u, edge_v) -> List[Triangle]:
    """Axis-aligned wall helper: two triangles spanning corner+u, corner+v."""
    a = np.asarray(corner, dtype=np.float64)
    b = a + np.asarray(edge_u, dtype=np.float64)
    c = a + np.asarray(edge_v, dtype=np.float64)
    d = b + np.asarray(edge_v, dtype=np.float64)
    return [Triangle(a, b, c), Triangle(d, c, b)]


def box_room(half_extent=10.0, height=4.0) -> List[Triangle]:
    """A closed rectangular room: floor, ceiling, four walls."""
    h = half_extent
    tris: List[Triangle] = []
    tris += rectangle([-h, -h, 0], [2 * h, 0, 0], [0, 2 * h, 0])          # floor
    tris += rectangle([-h, -h, height], [2 * h, 0, 0], [0, 2 * h, 0])     # ceiling
    tris += rectangle([-h, -h, 0], [2 * h, 0, 0], [0, 0, height])         # wall y-
    tris += rectangle([-h, h, 0], [2 * h, 0, 0], [0, 0, height])          # wall y+
    tris += rectangle([-h, -h, 0], [0, 2 * h, 0], [0, 0, height])         # wall x-
    tris += rectangle([h, -h, 0], [0, 2 * h, 0], [0, 0, height])          # wall x+
    return tris


class Scene:
    """Aggregate of primitives; samples proportionally to primitive area."""

    def __init__(self, primitives: Sequence[Primitive]):
        self.primitives = list(primitives)
        w = np.array([p.area_weight() for p in self.primitives], dtype=np.float64)
        self.weights = w / max(w.sum(), 1e-12)

    def sample(self, n: int, rng) -> np.ndarray:
        counts = rng.multinomial(n, self.weights)
        parts = [p.sample(int(c), rng)
                 for p, c in zip(self.primitives, counts) if c > 0]
        pts = np.concatenate(parts, axis=0) if parts else np.zeros((0, 3))
        return pts[rng.permutation(pts.shape[0])]


@dataclasses.dataclass
class SyntheticAcquisitionOptions:
    num_points_per_frame: int = 20000
    frame_duration: float = 0.1
    max_range: float = 100.0
    min_range: float = 0.5
    noise_sigma: float = 0.0     # isotropic point noise (meters)


class SyntheticSensorAcquisition:
    """Scene + GT trajectory -> per-frame (raw points, timestamps, gt poses).

    Replicates the reference SyntheticSensorAcquisition semantics
    (synthetic.h:205-228): points are sampled on the scene, stamped with a
    timestamp linear across the sweep, and expressed in the sensor frame of
    the pose interpolated at that timestamp.
    """

    def __init__(self, scene: Scene, trajectory: LinearContinuousTrajectory,
                 options: SyntheticAcquisitionOptions = SyntheticAcquisitionOptions(),
                 seed: int = 0):
        self.scene = scene
        self.trajectory = trajectory
        self.options = options
        self.rng = np.random.default_rng(seed)

    def num_frames(self) -> int:
        span = self.trajectory.timestamps[-1] - self.trajectory.timestamps[0]
        return max(int(np.floor(span / self.options.frame_duration)), 0)

    def frame(self, index: int):
        """Returns dict(xyz [N,3] sensor frame, timestamps [N], begin_pose,
        end_pose) for frame ``index``."""
        o = self.options
        t0 = self.trajectory.timestamps[0] + index * o.frame_duration
        t1 = t0 + o.frame_duration
        n = o.num_points_per_frame
        world = self.scene.sample(2 * n, self.rng)
        ts = self.rng.uniform(t0, t1, world.shape[0])
        ts.sort()
        q, tr = self.trajectory.interpolate_poses(ts)
        qi, ti = s3n.se3_inverse(q, tr)
        raw = s3n.quat_rotate(qi, world) + ti
        rng_d = np.linalg.norm(raw, axis=-1)
        keep = (rng_d >= o.min_range) & (rng_d <= o.max_range)
        raw, ts = raw[keep][:n], ts[keep][:n]
        if o.noise_sigma > 0:
            raw = raw + self.rng.normal(scale=o.noise_sigma, size=raw.shape)
        begin = self.trajectory.interpolate_pose(t0)
        end = self.trajectory.interpolate_pose(t1)
        begin.timestamp, end.timestamp = t0, t1
        return {"xyz": raw, "timestamps": ts,
                "begin_pose": begin, "end_pose": end}


def apply_uniform_noise(poses: Sequence[Pose], rng, tr_scale: float,
                        rot_scale_deg: float) -> List[Pose]:
    """Uniform pose-noise injection (reference ApplyUniformNoise,
    synthetic.h:233-242)."""
    out = []
    for p in poses:
        dtr = rng.uniform(-tr_scale, tr_scale, 3)
        rv = rng.uniform(-1, 1, 3)
        rv = rv / max(np.linalg.norm(rv), 1e-12) * np.deg2rad(
            rng.uniform(0, rot_scale_deg))
        q = s3n.quat_mul(s3n.quat_from_rotvec(rv), p.quat)
        out.append(Pose(s3n.quat_normalize(q), p.tr + dtr, p.timestamp,
                        p.frame_id))
    return out


def circular_trajectory(radius=8.0, height=1.5, num_poses=200,
                        total_time=10.0, angle_span=2 * np.pi
                        ) -> LinearContinuousTrajectory:
    """A smooth circular GT trajectory for tests/benchmarks."""
    poses = []
    for i in range(num_poses):
        s = i / (num_poses - 1)
        ang = s * angle_span
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        yaw = ang + np.pi / 2
        q = s3n.quat_from_rotvec(np.array([0.0, 0.0, yaw]))
        poses.append(Pose(q, pos, timestamp=s * total_time))
    return LinearContinuousTrajectory(poses)
