"""Online odometry front-end — the ROS-node capability without ROS.

Replicates the behavior of the reference's ROS odometry node
(reference ros/catkin_ws/ct_icp_odometry/src/ct_icp_odometry_node.cxx):
  * a streaming callback API for incoming point clouds,
  * timestamp-consistency gating against the expected frame period
    (node r_dt in [0.95, 1.05] of the expected period, cxx:134-165),
  * per-frame publication of the odometry pose + world points + logged values
    through Notifier channels (the pub/sub analog of ROS topics),
  * on failure: dump the initial frame, current map and failing frame as PLY
    for postmortem, then stop (cxx:208-246).

Use together with odometry/concurrent.py's PrefetchIterator/Actor for a fully
asynchronous input pipeline.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from ct_icp_tpu.config.options import OdometryOptions
from ct_icp_tpu.io.ply import write_ply_xyzt
from ct_icp_tpu.odometry.concurrent import Notifier
from ct_icp_tpu.odometry.odometry import Odometry, RegistrationSummary


@dataclasses.dataclass
class OnlineOdometryConfig:
    odometry_options: OdometryOptions = dataclasses.field(
        default_factory=OdometryOptions)
    expected_frame_period: float = 0.1    # seconds; <=0 disables gating
    check_timestamp_consistency: bool = True
    consistency_ratio_min: float = 0.95   # reference cxx:151
    consistency_ratio_max: float = 1.05
    failure_output_dir: Optional[str] = None
    stop_on_failure: bool = True


class OnlineOdometry:
    """Streaming odometry node: feed scans, observe poses."""

    def __init__(self, config: OnlineOdometryConfig):
        self.config = config
        self.odometry = Odometry(config.odometry_options)
        self.pose_output = Notifier()       # ~ /ct_icp/odom
        self.points_output = Notifier()     # ~ /ct_icp/world_points
        self.monitor_output = Notifier()    # ~ /monitor/entry (logged values)
        self.stopped = False
        self._frame_count = 0
        self._last_timestamp: Optional[float] = None
        self._initial_frame: Optional[tuple] = None

    def on_pointcloud(self, xyz: np.ndarray, timestamps: np.ndarray
                      ) -> Optional[RegistrationSummary]:
        """Process one incoming scan; returns the summary (None if gated)."""
        if self.stopped:
            return None
        cfg = self.config

        # ---- timestamp-consistency gate (reference cxx:134-165)
        t0 = float(np.min(timestamps))
        if (cfg.check_timestamp_consistency and cfg.expected_frame_period > 0
                and self._last_timestamp is not None):
            r_dt = (t0 - self._last_timestamp) / cfg.expected_frame_period
            if not (cfg.consistency_ratio_min <= r_dt
                    <= cfg.consistency_ratio_max):
                self.monitor_output.notify(
                    {"event": "frame_dropped", "r_dt": r_dt})
                self._last_timestamp = t0
                return None
        self._last_timestamp = t0

        if self._initial_frame is None:
            self._initial_frame = (np.array(xyz), np.array(timestamps))

        summary = self.odometry.register_frame(
            xyz, timestamps, frame_id=self._frame_count)
        self._frame_count += 1

        if not summary.success:
            self._on_failure(xyz, timestamps, summary)
            return summary

        self.pose_output.notify({
            "frame_id": self._frame_count - 1,
            "begin_pose": summary.frame.begin_pose.copy(),
            "end_pose": summary.frame.end_pose.copy(),
        })
        if summary.corrected_points is not None:
            self.points_output.notify(summary.corrected_points)
        self.monitor_output.notify(dict(summary.logged_values))
        return summary

    def _on_failure(self, xyz, timestamps, summary: RegistrationSummary):
        """Reference cxx:208-246: dump initial frame, map and failing frame."""
        self.monitor_output.notify(
            {"event": "failure", "message": summary.error_message})
        out = self.config.failure_output_dir
        if out:
            out = Path(out)
            out.mkdir(parents=True, exist_ok=True)
            if self._initial_frame is not None:
                write_ply_xyzt(out / "initial_frame.ply",
                               self._initial_frame[0], self._initial_frame[1])
            write_ply_xyzt(out / "frame.ply", xyz, timestamps)
            map_pts = self.odometry.get_map_points(0)
            if map_pts.shape[0]:
                write_ply_xyzt(out / "map.ply", map_pts[:, :3])
        if self.config.stop_on_failure:
            self.stopped = True
