"""Host-side retention of the last-N inserted frame clouds.

TPU-native counterpart of the reference map's frame store
(``MultipleResolutionVoxelMap::frame_id_to_frame`` + ``frame_indices_`` with
``Options::max_frames_to_keep``, reference include/ct_icp/map.h:154-253):
each inserted frame keeps its point cloud and its continuous-time pose pair;
frames beyond the retention window drop their cloud.

Re-design notes (vs the reference):
  * The reference deep-copies the *world-point* cloud into the map. Here the
    ring stores the RAW scan (already on the host — zero copies) plus the
    frame's (begin, end) poses; world points materialize on demand via the
    same continuous transform the reference applies at insert
    (``PointCloud::RawPointsToWorldPoints``, map.h:163-183). This keeps the
    hot streaming path free of device->host point readbacks.
  * Retention is by *inserted* frames (frames the insertion heuristics
    skipped are not retained), matching the reference, where only
    InsertPointCloud populates the store.
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional

import numpy as np

from ct_icp_tpu.core.pose import Pose, TrajectoryFrame


class FrameRing:
    """Ring of the last ``max_frames`` inserted frame clouds."""

    def __init__(self, max_frames: int):
        self.max_frames = int(max_frames)
        self._frames: "collections.OrderedDict[int, dict]" = \
            collections.OrderedDict()

    def __len__(self) -> int:
        return len(self._frames)

    @property
    def enabled(self) -> bool:
        return self.max_frames > 0

    def frame_ids(self) -> List[int]:
        return list(self._frames.keys())

    def push(self, frame_id: int, xyz: np.ndarray, timestamps: np.ndarray,
             frame: TrajectoryFrame) -> None:
        """Retain one inserted frame (reference map.h:246-253: append, then
        drop the oldest clouds past max_frames_to_keep)."""
        if not self.enabled:
            return
        ts = np.asarray(timestamps, np.float64)
        self._frames[int(frame_id)] = {
            "xyz": np.asarray(xyz),
            "timestamps": ts,
            "begin_pose": frame.begin_pose.copy(),
            "end_pose": frame.end_pose.copy(),
            "min_t": float(ts.min()) if ts.size else 0.0,
            "max_t": float(ts.max()) if ts.size else 0.0,
        }
        while len(self._frames) > self.max_frames:
            self._frames.popitem(last=False)

    def get_frame(self, frame_id: int, world: bool = True
                  ) -> Optional[Dict[str, np.ndarray]]:
        """One retained frame; with ``world=True`` the world points are
        computed by the continuous transform (RawPointsToWorldPoints analog,
        reference pointcloud.h:249-264)."""
        rec = self._frames.get(int(frame_id))
        if rec is None:
            return None
        out = dict(rec)
        if world:
            bp: Pose = rec["begin_pose"]
            ep: Pose = rec["end_pose"]
            out["world"] = bp.continuous_transform(
                rec["xyz"], ep, rec["timestamps"])
        return out

    def update_trajectory(self, frames: List[TrajectoryFrame]) -> None:
        """Re-point the retained poses at an updated trajectory (the analog
        of the reference ISlamMap::UpdateTrajectory capability, map.h:64-70):
        after e.g. a bundle-adjustment pass, retained clouds replay against
        the corrected poses."""
        by_id = {}
        for f in frames:
            fid = f.end_pose.frame_id
            if fid is not None and fid >= 0:
                by_id[int(fid)] = f
        for fid, rec in self._frames.items():
            f = by_id.get(fid)
            if f is not None:
                rec["begin_pose"] = f.begin_pose.copy()
                rec["end_pose"] = f.end_pose.copy()

    def all_world_points(self) -> np.ndarray:
        """Concatenated world points of every retained frame (export /
        replay surface; reference GetMapPoints-over-frames usage)."""
        parts = [self.get_frame(fid)["world"] for fid in self._frames]
        if not parts:
            return np.zeros((0, 3), np.float64)
        return np.concatenate(parts, axis=0)

    def clear(self) -> None:
        self._frames.clear()
