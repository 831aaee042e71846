"""Checkpoint / resume for the odometry state.

A capability the reference lacks (SURVEY.md §5 — it only has trajectory dumps
and dataset SetInitFrame): serialize the full odometry state — map arrays,
trajectory, map origin, insertion/robust state, RNG — and restore it to
continue a run bit-exactly from frame k.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import TYPE_CHECKING

import numpy as np

import jax.numpy as jnp

from ct_icp_tpu.core.pose import Pose, TrajectoryFrame
from ct_icp_tpu.mapping import voxel_map as vm

if TYPE_CHECKING:
    from ct_icp_tpu.odometry.odometry import Odometry

FORMAT_VERSION = 1


def _base_path(path) -> str:
    """Checkpoint base name: '.npz' stripped so save('x') / load('x.npz')
    (and vice versa) find the same pair of files."""
    base = str(path)
    return base[:-4] if base.endswith(".npz") else base


def save_checkpoint(odometry: "Odometry", path) -> None:
    """Write the full odometry state to ``path`` (an .npz + sidecar json)."""
    path = Path(_base_path(path))
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    for i, lvl in enumerate(odometry.map_state.levels):
        for name in lvl._fields:
            if name == "win":
                continue  # derived from keys+count; rebuilt on load
            arrays[f"level{i}_{name}"] = np.asarray(getattr(lvl, name))
    traj = np.array([
        np.concatenate([
            f.begin_pose.quat, f.begin_pose.tr, [f.begin_pose.timestamp],
            [float(f.begin_pose.frame_id)],
            f.end_pose.quat, f.end_pose.tr, [f.end_pose.timestamp],
            [float(f.end_pose.frame_id)],
        ]) for f in odometry.trajectory
    ]).reshape(-1, 18) if odometry.trajectory else np.zeros((0, 18))
    arrays["trajectory"] = traj
    arrays["origin"] = odometry.origin
    meta = {
        "format_version": FORMAT_VERSION,
        "num_levels": len(odometry.map_state.levels),
        "registered_frames": odometry.registered_frames,
        "robust_num_consecutive_failures": odometry.robust_num_consecutive_failures,
        "suspect_registration_error": odometry.suspect_registration_error,
        "next_robust_level": odometry.next_robust_level,
        "insertion_tracker": {
            "last_inserted_frame_idx": odometry.insertion_tracker.last_inserted_frame_idx,
            "cum_distance_since_insertion": odometry.insertion_tracker.cum_distance_since_insertion,
            "cum_orientation_change_since_insertion":
                odometry.insertion_tracker.cum_orientation_change_since_insertion,
            "skipped_frames": odometry.insertion_tracker.skipped_frames,
            "total_insertions": odometry.insertion_tracker.total_insertions,
        },
        "rng_state": None,  # stored via pickle below (BitGenerator state dict)
    }
    np.savez_compressed(str(path) + ".npz", **arrays)
    sidecar = {"meta": meta,
               "rng": pickle.dumps(odometry.rng.bit_generator.state).hex(),
               "prev_frame": pickle.dumps(
                   odometry.default_motion_model.previous_frame).hex()}
    Path(str(path) + ".meta.json").write_text(json.dumps(sidecar["meta"] | {
        "rng": sidecar["rng"], "prev_frame": sidecar["prev_frame"]}))


def load_checkpoint(odometry: "Odometry", path) -> None:
    """Restore state written by save_checkpoint into ``odometry``."""
    path = Path(_base_path(path))
    data = np.load(str(path) + ".npz")
    sidecar = json.loads(Path(str(path) + ".meta.json").read_text())
    assert sidecar["format_version"] == FORMAT_VERSION

    levels = []
    for i in range(sidecar["num_levels"]):
        fields = {name: jnp.asarray(data[f"level{i}_{name}"])
                  for name in vm.MapLevel._fields if name != "win"}
        fields["win"] = vm.build_window(fields["keys"], fields["count"])
        levels.append(vm.MapLevel(**fields))
    odometry.map_state = vm.MapState(levels=tuple(levels))

    odometry.trajectory = []
    for row in data["trajectory"]:
        odometry.trajectory.append(TrajectoryFrame(
            Pose(row[0:4], row[4:7], float(row[7]), int(row[8])),
            Pose(row[9:13], row[13:16], float(row[16]), int(row[17]))))
    odometry.origin = np.asarray(data["origin"], np.float64)
    odometry.registered_frames = sidecar["registered_frames"]
    odometry.robust_num_consecutive_failures = \
        sidecar["robust_num_consecutive_failures"]
    odometry.suspect_registration_error = sidecar["suspect_registration_error"]
    odometry.next_robust_level = sidecar["next_robust_level"]
    it = sidecar["insertion_tracker"]
    for k, v in it.items():
        setattr(odometry.insertion_tracker, k, v)
    odometry.rng.bit_generator.state = pickle.loads(
        bytes.fromhex(sidecar["rng"]))
    odometry.default_motion_model.previous_frame = pickle.loads(
        bytes.fromhex(sidecar["prev_frame"]))
