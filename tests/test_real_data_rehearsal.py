"""End-to-end rehearsal of the real-data path (reference
testint_datasets.cpp:40-114): on-disk fixtures shaped EXACTLY like
KITTI_raw (root/00/frames/*.ply + 00/00.txt GT in the camera frame) and
NCLT (root/<seq>_vel/<seq>/velodyne_hits.bin + groundtruth csv), driven
through the full CLI (`python -m ct_icp_tpu.cli -c cfg.yaml`) — discovery
-> decode -> calibration conjugation -> odometry -> eval -> metrics.yaml —
with RPE/APE asserted on the result.

The fixtures are synthesized as the exact INVERSE of each loader's
transform chain, so a correct pipeline reproduces the ground truth:
KITTI PLYs are pre-rotated by the inverse of the 0.205 deg vertical-angle
correction and the GT file is conjugated into the camera frame
(P_file = C P C^-1); NCLT hits are encoded with the u16/5 mm quantizer the
decoder inverts, and the GT csv is conjugated into the body frame.
"""

import struct

import numpy as np
import pytest
import yaml

from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.core.pose import Pose
from ct_icp_tpu.datasets import dataset as D
from ct_icp_tpu.datasets import synthetic as syn
from ct_icp_tpu.io.ply import write_ply_xyzt
from ct_icp_tpu.io.trajectory_io import save_poses_kitti_format

from test_odometry import make_acquisition


def _inverse_vertical_correction(xyz: np.ndarray) -> np.ndarray:
    """Pre-rotate points by -0.205 deg about (p x uz) so the KITTI_raw
    frame filter (kitti_frame_filter) restores them (error is second order
    in the 0.0036 rad angle: < 1 mm at 60 m)."""
    uz = np.array([0.0, 0.0, 1.0])
    axis = np.cross(xyz, uz)
    axis = axis / np.maximum(np.linalg.norm(axis, axis=-1, keepdims=True),
                             1e-12)
    q = s3n.quat_from_rotvec(axis * (-np.deg2rad(0.205)))
    return s3n.quat_rotate(q, xyz)


def _small_options_yaml() -> dict:
    """YAML equivalent of tests.test_odometry.small_options()."""
    return {
        "max_scan_points": 8192,
        "max_subsampled_points": 8192,
        "max_keypoints": 2048,
        "max_dirty_voxels": 4096,
        "init_num_frames": 5,
        "max_distance": 100.0,
        "map_options": {
            "default_radius": 0.8,
            "resolutions": [
                {"resolution": 0.2, "min_distance_between_points": 0.03,
                 "max_num_points": 30, "capacity_log2": 16},
                {"resolution": 0.5, "min_distance_between_points": 0.1,
                 "max_num_points": 25, "capacity_log2": 15},
                {"resolution": 1.5, "min_distance_between_points": 0.15,
                 "max_num_points": 25, "capacity_log2": 13},
            ],
        },
        "ct_icp_options": {
            "num_iters_icp": 6, "ls_max_num_iters": 2,
            "min_number_neighbors": 10, "min_num_residuals": 50,
        },
    }


def _run_cli(cfg: dict, tmp_path, max_frames: int):
    from ct_icp_tpu import cli
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = cli.main(["-c", str(cfg_path), "--max-frames", str(max_frames),
                   "--output-dir", str(tmp_path / "out")])
    assert rc == 0
    return tmp_path / "out"


NUM_FRAMES = 10


def write_kitti_raw_fixture(root, num_frames=NUM_FRAMES):
    """root/00/frames/frame_%04d.ply + root/00/00.txt, GT in the camera
    frame exactly as the KITTI devkit ships it (loader conjugates by
    kitti_calib and stamps (i+0.5)*0.1, dataset.cpp:998-1098)."""
    acq = make_acquisition(seed=11, num_frames=num_frames)
    seq_dir = root / "00"
    frames_dir = seq_dir / "frames"
    frames_dir.mkdir(parents=True)
    calib = D.kitti_calib(0)
    mid0 = None
    gt_file_poses = []
    for i in range(num_frames):
        fr = acq.frame(i)
        t_mid = 0.5 * (fr["begin_pose"].timestamp + fr["end_pose"].timestamp)
        mid = acq.trajectory.interpolate_pose(t_mid)
        if mid0 is None:
            # KITTI GT is relative to the first scan's pose: identity at
            # frame 0 MID — matching the estimate, whose frame-0 timestamps
            # are collapsed (first-frame collapse, odometry.cpp:333-382) so
            # its trajectory is identity at frame 0's mid
            mid0 = mid
        write_ply_xyzt(frames_dir / f"frame_{i:04d}.ply",
                       _inverse_vertical_correction(fr["xyz"]),
                       fr["timestamps"])
        rel = mid0.inverse() * mid
        m_file = calib @ rel.matrix() @ np.linalg.inv(calib)
        gt_file_poses.append(Pose.from_matrix(m_file, t_mid, i))
    save_poses_kitti_format(seq_dir / "00.txt", gt_file_poses)
    return acq


@pytest.mark.slow
def test_kitti_raw_fixture_through_cli(tmp_path):
    root = tmp_path / "kitti_raw"
    write_kitti_raw_fixture(root)

    cfg = {
        "dataset_options": [
            {"dataset": "KITTI_raw", "root_path": str(root)},
        ],
        "odometry_options": _small_options_yaml(),
        "progress_bar": False,
        "compute_metrics_period": 0,
        "generate_directory_prefix": False,
    }
    out = _run_cli(cfg, tmp_path, NUM_FRAMES)

    metrics_path = out / "metrics.yaml"
    assert metrics_path.exists(), "runner must write metrics.yaml"
    metrics = yaml.safe_load(metrics_path.read_text())
    assert "00" in metrics
    m = metrics["00"]
    # the synthetic room is ~10 m across: mis-calibration or a broken
    # decode chain produces meter-scale APE; a correct pipeline tracks to
    # centimeters
    assert m["MEAN_APE"] < 0.25, m
    assert m["MAX_APE"] < 0.5, m
    # trajectory artifacts written like the reference runner
    assert (out / "00" / "00.txt").exists()
    assert (out / "00" / "00_ct_trajectory.txt").exists()


def write_nclt_fixture(root, num_frames, batches_per_frame=4,
                       points_per_batch=1500):
    """root/<seq>_vel/<seq>/velodyne_hits.bin + groundtruth csv, encoded
    with the exact inverse of the NCLT decoder (u16 5 mm quantizer,
    magic-number batches, dataset.cpp:385-570) and the GT conjugation
    (body frame = Calib P Calib^-1)."""
    seq = "2012-01-08"
    d = root / f"{seq}_vel" / seq
    d.mkdir(parents=True)

    prims = syn.box_room(half_extent=12.0, height=5.0)
    prims.append(syn.Sphere(np.array([0.0, 0.0, 2.0]), 2.0))
    prims += syn.rectangle([-4, 2, 0], [3, 0, 0], [0, 0, 3])
    scene = syn.Scene(prims)
    traj = syn.circular_trajectory(radius=6.0, height=1.5, num_poses=200,
                                   total_time=num_frames * 0.1 + 0.2,
                                   angle_span=np.pi / 3)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(
            num_points_per_frame=batches_per_frame * points_per_batch,
            frame_duration=0.1, max_range=60.0),
        seed=29)

    calib = D._NCLT_CALIB
    calib_inv = np.linalg.inv(calib)
    begin0 = None
    gt_rows = []
    with open(d / "velodyne_hits.bin", "wb") as f:
        for i in range(num_frames):
            fr = acq.frame(i)
            if begin0 is None:
                begin0 = fr["begin_pose"]
            xyz, ts = fr["xyz"], fr["timestamps"]
            order = np.argsort(ts)
            xyz, ts = xyz[order], ts[order]
            n_b = len(xyz) // batches_per_frame
            for b in range(batches_per_frame):
                pts = xyz[b * n_b:(b + 1) * n_b]
                utime = int(ts[b * n_b] * 1e6)
                f.write(struct.pack("<4H", 44444, 44444, 44444, 44444))
                f.write(struct.pack("<I", len(pts)))
                f.write(struct.pack("<Q", utime))
                f.write(struct.pack("<I", 0))
                enc = np.round((pts + 100.0) / 0.005).astype(np.uint16)
                rec = np.zeros((len(pts),),
                               np.dtype([("x", "<u2"), ("y", "<u2"),
                                         ("z", "<u2"), ("pad", "u1", (2,))]))
                rec["x"], rec["y"], rec["z"] = enc[:, 0], enc[:, 1], enc[:, 2]
                f.write(rec.tobytes())
            # GT row at mid-frame (csv: time_us, x, y, z, roll, pitch, yaw)
            t_mid = 0.5 * (fr["begin_pose"].timestamp
                           + fr["end_pose"].timestamp)
            mid = acq.trajectory.interpolate_pose(t_mid)
            rel = begin0.inverse() * mid
            m_body = calib @ rel.matrix() @ calib_inv
            # euler zyx from rotation matrix (the decoder rebuilds
            # Rz(yaw) Ry(pitch) Rx(roll))
            R = m_body[:3, :3]
            pitch = -np.arcsin(np.clip(R[2, 0], -1, 1))
            roll = np.arctan2(R[2, 1], R[2, 2])
            yaw = np.arctan2(R[1, 0], R[0, 0])
            gt_rows.append("%d,%.9f,%.9f,%.9f,%.9f,%.9f,%.9f" % (
                int(t_mid * 1e6), m_body[0, 3], m_body[1, 3], m_body[2, 3],
                roll, pitch, yaw))
    (root / seq).mkdir(parents=True, exist_ok=True)
    (root / seq / f"groundtruth_{seq}.csv").write_text("\n".join(gt_rows))
    return seq, batches_per_frame


@pytest.mark.slow
def test_nclt_fixture_through_cli(tmp_path):
    root = tmp_path / "nclt"
    num_frames = 8
    seq, batches_per_frame = write_nclt_fixture(root, num_frames + 1)

    cfg = {
        "dataset_options": [
            {"dataset": "NCLT", "root_path": str(root),
             "nclt_num_aggregated_pc": batches_per_frame},
        ],
        "odometry_options": _small_options_yaml(),
        "progress_bar": False,
        "compute_metrics_period": 0,
        "generate_directory_prefix": False,
    }
    out = _run_cli(cfg, tmp_path, num_frames)

    metrics_path = out / "metrics.yaml"
    assert metrics_path.exists()
    metrics = yaml.safe_load(metrics_path.read_text())
    assert seq in metrics
    m = metrics[seq]
    assert m["MEAN_APE"] < 0.25, m
    assert m["MAX_APE"] < 0.5, m
