"""Dataset -> PLY_DIRECTORY converter.

The capability analog of the reference's rosbag->PLY tool
(reference ros/catkin_ws/slam_roscore/src/rosbag_to_ply.cxx): take any
supported frame source — a dataset the readers understand (NCLT binary
streams, KITTI bins, synthetic scenes, ...) or a stream of structured
arrays (the PointCloud2 analog, io/structured.py) — and write the frames
as a PLY_DIRECTORY sequence (``frame_%05d.ply`` with per-point timestamps),
the layout every other tool in this package (and the reference) consumes.

    python -m ct_icp_tpu.convert --dataset NCLT --root-path /data/nclt \
        --output-dir /data/nclt_ply [--sequence 2012-01-08] [--max-frames N]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ct_icp_tpu.io.ply import write_ply_xyzt


def convert_sequence(sequence, output_dir, max_frames: int = -1,
                     pattern: str = "frame_{:05d}.ply") -> int:
    """Drain ``sequence`` (has_next/next_frame) into ``output_dir``."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    i = 0
    while sequence.has_next() and (max_frames < 0 or i < max_frames):
        fr = sequence.next_frame()
        write_ply_xyzt(out / pattern.format(i),
                       np.asarray(fr["xyz"], np.float32),
                       fr.get("timestamps"))
        i += 1
    return i


def convert_structured_stream(arrays, output_dir, max_frames: int = -1,
                              pattern: str = "frame_{:05d}.ply") -> int:
    """Write an iterable of structured point arrays (PointCloud2 analogs)
    as a PLY directory."""
    from ct_icp_tpu.io.structured import structured_to_frame
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    i = 0
    for arr in arrays:
        if max_frames >= 0 and i >= max_frames:
            break
        xyz, ts = structured_to_frame(arr)
        write_ply_xyzt(out / pattern.format(i), np.asarray(xyz, np.float32),
                       ts)
        i += 1
    return i


def bag_to_ply(bag_path, output_dir, topic=None, max_frames: int = -1,
               pattern: str = "frame_{:05d}.ply") -> int:
    """Convert a rosbag 2.0 file's PointCloud2 stream (+ optional Imu
    stream) to the PLY_DIRECTORY layout — the direct analog of the
    reference's rosbag_to_ply node (rosbag_to_ply.cxx:109-180): frame
    clouds land in ``output_dir/frames/`` with per-point timestamps rebased
    so the first cloud's minimum is 0 (the node's ``initial_pc_timestamp``),
    clouds without a timestamp field get their header stamp relative to the
    first message, and IMU samples go to ``output_dir/imu_data.ply`` (the
    node's separate imu directory)."""
    import struct as _struct
    from ct_icp_tpu.io.rosbag import (parse_imu, parse_pointcloud2, read_bag)
    from ct_icp_tpu.io.structured import structured_to_frame
    from ct_icp_tpu.io.ply import write_ply

    root = Path(output_dir)
    out = root / "frames"
    out.mkdir(parents=True, exist_ok=True)
    i = 0
    t0_header = None   # first message header stamp (initial_nano_seconds)
    t0_points = None   # first cloud's min point timestamp
    imu = []
    # ONE pass over the bag: clouds and IMU samples are collected together
    # (the bag may be bz2-compressed — a second read would double the
    # decompression cost), and IMU-only bags still get their samples out.
    for msg in read_bag(bag_path):
        if msg.msg_type == "sensor_msgs/Imu":
            imu.append(parse_imu(msg.raw))
            continue
        if msg.msg_type and msg.msg_type != "sensor_msgs/PointCloud2":
            continue
        if topic is not None and msg.topic != topic:
            continue
        if max_frames >= 0 and i >= max_frames:
            continue  # keep draining for IMU samples
        try:
            pc = parse_pointcloud2(msg.raw)
        except (ValueError, _struct.error, IndexError):
            if msg.msg_type == "sensor_msgs/PointCloud2":
                raise
            continue  # untyped connection that wasn't a point cloud
        stamp, arr = pc.stamp, pc.to_structured()
        xyz, ts = structured_to_frame(arr)
        if t0_header is None:
            t0_header = stamp
        if ts is not None:
            if t0_points is None:
                t0_points = float(np.min(ts)) if len(ts) else stamp
            ts = np.asarray(ts, np.float64) - t0_points
        else:
            ts = np.full(len(xyz), stamp - t0_header, np.float64)
        write_ply_xyzt(out / pattern.format(i), np.asarray(xyz, np.float32),
                       ts)
        i += 1

    if imu and t0_header is None:
        # no clouds in the bag: rebase IMU to its own first sample
        t0_header = imu[0].stamp
    if imu:
        write_ply(root / "imu_data.ply", {
            "timestamp": np.array([s.stamp - t0_header for s in imu]),
            "qx": np.array([s.orientation[0] for s in imu]),
            "qy": np.array([s.orientation[1] for s in imu]),
            "qz": np.array([s.orientation[2] for s in imu]),
            "qw": np.array([s.orientation[3] for s in imu]),
            "wx": np.array([s.angular_velocity[0] for s in imu]),
            "wy": np.array([s.angular_velocity[1] for s in imu]),
            "wz": np.array([s.angular_velocity[2] for s in imu]),
            "ax": np.array([s.linear_acceleration[0] for s in imu]),
            "ay": np.array([s.linear_acceleration[1] for s in imu]),
            "az": np.array([s.linear_acceleration[2] for s in imu]),
        })
    return i


def main(argv=None):
    from ct_icp_tpu.datasets.dataset import (Dataset, DatasetEnum,
                                             DatasetOptions)
    p = argparse.ArgumentParser(
        description="Convert any supported dataset or a rosbag to a PLY "
                    "directory (rosbag_to_ply analog)")
    p.add_argument("--dataset", default=None,
                   help="Dataset type (NCLT, KITTI_raw, SYNTHETIC, ...)")
    p.add_argument("--bag", default=None,
                   help="rosbag 2.0 file with PointCloud2 messages")
    p.add_argument("--topic", default=None,
                   help="PointCloud2 topic to convert (with --bag)")
    p.add_argument("--root-path", default=None)
    p.add_argument("--sequence", default=None, help="Only this sequence")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-frames", type=int, default=-1)
    args = p.parse_args(argv)

    if args.bag is not None:
        n = bag_to_ply(args.bag, args.output_dir,
                       topic=args.topic, max_frames=args.max_frames)
        print(f"[{args.bag}] wrote {n} frames -> {args.output_dir}")
        return 0 if n else 1
    if args.dataset is None or args.root_path is None:
        p.error("either --bag or --dataset + --root-path is required")

    ds = Dataset.load_dataset(DatasetOptions(
        dataset=DatasetEnum[args.dataset], root_path=args.root_path))
    total = 0
    for seq in ds.sequences:
        name = getattr(seq, "name", None) or getattr(seq, "sequence_name", "")
        if args.sequence and name != args.sequence:
            continue
        out = Path(args.output_dir) / name / "frames" if name \
            else Path(args.output_dir)
        n = convert_sequence(seq, out, args.max_frames)
        print(f"[{name or 'sequence'}] wrote {n} frames -> {out}")
        total += n
    return 0 if total else 1


if __name__ == "__main__":
    raise SystemExit(main())
