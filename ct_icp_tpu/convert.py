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


def main(argv=None):
    from ct_icp_tpu.datasets.dataset import (Dataset, DatasetEnum,
                                             DatasetOptions)
    p = argparse.ArgumentParser(
        description="Convert any supported dataset to a PLY directory "
                    "(rosbag_to_ply analog)")
    p.add_argument("--dataset", required=True,
                   help="Dataset type (NCLT, KITTI_raw, SYNTHETIC, ...)")
    p.add_argument("--root-path", required=True)
    p.add_argument("--sequence", default=None, help="Only this sequence")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--max-frames", type=int, default=-1)
    args = p.parse_args(argv)

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
