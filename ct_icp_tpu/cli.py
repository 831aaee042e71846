"""run_odometry CLI (reference command/cmd_run_odometry.cpp:37-74).

Usage:
    python -m ct_icp_tpu.cli -c config.yaml
    python -m ct_icp_tpu.cli --profile driving --dataset PLY_DIRECTORY \
        --root-path /data/seq --max-frames 500
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    if os.environ.get("CT_FORCE_CPU"):
        # Some environments register a remote-accelerator PJRT plugin from
        # sitecustomize and force jax_platforms there, clobbering a
        # shell-level JAX_PLATFORMS=cpu. This knob overrides the config
        # directly (must run before any backend initialization).
        import jax
        jax.config.update("jax_platforms", "cpu")
    parser = argparse.ArgumentParser(
        prog="run_odometry",
        description="TPU-native CT-ICP LiDAR odometry runner")
    parser.add_argument("-c", "--config", help="Path to the yaml config file")
    parser.add_argument("--profile",
                        choices=["driving", "robust_driving", "robust_outdoor"],
                        default="driving",
                        help="Default options profile when no config is given")
    parser.add_argument("--dataset", default=None,
                        help="Dataset type (KITTI_raw, NCLT, PLY_DIRECTORY, ...)")
    parser.add_argument("--root-path", default=None, help="Dataset root path")
    parser.add_argument("--sequence", default=None, help="Only this sequence")
    parser.add_argument("--max-frames", type=int, default=-1)
    parser.add_argument("--output-dir", default=".outputs")
    parser.add_argument("--no-output", action="store_true")
    parser.add_argument("--html-viewer", action="store_true",
                        help="Write an interactive standalone viewer.html "
                             "per sequence (map + trajectory; the viz3d "
                             "window analog)")
    parser.add_argument("--trace-dir", default=None, metavar="DIR",
                        help="Capture a JAX profiler trace of the run into "
                             "DIR (open with TensorBoard / Perfetto) — the "
                             "TPU analog of the reference's per-phase chrono "
                             "instrumentation (SlamCore/timer.h)")
    args = parser.parse_args(argv)

    from ct_icp_tpu.config import options as O
    from ct_icp_tpu.config.yaml_config import (RunnerConfig,
                                               load_runner_config)
    from ct_icp_tpu.runner import OdometryRunner

    if args.config:
        cfg = load_runner_config(args.config)
    else:
        profile = {
            "driving": O.default_driving_profile,
            "robust_driving": O.robust_driving_profile,
            "robust_outdoor": O.default_robust_outdoor_low_inertia,
        }[args.profile]()
        cfg = RunnerConfig(odometry_options=profile)

    if args.dataset:
        from ct_icp_tpu.datasets.dataset import DatasetEnum, DatasetOptions
        dopt = DatasetOptions(dataset=DatasetEnum[args.dataset],
                              root_path=args.root_path or "")
        if args.sequence:
            dopt.sequence_options = [{"sequence_name": args.sequence}]
        cfg.dataset_options = [dopt]
    if args.max_frames > 0:
        cfg.max_frames = args.max_frames
    if args.no_output:
        cfg.output_results = False
    if args.html_viewer:
        cfg.html_viewer = True
    cfg.output_dir = args.output_dir

    if not cfg.dataset_options:
        parser.error("No datasets configured (use -c config.yaml or --dataset)")

    runner = OdometryRunner(cfg)
    if args.trace_dir:
        import jax
        with jax.profiler.trace(args.trace_dir):
            ok = runner.run()
    else:
        ok = runner.run()
    for name, r in runner.results.items():
        line = (f"[{name}] frames={r.num_frames} "
                f"avg={r.avg_runtime_ms:.1f} ms/frame")
        if r.metrics is not None:
            line += (f" MEAN_RPE={r.metrics.mean_rpe:.4f}% "
                     f"MEAN_APE={r.metrics.mean_ape:.3f} m")
        print(line)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
