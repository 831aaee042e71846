"""A/B the robust-path frame cost: outer iters, LM iters, candidate
compaction, map levels. Steady-state medians over a short synthetic run."""
import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from bench import build_scene, straight_trajectory


def run(tag, opt_fn, frames):
    from ct_icp_tpu.odometry import odometry as om
    odo = om.Odometry(opt_fn())
    times = []
    for i, fr in enumerate(frames):
        t0 = time.time()
        odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
        times.append(time.time() - t0)
    med = np.median(times[6:])
    print(f"{tag:42s} median={1000*med:7.1f} ms/frame")
    return med


def main():
    from ct_icp_tpu.config.options import (MultiResolutionVoxelMapOptions,
                                           ResolutionParam,
                                           robust_driving_profile)
    from ct_icp_tpu.datasets import synthetic as syn

    scene = build_scene()
    traj = straight_trajectory(400, 1.7)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(
            num_points_per_frame=100_000, frame_duration=0.1,
            max_range=50.0, min_range=2.0, noise_sigma=0.01),
        seed=3)
    frames = [acq.frame(i) for i in range(14)]

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "base"):
        run("robust_driving (base)", robust_driving_profile, frames)

    if which in ("all", "iters5"):
        def iters5():
            o = robust_driving_profile()
            return dataclasses.replace(o, ct_icp_options=dataclasses.replace(
                o.ct_icp_options, num_iters_icp=5))
        run("num_iters_icp=5", iters5, frames)

    if which in ("all", "lm5"):
        def lm5():
            o = robust_driving_profile()
            return dataclasses.replace(o, ct_icp_options=dataclasses.replace(
                o.ct_icp_options, ls_max_num_iters=5))
        run("ls_max_num_iters=5", lm5, frames)

    if which in ("all", "lvl1"):
        def lvl1():
            o = robust_driving_profile()
            return dataclasses.replace(o, map_options=MultiResolutionVoxelMapOptions(
                resolutions=(ResolutionParam(0.5, 0.1, 40, 19),)))
        run("single 0.5m level", lvl1, frames)


if __name__ == "__main__":
    main()
