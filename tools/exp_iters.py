"""How many ICP outer iterations do steady-state driving frames use?

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_iters.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
from bench import build_scene, straight_trajectory


def main():
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry

    scene = build_scene()
    traj = straight_trajectory(40, 4.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    odo = Odometry(default_driving_profile())
    iters, nres = [], []
    for i in range(32):
        fr = acq.frame(i)
        s = odo.register_frame(fr["xyz"], fr["timestamps"])
        iters.append(s.icp_summary.num_iters)
        nres.append(s.icp_summary.num_residuals_used)
    print("iters per frame:", iters, flush=True)
    print("residuals used :", nres[:8], "...", flush=True)
    print("mean iters (frames 8+):", np.mean(iters[8:]), flush=True)


if __name__ == "__main__":
    main()
