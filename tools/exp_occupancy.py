"""Occupied-candidate-voxel histogram for the robust (nv=2) search.

How many of the 125 candidate voxels around each keypoint are actually
occupied? Sets the safe ceiling for SolverStatics.max_candidate_voxels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_occupancy.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax.numpy as jnp


def main():
    import bench
    from ct_icp_tpu.config.options import robust_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry.odometry import Odometry
    from ct_icp_tpu.ops import voxel as vx

    o = robust_driving_profile()
    scene = bench.build_scene()
    traj = bench.straight_trajectory(200, 2.0, speed=8.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    odo = Odometry(o)
    for i in range(10):
        fr = acq.frame(i)
        odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)

    # keypoints of the NEXT frame, world-placed with the last pose
    fr = acq.frame(10)
    prep = odo.prepare_frame(fr["xyz"], fr["timestamps"], 10)
    from ct_icp_tpu.odometry import pipeline as pl
    import jax
    raw, alphas = jax.jit(pl.unpack_scan)(prep["scan_dev"])
    from ct_icp_tpu.ops import sampling as smp
    idx, ok, _ = smp.voxel_subsample_indices(
        raw, jnp.arange(raw.shape[0]) < prep["n"],
        jnp.float32(o.sample_voxel_size), o.max_keypoints)
    kp = raw[idx]
    last = odo.trajectory[-1]
    kp_world = kp + jnp.asarray(last.end_pose.tr - odo.origin, jnp.float32)

    level = odo.map_state.levels[0]
    res = o.map_options.resolutions[0].resolution
    offs = vm._neighbor_offsets(2)
    coords = (vx.voxel_coords(kp_world, jnp.float32(res))[:, None, :]
              + offs[None, :, :])
    slots, cnt = vm.find_slots_with_count(level, coords)
    occ = np.asarray(((slots >= 0) & (cnt > 0)))[np.asarray(ok)]
    per_kp = occ.sum(axis=1)
    print("keypoints:", per_kp.shape[0], flush=True)
    for q in (50, 90, 95, 99, 100):
        print(f"p{q}: {np.percentile(per_kp, q):.0f}", flush=True)


if __name__ == "__main__":
    main()
