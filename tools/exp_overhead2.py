"""Bisect WHAT in register_frame inflates per-dispatch overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_overhead2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def chained(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


@jax.jit
def triv(h):
    return h * jnp.uint32(3) + jnp.uint32(1)


def probe_ms(tag, h):
    t = chained(triv, h)
    print(f"{tag}: {t:7.3f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    h = jnp.asarray(np.arange(55296, dtype=np.uint32))
    probe_ms("fresh                    ", h)

    # 1) allocate map-scale buffers
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.mapping import voxel_map as vm
    o = default_driving_profile()
    ms = vm.make_map(o.map_options)
    jax.block_until_ready(ms.levels[0].points)
    probe_ms("after map alloc (~100MB) ", h)

    # 2) upload a packed scan (u16 [131072,4])
    scan = jnp.asarray(np.zeros((131072, 4), np.uint16))
    jax.block_until_ready(scan)
    probe_ms("after scan upload        ", h)

    # 3) donated dispatch on the map
    upd = jax.jit(lambda m: jax.tree_util.tree_map(lambda x: x, m),
                  donate_argnums=(0,))
    ms = upd(ms)
    jax.block_until_ready(ms.levels[0].points)
    probe_ms("after donated identity   ", h)

    # 4) a big scatter program on the map points
    @jax.jit
    def scat(pts):
        idx = jnp.arange(1000, dtype=jnp.int32) * 7
        return pts.at[idx].add(1.0)

    p = scat(ms.levels[0].points)
    jax.block_until_ready(p)
    probe_ms("after scatter program    ", h)

    # 5) the fused frame step itself
    from ct_icp_tpu.datasets import synthetic as syn
    import bench
    from ct_icp_tpu.odometry.odometry import Odometry
    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, 2.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    odo = Odometry(o)
    probe_ms("after Odometry()         ", h)
    fr = acq.frame(0)
    prep = odo.prepare_frame(fr["xyz"], fr["timestamps"], 0)
    probe_ms("after prepare_frame      ", h)
    odo.register_frame_prepared(prep)
    probe_ms("after register_frame     ", h)


if __name__ == "__main__":
    main()
