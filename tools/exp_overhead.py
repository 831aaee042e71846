"""When does per-dispatch overhead jump from ~0.05ms to ~1.3ms?

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_overhead.py
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
    probe_ms("fresh process          ", h)

    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.odometry.odometry import Odometry

    o = default_driving_profile()
    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, 2.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    probe_ms("after imports+scene    ", h)

    odo = Odometry(o)
    probe_ms("after Odometry()       ", h)

    fr = acq.frame(0)
    odo.register_frame(fr["xyz"], fr["timestamps"], 0)
    probe_ms("after 1 frame          ", h)

    for i in range(1, 4):
        fr = acq.frame(i)
        odo.register_frame(fr["xyz"], fr["timestamps"], i)
    probe_ms("after 4 frames         ", h)

    del odo
    import gc
    gc.collect()
    probe_ms("after del odometry     ", h)


if __name__ == "__main__":
    main()
