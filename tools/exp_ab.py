"""A/B: probe gather on real vs fresh keys, real vs random indices,
in the SAME process (after odometry ran).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_ab.py
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


def main():
    import bench
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.datasets import synthetic as syn
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.ops import voxel as vx
    from ct_icp_tpu.odometry.odometry import Odometry

    o = default_driving_profile()
    print("device:", jax.devices()[0], flush=True)
    scene = bench.build_scene()
    traj = bench.straight_trajectory(400, 2.0)
    acq = syn.SyntheticSensorAcquisition(
        scene, traj,
        syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                        frame_duration=0.1, max_range=50.0,
                                        min_range=2.0, noise_sigma=0.01),
        seed=3)
    odo = Odometry(o)
    for i in range(8):
        fr = acq.frame(i)
        odo.register_frame(fr["xyz"], fr["timestamps"], i)
    level = odo.map_state.levels[0]
    C = level.keys.shape[0]
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((2048, 3), np.float32) * 40)
    offsets = vm._neighbor_offsets(1)
    qc = vx.voxel_coords(q, jnp.float32(0.8))
    cand = (qc[:, None, :] + offsets[None, :, :]).reshape(-1, 3)
    h_real = jax.jit(vx.voxel_hash_u32)(cand)
    h_rand = jnp.asarray(rng.integers(0, 2**32, size=(cand.shape[0],),
                                      dtype=np.uint32))
    keys_fresh = jnp.asarray(rng.integers(0, 2**32, size=(C,),
                                          dtype=np.uint32))
    keys_real_copy = jnp.asarray(np.asarray(level.keys))

    @jax.jit
    def probe(keys, h):
        slots = vm._probe_slots(h, C)
        return keys[slots]

    for name, keys, h in [
        ("real keys,  real h", level.keys, h_real),
        ("real keys,  rand h", level.keys, h_rand),
        ("fresh keys, real h", keys_fresh, h_real),
        ("fresh keys, rand h", keys_fresh, h_rand),
        ("copy  keys, real h", keys_real_copy, h_real),
    ]:
        t = chained(probe, keys, h)
        print(f"{name}: {t:7.3f} ms", flush=True)

    # also: does a trivial elementwise op on [55296] cost ~1.3ms here?
    @jax.jit
    def triv(h):
        return h * jnp.uint32(3) + jnp.uint32(1)

    t = chained(triv, h_real)
    print(f"trivial elementwise [55296]: {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
