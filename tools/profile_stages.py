"""Per-stage timing of the odometry pipeline on the current default device.

Times each device stage with block_until_ready to find where a frame's
budget goes. Run on TPU:  python tools/profile_stages.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000, out


def main():
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.icp.registration import make_prior
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry import pipeline as pl

    o = default_driving_profile()
    rng = np.random.default_rng(0)

    print("device:", jax.devices()[0])

    # ---------------- raw scan buffers
    n = o.max_scan_points
    raw = jnp.asarray(rng.uniform(-60, 60, (n, 3)), jnp.float32)
    alphas = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)
    valid = jnp.ones((n,), bool)

    t, (sub_raw, sub_alphas, sub_valid, cnt) = timeit(
        pl.preprocess, raw, alphas, valid, jnp.float32(0.5),
        o.max_subsampled_points)
    print(f"preprocess(subsample {n}->{int(cnt)}):  {t:8.2f} ms")

    t, (kp_raw, kp_alphas, kp_valid, kcnt) = timeit(
        pl.sample_keypoints, sub_raw, sub_alphas, sub_valid, jnp.float32(1.5),
        o.max_keypoints)
    print(f"sample_keypoints (->{int(kcnt)}):       {t:8.2f} ms")

    # ---------------- map with content
    map_state = vm.make_map(o.map_options)
    update_map = pl.make_update_map_fn(o.map_options, o.max_dirty_voxels)
    world = jnp.asarray(rng.uniform(-60, 60, (o.max_subsampled_points, 3)),
                        jnp.float32)
    wvalid = jnp.ones((o.max_subsampled_points,), bool)
    zero3 = jnp.zeros(3, jnp.float32)
    for _ in range(3):  # warm the map with some content
        map_state, ins = update_map(map_state, world, wvalid, zero3, zero3,
                                    jnp.float32(100.0), jnp.asarray(True))
        world = world + 1.0

    t0 = time.time()
    reps = 5
    for _ in range(reps):
        map_state, ins = update_map(map_state, world, wvalid, zero3, zero3,
                                    jnp.float32(100.0), jnp.asarray(True))
        jax.block_until_ready(map_state.levels[0].count)
        world = world + 0.5
    t = (time.time() - t0) / reps * 1000
    print(f"update_map (prune+insert x3 levels):   {t:8.2f} ms")

    t0 = time.time()
    for _ in range(reps):
        map_state2, ins = update_map(map_state, world, wvalid, zero3, zero3,
                                     jnp.float32(100.0), jnp.asarray(False),
                                     prune=False)
        jax.block_until_ready(map_state2.levels[0].count)
        map_state = map_state2
    t = (time.time() - t0) / reps * 1000
    print(f"update_map (no prune, no insert):      {t:8.2f} ms")

    # ---------------- radius search alone
    level_idx, nv = o.map_options.search_params(o.map_options.default_radius)
    level = map_state.levels[level_idx]
    res_ = o.map_options.resolutions[level_idx].resolution
    q = world[: o.max_keypoints]
    qv = jnp.ones((o.max_keypoints,), bool)
    t, _ = timeit(vm.radius_search, level, q, qv,
                  jnp.float32(o.map_options.default_radius), jnp.float32(res_),
                  nv=nv, k=20)
    print(f"radius_search (K={o.max_keypoints}, nv={nv}):   {t:8.2f} ms")

    # ---------------- solver
    statics = slv.SolverStatics(
        num_keypoints=o.max_keypoints, max_neighbors=20,
        level_index=level_idx, voxel_neighborhood=nv)
    fn = slv.jitted_register_fn(statics)
    dyn = slv.make_dynamics(o.ct_icp_options, o.map_options.default_radius,
                            res_)
    prior = make_prior(None, None, np.zeros(3))
    qb = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    tb = jnp.zeros(3, jnp.float32)
    t, out = timeit(fn, level, q, kp_alphas, qv, qb, tb, qb, tb, prior, dyn)
    print(f"solver (iters={int(out.num_iters)}, nres={int(out.num_residuals)}): "
          f"{t:8.2f} ms")

    # ---------------- transform
    t, _ = timeit(pl.transform_points, sub_raw, sub_alphas, qb, tb, qb, tb)
    print(f"transform_points:                      {t:8.2f} ms")

    # ---------------- host->device transfer of one scan
    host_scan = np.ascontiguousarray(rng.uniform(-60, 60, (n, 3)), np.float32)
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(jnp.asarray(host_scan))
    print(f"h2d scan transfer ({host_scan.nbytes >> 20} MB):  "
          f"{(time.time() - t0) / reps * 1000:8.2f} ms")

    # tiny scalar transfer latency (dispatch/tunnel overhead)
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(jnp.asarray(1.0))
    print(f"tiny h2d scalar:                       "
          f"{(time.time() - t0) / 20 * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
