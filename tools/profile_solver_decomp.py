"""Decompose the driving-profile solver cost with ONE compiled program.

All iteration counts are dynamic scalars, so a single compile of the
driving-statics register fn can be driven at (num_iters_icp, ls_max_num_iters,
regather_iters) = (1,1,1), (5,1,1), (5,2,1), (5,2,5), ... — the deltas
isolate the per-outer-iteration, per-inner-iteration, and per-gather costs
without trusting any sub-ms single-stage timing over the tunnel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_solver_decomp.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000, out


def main():
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.icp.registration import CTICPRegistration
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry import pipeline as pl
    from ct_icp_tpu.ops import sampling

    # force-sync readback first (axon deferred mode lies until then)
    _ = np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones(8)))

    o = default_driving_profile()
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # driving-like map: ground plane + two walls, 120k points
    n_map = 120_000
    pts = np.empty((n_map, 3), np.float32)
    third = n_map // 3
    pts[:third] = np.stack([rng.uniform(-60, 60, third),
                            rng.uniform(-12, 12, third),
                            rng.normal(0, 0.03, third)], -1)
    pts[third:2 * third] = np.stack([rng.uniform(-60, 60, third),
                                     np.full(third, -12.0)
                                     + rng.normal(0, 0.03, third),
                                     rng.uniform(0, 8, third)], -1)
    pts[2 * third:] = np.stack([rng.uniform(-60, 60, n_map - 2 * third),
                                np.full(n_map - 2 * third, 12.0)
                                + rng.normal(0, 0.03, n_map - 2 * third),
                                rng.uniform(0, 8, n_map - 2 * third)], -1)

    r0 = o.map_options.resolutions[0]
    level = vm.make_level(r0.capacity_log2, r0.max_num_points)
    ins = jax.jit(lambda lvl, p: vm.insert_points(
        lvl, p, jnp.ones((p.shape[0],), bool), jnp.float32(r0.resolution),
        jnp.float32(r0.min_distance_between_points), jnp.zeros(3),
        o.max_dirty_voxels, with_normals=False))
    t_ins, (level, n_in) = timeit(ins, level, jnp.asarray(pts))
    print(f"insert 120k pts:                {t_ins:8.2f} ms "
          f"({int(n_in)} inserted)")

    # keypoints: grid-sampled scan points near the sensor
    scan = pts[rng.choice(n_map, 100_000)] + rng.normal(
        0, 0.05, (100_000, 3)).astype(np.float32)
    kidx, kok, kcnt = jax.jit(
        lambda p, v: sampling.voxel_subsample_indices(
            p, v, jnp.float32(o.sample_voxel_size), o.max_keypoints),
        )(jnp.asarray(scan), jnp.ones((100_000,), bool))
    raw = jnp.asarray(scan)[kidx]
    valid = kok
    alphas = jnp.linspace(0, 1, o.max_keypoints)
    print(f"keypoints: {int(kcnt)} live of {o.max_keypoints}")

    reg = CTICPRegistration(o.ct_icp_options, o.map_options,
                        num_keypoints=o.max_keypoints)
    fn = reg._fn
    qb = jnp.asarray([0.0, 0, 0, 1.0])
    tb = jnp.zeros(3)
    qe = qb
    te = jnp.asarray([0.8, 0.0, 0.0])
    prior = np.zeros(14, np.float32)
    prior[0:4] = [0, 0, 0, 1]

    def run(n_outer, n_inner, n_regather):
        import dataclasses as dc
        opts = dc.replace(o.ct_icp_options, num_iters_icp=n_outer,
                          ls_max_num_iters=n_inner,
                          regather_iters=n_regather,
                          # disable early exit so counts are exact
                          threshold_orientation_norm=-1.0,
                          threshold_translation_norm=-1.0)
        dyn = jnp.asarray(slv.pack_dynamics(
            opts, reg.search_radius, reg.voxel_resolution,
            reg.distance_strategy))
        return timeit(fn, level, raw, alphas, valid, qb, tb, qe, te,
                      jnp.asarray(prior), dyn)

    t111, out = run(1, 1, 1)
    print(f"solver (1 outer, 1 inner):      {t111:8.2f} ms "
          f"(n_res={int(out.num_residuals)})")
    t511, _ = run(5, 1, 1)
    print(f"solver (5 outer, 1 inner):      {t511:8.2f} ms")
    t521, _ = run(5, 2, 1)
    print(f"solver (5 outer, 2 inner):      {t521:8.2f} ms")
    t525, _ = run(5, 2, 5)
    print(f"solver (5 outer, 2 inner, regather every): {t525:8.2f} ms")
    t100, _ = run(10, 2, 1)
    print(f"solver (10 outer, 2 inner):     {t100:8.2f} ms")

    print()
    print(f"per-outer-iter (1 inner):       {(t511 - t111) / 4:8.2f} ms")
    print(f"per-inner-iter (x5 outer):      {(t521 - t511) / 5:8.2f} ms")
    print(f"per-extra-gather (x4):          {(t525 - t521) / 4:8.2f} ms")
    print(f"fixed overhead (extrapolated):  "
          f"{t111 - (t521 - t511) - (t511 - t111) / 4:8.2f} ms")

    # gather + rescore in isolation (same shapes as inside the solver)
    g = jax.jit(lambda: vm.gather_candidate_planes(
        level, raw, valid, jnp.float32(reg.voxel_resolution), 1))
    t_g, planes = timeit(g)
    print(f"gather_candidate_planes:        {t_g:8.2f} ms "
          f"rows={planes[0].shape}")

    resc = jax.jit(lambda rows, cnt: vm.moments_from_planes(
        rows, cnt, raw, jnp.float32(reg.search_radius),
        k_nearest=jnp.int32(20)))
    t_r, _ = timeit(resc, *planes)
    print(f"moments_from_planes (knn):      {t_r:8.2f} ms")


if __name__ == "__main__":
    main()
