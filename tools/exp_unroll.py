"""A/B: solver outer ICP loop as lax.while_loop vs static python unroll.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_unroll.py
"""
import dataclasses
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from tools._timing import chained, force_sync_mode


def main():
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.icp.registration import CTICPRegistration, make_prior
    from ct_icp_tpu.mapping import voxel_map as vm

    force_sync_mode()
    o = default_driving_profile()
    rng = np.random.default_rng(0)

    # realistic level-0 map: dense SURFFACES (ground plane + two walls) so
    # radius-0.75 balls hold >= min_number_neighbors points
    level = vm.make_level(18, 30)
    n = 200000
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-60, 60, n)
    third = n // 3
    pts[:third, 1] = rng.uniform(-60, 60, third)              # ground z=0
    pts[third:, 2] = rng.uniform(0, 8, n - third)             # walls y=+-12
    pts[third:2 * third, 1] = -12.0
    pts[2 * third:, 1] = 12.0
    pts += rng.normal(scale=0.02, size=(n, 3)).astype(np.float32)
    for i in range(0, n, 50000):
        level, _ = vm.insert_points(
            level, jnp.asarray(pts[i:i + 50000]), jnp.ones(50000, bool),
            0.8, 0.1, jnp.zeros(3, jnp.float32), 1 << 12, with_normals=False)
    jax.block_until_ready(level.keys)

    k = 2048
    sel = rng.choice(200000, k, replace=False)
    raw = jnp.asarray(pts[sel] + rng.normal(scale=0.05, size=(k, 3)),
                      jnp.float32)
    alphas = jnp.asarray(rng.uniform(0, 1, (k,)), jnp.float32)
    valid = jnp.ones((k,), bool)
    qb = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    tb = jnp.zeros(3, jnp.float32)
    prior = jnp.asarray(make_prior(None, None, np.zeros(3)))

    reg = CTICPRegistration(o.ct_icp_options, o.map_options,
                            num_keypoints=k)
    dyn = jnp.asarray(slv.pack_dynamics(
        o.ct_icp_options, reg.search_radius, reg.voxel_resolution))

    for unroll in (0, 5):
        statics = dataclasses.replace(reg.statics, unroll_iters=unroll)
        fn = slv.jitted_register_fn(statics)
        t = chained(fn, level, raw, alphas, valid, qb, tb, qb, tb, prior,
                    dyn, n=30)
        out = fn(level, raw, alphas, valid, qb, tb, qb, tb, prior, dyn)
        print(f"unroll={unroll}: {t:7.2f} ms   (iters used "
              f"{int(out.num_iters)}, n_res {int(out.num_residuals)})",
              flush=True)


if __name__ == "__main__":
    main()
