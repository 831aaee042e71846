"""Which stage of the fused frame step flips dispatch into slow mode?

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_overhead3.py
"""

import dataclasses
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

    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.ops import sampling as smp
    from ct_icp_tpu.icp import solver as slv

    o = default_driving_profile()
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((131072, 3), np.float32) * 40)
    valid = jnp.ones((131072,), bool)

    # stage A: voxel_subsample_indices (lexsort + scatters)
    sub = jax.jit(lambda r, v: smp.voxel_subsample_indices(
        r, v, jnp.float32(0.5), 32768))
    out = sub(raw, valid)
    jax.block_until_ready(out)
    probe_ms("after subsample          ", h)

    # stage B: insert_points into a map level
    ms = vm.make_map(o.map_options)
    ins = jax.jit(lambda lvl, p, v: vm.insert_points(
        lvl, p, v, 0.8, 0.1, jnp.zeros(3), 8192))
    lvl, n = ins(ms.levels[0], raw[:16384], valid[:16384])
    jax.block_until_ready(lvl.keys)
    probe_ms("after insert_points      ", h)

    # stage C: the solver (while_loop + lax.cond cache + jacfwd)
    statics = slv.SolverStatics(num_keypoints=2048, max_neighbors=20,
                                level_index=0, voxel_neighborhood=1)
    reg = jax.jit(slv.build_register_fn(statics))
    qb = jnp.asarray([1., 0., 0., 0.], jnp.float32)
    tb = jnp.zeros(3, jnp.float32)
    prior = jnp.zeros(14, jnp.float32).at[0].set(1.0)
    dyn = jnp.asarray(slv.pack_dynamics(o.ct_icp_options, 0.75, 0.8))
    r = reg(lvl, raw[:2048], jnp.linspace(0, 1, 2048), valid[:2048],
            qb, tb, qb, tb, prior, dyn)
    jax.block_until_ready(r.tr_end)
    probe_ms("after solver             ", h)

    # stage D: prune
    pr = jax.jit(lambda lvl: vm.prune_level(lvl, jnp.zeros(3), 100.0))
    l2 = pr(lvl)
    jax.block_until_ready(l2.keys)
    probe_ms("after prune              ", h)


if __name__ == "__main__":
    main()
