"""Audit the hot jitted programs for captured device-array constants.

A jitted program that captures a PRE-EXISTING device array (module-level
``jnp.uint32(...)`` scalars, host-built ``jnp.asarray`` tables, etc.)
permanently degrades the axon client ~150x on every subsequent dispatch
("the device-constant cliff", docs/PERF.md). With omnistaging, arrays
created DURING tracing are staged as ops — only pre-existing arrays appear
as jaxpr consts — so ``make_jaxpr(...).consts`` containing a ``jax.Array``
is exactly the poison condition.

Runs on CPU. Exercised as a test by tests/test_no_device_consts.py.

Run: JAX_PLATFORMS=cpu python -u tools/audit_consts.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp


def device_consts(fn, *args, **kwargs):
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return [c for c in closed.consts if isinstance(c, jax.Array)]


def audit():
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry import pipeline as pl
    from ct_icp_tpu.ops import sampling as smp

    o = default_driving_profile()
    failures = {}

    def check(name, fn, *args, **kwargs):
        bad = device_consts(fn, *args, **kwargs)
        if bad:
            failures[name] = [(c.shape, str(c.dtype)) for c in bad]
        print(f"{name:<28} {'POISONED ' + str(len(bad)) if bad else 'clean'}",
              flush=True)

    ms = vm.make_map(o.map_options)
    pts = jnp.zeros((256, 3), jnp.float32)
    valid = jnp.ones((256,), bool)

    check("voxel_subsample", lambda p, v: smp.voxel_subsample_indices(
        p, v, jnp.float32(0.5), 128), pts, valid)
    check("insert_points", lambda lvl, p, v: vm.insert_points(
        lvl, p, v, 0.8, 0.1, jnp.zeros(3), 64), ms.levels[0], pts, valid)
    check("prune_level", lambda lvl: vm.prune_level(
        lvl, jnp.zeros(3), 100.0), ms.levels[0])
    check("rebuild_level", lambda lvl: vm.rebuild_level(
        lvl, jnp.zeros(3), 0.8), ms.levels[0])
    check("ball_search_moments", lambda lvl, q, v: vm.ball_search_moments(
        lvl, q, v, 0.75, 0.8, 1), ms.levels[0], pts, valid)
    check("radius_search", lambda lvl, q, v: vm.radius_search(
        lvl, q, v, 0.75, 0.8, 1, 20), ms.levels[0], pts, valid)

    # the solver
    import dataclasses
    statics = dataclasses.replace(
        slv.SolverStatics(num_keypoints=256, max_neighbors=20, level_index=0,
                          voxel_neighborhood=1))
    reg = slv.build_register_fn(statics)
    qb = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    tb = jnp.zeros(3, jnp.float32)
    prior = jnp.zeros(14, jnp.float32)
    dyn = jnp.asarray(slv.pack_dynamics(o.ct_icp_options, 0.75, 0.8))
    check("register", reg, ms.levels[0], pts, valid.astype(jnp.float32),
          valid, qb, tb, qb, tb, prior, dyn)

    # fused + streaming frame steps
    scan = jnp.zeros((32768, 4), jnp.uint16)
    n = jnp.int32(100)
    pose_init = jnp.zeros(14, jnp.float32).at[0].set(1.0).at[7].set(1.0)
    fs = jnp.full((15,), jnp.inf, jnp.float32).at[0:11].set(0.0)
    frame_step = pl.make_frame_step_fn(
        o.map_options, statics, sub_capacity=16384, max_dirty=4096,
        distort_constant_velocity=False)
    check("fused_frame_step", frame_step.__wrapped__, ms, scan, n, pose_init,
          prior, dyn, fs)
    stream_step = pl.make_streaming_step_fn(
        o.map_options, statics, sub_capacity=16384, max_dirty=4096,
        distort_constant_velocity=False, const_velocity=True,
        continuous=True, always_insert=False, do_no_insert=False)
    odo_state = jnp.asarray(pl.init_odo_state())
    betas = jnp.zeros(4, jnp.float32)
    check("streaming_step", stream_step.__wrapped__, ms, odo_state, scan, n,
          betas, dyn, fs)

    upd = pl.make_update_map_fn(o.map_options, 4096)
    check("update_map", upd.__wrapped__, ms, pts, valid, tb, tb,
          jnp.float32(100.0), jnp.asarray(True))
    reb = pl.make_stream_rebase_fn(o.map_options)
    check("stream_rebase", reb.__wrapped__, ms, odo_state, tb)

    return failures


if __name__ == "__main__":
    failures = audit()
    if failures:
        print("\nPOISONED PROGRAMS:")
        for name, consts in failures.items():
            print(f"  {name}: {consts}")
        raise SystemExit(1)
    print("\nall hot programs free of captured device constants")
