"""Weak-scaling harness for the distributed components (CT-BA + sharded map).

Runs the sharded continuous-time bundle-adjustment step and the sharded
voxel-map update/query round over meshes of 1/2/4/8 devices with the
PER-DEVICE workload held constant, and reports step time + weak-scaling
efficiency. On this box devices are virtual CPU devices
(--xla_force_host_platform_device_count), so absolute times are not TPU
numbers — the harness is the artifact: point it at a real multi-chip
runtime and the same script measures ICI scaling.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh


def time_step(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000, out


def main():
    from ct_icp_tpu.config.options import (MultiResolutionVoxelMapOptions,
                                           ResolutionParam)
    from ct_icp_tpu.parallel import ct_ba, sharded_map as sm

    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8) if s <= len(devices)]
    rng = np.random.default_rng(0)
    results = {}

    # ---- CT-BA: frames-per-device constant (weak scaling)
    frames_per_device = 4
    base_ms = None
    for nd in sizes:
        mesh = Mesh(np.array(devices[:nd]).reshape(nd), ("frames",))
        state, problem, _ = ct_ba.build_synthetic_problem(
            rng, frames_per_device * nd, num_points=256, noise=0.01)
        step = ct_ba.make_ct_ba_step(mesh, num_inner_iters=4)
        state, problem = ct_ba.shard_problem(mesh, state, problem)
        ms, _ = time_step(step, state, problem)
        eff = (base_ms / ms) if base_ms else 1.0
        base_ms = base_ms or ms
        results[f"ct_ba_{nd}dev_ms"] = round(ms, 2)
        results[f"ct_ba_{nd}dev_weak_eff"] = round(eff, 3)

    # ---- sharded map: points-per-device constant.
    # insert variant: --partitioned selects the point-partitioned
    # all_to_all insert (compute O(scan/N) per shard); default is the
    # broadcast insert (compute O(scan) per shard, ICI-cheapest). Both
    # pass the same content-equivalence tests (tests/test_sharded_map.py).
    partitioned = "--partitioned" in sys.argv
    pts_per_device = 8192
    opts = MultiResolutionVoxelMapOptions(
        resolutions=(ResolutionParam(0.8, 0.05, 20, 14),), default_radius=0.75)
    base_ms = None
    for nd in sizes:
        mesh = Mesh(np.array(devices[:nd]).reshape(nd), ("map",))
        mstate = sm.make_sharded_map(mesh, opts)
        if partitioned:
            upd_p = sm.make_partitioned_update_fn(mesh, opts, 1 << 13)

            def update(ms_, p, ok, a, b, c, _u=upd_p):
                st, total, _dropped = _u(ms_, p, ok, a, b, c)
                return st, total
        else:
            update = sm.make_sharded_update_fn(mesh, opts, 1 << 13)
        n = pts_per_device * nd
        pts = jnp.asarray(rng.uniform(-40, 40, (n, 3)), jnp.float32)
        ok = jnp.ones(n, bool)
        z3 = jnp.zeros(3, jnp.float32)

        def round_trip(ms_, p):
            ms2, _ = update(ms_, p, ok, z3, z3, jnp.float32(1e9))
            return ms2

        ms, mstate = time_step(round_trip, mstate, pts)
        query = sm.make_sharded_ball_query_fn(mesh, opts, 0, nv=1)
        qms, _ = time_step(
            lambda st, q: query(st, q, jnp.ones(q.shape[0], bool), 0.75),
            mstate, pts[:1024])
        eff = (base_ms / ms) if base_ms else 1.0
        base_ms = base_ms or ms
        results[f"map_insert_{nd}dev_ms"] = round(ms, 2)
        results[f"map_insert_{nd}dev_weak_eff"] = round(eff, 3)
        results[f"map_query_{nd}dev_ms"] = round(qms, 2)

    print(json.dumps({"metric": "virtual_mesh_weak_scaling",
                      "devices": sizes[-1],
                      "insert_variant": ("partitioned" if partitioned
                                         else "broadcast"), **results}))


if __name__ == "__main__":
    main()
