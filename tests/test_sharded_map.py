"""Tests: the sharded voxel map matches the single-chip map's results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ct_icp_tpu.config.options import (MultiResolutionVoxelMapOptions,
                                       ResolutionParam)
from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops.neighborhood import (compute_description,
                                         description_from_moments)
from ct_icp_tpu.parallel import sharded_map as sm

OPTS = MultiResolutionVoxelMapOptions(
    resolutions=(ResolutionParam(0.8, 0.0, 30, 15),),
    default_radius=0.75)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("map",))


def test_moment_descriptor_matches_direct():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4, 50, 3)).astype(np.float32)
    mask = rng.uniform(size=(4, 50)) < 0.7
    q = pts[:, 0, :]
    d1 = compute_description(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(q))
    w = mask.astype(np.float32)
    rel = (pts - q[:, None, :]) * w[..., None]
    count = jnp.asarray(mask.sum(1))
    sum_rel = jnp.asarray(rel.sum(1))
    sum_outer = jnp.asarray(np.einsum("mki,mkj->mij", rel, rel))
    d2 = description_from_moments(count, sum_rel, sum_outer, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(d1.covariance),
                               np.asarray(d2.covariance), atol=1e-4)
    np.testing.assert_allclose(np.abs(np.asarray(d1.normal)),
                               np.abs(np.asarray(d2.normal)), atol=1e-2)


@pytest.mark.slow
def test_sharded_matches_single_chip(mesh):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-15, 15, (4000, 3)).astype(np.float32)
    valid = jnp.ones(4000, bool)
    z3 = jnp.zeros(3, jnp.float32)

    # single-chip reference
    single = vm.make_level(15, 30)
    single, n_single = vm.insert_points(single, jnp.asarray(pts), valid,
                                        0.8, 0.0, z3, 1 << 13)

    # sharded
    state = sm.make_sharded_map(mesh, OPTS)
    update = sm.make_sharded_update_fn(mesh, OPTS, 1 << 13)
    state, n_sharded = update(state, jnp.asarray(pts), valid, z3, z3,
                              jnp.float32(1e9))
    assert int(n_sharded) == int(n_single)

    # queries agree with the single-chip ball search
    queries = jnp.asarray(pts[:128])
    qv = jnp.ones(128, bool)
    query = sm.make_sharded_ball_query_fn(mesh, OPTS, level_index=0, nv=1)
    count_s, sum_rel, sum_outer, closest_s, dist_s = query(
        state, queries, qv, 0.75)

    cand, mask, closest_1, dist_1, count_1 = vm.ball_search(
        single, queries, qv, 0.75, 0.8, nv=1)
    np.testing.assert_array_equal(np.asarray(count_s), np.asarray(count_1))
    np.testing.assert_allclose(np.asarray(dist_s), np.asarray(dist_1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(closest_s), np.asarray(closest_1),
                               atol=1e-4)

    # descriptors from combined moments match the direct computation
    d_direct = compute_description(cand, mask, queries)
    d_moment = description_from_moments(count_s, sum_rel, sum_outer, queries)
    np.testing.assert_allclose(np.asarray(d_moment.covariance),
                               np.asarray(d_direct.covariance), atol=1e-3)


@pytest.mark.slow
def test_sharded_prune(mesh):
    rng = np.random.default_rng(2)
    near = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    far = rng.uniform(60, 80, (500, 3)).astype(np.float32)
    state = sm.make_sharded_map(mesh, OPTS)
    update = sm.make_sharded_update_fn(mesh, OPTS, 1 << 12)
    z3 = jnp.zeros(3, jnp.float32)
    state, n0 = update(state, jnp.asarray(np.concatenate([near, far])),
                       jnp.ones(1000, bool), z3, z3, jnp.float32(1e9))
    # second update with tight max_distance prunes the far half
    state, _ = update(state, jnp.asarray(near[:1]), jnp.zeros(1, bool),
                      z3, z3, jnp.float32(30.0))
    total = sum(int(jnp.sum(lvl.count)) for lvl in state.levels)
    assert total == int(n0) - 500


def _all_shard_points(state):
    """All live points across shards of level 0, as a sorted [N,3] array."""
    out = []
    lvl = state.levels[0]
    keys = np.asarray(lvl.keys)        # [n_shards, C]
    count = np.asarray(lvl.count)
    pts = np.asarray(lvl.points)       # [n_shards, C, 3P] planar rows
    n_shards, cap = keys.shape
    p = pts.reshape(n_shards, cap, 3, -1).transpose(0, 1, 3, 2)  # [n,C,P,3]
    for s in range(n_shards):
        occupied = (keys[s] > int(vm.TOMB)) & (count[s] > 0)
        in_cap = (np.arange(p.shape[2])[None, :]
                  < np.where(occupied, count[s], 0)[:, None])
        out.append(p[s][in_cap])
    allp = np.concatenate(out, axis=0)
    return allp[np.lexsort(allp.T)]


@pytest.mark.slow
def test_partitioned_insert_matches_broadcast(mesh):
    """Point-partitioned insert (fixed-capacity all_to_all ownership
    exchange) must produce the SAME map as the broadcast insert — same
    content, same count, nothing dropped (docs/SCALING.md sketch built;
    VERDICT round-3 task 7)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-15, 15, (4000, 3)).astype(np.float32)
    valid = jnp.ones(4000, bool)
    z3 = jnp.zeros(3, jnp.float32)

    s_b = sm.make_sharded_map(mesh, OPTS)
    upd_b = sm.make_sharded_update_fn(mesh, OPTS, 1 << 13)
    s_b, n_b = upd_b(s_b, jnp.asarray(pts), valid, z3, z3, jnp.float32(1e9))

    s_p = sm.make_sharded_map(mesh, OPTS)
    upd_p = sm.make_partitioned_update_fn(mesh, OPTS, 1 << 13)
    s_p, n_p, dropped = upd_p(s_p, jnp.asarray(pts), valid, z3, z3,
                              jnp.float32(1e9))
    assert int(dropped) == 0
    assert int(n_p) == int(n_b)
    np.testing.assert_allclose(_all_shard_points(s_p),
                               _all_shard_points(s_b), atol=0)


@pytest.mark.slow
def test_partitioned_insert_shard_invariant(mesh):
    """The partitioned insert's content matches the single-chip map: the
    mesh size must not change WHAT is stored (only where)."""
    rng = np.random.default_rng(4)
    pts = rng.uniform(-12, 12, (3000, 3)).astype(np.float32)
    valid = jnp.ones(3000, bool)
    z3 = jnp.zeros(3, jnp.float32)

    single = vm.make_level(15, 30)
    single, n_single = vm.insert_points(single, jnp.asarray(pts), valid,
                                        0.8, 0.0, z3, 1 << 13)
    keys = np.asarray(single.keys)
    count = np.asarray(single.count)
    p = np.asarray(single.points).reshape(keys.shape[0], 3, -1)
    p = p.transpose(0, 2, 1)
    occupied = (keys > int(vm.TOMB)) & (count > 0)
    in_cap = (np.arange(p.shape[1])[None, :]
              < np.where(occupied, count, 0)[:, None])
    ref = p[in_cap]
    ref = ref[np.lexsort(ref.T)]

    s_p = sm.make_sharded_map(mesh, OPTS)
    upd_p = sm.make_partitioned_update_fn(mesh, OPTS, 1 << 13)
    s_p, n_p, dropped = upd_p(s_p, jnp.asarray(pts), valid, z3, z3,
                              jnp.float32(1e9))
    assert int(dropped) == 0
    assert int(n_p) == int(n_single)
    np.testing.assert_allclose(_all_shard_points(s_p), ref, atol=0)


@pytest.mark.slow
def test_partitioned_insert_overflow_accounting(mesh):
    """Points past a pair's send capacity are dropped AND counted — silent
    truncation is not allowed (no-silent-caps discipline)."""
    rng = np.random.default_rng(5)
    # everything lands in ~2 voxels -> at most 2 owners; per-pair capacity
    # max(64, ceil(m*slack/n)) with slack=1.0 and m=2048/8=256 -> 64 < 256
    pts = np.zeros((2048, 3), np.float32)
    pts[:, 0] = rng.uniform(0.0, 1.5, 2048)   # two 0.8 m voxels
    valid = jnp.ones(2048, bool)
    z3 = jnp.zeros(3, jnp.float32)
    s_p = sm.make_sharded_map(mesh, OPTS)
    upd_p = sm.make_partitioned_update_fn(mesh, OPTS, 1 << 12, slack=1.0)
    s_p, n_p, dropped = upd_p(s_p, jnp.asarray(pts), valid, z3, z3,
                              jnp.float32(1e9))
    assert int(dropped) > 0
    # conservation: every valid point is either delivered or counted dropped
    # (delivered ones may still lose the per-voxel election — that is the
    # map's capacity semantics, not the exchange's)
    assert int(dropped) < 2048


@pytest.mark.slow
def test_partitioned_insert_multi_level(mesh):
    """Partitioned insert with a MULTI-resolution map: per-level owner maps
    differ (owners hash the level's own voxel coords), and each level's
    content must still match the broadcast insert's."""
    opts3 = MultiResolutionVoxelMapOptions(
        resolutions=(ResolutionParam(0.4, 0.0, 20, 14),
                     ResolutionParam(1.2, 0.0, 30, 13)),
        default_radius=0.75)
    rng = np.random.default_rng(6)
    pts = rng.uniform(-10, 10, (2400, 3)).astype(np.float32)
    valid = jnp.ones(2400, bool)
    z3 = jnp.zeros(3, jnp.float32)

    s_b = sm.make_sharded_map(mesh, opts3)
    upd_b = sm.make_sharded_update_fn(mesh, opts3, 1 << 12)
    s_b, n_b = upd_b(s_b, jnp.asarray(pts), valid, z3, z3, jnp.float32(1e9))

    s_p = sm.make_sharded_map(mesh, opts3)
    upd_p = sm.make_partitioned_update_fn(mesh, opts3, 1 << 12)
    s_p, n_p, dropped = upd_p(s_p, jnp.asarray(pts), valid, z3, z3,
                              jnp.float32(1e9))
    assert int(dropped) == 0
    assert int(n_p) == int(n_b)
    for li in range(2):
        a = sum(int(jnp.sum(lvl.count)) for lvl in [s_p.levels[li]])
        b = sum(int(jnp.sum(lvl.count)) for lvl in [s_b.levels[li]])
        assert a == b, (li, a, b)
