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
