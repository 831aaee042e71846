"""Tests for the TPU-native voxel hash map (mapping/voxel_map.py).

Mirrors the reference's map unit test intent (reference
test/unit/SlamCore/test_map.cxx:5-38: insert random points, 1-NN of an
inserted point is itself, radius search covers everything) plus the
TPU-specific machinery: slot claiming, min-distance dedup, capacity caps,
tombstoned pruning, rebase rebuild.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ct_icp_tpu.mapping import voxel_map as vm


def make_level(cap_log2=12, max_pts=8):
    return vm.make_level(cap_log2, max_pts)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def insert(level, pts, res=1.0, min_dist=0.0, begin=np.zeros(3), max_dirty=256,
           max_rounds=4):
    pts = jnp.asarray(np.asarray(pts, np.float32))
    valid = jnp.ones(pts.shape[0], bool)
    return vm.insert_points(level, pts, valid, res, min_dist,
                            jnp.asarray(begin, dtype=jnp.float32), max_dirty,
                            max_rounds=max_rounds)


class TestInsert:
    def test_insert_and_find(self, rng):
        level = make_level()
        pts = rng.uniform(-10, 10, (500, 3))
        level, n = insert(level, pts)
        assert int(n) == 500
        assert int(level.num_points) == 500
        coords = np.trunc(pts / 1.0).astype(np.int32)
        slots = np.asarray(vm.find_slots(level, jnp.asarray(coords)))
        assert np.all(slots >= 0)
        # every point stored in its slot
        stored = np.asarray(level.points)[slots].reshape(
            len(slots), 3, -1).transpose(0, 2, 1)   # planar rows -> [N,P,3]
        cnt = np.asarray(level.count)[slots]
        for i in range(0, 500, 37):
            d = np.linalg.norm(stored[i, :cnt[i]] - pts[i], axis=-1)
            assert d.min() < 1e-5

    @pytest.mark.slow
    def test_min_distance_dedup(self):
        level = make_level()
        # two batches: the second too close to the first
        level, n1 = insert(level, np.array([[0.5, 0.5, 0.5]]), min_dist=0.2)
        level, n2 = insert(level, np.array([[0.55, 0.5, 0.5]]), min_dist=0.2)
        level, n3 = insert(level, np.array([[0.9, 0.5, 0.5]]), min_dist=0.2)
        assert (int(n1), int(n2), int(n3)) == (1, 0, 1)

    @pytest.mark.slow
    def test_voxel_capacity(self):
        level = make_level(max_pts=4)
        pts = np.stack([np.linspace(0.1, 0.9, 10), np.full(10, .5), np.full(10, .5)], -1)
        level, n = insert(level, pts, min_dist=0.0)
        assert int(n) == 4

    @pytest.mark.slow
    def test_same_voxel_batch_claims_one_slot(self):
        level = make_level()
        pts = np.tile(np.array([[3.3, 3.3, 3.3]]), (5, 1)) \
            + np.linspace(0, 0.4, 5)[:, None] * np.array([[1e-1, 0, 0]])
        # the election cap bounds same-voxel inserts per frame; a cap >=
        # the multiplicity admits everything
        level4, n4 = insert(level, pts, min_dist=0.0, max_rounds=4)
        occupied = np.asarray(level4.keys) > 1  # > TOMB
        assert occupied.sum() == 1
        assert int(n4) == 4
        level8, n8 = insert(level, pts, min_dist=0.0, max_rounds=8)
        assert int(n8) == 5
        assert (np.asarray(level8.keys) > 1).sum() == 1

    @pytest.mark.slow
    def test_hash_collision_chain(self, rng):
        # force many voxels into a tiny table: still all found via probing
        level = vm.make_level(6, 4)  # 64 slots
        pts = (rng.permutation(50)[:40] - 20)[:, None] * np.array([[1.0, 0, 0]]) \
            + np.array([[0.5, 0.5, 0.5]])
        level, n = insert(level, pts)
        assert int(n) >= 35  # a few may fall off the probe window
        coords = np.trunc(pts / 1.0).astype(np.int32)
        slots = np.asarray(vm.find_slots(level, jnp.asarray(coords)))
        found = slots >= 0
        assert found.sum() == int(n)


class TestRadiusSearch:
    @pytest.mark.slow
    def test_self_nearest(self, rng):
        level = make_level()
        pts = rng.uniform(-10, 10, (300, 3))
        level, _ = insert(level, pts)
        q = jnp.asarray(pts[:64].astype(np.float32))
        npts, nmask, nd = vm.radius_search(
            level, q, jnp.ones(64, bool), 0.8, 1.0, nv=1, k=5)
        nd = np.asarray(nd)
        assert np.all(np.asarray(nmask)[:, 0])
        np.testing.assert_allclose(nd[:, 0], 0.0, atol=1e-5)

    @pytest.mark.slow
    def test_radius_and_sorting(self, rng):
        level = make_level(max_pts=64)  # roomy: no per-voxel capacity drops
        base = np.array([5.0, 5.0, 5.0])
        offs = rng.normal(size=(50, 3)) * 0.3
        pts = base + offs
        level, _ = insert(level, pts, max_rounds=64)  # bulk same-voxel load
        q = jnp.asarray(base[None].astype(np.float32))
        npts, nmask, nd = vm.radius_search(
            level, q, jnp.ones(1, bool), 0.5, 1.0, nv=1, k=20)
        nd = np.asarray(nd)[0]
        m = np.asarray(nmask)[0]
        want = np.sort(np.linalg.norm(offs, axis=-1))
        want = want[want <= 0.5][:20]
        np.testing.assert_allclose(nd[m], want[:m.sum()], atol=1e-5)
        assert np.all(np.diff(nd[m]) >= -1e-6)

    @pytest.mark.slow
    def test_cross_voxel_neighbors(self):
        level = make_level()
        pts = np.array([[0.95, 0.5, 0.5], [1.05, 0.5, 0.5]])
        level, _ = insert(level, pts)
        q = jnp.asarray(np.array([[0.99, 0.5, 0.5]], np.float32))
        _, nmask, nd = vm.radius_search(level, q, jnp.ones(1, bool), 0.5, 1.0,
                                        nv=1, k=4)
        assert int(np.asarray(nmask).sum()) == 2

    def test_occupancy_threshold(self):
        level = make_level()
        level, _ = insert(level, np.array([[0.5, 0.5, 0.5]]))
        q = jnp.asarray(np.array([[0.5, 0.5, 0.5]], np.float32))
        _, m1, _ = vm.radius_search(level, q, jnp.ones(1, bool), 0.8, 1.0,
                                    nv=1, k=4, threshold_voxel_occupancy=1)
        _, m2, _ = vm.radius_search(level, q, jnp.ones(1, bool), 0.8, 1.0,
                                    nv=1, k=4, threshold_voxel_occupancy=2)
        assert int(np.asarray(m1).sum()) == 1
        assert int(np.asarray(m2).sum()) == 0


class TestNormals:
    @pytest.mark.slow
    def test_plane_normals_computed_and_oriented(self, rng):
        level = make_level(max_pts=16)
        # flat ground plane z=0, sensor above at z=2 -> normals point up (+z)
        xs, ys = np.meshgrid(np.linspace(0.1, 3.9, 12), np.linspace(0.1, 3.9, 12))
        pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1)
        begin = np.array([2.0, 2.0, 2.0])
        level, n = insert(level, pts, res=1.0, begin=begin)
        flags = np.asarray(level.nflags)
        cnt = np.asarray(level.count)
        has5 = (cnt >= 5)
        assert np.all(flags[has5] == 2)
        normals = np.asarray(level.normals)[has5]
        # oriented toward the sensor: +z
        np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-3)
        assert np.all(normals[:, 2] > 0)


class TestPruneAndRebuild:
    @pytest.mark.slow
    def test_prune_far(self, rng):
        level = make_level()
        near = rng.uniform(-5, 5, (100, 3))
        far = rng.uniform(95, 105, (100, 3))
        level, _ = insert(level, np.concatenate([near, far]))
        level = vm.prune_level(level, jnp.zeros(3), 50.0)
        assert int(level.num_points) == 100
        # near points still findable
        coords = np.trunc(near / 1.0).astype(np.int32)
        slots = np.asarray(vm.find_slots(level, jnp.asarray(coords)))
        assert np.all(slots >= 0)
        # far points gone
        coords = np.trunc(far / 1.0).astype(np.int32)
        slots = np.asarray(vm.find_slots(level, jnp.asarray(coords)))
        assert np.all(slots < 0)

    @pytest.mark.slow
    def test_insert_after_prune_reuses_tombstones(self, rng):
        level = vm.make_level(6, 4)
        pts = rng.uniform(-10, 10, (30, 3))
        level, n0 = insert(level, pts)
        level = vm.prune_level(level, jnp.zeros(3), 0.1)  # drop everything
        assert int(level.num_points) == 0
        level, n1 = insert(level, pts)
        assert int(n1) == int(n0)

    @pytest.mark.slow
    def test_rebuild_shifts_and_preserves(self, rng):
        level = make_level()
        pts = rng.uniform(10, 30, (200, 3))
        level, _ = insert(level, pts)
        shift = jnp.asarray(np.array([20.0, 20.0, 20.0], np.float32))
        level2 = vm.rebuild_level(level, shift, 1.0)
        assert abs(int(level2.num_points) - 200) <= 2  # rare merges tolerated
        shifted = pts - np.asarray(shift)
        coords = np.trunc(shifted / 1.0).astype(np.int32)
        slots = np.asarray(vm.find_slots(level2, jnp.asarray(coords)))
        assert (slots >= 0).mean() > 0.98
        # search still works in the new frame
        q = jnp.asarray(shifted[:8].astype(np.float32))
        _, nmask, nd = vm.radius_search(level2, q, jnp.ones(8, bool), 0.8, 1.0,
                                        nv=1, k=4)
        assert np.all(np.asarray(nmask)[:, 0])
        np.testing.assert_allclose(np.asarray(nd)[:, 0], 0.0, atol=1e-4)
