"""Tests for voxel/sampling/eigen/neighborhood ops against numpy references."""

import numpy as np
import pytest

import jax.numpy as jnp

from ct_icp_tpu.config.options import AdaptiveGridSamplingOptions
from ct_icp_tpu.ops import sampling, voxel as vx
from ct_icp_tpu.ops.eigen3 import eigh3x3
from ct_icp_tpu.ops.neighborhood import compute_description


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _np_trunc_voxels(points, size):
    return np.trunc(points / size).astype(np.int64)


class TestVoxelSubsample:
    def test_one_point_per_voxel(self, rng):
        n, cap = 2048, 2048
        pts = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
        valid = np.ones(n, bool)
        valid[-100:] = False
        idx, out_valid, count = sampling.voxel_subsample_indices(
            jnp.asarray(pts), jnp.asarray(valid), 1.0, cap)
        idx, out_valid = np.asarray(idx), np.asarray(out_valid)
        count = int(count)
        sel = idx[out_valid]
        # every selected point valid, one per voxel
        assert np.all(valid[sel])
        vox = _np_trunc_voxels(pts[sel], 1.0)
        assert len(np.unique(vox, axis=0)) == len(sel)
        # number of selected == number of distinct voxels among valid
        want = len(np.unique(_np_trunc_voxels(pts[valid], 1.0), axis=0))
        assert count == want
        # representative = smallest index in its voxel
        allvox = _np_trunc_voxels(pts, 1.0)
        for s in sel[:50]:
            same = np.all(allvox == allvox[s], axis=1) & valid
            assert s == np.nonzero(same)[0].min()

    def test_capacity_clamp(self, rng):
        pts = rng.uniform(-50, 50, size=(512, 3)).astype(np.float32)
        idx, out_valid, count = sampling.voxel_subsample_indices(
            jnp.asarray(pts), jnp.ones(512, bool), 0.01, 64)
        assert int(np.sum(np.asarray(out_valid))) == 64
        assert int(count) == 64

    def test_k_per_voxel(self, rng):
        pts = np.zeros((100, 3), np.float32)
        pts[:, 0] = np.repeat(np.arange(10), 10) * 5.0  # 10 voxels x 10 points
        idx, out_valid, count = sampling.voxel_sample_k_indices(
            jnp.asarray(pts), jnp.ones(100, bool), 1.0, 64, 3)
        assert int(count) == 30
        sel = np.sort(np.asarray(idx)[np.asarray(out_valid)])
        want = np.sort(np.concatenate([np.arange(3) + 10 * i for i in range(10)]))
        np.testing.assert_array_equal(sel, want)


class TestAdaptiveSampling:
    def test_band_selection_and_drop(self, rng):
        opts = AdaptiveGridSamplingOptions()
        pts = np.array([
            [0.1, 0, 0],     # below first edge -> dropped
            [250.0, 0, 0],   # beyond last edge -> dropped
            [1.0, 0, 0],     # band 0 (0.5-2.0), voxel 0.1
            [1.02, 0, 0],    # same voxel as above at 0.1 -> dropped (1 pt/vox)
            [10.0, 0, 0],    # band (8-16), voxel 0.8
        ], dtype=np.float32)
        idx, out_valid, count = sampling.adaptive_grid_sampling_indices(
            jnp.asarray(pts), jnp.ones(5, bool), opts, 8)
        sel = set(np.asarray(idx)[np.asarray(out_valid)].tolist())
        assert sel == {2, 4}

    def test_global_cap(self, rng):
        opts = AdaptiveGridSamplingOptions(max_num_points=5)
        pts = rng.uniform(1, 15, size=(200, 3)).astype(np.float32)
        idx, out_valid, count = sampling.adaptive_grid_sampling_indices(
            jnp.asarray(pts), jnp.ones(200, bool), opts, 64)
        assert int(count) <= 5


class TestEigh3:
    def test_matches_numpy(self, rng):
        mats = rng.normal(size=(256, 3, 3)).astype(np.float32)
        sym = np.einsum("nij,nkj->nik", mats, mats)  # PSD
        vals, vecs = eigh3x3(jnp.asarray(sym))
        vals, vecs = np.asarray(vals), np.asarray(vecs)
        want = np.linalg.eigvalsh(sym.astype(np.float64))[:, ::-1]
        scale = np.maximum(np.abs(want[:, 0]), 1.0)
        np.testing.assert_allclose(vals / scale[:, None], want / scale[:, None],
                                   atol=2e-5)
        # eigenvector property: A v = lambda v
        for i in range(3):
            av = np.einsum("nij,nj->ni", sym, vecs[:, i, :])
            lv = vals[:, i, None] * vecs[:, i, :]
            np.testing.assert_allclose(av / scale[:, None], lv / scale[:, None],
                                       atol=5e-4)

    def test_degenerate(self):
        # isotropic and rank-1 cases must not produce NaN
        mats = np.stack([np.eye(3), np.zeros((3, 3)),
                         np.outer([1, 2, 3], [1, 2, 3])]).astype(np.float32)
        vals, vecs = eigh3x3(jnp.asarray(mats))
        assert not np.any(np.isnan(np.asarray(vals)))
        assert not np.any(np.isnan(np.asarray(vecs)))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(vecs), axis=-1), 1.0,
                                   atol=1e-5)


class TestNeighborhoodDescriptor:
    def test_planar_normal(self, rng):
        # points on z=5 plane, far from origin to stress f32: normal = +-z
        k = 20
        pts = np.zeros((1, k, 3), np.float32)
        pts[0, :, 0] = rng.uniform(1000, 1001, k)
        pts[0, :, 1] = rng.uniform(2000, 2001, k)
        pts[0, :, 2] = 5.0
        mask = np.ones((1, k), bool)
        query = np.array([[1000.5, 2000.5, 5.0]], np.float32)
        d = compute_description(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(query))
        n = np.asarray(d.normal)[0]
        assert abs(abs(n[2]) - 1.0) < 1e-3
        # 20 uniform samples: s0 and s1 differ by sampling noise; s2 == 0
        assert float(d.planarity[0]) > 0.4
        assert float(d.a2D[0]) > 0.6
        np.testing.assert_allclose(float(d.eigvals[0][2]), 0.0, atol=1e-4)

    def test_linear_descriptor(self, rng):
        k = 20
        t = rng.uniform(0, 1, k).astype(np.float32)
        pts = np.zeros((1, k, 3), np.float32)
        pts[0, :, 0] = t * 4.0
        mask = np.ones((1, k), bool)
        query = pts[:, 0, :]
        d = compute_description(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(query))
        line = np.asarray(d.line)[0]
        assert abs(abs(line[0]) - 1.0) < 1e-3
        assert float(d.linearity[0]) > 0.95

    def test_masked_entries_ignored(self, rng):
        k = 16
        pts = rng.normal(size=(1, k, 3)).astype(np.float32)
        mask = np.ones((1, k), bool)
        mask[0, 8:] = False
        pts_garbled = pts.copy()
        pts_garbled[0, 8:] = 1e6
        q = np.zeros((1, 3), np.float32)
        d1 = compute_description(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(q))
        d2 = compute_description(jnp.asarray(pts_garbled), jnp.asarray(mask), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(d1.barycenter), np.asarray(d2.barycenter),
                                   atol=1e-5)

    def test_matches_reference_formulas(self, rng):
        # uniform ball: check covariance vs numpy computation
        k = 30
        pts = rng.normal(size=(4, k, 3)).astype(np.float32)
        mask = np.ones((4, k), bool)
        q = pts[:, 0, :]
        d = compute_description(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(q))
        for b in range(4):
            bary = pts[b].mean(axis=0)
            cov = pts[b].astype(np.float64).T @ pts[b].astype(np.float64) / k \
                - np.outer(bary, bary)
            np.testing.assert_allclose(np.asarray(d.barycenter)[b], bary, atol=1e-4)
            np.testing.assert_allclose(np.asarray(d.covariance)[b], cov, atol=1e-4)


class TestVoxelHash:
    def test_hash_matches_reference_scheme(self):
        coords = jnp.asarray([[1, 2, 3], [-1, -2, -3]], dtype=jnp.int32)
        h = np.asarray(vx.voxel_hash_u32(coords))
        want0 = (1 * 73856093 + 2 * 19349669 + 3 * 83492791) % (1 << 32)
        assert h[0] == want0
        # negative coords wrap like uint arithmetic — just check determinism
        assert h[1] == np.asarray(vx.voxel_hash_u32(coords))[1]
