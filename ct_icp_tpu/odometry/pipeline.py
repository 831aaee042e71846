"""Jitted device pipeline stages around the solver.

Each stage is a fixed-shape XLA program; the host odometry driver
(odometry/odometry.py) strings them together and keeps the map resident on
device across frames (donated arguments — no copies).

Stages (reference anchors):
  * preprocess          — InitializeFrame's shuffle+sub_sample_frame
                          (reference src/ct_icp/odometry.cpp:333-382,
                          src/ct_icp/ct_icp.cpp:64-83)
  * sample_keypoints    — grid_sampling at the keypoint voxel size
                          (reference ct_icp.cpp:85-101, odometry.cpp:536-552)
  * distort_raw         — CONSTANT_VELOCITY initial distortion
                          (reference DistortFrame, odometry.cpp:162-170)
  * transform_points    — continuous transform with the optimized poses
                          (reference odometry.cpp:469-486)
  * update_map          — distance pruning + multi-level insertion
                          (reference odometry.cpp:855-953, map.h:153-254)
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ct_icp_tpu.icp import residuals as res
from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops import sampling


@functools.partial(jax.jit, static_argnames=("capacity",))
def preprocess(raw, alphas, valid, voxel_size, capacity):
    """Voxel-grid subsample the raw scan -> fixed-capacity sub-frame."""
    idx, ok, cnt = sampling.voxel_subsample_indices(raw, valid, voxel_size,
                                                    capacity)
    return raw[idx], alphas[idx], ok, cnt


@functools.partial(jax.jit, static_argnames=("capacity",))
def sample_keypoints(sub_raw, sub_alphas, sub_valid, sample_voxel_size,
                     capacity):
    """Grid-sample keypoints from the sub-frame (by raw-point voxels)."""
    idx, ok, cnt = sampling.voxel_subsample_indices(
        sub_raw, sub_valid, sample_voxel_size, capacity)
    return sub_raw[idx], sub_alphas[idx], ok, cnt


@jax.jit
def distort_raw(raw, alphas, qb, tb, qe, te):
    """Elastically bend raw points into the end-pose frame:
    raw' = end^-1 * interp(alpha) * raw (reference odometry.cpp:162-170)."""
    world = res.interp_world_points(qb, tb, qe, te, raw, alphas)
    from ct_icp_tpu.core import se3 as s3
    qi, ti = s3.se3_inverse(qe, te)
    return s3.quat_rotate(jnp.broadcast_to(qi, world.shape[:-1] + (4,)), world) + ti


@jax.jit
def transform_points(raw, alphas, qb, tb, qe, te):
    """world = interp(alpha) * raw for every point."""
    return res.interp_world_points(qb, tb, qe, te, raw, alphas)


def _update_map_impl(map_state: vm.MapState, world, valid, begin_tr, location,
                     max_distance, do_insert, resolutions, min_dists,
                     max_dirty: int, prune: bool):
    new_levels = []
    inserted = jnp.int32(0)
    for i, level in enumerate(map_state.levels):
        if prune:
            level = vm.prune_level(level, location, max_distance)
        lvl, n = vm.insert_points(
            level, world, valid & do_insert, resolutions[i], min_dists[i],
            begin_tr, max_dirty)
        inserted = inserted + n
        new_levels.append(lvl)
    return vm.MapState(levels=tuple(new_levels)), inserted


def make_update_map_fn(map_options, max_dirty: int):
    """Build the donated-map update step for a given map configuration."""
    resolutions = tuple(r.resolution for r in map_options.resolutions)
    min_dists = tuple(r.min_distance_between_points for r in map_options.resolutions)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("prune",))
    def update_map(map_state, world, valid, begin_tr, location, max_distance,
                   do_insert, prune=True):
        return _update_map_impl(map_state, world, valid, begin_tr, location,
                                max_distance, do_insert, resolutions,
                                min_dists, max_dirty, prune)

    return update_map


def make_rebase_fn(map_options):
    resolutions = tuple(r.resolution for r in map_options.resolutions)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rebase(map_state, shift):
        return vm.MapState(levels=tuple(
            vm.rebuild_level(lvl, shift, resolutions[i])
            for i, lvl in enumerate(map_state.levels)))

    return rebase
