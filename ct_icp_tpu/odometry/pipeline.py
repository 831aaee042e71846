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


def make_frame_step_fn(map_options, statics, sub_capacity: int,
                       max_dirty: int, distort_constant_velocity: bool):
    """One fused XLA program for a whole odometry frame (non-robust path).

    subsample -> keypoint grid sampling -> CT registration -> world transform
    -> insertion decision -> prune+insert, all in a single dispatch with the
    map donated. The host exchanges only: the scan upload, three packed
    vectors in, and one packed result vector out — the design target for a
    device behind a high-latency link.

    frame_scalars layout (f32[10]):
      0 voxel_size          1 sample_voxel_size    2 max_distance
      3 do_register(0/1)    4 force_insert(-1/0/1: -1 none, 0 heuristic, 1 force)
      5 insertion_ego_rotation_threshold   6 skipped_frames
      7 insertion_threshold_frames_skipped 8 distance_error_threshold
      9 orientation_error_threshold

    result layout (f32[24]):
      0:4 quat_begin  4:7 tr_begin  7:11 quat_end  11:14 tr_end
      14 num_residuals 15 num_iters 16 converged 17 valid_problem
      18 sub_count 19 kp_count 20 inserted 21 points_added 22 assess_ok
    """
    import jax.numpy as jnp
    from ct_icp_tpu.core import se3 as s3
    from ct_icp_tpu.icp import solver as slv

    resolutions = tuple(r.resolution for r in map_options.resolutions)
    min_dists = tuple(r.min_distance_between_points for r in map_options.resolutions)
    register = slv.build_register_fn(statics)
    kp_capacity = statics.num_keypoints

    @functools.partial(jax.jit, donate_argnums=(0,))
    def frame_step(map_state, raw, alphas, n_points, pose_init, prior,
                   dyn_packed, frame_scalars):
        n = raw.shape[0]
        valid = jnp.arange(n, dtype=jnp.int32) < n_points
        fs = frame_scalars
        qb0, tb0 = pose_init[0:4], pose_init[4:7]
        qe0, te0 = pose_init[7:11], pose_init[11:14]

        sub_raw, sub_alphas, sub_valid, sub_cnt = preprocess(
            raw, alphas, valid, fs[0], sub_capacity)
        if distort_constant_velocity:
            sub_raw = distort_raw(sub_raw, sub_alphas, qb0, tb0, qe0, te0)

        kp_raw, kp_alphas, kp_valid, kp_cnt = sample_keypoints(
            sub_raw, sub_alphas, sub_valid, fs[1], kp_capacity)

        # do_register==0 (frame 0): zero solver iterations, poses pass through
        dyn_eff = jnp.where(
            jnp.arange(dyn_packed.shape[0]) == 0,
            jnp.where(fs[3] > 0, dyn_packed[0], 0.0), dyn_packed)
        result = register(map_state.levels[statics.level_index],
                          kp_raw, kp_alphas, kp_valid,
                          qb0, tb0, qe0, te0, prior, dyn_eff)
        qb, tb = result.quat_begin, result.tr_begin
        qe, te = result.quat_end, result.tr_end

        world = transform_points(sub_raw, sub_alphas, qb, tb, qe, te)

        # ---- assessment (reference AssessRegistration, odometry.cpp:604-684)
        rel_dist = jnp.linalg.norm(te - tb)
        ego_or = s3.angular_distance_deg(qb, qe)
        rel_or = s3.angular_distance_deg(prior[0:4], qe)
        assess_ok = ((rel_dist <= fs[8]) & (rel_or <= fs[9]) & (ego_or <= fs[9])
                     & result.valid_problem) | (fs[3] <= 0)

        # ---- insertion decision (reference UpdateMap, odometry.cpp:918-933)
        heuristic_add = jnp.where(
            ego_or > fs[5], fs[6] > fs[7], True)
        add = jnp.where(fs[4] < 0, False,
                        jnp.where(fs[4] > 0, True, heuristic_add))
        add = add & assess_ok

        new_levels = []
        inserted = jnp.int32(0)
        location = te
        for i, level in enumerate(map_state.levels):
            level = vm.prune_level(level, location, fs[2])
            lvl, cnt = vm.insert_points(
                level, world, sub_valid & add, resolutions[i], min_dists[i],
                tb, max_dirty)
            inserted = inserted + cnt
            new_levels.append(lvl)

        f32 = lambda v: jnp.asarray(v, jnp.float32).reshape(-1)
        packed = jnp.concatenate([
            qb, tb, qe, te,
            f32(result.num_residuals), f32(result.num_iters),
            f32(result.converged), f32(result.valid_problem),
            f32(sub_cnt), f32(kp_cnt), f32(inserted), f32(add),
            f32(assess_ok), jnp.zeros(1, jnp.float32)])
        # keypoint/world arrays stay on device (free unless a consumer — the
        # CT-BA backend, or the robust path's deferred insertion — reads them)
        return (vm.MapState(levels=tuple(new_levels)), packed,
                (kp_raw, kp_alphas, kp_valid), (world, sub_valid))

    return frame_step


def make_rebase_fn(map_options):
    resolutions = tuple(r.resolution for r in map_options.resolutions)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rebase(map_state, shift):
        return vm.MapState(levels=tuple(
            vm.rebuild_level(lvl, shift, resolutions[i])
            for i, lvl in enumerate(map_state.levels)))

    return rebase
