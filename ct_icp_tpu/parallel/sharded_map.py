"""Voxel map sharded across a TPU mesh — the map-scale-out capability.

SURVEY.md §2.4 P5 / BASELINE north star: partition map voxel blocks across
devices so city-scale maps exceed a single chip's HBM and insertion/search
bandwidth scales with the mesh.

Decomposition (shard_map over mesh axis ``map``):
  * each device owns an independent open-addressed table (capacity C/n);
    a voxel belongs to the device ``owner(voxel) = voxel_hash2 % n``,
  * insertion is embarrassingly parallel: every device runs the normal
    insert kernel on the points whose voxels it owns (scans are replicated —
    a frame's points are cheap next to the map),
  * neighborhood queries are replicated: every device scans its local table
    for the (2nv+1)^3 candidate voxels (non-owned voxels simply miss), and
    contributes *moment sums* (count, sum of relatives, sum of outer
    products) plus its best closest-point candidate; one psum over the mesh
    combines the moments exactly — covariance/normal estimation then runs on
    the combined sums (ops/neighborhood.description_from_moments). The only
    collectives are psum over O(M) floats — no point data moves between
    devices.
"""

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops import voxel as vx

# a second independent hash for the owner mapping (decoupled from the slot
# probe hash so shard load stays uniform). numpy scalars, NOT jnp — a
# captured pre-existing device array permanently degrades the axon client
# (docs/PERF.md, "the device-constant cliff").
_OWNER_P1 = np.uint32(2654435761)
_OWNER_P2 = np.uint32(40503)
_OWNER_P3 = np.uint32(2246822519)


def owner_hash(coords):
    c = coords.astype(jnp.uint32)
    return (c[..., 0] * _OWNER_P1 ^ c[..., 1] * _OWNER_P2) + c[..., 2] * _OWNER_P3


class ShardedMapState(NamedTuple):
    levels: Tuple[vm.MapLevel, ...]   # arrays carry a leading shard axis


def make_sharded_map(mesh: Mesh, options, axis_name: str = "map"
                     ) -> ShardedMapState:
    """Per-shard tables of capacity (total capacity / n_shards)."""
    n = mesh.shape[axis_name]
    shards = []
    for r in options.resolutions:
        per_shard_log2 = max(r.capacity_log2 - (n - 1).bit_length(), 8)
        lvl = vm.make_level(per_shard_log2, r.max_num_points)
        stacked = vm.MapLevel(*(jnp.stack([x] * n) for x in lvl))
        shards.append(stacked)
    state = ShardedMapState(levels=tuple(shards))
    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)


def make_sharded_update_fn(mesh: Mesh, options, max_dirty: int,
                           axis_name: str = "map"):
    """Distributed prune+insert: each shard inserts the points it owns."""
    n = mesh.shape[axis_name]
    resolutions = tuple(r.resolution for r in options.resolutions)
    min_dists = tuple(r.min_distance_between_points for r in options.resolutions)

    def local_update(levels, world, valid, begin_tr, location, max_distance):
        my = jax.lax.axis_index(axis_name)
        new_levels = []
        inserted = jnp.int32(0)
        for i, level in enumerate(levels):
            level = jax.tree_util.tree_map(lambda x: x[0], level)
            coords = vx.voxel_coords(world, resolutions[i])
            mine = (owner_hash(coords) % n).astype(jnp.int32) == my
            level = vm.prune_level(level, location, max_distance)
            level, cnt = vm.insert_points(
                level, world, valid & mine, resolutions[i], min_dists[i],
                begin_tr, max_dirty)
            inserted = inserted + cnt
            new_levels.append(jax.tree_util.tree_map(
                lambda x: x[None], level))
        total = jax.lax.psum(inserted, axis_name)
        return tuple(new_levels), total

    in_specs = (tuple(vm.MapLevel(*(P(axis_name),) * 7)
                      for _ in resolutions),
                P(), P(), P(), P(), P())
    out_specs = (tuple(vm.MapLevel(*(P(axis_name),) * 7)
                       for _ in resolutions), P())

    fn = jax.jit(jax.shard_map(local_update, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs))

    def update(state: ShardedMapState, world, valid, begin_tr, location,
               max_distance):
        levels, total = fn(state.levels, world, valid, begin_tr, location,
                           max_distance)
        return ShardedMapState(levels=levels), total

    return update


def make_partitioned_update_fn(mesh: Mesh, options, max_dirty: int,
                               axis_name: str = "map", slack: float = 2.0):
    """Point-partitioned distributed insert (docs/SCALING.md sketch built).

    The broadcast insert (:func:`make_sharded_update_fn`) replicates the
    full scan to every shard and masks by ownership: ICI-cheap but the
    claim/election compute is O(full scan) PER SHARD — mesh-size-invariant
    wall time. This variant is the throughput-scaling alternative for when
    insert sits on the critical path:

      1. the scan arrives SHARDED along the mesh axis (each device holds
         its 1/N chunk — the natural layout when N hosts each preprocess
         their slice),
      2. each shard computes voxel owners for its chunk (elementwise) and
         packs per-destination send buffers of fixed capacity
         ``ceil(chunk/N * slack)`` (padded — XLA needs static shapes),
      3. ONE ``lax.all_to_all`` per level exchanges ownership
         (~scan bytes / N per link, riding ICI),
      4. claim/election runs on the owned subset only: O(scan/N * slack)
         compute per shard — insert wall time now scales 1/N.

    Points beyond a pair's send capacity are dropped and counted
    (``dropped`` psum in the result; slack=2 makes this vanishingly rare
    for hash-uniform voxel owners). Per-(src,dst) packing preserves source
    order and all_to_all concatenates sources in axis order, so each
    shard's owned subset arrives in global scan order — the same election
    sequence as the broadcast variant sees.
    """
    n = mesh.shape[axis_name]
    resolutions = tuple(r.resolution for r in options.resolutions)
    min_dists = tuple(r.min_distance_between_points for r in options.resolutions)

    def local_update(levels, world, valid, begin_tr, location, max_distance):
        my = jax.lax.axis_index(axis_name)
        del my  # ownership is implicit in the all_to_all exchange
        m = world.shape[0]                       # local chunk size
        cap = max(64, -(-int(m * slack) // n))   # per-(src,dst) capacity
        new_levels = []
        inserted = jnp.int32(0)
        dropped = jnp.int32(0)
        for i, level in enumerate(levels):
            level = jax.tree_util.tree_map(lambda x: x[0], level)
            coords = vx.voxel_coords(world, resolutions[i])
            owner = (owner_hash(coords) % n).astype(jnp.int32)
            # rank of each point within its destination group (packed pos)
            onehot = owner[:, None] == jnp.arange(n, dtype=jnp.int32)[None]
            onehot = onehot & valid[:, None]
            rank = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1
            pos = jnp.take_along_axis(rank, owner[:, None], axis=1)[:, 0]
            ok = valid & (pos < cap)
            dropped = dropped + jnp.sum(valid & ~ok)
            # scatter into [n, cap, 3]; invalid rows target row n (dropped)
            dst = jnp.where(ok, owner, n)
            send = jnp.zeros((n + 1, cap, 3), world.dtype)
            send = send.at[dst, jnp.where(ok, pos, 0)].set(world)[:n]
            sv = jnp.zeros((n + 1, cap), bool)
            sv = sv.at[dst, jnp.where(ok, pos, 0)].set(ok)[:n]
            recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                                      concat_axis=0, tiled=False)
            rv = jax.lax.all_to_all(sv, axis_name, split_axis=0,
                                    concat_axis=0, tiled=False)
            pts = recv.reshape(n * cap, 3)
            pvalid = rv.reshape(n * cap)
            level = vm.prune_level(level, location, max_distance)
            level, cnt = vm.insert_points(
                level, pts, pvalid, resolutions[i], min_dists[i],
                begin_tr, max_dirty)
            inserted = inserted + cnt
            new_levels.append(jax.tree_util.tree_map(
                lambda x: x[None], level))
        total = jax.lax.psum(inserted, axis_name)
        total_dropped = jax.lax.psum(dropped, axis_name)
        return tuple(new_levels), total, total_dropped

    in_specs = (tuple(vm.MapLevel(*(P(axis_name),) * 7)
                      for _ in resolutions),
                P(axis_name), P(axis_name), P(), P(), P())
    out_specs = (tuple(vm.MapLevel(*(P(axis_name),) * 7)
                       for _ in resolutions), P(), P())

    fn = jax.jit(jax.shard_map(local_update, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs))

    def update(state: ShardedMapState, world, valid, begin_tr, location,
               max_distance):
        m = world.shape[0]
        if m % n:   # pad the point axis to a multiple of the mesh size
            pad = n - m % n
            world = jnp.concatenate(
                [world, jnp.zeros((pad, 3), world.dtype)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        levels, total, dropped = fn(state.levels, world, valid, begin_tr,
                                    location, max_distance)
        return ShardedMapState(levels=levels), total, dropped

    return update


def make_sharded_ball_query_fn(mesh: Mesh, options, level_index: int, nv: int,
                               axis_name: str = "map"):
    """Distributed neighborhood query via moment-sum reduction.

    queries are replicated; returns (count [M], desc moments combined into
    (closest [M,3], closest_dist [M], barycenter-ready sums)) — shaped like
    the single-chip ball_search + compute_description pipeline.
    """
    resolution = options.resolutions[level_index].resolution

    def local_query(levels, queries, query_valid, radius):
        level = jax.tree_util.tree_map(lambda x: x[0], levels[level_index])
        count, sum_rel, sum_outer, closest, closest_dist = \
            vm.ball_search_moments(level, queries, query_valid, radius,
                                   resolution, nv=nv)
        # combine exactly across shards
        count = jax.lax.psum(count, axis_name)
        sum_rel = jax.lax.psum(sum_rel, axis_name)
        sum_outer = jax.lax.psum(sum_outer, axis_name)
        # closest point: min over shards
        best = jax.lax.pmin(closest_dist, axis_name)
        is_best = closest_dist <= best + 1e-12
        closest = jax.lax.psum(
            jnp.where(is_best[:, None], closest, 0.0), axis_name)
        n_best = jax.lax.psum(is_best.astype(queries.dtype), axis_name)
        closest = closest / jnp.maximum(n_best[:, None], 1.0)
        return count, sum_rel, sum_outer, closest, best

    in_specs = (tuple(vm.MapLevel(*(P(axis_name),) * 7)
                      for _ in options.resolutions), P(), P(), P())
    out_specs = (P(), P(), P(), P(), P())
    fn = jax.jit(jax.shard_map(local_query, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs))

    def query(state: ShardedMapState, queries, query_valid, radius):
        return fn(state.levels, queries, query_valid,
                  jnp.asarray(radius, jnp.float32))

    return query
