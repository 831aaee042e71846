"""Fixed-shape voxel-grid subsampling kernels.

TPU-native replacements for the reference's hash-map based samplers:
  * ``sub_sample_frame``  (reference src/ct_icp/ct_icp.cpp:64-83) — one point
    per voxel of the raw scan. The reference keeps a random point (shuffle +
    first-in-wins); here selection is the deterministic minimum-original-index
    point of each voxel via a lexicographic sort + segment heads, which makes
    results reproducible and shard-invariant.
  * ``grid_sampling``     (reference src/ct_icp/ct_icp.cpp:85-101) — the same
    primitive at the keypoint voxel size.
  * ``adaptive_grid_sampling`` (reference include/ct_icp/algorithm/sampling.h:55-110)
    — distance-banded voxel sizes.

All return fixed-capacity index buffers + masks, never materialized copies, so
callers can gather whichever per-point fields they need.
"""

import functools

import jax
import jax.numpy as jnp

from ct_icp_tpu.ops import voxel as vx


@functools.partial(jax.jit, static_argnames=("capacity", "table_log2"))
def voxel_subsample_indices(points, valid, voxel_size, capacity,
                            table_log2: int = 22):
    """One representative point per voxel (sort-free).

    The representative is the minimum-original-index point of each voxel,
    selected by a scatter-min claim into a hash table of 2**table_log2 slots
    (no sorting — sorts are the expensive primitive on TPU). Distinct voxels
    that collide in the table merge to one representative; with the default
    table (4M slots) that loses well under 0.1% of voxels per scan, and the
    selection stays fully deterministic.

    Args:
      points: [N, 3] raw points.
      valid: [N] bool mask.
      voxel_size: scalar (dynamic ok).
      capacity: static output size M.

    Returns:
      (indices [M] int32 into the input, out_valid [M] bool, count int32),
      packed in original point order.
    """
    n = points.shape[0]
    t = 1 << table_log2
    coords = vx.voxel_coords(points, voxel_size)
    h = (vx.voxel_hash_u32(coords) & jnp.uint32(t - 1)).astype(jnp.int32)
    pid = jnp.arange(n, dtype=jnp.int32)
    claim = jnp.full((t,), jnp.int32(2147483647)).at[
        jnp.where(valid, h, t)].min(pid, mode="drop")
    mask = valid & (claim[h] == pid)
    idx, count, out_valid = vx.compact_mask(mask, capacity)
    return idx, out_valid, count


@functools.partial(jax.jit, static_argnames=("capacity",))
def voxel_subsample_indices_exact(points, valid, voxel_size, capacity):
    """Exact (collision-free) variant via lexicographic sort — the reference
    semantics baseline for tests."""
    coords = vx.voxel_coords(points, voxel_size)
    order = vx.lexsort_order(coords, valid)
    starts = vx.group_starts(coords[order], valid[order])
    mask = jnp.zeros_like(valid).at[order].set(starts)
    idx, count, out_valid = vx.compact_mask(mask, capacity)
    return idx, out_valid, count


@functools.partial(jax.jit, static_argnames=("capacity", "num_per_voxel"))
def voxel_sample_k_indices(points, valid, voxel_size, capacity, num_per_voxel):
    """Up to ``num_per_voxel`` representatives per voxel (general form)."""
    coords = vx.voxel_coords(points, voxel_size)
    order = vx.lexsort_order(coords, valid)
    sorted_valid = valid[order]
    starts = vx.group_starts(coords[order], sorted_valid)
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    pos = jnp.arange(points.shape[0], dtype=jnp.int32)
    seg_start_pos = jnp.zeros_like(pos).at[seg_id].max(pos * starts.astype(jnp.int32))
    rank = pos - seg_start_pos[seg_id]
    keep_sorted = sorted_valid & (rank < num_per_voxel)
    mask = jnp.zeros_like(valid).at[order].set(keep_sorted)
    idx, count, out_valid = vx.compact_mask(mask, capacity)
    return idx, out_valid, count


def adaptive_grid_sampling_indices(points, valid, options, capacity):
    """Distance-banded adaptive sampling (reference sampling.h:55-110).

    A point at range d from the sensor is voxelized with the voxel size of the
    last band whose lower edge is < d; points below the first edge or at/above
    the last edge are dropped. ``options`` is AdaptiveGridSamplingOptions
    (static). Returns (indices [capacity], out_valid, count).
    """
    bands = options.distance_voxel_size
    edges = jnp.asarray([b[0] for b in bands], dtype=points.dtype)
    sizes = jnp.asarray([b[1] for b in bands], dtype=points.dtype)
    dist = jnp.linalg.norm(points, axis=-1)
    band = jnp.searchsorted(edges, dist, side="left") - 1  # last edge < d
    in_range = (dist >= bands[0][0]) & (dist < bands[-1][0])
    band_c = jnp.clip(band, 0, len(bands) - 1)
    vsize = sizes[band_c]
    coords = vx.voxel_coords(points, jnp.where(vsize > 0, vsize, 1.0)[..., None])
    ok = valid & in_range
    # group by (band, voxel coords): lexsort with band as extra key
    inv = (~ok).astype(jnp.int32)
    order = jnp.lexsort((coords[..., 2], coords[..., 1], coords[..., 0], band_c, inv))
    sc, sb, sv = coords[order], band_c[order], ok[order]
    same = jnp.all(sc[1:] == sc[:-1], axis=-1) & (sb[1:] == sb[:-1])
    starts = jnp.concatenate([jnp.ones((1,), bool), ~same]) & sv
    if options.num_points_per_voxel <= 1:
        keep_sorted = starts
    else:
        seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
        pos = jnp.arange(points.shape[0], dtype=jnp.int32)
        seg_start_pos = jnp.zeros_like(pos).at[seg_id].max(pos * starts.astype(jnp.int32))
        keep_sorted = sv & ((pos - seg_start_pos[seg_id]) < options.num_points_per_voxel)
    mask = jnp.zeros_like(valid).at[order].set(keep_sorted)
    if options.max_num_points > 0:
        # global cap: keep the first max_num_points selected (scan order)
        csum = jnp.cumsum(mask.astype(jnp.int32))
        mask = mask & (csum <= options.max_num_points)
    idx, count, out_valid = vx.compact_mask(mask, capacity)
    return idx, out_valid, count


@functools.partial(jax.jit, static_argnames=("capacity",))
def random_cap_indices(valid, key, capacity, max_keep):
    """Random cap to ``max_keep`` points (reference odometry.cpp:549-552 uses
    shuffle+resize; here a uniform random ranking, deterministic given key).

    Returns (indices [capacity], out_valid, count) selecting min(count, max_keep)
    random valid entries.
    """
    n = valid.shape[0]
    scores = jax.random.uniform(key, (n,))
    scores = jnp.where(valid, scores, 2.0)
    order = jnp.argsort(scores)
    count = jnp.minimum(jnp.sum(valid), max_keep).astype(jnp.int32)
    idx = order[:capacity].astype(jnp.int32)
    out_valid = jnp.arange(capacity, dtype=jnp.int32) < count
    return idx, out_valid, count
