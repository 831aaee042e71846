"""The multi-resolution voxel hash map as fixed-shape device arrays.

TPU-native re-design of the reference ``MultipleResolutionVoxelMap``
(reference include/ct_icp/map.h:96-617). The robin-hood hash map of
dynamically sized voxel blocks becomes, per resolution level, a fixed-capacity
open-addressed table of fixed-capacity point slots:

    coords  int32[C, 3]   voxel integer coords of each slot (EMPTY sentinel)
    count   int32[C]      occupied points per slot
    points  f32[C, P, 3]  point storage
    normals f32[C, 3]     per-voxel normal (the reference stores one normal per
                          point but overwrites the whole block on every update,
                          map.h:209-235 — per-voxel storage is equivalent)
    nflags  int32[C]      0 = none, 1 = computed, 2 = computed + oriented

Insertion is an order-independent batched scatter replicating the semantics of
``InsertPointInVoxelMap`` (map.h:261-293): capacity-capped, min-distance
deduplicated against existing points. Slot claiming for brand-new voxels uses
synchronized probing rounds with scatter-min arbitration — no locks, no atomics,
deterministic. Neighbor queries replicate ``RadiusSearchInPlace``
(map.h:449-514): scan the (2k+1)^3 voxel neighborhood, bounded top-k by
distance, optional normal-direction visibility filter.

Coordinates are float32 in a *local map frame*; the host odometry keeps a
float64 world origin and rebases the map when the vehicle strays too far
(see odometry/odometry.py), so f32 never sees large magnitudes.
"""

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ct_icp_tpu.config.options import MultiResolutionVoxelMapOptions
from ct_icp_tpu.ops import voxel as vx
from ct_icp_tpu.ops.neighborhood import compute_description

EMPTY = jnp.int32(-2147483648)
TOMB = jnp.int32(-2147483647)  # deleted slot: probe chains continue across it
MAX_PROBES = 16


class MapLevel(NamedTuple):
    coords: jnp.ndarray    # int32 [C, 3]
    count: jnp.ndarray     # int32 [C]
    points: jnp.ndarray    # f32   [C, P, 3]
    normals: jnp.ndarray   # f32   [C, 3]
    nflags: jnp.ndarray    # int32 [C]
    num_points: jnp.ndarray  # int32 scalar


class MapState(NamedTuple):
    levels: Tuple[MapLevel, ...]


def make_level(capacity_log2: int, max_points: int) -> MapLevel:
    c = 1 << capacity_log2
    return MapLevel(
        coords=jnp.full((c, 3), EMPTY, dtype=jnp.int32),
        count=jnp.zeros((c,), dtype=jnp.int32),
        points=jnp.zeros((c, max_points, 3), dtype=jnp.float32),
        normals=jnp.zeros((c, 3), dtype=jnp.float32),
        nflags=jnp.zeros((c,), dtype=jnp.int32),
        num_points=jnp.zeros((), dtype=jnp.int32),
    )


def make_map(options: MultiResolutionVoxelMapOptions) -> MapState:
    return MapState(levels=tuple(
        make_level(r.capacity_log2, r.max_num_points) for r in options.resolutions))


# ------------------------------------------------------------------ lookup —

def _probe_slot(i, h, mask):
    return (h + i.astype(jnp.uint32)) & mask


def find_slots(level: MapLevel, query_coords):
    """Vectorized lookup: voxel coords [M, 3] -> slot index [M] (-1 if absent).

    Single-pass probing: gather the keys of all MAX_PROBES probe positions at
    once and select the first match occurring before the first EMPTY slot —
    one big parallel gather instead of MAX_PROBES dependent round trips
    (which are latency-bound on TPU).
    """
    c = level.coords.shape[0]
    mask_u = jnp.uint32(c - 1)
    h = vx.voxel_hash_u32(query_coords)

    probes = jnp.arange(MAX_PROBES, dtype=jnp.uint32)
    slots = ((h[:, None] + probes[None, :]) & mask_u).astype(jnp.int32)  # [M,R]
    keys = level.coords[slots]                                 # [M, R, 3]
    is_empty = keys[..., 0] == EMPTY
    is_match = jnp.all(keys == query_coords[:, None, :], axis=-1) & ~is_empty
    # only matches strictly before the first EMPTY along the chain count
    before_empty = jnp.cumsum(is_empty.astype(jnp.int32), axis=-1) == 0
    hit = is_match & before_empty
    any_hit = jnp.any(hit, axis=-1)
    first = jnp.argmax(hit, axis=-1)
    found = jnp.take_along_axis(slots, first[:, None], axis=-1)[:, 0]
    return jnp.where(any_hit, found, -1)


# ---------------------------------------------------------------- insertion —

def _resolve_or_claim_slots(coords_table, pt_coords, valid):
    """Assign each point a slot for its voxel, creating voxels as needed.

    Phase 1 searches the full probe chain for an existing entry (so tombstones
    never cause duplicate voxels). Phase 2 runs synchronized claiming rounds
    for the remaining points: at round r every unresolved point examines slot
    (h+r); EMPTY/TOMB slots are claimed via scatter-min arbitration, and
    same-voxel losers resolve to the winner's slot on re-read.

    Returns (updated coords_table, assigned_slot [N] (-1 unresolved), resolved).
    """
    c = coords_table.shape[0]
    mask_u = jnp.uint32(c - 1)
    n = pt_coords.shape[0]
    h = vx.voxel_hash_u32(pt_coords)
    pid = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(2147483647)

    # phase 1: match against existing entries along the whole chain
    # (single-pass parallel probing, same scheme as find_slots)
    probes = jnp.arange(MAX_PROBES, dtype=jnp.uint32)
    pslots = ((h[:, None] + probes[None, :]) & mask_u).astype(jnp.int32)
    keys = coords_table[pslots]
    is_empty = keys[..., 0] == EMPTY
    is_match = jnp.all(keys == pt_coords[:, None, :], axis=-1) & ~is_empty
    before_empty = jnp.cumsum(is_empty.astype(jnp.int32), axis=-1) == 0
    hit = is_match & before_empty
    any_hit = jnp.any(hit, axis=-1) & valid
    first = jnp.argmax(hit, axis=-1)
    found = jnp.take_along_axis(pslots, first[:, None], axis=-1)[:, 0]
    assigned = jnp.where(any_hit, found, -1)
    resolved = any_hit

    # phase 2: claim EMPTY/TOMB slots for new voxels
    def claim_body(r, carry):
        table, assigned, resolved = carry
        s = _probe_slot(r, h, mask_u).astype(jnp.int32)
        key = table[s]
        claimable = (key[:, 0] == EMPTY) | (key[:, 0] == TOMB)
        # a slot written by an earlier round's winner of the same voxel
        is_match = jnp.all(key == pt_coords, axis=-1) & ~claimable
        newly = ~resolved & valid & is_match
        assigned = jnp.where(newly, s, assigned)
        resolved = resolved | newly

        attempt = ~resolved & valid & claimable
        claim_idx = jnp.where(attempt, s, c)  # out-of-bounds -> dropped
        claim = jnp.full((c,), big, dtype=jnp.int32).at[claim_idx].min(
            pid, mode="drop")
        winner = attempt & (claim[jnp.clip(s, 0, c - 1)] == pid)
        table = table.at[jnp.where(winner, s, c)].set(pt_coords, mode="drop")

        key2 = table[s]
        got = ~resolved & valid & jnp.all(key2 == pt_coords, axis=-1)
        assigned = jnp.where(got, s, assigned)
        resolved = resolved | got
        return table, assigned, resolved

    table, assigned, resolved = jax.lax.fori_loop(
        0, MAX_PROBES, claim_body, (coords_table, assigned, resolved))
    return table, assigned, resolved & valid


def _segment_rank(slots, eligible, n):
    """Rank of each eligible point among eligible points of the same slot."""
    inv = (~eligible).astype(jnp.int32)
    order = jnp.lexsort((slots, inv))
    s_sorted = slots[order]
    e_sorted = eligible[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]]) & e_sorted
    pos = jnp.arange(n, dtype=jnp.int32)
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_start = jnp.zeros((n,), jnp.int32).at[jnp.clip(seg_id, 0, n - 1)].max(
        pos * first.astype(jnp.int32))
    rank_sorted = pos - seg_start[jnp.clip(seg_id, 0, n - 1)]
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    first_of_slot = jnp.zeros((n,), bool).at[order].set(first)
    return rank, first_of_slot


def insert_points(level: MapLevel, pts, valid, resolution, min_dist,
                  begin_tr, max_dirty: int):
    """Functional insert of a point batch into one map level.

    Replicates InsertPointInVoxelMap (reference map.h:261-293): new voxel ->
    insert; voxel below capacity -> insert iff squared distance to every
    existing point exceeds min_dist^2. Afterward recomputes the per-voxel
    normal of every dirty voxel with >= 5 points and orients it against the
    frame's begin location (reference map.h:209-235).

    Args:
      level: MapLevel state.
      pts: [N, 3] world (map-frame) points.
      valid: [N] bool.
      resolution: voxel size (dynamic scalar ok).
      min_dist: min distance between points in a voxel (dynamic scalar ok).
      begin_tr: [3] frame begin location (for normal orientation).
      max_dirty: static cap on voxels whose normals are recomputed.

    Returns:
      (new_level, num_inserted int32)
    """
    c, p = level.points.shape[0], level.points.shape[1]
    n = pts.shape[0]
    pt_coords = vx.voxel_coords(pts, resolution)

    table, assigned, resolved = _resolve_or_claim_slots(
        level.coords, pt_coords, valid)
    slot = jnp.where(resolved, assigned, 0)

    # min-distance check against existing points of the voxel
    existing = level.points[slot]                     # [N, P, 3]
    ecount = level.count[slot]                        # [N]
    in_cap = jnp.arange(p, dtype=jnp.int32)[None, :] < ecount[:, None]
    d2 = jnp.sum((existing - pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(in_cap, d2, jnp.inf)
    min_d2 = jnp.min(d2, axis=-1)
    far_enough = (ecount == 0) | (min_d2 > min_dist * min_dist)
    eligible = resolved & far_enough & (ecount < p)

    rank, first_of_slot = _segment_rank(slot, eligible, n)
    pos = ecount + rank
    accept = eligible & (pos < p)

    flat_idx = jnp.where(accept, slot * p + pos, c * p)
    points_flat = level.points.reshape(c * p, 3).at[flat_idx].set(
        pts, mode="drop")
    new_points = points_flat.reshape(c, p, 3)
    add = jnp.zeros((c,), jnp.int32).at[jnp.where(accept, slot, c)].add(
        1, mode="drop")
    new_count = level.count + add
    num_inserted = jnp.sum(accept.astype(jnp.int32))

    # ---- dirty-voxel normal recompute (reference map.h:209-235) ----
    dirty_mark = accept & first_of_slot
    didx, _dcount, dvalid = vx.compact_mask(dirty_mark, max_dirty)
    dslot = jnp.where(dvalid, slot[didx], 0)
    dpts = new_points[dslot]                           # [D, P, 3]
    dcnt = new_count[dslot]
    dmask = jnp.arange(p, dtype=jnp.int32)[None, :] < dcnt[:, None]
    origin = dpts[:, 0, :]
    desc = compute_description(dpts, dmask, origin)
    # orient: flip if (barycenter - begin_tr) . normal > 0 (pointing away)
    flip = jnp.sum((desc.barycenter - begin_tr) * desc.normal, axis=-1) > 0
    normal = jnp.where(flip[:, None], -desc.normal, desc.normal)
    do_write = dvalid & (dcnt >= 5)
    widx = jnp.where(do_write, dslot, c)
    new_normals = level.normals.at[widx].set(normal, mode="drop")
    new_nflags = level.nflags.at[widx].set(2, mode="drop")

    return MapLevel(
        coords=table,
        count=new_count,
        points=new_points,
        normals=new_normals,
        nflags=new_nflags,
        num_points=level.num_points + num_inserted,
    ), num_inserted


def prune_level(level: MapLevel, location, max_distance):
    """Remove voxels whose first point lies farther than max_distance from
    ``location`` (reference RemoveElementsFarFromLocation, map.h:305-322).

    Dropped slots become tombstones so open-addressing probe chains through
    them stay intact; tombstones are reclaimed by later inserts and cleared
    entirely by ``rebuild_level``.
    """
    occupied = level.coords[:, 0] != EMPTY
    d = jnp.linalg.norm(level.points[:, 0, :] - location, axis=-1)
    drop = occupied & (level.coords[:, 0] != TOMB) & (d > max_distance)
    new_coords = jnp.where(drop[:, None], TOMB, level.coords)
    removed = jnp.sum(jnp.where(drop, level.count, 0))
    new_count = jnp.where(drop, 0, level.count)
    new_nflags = jnp.where(drop, 0, level.nflags)
    return MapLevel(
        coords=new_coords,
        count=new_count,
        points=level.points,
        normals=level.normals,
        nflags=new_nflags,
        num_points=level.num_points - removed,
    )


def rebuild_level(level: MapLevel, shift_xyz, resolution):
    """Rebase the map frame (subtract ``shift_xyz`` from all stored points)
    and rebuild the hash table from scratch.

    Row-level rehash: every occupied voxel row keeps its point block, normal
    and count; only the table keys/layout are rebuilt (which also clears all
    tombstones). Voxel membership is re-derived from the shifted first point;
    the rare rows that merge onto the same new voxel id near the origin (a
    truncation-voxelization artifact) lose the arbitration and are dropped.
    """
    c, p = level.points.shape[0], level.points.shape[1]
    occupied = (level.coords[:, 0] != EMPTY) & (level.coords[:, 0] != TOMB) \
        & (level.count > 0)
    new_points = level.points - shift_xyz
    derived = vx.voxel_coords(new_points[:, 0, :], resolution)

    fresh = jnp.full((c, 3), EMPTY, dtype=jnp.int32)
    table, assigned, resolved = _resolve_or_claim_slots(fresh, derived, occupied)
    # rows mapped to an already-claimed coord (merge) resolve to the winner's
    # slot; only the row whose index won the claim may write there.
    row_idx = jnp.arange(c, dtype=jnp.int32)
    writer = jnp.zeros((c,), jnp.int32).at[
        jnp.where(resolved, assigned, c)].max(row_idx, mode="drop")
    is_writer = resolved & (writer[jnp.clip(assigned, 0, c - 1)] == row_idx)
    dst = jnp.where(is_writer, assigned, c)

    out_points = jnp.zeros_like(level.points).reshape(c, p * 3).at[dst].set(
        new_points.reshape(c, p * 3), mode="drop").reshape(c, p, 3)
    out_count = jnp.zeros_like(level.count).at[dst].set(level.count, mode="drop")
    out_normals = jnp.zeros_like(level.normals).at[dst].set(
        level.normals, mode="drop")
    out_nflags = jnp.zeros_like(level.nflags).at[dst].set(
        level.nflags, mode="drop")
    return MapLevel(
        coords=table,
        count=out_count,
        points=out_points,
        normals=out_normals,
        nflags=out_nflags,
        num_points=jnp.sum(out_count),
    )


# ------------------------------------------------------------- radius query —

def _neighbor_offsets(nv: int):
    r = jnp.arange(-nv, nv + 1, dtype=jnp.int32)
    zz, yy, xx = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)  # [O, 3]


@functools.partial(jax.jit, static_argnames=("nv", "k", "use_normal_filter"))
def radius_search(level: MapLevel, queries, query_valid, radius, resolution,
                  nv: int, k: int, sensor_location=None,
                  use_normal_filter: bool = False,
                  threshold_voxel_occupancy=1):
    """Bounded nearest-neighbor search around each query point.

    Replicates RadiusSearchInPlace (reference map.h:449-514): scans the
    (2*nv+1)^3 voxels around each query in this level, keeps the k nearest
    candidates within ``radius``. With ``use_normal_filter`` (reference
    select_valid_normals_direction) candidates whose oriented voxel normal
    faces away from the sensor are skipped.

    Args:
      queries: [M, 3]; query_valid: [M]; radius: scalar or [M].
      resolution: voxel size of this level.
      nv: static voxel neighborhood (ceil(radius/resolution)).
      k: static max neighbors.

    Returns:
      (neighbors [M, k, 3], neighbor_mask [M, k], neighbor_d [M, k])
      sorted by increasing distance.
    """
    c, p = level.points.shape[0], level.points.shape[1]
    m = queries.shape[0]
    offsets = _neighbor_offsets(nv)                    # [O, 3]
    o = offsets.shape[0]
    qc = vx.voxel_coords(queries, resolution)          # [M, 3]
    cand_coords = qc[:, None, :] + offsets[None, :, :]  # [M, O, 3]
    slots = find_slots(level, cand_coords.reshape(-1, 3)).reshape(m, o)
    valid_slot = slots >= 0
    slot_c = jnp.where(valid_slot, slots, 0)

    cnt = level.count[slot_c]                          # [M, O]
    cnt = jnp.where(valid_slot, cnt, 0)
    occ_ok = cnt >= threshold_voxel_occupancy

    pts = level.points[slot_c]                         # [M, O, P, 3]
    in_cap = jnp.arange(p, dtype=jnp.int32)[None, None, :] < cnt[..., None]
    cand_ok = in_cap & occ_ok[..., None] & query_valid[:, None, None]

    if use_normal_filter and sensor_location is not None:
        nrm = level.normals[slot_c]                    # [M, O, 3]
        flg = level.nflags[slot_c]
        scal = jnp.sum((sensor_location - queries)[:, None, :] * nrm, axis=-1)
        keep = (flg < 2) | (scal >= 0.0)
        cand_ok = cand_ok & keep[..., None]

    d = jnp.linalg.norm(pts - queries[:, None, None, :], axis=-1)  # [M, O, P]
    radius_arr = radius if jnp.ndim(radius) > 0 else jnp.full((m,), radius)
    cand_ok = cand_ok & (d <= radius_arr[:, None, None])
    d = jnp.where(cand_ok, d, jnp.inf)

    d_flat = d.reshape(m, o * p)
    neg_top, top_idx = jax.lax.top_k(-d_flat, k)
    nd = -neg_top
    nmask = jnp.isfinite(nd)
    npts = jnp.take_along_axis(
        pts.reshape(m, o * p, 3), top_idx[..., None], axis=1)
    return npts, nmask, jnp.where(nmask, nd, jnp.inf)


@functools.partial(jax.jit, static_argnames=("nv", "use_normal_filter"))
def ball_search(level: MapLevel, queries, query_valid, radius, resolution,
                nv: int, sensor_location=None, use_normal_filter: bool = False,
                threshold_voxel_occupancy=1):
    """All candidates within ``radius`` of each query (no top-k selection).

    The fast-path alternative to :func:`radius_search`: instead of sorting the
    (2nv+1)^3 * P candidates down to the k nearest (the reference's bounded
    priority queue, map.h:470-505), return the full masked candidate set —
    the batched covariance/normal estimation can consume every in-radius
    point directly, which both removes the top-k sort from the hot loop and
    uses strictly more evidence per neighborhood.

    Returns (candidates [M, C, 3], cand_mask [M, C], closest [M, 3],
    closest_dist [M], count [M]) with C = (2nv+1)^3 * P.
    """
    c, p = level.points.shape[0], level.points.shape[1]
    m = queries.shape[0]
    offsets = _neighbor_offsets(nv)
    o = offsets.shape[0]
    qc = vx.voxel_coords(queries, resolution)
    cand_coords = qc[:, None, :] + offsets[None, :, :]
    slots = find_slots(level, cand_coords.reshape(-1, 3)).reshape(m, o)
    valid_slot = slots >= 0
    slot_c = jnp.where(valid_slot, slots, 0)

    cnt = jnp.where(valid_slot, level.count[slot_c], 0)
    occ_ok = cnt >= threshold_voxel_occupancy

    pts = level.points[slot_c]                         # [M, O, P, 3]
    in_cap = jnp.arange(p, dtype=jnp.int32)[None, None, :] < cnt[..., None]
    cand_ok = in_cap & occ_ok[..., None] & query_valid[:, None, None]

    if use_normal_filter and sensor_location is not None:
        nrm = level.normals[slot_c]
        flg = level.nflags[slot_c]
        scal = jnp.sum((sensor_location - queries)[:, None, :] * nrm, axis=-1)
        keep = (flg < 2) | (scal >= 0.0)
        cand_ok = cand_ok & keep[..., None]

    d = jnp.linalg.norm(pts - queries[:, None, None, :], axis=-1)
    radius_arr = radius if jnp.ndim(radius) > 0 else jnp.full((m,), radius)
    cand_ok = cand_ok & (d <= radius_arr[:, None, None])
    d = jnp.where(cand_ok, d, jnp.inf)

    d_flat = d.reshape(m, o * p)
    cand = pts.reshape(m, o * p, 3)
    mask = cand_ok.reshape(m, o * p)
    amin = jnp.argmin(d_flat, axis=-1)
    closest = jnp.take_along_axis(cand, amin[:, None, None], axis=1)[:, 0, :]
    closest_dist = jnp.take_along_axis(d_flat, amin[:, None], axis=1)[:, 0]
    count = jnp.sum(mask, axis=-1)
    return cand, mask, closest, jnp.where(count > 0, closest_dist, jnp.inf), count
