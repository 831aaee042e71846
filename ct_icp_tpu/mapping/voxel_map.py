"""The multi-resolution voxel hash map as fixed-shape device arrays.

TPU-native re-design of the reference ``MultipleResolutionVoxelMap``
(reference include/ct_icp/map.h:96-617). The robin-hood hash map of
dynamically sized voxel blocks becomes, per resolution level, a fixed-capacity
open-addressed table of fixed-capacity point slots.

Layout discipline (the part that makes this fast on TPU): the last two array
dimensions are physically tiled to (8, 128) lanes, so any hot buffer with a
trailing dimension of 3 is padded 42x in HBM and row-gathers of it waste the
same factor in bandwidth. Therefore:

    keys    u32[C]        slot occupancy: 0 = EMPTY, 1 = TOMB, else a second
                          32-bit hash of the voxel coords (identity check by
                          hash; collision probability ~2^-32 per chain)
    count   int32[C]
    points  f32[C, 3P]    PLANAR per row: x-plane | y-plane | z-plane, so
                          plane extraction is a contiguous slice (interleaved
                          xyz needs stride-3 cross-lane shuffles — measured
                          ~10 ms per candidate search)
    normals f32[C, 3]     per-voxel normal (small, cold)
    nflags  int32[C]      0 none, 1 computed, 2 computed+oriented

and the neighbor search works on x/y/z planes of shape [M, O, P] (no
trailing-3 anywhere hot), producing *moment sums* for the descriptor stage.

Insertion replicates ``InsertPointInVoxelMap`` (map.h:261-293): capacity
capped, min-distance deduplicated; slot claiming for new voxels uses
synchronized probing rounds with scatter-min arbitration — deterministic and
lock-free. Probing is single-pass (all MAX_PROBES positions gathered at once);
deletes are tombstones; a rebase rebuilds the table row-wise.

Coordinates are float32 in a *local map frame*; the host odometry keeps a
float64 world origin and rebases the map when the vehicle strays too far
(see odometry/odometry.py), so f32 never sees large magnitudes.
"""

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ct_icp_tpu.config.options import MultiResolutionVoxelMapOptions
from ct_icp_tpu.ops import voxel as vx
from ct_icp_tpu.ops.neighborhood import description_from_moments

# numpy scalars, NOT jnp: a module-level jnp constant is an eager device
# array, and capturing one in a jitted program permanently degrades the
# axon client ~150x (docs/PERF.md, "the device-constant cliff").
EMPTY = np.uint32(0)
TOMB = np.uint32(1)
MAX_PROBES = 16
# Query-side probe window (the claim loop stays exact to MAX_PROBES, and
# catches entries the shallow window would miss, so inserts never duplicate
# voxels). At the <5% table loads this map runs at, probe chains longer than
# 8 are vanishingly rare; halving the window halves the rolled-window build
# and the probe row bytes.
PROBE_WINDOW = 8

# second (identity) hash, decoupled from the probe hash
_K2A = np.uint32(2654435761)
_K2B = np.uint32(2246822519)
_K2C = np.uint32(3266489917)


def voxel_key_u32(coords):
    """Identity key of a voxel: a second 32-bit hash, biased away from the
    EMPTY/TOMB sentinels."""
    c = coords.astype(jnp.uint32)
    h = (c[..., 0] * _K2A ^ c[..., 1] * _K2B) + c[..., 2] * _K2C
    return jnp.where(h < 2, h + 2, h)


class MapLevel(NamedTuple):
    keys: jnp.ndarray      # u32  [C]
    count: jnp.ndarray     # i32  [C]
    points: jnp.ndarray    # f32  [C, P*3] xyz interleaved
    normals: jnp.ndarray   # f32  [C, 3]
    nflags: jnp.ndarray    # i32  [C]
    win: jnp.ndarray       # u32  [C, 2R] probe window (keys ++ counts),
    #                        maintained by every table/count mutation so
    #                        lookups skip the 2R-roll rebuild (built once per
    #                        insert instead of once per search call)
    num_points: jnp.ndarray  # i32 scalar

    @property
    def capacity(self):
        return self.keys.shape[0]

    @property
    def max_points(self):
        return self.points.shape[1] // 3


class MapState(NamedTuple):
    levels: Tuple[MapLevel, ...]


def make_level(capacity_log2: int, max_points: int) -> MapLevel:
    c = 1 << capacity_log2
    return MapLevel(
        keys=jnp.zeros((c,), dtype=jnp.uint32),
        count=jnp.zeros((c,), dtype=jnp.int32),
        points=jnp.zeros((c, max_points * 3), dtype=jnp.float32),
        normals=jnp.zeros((c, 3), dtype=jnp.float32),
        nflags=jnp.zeros((c,), dtype=jnp.int32),
        win=jnp.zeros((c, 2 * PROBE_WINDOW), dtype=jnp.uint32),
        num_points=jnp.zeros((), dtype=jnp.int32),
    )


def build_window(keys, count):
    """The [C, 2R] probe window (keys ++ counts) of a table state."""
    return jnp.concatenate(
        [_key_window(keys), _key_window(count.astype(jnp.uint32))], axis=1)


def make_map(options: MultiResolutionVoxelMapOptions) -> MapState:
    return MapState(levels=tuple(
        make_level(r.capacity_log2, r.max_num_points)
        for r in options.resolutions))


def _xyz_planes(rows, p):
    """[..., 3P] planar rows -> (x, y, z) planes [..., P] (contiguous
    slices — an interleaved x0,y0,z0,... layout needs stride-3 cross-lane
    shuffles on every access, which measured ~10 ms per search)."""
    return rows[..., 0:p], rows[..., p:2 * p], rows[..., 2 * p:3 * p]


def _first_point(points, p):
    """[C, 3P] planar rows -> first stored point of each voxel [C, 3]."""
    return jnp.stack([points[:, 0], points[:, p], points[:, 2 * p]], axis=-1)


# ------------------------------------------------------------------ lookup —

def _probe_slots(h, c):
    probes = jnp.arange(MAX_PROBES, dtype=jnp.uint32)
    return ((h[..., None] + probes) & jnp.uint32(c - 1)).astype(jnp.int32)


def _key_window(keys, r_window: int = PROBE_WINDOW):
    """Sliding probe window of the keys table: u32 [C, R], row i holding
    keys[(i .. i+R-1) mod C].

    Probing via one ROW gather of this window is ~3x faster than gathering
    the R probe positions as scalars (measured 2.8 ms vs 7.9 ms at 55k
    queries): a scalar gather pays per element, a row gather pays per 64-byte
    row. The window is built with rolls (pure vector ops) inside the same
    program, so it is always consistent with the table."""
    return jnp.stack([jnp.roll(keys, -r) for r in range(r_window)], axis=1)


def _select_first_match(keys_probe, k2):
    """First probe position matching k2 before the first EMPTY (-1 if none).

    Returns (j [M] int32 probe offset, any_hit [M] bool)."""
    is_empty = keys_probe == EMPTY
    is_match = keys_probe == k2[..., None]
    before_empty = jnp.cumsum(is_empty.astype(jnp.int32), axis=-1) == 0
    hit = is_match & before_empty
    return jnp.argmax(hit, axis=-1), jnp.any(hit, axis=-1)


def find_slots_with_count(level: MapLevel, query_coords):
    """Vectorized lookup: voxel coords [..., 3] -> (slot [...], count [...]).

    slot is -1 where the voxel is absent (count 0 there). One row gather of a
    combined [C, 2R] window (keys ++ counts) serves both answers — the
    separate count gather that a slot-then-count sequence needs is a scalar
    gather and measured ~2.3 ms at candidate-search sizes.
    """
    c = level.capacity
    shape = query_coords.shape[:-1]
    coords = query_coords.reshape(-1, 3)
    h = vx.voxel_hash_u32(coords)
    k2 = voxel_key_u32(coords)
    rows = level.win[(h & jnp.uint32(c - 1)).astype(jnp.int32)]   # [M, 2R]
    j, any_hit = _select_first_match(rows[:, :PROBE_WINDOW], k2)
    slot = ((h + j.astype(jnp.uint32)) & jnp.uint32(c - 1)).astype(jnp.int32)
    cnt = jnp.take_along_axis(
        rows[:, PROBE_WINDOW:], j[:, None], axis=-1)[:, 0].astype(jnp.int32)
    slot = jnp.where(any_hit, slot, -1)
    cnt = jnp.where(any_hit, cnt, 0)
    return slot.reshape(shape), cnt.reshape(shape)


def find_slots(level: MapLevel, query_coords):
    """Vectorized lookup: voxel coords [M, 3] -> slot index [M] (-1 absent)."""
    return find_slots_with_count(level, query_coords)[0]


# ---------------------------------------------------------------- insertion —

def _resolve_or_claim_slots(keys_table, pt_keys, h, valid, keys_window=None,
                            ablate: str = ""):
    """Assign each point a slot for its voxel, creating voxels as needed.

    Phase 1: single-pass parallel probe for existing entries (so tombstones
    never cause duplicates), against ``keys_window`` when the caller already
    maintains one (it must reflect ``keys_table``). Phase 2: synchronized
    claiming rounds — EMPTY or TOMB slots are claimed via scatter-min
    arbitration; same-voxel losers resolve to the winner's slot on re-read.

    Returns (updated keys_table, assigned_slot [N] (-1 unresolved), resolved).
    """
    c = keys_table.shape[0]
    mask_u = jnp.uint32(c - 1)
    n = pt_keys.shape[0]
    big = jnp.int32(2147483647)

    if keys_window is None:
        keys_window = _key_window(keys_table)
    keys_probe = keys_window[
        (h & mask_u).astype(jnp.int32)]                     # [N, R] row gather
    first, any_hit = _select_first_match(keys_probe, pt_keys)
    any_hit = any_hit & valid
    found = ((h + first.astype(jnp.uint32)) & mask_u).astype(jnp.int32)
    assigned = jnp.where(any_hit, found, -1)
    resolved = any_hit

    if "ins_no_claimloop" in frozenset(ablate.split(",")):
        # measurement only: phase-1 resolve only, no voxel creation
        return keys_table, assigned, resolved & valid

    # ---- phase 2 on the COMPACTED unresolved subset. In steady state
    # phase 1 resolves ~85-90 % of the batch (the subsample mostly
    # revisits mapped voxels), and every op of the claiming rounds is
    # element-count-bound through the scalar core — running the loop at
    # the survivor rung instead of the full batch shape cut the claim
    # from 3.1 to ~0.6 ms/frame at driving shapes (the claim loop was the
    # single largest stage of the whole megastep, tools/ablate_megastep,
    # round 5). Exactness: compact_mask is stable and the scatter-min
    # arbitration uses the ORIGINAL scan index, so winners (and therefore
    # the table content) are identical to the uncompacted election.
    need = valid & ~resolved
    idx_n, cnt_n, _ = vx.compact_mask(need, n)

    def claim_at(sz):
        idx = idx_n[:sz]
        ok = jnp.arange(sz, dtype=jnp.int32) < cnt_n
        h_s = h[idx]
        keys_s = pt_keys[idx]
        pid_s = jnp.where(ok, idx, big)   # original index: same arbitration

        def claim_cond(carry):
            r, _, _, res = carry
            return (r < MAX_PROBES) & ~jnp.all(res | ~ok)

        def claim_body(carry):
            r, table, asg, res = carry
            s = ((h_s + r.astype(jnp.uint32)) & mask_u).astype(jnp.int32)
            key = table[s]
            claimable = key <= TOMB
            newly = ~res & ok & (key == keys_s)
            asg = jnp.where(newly, s, asg)
            res = res | newly

            attempt = ~res & ok & claimable
            claim_idx = jnp.where(attempt, s, c)  # out-of-bounds -> dropped
            claim = jnp.full((c,), big, dtype=jnp.int32).at[claim_idx].min(
                pid_s, mode="drop")
            winner = attempt & (claim[jnp.clip(s, 0, c - 1)] == pid_s)
            table = table.at[jnp.where(winner, s, c)].set(keys_s,
                                                          mode="drop")

            key2 = table[s]
            got = ~res & ok & (key2 == keys_s)
            asg = jnp.where(got, s, asg)
            res = res | got
            return r + 1, table, asg, res

        # while_loop with an all-resolved early exit: nearly every batch
        # resolves within the first 1-3 probe rounds, so the worst-case
        # MAX_PROBES rounds of scatter/gather are almost never paid.
        # Initial carries derive from ``idx`` (not fresh constants) so
        # their varying-manual-axes status matches the body outputs under
        # shard_map (the sharded-map insert runs this same code).
        _, table, asg, res = jax.lax.while_loop(
            claim_cond, claim_body,
            (jnp.int32(0), keys_table, idx * 0 - 1, idx < -1))
        back = jnp.where(ok & res, idx, n)
        assigned_f = assigned.at[back].set(asg, mode="drop")
        resolved_f = resolved.at[back].set(True, mode="drop")
        return table, assigned_f, resolved_f

    rungs = []
    r = 2048
    while r < n:
        rungs.append(r)
        r *= 4
    rungs.append(n)

    def ladder(i):
        if i == len(rungs) - 1:
            return lambda: claim_at(rungs[i])
        return lambda: jax.lax.cond(cnt_n <= rungs[i],
                                    lambda: claim_at(rungs[i]),
                                    ladder(i + 1))

    table, assigned, resolved = ladder(0)()
    return table, assigned, resolved & valid


def _segment_rank(slots, eligible, n):
    """Rank of each eligible point among eligible points of the same slot
    (exact, lexsort-based — kept as the semantics baseline for tests)."""
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


def _elect_ranks(slots, eligible, capacity, max_rounds: int):
    """Sort-free per-slot ranks via repeated scatter-min election.

    Round r elects the minimum-index unplaced point of every slot and gives
    it rank r; the while_loop exits as soon as every eligible point is
    placed, so the rounds executed equal the largest same-slot multiplicity
    of the batch (1-2 in steady state, where each voxel receives at most its
    subsample representative). ``max_rounds`` statically caps the inserts
    per voxel per frame — points beyond it keep rank -1 and drop, which only
    slows the fill rate of brand-new voxels (the per-voxel capacity cap
    truncates far harder; the reference's order-dependent sequential insert
    has no exact parallel equivalent either way). Replaces a lexsort that
    measured ~4.8 ms at 16k points with ~1 ms/round.

    Returns (rank [N] int32, -1 = not placed; first_of_slot [N] bool).
    """
    n = slots.shape[0]
    pid = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(2147483647)

    def cond(carry):
        r, remaining, _ = carry
        return (r < max_rounds) & jnp.any(remaining)

    def body(carry):
        r, remaining, rank = carry
        claim = jnp.full((capacity,), big, jnp.int32).at[
            jnp.where(remaining, slots, capacity)].min(pid, mode="drop")
        winner = remaining & (claim[slots] == pid)
        rank = jnp.where(winner, r, rank)
        return r + 1, remaining & ~winner, rank

    # initial rank derives from ``slots`` (not jnp.full) so the carry keeps
    # the varying-manual-axes type under shard_map
    _, _, rank = jax.lax.while_loop(
        cond, body, (jnp.int32(0), eligible, slots * 0 - 1))
    return rank, rank == 0


def insert_points(level: MapLevel, pts, valid, resolution, min_dist,
                  begin_tr, max_dirty: int, with_normals: bool = True,
                  max_rounds: int = 4, ablate: str = ""):
    """Functional insert of a point batch into one map level.

    Replicates InsertPointInVoxelMap (reference map.h:261-293): new voxel ->
    insert; voxel below capacity -> insert iff squared distance to every
    existing point exceeds min_dist^2. When ``with_normals``, recomputes the
    per-voxel normal of every dirty voxel with >= 5 points and orients it
    against the frame's begin location (reference map.h:209-235) — the hot
    path skips this when the profile never reads normals
    (use_normal_filter off; exports use recompute_level_normals instead).

    ``max_rounds`` caps the scatter-min election rounds AND therefore the
    points inserted per voxel per call. The election early-exits at the
    actual max same-voxel multiplicity (1-2 in steady state), so a higher
    cap costs nothing once the map is warm — but the FIRST frames over new
    terrain need it: the reference has no such budget, and a cap of 4
    starves the bootstrap map to ~6 pts/m^2 on open scenes (below
    min_number_neighbors at radius 0.75), failing frame 1 outright.

    ``ablate`` (MEASUREMENT ONLY — tools/ablate_megastep.py): comma-set of
    insert sub-stages to statically remove so their in-situ cost can be
    measured. Tokens: ins_no_elect (election ranks forced 0), ins_no_scatter
    (points buffer untouched), ins_no_ladder (election at the full rung,
    no lax.cond), ins_no_window (probe window left stale). Never set on a
    production path — several tokens produce a semantically WRONG map.
    """
    abl = frozenset(t for t in ablate.split(",") if t)
    c, p = level.capacity, level.max_points
    n = pts.shape[0]
    pt_coords = vx.voxel_coords(pts, resolution)
    h = vx.voxel_hash_u32(pt_coords)
    pt_keys = voxel_key_u32(pt_coords)

    table, assigned, resolved = _resolve_or_claim_slots(
        level.keys, pt_keys, h, valid,
        keys_window=level.win[:, :PROBE_WINDOW], ablate=ablate)
    slot = jnp.where(resolved, assigned, 0)

    # min-distance check against existing points of the voxel
    ecount = level.count[slot]
    if "ins_no_mindist" in abl:   # measurement only
        far_enough = jnp.ones_like(resolved)
    else:
        rows = level.points[slot]                    # [N, P*3]
        ex, ey, ez = _xyz_planes(rows, p)            # [N, P] each
        in_cap = jnp.arange(p, dtype=jnp.int32)[None, :] < ecount[:, None]
        d2 = ((ex - pts[:, 0:1]) ** 2 + (ey - pts[:, 1:2]) ** 2
              + (ez - pts[:, 2:3]) ** 2)
        d2 = jnp.where(in_cap, d2, jnp.inf)
        min_d2 = jnp.min(d2, axis=-1)
        far_enough = (ecount == 0) | (min_d2 > min_dist * min_dist)
    eligible = resolved & far_enough & (ecount < p)

    # ---- eligible compaction ladder: in steady state the min-distance
    # check rejects most candidates (the subsample mostly re-visits already
    # mapped voxels), so the election rounds and the point scatters run at
    # the SURVIVOR count's rung, not the full batch shape (the election was
    # the most expensive insert sub-stage at full shape: 1.5 of 2.3 ms).
    # Early frames over new terrain take the full rung — exact either way.
    n_pts = pts.shape[0]
    e_idx, e_cnt, _ = vx.compact_mask(eligible, n_pts)
    rungs = []
    r = 2048
    while r < n_pts:
        rungs.append(r)
        r *= 4
    rungs.append(n_pts)

    def insert_at(sz):
        idx_e = e_idx[:sz]
        ok_e = jnp.arange(sz, dtype=jnp.int32) < e_cnt
        slot_e = jnp.where(ok_e, slot[idx_e], c)
        if "ins_no_elect" in abl:   # measurement only
            rank_e = jnp.where(ok_e, 0, -1)
            first_e = ok_e
        else:
            rank_e, first_e = _elect_ranks(
                jnp.clip(slot_e, 0, c - 1), ok_e, c, max_rounds)
        pos_e = ecount[jnp.where(ok_e, idx_e, 0)] + rank_e
        accept_e = ok_e & (rank_e >= 0) & (pos_e < p)

        # rejected rows get DISTINCT out-of-bounds sentinels: unique_indices
        # promises XLA every index is unique, and a shared sentinel would
        # break that contract. Accepted indices are unique by construction
        # (one (slot, pos) per accepted point).
        pid3 = 3 * jnp.arange(sz, dtype=jnp.int32)
        base = jnp.where(accept_e, slot_e * (p * 3) + pos_e, c * p * 3 + pid3)
        if "ins_no_scatter" in abl:   # measurement only
            add0 = jnp.zeros((c,), jnp.int32).at[
                jnp.where(accept_e, slot_e, c)].add(1, mode="drop")
            num0 = jnp.sum(accept_e.astype(jnp.int32))
            dirty0 = accept_e & first_e
            d_idx0, _dc0, d_ok0 = vx.compact_mask(dirty0, max_dirty)
            return (level.points, add0, num0,
                    jnp.where(d_ok0, slot_e[d_idx0], c))
        flat = level.points.reshape(-1)
        # one fused scatter for all three coordinate planes: each extra
        # scatter op on the [C, P*3] buffer pays a full-buffer copy whenever
        # XLA cannot alias it in place (measured 4.4 ms per copy)
        off = jnp.where(accept_e, p, 1)
        idx3 = jnp.concatenate([base, base + off, base + 2 * off])
        pts_e = pts[jnp.where(ok_e, idx_e, 0)]
        val = jnp.concatenate([pts_e[:, 0], pts_e[:, 1], pts_e[:, 2]])
        flat = flat.at[idx3].set(val, mode="drop", unique_indices=True)
        new_points = flat.reshape(c, p * 3)
        add = jnp.zeros((c,), jnp.int32).at[
            jnp.where(accept_e, slot_e, c)].add(1, mode="drop")
        num_ins = jnp.sum(accept_e.astype(jnp.int32))
        # dirty slots: first accepted point of each slot, compacted
        dirty_e = accept_e & first_e
        d_idx, _dc, d_ok = vx.compact_mask(dirty_e, max_dirty)
        dslot = jnp.where(d_ok, slot_e[d_idx], c)
        return new_points, add, num_ins, dslot

    def ladder(i):
        if i == len(rungs) - 1:
            return lambda: insert_at(rungs[i])
        return lambda: jax.lax.cond(e_cnt <= rungs[i],
                                    lambda: insert_at(rungs[i]),
                                    ladder(i + 1))

    if "ins_no_ladder" in abl:   # measurement only
        new_points, add, num_inserted, dirty_slots = insert_at(n_pts)
    else:
        new_points, add, num_inserted, dirty_slots = ladder(0)()
    new_count = level.count + add

    # ---- dirty-voxel normal recompute (reference map.h:209-235) ----
    if with_normals:
        dvalid = dirty_slots < c
        dslot = jnp.where(dvalid, dirty_slots, 0)
        dcnt = new_count[dslot]
        normal, bary = _voxel_plane_fit(new_points, new_count, dslot, p)
        # orient: flip if (barycenter - begin_tr) . normal > 0 (pointing away)
        flip = jnp.sum((bary - begin_tr) * normal, axis=-1) > 0
        normal = jnp.where(flip[:, None], -normal, normal)
        do_write = dvalid & (dcnt >= 5)
        widx = jnp.where(do_write, dslot, c)
        new_normals = level.normals.at[widx].set(normal, mode="drop")
        new_nflags = level.nflags.at[widx].set(2, mode="drop")
    else:
        new_normals = level.normals
        new_nflags = level.nflags

    return MapLevel(
        keys=table,
        count=new_count,
        points=new_points,
        normals=new_normals,
        nflags=new_nflags,
        win=(level.win if "ins_no_window" in abl   # measurement only
             else build_window(table, new_count)),
        num_points=level.num_points + num_inserted,
    ), num_inserted


def _voxel_plane_fit(points, count, dslot, p):
    """Per-voxel plane fit of the voxels at rows ``dslot``: moments about
    each voxel's first point -> (normal [D,3], absolute barycenter [D,3])."""
    drows = points[dslot]                            # [D, P*3]
    dx, dy, dz = _xyz_planes(drows, p)
    dcnt = count[dslot]
    dmask = (jnp.arange(p, dtype=jnp.int32)[None, :] < dcnt[:, None]).astype(
        drows.dtype)
    ox, oy, oz = dx[:, 0], dy[:, 0], dz[:, 0]
    rx = (dx - ox[:, None]) * dmask
    ry = (dy - oy[:, None]) * dmask
    rz = (dz - oz[:, None]) * dmask
    count_f = jnp.sum(dmask, axis=-1)
    sum_rel = jnp.stack([rx.sum(-1), ry.sum(-1), rz.sum(-1)], axis=-1)
    sum_outer = jnp.stack([
        jnp.stack([(rx * rx).sum(-1), (rx * ry).sum(-1), (rx * rz).sum(-1)], -1),
        jnp.stack([(rx * ry).sum(-1), (ry * ry).sum(-1), (ry * rz).sum(-1)], -1),
        jnp.stack([(rx * rz).sum(-1), (ry * rz).sum(-1), (rz * rz).sum(-1)], -1),
    ], axis=-2)
    origin = jnp.stack([ox, oy, oz], axis=-1)
    desc = description_from_moments(count_f, sum_rel, sum_outer, origin)
    return desc.normal, desc.barycenter


@jax.jit
def recompute_level_normals(level: MapLevel, location):
    """Recompute (and orient toward ``location``) the normals of EVERY
    occupied voxel with >= 5 points — the on-demand path for map export and
    for switching a normal-less hot path to the visibility filter."""
    c, p = level.capacity, level.max_points
    dslot = jnp.arange(c, dtype=jnp.int32)
    normal, bary = _voxel_plane_fit(level.points, level.count, dslot, p)
    flip = jnp.sum((bary - location) * normal, axis=-1) > 0
    normal = jnp.where(flip[:, None], -normal, normal)
    ok = (level.keys > TOMB) & (level.count >= 5)
    return level._replace(
        normals=jnp.where(ok[:, None], normal, level.normals),
        nflags=jnp.where(ok, 2, level.nflags))


def evict_voxels(level: MapLevel, coords, valid):
    """Empty the voxels at ``coords`` [M, 3] (valid-masked) without
    unclaiming their table slots.

    Counts drop to 0 but keys stay claimed, so (a) open-addressing probe
    chains never break (no tombstone hazard) and (b) a subsequent insert of
    the same voxel resolves to the existing slot and refills it. Used by the
    backend replay (odometry/backend.py): voxels touched by a refined
    frame's OLD world points are evicted before the refined points re-insert
    — the capability analog of the reference ISlamMap::UpdateTrajectory +
    re-insertion (map.h:64-70), which the reference declares but its CT-ICP
    pipeline never exercises either.

    Returns (level, num_points_removed).
    """
    c = level.capacity
    slot = find_slots(level, coords)
    tgt = jnp.where(valid & (slot >= 0), slot, c)
    new_count = level.count.at[tgt].set(0, mode="drop")
    removed = jnp.sum(level.count) - jnp.sum(new_count)
    new_nflags = level.nflags.at[tgt].set(0, mode="drop")
    return MapLevel(
        keys=level.keys,
        count=new_count,
        points=level.points,
        normals=level.normals,
        nflags=new_nflags,
        win=build_window(level.keys, new_count),
        num_points=level.num_points - removed,
    ), removed


def prune_level(level: MapLevel, location, max_distance):
    """Remove voxels whose first point lies farther than max_distance from
    ``location`` (reference RemoveElementsFarFromLocation, map.h:305-322).
    Dropped slots become tombstones (probe chains stay intact)."""
    occupied = level.keys > TOMB
    first = _first_point(level.points, level.max_points)
    d2 = jnp.sum((first - location) ** 2, axis=-1)
    drop = occupied & (d2 > max_distance * max_distance)
    new_keys = jnp.where(drop, TOMB, level.keys)
    removed = jnp.sum(jnp.where(drop, level.count, 0))
    new_count = jnp.where(drop, 0, level.count)
    new_nflags = jnp.where(drop, 0, level.nflags)
    return MapLevel(
        keys=new_keys,
        count=new_count,
        points=level.points,
        normals=level.normals,
        nflags=new_nflags,
        win=build_window(new_keys, new_count),
        num_points=level.num_points - removed,
    )


def rebuild_level(level: MapLevel, shift_xyz, resolution):
    """Rebase the map frame (subtract ``shift_xyz`` from all stored points)
    and rebuild the hash table from scratch (row-level rehash; clears
    tombstones). Rare rows that merge onto one voxel id near the origin (a
    truncation-voxelization artifact) lose the arbitration and are dropped."""
    c, p = level.capacity, level.max_points
    occupied = (level.keys > TOMB) & (level.count > 0)
    shift_row = jnp.repeat(jnp.asarray(shift_xyz, level.points.dtype), p)
    new_points = level.points - shift_row
    derived = vx.voxel_coords(_first_point(new_points, p), resolution)
    h = vx.voxel_hash_u32(derived)
    keys = voxel_key_u32(derived)

    fresh = jnp.zeros((c,), dtype=jnp.uint32)
    table, assigned, resolved = _resolve_or_claim_slots(fresh, keys, h,
                                                        occupied)
    row_idx = jnp.arange(c, dtype=jnp.int32)
    writer = jnp.zeros((c,), jnp.int32).at[
        jnp.where(resolved, assigned, c)].max(row_idx, mode="drop")
    is_writer = resolved & (writer[jnp.clip(assigned, 0, c - 1)] == row_idx)
    dst = jnp.where(is_writer, assigned, c)

    out_points = jnp.zeros_like(level.points).at[dst].set(
        new_points, mode="drop")
    out_count = jnp.zeros_like(level.count).at[dst].set(level.count,
                                                        mode="drop")
    out_normals = jnp.zeros_like(level.normals).at[dst].set(
        level.normals, mode="drop")
    out_nflags = jnp.zeros_like(level.nflags).at[dst].set(
        level.nflags, mode="drop")
    return MapLevel(
        keys=table,
        count=out_count,
        points=out_points,
        normals=out_normals,
        nflags=out_nflags,
        win=build_window(table, out_count),
        num_points=jnp.sum(out_count),
    )


# ------------------------------------------------------------- radius query —

def _neighbor_offsets(nv: int):
    r = jnp.arange(-nv, nv + 1, dtype=jnp.int32)
    zz, yy, xx = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)  # [O, 3]


def gather_candidate_planes(level: MapLevel, queries, query_valid, resolution,
                            nv, sensor_location=None,
                            use_normal_filter: bool = False,
                            threshold_voxel_occupancy=1,
                            max_candidates: int = 0):
    """Search front-end: gather candidate point rows + per-voxel counts.

    This is the expensive (gather-bound) half of the neighbor search; its
    output can be CACHED across ICP iterations (pose deltas between
    iterations are mm-cm — candidate voxel sets barely change) and re-scored
    cheaply by :func:`moments_from_planes`.

    Returns (rows [M, O, 3P] planar x|y|z rows, cnt_ok [M, O] int32 — the
    voxel's point count, zeroed where the voxel fails occupancy / visibility
    / query-validity). Keeping the cache as raw rows + per-VOXEL counts
    instead of per-point x/y/z/ok planes cuts its HBM footprint ~3.5x (a
    trailing dim of P=30 pads to 128 lanes; 3P=90 pads to 128 — and the bool
    plane pads the same), which matters both for the rescore reads and for
    the while_loop carry the solver threads it through.
    """
    m = queries.shape[0]
    offsets = _neighbor_offsets(nv)
    o = offsets.shape[0]
    qc = vx.voxel_coords(queries, resolution)
    cand_coords = qc[:, None, :] + offsets[None, :, :]
    slots, cnt = find_slots_with_count(level, cand_coords)   # [M, O] each
    valid_slot = slots >= 0
    slot_c = jnp.where(valid_slot, slots, 0)
    ok = ((cnt >= threshold_voxel_occupancy) & valid_slot
          & query_valid[:, None])

    if use_normal_filter and sensor_location is not None:
        nrm = level.normals[slot_c]                  # [M, O, 3] (small)
        flg = level.nflags[slot_c]
        scal = jnp.sum((sensor_location - queries)[:, None, :] * nrm, axis=-1)
        ok = ok & ((flg < 2) | (scal >= 0.0))

    if 0 < max_candidates < o:
        # keep only the occupied candidates (nearest-offset-first): in the
        # driving workload a keypoint's 27-voxel neighborhood holds ~9
        # occupied voxels (p99 = 18), so rescoring and row-gathering all 27
        # wastes ~2-3x. Selection prefers occupied, then smaller offset; the
        # p99+ tail loses only its FARTHEST voxels (mild, distance-biased).
        off_d2 = jnp.sum(offsets.astype(queries.dtype) ** 2, axis=-1)  # [O]
        score = jnp.where(ok, 1.0 - off_d2[None, :] * 1e-2, -1.0)
        _, sel = jax.lax.top_k(score, max_candidates)          # [M, C]
        slot_c = jnp.take_along_axis(slot_c, sel, axis=1)
        cnt = jnp.take_along_axis(cnt, sel, axis=1)
        ok = jnp.take_along_axis(ok, sel, axis=1)

    rows = level.points[slot_c]                      # [M, O', P*3]
    return rows, jnp.where(ok, cnt, 0)


def _knn_radius2(d2, ok, radius_arr, k_nearest, bins: int):
    """Per-query squared radius ~ the distance to the k-th nearest candidate.

    TPU-native replacement for the reference's bounded-priority-queue k-NN cap
    (map.h:449-514): instead of a top-k sort over all candidates, count the
    candidates inside ``bins`` nested radii in ONE fused broadcast-compare
    pass over the (already computed) d2 buffer, then pick the smallest radius
    whose count reaches ``k_nearest``. Counts against nested edges are
    cumulative by construction — no histogram scatter (a 3M-element scatter
    lowers to ~30 ms on TPU; this formulation measures at the dispatch floor,
    tools/exp_knn_hist2.py). The returned radius over-includes by at most one
    shell width (radius/bins), so the moment sums see the nearest ~k points —
    restoring the locality (and accuracy) of the reference's
    20-nearest-neighbor normals that a whole-ball estimate loses.

    ``k_nearest`` is a dynamic scalar; <= 0 disables the cap (full radius).
    Returns r_eff2 [M].
    """
    r2 = jnp.maximum(radius_arr * radius_arr, 1e-20)          # [M]
    frac = (jnp.arange(1, bins + 1, dtype=d2.dtype) / bins) ** 2  # [B], d-uniform
    edges2 = r2[:, None] * frac[None, :]                      # [M, B]
    inside = ok[..., None] & (d2[..., None] <= edges2[:, None, None, :])
    cnt = jnp.sum(inside, axis=(1, 2))                        # [M, B] cumulative
    reach = cnt >= jnp.maximum(k_nearest, 1)
    bin_idx = jnp.argmax(reach, axis=-1)
    found = jnp.any(reach, axis=-1) & (k_nearest > 0)
    r_eff2 = jnp.take_along_axis(edges2, bin_idx[:, None], axis=1)[:, 0]
    return jnp.where(found, r_eff2, r2)


def moments_from_planes(rows, cnt_ok, queries, radius, k_nearest=None,
                        knn_bins: int = 32, cached_r_eff2=None,
                        use_fresh=None, return_r_eff2: bool = False):
    """Scoring half: in-radius moments of cached candidate rows vs the
    *current* query positions (pure elementwise — cheap to repeat).

    ``k_nearest`` (dynamic scalar, optional): cap the moment accumulation to
    approximately the k nearest candidates via :func:`_knn_radius2` —
    reference max_number_neighbors semantics (neighborhood_strategy.h:60-85).

    ``cached_r_eff2`` + ``use_fresh`` (traced bool): the histogram radius
    selection is the expensive part of the rescore (a [M, O, P, bins]
    compare+reduce, ~1.9 ms at driving shapes) while its OUTPUT barely
    moves between ICP iterations (pose deltas are mm-cm, the shell
    tolerance is radius/bins). Callers that cache candidate rows across
    iterations (the solver) pass the gather-time radius back in and only
    recompute it when ``use_fresh`` (i.e. on regather iterations) — the
    LM accept/reject guards the reuse.

    Returns (count, sum_rel, sum_outer, closest, closest_dist) and, when
    ``return_r_eff2``, the per-query squared cap radius as a sixth value."""
    m = queries.shape[0]
    p = rows.shape[-1] // 3
    x, y, z = _xyz_planes(rows, p)                   # fused slices of rows
    dx = x - queries[:, None, 0:1]
    dy = y - queries[:, None, 1:2]
    dz = z - queries[:, None, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    radius_arr = radius if jnp.ndim(radius) > 0 else jnp.full((m,), radius)
    in_cap = jnp.arange(p, dtype=jnp.int32)[None, None, :] < cnt_ok[..., None]
    ok = in_cap & (d2 <= (radius_arr ** 2)[:, None, None])
    r_eff2 = radius_arr * radius_arr
    if k_nearest is not None:
        if cached_r_eff2 is not None:
            r_eff2 = jax.lax.cond(
                use_fresh,
                lambda: _knn_radius2(d2, ok, radius_arr, k_nearest,
                                     knn_bins),
                lambda: cached_r_eff2)
        else:
            r_eff2 = _knn_radius2(d2, ok, radius_arr, k_nearest, knn_bins)
        ok = ok & (d2 <= r_eff2[:, None, None])

    w = ok.astype(queries.dtype)
    rx, ry, rz = dx * w, dy * w, dz * w
    count = jnp.sum(ok, axis=(1, 2))
    sum_rel = jnp.stack([rx.sum((1, 2)), ry.sum((1, 2)), rz.sum((1, 2))], -1)
    sum_outer = jnp.stack([
        jnp.stack([(rx * dx).sum((1, 2)), (rx * dy).sum((1, 2)),
                   (rx * dz).sum((1, 2))], -1),
        jnp.stack([(rx * dy).sum((1, 2)), (ry * dy).sum((1, 2)),
                   (ry * dz).sum((1, 2))], -1),
        jnp.stack([(rx * dz).sum((1, 2)), (ry * dz).sum((1, 2)),
                   (rz * dz).sum((1, 2))], -1),
    ], axis=-2)

    d2m = jnp.where(ok, d2, jnp.inf).reshape(m, -1)
    amin = jnp.argmin(d2m, axis=-1)
    cx = jnp.take_along_axis(x.reshape(m, -1), amin[:, None], 1)[:, 0]
    cy = jnp.take_along_axis(y.reshape(m, -1), amin[:, None], 1)[:, 0]
    cz = jnp.take_along_axis(z.reshape(m, -1), amin[:, None], 1)[:, 0]
    closest = jnp.stack([cx, cy, cz], axis=-1)
    cd2 = jnp.take_along_axis(d2m, amin[:, None], 1)[:, 0]
    closest_dist = jnp.where(count > 0, jnp.sqrt(cd2), jnp.inf)
    if return_r_eff2:
        return count, sum_rel, sum_outer, closest, closest_dist, r_eff2
    return count, sum_rel, sum_outer, closest, closest_dist


def _candidate_planes(level: MapLevel, queries, query_valid, radius,
                      resolution, nv, sensor_location, use_normal_filter,
                      threshold_voxel_occupancy):
    """Shared search front-end: gather candidate x/y/z planes + masks.

    Returns (x, y, z [M, O, P], ok [M, O, P], d2 [M, O, P]).
    """
    m = queries.shape[0]
    p = level.max_points
    rows, cnt_ok = gather_candidate_planes(
        level, queries, query_valid, resolution, nv, sensor_location,
        use_normal_filter, threshold_voxel_occupancy)
    x, y, z = _xyz_planes(rows, p)
    dx = x - queries[:, None, 0:1]
    dy = y - queries[:, None, 1:2]
    dz = z - queries[:, None, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    radius_arr = radius if jnp.ndim(radius) > 0 else jnp.full((m,), radius)
    in_cap = jnp.arange(p, dtype=jnp.int32)[None, None, :] < cnt_ok[..., None]
    ok = in_cap & (d2 <= (radius_arr ** 2)[:, None, None])
    return x, y, z, dx, dy, dz, ok, d2


@functools.partial(jax.jit, static_argnames=("nv", "use_normal_filter"))
def ball_search_moments(level: MapLevel, queries, query_valid, radius,
                        resolution, nv: int, sensor_location=None,
                        use_normal_filter: bool = False,
                        threshold_voxel_occupancy=1, k_nearest=None):
    """Neighborhood *moments* of every in-radius candidate around each query.

    The TPU-native replacement for the reference's bounded-priority-queue
    k-NN (map.h:449-514): no per-point selection — the moment sums of the
    whole in-radius ball feed the covariance/normal stage directly
    (ops/neighborhood.description_from_moments), with the closest point as
    the residual anchor.

    Returns (count [M], sum_rel [M,3], sum_outer [M,3,3], closest [M,3],
    closest_dist [M]); sums are relative to the query point.
    """
    x, y, z, dx, dy, dz, ok, d2 = _candidate_planes(
        level, queries, query_valid, radius, resolution, nv, sensor_location,
        use_normal_filter, threshold_voxel_occupancy)
    m = queries.shape[0]
    if k_nearest is not None:
        radius_arr = radius if jnp.ndim(radius) > 0 else jnp.full((m,), radius)
        r_eff2 = _knn_radius2(d2, ok, radius_arr, k_nearest, 32)
        ok = ok & (d2 <= r_eff2[:, None, None])
    w = ok.astype(queries.dtype)
    rx, ry, rz = dx * w, dy * w, dz * w
    count = jnp.sum(ok, axis=(1, 2))
    sum_rel = jnp.stack([rx.sum((1, 2)), ry.sum((1, 2)), rz.sum((1, 2))], -1)
    sum_outer = jnp.stack([
        jnp.stack([(rx * dx).sum((1, 2)), (rx * dy).sum((1, 2)),
                   (rx * dz).sum((1, 2))], -1),
        jnp.stack([(rx * dy).sum((1, 2)), (ry * dy).sum((1, 2)),
                   (ry * dz).sum((1, 2))], -1),
        jnp.stack([(rx * dz).sum((1, 2)), (ry * dz).sum((1, 2)),
                   (rz * dz).sum((1, 2))], -1),
    ], axis=-2)

    d2m = jnp.where(ok, d2, jnp.inf).reshape(m, -1)
    amin = jnp.argmin(d2m, axis=-1)
    cx = jnp.take_along_axis(x.reshape(m, -1), amin[:, None], 1)[:, 0]
    cy = jnp.take_along_axis(y.reshape(m, -1), amin[:, None], 1)[:, 0]
    cz = jnp.take_along_axis(z.reshape(m, -1), amin[:, None], 1)[:, 0]
    closest = jnp.stack([cx, cy, cz], axis=-1)
    cd2 = jnp.take_along_axis(d2m, amin[:, None], 1)[:, 0]
    closest_dist = jnp.where(count > 0, jnp.sqrt(cd2), jnp.inf)
    return count, sum_rel, sum_outer, closest, closest_dist


@functools.partial(jax.jit, static_argnames=("nv", "use_normal_filter"))
def ball_search(level: MapLevel, queries, query_valid, radius, resolution,
                nv: int, sensor_location=None, use_normal_filter: bool = False,
                threshold_voxel_occupancy=1):
    """All candidates within ``radius`` (compat shape: [M, C, 3] + mask).

    Prefer :func:`ball_search_moments` on the hot path — this variant
    materializes the trailing-3 candidate buffer.
    """
    x, y, z, dx, dy, dz, ok, d2 = _candidate_planes(
        level, queries, query_valid, radius, resolution, nv, sensor_location,
        use_normal_filter, threshold_voxel_occupancy)
    m = queries.shape[0]
    cand = jnp.stack([x, y, z], axis=-1).reshape(m, -1, 3)
    mask = ok.reshape(m, -1)
    d2m = jnp.where(ok, d2, jnp.inf).reshape(m, -1)
    amin = jnp.argmin(d2m, axis=-1)
    closest = jnp.take_along_axis(cand, amin[:, None, None], axis=1)[:, 0, :]
    cd2 = jnp.take_along_axis(d2m, amin[:, None], axis=1)[:, 0]
    count = jnp.sum(mask, axis=-1)
    closest_dist = jnp.where(count > 0, jnp.sqrt(cd2), jnp.inf)
    return cand, mask, closest, closest_dist, count


@functools.partial(jax.jit, static_argnames=("nv", "k", "use_normal_filter"))
def radius_search(level: MapLevel, queries, query_valid, radius, resolution,
                  nv: int, k: int, sensor_location=None,
                  use_normal_filter: bool = False,
                  threshold_voxel_occupancy=1):
    """Bounded k-nearest search (reference RadiusSearchInPlace semantics,
    map.h:449-514): the k nearest in-radius candidates, sorted by distance.
    Compat/parity path — the solver's hot loop uses ball_search_moments."""
    x, y, z, dx, dy, dz, ok, d2 = _candidate_planes(
        level, queries, query_valid, radius, resolution, nv, sensor_location,
        use_normal_filter, threshold_voxel_occupancy)
    m = queries.shape[0]
    d2m = jnp.where(ok, d2, jnp.inf).reshape(m, -1)
    neg_top, top_idx = jax.lax.top_k(-d2m, k)
    nd2 = -neg_top
    nmask = jnp.isfinite(nd2)
    gx = jnp.take_along_axis(x.reshape(m, -1), top_idx, 1)
    gy = jnp.take_along_axis(y.reshape(m, -1), top_idx, 1)
    gz = jnp.take_along_axis(z.reshape(m, -1), top_idx, 1)
    npts = jnp.stack([gx, gy, gz], axis=-1)
    nd = jnp.sqrt(jnp.where(nmask, nd2, jnp.inf))
    return npts, nmask, nd
