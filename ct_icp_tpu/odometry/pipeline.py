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
from ct_icp_tpu.icp import solver as _slv
from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops import sampling
from ct_icp_tpu.ops import voxel as vx

# index of max_num_residuals in the packed solver-dynamics vector (used by
# the pre-gather keypoint decimation in _make_frame_core)
_MNR_INDEX = _slv.SolverDynamics._fields.index("max_num_residuals")


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
                     max_dirty: int, prune: bool, with_normals: bool = True):
    new_levels = []
    inserted = jnp.int32(0)
    for i, level in enumerate(map_state.levels):
        if prune:
            level = vm.prune_level(level, location, max_distance)
        lvl, n = vm.insert_points(
            level, world, valid & do_insert, resolutions[i], min_dists[i],
            begin_tr, max_dirty, with_normals=with_normals)
        inserted = inserted + n
        new_levels.append(lvl)
    return vm.MapState(levels=tuple(new_levels)), inserted


@functools.lru_cache(maxsize=16)
def make_update_map_fn(map_options, max_dirty: int, with_normals: bool = True):
    """Build the donated-map update step for a given map configuration."""
    resolutions = tuple(r.resolution for r in map_options.resolutions)
    min_dists = tuple(r.min_distance_between_points for r in map_options.resolutions)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("prune",))
    def update_map(map_state, world, valid, begin_tr, location, max_distance,
                   do_insert, prune=True):
        return _update_map_impl(map_state, world, valid, begin_tr, location,
                                max_distance, do_insert, resolutions,
                                min_dists, max_dirty, prune, with_normals)

    return update_map


# --- quantized scan wire format -------------------------------------------
# The scan upload dominates streaming wall time on bandwidth-limited links
# (a remote-TPU tunnel moves ~45 MB/s; a 131k x 16 B f32 scan is ~2 MB per
# frame). Points ride as int16 at 1/128 m (7.8 mm — below LiDAR sensor
# noise), alphas as u16; 8 B/point, packed in one array, padded only to the
# smallest ladder rung that holds the scan.
SCAN_QUANT = 128.0  # 1/128 m per LSB, +-255.99 m range
SCAN_RUNG_MIN = 32768


def pack_scan_u16(xyz, alphas, n: int, rung: int):
    """Host-side wire packing: [n,3] points + [n] alphas -> u16[rung, 4]."""
    import numpy as np
    out = np.zeros((rung, 4), np.uint16)
    q = np.clip(np.rint(np.asarray(xyz[:n]) * SCAN_QUANT),
                -32767, 32767).astype(np.int16)
    out[:n, :3] = q.view(np.uint16)
    out[:n, 3] = np.clip(np.rint(np.asarray(alphas[:n]) * 65535.0),
                         0, 65535).astype(np.uint16)
    return out


def unpack_scan(packed):
    """Device-side unpack of pack_scan_u16 (inside jit)."""
    xyz = jax.lax.bitcast_convert_type(
        packed[:, 0:3], jnp.int16).astype(jnp.float32) / SCAN_QUANT
    alphas = packed[:, 3].astype(jnp.float32) / 65535.0
    return xyz, alphas


def scan_rung(cap: int, n: int) -> int:
    """Smallest upload rung (pow-4 ladder from SCAN_RUNG_MIN) holding n."""
    for r in _rungs(cap, SCAN_RUNG_MIN):
        if n <= r:
            return r
    return cap


def _ladder(count, rungs, fn):
    """Run ``fn(size)`` for the smallest rung >= ``count`` (``rungs``
    ascending; the last rung must cover the full capacity).

    Capacity laddering: scatter/gather stages cost ~per padded row on TPU
    (the scalar core processes masked rows too), so running each stage on the
    smallest power-of-two prefix that holds the live count cuts its cost by
    the padding factor. Valid because every stage input is packed (live
    entries first). All branches produce identical shapes; XLA executes only
    the taken branch at runtime.
    """
    def build(i):
        if i == len(rungs) - 1:
            return lambda: fn(rungs[i])
        return lambda: jax.lax.cond(count <= rungs[i],
                                    lambda: fn(rungs[i]), build(i + 1))
    return build(0)()


def _rungs(cap: int, smallest: int):
    out = []
    r = smallest
    while r < cap:
        out.append(r)
        r *= 2
    out.append(cap)
    return out


def kp_ladder_rungs(kp_capacity: int):
    """Keypoint capacity ladder shared by the fused frame core and the
    profiled replay (which must time the solver at the SAME rung the
    production step ran). The 3/8-capacity rung: the pre-gather
    residual-cap decimation tops out at 1.5x max_num_residuals (1350 at the
    driving cap of 900), which must land UNDER a rung for the solver to
    shrink with it — 3/8 * 4096 = 1536 catches it (half-capacity 2048 does
    not)."""
    return sorted({max((3 * kp_capacity // 8) // 128 * 128, 128),
                   max(kp_capacity // 2, 1024), kp_capacity})


def _make_frame_core(map_options, statics, sub_capacity: int, max_dirty: int,
                     distort_constant_velocity: bool,
                     host_prededuped: bool = False, ablate: str = ""):
    """Traceable body of one odometry frame (shared by the fused and the
    streaming step): subsample -> keypoint grid sampling -> CT registration
    -> world transform -> assessment -> insertion decision -> prune+insert.

    Every stage is capacity-laddered (see :func:`_ladder`): the scan prefix
    feeds subsampling, the subsample prefix feeds keypoint sampling and map
    insertion, and the keypoint prefix feeds the solver (which carries the
    gather-bound candidate planes) — so a frame pays for the points it has,
    not for the static worst-case shapes.

    frame_scalars layout (f32[17], fs[15] = insert election rounds, fs[16] = keypoint-prefix count or 0):
      0 voxel_size          1 sample_voxel_size    2 max_distance
      3 do_register(0/1)    4 force_insert(-1/0/1/2: -1 none, 0 heuristic,
                              1 force, 2 robust-gated — insert only when the
                              on-device robust assessment passes)
      5 insertion_ego_rotation_threshold   6 skipped_frames
      7 insertion_threshold_frames_skipped 8 distance_error_threshold
      9 orientation_error_threshold       10 do_prune(0/1)
     11 robust_threshold_relative_orientation (deg)
     12 robust_threshold_ego_orientation (deg)
     13 robust_relative_trans_threshold
     14 robust rotation-check applicability (0/1: 1 only at robust_level 0
        with robust_num_attempts_when_rotation > 0)
    Entries 11-14 replicate the robust branch of AssessRegistration
    (reference odometry.cpp:604-684) on device so a robust attempt can
    insert in the SAME dispatch when it passes — the common case — instead
    of paying a second dispatch+readback round trip. Non-robust callers pass
    +inf/0 there (no behavior change).
    ``ablate`` (MEASUREMENT ONLY — tools/ablate_megastep.py): comma-set of
    stages to statically remove so their in-situ cost can be measured as a
    dispatch-time delta against the production program. Never set on any
    production path. Tokens: "no_solver" (registration passthrough),
    "no_insert" (map returned untouched, prune skipped).

    In the streaming step entries 3/4/6 are overridden from device state.
    Entry 10 amortizes the map prune sweep over a host-chosen cadence (the
    reference prunes every frame; at 100 m thresholds a few frames of lag
    is free and the sweep costs ~1.5 ms). The prune itself is gated by the
    on-device assessment: a wild intermediate pose estimate must not evict
    valid map points around a wrong location.

    packed result layout (f32[24]):
      0:4 quat_begin  4:7 tr_begin  7:11 quat_end  11:14 tr_end
      14 num_residuals 15 num_iters 16 converged 17 valid_problem
      18 sub_count 19 kp_count 20 inserted 21 points_added 22 assess_ok
      23 rot_within (orientation within the robust thresholds; the robust
         streaming path uses assess_ok & rot_within as its "steady" signal —
         both must hold for the next frame to legitimately run at robust
         level 0, reference odometry.cpp:890-901)
    """
    import dataclasses as _dc

    import jax.numpy as jnp
    from ct_icp_tpu.core import se3 as s3
    from ct_icp_tpu.icp import solver as slv
    from ct_icp_tpu.ops import sampling as smp

    resolutions = tuple(r.resolution for r in map_options.resolutions)
    min_dists = tuple(r.min_distance_between_points for r in map_options.resolutions)
    kp_capacity = statics.num_keypoints
    kp_rungs = kp_ladder_rungs(kp_capacity)
    abl = frozenset(t for t in ablate.split(",") if t)
    registers = {sz: slv.build_register_fn(
        _dc.replace(statics, num_keypoints=sz)) for sz in kp_rungs}

    def core(map_state, raw, alphas, n_points, qb0, tb0, qe0, te0, prior,
             dyn_packed, fs, do_register, force_insert, skipped_frames):
        n = raw.shape[0]
        valid = jnp.arange(n, dtype=jnp.int32) < n_points

        if host_prededuped:
            # the host already voxel-deduped the scan at fs[0]'s grid ON
            # THE WIRE-QUANTIZED coords (odometry.prepare_frame /
            # _prepare_device_scan), so the device election here would be
            # an exact no-op (same truncation rule, same first-in-scan
            # winner) — truncating the packed prefix replaces the whole
            # scatter-min subsample stage (the scan-rung election was the
            # third-largest stage of the frame)
            sub_raw = raw[:sub_capacity]
            sub_alphas = alphas[:sub_capacity]
            sub_valid = valid[:sub_capacity]
            sub_cnt = jnp.minimum(n_points, jnp.int32(sub_capacity))
        else:
            def do_preprocess(sz):
                idx, ok, cnt = smp.voxel_subsample_indices(
                    raw[:sz], valid[:sz], fs[0], sub_capacity)
                return raw[idx], alphas[idx], ok, cnt

            sub_raw, sub_alphas, sub_valid, sub_cnt = _ladder(
                n_points, _rungs(n, 32768), do_preprocess)
        if distort_constant_velocity:
            sub_raw = distort_raw(sub_raw, sub_alphas, qb0, tb0, qe0, te0)

        sub_rungs = _rungs(sub_capacity, 16384)

        def do_sample(sz):
            idx, ok, cnt = smp.voxel_subsample_indices(
                sub_raw[:sz], sub_valid[:sz], fs[1], kp_capacity)
            return sub_raw[idx], sub_alphas[idx], ok, cnt

        if host_prededuped:
            # KEYPOINT PREFIX (fs[16] > 0): prepare_frame stable-partitioned
            # the deduped scan so the fs[1]-grid winners are the first
            # fs[16] rows — the election result as a static slice. fs[16]
            # is 0 when the frame's sample voxel size differs from the
            # partition's (robust escalation shrinks it per attempt), and
            # the full election runs instead.
            def kp_prefix():
                kc = jnp.minimum(fs[16].astype(jnp.int32),
                                 jnp.int32(kp_capacity))
                kv = jnp.arange(kp_capacity, dtype=jnp.int32) < kc
                return (sub_raw[:kp_capacity], sub_alphas[:kp_capacity],
                        kv, kc)

            kp_raw, kp_alphas, kp_valid, kp_cnt = jax.lax.cond(
                fs[16] > 0, kp_prefix,
                lambda: _ladder(sub_cnt, sub_rungs, do_sample))
        else:
            kp_raw, kp_alphas, kp_valid, kp_cnt = _ladder(
                sub_cnt, sub_rungs, do_sample)

        # ---- pre-gather residual-cap decimation. The solver keeps at most
        # max_num_residuals rows by uniform-stride decimation over the valid
        # keypoints (reference ICPOptimizationBuilder cap, ct_icp.cpp:148-456
        # — a random subsample there); points the cap would discard anyway
        # still pay the candidate gather, the biggest row-bound stage of the
        # frame. Applying the SAME uniform-stride selection here, to 1.5x the
        # cap (headroom for points that fail min_number_neighbors), lets the
        # solver ladder run at half the keypoint rung. Pure reordering of an
        # existing cap — disabled when the cap is (<= 0 = off).
        # Caveat (sparse/degraded scenes): the reference caps over
        # POST-gather valid points; with 1.5x headroom, if more than ~1/3
        # of the pre-selected keypoints later fail the
        # min_number_neighbors/outlier gates, the solver sees fewer than
        # max_num_residuals rows where the reference would have back-filled
        # from the discarded pool. A/B on the bench scene: no measurable
        # APE change (dense scans); revisit the 1.5x factor if a sparse
        # dataset regresses.
        mnr = dyn_packed[_MNR_INDEX].astype(jnp.int32)
        target = jnp.where(mnr > 0, jnp.maximum((3 * mnr) // 2, 256),
                           jnp.int32(1 << 30))
        live = jnp.maximum(kp_cnt, 1)
        t_eff = jnp.minimum(target, live)
        pos = jnp.arange(kp_raw.shape[0], dtype=jnp.int32)
        sel = (pos * t_eff) // live != ((pos - 1) * t_eff) // live
        keep = kp_valid & jnp.where(kp_cnt > target, sel, True)
        didx, dcnt, dvalid = vx.compact_mask(keep, kp_raw.shape[0])
        kp_raw, kp_alphas = kp_raw[didx], kp_alphas[didx]
        kp_valid, kp_cnt = dvalid, dcnt

        # do_register==0 (frame 0): zero solver iterations, poses pass through
        dyn_eff = jnp.where(
            jnp.arange(dyn_packed.shape[0]) == 0,
            jnp.where(do_register > 0, dyn_packed[0], 0.0), dyn_packed)

        def run_register(sz):
            return registers[sz](map_state.levels[statics.level_index],
                                 kp_raw[:sz], kp_alphas[:sz], kp_valid[:sz],
                                 qb0, tb0, qe0, te0, prior, dyn_eff)

        if "no_solver" in abl:   # measurement-only (see docstring)
            result = slv.RegistrationResult(
                quat_begin=qb0, tr_begin=tb0, quat_end=qe0, tr_end=te0,
                num_residuals=kp_cnt, num_iters=jnp.int32(0),
                converged=jnp.asarray(True),
                final_cost=jnp.float32(0.0),
                valid_problem=jnp.asarray(True))
        else:
            result = _ladder(kp_cnt, kp_rungs, run_register)
        qb, tb = result.quat_begin, result.tr_begin
        qe, te = result.quat_end, result.tr_end

        world = transform_points(sub_raw, sub_alphas, qb, tb, qe, te)

        # ---- assessment (reference AssessRegistration, odometry.cpp:604-684)
        rel_dist = jnp.linalg.norm(te - tb)
        ego_or = s3.angular_distance_deg(qb, qe)
        rel_or = s3.angular_distance_deg(prior[0:4], qe)
        rot_within = (rel_or <= fs[11]) & (ego_or <= fs[12])
        robust_ok = ((fs[14] <= 0) | rot_within) & (rel_dist <= fs[13])
        assess_ok = ((rel_dist <= fs[8]) & (rel_or <= fs[9]) & (ego_or <= fs[9])
                     & robust_ok
                     & result.valid_problem) | (do_register <= 0)

        # ---- insertion decision (reference UpdateMap, odometry.cpp:918-933;
        # robust-gated mode replicates the robust add_points logic of
        # odometry.cpp:874-901 minus the consecutive-failure override, which
        # only applies after attempt exhaustion and stays on the host path)
        heuristic_add = jnp.where(
            ego_or > fs[5], skipped_frames > fs[7], True)
        add = jnp.where(force_insert < 0, False,
                        jnp.where(force_insert > 1.5, rot_within,
                                  jnp.where(force_insert > 0, True,
                                            heuristic_add)))
        add = add & assess_ok

        location = te

        def do_insert(sz):
            new_levels = []
            inserted = jnp.int32(0)
            w, v = world[:sz], (sub_valid & add)[:sz]
            for i, level in enumerate(map_state.levels):
                level = jax.lax.cond(
                    (fs[10] > 0) & assess_ok,
                    lambda lvl=level: vm.prune_level(lvl, location, fs[2]),
                    lambda lvl=level: lvl)
                # per-voxel normals are maintained on insert only when the
                # solver reads them (visibility filter); exports recompute
                # on demand (vm.recompute_level_normals)
                # fs[15]: election-round budget (= points/voxel this
                # frame may add). TRACED so the init phase can run a higher
                # budget: the reference has no such cap, and bootstrap maps
                # on open scenes starve below min_number_neighbors at the
                # steady-state budget (frame 1 fails outright; the election
                # early-exit makes the higher bound free once warm)
                lvl, cnt = vm.insert_points(
                    level, w, v, resolutions[i], min_dists[i], tb, max_dirty,
                    with_normals=statics.use_normal_filter,
                    max_rounds=fs[15].astype(jnp.int32),
                    ablate=",".join(sorted(
                        t for t in abl if t.startswith("ins_"))))
                inserted = inserted + cnt
                new_levels.append(lvl)
            return tuple(new_levels), inserted

        if "no_insert" in abl:   # measurement-only (see docstring)
            new_levels, inserted = tuple(map_state.levels), jnp.int32(0)
        elif "insert_full_rung" in abl:   # measurement only: no outer cond
            new_levels, inserted = do_insert(sub_rungs[-1])
        else:
            new_levels, inserted = _ladder(sub_cnt, sub_rungs, do_insert)

        f32 = lambda v: jnp.asarray(v, jnp.float32).reshape(-1)
        packed = jnp.concatenate([
            qb, tb, qe, te,
            f32(result.num_residuals), f32(result.num_iters),
            f32(result.converged), f32(result.valid_problem),
            f32(sub_cnt), f32(kp_cnt), f32(inserted), f32(add),
            f32(assess_ok), f32(rot_within)])
        # keypoint/world arrays stay on device (free unless a consumer — the
        # CT-BA backend, or the robust path's deferred insertion — reads them)
        return (new_levels, packed,
                (kp_raw, kp_alphas, kp_valid), (world, sub_valid), add)

    return core


@functools.lru_cache(maxsize=16)
def make_frame_step_fn(map_options, statics, sub_capacity: int,
                       max_dirty: int, distort_constant_velocity: bool,
                       host_prededuped: bool = False):
    """One fused XLA program for a whole odometry frame (non-robust path).

    Single dispatch with the map donated: the host exchanges only the scan
    upload, three packed vectors in, and one packed result vector out — the
    design target for a device behind a high-latency link. See
    :func:`_make_frame_core` for the body and scalar layouts.
    """
    core = _make_frame_core(map_options, statics, sub_capacity, max_dirty,
                            distort_constant_velocity, host_prededuped)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def frame_step(map_state, scan_packed, n_points, pose_init, prior,
                   dyn_packed, frame_scalars):
        raw, alphas = unpack_scan(scan_packed)
        fs = frame_scalars
        new_levels, packed, kp, world, _ = core(
            map_state, raw, alphas, n_points,
            pose_init[0:4], pose_init[4:7], pose_init[7:11], pose_init[11:14],
            prior, dyn_packed, fs, fs[3], fs[4], fs[6])
        return vm.MapState(levels=tuple(new_levels)), packed, kp, world

    return frame_step


# odo_state layout for the streaming step (f32[32]):
#   0:4  prev_begin_quat    4:7  prev_begin_tr
#   7:11 prev_end_quat     11:14 prev_end_tr
#  14:18 prev2_begin_quat  18:21 prev2_begin_tr
#  21:25 prev2_end_quat    25:28 prev2_end_tr
#  28 registered_fid  29 skipped_frames  30 total_insertions  31 unused
ODO_STATE_SIZE = 32


def init_odo_state():
    import numpy as np
    s = np.zeros(ODO_STATE_SIZE, np.float32)
    s[0] = s[7] = s[14] = s[21] = 1.0  # identity quaternions
    return s


def _make_stream_body(map_options, statics, sub_capacity: int,
                      max_dirty: int, distort_constant_velocity: bool,
                      const_velocity: bool, continuous: bool,
                      always_insert: bool, do_no_insert: bool,
                      robust_gated: bool = False,
                      host_prededuped: bool = False, ablate: str = ""):
    """Traceable per-frame streaming body shared by the single-frame step and
    the multi-frame megastep:
      (map_state, odo_state, scan_packed, n, betas, dyn, fs)
        -> (map_state, odo_state, packed, kp, world).

    ``robust_gated``: insertion mode 2 (insert+prune only when the on-device
    robust assessment passes) for every frame after the first inserted one —
    the speculative robust streaming path (see Odometry robust streaming)."""
    import jax.numpy as jnp
    from ct_icp_tpu.core import se3 as s3

    core = _make_frame_core(map_options, statics, sub_capacity, max_dirty,
                            distort_constant_velocity, host_prededuped,
                            ablate=ablate)

    def stream_body(map_state, odo_state, scan_packed, n_points, prior_betas,
                    dyn_packed, frame_scalars):
        raw, alphas = unpack_scan(scan_packed)
        s = odo_state
        pb_q, pb_t = s[0:4], s[4:7]
        pe_q, pe_t = s[7:11], s[11:14]
        p2b_q, p2b_t = s[14:18], s[18:21]
        p2e_q, p2e_t = s[21:25], s[25:28]
        k = s[28]
        skipped = s[29]
        total_ins = s[30]

        # ---- motion initialization (reference InitializeMotion,
        # odometry.cpp:276-330) from device state
        ident_q = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
        ident_t = jnp.zeros(3, jnp.float32)
        # end-pose extrapolation: prev_end * (prev2_end^-1 * prev_end)
        rel_q, rel_t = s3.se3_compose(*s3.se3_inverse(p2e_q, p2e_t),
                                      pe_q, pe_t)
        ext_q, ext_t = s3.se3_compose(pe_q, pe_t, rel_q, rel_t)
        if const_velocity:
            if continuous:
                # begin extrapolated from the begin poses (k >= 3)
                rb_q, rb_t = s3.se3_compose(*s3.se3_inverse(p2b_q, p2b_t),
                                            pb_q, pb_t)
                b3_q, b3_t = s3.se3_compose(pb_q, pb_t, rb_q, rb_t)
            else:
                b3_q, b3_t = pe_q, pe_t
            # k == 2 uses begin = prev_end for both parametrizations
            qb0 = jnp.where(k <= 1.5, ident_q,
                            jnp.where(k <= 2.5, pe_q, b3_q))
            tb0 = jnp.where(k <= 1.5, ident_t,
                            jnp.where(k <= 2.5, pe_t, b3_t))
            qe0 = jnp.where(k <= 1.5, ident_q, ext_q)
            te0 = jnp.where(k <= 1.5, ident_t, ext_t)
        else:
            qb0 = jnp.where(k <= 1.5, ident_q, pe_q)
            tb0 = jnp.where(k <= 1.5, ident_t, pe_t)
            qe0, te0 = qb0, tb0
        qb0 = s3.quat_normalize(qb0)
        qe0 = s3.quat_normalize(qe0)

        # ---- motion-model prior (registration.make_prior layout)
        prior = jnp.concatenate([pe_q, pe_t, pe_t - pb_t, prior_betas])

        do_register = (k > 0.5).astype(jnp.float32)
        if do_no_insert:
            force_insert = jnp.float32(-1.0)
        elif always_insert:
            force_insert = jnp.float32(1.0)
        elif robust_gated:
            force_insert = jnp.where(total_ins < 0.5, 1.0, 2.0)
        else:
            force_insert = jnp.where(total_ins < 0.5, 1.0, 0.0)

        new_levels, packed, kp, world, add = core(
            map_state, raw, alphas, n_points, qb0, tb0, qe0, te0,
            prior, dyn_packed, frame_scalars, do_register, force_insert,
            skipped)

        # ---- tracker + state update
        new_skipped = jnp.where(add, 0.0, skipped + 1.0)
        new_total = total_ins + add.astype(jnp.float32)
        new_state = jnp.concatenate([
            packed[0:14],                  # optimized poses -> prev
            pb_q, pb_t, pe_q, pe_t,        # old prev -> prev2
            jnp.stack([k + 1.0, new_skipped, new_total,
                       jnp.float32(0.0)]),
        ])
        return (vm.MapState(levels=tuple(new_levels)), new_state, packed,
                kp, world)

    return stream_body


@functools.lru_cache(maxsize=16)
def make_streaming_step_fn(map_options, statics, sub_capacity: int,
                           max_dirty: int, distort_constant_velocity: bool,
                           const_velocity: bool, continuous: bool,
                           always_insert: bool, do_no_insert: bool,
                           robust_gated: bool = False,
                           host_prededuped: bool = False):
    """Device-resident odometry step: motion initialization, motion-model
    prior and the insertion tracker live in device state (``odo_state``), so
    dispatching frame k needs NOTHING from frame k-1's results on the host.

    The host loop can therefore enqueue frame k while reading frame k-1's
    packed result — the per-frame host/dispatch sync overhead (which is
    comparable to the device compute itself) disappears, and throughput
    approaches pure device time. Returns
      (map_state, odo_state, packed, kp, world).
    Poses in odo_state/packed are in the map frame; the host tracks the
    float64 origin per dispatch (see odometry.Odometry.stream_frames).
    """
    body = _make_stream_body(map_options, statics, sub_capacity, max_dirty,
                             distort_constant_velocity, const_velocity,
                             continuous, always_insert, do_no_insert,
                             robust_gated, host_prededuped)
    return functools.partial(jax.jit, donate_argnums=(0, 1))(body)


@functools.lru_cache(maxsize=16)
def make_multi_step_fn(map_options, statics, sub_capacity: int,
                       max_dirty: int, distort_constant_velocity: bool,
                       const_velocity: bool, continuous: bool,
                       always_insert: bool, do_no_insert: bool, batch: int,
                       robust_gated: bool = False,
                       with_checkpoint: bool = False,
                       host_prededuped: bool = False, ablate: str = ""):
    """K frames of streaming odometry in ONE dispatch (lax.scan over the
    batch): one upload of K packed scans, one readback of K packed results —
    the per-frame dispatch tax and readback round-trip amortize K-fold
    (each measured ~1 ms against a remote device; K=8 reclaims ~2 ms/frame).
    Keypoint/world outputs are not exposed: the CT-BA backend reconstructs
    the keypoint prefix on host (odometry._host_keypoints); use batch=1
    only when a consumer needs the corrected_points device arrays.

    Signature: (map_state, odo_state, scans [K,R,4] u16, ns [K] i32,
    betas [4], dyns [K,D], fss [K,F]) -> (map_state, odo_state, packed [K,24]).

    ``with_checkpoint``: also return a device-side snapshot of the INPUT
    (map_state, odo_state) taken before any frame runs — the speculative
    robust streamer's rollback point. Snapshotting inside the program costs
    one on-device copy (~ms); a separate copy dispatch pays tunnel round
    trips per buffer (measured ~150 ms/batch against a remote device).
    """
    body = _make_stream_body(map_options, statics, sub_capacity, max_dirty,
                             distort_constant_velocity, const_velocity,
                             continuous, always_insert, do_no_insert,
                             robust_gated, host_prededuped, ablate=ablate)
    # "no_carry" (measurement only, tools/ablate_megastep.py; requires
    # "no_insert"): the map rides as a scan-INVARIANT closure instead of
    # through the lax.scan carry — isolates the cost of threading ~10^8 B
    # of map state through the scan from the cost of the stages themselves
    no_carry = "no_carry" in frozenset(ablate.split(","))
    if no_carry:
        assert "no_insert" in frozenset(ablate.split(",")), \
            "no_carry requires no_insert (an un-carried map cannot mutate)"

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def multi_step(map_state, odo_state, scans, ns, prior_betas, dyns, fss):
        if with_checkpoint:
            ckpt = jax.tree_util.tree_map(lambda x: x + 0,
                                          (map_state, odo_state))

        def scan_body(carry, inputs):
            if no_carry:
                os_ = carry
                scan_packed, n, dyn, fs = inputs
                _ms, os_, packed, _kp, _world = body(
                    map_state, os_, scan_packed, n, prior_betas, dyn, fs)
                return os_, packed
            ms, os_ = carry
            scan_packed, n, dyn, fs = inputs
            ms, os_, packed, _kp, _world = body(
                ms, os_, scan_packed, n, prior_betas, dyn, fs)
            return (ms, os_), packed

        if no_carry:
            os_, packed_all = jax.lax.scan(
                scan_body, odo_state, (scans, ns, dyns, fss))
            ms = map_state
        else:
            (ms, os_), packed_all = jax.lax.scan(
                scan_body, (map_state, odo_state), (scans, ns, dyns, fss))
        if with_checkpoint:
            return ms, os_, packed_all, ckpt
        return ms, os_, packed_all

    return multi_step


@functools.lru_cache(maxsize=1)
def make_device_copy_fn():
    """Jitted deep copy of a pytree ON DEVICE. jax.Array.copy() routes the
    bytes through the host — catastrophic over a remote-device tunnel
    (~250 MB of map state); x+0 compiles to a device-local copy."""
    return jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))


@functools.lru_cache(maxsize=16)
def make_rebase_fn(map_options):
    resolutions = tuple(r.resolution for r in map_options.resolutions)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rebase(map_state, shift):
        return vm.MapState(levels=tuple(
            vm.rebuild_level(lvl, shift, resolutions[i])
            for i, lvl in enumerate(map_state.levels)))

    return rebase


@functools.lru_cache(maxsize=16)
def make_stream_rebase_fn(map_options):
    """Rebase for the streaming path: shifts the map AND the pose
    translations carried in odo_state."""
    resolutions = tuple(r.resolution for r in map_options.resolutions)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rebase(map_state, odo_state, shift):
        new_map = vm.MapState(levels=tuple(
            vm.rebuild_level(lvl, shift, resolutions[i])
            for i, lvl in enumerate(map_state.levels)))
        tr_mask = jnp.zeros((ODO_STATE_SIZE, 3), jnp.float32)
        for base in (4, 11, 18, 25):
            tr_mask = tr_mask.at[base:base + 3].set(jnp.eye(3))
        new_state = odo_state - tr_mask @ shift
        return new_map, new_state

    return rebase
