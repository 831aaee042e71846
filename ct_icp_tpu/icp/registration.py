"""Host-facing registration API — the counterpart of CT_ICP_Registration.

``CTICPRegistration.register`` (reference include/ct_icp/ct_icp.h:174-223,
``Register`` -> DoRegisterCeres/GaussNewton) runs the jitted solver of
icp/solver.py on a device-resident voxel map. One compiled program serves
every robust-escalation level: escalation only changes SolverDynamics scalars.

Timestamps are converted to alpha-parameters in [0, 1] on the host in float64
(reference GetAlphaTimestamp semantics, types.h:192-219) so that device code
never touches raw (possibly huge) timestamps in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ct_icp_tpu.config.options import (CTICPOptions, MultiResolutionVoxelMapOptions,
                                       PoseParametrization, Solver, LeastSquares)
from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.core.pose import Pose, TrajectoryFrame
from ct_icp_tpu.icp import solver as slv
from ct_icp_tpu.mapping import voxel_map as vm


@dataclasses.dataclass
class ICPSummary:
    """Mirror of the reference ICPSummary (ct_icp.h:155-169)."""

    success: bool = False
    num_residuals_used: int = 0
    num_iters: int = 0
    error_log: str = ""
    duration_total: float = 0.0
    duration_init: float = 0.0
    avg_duration_iter: float = 0.0
    avg_duration_neighborhood: float = 0.0
    avg_duration_solve: float = 0.0


def make_prior(previous_frame: Optional[TrajectoryFrame], motion_options,
               origin: np.ndarray) -> np.ndarray:
    """Packed [14] prior vector from the previous trajectory frame
    (reference PreviousFrameMotionModel, motion_model.cpp:12-61):
    [prev_end_quat(4), prev_end_tr(3), prev_velocity(3),
     beta_loc, beta_orient, beta_cv, beta_sv].
    One host->device transfer per solver call (see solver.unpack_prior)."""
    out = np.zeros(14, dtype=np.float32)
    out[0] = 1.0
    if previous_frame is None or motion_options is None:
        return out
    out[0:4] = s3n.quat_normalize(previous_frame.end_pose.quat)
    out[4:7] = previous_frame.end_pose.tr - origin
    out[7:10] = previous_frame.end_pose.tr - previous_frame.begin_pose.tr
    out[10] = motion_options.beta_location_consistency
    out[11] = motion_options.beta_orientation_consistency
    out[12] = motion_options.beta_constant_velocity
    out[13] = motion_options.beta_small_velocity
    return out


import functools


@dataclasses.dataclass
class StagedLoopResult:
    """Result + phase wall times of :func:`staged_register_loop`."""

    quat_begin: np.ndarray = None
    tr_begin: np.ndarray = None
    quat_end: np.ndarray = None
    tr_end: np.ndarray = None
    num_residuals: int = 0
    num_iters: int = 0
    converged: bool = False
    valid_problem: bool = True
    duration_init_ms: float = 0.0
    neighborhood_ms: float = 0.0     # total over iterations
    solve_ms: float = 0.0            # total over iterations


def staged_register_loop(statics, level, raw_dev, alphas_dev, valid_dev,
                         qb, tb, qe, te, prior_dev, dyn_dev,
                         num_iters_icp: int,
                         min_number_neighbors: int) -> StagedLoopResult:
    """Host-driven outer ICP loop over the PRODUCTION iteration body.

    Runs solver.build_staged_fns' phase kernels — jitted pieces of the same
    _loop_pieces body the fused while_loop/unroll program executes — with a
    device sync between the association and optimization phases, so the
    reference ICPSummary durations (ct_icp.h:155-169, filled at
    ct_icp.cpp:664-694) are real per-phase wall times of the production
    semantics. The loop condition mirrors the fused cond
    (it < num_iters_icp and not converged); the body is pure, so this
    reproduces the exact production iteration sequence (candidate-cache
    regathers included).
    """
    import time

    import jax

    out = StagedLoopResult()
    t0 = time.time()
    stage_init, stage_build, stage_solve = slv.build_staged_fns(statics)
    carry, r_max = jax.block_until_ready(
        stage_init(raw_dev, valid_dev, qb, tb, qe, te))
    sensor_location = te  # fused path captures the INITIAL end translation
    out.duration_init_ms = (time.time() - t0) * 1000.0

    max_outer = int(num_iters_icp)
    if statics.unroll_iters > 0:
        max_outer = min(max_outer, statics.unroll_iters)
    it = 0
    while it < max_outer:
        t1 = time.time()
        problem, a_tr, a_q = jax.block_until_ready(stage_build(
            carry, level, raw_dev, alphas_dev, valid_dev, dyn_dev,
            sensor_location, r_max))
        t2 = time.time()
        carry = jax.block_until_ready(stage_solve(
            carry, problem, a_tr, a_q, raw_dev, alphas_dev, dyn_dev,
            prior_dev))
        t3 = time.time()
        out.neighborhood_ms += (t2 - t1) * 1000.0
        out.solve_ms += (t3 - t2) * 1000.0
        it += 1
        if bool(carry[6]):   # converged (includes the not-enough freeze)
            break

    out.quat_begin = s3n.quat_normalize(np.asarray(carry[1], np.float64))
    out.tr_begin = np.asarray(carry[2], np.float64)
    out.quat_end = s3n.quat_normalize(np.asarray(carry[3], np.float64))
    out.tr_end = np.asarray(carry[4], np.float64)
    out.num_iters = int(carry[0])
    out.converged = bool(carry[6])
    out.num_residuals = int(carry[7])
    out.valid_problem = bool(carry[8]) if it > 0 else True
    del min_number_neighbors  # the body already applies the freeze
    return out


class CTICPRegistration:
    """Registers a keypoint batch against the map, optimizing the 12-DoF
    continuous-time frame (begin_pose, end_pose)."""

    def __init__(self, options: CTICPOptions,
                 map_options: MultiResolutionVoxelMapOptions,
                 num_keypoints: int,
                 search_radius: Optional[float] = None,
                 distance_strategy=None):
        self.options = options
        self.map_options = map_options
        self.distance_strategy = distance_strategy
        if distance_strategy is not None:
            # per-point radii up to radius_max: search the level that
            # SearchParamsFromRadiusSearch would pick for radius_max, with
            # per-point radius masking (normal-direction filter enabled, as
            # the reference strategy passes the sensor location)
            radius = distance_strategy.radius_max
        else:
            radius = (search_radius if search_radius is not None
                      else map_options.default_radius)
        level_idx, nv = map_options.search_params(radius)
        self.level_index = level_idx
        self.search_radius = radius
        self.voxel_resolution = map_options.resolutions[level_idx].resolution
        loss = options.loss_function
        if options.solver == Solver.GN:
            loss = LeastSquares.STANDARD  # reference GN path has no robust loss
        self.statics = slv.SolverStatics(
            num_keypoints=num_keypoints,
            max_neighbors=options.max_number_neighbors,
            level_index=level_idx,
            voxel_neighborhood=nv,
            distance=options.distance,
            loss=loss,
            solver=options.solver,
            parametrization=options.parametrization,
            num_closest_neighbors=options.num_closest_neighbors,
            # kc>1 anchors residuals at the i-th nearest neighbor — that
            # needs the sorted neighbor list, so the ball fast path flips
            # off (reference parity mode); build_register_fn raises on any
            # remaining unsupported combination (no silent degrade to 1)
            use_normal_filter=(
                distance_strategy is not None
                and map_options.select_valid_normals_direction),
            use_barycenter=options.use_barycenter,
            use_lines=options.use_lines,
            use_distribution=options.use_distribution,
            use_distance_strategy=distance_strategy is not None,
            ball_neighborhood=(options.ball_neighborhood
                               and options.num_closest_neighbors <= 1),
            knn_moments=options.knn_moments,
            analytic_jacobian=options.analytic_jacobian,
            # candidate compaction: net-negative at 27 candidates (top_k
            # costs more than the smaller rescore saves) but decisive at
            # nv>=2 (125+ candidates, of which only the ~2D surface sheet is
            # occupied — row-gather and rescore shrink ~4x)
            max_candidate_voxels=(
                0 if (2 * nv + 1) ** 3 <= 27 else
                min(48, (2 * nv + 1) ** 3)),
        )
        self._fn = slv.jitted_register_fn(self.statics)
        self._dyn_cache = {}

    def dynamics(self, options: Optional[CTICPOptions] = None) -> np.ndarray:
        """Packed dynamic-scalar vector, cached per options object."""
        opts = options or self.options
        out = self._dyn_cache.get(opts)
        if out is None:
            out = slv.pack_dynamics(opts, self.search_radius,
                                    self.voxel_resolution,
                                    self.distance_strategy)
            self._dyn_cache[opts] = out
        return out

    def register_device(self, map_state: vm.MapState,
                        raw_dev, alphas_dev, valid_dev,
                        frame: TrajectoryFrame,
                        prior: Optional[dict] = None,
                        origin: Optional[np.ndarray] = None,
                        options: Optional[CTICPOptions] = None) -> ICPSummary:
        """Device-array registration (updates ``frame`` in place).

        ``raw_dev`` [K, 3] f32, ``alphas_dev`` [K] f32 (already in [0, 1]),
        ``valid_dev`` [K] bool, all with K == statics.num_keypoints.
        ``origin`` is the world location of the device map frame (float64);
        poses are shifted into the map frame for the f32 solve and back.
        """
        import time
        t0 = time.time()
        origin = np.zeros(3) if origin is None else np.asarray(origin)
        opts = options or self.options

        qb = jnp.asarray(s3n.quat_normalize(frame.begin_pose.quat), jnp.float32)
        tb = jnp.asarray(frame.begin_pose.tr - origin, jnp.float32)
        qe = jnp.asarray(s3n.quat_normalize(frame.end_pose.quat), jnp.float32)
        te = jnp.asarray(frame.end_pose.tr - origin, jnp.float32)

        if prior is None:
            prior = make_prior(None, None, origin)

        result = self._fn(
            map_state.levels[self.level_index],
            raw_dev, alphas_dev, valid_dev,
            qb, tb, qe, te, prior, self.dynamics(opts))

        frame.begin_pose.quat = np.asarray(result.quat_begin, np.float64)
        frame.begin_pose.tr = np.asarray(result.tr_begin, np.float64) + origin
        frame.end_pose.quat = np.asarray(result.quat_end, np.float64)
        frame.end_pose.tr = np.asarray(result.tr_end, np.float64) + origin
        frame.begin_pose.normalize_()
        frame.end_pose.normalize_()

        summary = ICPSummary()
        summary.num_residuals_used = int(result.num_residuals)
        summary.num_iters = int(result.num_iters)
        summary.success = bool(result.valid_problem)
        if not summary.success:
            summary.error_log = (
                f"[CT_ICP] Error : not enough keypoints selected in ct-icp ! "
                f"number_of_residuals : {summary.num_residuals_used}")
        summary.duration_total = (time.time() - t0) * 1000.0
        return summary

    def debug_problem(self, map_state: vm.MapState,
                      raw_kpts: np.ndarray, timestamps: np.ndarray,
                      frame: TrajectoryFrame,
                      origin: Optional[np.ndarray] = None,
                      options: Optional[CTICPOptions] = None) -> dict:
        """Per-point problem arrays at the CURRENT pose — the observability
        the reference gates behind output_weights/output_normals/
        output_residuals (OutputBuilder, reference ct_icp.cpp:1075-1177).

        Returns numpy arrays keyed: world, anchors, normals, lines,
        weights, residuals (point-to-plane values), neighborhood_count
        proxy ``ok`` and classification ``cls`` — for the valid prefix.
        Off the hot path: one extra dispatch, no effect on register()."""
        import jax

        from ct_icp_tpu.icp import residuals as res_mod
        from ct_icp_tpu.icp import solver as slv_mod

        opts = options or self.options
        origin = np.zeros(3) if origin is None else np.asarray(origin)
        k = self.statics.num_keypoints
        n = raw_kpts.shape[0]
        raw = np.zeros((k, 3), np.float32)
        raw[:n] = raw_kpts
        valid = np.zeros((k,), bool)
        valid[:n] = True
        alphas64 = s3n.alpha_timestamp(
            np.asarray(timestamps, np.float64),
            frame.begin_pose.timestamp, frame.end_pose.timestamp)
        alphas = np.ones((k,), np.float32)
        alphas[:n] = alphas64

        qb = jnp.asarray(s3n.quat_normalize(frame.begin_pose.quat), jnp.float32)
        tb = jnp.asarray(frame.begin_pose.tr - origin, jnp.float32)
        qe = jnp.asarray(s3n.quat_normalize(frame.end_pose.quat), jnp.float32)
        te = jnp.asarray(frame.end_pose.tr - origin, jnp.float32)
        dyn = slv_mod.unpack_dynamics(jnp.asarray(self.dynamics(opts)))

        statics = self.statics

        @jax.jit
        def build(level, raw, alphas, valid, qb, tb, qe, te):
            anchors, normals, lines, cov_inv, geom_w, ok, cls, _ = \
                slv_mod._build_problem(statics, dyn, level, raw, alphas,
                                       valid, qb, tb, qe, te, te)
            world = res_mod.interp_world_points(qb, tb, qe, te, raw, alphas)
            r = res_mod.geometric_residuals(
                statics.distance, world, anchors, normals, lines, cov_inv,
                geom_w)
            return world, anchors, normals, lines, geom_w, ok, cls, r

        out = build(map_state.levels[self.level_index], jnp.asarray(raw),
                    jnp.asarray(alphas), jnp.asarray(valid), qb, tb, qe, te)
        # scalar placeholders (e.g. cls outside ROBUST mode) broadcast to [K]
        world, anchors, normals, lines, geom_w, ok, cls, r = (
            np.broadcast_to(np.asarray(x), (k,) + np.shape(x)[1:])
            if np.ndim(x) == 0 else np.asarray(x) for x in out)
        return {
            "world": world[:n] + origin,
            "anchors": anchors[:n] + origin,
            "normals": normals[:n],
            "lines": lines[:n],
            "weights": geom_w[:n],
            "ok": ok[:n],
            "classification": cls[:n],
            "residuals": r[:n],
        }

    def register_profiled(self, map_state: vm.MapState,
                          raw_dev, alphas_dev, valid_dev,
                          frame: TrajectoryFrame,
                          prior: Optional[np.ndarray] = None,
                          origin: Optional[np.ndarray] = None,
                          options: Optional[CTICPOptions] = None
                          ) -> ICPSummary:
        """Phase-timed registration (reference ICPSummary durations,
        ct_icp.h:155-169, filled at ct_icp.cpp:664-694).

        The hot path fuses search + solve into one XLA program, which is the
        point of the TPU design — but it also makes per-phase durations
        unmeasurable there. This variant drives
        :func:`staged_register_loop`: the SAME outer-loop body the fused
        program runs (solver._loop_pieces — single source, the paths cannot
        diverge), jitted as per-phase kernels with a sync point each, so
        ``duration_init``, ``avg_duration_iter``,
        ``avg_duration_neighborhood`` and ``avg_duration_solve`` are real
        wall times (ms) of the production semantics. Each sync costs a
        device round trip: use for observability, not throughput.
        """
        import time

        import jax

        t0 = time.time()
        origin = np.zeros(3) if origin is None else np.asarray(origin)
        opts = options or self.options
        dyn_dev = jnp.asarray(self.dynamics(opts))
        if prior is None:
            prior = make_prior(None, None, origin)
        prior_dev = jnp.asarray(prior)

        qb = jnp.asarray(s3n.quat_normalize(frame.begin_pose.quat), jnp.float32)
        tb = jnp.asarray(frame.begin_pose.tr - origin, jnp.float32)
        qe = jnp.asarray(s3n.quat_normalize(frame.end_pose.quat), jnp.float32)
        te = jnp.asarray(frame.end_pose.tr - origin, jnp.float32)
        level = map_state.levels[self.level_index]
        jax.block_until_ready((raw_dev, alphas_dev, valid_dev))

        r = staged_register_loop(
            self.statics, level, raw_dev, alphas_dev, valid_dev,
            qb, tb, qe, te, prior_dev, dyn_dev,
            num_iters_icp=int(opts.num_iters_icp),
            min_number_neighbors=int(opts.min_number_neighbors))

        frame.begin_pose.quat = r.quat_begin
        frame.begin_pose.tr = r.tr_begin + origin
        frame.end_pose.quat = r.quat_end
        frame.end_pose.tr = r.tr_end + origin
        frame.begin_pose.normalize_()
        frame.end_pose.normalize_()

        summary = ICPSummary()
        summary.duration_init = r.duration_init_ms
        summary.num_iters = r.num_iters
        summary.num_residuals_used = r.num_residuals
        summary.success = r.valid_problem
        if not summary.success:
            summary.error_log = (
                f"[CT_ICP] Error : not enough keypoints selected in ct-icp ! "
                f"number_of_residuals : {r.num_residuals}")
        k = max(r.num_iters, 1)
        summary.avg_duration_neighborhood = r.neighborhood_ms / k
        summary.avg_duration_solve = r.solve_ms / k
        summary.avg_duration_iter = (r.neighborhood_ms + r.solve_ms) / k
        summary.duration_total = (time.time() - t0) * 1000.0
        return summary

    def register(self, map_state: vm.MapState,
                 raw_kpts: np.ndarray, timestamps: np.ndarray,
                 frame: TrajectoryFrame,
                 prior: Optional[dict] = None,
                 origin: Optional[np.ndarray] = None,
                 options: Optional[CTICPOptions] = None) -> ICPSummary:
        """Numpy-in / numpy-out registration (updates ``frame`` in place)."""
        opts = options or self.options
        k = self.statics.num_keypoints
        n = raw_kpts.shape[0]
        if n > k:
            raise ValueError(f"{n} keypoints > static capacity {k}")
        raw = np.zeros((k, 3), np.float32)
        raw[:n] = raw_kpts
        valid = np.zeros((k,), bool)
        valid[:n] = True

        # host-side alpha-timestamps (float64), reference types.h:192-219
        alphas64 = s3n.alpha_timestamp(
            np.asarray(timestamps, np.float64),
            frame.begin_pose.timestamp, frame.end_pose.timestamp)
        if opts.parametrization == PoseParametrization.SIMPLE:
            alphas64 = np.ones_like(alphas64)
        alphas = np.ones((k,), np.float32)
        alphas[:n] = alphas64

        return self.register_device(
            map_state, jnp.asarray(raw), jnp.asarray(alphas),
            jnp.asarray(valid), frame, prior=prior, origin=origin,
            options=opts)
