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


@functools.lru_cache(maxsize=16)
def _profiled_phase_fns(statics):
    """Jitted (neighborhood+descriptor, LM solve) phase kernels for the
    profiled registration path — the same _build_problem/_lm_inner_loop the
    fused solver uses, dispatched separately so each phase has a sync point."""
    import jax

    @jax.jit
    def build(level, raw, alphas, valid, qb, tb, qe, te, dyn_packed):
        dyn = slv.unpack_dynamics(dyn_packed)
        anchors, normals, lines, cov_inv, geom_w, ok, cls, _ = \
            slv._build_problem(statics, dyn, level, raw, alphas, valid,
                               qb, tb, qe, te, te)
        return anchors, normals, lines, cov_inv, geom_w, ok, cls

    @jax.jit
    def solve(raw, alphas, anchors, normals, lines, cov_inv, geom_w, ok, cls,
              qb, tb, qe, te, prior_packed, dyn_packed):
        dyn = slv.unpack_dynamics(dyn_packed)
        prior = slv.unpack_prior(prior_packed)
        return slv._lm_inner_loop(statics, dyn, raw, alphas, anchors, normals,
                                  lines, cov_inv, geom_w, ok, cls,
                                  qb, tb, qe, te, prior)

    return build, solve


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
        unmeasurable there. This variant drives the SAME jitted phase
        kernels (_build_problem / _lm_inner_loop) from a host loop with a
        sync point per phase, so ``duration_init``, ``avg_duration_iter``,
        ``avg_duration_neighborhood`` and ``avg_duration_solve`` are real
        wall times (ms). Each sync costs a device round trip: use for
        observability, not throughput.
        """
        import time

        import jax

        t0 = time.time()
        origin = np.zeros(3) if origin is None else np.asarray(origin)
        opts = options or self.options
        dyn_packed = jnp.asarray(self.dynamics(opts))
        if prior is None:
            prior = make_prior(None, None, origin)
        prior_dev = jnp.asarray(prior)

        qb = jnp.asarray(s3n.quat_normalize(frame.begin_pose.quat), jnp.float32)
        tb = jnp.asarray(frame.begin_pose.tr - origin, jnp.float32)
        qe = jnp.asarray(s3n.quat_normalize(frame.end_pose.quat), jnp.float32)
        te = jnp.asarray(frame.end_pose.tr - origin, jnp.float32)
        level = map_state.levels[self.level_index]
        build, solve = _profiled_phase_fns(self.statics)
        jax.block_until_ready((raw_dev, alphas_dev, valid_dev))
        summary = ICPSummary()
        summary.duration_init = (time.time() - t0) * 1000.0

        t_neigh = t_solve = 0.0
        n_res = 0
        iters = 0
        converged = False
        for it in range(int(opts.num_iters_icp)):
            t1 = time.time()
            problem = jax.block_until_ready(build(
                level, raw_dev, alphas_dev, valid_dev, qb, tb, qe, te,
                dyn_packed))
            t2 = time.time()
            nqb, ntb, nqe, nte, cost, n_res_dev = jax.block_until_ready(solve(
                raw_dev, alphas_dev, *problem, qb, tb, qe, te, prior_dev,
                dyn_packed))
            t3 = time.time()
            t_neigh += t2 - t1
            t_solve += t3 - t2
            iters += 1
            n_res = int(n_res_dev)
            if n_res < int(opts.min_number_neighbors):
                break
            diff_rot = (s3n.angular_distance_deg(np.asarray(qb), np.asarray(nqb))
                        + s3n.angular_distance_deg(np.asarray(qe),
                                                   np.asarray(nqe)))
            diff_tr = (np.linalg.norm(np.asarray(tb) - np.asarray(ntb))
                       + np.linalg.norm(np.asarray(te) - np.asarray(nte)))
            qb, tb, qe, te = nqb, ntb, nqe, nte
            if (diff_rot < opts.threshold_orientation_norm
                    and diff_tr < opts.threshold_translation_norm):
                converged = True
                break

        frame.begin_pose.quat = np.asarray(qb, np.float64)
        frame.begin_pose.tr = np.asarray(tb, np.float64) + origin
        frame.end_pose.quat = np.asarray(qe, np.float64)
        frame.end_pose.tr = np.asarray(te, np.float64) + origin
        frame.begin_pose.normalize_()
        frame.end_pose.normalize_()

        summary.num_iters = iters
        summary.num_residuals_used = n_res
        summary.success = n_res >= int(opts.min_number_neighbors)
        if not summary.success:
            summary.error_log = (
                f"[CT_ICP] Error : not enough keypoints selected in ct-icp ! "
                f"number_of_residuals : {n_res}")
        k = max(iters, 1)
        summary.avg_duration_neighborhood = t_neigh / k * 1000.0
        summary.avg_duration_solve = t_solve / k * 1000.0
        summary.avg_duration_iter = (t_neigh + t_solve) / k * 1000.0
        summary.duration_total = (time.time() - t0) * 1000.0
        del converged
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
