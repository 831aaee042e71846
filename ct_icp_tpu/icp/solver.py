"""The batched continuous-time ICP solver — one jitted fixed-shape program.

This replaces all three reference solver back-ends (DoRegisterCeres /
DoRegisterGaussNewton / DoRegisterRobust, reference src/ct_icp/ct_icp.cpp:460-1370)
with a single XLA program:

    outer while_loop (<= num_iters_icp, early-exit on pose deltas):
      1. transform keypoints by slerp/lerp-interpolated poses at each point's
         alpha-timestamp (ct_icp.cpp:516-531)
      2. fixed-radius neighbor gather in the voxel map level chosen by the
         search radius (map.h:449-514) — batched over all keypoints (the
         reference's OpenMP axis, ct_icp.cpp:561)
      3. batched covariance + closed-form eigen -> normals, a2D, planarity
         (neighborhood.h:226-316)
      4. geometric weights (ct_icp.cpp:577-587)
      5. inner LM loop (<= ls_max_num_iters, ceres::Solve equivalent,
         ct_icp.cpp:632): residuals + priors of a 12-DoF perturbation,
         autodiff Jacobian through the slerp (exactly what Ceres autodiff
         does), IRLS robust weights, Jacobi-preconditioned damped normal
         equations, accept/reject with adaptive damping
      6. convergence test on rot/trans deltas in deg/m (ct_icp.cpp:668-672)

All iteration counts and thresholds are *dynamic* scalars: the robust
escalation regimen (odometry.cpp:996-1018) re-invokes the same compiled
program with different numbers — zero recompiles. Only shapes and enum
branches (distance/loss/solver/parametrization) are static.

Dtype discipline: everything float32; keypoints and map live in a local map
frame kept near the origin by the host (see odometry/odometry.py), covariances
are accumulated about each query point, and the 12x12 solve is Jacobi
preconditioned — the places where f32 would otherwise lose the game.
"""

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ct_icp_tpu.config.options import (CTICPOptions, IcpDistance, LeastSquares,
                                       PoseParametrization, Solver)
from ct_icp_tpu.core import se3 as s3
from ct_icp_tpu.icp import residuals as res
from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops.neighborhood import (compute_description,
                                         description_from_moments)

MAX_OUTER_ITERS = 64
MAX_INNER_ITERS = 64


@dataclasses.dataclass(frozen=True)
class SolverStatics:
    """Static (compile-time) part of the registration configuration."""

    num_keypoints: int            # K (padded)
    max_neighbors: int            # k of the top-k gather
    level_index: int              # which map resolution level is searched
    voxel_neighborhood: int       # nv: (2nv+1)^3 voxels scanned
    distance: IcpDistance = IcpDistance.POINT_TO_PLANE
    loss: LeastSquares = LeastSquares.CAUCHY
    solver: Solver = Solver.CERES
    parametrization: PoseParametrization = PoseParametrization.CONTINUOUS_TIME
    # k residuals per keypoint, anchored at its k nearest neighbors with a
    # shared normal/weight (reference CERES builder, ct_icp.cpp:554,593-604).
    # >1 requires the exact k-NN neighborhood (the sorted neighbor list) and
    # the CERES solver — build_register_fn raises otherwise: a config that
    # asks for k residuals must never silently degrade to 1.
    num_closest_neighbors: int = 1
    use_normal_filter: bool = False
    # ROBUST solver statics (reference ct_icp.h:139-141)
    use_barycenter: bool = False
    use_lines: bool = True
    use_distribution: bool = True
    # per-point search radius growing with sensor distance
    # (reference DistanceBasedStrategy, neighborhood_strategy.h:95-146)
    use_distance_strategy: bool = False
    # ball-neighborhood fast path: estimate descriptors without a top-k sort.
    # Set False for exact k-NN parity with the reference.
    ball_neighborhood: bool = True
    # in ball mode, cap the moment accumulation to ~the k nearest candidates
    # (k = dyn.max_number_neighbors) via a histogram-selected adaptive radius
    # (vm._knn_radius2). Restores the locality of the reference's k-NN
    # normals (neighborhood_strategy.h:60-85) at ball-mode cost; False =
    # whole-ball moments (round-1 behavior, measured ~1.6x worse APE).
    knn_moments: bool = True
    # compact the (2nv+1)^3 candidate voxels to the nearest-occupied subset
    # of this size at gather time (0 = keep all; see
    # vm.gather_candidate_planes). Driving stats: ~9 occupied of 27, p99=18.
    max_candidate_voxels: int = 0
    # analytic continuous-time Jacobians for the geometric rows (the
    # reference GN path's cross-product linearization, ct_icp.cpp:813-850)
    # instead of 12-tangent jacfwd through the per-point slerp — measured
    # ~3x cheaper per LM inner iteration at K=4096. The small-angle
    # endpoint-transport approximation it makes is the same one the
    # reference makes; the LM accept/reject (exact costs) guards it.
    # Default OFF: at the bench's laddered shapes (K~1024) the inner loop
    # is not the frame bottleneck, and the approximation measured +18% APE
    # on the driving bench (0.0707 -> 0.0835 m) — exact autodiff is both
    # the accuracy winner and the CERES-path parity choice. Enable for
    # workloads with very large K / many LM iterations. Only honored for
    # the non-ROBUST solvers; ROBUST always uses autodiff (mixed rows).
    analytic_jacobian: bool = False
    # > 0: UNROLL the outer ICP loop to exactly this many iterations
    # (python-level, masked by convergence) instead of the lax.while_loop.
    # Gathers happen at statically known iterations, so the unrolled body
    # is vmap-friendly (a vmapped lax.cond executes BOTH branches — under
    # the while_loop formulation that re-gathers every iteration for every
    # lane). Converged iterations still execute (masked); dyn.num_iters_icp
    # is capped at this value.
    unroll_iters: int = 0


class SolverDynamics(NamedTuple):
    """Dynamic scalars — change per robust-escalation level without recompile."""

    num_iters_icp: jnp.ndarray
    ls_max_num_iters: jnp.ndarray
    ls_sigma: jnp.ndarray
    ls_tolerant_min_threshold: jnp.ndarray
    max_dist_to_plane: jnp.ndarray
    threshold_orientation_norm: jnp.ndarray  # degrees
    threshold_translation_norm: jnp.ndarray  # meters
    search_radius: jnp.ndarray
    voxel_resolution: jnp.ndarray
    min_number_neighbors: jnp.ndarray
    power_planarity: jnp.ndarray
    weight_alpha: jnp.ndarray
    weight_neighborhood: jnp.ndarray
    threshold_voxel_occupancy: jnp.ndarray
    max_num_residuals: jnp.ndarray           # <=0 disables the cap
    # ROBUST solver params (reference ct_icp.h:134-141)
    threshold_linearity: jnp.ndarray
    threshold_planarity: jnp.ndarray
    weight_point_to_point: jnp.ndarray
    outlier_distance: jnp.ndarray
    # distance-based strategy params (reference neighborhood_strategy.h:95-146)
    radius_min: jnp.ndarray
    radius_max: jnp.ndarray
    radius_exponent: jnp.ndarray
    # candidate-cache policy: fresh gathers for the first N ICP iterations
    regather_iters: jnp.ndarray
    # k of the knn_moments adaptive-radius cap (reference max_number_neighbors)
    max_number_neighbors: jnp.ndarray


_INT_FIELDS = {"num_iters_icp", "ls_max_num_iters", "min_number_neighbors",
               "threshold_voxel_occupancy", "max_num_residuals",
               "regather_iters", "max_number_neighbors"}


def pack_dynamics(opts: CTICPOptions, search_radius, voxel_resolution,
                  distance_strategy=None) -> "np.ndarray":
    """Host-side packing of all dynamic scalars into ONE float32 vector.

    A single array crosses the host->device boundary per solver call instead
    of ~20 tiny transfers (which dominate dispatch cost on a remote device).
    Integer fields ride as exact small floats.
    """
    import numpy as np
    ds = distance_strategy
    vals = [
        opts.num_iters_icp, opts.ls_max_num_iters, opts.ls_sigma,
        opts.ls_tolerant_min_threshold, opts.max_dist_to_plane_ct_icp,
        opts.threshold_orientation_norm, opts.threshold_translation_norm,
        search_radius, voxel_resolution, opts.min_number_neighbors,
        opts.power_planarity, opts.weight_alpha, opts.weight_neighborhood,
        opts.threshold_voxel_occupancy, opts.max_num_residuals,
        opts.threshold_linearity, opts.threshold_planarity,
        opts.weight_point_to_point, opts.outlier_distance,
        ds.radius_min if ds else 0.0,
        ds.radius_max if ds else 0.0,
        ds.exponent if ds else 1.0,
        opts.regather_iters,
        opts.max_number_neighbors,
    ]
    return np.asarray(vals, dtype=np.float32)


def unpack_dynamics(packed) -> SolverDynamics:
    """Device-side unpacking (inside jit) of pack_dynamics' vector."""
    fields = list(SolverDynamics._fields)
    vals = {}
    for idx, name in enumerate(fields):
        v = packed[idx]
        if name in _INT_FIELDS:
            v = v.astype(jnp.int32)
        vals[name] = v
    return SolverDynamics(**vals)


def make_dynamics(opts: CTICPOptions, search_radius, voxel_resolution
                  ) -> SolverDynamics:
    return unpack_dynamics(jnp.asarray(
        pack_dynamics(opts, search_radius, voxel_resolution)))


class RegistrationResult(NamedTuple):
    quat_begin: jnp.ndarray
    tr_begin: jnp.ndarray
    quat_end: jnp.ndarray
    tr_end: jnp.ndarray
    num_residuals: jnp.ndarray     # residuals used in the last iteration
    num_iters: jnp.ndarray
    converged: jnp.ndarray
    final_cost: jnp.ndarray
    valid_problem: jnp.ndarray     # enough residuals were found


def _freeze_begin_cols(statics: SolverStatics):
    return statics.parametrization == PoseParametrization.SIMPLE


def _build_problem(statics: SolverStatics, dyn: SolverDynamics, level,
                   raw, alphas, valid, qb, tb, qe, te, sensor_location,
                   cached_planes=None, do_gather=None):
    """Association + descriptors for the current pose estimate.

    In ball mode, ``cached_planes`` (x, y, z, ok_base) from a previous
    iteration can be re-scored against the moved keypoints — the gather is
    the expensive half of the search, and inter-iteration pose deltas are far
    smaller than a voxel. ``do_gather`` (traced bool) selects fresh gather vs
    cache via lax.cond.

    Returns (anchors, normals, lines, cov_inv, geom_w, ok, cls, cached_planes).
    """
    world = res.interp_world_points(qb, tb, qe, te, raw, alphas)
    if statics.use_distance_strategy:
        # radius = a*r_max + (1-a)*r_min, a = (min(|p|, r_max)/r_max)^exp
        # (reference neighborhood_strategy.h:124-129, clamping replicated)
        d_sensor = jnp.linalg.norm(raw, axis=-1)
        a = jnp.power(jnp.minimum(d_sensor, dyn.radius_max)
                      / jnp.maximum(dyn.radius_max, 1e-9),
                      dyn.radius_exponent)
        radius = a * dyn.radius_max + (1.0 - a) * dyn.radius_min
    else:
        radius = dyn.search_radius
    if statics.ball_neighborhood:
        def fresh_gather(_):
            return vm.gather_candidate_planes(
                level, world, valid, dyn.voxel_resolution,
                statics.voxel_neighborhood, sensor_location,
                statics.use_normal_filter, dyn.threshold_voxel_occupancy,
                max_candidates=statics.max_candidate_voxels)

        # cache = (rows, cnt_ok, r_eff2): the knn-cap radius rides with the
        # candidate rows — its [M,O,P,bins] histogram recomputes only on
        # regather iterations (measured ~1.9 ms/rescore at driving shapes
        # for an output that moves less than a shell width between
        # iterations; the LM accept/reject guards the reuse)
        if cached_planes is None:
            rows, cnt_ok = fresh_gather(None)
            cached_r, use_fresh = None, None
        else:
            rows, cnt_ok = jax.lax.cond(
                do_gather, fresh_gather,
                lambda _: (cached_planes[0], cached_planes[1]), None)
            cached_r, use_fresh = cached_planes[2], do_gather
        ncount, sum_rel, sum_outer, closest, closest_dist, r_eff2 = \
            vm.moments_from_planes(
                rows, cnt_ok, world, radius,
                k_nearest=(dyn.max_number_neighbors
                           if statics.knn_moments else None),
                cached_r_eff2=cached_r, use_fresh=use_fresh,
                return_r_eff2=True)
        ok = valid & (ncount >= dyn.min_number_neighbors)
        desc = description_from_moments(ncount, sum_rel, sum_outer, world)
        closest_dist = jnp.where(jnp.isfinite(closest_dist), closest_dist, 0.0)
        cached_planes = (rows, cnt_ok, r_eff2)
    else:
        neigh, nmask, nd = vm.radius_search(
            level, world, valid, radius, dyn.voxel_resolution,
            nv=statics.voxel_neighborhood, k=statics.max_neighbors,
            sensor_location=sensor_location,
            use_normal_filter=statics.use_normal_filter,
            threshold_voxel_occupancy=dyn.threshold_voxel_occupancy)
        ncount = jnp.sum(nmask, axis=-1)
        ok = valid & (ncount >= dyn.min_number_neighbors)
        desc = compute_description(neigh, nmask, world)
        closest = neigh[:, 0, :]
        closest_dist = jnp.where(nmask[:, 0], nd[:, 0], 0.0)
        if statics.num_closest_neighbors > 1:
            # k residuals per keypoint: anchor i = i-th nearest neighbor,
            # shared normal/weight (reference ct_icp.cpp:593-604). anchors
            # become [K, kc, 3]; ok becomes [K, kc] (row i live only when
            # neighbor i exists). neigh rows are distance-sorted by
            # radius_search, matching the reference's priority-queue order.
            kc = statics.num_closest_neighbors
            multi_anchors = neigh[:, :kc, :]
            multi_ok = ok[:, None] & nmask[:, :kc]
    geom_w = res.ceres_path_weights(
        desc.a2D, closest_dist, dyn.power_planarity, dyn.weight_alpha,
        dyn.weight_neighborhood, dyn.max_dist_to_plane,
        jnp.maximum(dyn.min_number_neighbors.astype(jnp.float32), 1.0))

    if statics.solver == Solver.GN:
        # reference GN path (ct_icp.cpp:777-806): weight = a2D^2, residual
        # gated by |dist_to_plane| < max_dist_to_plane
        geom_w = desc.a2D * desc.a2D
        dist_to_plane = jnp.abs(jnp.sum((world - closest) * desc.normal, axis=-1))
        ok = ok & (dist_to_plane < dyn.max_dist_to_plane)

    anchors = closest
    cls = None
    if statics.solver == Solver.ROBUST:
        # reference DoRegisterRobust (ct_icp.cpp:1227-1290): classify each
        # neighborhood, pick the distance type and weight per point, gate
        # outliers by the distance to the association.
        planar = desc.planarity > dyn.threshold_planarity
        linear = ~planar & (desc.linearity > dyn.threshold_linearity)
        if not statics.use_lines:
            # reclassify LINEAR (ct_icp.cpp:1243-1248)
            planar = planar | (linear & (desc.planarity > dyn.threshold_planarity))
            linear = jnp.zeros_like(linear)
        cls = jnp.where(planar, 1, jnp.where(linear, 2, 0))
        geom_w = jnp.where(
            planar, jnp.power(jnp.abs(desc.planarity), dyn.power_planarity),
            jnp.where(linear,
                      jnp.power(jnp.abs(desc.linearity), dyn.power_planarity),
                      jnp.where(jnp.asarray(statics.use_distribution),
                                dyn.weight_neighborhood,
                                dyn.weight_point_to_point)))
        anchors = desc.barycenter if statics.use_barycenter else closest
        diff = anchors - world
        line_n = desc.line / jnp.maximum(
            jnp.linalg.norm(desc.line, axis=-1, keepdims=True), 1e-12)
        d_line = jnp.linalg.norm(jnp.cross(diff, line_n), axis=-1)
        d_plane = jnp.abs(jnp.sum(diff * desc.normal, axis=-1))
        d_other = jnp.linalg.norm(diff, axis=-1)
        dist = jnp.where(planar, d_plane, jnp.where(linear, d_line, d_other))
        ok = ok & (dist < dyn.outlier_distance)

    cov_inv = None
    if (statics.distance == IcpDistance.POINT_TO_DISTRIBUTION
            or (statics.solver == Solver.ROBUST and statics.use_distribution)):
        eps = 0.05  # FunctorPointToDistribution epsilon (cost_functions.h:180)
        cov_inv = jnp.linalg.inv(
            desc.covariance + eps * jnp.eye(3, dtype=raw.dtype))

    if (not statics.ball_neighborhood
            and statics.num_closest_neighbors > 1):
        anchors, ok = multi_anchors, multi_ok

    # cap the number of residuals (reference max_num_residuals,
    # ICPOptimizationBuilder ct_icp.cpp:148-456). The reference caps a
    # randomly-shuffled keypoint order; our keypoints arrive voxel-sorted, so
    # a first-N cap would select a spatially-biased blob — decimate with a
    # uniform stride over the valid points instead. (Shape-agnostic: ok may
    # be [K] or [K, kc] in the multi-anchor mode.)
    ok_flat = ok.reshape(-1)
    n_ok = jnp.maximum(jnp.sum(ok_flat.astype(jnp.int32)), 1)
    cap = jnp.where(dyn.max_num_residuals > 0, dyn.max_num_residuals,
                    jnp.int32(1 << 30))
    rank = jnp.cumsum(ok_flat.astype(jnp.int32)) - 1
    cap_c = jnp.minimum(cap, n_ok)
    sel = (rank * cap_c) // n_ok != ((rank - 1) * cap_c) // n_ok
    ok = (ok_flat & jnp.where(n_ok > cap, sel, True)).reshape(ok.shape)

    return (anchors, desc.normal, desc.line, cov_inv, geom_w, ok, cls,
            cached_planes)


def _residual_vector(statics, dyn, delta, raw, alphas, anchors, normals, lines,
                     cov_inv, geom_w, ok, cls, qb, tb, qe, te, prior, n_res):
    """Full residual vector [(K*R + P)] of a 12-DoF perturbation, where
    P = 10 motion-prior rows, +12 prediction-consistency rows when the
    prior carries a prediction block (packed [41])."""
    qb2, tb2, qe2, te2 = res.apply_delta(delta, qb, tb, qe, te)
    world = res.interp_world_points(qb2, tb2, qe2, te2, raw, alphas)
    if statics.solver == Solver.ROBUST:
        # mixed residual types by neighborhood class: rows [K, 3] with the
        # scalar distances in row 0 (plane/line/distribution) or a full
        # 3-vector (point-to-point when use_distribution is off)
        r_plane = res.geometric_residuals(
            IcpDistance.POINT_TO_PLANE, world, anchors, normals, lines,
            cov_inv, geom_w)[:, 0]
        r_line = res.geometric_residuals(
            IcpDistance.POINT_TO_LINE, world, anchors, normals, lines,
            cov_inv, geom_w)[:, 0]
        if statics.use_distribution:
            r_other3 = jnp.stack(
                [res.geometric_residuals(
                    IcpDistance.POINT_TO_DISTRIBUTION, world, anchors,
                    normals, lines, cov_inv, geom_w)[:, 0],
                 jnp.zeros_like(r_plane), jnp.zeros_like(r_plane)], axis=-1)
        else:
            r_other3 = res.geometric_residuals(
                IcpDistance.POINT_TO_POINT, world, anchors, normals, lines,
                cov_inv, geom_w)
        scalar = jnp.where(cls == 1, r_plane, r_line)
        r_scalar3 = jnp.stack(
            [scalar, jnp.zeros_like(scalar), jnp.zeros_like(scalar)], axis=-1)
        geo = jnp.where((cls > 0)[:, None], r_scalar3, r_other3)
    elif statics.num_closest_neighbors > 1 and anchors.ndim == 3:
        # expand to one row per (keypoint, i-th neighbor): repeat the
        # keypoint-indexed arrays kc times, flatten the anchor axis
        kc = statics.num_closest_neighbors
        kk = world.shape[0]
        geo = res.geometric_residuals(
            statics.distance,
            jnp.repeat(world, kc, axis=0), anchors.reshape(kk * kc, 3),
            jnp.repeat(normals, kc, axis=0), jnp.repeat(lines, kc, axis=0),
            None if cov_inv is None else jnp.repeat(cov_inv, kc, axis=0),
            jnp.repeat(geom_w, kc, axis=0))
    else:
        geo = res.geometric_residuals(
            statics.distance, world, anchors, normals, lines, cov_inv, geom_w)
    geo = jnp.where(ok.reshape(-1)[:, None], geo, 0.0).reshape(-1)
    pri = res.motion_prior_residuals(qb2, tb2, qe2, te2, prior, n_res)
    rows = [geo, pri]
    if "pred_begin_quat" in prior:
        rows.append(res.prediction_consistency_residuals(
            qb2, tb2, qe2, te2, prior))
    return jnp.concatenate(rows)


def _lm_inner_loop(statics, dyn, raw, alphas, anchors, normals, lines, cov_inv,
                   geom_w, ok, cls, qb, tb, qe, te, prior):
    """ceres::Solve replacement: <= ls_max_num_iters damped-GN steps with
    IRLS robust weights and accept/reject damping adaptation."""
    k = statics.num_keypoints
    n_res = jnp.sum(ok.astype(jnp.int32))
    nrows = k * (3 if (statics.distance == IcpDistance.POINT_TO_POINT
                       or statics.solver == Solver.ROBUST) else 1)
    if statics.num_closest_neighbors > 1:
        nrows *= statics.num_closest_neighbors

    def point_rows(vec):
        return vec[:nrows], vec[nrows:]

    def total_cost(delta, q0, t0, q1, t1):
        r = _residual_vector(statics, dyn, delta, raw, alphas, anchors,
                             normals, lines, cov_inv, geom_w, ok, cls,
                             q0, t0, q1, t1, prior, n_res)
        pr, prior_r = point_rows(r)
        c_pts = jnp.sum(res.robust_cost(statics.loss, pr * pr, dyn.ls_sigma,
                                        dyn.ls_tolerant_min_threshold))
        return c_pts + jnp.sum(prior_r * prior_r)

    zero = jnp.zeros((12,), dtype=raw.dtype)

    def cond(carry):
        it, done = carry[0], carry[7]
        return (it < jnp.minimum(dyn.ls_max_num_iters, MAX_INNER_ITERS)) \
            & ~done

    use_analytic = (statics.analytic_jacobian
                    and statics.solver != Solver.ROBUST
                    and statics.num_closest_neighbors <= 1)

    def body(carry):
        # carry[6] is the CURRENT state's total cost (computed once before
        # the loop, then updated from the accept/reject outcome) —
        # re-evaluating total_cost(zero) here cost one full residual pass
        # per inner iteration for a value the previous iteration already
        # had (up to apply_delta(zero) normalization float noise)
        it, q0, t0, q1, t1, lam, cost0, _ = carry

        if use_analytic:
            # one world transform serves residual AND Jacobian; the pose
            # chain collapses to cross products (no autodiff through slerp)
            world = res.interp_world_points(q0, t0, q1, t1, raw, alphas)
            r_geo, g = res.geometric_residuals_and_grad(
                statics.distance, world, anchors, normals, lines, cov_inv,
                geom_w)
            r_geo = jnp.where(ok[:, None], r_geo, 0.0)
            g = jnp.where(ok[:, None, None], g, 0.0)
            jac_geo = res.ct_jacobian_from_world_grad(g, world, t0, t1,
                                                      alphas)

            def prior_fun(d):
                q0b, t0b, q1b, t1b = res.apply_delta(d, q0, t0, q1, t1)
                rows = [res.motion_prior_residuals(q0b, t0b, q1b, t1b, prior,
                                                   n_res)]
                if "pred_begin_quat" in prior:
                    rows.append(res.prediction_consistency_residuals(
                        q0b, t0b, q1b, t1b, prior))
                return jnp.concatenate(rows)

            r0 = jnp.concatenate([r_geo.reshape(-1), prior_fun(zero)])
            jac = jnp.concatenate([jac_geo.reshape(-1, 12),
                                   jax.jacfwd(prior_fun)(zero)], axis=0)
        else:
            def rfun(d):
                return _residual_vector(statics, dyn, d, raw, alphas,
                                        anchors, normals, lines, cov_inv,
                                        geom_w, ok, cls, q0, t0, q1, t1,
                                        prior, n_res)

            r0 = rfun(zero)
            jac = jax.jacfwd(rfun)(zero)          # [(rows), 12]
        pr, _ = point_rows(r0)
        w_pts = res.irls_weight(statics.loss, pr * pr, dyn.ls_sigma,
                                dyn.ls_tolerant_min_threshold)
        w = jnp.concatenate(
            [w_pts, jnp.ones((r0.shape[0] - nrows,), dtype=raw.dtype)])

        if _freeze_begin_cols(statics):
            jac = jac.at[:, 0:6].set(0.0)

        jtj = (jac * w[:, None]).T @ jac           # [12, 12] (MXU)
        jtr = (jac * w[:, None]).T @ r0
        diag = jnp.diagonal(jtj)
        # freeze unobservable dimensions (e.g. the begin pose when every
        # alpha-timestamp is 1 on the first frames): without this, Jacobi
        # normalization masks the rank deficiency and the unscaling step
        # amplifies float32 noise into arbitrary pose updates
        degen = diag <= 1e-7 * jnp.maximum(jnp.max(diag), 1e-12)
        keep = (~degen).astype(raw.dtype)
        # Jacobi preconditioning keeps the f32 solve well-conditioned
        d = jnp.where(degen, 1.0, jnp.sqrt(jnp.maximum(diag, 1e-20)))
        a = jtj / (d[:, None] * d[None, :])
        a = a * keep[:, None] * keep[None, :] + jnp.diag(degen.astype(raw.dtype))
        a = a + lam * jnp.diag(jnp.diagonal(a)) \
            + 1e-7 * jnp.eye(12, dtype=raw.dtype)
        b = -jtr / d * keep
        delta = jnp.linalg.solve(a, b) / d * keep

        cost1 = total_cost(delta, q0, t0, q1, t1)
        accept = cost1 < cost0
        best = jnp.where(accept, cost1, cost0)
        # ceres::Solve convergence (the reference's LS backend): stop when
        # an ACCEPTED step's relative cost decrease falls below
        # function_tolerance (Ceres default 1e-6, solver.h). Without this
        # the loop burned every ls_max_num_iters (the robust regimen's 20)
        # on converged problems — measured 6 ms/frame of pure waste at
        # robust shapes with zero accuracy impact.
        done = accept & (cost0 - cost1 <= 1e-6 * (cost0 + 1e-30))
        q0, t0, q1, t1 = res.apply_delta(
            jnp.where(accept, delta, zero), q0, t0, q1, t1)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-8),
                        jnp.minimum(lam * 4.0, 1e4))
        return it + 1, q0, t0, q1, t1, lam, best, done

    init = (jnp.int32(0), qb, tb, qe, te, jnp.asarray(1e-4, raw.dtype),
            total_cost(zero, qb, tb, qe, te), jnp.asarray(False))
    _, q0, t0, q1, t1, _, cost, _ = jax.lax.while_loop(cond, body, init)
    return q0, t0, q1, t1, cost, n_res


def unpack_prior(packed):
    """Unpack a packed prior vector into the dict consumed by
    residuals.motion_prior_residuals.

    [14]: the PreviousFrameMotionModel layout of registration.make_prior.
    [41]: extends it with the PredictionConsistencyModel block (predicted
    begin/end/relative poses + 6 pre-scaled constraint weights, see
    odometry.motion_model.PredictionConsistencyModel.device_prior)."""
    out = {
        "prev_end_quat": packed[0:4],
        "prev_end_tr": packed[4:7],
        "prev_velocity": packed[7:10],
        "beta_location_consistency": packed[10],
        "beta_orientation_consistency": packed[11],
        "beta_constant_velocity": packed[12],
        "beta_small_velocity": packed[13],
    }
    if packed.shape[0] >= 41:
        out.update({
            "pred_begin_quat": packed[14:18],
            "pred_begin_tr": packed[18:21],
            "pred_end_quat": packed[21:25],
            "pred_end_tr": packed[25:28],
            "pred_rel_quat": packed[28:32],
            "pred_rel_tr": packed[32:35],
            "w_begin_tr": packed[35],
            "w_begin_rot": packed[36],
            "w_end_tr": packed[37],
            "w_end_rot": packed[38],
            "w_rel_rot": packed[39],
            "w_rel_tr": packed[40],
        })
    return out


def _loop_pieces(statics: SolverStatics):
    """The outer-ICP-loop pieces shared by the fused program
    (:func:`build_register_fn`: lax.while_loop / unroll) and the staged
    profiled path (:func:`build_staged_fns`: one dispatch per phase, driven
    from the host with a sync point between phases).

    SINGLE SOURCE for the iteration semantics: any change to the production
    loop body (cache/regather policy, convergence, residual freezing) flows
    into the profiled path automatically — the two cannot diverge (the
    round-3 failure mode where a re-implemented profiled loop missed the
    fused path's semantics changes).

    Carry layout (13 fields):
      0 it  1..4 qb,tb,qe,te  5 cost  6 converged  7 n_res  8 enough
      9 last_cost  10 cached candidate planes (None before the first
      gather in ball mode; () otherwise)  11 anchor_tr  12 anchor_q
    """

    def init_carry(raw, qb, tb, qe, te):
        zero_planes = None if statics.ball_neighborhood else ()
        return (jnp.int32(0), qb, tb, qe, te,
                jnp.asarray(jnp.inf, raw.dtype), jnp.asarray(False),
                jnp.int32(0), jnp.asarray(True),
                jnp.asarray(jnp.inf, raw.dtype),
                zero_planes, te + 1e9, jnp.stack([qe, qb]))

    def stage_build(carry, level, raw, alphas, valid, dyn, sensor_location,
                    r_max):
        """Association phase (the reference's per-iteration neighborhood
        search, ct_icp.cpp:561-604): candidate gather / cache re-score +
        descriptors + weights at the current pose estimate."""
        it, cqb, ctb, cqe, cte = carry[0], carry[1], carry[2], carry[3], \
            carry[4]
        planes, anchor_tr, anchor_q = carry[10], carry[11], carry[12]
        if statics.ball_neighborhood:
            # regather when the pose moved more than half a voxel since
            # the cached gather — including ROTATION, which displaces a
            # keypoint at distance r by ~r*dtheta (a sustained 4 deg/
            # frame corner moves 40 m points by 2.8 m while the
            # translation test alone stays quiet; measured runaway ego
            # rotation and 39 consecutive frame failures on the long-
            # drive corner before this term existed)
            moved_tr = jnp.linalg.norm(cte - anchor_tr) \
                > 0.5 * dyn.voxel_resolution
            dtheta = jnp.maximum(
                s3.angular_distance_deg(cqe, anchor_q[0]),
                s3.angular_distance_deg(cqb, anchor_q[1])) \
                * (jnp.pi / 180.0)
            moved_rot = dtheta * r_max > 0.5 * dyn.voxel_resolution
            do_gather = (it < dyn.regather_iters) | moved_tr | moved_rot
            problem = _build_problem(statics, dyn, level, raw, alphas, valid,
                                     cqb, ctb, cqe, cte, sensor_location,
                                     cached_planes=planes,
                                     do_gather=do_gather)
            anchor_tr = jnp.where(do_gather, cte, anchor_tr)
            anchor_q = jnp.where(do_gather, jnp.stack([cqe, cqb]), anchor_q)
        else:
            problem = _build_problem(statics, dyn, level, raw, alphas, valid,
                                     cqb, ctb, cqe, cte, sensor_location)
            anchor_q = jnp.stack([cqe, cqb])
        return problem, anchor_tr, anchor_q

    def stage_solve(carry, problem, anchor_tr, anchor_q, raw, alphas, dyn,
                    prior):
        """Optimization phase (ceres::Solve + convergence test,
        ct_icp.cpp:632-676) producing the next outer-loop carry."""
        it, cqb, ctb, cqe, cte = carry[0], carry[1], carry[2], carry[3], \
            carry[4]
        anchors, normals, lines, cov_inv, geom_w, ok, cls, planes = problem
        nqb, ntb, nqe, nte, cost, n_res = _lm_inner_loop(
            statics, dyn, raw, alphas, anchors, normals, lines, cov_inv,
            geom_w, ok, cls, cqb, ctb, cqe, cte, prior)
        # not enough residuals: freeze the state, fail the problem
        enough = n_res >= dyn.min_number_neighbors
        nqb = jnp.where(enough, nqb, cqb)
        ntb = jnp.where(enough, ntb, ctb)
        nqe = jnp.where(enough, nqe, cqe)
        nte = jnp.where(enough, nte, cte)

        diff_rot = (s3.angular_distance_deg(cqb, nqb)
                    + s3.angular_distance_deg(cqe, nqe))
        diff_trans = (jnp.linalg.norm(ctb - ntb)
                      + jnp.linalg.norm(cte - nte))
        converged = ((diff_rot < dyn.threshold_orientation_norm)
                     & (diff_trans < dyn.threshold_translation_norm))
        converged = converged | ~enough
        return (it + 1, nqb, ntb, nqe, nte, cost, converged, n_res,
                enough, cost, planes, anchor_tr, anchor_q)

    def body(carry, level, raw, alphas, valid, dyn, prior, sensor_location,
             r_max):
        problem, a_tr, a_q = stage_build(carry, level, raw, alphas, valid,
                                         dyn, sensor_location, r_max)
        return stage_solve(carry, problem, a_tr, a_q, raw, alphas, dyn,
                           prior)

    return init_carry, stage_build, stage_solve, body


def build_register_fn(statics: SolverStatics):
    """Compile-time specialization of the full registration loop.

    The returned function has signature
      (level, raw [K,3], alphas [K], valid [K], qb, tb, qe, te, prior, dyn)
        -> RegistrationResult
    where ``prior`` is either the dict of motion_prior_residuals or a packed
    [14] vector, and ``dyn`` either a SolverDynamics or a packed [19] vector
    (one transfer each per call). Safe to wrap in jax.jit (all control flow
    is lax).
    """
    if statics.num_closest_neighbors > 1:
        # never a silent degrade-to-1: unsupported combinations fail here
        if statics.ball_neighborhood:
            raise ValueError(
                "num_closest_neighbors > 1 needs the sorted neighbor list: "
                "set ball_neighborhood=False (CTICPRegistration flips this "
                "automatically when building statics from options)")
        if statics.solver != Solver.CERES:
            raise ValueError(
                "num_closest_neighbors > 1 is a CERES-builder feature "
                "(reference ct_icp.cpp:554); the GN/ROBUST paths never emit "
                "k residuals per keypoint")
        if statics.max_neighbors < statics.num_closest_neighbors:
            raise ValueError(
                f"num_closest_neighbors={statics.num_closest_neighbors} "
                f"exceeds max_number_neighbors={statics.max_neighbors}")

    init_carry, _, _, shared_body = _loop_pieces(statics)

    def register(level, raw, alphas, valid, qb, tb, qe, te, prior, dyn):
        if not isinstance(dyn, SolverDynamics):
            dyn = unpack_dynamics(dyn)
        if not isinstance(prior, dict):
            prior = unpack_prior(prior)
        qb = s3.quat_normalize(qb)
        qe = s3.quat_normalize(qe)
        sensor_location = te  # reference passes &end_t (ct_icp.cpp:592)

        # candidate-plane cache across ICP iterations (ball mode): fresh
        # gathers only for the first dyn.regather_iters iterations (and
        # whenever the pose moved more than half a voxel since the last
        # gather). Cached as raw rows + per-voxel counts — the compact
        # layout keeps the while_loop carry (and its per-iteration select
        # through lax.cond) ~3.5x smaller than per-point planes. The cache
        # arrays are created by the PEELED first iteration below (a fresh
        # gather), not zero-initialized: materializing the [K, O, 3P] zeros
        # (up to ~24 MB at full rungs) and selecting them through the first
        # iteration's lax.cond was pure HBM traffic.
        # The loop body itself is SHARED with the staged profiled path
        # (see _loop_pieces).

        def cond(carry):
            it, converged = carry[0], carry[6]
            return (it < dyn.num_iters_icp) & ~converged

        def body(carry):
            return shared_body(carry, level, raw, alphas, valid, dyn, prior,
                               sensor_location, r_max)

        # farthest keypoint distance: converts a rotation since the last
        # gather into its worst-case point displacement (cache validity)
        r_max = jnp.max(jnp.where(valid, jnp.linalg.norm(raw, axis=-1), 0.0))
        init = init_carry(raw, qb, tb, qe, te)
        # PEEL iteration 0: its gather is unconditional (the cache cannot
        # be warm yet), so running it outside the loop creates the cache
        # arrays directly — no zero-init, no first-iteration cond select.
        # When num_iters_icp <= 0 (frame 0's passthrough), the peeled
        # update is discarded below (selects only the pose-sized fields;
        # the unread cache arrays pass through untouched). Note the peel's
        # gather + LM inner loop still EXECUTE at runtime for passthrough
        # frames (results discarded) — acceptable because passthrough is
        # frame 0 only; a dyn-gated skip would reintroduce the lax.cond
        # select over the cache arrays this peel exists to avoid.
        peeled = body(init)
        skip = dyn.num_iters_icp <= 0
        carry1 = tuple(
            (x if i == 10 else
             jax.tree_util.tree_map(
                 lambda n, o: jnp.where(skip, o, n), x, init[i]))
            for i, x in enumerate(peeled))
        if statics.unroll_iters > 0:
            # python-level unroll of the REMAINING iterations (masked once
            # converged): gathers sit at statically known program points
            # (vmap-friendly — a vmapped lax.cond executes both branches)
            carry = carry1
            for _ in range(statics.unroll_iters - 1):
                it = carry[0]
                active = (it < dyn.num_iters_icp) & ~carry[6]
                new = body(carry)
                carry = tuple(
                    (x if i == 10 else
                     jax.tree_util.tree_map(
                         lambda n, o: jnp.where(active, n, o), x, carry[i]))
                    for i, x in enumerate(new))
            (it, fqb, ftb, fqe, fte, cost, converged, n_res, enough,
             _, _, _, _) = carry
        else:
            (it, fqb, ftb, fqe, fte, cost, converged, n_res, enough,
             _, _, _, _) = jax.lax.while_loop(cond, body, carry1)

        return RegistrationResult(
            quat_begin=s3.quat_normalize(fqb), tr_begin=ftb,
            quat_end=s3.quat_normalize(fqe), tr_end=fte,
            num_residuals=n_res, num_iters=it, converged=converged,
            final_cost=cost, valid_problem=enough)

    return register


@functools.lru_cache(maxsize=64)
def jitted_register_fn(statics: SolverStatics):
    return jax.jit(build_register_fn(statics))


@functools.lru_cache(maxsize=64)
def build_staged_fns(statics: SolverStatics):
    """Jitted per-phase kernels of the SAME outer-loop body the fused
    program runs (:func:`_loop_pieces`), for the profiled registration path:
    one dispatch per phase gives each a sync point, so the measured
    durations are real wall times of the production iteration semantics.
    Returns (stage_init, stage_build, stage_solve):

      stage_init(raw, valid, qb, tb, qe, te) -> (carry0, r_max)
      stage_build(carry, level, raw, alphas, valid, dyn_packed,
                  sensor_location, r_max) -> (problem, anchor_tr, anchor_q)
      stage_solve(carry, problem, anchor_tr, anchor_q, raw, alphas,
                  dyn_packed, prior_packed) -> carry

    The host loop applying these with the fused path's cond
    (it < num_iters_icp and not converged) reproduces the production
    while_loop/unroll iteration sequence exactly — the body is pure, so
    masked (unroll) vs skipped (host) converged iterations are equivalent.
    """
    init_carry, stage_build_, stage_solve_, _ = _loop_pieces(statics)

    @jax.jit
    def stage_init(raw, valid, qb, tb, qe, te):
        qb = s3.quat_normalize(qb)
        qe = s3.quat_normalize(qe)
        r_max = jnp.max(jnp.where(valid, jnp.linalg.norm(raw, axis=-1), 0.0))
        return init_carry(raw, qb, tb, qe, te), r_max

    @jax.jit
    def stage_build(carry, level, raw, alphas, valid, dyn_packed,
                    sensor_location, r_max):
        return stage_build_(carry, level, raw, alphas, valid,
                            unpack_dynamics(dyn_packed), sensor_location,
                            r_max)

    @jax.jit
    def stage_solve(carry, problem, anchor_tr, anchor_q, raw, alphas,
                    dyn_packed, prior_packed):
        return stage_solve_(carry, problem, anchor_tr, anchor_q, raw, alphas,
                            unpack_dynamics(dyn_packed),
                            unpack_prior(prior_packed))

    return stage_init, stage_build, stage_solve
