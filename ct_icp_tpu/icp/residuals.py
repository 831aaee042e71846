"""Residuals, robust losses (as IRLS weights) and geometric weighting.

TPU-native re-expression of the reference's Ceres machinery:
  * the four ICP distances (reference include/ct_icp/cost_functions.h:32-183)
    as batched residual functions of a 12-DoF pose perturbation,
  * the continuous-time wrapper (CTFunctor, cost_functions.h:186-222):
    slerp+lerp pose interpolation at each point's alpha-timestamp — here
    differentiated by JAX (jacfwd) exactly like Ceres autodiff differentiates
    through Eigen's slerp,
  * the robust losses (reference ct_icp.h:41-47 + Ceres) as IRLS weight
    functions rho'(r^2): minimizing sum rho(r_i^2) by iteratively reweighted
    Gauss-Newton,
  * the geometric weighting scheme of DoRegisterCeres
    (reference src/ct_icp/ct_icp.cpp:533-587): a planarity^power term blended
    with an exponential neighbor-distance kernel.
"""

import jax
import jax.numpy as jnp

from ct_icp_tpu.config.options import IcpDistance, LeastSquares
from ct_icp_tpu.core import se3 as s3


# ------------------------------------------------------------ robust losses —

def irls_weight(loss: LeastSquares, r2, sigma, tolerant_a):
    """IRLS weight rho'(s) at s = r^2 for each supported loss.

    Matches the Ceres losses the reference selects from
    (ct_icp.cpp builder: CAUCHY/HUBER/TOLERANT/TRUNCATED with scale ls_sigma):
      STANDARD:  rho(s) = s               -> 1
      CAUCHY:    rho(s) = b log(1 + s/b)  -> 1/(1 + s/b),        b = sigma^2
      HUBER:     rho(s) = s if s<=b else 2 sqrt(b s) - b
                                          -> min(1, sigma/sqrt(s))
      TOLERANT:  Ceres TolerantLoss(a, b) -> sigmoid((s - a)/b)
      TRUNCATED: rho(s) = min(s, b)       -> 1 if s < b else 0
                 (reference TruncatedLoss, cost_functions.h:364-372)
    """
    b = sigma * sigma
    if loss == LeastSquares.STANDARD:
        return jnp.ones_like(r2)
    if loss == LeastSquares.CAUCHY:
        return 1.0 / (1.0 + r2 / b)
    if loss == LeastSquares.HUBER:
        return jnp.minimum(1.0, sigma / jnp.sqrt(jnp.maximum(r2, 1e-20)))
    if loss == LeastSquares.TOLERANT:
        return jax.nn.sigmoid((r2 - tolerant_a) / jnp.maximum(sigma, 1e-9))
    if loss == LeastSquares.TRUNCATED:
        return jnp.where(r2 < b, 1.0, 0.0)
    raise ValueError(f"Unknown loss {loss}")


def robust_cost(loss: LeastSquares, r2, sigma, tolerant_a):
    """rho(r^2) — the total cost the IRLS iteration is descending."""
    b = sigma * sigma
    if loss == LeastSquares.STANDARD:
        return r2
    if loss == LeastSquares.CAUCHY:
        return b * jnp.log1p(r2 / b)
    if loss == LeastSquares.HUBER:
        return jnp.where(r2 <= b, r2, 2.0 * jnp.sqrt(b * jnp.maximum(r2, 0.0)) - b)
    if loss == LeastSquares.TOLERANT:
        s = jnp.maximum(sigma, 1e-9)
        return s * jnp.logaddexp((r2 - tolerant_a) / s, 0.0)
    if loss == LeastSquares.TRUNCATED:
        return jnp.minimum(r2, b)
    raise ValueError(f"Unknown loss {loss}")


# ------------------------------------------------------- geometric weights —

def ceres_path_weights(a2d, closest_dist, power_planarity, weight_alpha,
                       weight_neighborhood, max_dist_to_plane, min_num_neighbors):
    """The DoRegisterCeres weighting (reference ct_icp.cpp:577-587):

    w = la * a2D^power + ln * exp(-d_closest / (max_dist_to_plane * kMin))
    with (la, ln) the normalized (weight_alpha, weight_neighborhood).
    """
    lam_a = jnp.abs(weight_alpha)
    lam_n = jnp.abs(weight_neighborhood)
    ssum = jnp.maximum(lam_a + lam_n, 1e-12)
    lam_a, lam_n = lam_a / ssum, lam_n / ssum
    return (lam_a * jnp.power(jnp.maximum(a2d, 0.0), power_planarity)
            + lam_n * jnp.exp(-closest_dist /
                              (max_dist_to_plane * min_num_neighbors)))


# ------------------------------------------------------ residual evaluation —

def apply_delta(delta, qb, tb, qe, te):
    """Left-multiplicative so(3) x R^3 perturbation of (begin, end) poses."""
    dqb = s3.quat_from_rotvec(delta[0:3])
    dqe = s3.quat_from_rotvec(delta[6:9])
    return (s3.quat_normalize(s3.quat_mul(dqb, qb)), tb + delta[3:6],
            s3.quat_normalize(s3.quat_mul(dqe, qe)), te + delta[9:12])


def interp_world_points(qb, tb, qe, te, raw, alphas):
    """CT transform of raw points at their alpha-timestamps
    (reference CTFunctor, cost_functions.h:200-218: slerp quat + lerp tr)."""
    n = raw.shape[0]
    q0 = jnp.broadcast_to(qb, (n, 4))
    q1 = jnp.broadcast_to(qe, (n, 4))
    t0 = jnp.broadcast_to(tb, (n, 3))
    t1 = jnp.broadcast_to(te, (n, 3))
    qi, ti = s3.se3_interpolate(q0, t0, q1, t1, alphas)
    return s3.quat_rotate(qi, raw) + ti


def geometric_residuals(distance: IcpDistance, world, anchors, normals, lines,
                        cov_inv, weights):
    """Per-point residual rows [N, R] for the chosen ICP distance.

    world: [N, 3] transformed keypoints; anchors: [N, 3] reference points;
    normals/lines: [N, 3]; cov_inv: [N, 3, 3]; weights: [N].
    R = 3 for POINT_TO_POINT, else 1.
    """
    diff = world - anchors
    if distance == IcpDistance.POINT_TO_PLANE:
        # FunctorPointToPlane (cost_functions.h:32-67); the sign convention
        # (reference computes n.(q - Tp)) only flips the residual sign.
        r = jnp.sum(diff * normals, axis=-1)
        return (weights * r)[:, None]
    if distance == IcpDistance.POINT_TO_POINT:
        return weights[:, None] * diff
    if distance == IcpDistance.POINT_TO_LINE:
        d = lines / jnp.maximum(
            jnp.linalg.norm(lines, axis=-1, keepdims=True), 1e-12)
        c = jnp.cross(d, diff)
        r = jnp.sqrt(jnp.sum(c * c, axis=-1) + 1e-12)
        return (weights * r)[:, None]
    if distance == IcpDistance.POINT_TO_DISTRIBUTION:
        # FunctorPointToDistribution (cost_functions.h:141-183):
        # r = w * diff^T (cov + eps I)^-1 diff
        m = jnp.einsum("ni,nij,nj->n", diff, cov_inv, diff)
        return (weights * m)[:, None]
    raise ValueError(f"Unknown distance {distance}")


def geometric_residuals_and_grad(distance: IcpDistance, world, anchors,
                                 normals, lines, cov_inv, weights):
    """Residual rows [N, R] AND their gradient wrt the world point [N, R, 3].

    The world-point gradient is the cheap half of an analytic continuous-time
    Jacobian (reference DoRegisterGaussNewton, ct_icp.cpp:813-850): the chain
    through the pose perturbation is a cross product (see
    ct_jacobian_from_world_grad), so no autodiff through the per-point slerp
    is needed.
    """
    diff = world - anchors
    if distance == IcpDistance.POINT_TO_PLANE:
        r = jnp.sum(diff * normals, axis=-1)
        return (weights * r)[:, None], (weights[:, None] * normals)[:, None, :]
    if distance == IcpDistance.POINT_TO_POINT:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=world.dtype),
                               world.shape[:-1] + (3, 3))
        return weights[:, None] * diff, weights[:, None, None] * eye
    if distance == IcpDistance.POINT_TO_LINE:
        d = lines / jnp.maximum(
            jnp.linalg.norm(lines, axis=-1, keepdims=True), 1e-12)
        c = jnp.cross(d, diff)
        nc = jnp.sqrt(jnp.sum(c * c, axis=-1) + 1e-12)
        r = weights * nc
        # dr/dworld = (c/|c|)^T [d]x = -(d x c_hat)
        g = -jnp.cross(d, c / nc[:, None])
        return r[:, None], (weights[:, None] * g)[:, None, :]
    if distance == IcpDistance.POINT_TO_DISTRIBUTION:
        m = jnp.einsum("ni,nij,nj->n", diff, cov_inv, diff)
        g = 2.0 * jnp.einsum("nij,nj->ni", cov_inv, diff)
        return (weights * m)[:, None], (weights[:, None] * g)[:, None, :]
    raise ValueError(f"Unknown distance {distance}")


def ct_jacobian_from_world_grad(g, world, tb, te, alphas):
    """[N, R, 12] continuous-time Jacobian from world-point gradients.

    For the left-multiplicative so(3) x R^3 perturbation of apply_delta,
    to first order (small inter-pose rotation, the approximation the
    reference's GN path makes with its cross-product Jacobians,
    ct_icp.cpp:813-850):

        d world / d omega_b = -(1-a) [R p]x      d world / d tb = (1-a) I
        d world / d omega_e = -a     [R p]x      d world / d te = a     I

    so the rotation columns of each residual row are (1-a)/a times
    cross(R p, g) and the translation columns (1-a)/a times g, where
    R p = world - lerp(tb, te, a).
    """
    a = alphas[:, None, None]
    t_interp = ((1.0 - alphas[:, None]) * tb[None, :]
                + alphas[:, None] * te[None, :])
    v = world - t_interp                                  # [N, 3] = R p
    rot = jnp.cross(jnp.broadcast_to(v[:, None, :], g.shape), g)  # [N, R, 3]
    return jnp.concatenate([(1.0 - a) * rot, (1.0 - a) * g,
                            a * rot, a * g], axis=-1)


def motion_prior_residuals(qb, tb, qe, te, prior, num_residuals):
    """The PreviousFrameMotionModel constraint rows
    (reference src/ct_icp/motion_model.cpp:12-61):

      location consistency  sqrt(N*beta_loc) * (tb - prev_end_tr)        [3]
      orientation           sqrt(N*beta_or) * (1 - <qb, prev_end_q>^2)   [1]
      constant velocity     sqrt(N*beta_cv) * ((te-tb) - prev_velocity)  [3]
      small velocity        sqrt(N*beta_sv) * (tb - te)                  [3]

    ``prior`` is a dict with prev_end_quat, prev_end_tr, prev_velocity and the
    four betas (zero beta disables a term). Returns [10] residual vector.
    """
    n = jnp.maximum(num_residuals.astype(jnp.float32), 0.0)
    w_loc = jnp.sqrt(n * prior["beta_location_consistency"])
    w_or = jnp.sqrt(n * prior["beta_orientation_consistency"])
    w_cv = jnp.sqrt(n * prior["beta_constant_velocity"])
    w_sv = jnp.sqrt(n * prior["beta_small_velocity"])
    r_loc = w_loc * (tb - prior["prev_end_tr"])
    dotq = jnp.sum(s3.quat_normalize(qb) * prior["prev_end_quat"], axis=-1)
    r_or = (w_or * (1.0 - dotq * dotq))[None]
    r_cv = w_cv * ((te - tb) - prior["prev_velocity"])
    r_sv = w_sv * (tb - te)
    return jnp.concatenate([r_loc, r_or, r_cv, r_sv])


def prediction_consistency_residuals(qb, tb, qe, te, prior):
    """The PredictionConsistencyModel constraint rows (reference
    src/ct_icp/motion_model.cpp:188-283): location/orientation consistency
    of the begin and end poses against an external prediction, plus the
    4-row relative-pose functor (cost_functions.h:231-268) tying
    begin^-1 * end to the predicted relative transform.

    ``prior`` carries the predicted poses and the already-scaled weights
    (alpha / beta_scale, reference motion_model.cpp:196-280 — note these are
    NOT sqrt(N)-scaled, unlike the PreviousFrameMotionModel rows). A zero
    weight disables its rows. Returns a [12] residual vector.
    """
    qbn = s3.quat_normalize(qb)
    qen = s3.quat_normalize(qe)
    r_b_loc = prior["w_begin_tr"] * (tb - prior["pred_begin_tr"])
    dq_b = jnp.sum(qbn * prior["pred_begin_quat"], axis=-1)
    r_b_rot = (prior["w_begin_rot"] * (1.0 - dq_b * dq_b))[None]
    r_e_loc = prior["w_end_tr"] * (te - prior["pred_end_tr"])
    dq_e = jnp.sum(qen * prior["pred_end_quat"], axis=-1)
    r_e_rot = (prior["w_end_rot"] * (1.0 - dq_e * dq_e))[None]
    rq, rt = s3.se3_compose(*s3.se3_inverse(qbn, tb), qen, te)
    dq_r = jnp.sum(s3.quat_normalize(rq) * prior["pred_rel_quat"], axis=-1)
    r_r_rot = (prior["w_rel_rot"] * (1.0 - dq_r * dq_r))[None]
    r_r_tr = prior["w_rel_tr"] * (rt - prior["pred_rel_tr"])
    return jnp.concatenate([r_b_loc, r_b_rot, r_e_loc, r_e_rot,
                            r_r_rot, r_r_tr])
