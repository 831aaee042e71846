"""Distributed continuous-time bundle adjustment over a TPU mesh.

The scale-out capability the CPU reference does not have (SURVEY.md §2.4 P5,
BASELINE.json north star): refine a window of keyframe trajectories jointly
against map correspondences, with the keyframe axis sharded across devices.

Problem: per keyframe f, the 12-DoF continuous-time state (begin, end pose);
residuals
  * point-to-plane terms: every point of keyframe f touches ONLY f's pose pair
    (the per-point alpha-timestamp structure survives sharding, SURVEY.md §5),
  * continuity terms between consecutive keyframes: end(f) ~ begin(f+1)
    (position+orientation), coupling only neighbors.

Parallel decomposition (shard_map over mesh axis "frames"):
  * per-frame Jacobian blocks + gradients are embarrassingly parallel,
  * continuity terms at shard boundaries use a ppermute halo exchange of the
    neighbor keyframe's boundary pose,
  * the solve is damped block-Jacobi (one 12x12 solve per keyframe, coupling
    terms evaluated at the current neighbor estimate) — a fixed number of
    outer iterations, each one a pure SPMD step with only O(1)-sized
    collectives (halo + psum of the scalar cost).

All shapes static: [F, K, 3] points with masks; F divides the mesh axis.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ct_icp_tpu.core import se3 as s3
from ct_icp_tpu.icp import residuals as res


class CTBAProblem(NamedTuple):
    """Fixed associations for one refinement pass (frames axis shardable).

    The prior_* block anchors each pose to a reference value (normally the
    estimate at assembly time) with weight ``prior_weight`` — point-to-plane
    rows have a tangential null space per surface, and repeated refinement
    passes drift along it without this anchor (measured ~2-4 mm per pass on
    the backend's recovery harness). Set prior_weight to 0 to disable.
    """

    raw: jnp.ndarray        # [F, K, 3] sensor-frame points
    alphas: jnp.ndarray     # [F, K]
    anchors: jnp.ndarray    # [F, K, 3] map anchor points
    normals: jnp.ndarray    # [F, K, 3]
    weights: jnp.ndarray    # [F, K] (0 disables a residual)
    prior_quat_begin: jnp.ndarray  # [F, 4]
    prior_tr_begin: jnp.ndarray    # [F, 3]
    prior_quat_end: jnp.ndarray    # [F, 4]
    prior_tr_end: jnp.ndarray      # [F, 3]
    prior_weight: jnp.ndarray      # [F]
    # interpolation parameter at which frame f's continuous pose reaches
    # begin(f+1)'s TIMESTAMP: (t0[f+1] - t0[f]) / (t1[f] - t0[f]). 1.0 when
    # frames are contiguous (end(f) == begin(f+1)); > 1 extrapolates across
    # inter-frame gaps. Without this, trajectories whose frames don't abut
    # in time (e.g. scans covering only part of the rotation period) get
    # pulled together by ~the gap motion per pass — measured 5 cm/pass on
    # the backend recovery harness before the fix.
    edge_alpha: jnp.ndarray        # [F]


class CTBAState(NamedTuple):
    quat_begin: jnp.ndarray  # [F, 4]
    tr_begin: jnp.ndarray    # [F, 3]
    quat_end: jnp.ndarray    # [F, 4]
    tr_end: jnp.ndarray      # [F, 3]


def _frame_residuals(delta, qb, tb, qe, te, raw, alphas, anchors, normals,
                     weights):
    """Point-to-plane residual vector [K] of one keyframe under a 12-DoF
    perturbation."""
    qb2, tb2, qe2, te2 = res.apply_delta(delta, qb, tb, qe, te)
    world = res.interp_world_points(qb2, tb2, qe2, te2, raw, alphas)
    r = jnp.sum((world - anchors) * normals, axis=-1)
    return weights * r


def _prior_residuals(delta, qb, tb, qe, te, pqb, ptb, pqe, pte, w):
    """Anchor rows [8] of one keyframe to its prior pose pair: position
    difference + quaternion-dot rotation distance, both begin and end."""
    qb2, tb2, qe2, te2 = res.apply_delta(delta, qb, tb, qe, te)
    db = jnp.sum(s3.quat_normalize(qb2) * pqb, axis=-1)
    de = jnp.sum(s3.quat_normalize(qe2) * pqe, axis=-1)
    return jnp.concatenate([
        w * (tb2 - ptb), (w * (1.0 - db * db))[None],
        w * (te2 - pte), (w * (1.0 - de * de))[None]])


def _pose_at(qb, tb, qe, te, alpha):
    """Continuous pose of a keyframe at interpolation parameter ``alpha``
    (slerp+lerp; alpha > 1 extrapolates past the end pose)."""
    return s3.se3_interpolate(s3.quat_normalize(qb), tb,
                              s3.quat_normalize(qe), te, alpha)


def _continuity_residuals(delta, qb, tb, qe, te, q_prev_ext, t_prev_ext,
                          q_next_begin, t_next_begin, w_prev, w_next, beta,
                          edge_alpha):
    """Continuity rows of one keyframe against its (fixed) neighbors:
    begin(f) ~ pose_{f-1}(edge_alpha_{f-1}) (the neighbor's extrapolation to
    begin(f)'s timestamp, halo-passed as a constant) and
    pose_f(edge_alpha_f) ~ begin(f+1); position + quaternion dot."""
    qb2, tb2, qe2, te2 = res.apply_delta(delta, qb, tb, qe, te)
    r_pos_prev = beta * w_prev * (tb2 - t_prev_ext)
    dq_prev = jnp.sum(s3.quat_normalize(qb2) * q_prev_ext, axis=-1)
    r_rot_prev = (beta * w_prev * (1.0 - dq_prev * dq_prev))[None]
    qx, tx = _pose_at(qb2, tb2, qe2, te2, edge_alpha)
    r_pos_next = beta * w_next * (tx - t_next_begin)
    dq_next = jnp.sum(s3.quat_normalize(qx) * q_next_begin, axis=-1)
    r_rot_next = (beta * w_next * (1.0 - dq_next * dq_next))[None]
    return jnp.concatenate([r_pos_prev, r_rot_prev, r_pos_next, r_rot_next])


def _frame_gn_update(qb, tb, qe, te, raw, alphas, anchors, normals, weights,
                     pqb, ptb, pqe, pte, pw, edge_alpha,
                     q_prev_ext, t_prev_ext, q_next_begin, t_next_begin,
                     w_prev, w_next, beta, damping):
    """One damped block-GN update for a single keyframe."""
    zero = jnp.zeros((12,), raw.dtype)

    def rfun(d):
        rp = _frame_residuals(d, qb, tb, qe, te, raw, alphas, anchors,
                              normals, weights)
        rc = _continuity_residuals(d, qb, tb, qe, te, q_prev_ext, t_prev_ext,
                                   q_next_begin, t_next_begin, w_prev, w_next,
                                   beta, edge_alpha)
        ra = _prior_residuals(d, qb, tb, qe, te, pqb, ptb, pqe, pte, pw)
        return jnp.concatenate([rp, rc, ra])

    r0 = rfun(zero)
    jac = jax.jacfwd(rfun)(zero)
    jtj = jac.T @ jac
    jtr = jac.T @ r0
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(jtj), 1e-12))
    a = jtj / (d[:, None] * d[None, :]) + damping * jnp.eye(12, dtype=raw.dtype)
    delta = jnp.linalg.solve(a, -jtr / d) / d
    nqb, ntb, nqe, nte = res.apply_delta(delta, qb, tb, qe, te)
    # every interior edge's rows appear in BOTH adjacent frames' rc (as
    # prev for one, next for the other); halve them so the reported cost
    # counts each edge once and is comparable with the PCG solver's.
    # Prior rows (the trailing 8) are per-frame — counted once.
    k = raw.shape[0]
    cost = (jnp.sum(r0[:k] * r0[:k])
            + 0.5 * jnp.sum(r0[k:k + 8] * r0[k:k + 8])
            + jnp.sum(r0[k + 8:] * r0[k + 8:]))
    return nqb, ntb, nqe, nte, cost


def _edge_residuals(d_self, d_next, qb, tb, qe, te, edge_alpha,
                    qb_n, tb_n, w, beta):
    """Continuity rows of ONE trajectory edge
    pose_f(edge_alpha_f) ~ begin(f+1), as a function of BOTH frames'
    perturbations (the coupled-solver form; the block-Jacobi path
    evaluates neighbors as constants instead)."""
    qb2, tb2, qe2, te2 = res.apply_delta(d_self, qb, tb, qe, te)
    qx, tx = _pose_at(qb2, tb2, qe2, te2, edge_alpha)
    qn2, tn2, _, _ = res.apply_delta(d_next, qb_n, tb_n, qb_n, tb_n)
    r_pos = beta * w * (tx - tn2)
    dq = jnp.sum(s3.quat_normalize(qx) * s3.quat_normalize(qn2), axis=-1)
    r_rot = (beta * w * (1.0 - dq * dq))[None]
    return jnp.concatenate([r_pos, r_rot])


def _frame_blocks(qb, tb, qe, te, raw, alphas, anchors, normals, weights,
                  pqb, ptb, pqe, pte, pw, edge_alpha,
                  qb_n, tb_n, w_edge, beta):
    """Per-frame GN blocks for the coupled (block-tridiagonal) system.

    Returns (hp [12,12] point+prior Hessian, gp [12] point+prior gradient,
    ce [4] edge residual, a [4,12] edge Jacobian wrt this frame,
    b [4,12] edge Jacobian wrt the next frame, cost scalar)."""
    zero = jnp.zeros((12,), raw.dtype)

    def rfun(d):
        rp = _frame_residuals(d, qb, tb, qe, te, raw, alphas, anchors,
                              normals, weights)
        ra = _prior_residuals(d, qb, tb, qe, te, pqb, ptb, pqe, pte, pw)
        return jnp.concatenate([rp, ra])

    def efun(d_self, d_next):
        return _edge_residuals(d_self, d_next, qb, tb, qe, te, edge_alpha,
                               qb_n, tb_n, w_edge, beta)

    rp = rfun(zero)
    jp = jax.jacfwd(rfun)(zero)                     # [K, 12]
    ce = efun(zero, zero)                           # [4]
    a = jax.jacfwd(efun, argnums=0)(zero, zero)     # [4, 12]
    b = jax.jacfwd(efun, argnums=1)(zero, zero)     # [4, 12]
    hp = jp.T @ jp
    gp = jp.T @ rp
    cost = jnp.sum(rp * rp) + jnp.sum(ce * ce)
    return hp, gp, ce, a, b, cost


def make_ct_ba_step(mesh: Mesh, axis_name: str = "frames",
                    num_inner_iters: int = 2, beta: float = 1.0,
                    damping: float = 1e-3, solver: str = "jacobi",
                    num_cg_iters: int = 16):
    """Build the SPMD CT-BA step over ``mesh``.

    Returns step(state, problem) -> (state, total_cost); both state and
    problem are sharded over the keyframe axis.

    ``solver``:
      * "jacobi" — damped block-Jacobi GN: each keyframe solves its own
        12x12 system with neighbor poses held fixed (halo-exchanged).
        Cheapest per iteration; coupling information moves one keyframe
        per iteration.
      * "pcg" — the TRUE coupled GN step: the block-tridiagonal normal
        equations over all keyframes are solved by preconditioned
        conjugate gradients. The matvec is pure SPMD — local block
        products plus one ppermute halo in each direction — and the CG
        dot products are psums, so per CG iteration the communication is
        O(12) floats per shard boundary regardless of window size.
        Block-diagonal (12x12) preconditioning.
    """

    nshards = mesh.shape[axis_name]
    fwd = [(i, (i + 1) % nshards) for i in range(nshards)]
    bwd = [((i + 1) % nshards, i) for i in range(nshards)]

    def local_step(state: CTBAState, problem: CTBAProblem):
        qb, tb, qe, te = state

        def one_iter(_, carry):
            qb, tb, qe, te, _ = carry
            # halo exchange: previous frame's end pose, next frame's begin pose

            # each frame's pose extrapolated to its successor's begin
            # timestamp — the value the successor's prev-row compares against
            ext_q, ext_t = jax.vmap(_pose_at)(qb, tb, qe, te,
                                              problem.edge_alpha)

            # within-shard neighbors + cross-shard boundary via ppermute
            last_qe = jax.lax.ppermute(ext_q[-1], axis_name, fwd)
            last_te = jax.lax.ppermute(ext_t[-1], axis_name, fwd)
            first_qb = jax.lax.ppermute(qb[0], axis_name, bwd)
            first_tb = jax.lax.ppermute(tb[0], axis_name, bwd)

            q_prev_ext = jnp.concatenate([last_qe[None], ext_q[:-1]], axis=0)
            t_prev_ext = jnp.concatenate([last_te[None], ext_t[:-1]], axis=0)
            q_next_begin = jnp.concatenate([qb[1:], first_qb[None]], axis=0)
            t_next_begin = jnp.concatenate([tb[1:], first_tb[None]], axis=0)

            f = qb.shape[0]
            shard_id = jax.lax.axis_index(axis_name)
            is_first = shard_id == 0
            is_last = shard_id == nshards - 1
            idx = jnp.arange(f)
            # no continuity before the global first / after the global last;
            # the global first keyframe is gauge-fixed by a strong prior to
            # its current value (w_prev acts as that anchor weight)
            w_prev = jnp.where((idx == 0) & is_first, 0.0, 1.0)
            w_next = jnp.where((idx == f - 1) & is_last, 0.0, 1.0)

            upd = jax.vmap(
                functools.partial(_frame_gn_update, beta=beta, damping=damping))
            nqb, ntb, nqe, nte, costs = upd(
                qb, tb, qe, te, problem.raw, problem.alphas, problem.anchors,
                problem.normals, problem.weights,
                problem.prior_quat_begin, problem.prior_tr_begin,
                problem.prior_quat_end, problem.prior_tr_end,
                problem.prior_weight, problem.edge_alpha,
                q_prev_ext, t_prev_ext,
                q_next_begin, t_next_begin, w_prev, w_next)
            total = jax.lax.psum(jnp.sum(costs), axis_name)
            return nqb, ntb, nqe, nte, total

        qb, tb, qe, te, cost = jax.lax.fori_loop(
            0, num_inner_iters, one_iter,
            (qb, tb, qe, te, jnp.asarray(0.0, qb.dtype)))
        return CTBAState(qb, tb, qe, te), cost

    def local_step_pcg(state: CTBAState, problem: CTBAProblem):
        qb, tb, qe, te = state
        f = qb.shape[0]
        shard_id = jax.lax.axis_index(axis_name)
        is_last = shard_id == nshards - 1
        idx = jnp.arange(f)
        # one edge per keyframe toward its successor; no edge after the
        # global last keyframe
        w_edge = jnp.where((idx == f - 1) & is_last, 0.0, 1.0)

        def shift_fwd(x):
            """x_f -> value that frame f+1 sees from frame f (row-wise);
            cross-shard boundary via ppermute (the wrap into global frame 0
            always carries a zero — the global-last edge has weight 0)."""
            from_prev = jax.lax.ppermute(x[-1], axis_name, fwd)
            return jnp.concatenate([from_prev[None], x[:-1]], axis=0)

        def shift_bwd(x):
            """x_f -> x_{f+1} aligned at frame f."""
            from_next = jax.lax.ppermute(x[0], axis_name, bwd)
            return jnp.concatenate([x[1:], from_next[None]], axis=0)

        def one_outer(_, carry):
            qb, tb, qe, te, _ = carry
            qb_n = shift_bwd(qb)
            tb_n = shift_bwd(tb)

            hp, gp, ce, a, b_, costs = jax.vmap(
                functools.partial(_frame_blocks, beta=beta))(
                qb, tb, qe, te, problem.raw, problem.alphas, problem.anchors,
                problem.normals, problem.weights,
                problem.prior_quat_begin, problem.prior_tr_begin,
                problem.prior_quat_end, problem.prior_tr_end,
                problem.prior_weight, problem.edge_alpha, qb_n, tb_n, w_edge)
            total = jax.lax.psum(jnp.sum(costs), axis_name)

            # block-tridiagonal assembly:
            #   H_ff = hp + a^T a + (b^T b of the INCOMING edge f-1)
            #   U_f  = a_f^T b_f   (couples f with f+1)
            #   g_f  = gp + a^T ce + (b^T ce of the incoming edge)
            ata = jnp.einsum("fri,frj->fij", a, a)
            btb = jnp.einsum("fri,frj->fij", b_, b_)
            u = jnp.einsum("fri,frj->fij", a, b_)
            g = gp + jnp.einsum("fri,fr->fi", a, ce)
            g = g + shift_fwd(jnp.einsum("fri,fr->fi", b_, ce))
            h = hp + ata + shift_fwd(btb)
            diag = jnp.diagonal(h, axis1=-2, axis2=-1)
            lm = damping * jnp.maximum(diag, 1e-8) + 1e-8
            h = h + jax.vmap(jnp.diag)(lm)

            # block-diagonal preconditioner
            hinv = jnp.linalg.inv(h)

            def minv(v):
                return jnp.einsum("fij,fj->fi", hinv, v)

            def matvec(x):
                y = jnp.einsum("fij,fj->fi", h, x)
                y = y + jnp.einsum("fij,fj->fi", u, shift_bwd(x))
                y = y + shift_fwd(jnp.einsum("fji,fj->fi", u, x))
                return y

            def pdot(p, q):
                return jax.lax.psum(jnp.sum(p * q), axis_name)

            # PCG on H x = -g
            x0 = jnp.zeros_like(g)
            r0 = -g
            z0 = minv(r0)
            rs0 = pdot(r0, z0)

            def cg_body(_, c):
                x, r, z, p, rs = c
                hp_v = matvec(p)
                alpha = rs / jnp.maximum(pdot(p, hp_v), 1e-20)
                x = x + alpha * p
                r = r - alpha * hp_v
                z = minv(r)
                rs_new = pdot(r, z)
                p = z + (rs_new / jnp.maximum(rs, 1e-20)) * p
                return x, r, z, p, rs_new

            x, _, _, _, _ = jax.lax.fori_loop(
                0, num_cg_iters, cg_body, (x0, r0, z0, z0, rs0))

            nqb, ntb, nqe, nte = jax.vmap(res.apply_delta)(x, qb, tb, qe, te)
            return nqb, ntb, nqe, nte, total

        qb, tb, qe, te, cost = jax.lax.fori_loop(
            0, num_inner_iters, one_outer,
            (qb, tb, qe, te, jnp.asarray(0.0, qb.dtype)))
        return CTBAState(qb, tb, qe, te), cost

    spec_state = CTBAState(P(axis_name), P(axis_name), P(axis_name),
                           P(axis_name))
    spec_problem = CTBAProblem(*([P(axis_name)] * len(CTBAProblem._fields)))
    if solver not in ("jacobi", "pcg"):
        raise ValueError(f"unknown CT-BA solver {solver!r}")
    body = local_step if solver == "jacobi" else local_step_pcg
    step = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_state, spec_problem),
        out_specs=(spec_state, P())))
    return step


def shard_problem(mesh: Mesh, state: CTBAState, problem: CTBAProblem,
                  axis_name: str = "frames"):
    """Device_put state/problem with the keyframe axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis_name))
    state = CTBAState(*(jax.device_put(x, sh) for x in state))
    problem = CTBAProblem(*(jax.device_put(x, sh) for x in problem))
    return state, problem


def build_synthetic_problem(rng, num_frames: int, num_points: int,
                            noise: float = 0.01):
    """A synthetic CT-BA problem for tests/dry runs: random plane anchors,
    ground-truth smooth trajectory, initial state perturbed."""
    import numpy as np
    from ct_icp_tpu.core import se3_np as s3n

    t = np.linspace(0, 1, num_frames + 1)
    gt_tr = np.stack([5 * t, 2 * np.sin(t * 2), 0.1 * t], axis=-1)
    yaw = 0.3 * t
    gt_q = s3n.quat_from_rotvec(
        np.stack([np.zeros_like(yaw), np.zeros_like(yaw), yaw], -1))

    raw = rng.uniform(-10, 10, (num_frames, num_points, 3))
    alphas = rng.uniform(0, 1, (num_frames, num_points))
    normals = rng.normal(size=(num_frames, num_points, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    # world point under GT interpolated pose -> anchor on the residual plane
    anchors = np.zeros_like(raw)
    for f in range(num_frames):
        q0 = np.broadcast_to(gt_q[f], (num_points, 4))
        q1 = np.broadcast_to(gt_q[f + 1], (num_points, 4))
        t0 = np.broadcast_to(gt_tr[f], (num_points, 3))
        t1 = np.broadcast_to(gt_tr[f + 1], (num_points, 3))
        qi, ti = s3n.se3_interpolate(q0, t0, q1, t1, alphas[f])
        anchors[f] = s3n.quat_rotate(qi, raw[f]) + ti

    state = CTBAState(
        quat_begin=jnp.asarray(np.stack(
            [s3n.quat_mul(s3n.quat_from_rotvec(
                rng.normal(scale=noise, size=3)), gt_q[f])
             for f in range(num_frames)]), jnp.float32),
        tr_begin=jnp.asarray(
            gt_tr[:-1] + rng.normal(scale=noise, size=(num_frames, 3)),
            jnp.float32),
        quat_end=jnp.asarray(np.stack(
            [s3n.quat_mul(s3n.quat_from_rotvec(
                rng.normal(scale=noise, size=3)), gt_q[f + 1])
             for f in range(num_frames)]), jnp.float32),
        tr_end=jnp.asarray(
            gt_tr[1:] + rng.normal(scale=noise, size=(num_frames, 3)),
            jnp.float32),
    )
    problem = CTBAProblem(
        raw=jnp.asarray(raw, jnp.float32),
        alphas=jnp.asarray(alphas, jnp.float32),
        anchors=jnp.asarray(anchors, jnp.float32),
        normals=jnp.asarray(normals, jnp.float32),
        weights=jnp.ones((num_frames, num_points), jnp.float32),
        # priors disabled (weight 0): the synthetic tests grade pure
        # convergence to GT from a perturbed init
        prior_quat_begin=state.quat_begin,
        prior_tr_begin=state.tr_begin,
        prior_quat_end=state.quat_end,
        prior_tr_end=state.tr_end,
        prior_weight=jnp.zeros((num_frames,), jnp.float32),
        # the synthetic model is contiguous: end(f) IS begin(f+1)'s pose
        edge_alpha=jnp.ones((num_frames,), jnp.float32),
    )
    gt = (jnp.asarray(gt_q, jnp.float32), jnp.asarray(gt_tr, jnp.float32))
    return state, problem, gt
