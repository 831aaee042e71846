"""Sliding-window continuous-time bundle-adjustment backend.

The pose-graph/backend capability of the scale-out plan (SURVEY.md §7 step 9):
keep a window of recent keyframes (their keypoint batches stay resident on
device), periodically re-associate them against the current map and jointly
refine all begin/end poses with the distributed CT-BA step of
parallel/ct_ba.py (single-device locally; the same step shards over a mesh).

The front-end odometry stays untouched — the backend smooths the trajectory
estimate after the fact, like a classic SLAM local-BA thread.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.icp import residuals as res
from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops.neighborhood import description_from_moments
from ct_icp_tpu.parallel import ct_ba


def make_assemble_fn(level_index: int, nv: int, resolution: float,
                     min_neighbors: int = 10,
                     point_block_scale: float = 10.0,
                     prior_weight: float = 1.5,
                     max_dist_to_plane: float = 0.3):
    """Jitted associator: keyframe keypoints + map -> CTBAProblem arrays.

    Weighting model (tuned on the recovery harness in tests/test_ct_ba.py):

    * point rows carry a2D^2 geometric weights, rescaled per frame so the
      point block's Gauss-Newton strength (sum of squared weights) is
      ``point_block_scale``^2 — absolute continuity/prior weights then mean
      the same thing at any window/keypoint count. (The previous
      ``w / sqrt(sum w)`` normalization collapsed the whole point block to
      O(1) — the strength of a single continuity edge — and refinement
      degenerated into trajectory smoothing that measurably *hurt*.)
    * prior rows anchor each pose pair to its assembly-time estimate with
      ``prior_weight`` (~2 % of the point block): point-to-plane rows have
      a tangential null space, and without the anchor repeated refinement
      passes walk ~2-4 mm per pass along it.
    """

    @jax.jit
    def assemble(levels, raw, alphas, valid, qb, tb, qe, te, radius,
                 edge_alpha):
        # raw/alphas/valid: [F, K]; poses: [F, ...]
        f, k = raw.shape[0], raw.shape[1]

        def one(frame_raw, frame_alphas, frame_valid, fqb, ftb, fqe, fte):
            world = res.interp_world_points(fqb, ftb, fqe, fte, frame_raw,
                                            frame_alphas)
            count, sum_rel, sum_outer, closest, closest_dist = \
                vm.ball_search_moments(levels[level_index], world, frame_valid,
                                       radius, resolution, nv=nv)
            desc = description_from_moments(count, sum_rel, sum_outer, world)
            # outlier gating, like the front-end solver's (ct_icp.cpp:598
            # gates by max_dist_to_plane; solver.py applies the same bound
            # through ceres_path_weights): associations whose plane distance
            # is large are edge/corner mismatches whose wrong normals pull
            # the refinement systematically.
            d_plane = jnp.abs(jnp.sum((world - closest) * desc.normal,
                                      axis=-1))
            w = jnp.where(frame_valid & (count >= min_neighbors)
                          & (d_plane < max_dist_to_plane),
                          desc.a2D * desc.a2D, 0.0)
            w = w * (point_block_scale
                     / jnp.sqrt(jnp.maximum(jnp.sum(w * w), 1e-12)))
            return closest, desc.normal, w

        anchors, normals, weights = jax.vmap(one)(
            raw, alphas, valid, qb, tb, qe, te)
        return ct_ba.CTBAProblem(
            raw=raw, alphas=alphas, anchors=anchors,
            normals=normals, weights=weights,
            prior_quat_begin=qb, prior_tr_begin=tb,
            prior_quat_end=qe, prior_tr_end=te,
            prior_weight=jnp.full((f,), prior_weight, raw.dtype),
            edge_alpha=edge_alpha)

    return assemble


class CTBABackend:
    """Attachable sliding-window refinement for an Odometry instance."""

    def __init__(self, odometry, window: int = 8, period: int = 8,
                 num_steps: int = 2, mesh: Optional[Mesh] = None,
                 keep_first_frames: int = 2, replay: bool = False,
                 prior_weight: float = 1.5, continuity_beta: float = 2.0):
        self.odometry = odometry
        self.window = window
        self.period = period
        self.num_steps = num_steps
        self.keep_first = keep_first_frames
        # propagate refinements into the map (evict + re-insert retained
        # frames at their refined poses) — see Odometry.replay_refined_frames.
        # Default OFF: sound only for revisiting/static regimes (see
        # BackendOptions.replay for the traversal failure mode + numbers)
        self.replay = replay
        reg = odometry.registration
        self.assemble = make_assemble_fn(
            reg.level_index, reg.statics.voxel_neighborhood,
            reg.voxel_resolution, prior_weight=prior_weight)
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:1]), ("frames",))
        self.mesh = mesh
        self.step = ct_ba.make_ct_ba_step(mesh, num_inner_iters=2,
                                          beta=continuity_beta)
        self._keypoints: List[tuple] = []   # (fid, raw, alphas, valid)
        self._count = 0
        self.refinements = 0
        self.refine_ms: List[float] = []    # wall ms per refine() call
        # deferred-apply pipeline (replay off): refine() DISPATCHES the
        # assemble + CT-BA steps and stores the device result here; the
        # readback + trajectory write happen at the NEXT refine (or flush),
        # by which time the result is long computed. Reading back inside
        # refine() stalled the streaming pipeline on the in-flight megastep
        # plus 4 tunnel round trips — measured 340 ms/refine vs ~50 ms of
        # actual device work (tools/exp_backend_cost.py, round 5); the
        # trajectory is a post-hoc smoothing estimate, so applying a window
        # one period late changes no downstream computation (refinement
        # windows at period >= window are disjoint, and the front end never
        # reads refined poses). With replay on, the map must reflect the
        # refined poses immediately — that path stays synchronous.
        self._pending = None                # (packed_dev, fids, origin)
        self._pack = jax.jit(lambda s: jnp.concatenate(
            [s.quat_begin, s.tr_begin, s.quat_end, s.tr_end], axis=1))

        odometry.register_callback(
            type(odometry).FINISHED_REGISTRATION, self._on_finished)

    # ------------------------------------------------------------------ hooks —
    def _on_finished(self, odometry, summary, keypoints=None) -> bool:
        if summary is None or summary.keypoints is None:
            return True
        fid = len(odometry.trajectory) - 1
        raw, alphas, valid = summary.keypoints
        self._keypoints.append((fid, raw, alphas, valid))
        if len(self._keypoints) > self.window:
            self._keypoints.pop(0)
        self._count += 1
        if self._count % self.period == 0 and len(self._keypoints) >= 2:
            self.refine()
        return True

    # ------------------------------------------------------------- refinement —
    def refine(self):
        import time as _time
        t0 = _time.time()
        try:
            self._refine()
        finally:
            self.refine_ms.append((_time.time() - t0) * 1e3)

    def _apply_pending(self):
        """Read back + apply a deferred refinement (single packed readback:
        one tunnel round trip instead of four)."""
        if self._pending is None:
            return
        packed_dev, fids, origin = self._pending
        self._pending = None
        rows = np.asarray(packed_dev, np.float64)   # [F, 14]
        odo = self.odometry
        for i, f in enumerate(fids):
            fr = odo.trajectory[f]
            fr.begin_pose.quat = s3n.quat_normalize(rows[i, 0:4])
            fr.begin_pose.tr = rows[i, 4:7] + origin
            fr.end_pose.quat = s3n.quat_normalize(rows[i, 7:11])
            fr.end_pose.tr = rows[i, 11:14] + origin
        self.refinements += 1

    def flush(self):
        """Apply any deferred refinement (call before consuming the
        trajectory — Odometry.get_trajectory does)."""
        self._apply_pending()

    def _refine(self):
        self._apply_pending()
        odo = self.odometry
        kps = [kp for kp in self._keypoints
               if kp[0] >= self.keep_first]  # don't touch the anchor frames
        n_shards = self.mesh.shape["frames"]
        usable = (len(kps) // n_shards) * n_shards
        if usable < max(2, n_shards):
            return
        kps = kps[-usable:]
        fids = [kp[0] for kp in kps]
        raw = jnp.stack([kp[1] for kp in kps])
        alphas = jnp.stack([kp[2] for kp in kps])
        valid = jnp.stack([kp[3] for kp in kps])

        origin = odo.origin
        qb = jnp.asarray(np.stack(
            [s3n.quat_normalize(odo.trajectory[f].begin_pose.quat)
             for f in fids]), jnp.float32)
        tb = jnp.asarray(np.stack(
            [odo.trajectory[f].begin_pose.tr - origin for f in fids]),
            jnp.float32)
        qe = jnp.asarray(np.stack(
            [s3n.quat_normalize(odo.trajectory[f].end_pose.quat)
             for f in fids]), jnp.float32)
        te = jnp.asarray(np.stack(
            [odo.trajectory[f].end_pose.tr - origin for f in fids]),
            jnp.float32)

        radius = jnp.float32(odo.registration.search_radius)
        # edge_alpha: where frame f's interpolation reaches begin(f+1)'s
        # timestamp. Refined windows may have timestamp GAPS between
        # consecutive keyframes (scan covering part of the frame period, or
        # skipped insertions) — constraining end(f) directly to begin(f+1)
        # would pull poses together by the gap motion (see CTBAProblem).
        ea = np.ones(len(fids), np.float32)
        for i in range(len(fids) - 1):
            f0 = odo.trajectory[fids[i]]
            f1 = odo.trajectory[fids[i + 1]]
            dur = f0.end_pose.timestamp - f0.begin_pose.timestamp
            if dur > 0:
                ea[i] = (f1.begin_pose.timestamp
                         - f0.begin_pose.timestamp) / dur
        problem = self.assemble(odo.map_state.levels, raw, alphas, valid,
                                qb, tb, qe, te, radius, jnp.asarray(ea))
        state = ct_ba.CTBAState(qb, tb, qe, te)
        state, problem = ct_ba.shard_problem(self.mesh, state, problem)
        for _ in range(self.num_steps):
            state, cost = self.step(state, problem)

        if not self.replay:
            # deferred apply (see __init__): store the device result, read
            # it back at the next refine/flush — no pipeline stall
            self._pending = (self._pack(state), fids, origin)
            return

        nqb = np.asarray(state.quat_begin, np.float64)
        ntb = np.asarray(state.tr_begin, np.float64)
        nqe = np.asarray(state.quat_end, np.float64)
        nte = np.asarray(state.tr_end, np.float64)
        for i, f in enumerate(fids):
            fr = odo.trajectory[f]
            fr.begin_pose.quat = s3n.quat_normalize(nqb[i])
            fr.begin_pose.tr = ntb[i] + origin
            fr.end_pose.quat = s3n.quat_normalize(nqe[i])
            fr.end_pose.tr = nte[i] + origin
        self.refinements += 1
        # the map must reflect the refined poses, or the next inserts
        # (registered against stale world points) wash the refinement out
        odo.replay_refined_frames([odo.trajectory[f] for f in fids])
