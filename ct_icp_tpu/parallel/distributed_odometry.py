"""End-to-end odometry against a MESH-SHARDED voxel map.

The scale-out capability SURVEY.md §7 step 9 asks for: the persistent map's
voxel blocks are partitioned across devices (owner-hash, see sharded_map.py)
so city-scale maps exceed one chip's HBM, and BOTH halves of the per-frame
hot path run distributed:

  * CT-ICP registration: keypoints are replicated; each ICP iteration's
    neighborhood stage computes LOCAL moment sums over the shard's candidate
    voxels and combines them with one psum over the mesh axis — exactly the
    single-chip ball-neighborhood descriptors (ops/neighborhood.
    description_from_moments), with only O(K) floats crossing the ICI per
    iteration (never point data). The 12-DoF LM solve then runs replicated
    on every device (identical inputs -> identical results, no divergence).
  * map update: every shard prunes + inserts the points it owns
    (embarrassingly parallel, no collectives beyond the inserted-count psum).

The host loop (DistributedOdometry) mirrors the single-chip Odometry's
motion initialization / trajectory bookkeeping (float64), and the robust
escalation regimen works unchanged: escalation only rewrites the dynamic
scalar vector, so attempts re-invoke the same compiled program.

Single-chip reference behavior: icp/solver.py (CERES path semantics,
reference src/ct_icp/ct_icp.cpp:460-706) and odometry/odometry.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ct_icp_tpu.config.options import OdometryOptions
from ct_icp_tpu.core import se3 as s3
from ct_icp_tpu.core import se3_np as s3n
from ct_icp_tpu.core.pose import Pose, TrajectoryFrame
from ct_icp_tpu.icp import residuals as res
from ct_icp_tpu.icp import solver as slv
from ct_icp_tpu.icp.registration import make_prior
from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops import sampling as smp
from ct_icp_tpu.parallel import sharded_map as sm


def make_distributed_register_fn(mesh: Mesh, statics: slv.SolverStatics,
                                 resolutions, axis_name: str = "map"):
    """Sharded CT-ICP: the neighborhood stage psums moment sums per
    iteration; everything else is replicated math.

    Returns a jitted fn
      (levels_sharded, raw [K,3], alphas [K], valid [K],
       qb, tb, qe, te, prior [14], dyn [D]) -> packed result [16]
    with packed = [qb(4), tb(3), qe(4), te(3), n_res, converged].
    """
    resolution = resolutions[statics.level_index]
    nv = statics.voxel_neighborhood

    def local_register(levels, raw, alphas, valid, qb, tb, qe, te,
                       prior_packed, dyn_packed):
        dyn = slv.unpack_dynamics(dyn_packed)
        prior = slv.unpack_prior(prior_packed)
        qb = s3.quat_normalize(qb)
        qe = s3.quat_normalize(qe)
        level = jax.tree_util.tree_map(lambda x: x[0],
                                       levels[statics.level_index])

        def cond(carry):
            it, converged = carry[0], carry[6]
            return (it < dyn.num_iters_icp) & ~converged

        def body(carry):
            it, cqb, ctb, cqe, cte, _, _, _ = carry
            world = res.interp_world_points(cqb, ctb, cqe, cte, raw, alphas)
            count, sum_rel, sum_outer, closest, cdist = vm.ball_search_moments(
                level, world, valid, dyn.search_radius,
                jnp.float32(resolution), nv=nv)
            # one psum per iteration combines the shards' moments EXACTLY
            count = jax.lax.psum(count, axis_name)
            sum_rel = jax.lax.psum(sum_rel, axis_name)
            sum_outer = jax.lax.psum(sum_outer, axis_name)
            best = jax.lax.pmin(cdist, axis_name)
            is_best = cdist <= best + 1e-12
            closest = jax.lax.psum(
                jnp.where(is_best[:, None], closest, 0.0), axis_name)
            n_best = jax.lax.psum(is_best.astype(world.dtype), axis_name)
            closest = closest / jnp.maximum(n_best[:, None], 1.0)

            from ct_icp_tpu.ops.neighborhood import description_from_moments
            desc = description_from_moments(count, sum_rel, sum_outer, world)
            ok = valid & (count >= dyn.min_number_neighbors)
            cdist_f = jnp.where(jnp.isfinite(best), best, 0.0)
            geom_w = res.ceres_path_weights(
                desc.a2D, cdist_f, dyn.power_planarity, dyn.weight_alpha,
                dyn.weight_neighborhood, dyn.max_dist_to_plane,
                jnp.maximum(dyn.min_number_neighbors.astype(jnp.float32),
                            1.0))
            nqb, ntb, nqe, nte, cost, n_res = slv._lm_inner_loop(
                statics, dyn, raw, alphas, closest, desc.normal, desc.line,
                None, geom_w, ok, None, cqb, ctb, cqe, cte, prior)
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
            return (it + 1, nqb, ntb, nqe, nte, cost, converged | ~enough,
                    n_res)

        init = (jnp.int32(0), qb, tb, qe, te,
                jnp.asarray(jnp.inf, raw.dtype), jnp.asarray(False),
                jnp.int32(0))
        it, fqb, ftb, fqe, fte, _, converged, n_res = jax.lax.while_loop(
            cond, body, init)
        f32 = lambda v: jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.concatenate([
            s3.quat_normalize(fqb), ftb, s3.quat_normalize(fqe), fte,
            f32(n_res), f32(converged)])

    level_specs = tuple(vm.MapLevel(*(P(axis_name),) * 7) for _ in resolutions)
    fn = jax.jit(jax.shard_map(
        local_register, mesh=mesh,
        in_specs=(level_specs, P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P()))
    return fn


class DistributedOdometry:
    """Per-frame odometry whose map lives sharded across a device mesh.

    API mirrors the single-chip Odometry for the core loop:
      register_frame(xyz, timestamps) -> TrajectoryFrame (estimated poses).
    Kept deliberately lean (no robust regimen / streaming here — those are
    host-side policies identical to odometry.py; this class demonstrates and
    tests the distributed compute path).
    """

    def __init__(self, mesh: Mesh, options: OdometryOptions,
                 axis_name: str = "map", map_update: str = "broadcast"):
        """``map_update`` selects the distributed insert variant:

        * ``"broadcast"`` (default): the full scan is replicated to every
          shard, which masks by voxel ownership — ICI-cheap, but the
          claim/election compute is O(scan) per shard, so insert wall time
          is mesh-size-invariant.
        * ``"partitioned"``: the scan is split 1/N per shard, voxel
          ownership is exchanged with one ``lax.all_to_all`` per level, and
          each shard's claim/election runs on O(scan/N) points — the
          throughput-scaling variant for when insert sits on the critical
          path (docs/SCALING.md). Overflowed points (beyond the fixed
          all_to_all send capacity) are dropped and counted in
          ``self.dropped_points``; slack=2 makes this vanishingly rare for
          hash-uniform voxel owners.

        Both variants produce the same map content (each shard inserts
        exactly the points it owns, in global scan order) — pinned by
        tests/test_sharded_map.py and the shard-invariance check in
        tests/test_distributed_odometry.py.
        """
        self.mesh = mesh
        self.axis_name = axis_name
        self.options = options
        self.map_options = options.map_options
        self.map_state = sm.make_sharded_map(mesh, self.map_options,
                                             axis_name)
        if map_update not in ("broadcast", "partitioned"):
            raise ValueError(f"unknown map_update {map_update!r} "
                             "(want 'broadcast' or 'partitioned')")
        self.map_update = map_update
        self.dropped_points = 0
        if map_update == "partitioned":
            self.update = sm.make_partitioned_update_fn(
                mesh, self.map_options, options.max_dirty_voxels, axis_name)
        else:
            self.update = sm.make_sharded_update_fn(
                mesh, self.map_options, options.max_dirty_voxels, axis_name)
        level_idx, nv = self.map_options.search_params(
            self.map_options.default_radius)
        self.statics = slv.SolverStatics(
            num_keypoints=options.max_keypoints,
            max_neighbors=options.ct_icp_options.max_number_neighbors,
            level_index=level_idx, voxel_neighborhood=nv,
            distance=options.ct_icp_options.distance,
            loss=options.ct_icp_options.loss_function,
            solver=options.ct_icp_options.solver,
            parametrization=options.ct_icp_options.parametrization)
        resolutions = tuple(r.resolution
                            for r in self.map_options.resolutions)
        self.register_fn = make_distributed_register_fn(
            mesh, self.statics, resolutions, axis_name)
        self.search_radius = self.map_options.default_radius
        self.voxel_resolution = resolutions[level_idx]
        self.trajectory: List[TrajectoryFrame] = []
        self.registered = 0

    def _motion_init(self, begin_ts, end_ts) -> TrajectoryFrame:
        k = self.registered
        frame = TrajectoryFrame(Pose(timestamp=begin_ts, frame_id=k),
                                Pose(timestamp=end_ts, frame_id=k))
        if k >= 1:
            prev = self.trajectory[k - 1]
            frame.begin_pose.quat = prev.end_pose.quat.copy()
            frame.begin_pose.tr = prev.end_pose.tr.copy()
            if k >= 2:
                prev2 = self.trajectory[k - 2]
                rel = prev2.end_pose.inverse() * prev.end_pose
                ext = prev.end_pose * rel
                frame.end_pose.quat = ext.quat
                frame.end_pose.tr = ext.tr
            else:
                frame.end_pose.quat = prev.end_pose.quat.copy()
                frame.end_pose.tr = prev.end_pose.tr.copy()
        return frame

    def register_frame(self, xyz: np.ndarray, timestamps: np.ndarray
                       ) -> TrajectoryFrame:
        from ct_icp_tpu.odometry.odometry import _sanitize_scan
        xyz, timestamps = _sanitize_scan(xyz, timestamps)
        o = self.options
        k = self.registered
        frame = self._motion_init(float(timestamps.min()),
                                  float(timestamps.max()))
        span = frame.end_pose.timestamp - frame.begin_pose.timestamp
        alphas = ((timestamps - frame.begin_pose.timestamp)
                  / (span if span > 0 else 1.0)).astype(np.float32)
        raw = jnp.asarray(xyz, jnp.float32)
        al = jnp.asarray(np.clip(alphas, 0.0, 1.0))
        valid = jnp.ones(raw.shape[0], bool)

        # voxel subsample + keypoints (replicated host->device path); the
        # init regimen uses the finer startup voxel sizes
        # (reference odometry.cpp:339, 560-565)
        startup = k < o.init_num_frames
        vsz = o.init_voxel_size if startup else o.voxel_size
        ssz = o.init_sample_voxel_size if startup else o.sample_voxel_size
        idx, ok, _ = smp.voxel_subsample_indices(
            raw, valid, jnp.float32(vsz), o.max_subsampled_points)
        sub_raw, sub_al, sub_ok = raw[idx], al[idx], ok
        kidx, kok, _ = smp.voxel_subsample_indices(
            sub_raw, sub_ok, jnp.float32(ssz), o.max_keypoints)
        kp_raw, kp_al, kp_ok = sub_raw[kidx], sub_al[kidx], kok

        if k > 0:
            prior = make_prior(self.trajectory[k - 1],
                               o.default_motion_model, np.zeros(3))
            opts = o.ct_icp_options
            if k < o.init_num_frames:
                # init regimen (reference odometry.cpp:560-565)
                opts = dataclasses.replace(
                    opts, threshold_voxel_occupancy=1,
                    num_iters_icp=max(opts.num_iters_icp, 15))
            dyn = slv.pack_dynamics(opts, self.search_radius,
                                    self.voxel_resolution)
            packed = np.asarray(self.register_fn(
                self.map_state.levels, kp_raw, kp_al, kp_ok,
                jnp.asarray(frame.begin_pose.quat, jnp.float32),
                jnp.asarray(frame.begin_pose.tr, jnp.float32),
                jnp.asarray(frame.end_pose.quat, jnp.float32),
                jnp.asarray(frame.end_pose.tr, jnp.float32),
                jnp.asarray(prior), jnp.asarray(dyn)), dtype=np.float64)
            frame.begin_pose.quat = s3n.quat_normalize(packed[0:4])
            frame.begin_pose.tr = packed[4:7]
            frame.end_pose.quat = s3n.quat_normalize(packed[7:11])
            frame.end_pose.tr = packed[11:14]

        # world transform + sharded insert
        world = jnp.asarray(res.interp_world_points(
            jnp.asarray(frame.begin_pose.quat, jnp.float32),
            jnp.asarray(frame.begin_pose.tr, jnp.float32),
            jnp.asarray(frame.end_pose.quat, jnp.float32),
            jnp.asarray(frame.end_pose.tr, jnp.float32),
            sub_raw, sub_al))
        if self.map_update == "partitioned":
            self.map_state, _, dropped = self.update(
                self.map_state, world, sub_ok,
                jnp.asarray(frame.begin_pose.tr, jnp.float32),
                jnp.asarray(frame.end_pose.tr, jnp.float32),
                jnp.float32(o.max_distance))
            self.dropped_points += int(dropped)
        else:
            self.map_state, _ = self.update(
                self.map_state, world, sub_ok,
                jnp.asarray(frame.begin_pose.tr, jnp.float32),
                jnp.asarray(frame.end_pose.tr, jnp.float32),
                jnp.float32(o.max_distance))
        self.trajectory.append(frame)
        self.registered += 1
        return frame

    def map_size(self) -> int:
        return int(sum(np.asarray(l.count).sum()
                       for l in self.map_state.levels))

    # ------------------------------------------------------ checkpointing —
    def save_checkpoint(self, path) -> None:
        """Write the full distributed state (sharded map gathered to host +
        trajectory) to an .npz. The owner-hash partition is a function of
        the shard count, so the checkpoint restores onto a mesh of the SAME
        size (shard-count migration would need a re-partition pass)."""
        import json
        from pathlib import Path
        base = str(path)
        if base.endswith(".npz"):
            base = base[:-4]
        Path(base).parent.mkdir(parents=True, exist_ok=True)
        arrays = {}
        for i, lvl in enumerate(self.map_state.levels):
            for name in lvl._fields:
                if name == "win":
                    continue  # derived; rebuilt per shard on load
                arrays[f"level{i}_{name}"] = np.asarray(getattr(lvl, name))
        if self.trajectory:
            arrays["trajectory"] = np.stack([
                np.concatenate([
                    f.begin_pose.quat, f.begin_pose.tr,
                    [f.begin_pose.timestamp, float(f.begin_pose.frame_id)],
                    f.end_pose.quat, f.end_pose.tr,
                    [f.end_pose.timestamp, float(f.end_pose.frame_id)]])
                for f in self.trajectory])
        else:
            arrays["trajectory"] = np.zeros((0, 18))
        np.savez_compressed(base + ".npz", **arrays)
        meta = {"registered": self.registered,
                "num_levels": len(self.map_state.levels),
                "num_shards": int(self.mesh.shape[self.axis_name])}
        Path(base + ".meta.json").write_text(json.dumps(meta))

    def load_checkpoint(self, path) -> None:
        """Restore state written by :meth:`save_checkpoint` (same-size mesh)."""
        import json
        from pathlib import Path
        from ct_icp_tpu.core.pose import Pose
        base = str(path)
        if base.endswith(".npz"):
            base = base[:-4]
        data = np.load(base + ".npz")
        meta = json.loads(Path(base + ".meta.json").read_text())
        n = int(self.mesh.shape[self.axis_name])
        if meta["num_shards"] != n:
            raise ValueError(
                f"checkpoint has {meta['num_shards']} shards, mesh has {n} "
                "(owner-hash partitions are shard-count specific)")
        sh = NamedSharding(self.mesh, P(self.axis_name))
        levels = []
        for i in range(meta["num_levels"]):
            # device_put the HOST arrays with the target sharding directly —
            # a jnp.asarray would commit the full gathered map to one device
            # first, OOMing exactly the larger-than-one-HBM maps the
            # sharding exists for
            fields = {name: jax.device_put(data[f"level{i}_{name}"], sh)
                      for name in vm.MapLevel._fields if name != "win"}
            # the shard-axis vmap of the window build preserves the input
            # sharding under jit (rolls act within each shard's table)
            fields["win"] = jax.jit(jax.vmap(vm.build_window))(
                fields["keys"], fields["count"])
            levels.append(vm.MapLevel(**fields))
        self.map_state = sm.ShardedMapState(levels=tuple(levels))
        self.trajectory = []
        for row in data["trajectory"]:
            self.trajectory.append(TrajectoryFrame(
                Pose(row[0:4], row[4:7], float(row[7]), int(row[8])),
                Pose(row[9:13], row[13:16], float(row[16]), int(row[17]))))
        self.registered = meta["registered"]
