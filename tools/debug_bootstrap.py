"""Dissect the frame-1 bootstrap problem of the bench corridor."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import bench
from ct_icp_tpu.config.options import default_driving_profile
from ct_icp_tpu.datasets import synthetic as syn
from ct_icp_tpu.odometry.odometry import Odometry
from ct_icp_tpu.odometry import pipeline as pl
from ct_icp_tpu.icp import solver as slv
from ct_icp_tpu.icp import residuals as res
from ct_icp_tpu.icp.registration import make_prior

scene = bench.build_scene()
traj = bench.straight_trajectory(400, 1.5)
acq = syn.SyntheticSensorAcquisition(
    scene, traj,
    syn.SyntheticAcquisitionOptions(num_points_per_frame=100000,
                                    frame_duration=0.1, max_range=50.0,
                                    min_range=2.0, noise_sigma=0.01), seed=3)

o = default_driving_profile()
odo = Odometry(o)
fr0 = acq.frame(0)
odo.register_frame(fr0["xyz"], fr0["timestamps"], frame_id=0)
print("map pts:", odo.map_size())

fr1 = acq.frame(1)
# true relative end pose (sensor starts each frame at its begin pose)
gt_rel = fr1["begin_pose"].inverse() * fr1["end_pose"]
print("gt rel tr:", np.round(gt_rel.tr, 3))
# world offset of frame1 begin vs frame0 begin in odometry frame:
print("gt begin offset:", np.round(
    (fr0["begin_pose"].inverse() * fr1["begin_pose"]).tr, 3))

xyz, ts = fr1["xyz"], fr1["timestamps"]
n = xyz.shape[0]
raw = np.zeros((o.max_scan_points, 3), np.float32)
raw[:n] = xyz
alphas = np.ones((o.max_scan_points,), np.float32)
valid = np.zeros((o.max_scan_points,), bool)
valid[:n] = True

sub_raw, sub_alphas, sub_valid, _ = pl.preprocess(
    jnp.asarray(raw), jnp.asarray(alphas), jnp.asarray(valid),
    jnp.float32(o.init_voxel_size), o.max_subsampled_points)
kp_raw, kp_alphas, kp_valid, kcnt = pl.sample_keypoints(
    sub_raw, sub_alphas, sub_valid, jnp.float32(o.init_sample_voxel_size),
    o.max_keypoints)
print("keypoints:", int(kcnt))

statics = odo.registration.statics
opts = odo._effective_icp_options(
    type("I", (), {"registered_fid": 1})())
dyn = slv.unpack_dynamics(jnp.asarray(odo.registration.dynamics(opts)))
level = odo.map_state.levels[0]
qb = jnp.asarray([1, 0, 0, 0], jnp.float32)
tb = jnp.zeros(3, jnp.float32)
prior14 = jnp.asarray(make_prior(odo.trajectory[0], o.default_motion_model,
                                 odo.origin))
prior = slv.unpack_prior(prior14)

anchors, normals, lines, cov_inv, geom_w, ok, cls = slv._build_problem(
    statics, dyn, level, kp_raw, kp_alphas, kp_valid, qb, tb, qb, tb, tb)
print("ok count:", int(jnp.sum(ok)))
n_res = jnp.sum(ok.astype(jnp.int32))

zero = jnp.zeros(12, jnp.float32)


def rfun(d):
    return slv._residual_vector(statics, dyn, d, kp_raw, kp_alphas, anchors,
                                normals, lines, cov_inv, geom_w, ok, cls,
                                qb, tb, qb, tb, prior, n_res)


r0 = rfun(zero)
jac = jax.jacfwd(rfun)(zero)
pr = r0[:statics.num_keypoints]
w = res.irls_weight(statics.loss, pr * pr, dyn.ls_sigma,
                    dyn.ls_tolerant_min_threshold)
w_full = jnp.concatenate([w, jnp.ones(10)])
print("residual stats: |r| mean=%.3f max=%.3f; irls w mean=%.3f" % (
    float(jnp.mean(jnp.abs(pr[ok]))), float(jnp.max(jnp.abs(pr))),
    float(jnp.mean(w[ok]))))

jtj = (jac * w_full[:, None]).T @ jac
jtr = (jac * w_full[:, None]).T @ r0
d = jnp.sqrt(jnp.maximum(jnp.diagonal(jtj), 1e-12))
a = jtj / (d[:, None] * d[None, :]) + 1e-4 * jnp.eye(12) \
    + 1e-7 * jnp.eye(12)
delta = jnp.linalg.solve(a, -jtr / d) / d
print("delta:", np.round(np.asarray(delta), 4))


def cost(dlt):
    r = rfun(dlt)
    p = r[:statics.num_keypoints]
    return float(jnp.sum(res.robust_cost(statics.loss, p * p, dyn.ls_sigma,
                                         dyn.ls_tolerant_min_threshold))
                 + jnp.sum(r[statics.num_keypoints:] ** 2))


print("cost0=%.4f cost1=%.4f" % (cost(zero), cost(delta)))
# what would a pure x-translation step do?
for step in [0.25, 0.5, 1.0]:
    dx = jnp.zeros(12).at[3].set(step).at[9].set(step)
    print(f"cost(x+={step})={cost(dx):.4f}")
