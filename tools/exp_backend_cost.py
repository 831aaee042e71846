"""Decompose the CT-BA backend's per-refine cost at batch=16 streaming
(round-5: backend-on measured 31 fps vs 67 off — where do the ~138 ms per
refinement go: uploads, assemble, CT-BA steps, readbacks?).

ARCHIVE: this tool's finding (340 ms/refine median = pipeline stall on
the in-flight megastep + 4 tunnel RTTs vs ~50 ms device work) motivated
the deferred-apply design now in production (backend._refine stores the
device result; apply happens one period later from ONE packed readback —
backend-on now measures == backend-off fps). The instrumented copy below
replicates the OLD synchronous body and is kept only to re-measure the
synchronous baseline; it does NOT mirror current production.

  PYTHONPATH=/root/repo python -u tools/exp_backend_cost.py [frames]

Env: BK_PERIOD, BK_WINDOW, BK_STEPS override BackendOptions.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    seed = 7
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.config.yaml_config import synthetic_sequence_from_yaml
    from ct_icp_tpu.odometry.concurrent import PrefetchIterator
    from ct_icp_tpu.odometry.odometry import Odometry

    acq = synthetic_sequence_from_yaml(
        "configs/synthetic_long_drive.yaml", seed=seed).acq
    n = min(frames, acq.num_frames())
    n = (n // 16) * 16
    cache = [acq.frame(i) for i in range(n)]

    opts = default_driving_profile()
    opts = dataclasses.replace(
        opts, backend=dataclasses.replace(
            opts.backend, enabled=True,
            period=int(os.environ.get("BK_PERIOD", opts.backend.period)),
            window=int(os.environ.get("BK_WINDOW", opts.backend.window)),
            num_steps=int(os.environ.get("BK_STEPS",
                                         opts.backend.num_steps))))
    odo = Odometry(opts)

    # instrument the phases inside _refine via monotonic wall marks around
    # the public call (refine_ms) plus a phase patch
    import ct_icp_tpu.odometry.backend as bk
    phases = {"stack_upload": [], "assemble": [], "steps": [],
              "readback_apply": []}
    orig = bk.CTBABackend._refine

    def patched(self):
        import jax
        import jax.numpy as jnp
        from ct_icp_tpu.core import se3_np as s3n
        from ct_icp_tpu.parallel import ct_ba
        odo = self.odometry
        kps = [kp for kp in self._keypoints if kp[0] >= self.keep_first]
        n_shards = self.mesh.shape["frames"]
        usable = (len(kps) // n_shards) * n_shards
        if usable < max(2, n_shards):
            return
        kps = kps[-usable:]
        fids = [kp[0] for kp in kps]
        t0 = time.time()
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
        jax.block_until_ready((raw, qb))
        t1 = time.time()
        radius = jnp.float32(odo.registration.search_radius)
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
        jax.block_until_ready(problem.weights)
        t2 = time.time()
        state = ct_ba.CTBAState(qb, tb, qe, te)
        state, problem = ct_ba.shard_problem(self.mesh, state, problem)
        for _ in range(self.num_steps):
            state, cost = self.step(state, problem)
        jax.block_until_ready(state.quat_begin)
        t3 = time.time()
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
        t4 = time.time()
        self.refinements += 1
        phases["stack_upload"].append(t1 - t0)
        phases["assemble"].append(t2 - t1)
        phases["steps"].append(t3 - t2)
        phases["readback_apply"].append(t4 - t3)

    bk.CTBABackend._refine = patched
    try:
        def _prepare(i):
            fr = cache[i]
            return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                     registered_fid=i, frame_id=i,
                                     upload=False,
                                     pad_rung=odo.options.max_scan_points)

        preps = PrefetchIterator(range(n), depth=32, transform=_prepare,
                                 workers=3)
        warmup = 32
        t_start = None
        timed = 0
        for i, s in enumerate(odo.stream_frames(preps, batch=16)):
            if i == warmup - 1:
                t_start = time.time()
            elif i >= warmup:
                timed += 1
        spf = (time.time() - t_start) / max(timed, 1)
    finally:
        bk.CTBABackend._refine = orig

    med = {k: round(float(np.median(v)) * 1e3, 1) if v else 0.0
           for k, v in phases.items()}
    mx = {k: round(float(np.max(v)) * 1e3, 1) if v else 0.0
          for k, v in phases.items()}
    print(json.dumps({
        "fps": round(1.0 / spf, 2), "frames": timed,
        "refines": len(phases["assemble"]),
        "per_refine_ms_median": med,
        "per_refine_ms_max": mx,
        "steady_refine_ms": round(sum(med.values()), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
