"""CT-BA backend composing with BATCHED streaming (round-4 verdict
missing #3): the backend previously required batch=1 because the megastep
keeps keypoint arrays internal to its lax.scan; the host keypoint-prefix
reconstruction (Odometry._host_keypoints) removes that constraint. These
tests pin (a) that refinements actually run at batch>1, (b) that the
host-reconstructed keypoints give the same refinement quality as the
device keypoints of the batch=1 path, and (c) that the degraded-front-end
accuracy win survives batching.
"""

import dataclasses

import numpy as np
import pytest

from ct_icp_tpu.config.options import BackendOptions
from ct_icp_tpu.odometry.concurrent import PrefetchIterator
from ct_icp_tpu.odometry.odometry import Odometry

from test_odometry import make_acquisition, small_options


def _degraded_opts(enabled: bool):
    opts = small_options()
    return dataclasses.replace(
        opts,
        ct_icp_options=dataclasses.replace(
            opts.ct_icp_options, num_iters_icp=2, ls_max_num_iters=1),
        backend=BackendOptions(enabled=enabled, window=6, period=3,
                               num_steps=2, replay=False))


def _run_streaming(opts, batch: int, n: int = 15, seed: int = 47):
    acq = make_acquisition(seed=seed, noise=0.005)
    odo = Odometry(opts)
    gt_ends = []

    def _prepare(i):
        fr = acq.frame(i)
        gt_ends.append(fr["end_pose"])
        return odo.prepare_frame(fr["xyz"], fr["timestamps"],
                                 registered_fid=i, frame_id=i, upload=False,
                                 pad_rung=odo.options.max_scan_points)

    preps = [_prepare(i) for i in range(n)]
    for s in odo.stream_frames(iter(preps), batch=batch):
        assert s.success
    traj = odo.get_trajectory()
    first_gt, first_est = gt_ends[0], traj[0].end_pose
    errs = [(first_gt.inverse() * gt).location_distance(
        first_est.inverse() * est.end_pose)
        for est, gt in zip(traj[1:], gt_ends[1:])]
    return float(np.mean(errs)), odo


@pytest.mark.slow
def test_backend_runs_at_batch_streaming():
    """Refinements fire inside batch=4 streaming, fed by the host-side
    keypoint reconstruction (no device keypoint readback)."""
    ape, odo = _run_streaming(_degraded_opts(True), batch=4)
    assert odo.backend is not None
    assert odo.backend.refinements >= 2
    # every post-startup frame must have contributed keypoints to the window
    assert len(odo.backend._keypoints) > 0
    assert np.isfinite(ape)


@pytest.mark.slow
def test_backend_batched_matches_batch1_quality():
    """The host keypoint-prefix reconstruction must give the same
    refinement quality as the device keypoints of the batch=1 fused path:
    batched-backend APE within 20 % of batch1-backend APE (not bitwise —
    the batch=1 path hands the backend its post-decimation device
    keypoints, the batched path the full prefix superset)."""
    ape_b1, odo1 = _run_streaming(_degraded_opts(True), batch=1)
    ape_b4, odo4 = _run_streaming(_degraded_opts(True), batch=4)
    assert odo1.backend.refinements >= 2
    assert odo4.backend.refinements >= 2
    assert ape_b4 < ape_b1 * 1.2 + 0.002, (ape_b4, ape_b1)


@pytest.mark.slow
def test_backend_on_beats_off_at_batch_streaming():
    """The degraded-front-end accuracy win (tools/ab_backend.py on the
    flagship: 0.463 -> 0.372 %Tr) must survive batching: backend-on at
    batch=4 streaming beats backend-off at batch=4."""
    ape_off, _ = _run_streaming(_degraded_opts(False), batch=4)
    ape_on, odo = _run_streaming(_degraded_opts(True), batch=4)
    assert odo.backend.refinements >= 2
    assert ape_on < ape_off, (ape_on, ape_off)
