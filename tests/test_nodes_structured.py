"""Tests for the ROS-node analogs (DatasetPublisher, EvaluationNode) and the
PointCloud2-analog structured-array conversions."""

import numpy as np

from ct_icp_tpu.io.structured import (frame_to_structured, select_fields,
                                      structured_to_frame)
from ct_icp_tpu.online import DatasetPublisher, EvaluationNode


def test_structured_roundtrip_zero_copy():
    rng = np.random.default_rng(0)
    xyz = rng.random((100, 3)).astype(np.float32)
    ts = np.linspace(0.0, 0.1, 100)
    arr = frame_to_structured(xyz, ts, extra={"intensity":
                                              rng.random(100).astype(np.float32)})
    out_xyz, out_ts = structured_to_frame(arr)
    np.testing.assert_allclose(out_xyz, xyz, rtol=0, atol=0)
    np.testing.assert_allclose(out_ts, ts)
    # adjacent float32 x/y/z -> zero-copy strided view
    assert out_xyz.base is not None
    # mutation through the view reaches the buffer (shallow conversion)
    out_xyz[0, 0] = 42.0
    assert arr["x"][0] == 42.0
    proj = select_fields(arr, ["intensity", "x"])
    assert proj.shape == (100, 2)


def test_structured_nonadjacent_copies():
    dt = np.dtype({"names": ["x", "pad", "y", "z"],
                   "formats": [np.float32, np.int16, np.float32, np.float32]})
    arr = np.zeros(10, dtype=dt)
    arr["x"] = 1.0
    arr["y"] = 2.0
    arr["z"] = 3.0
    xyz, ts = structured_to_frame(arr)
    assert ts is None
    np.testing.assert_allclose(xyz, np.tile([1.0, 2.0, 3.0], (10, 1)))


class _FakeSequence:
    def __init__(self, n):
        self._frames = [{"xyz": np.full((5, 3), float(i)),
                         "timestamps": np.arange(5.0)} for i in range(n)]
        self._i = 0

    def has_next(self):
        return self._i < len(self._frames)

    def next_frame(self):
        fr = self._frames[self._i]
        self._i += 1
        return fr


def test_dataset_publisher_publishes_at_rate():
    pub = DatasetPublisher(_FakeSequence(5), rate_hz=0.0)  # no sleeping
    got = []
    pub.output.subscribe(got.append)
    pub.run()
    assert [m["frame_id"] for m in got] == [0, 1, 2, 3, 4]
    assert got[2]["xyz"][0, 0] == 2.0


def test_dataset_publisher_stop():
    pub = DatasetPublisher(_FakeSequence(5), rate_hz=0.0)
    count = [0]

    def cb(_):
        count[0] += 1
        if count[0] == 2:
            pub.stop()

    pub.output.subscribe(cb)
    pub.run()
    assert count[0] == 2


def _pose_mat(x):
    m = np.eye(4)
    m[0, 3] = x
    return m


def test_evaluation_node_metrics():
    gt = [_pose_mat(0.1 * i) for i in range(30)]
    node = EvaluationNode(gt, period_sec=100.0)
    got = []
    node.metrics_output.subscribe(got.append)
    # perfect estimates -> ~zero APE
    for i in range(30):
        node.on_pose({"frame_id": i, "end_pose": _Mat(gt[i])})
    m = node.compute_metrics()
    assert m is not None and m.mean_ape < 1e-9
    assert got and got[0] is m


class _Mat:
    """Pose stand-in exposing matrix()."""

    def __init__(self, m):
        self._m = m

    def matrix(self):
        return self._m
