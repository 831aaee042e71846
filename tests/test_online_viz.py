"""Tests for the online node, callbacks, timers, IMU type, visualization."""

import numpy as np
import pytest

from ct_icp_tpu.core.imu import ImuData
from ct_icp_tpu.core.timer import Timer


class TestTimer:
    def test_accumulates(self):
        t = Timer()
        for _ in range(3):
            with t.tick("phase"):
                pass
        assert t.average_ms("phase") >= 0
        assert "phase" in t.entries()
        assert "phase" in t.report()


class TestImu:
    def test_pack_unpack(self):
        items = [ImuData(1.0, np.ones(3), np.zeros(3))]
        arr = ImuData.pack(items)
        back = ImuData.unpack(arr)
        assert back[0].timestamp == 1.0
        np.testing.assert_allclose(back[0].angular_velocity, 1.0)


@pytest.mark.slow
class TestOnlineAndCallbacks:
    def _acq(self):
        from tests.test_odometry import make_acquisition
        return make_acquisition(seed=29)

    def test_online_node_streams_and_gates(self, tmp_path):
        from tests.test_odometry import small_options
        from ct_icp_tpu.online import OnlineOdometry, OnlineOdometryConfig

        acq = self._acq()
        node = OnlineOdometry(OnlineOdometryConfig(
            odometry_options=small_options(),
            expected_frame_period=0.1,
            failure_output_dir=str(tmp_path / "failure")))
        poses = []
        node.pose_output.subscribe(poses.append)
        for i in range(4):
            s = node.on_pointcloud(**{k: v for k, v in acq.frame(i).items()
                                      if k in ("xyz", "timestamps")})
            assert s is not None and s.success
        # a frame with an inconsistent timestamp gap is dropped
        fr = acq.frame(8)
        out = node.on_pointcloud(fr["xyz"], fr["timestamps"])
        assert out is None
        assert len(poses) == 4

    def test_callbacks_and_aggregated_dump(self, tmp_path):
        from tests.test_odometry import small_options
        from ct_icp_tpu.odometry.odometry import Odometry
        from ct_icp_tpu.visualization import AggregatedFramesDump, export_map_ply

        acq = self._acq()
        odo = Odometry(small_options(keep_corrected_points=True))
        events = []
        odo.register_callback(
            Odometry.FINISHED_REGISTRATION,
            lambda o, s, k: events.append("done") or True)
        dump = AggregatedFramesDump(tmp_path / "viz", period=2)
        odo.register_callback(Odometry.FINISHED_REGISTRATION, dump)
        for i in range(4):
            fr = acq.frame(i)
            odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
        assert events == ["done"] * 4
        dump.flush(odo)
        assert (tmp_path / "viz" / "trajectory.ply").exists()
        assert any(p.name.startswith("aggregated")
                   for p in (tmp_path / "viz").iterdir())
        export_map_ply(odo, tmp_path / "map.ply")
        assert (tmp_path / "map.ply").exists()
