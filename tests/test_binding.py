"""pyct_icp compatibility-shim test (the reference's tests/test_binding.py
analog — except this binding actually works)."""

import numpy as np
import pytest


def test_binding_surface():
    import ct_icp_tpu.compat.pyct_icp as pyct_icp
    assert pyct_icp.CERES.value == "CERES"
    assert pyct_icp.POINT_TO_PLANE.value == "POINT_TO_PLANE"
    opts = pyct_icp.OdometryOptions.DefaultDrivingProfile()
    assert opts.ct_icp_options.num_iters_icp == 5

    f = pyct_icp.LiDARFrame(10)
    arr = f.GetStructuredArrayRef()
    assert arr.shape == (10,)
    assert set(arr.dtype.names) >= {"raw_point", "pt", "timestamp"}


@pytest.mark.slow
def test_binding_register(tmp_path):
    import ct_icp_tpu.compat.pyct_icp as pyct_icp
    from tests.test_odometry import make_acquisition, small_options

    acq = make_acquisition(seed=37)
    odo = pyct_icp.Odometry(small_options())
    for i in range(3):
        fr = acq.frame(i)
        frame = pyct_icp.LiDARFrame.from_xyz(fr["xyz"], fr["timestamps"])
        summary = odo.RegisterFrame(frame)
        assert summary.success
    assert odo.MapSize() > 100
    assert len(odo.Trajectory()) == 3
