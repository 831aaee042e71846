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


def test_binding_dataset_surface(tmp_path):
    """The dataset helpers the reference binding exposes
    (pyct_icp.cpp:270-301): DatasetOptions/DatasetSequence + module-level
    sequence_name / get_sequences / has_ground_truth /
    get_dataset_sequence / load_ground_truth."""
    import numpy as np
    import ct_icp_tpu.compat.pyct_icp as pyct_icp
    from ct_icp_tpu.datasets.dataset import DatasetEnum
    from ct_icp_tpu.io.ply import write_ply_xyzt

    frames_dir = tmp_path / "seq" / "frames"
    frames_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        write_ply_xyzt(frames_dir / f"frame_{i:05d}.ply",
                       rng.normal(size=(40, 3)), np.full(40, float(i)))

    opts = pyct_icp.DatasetOptions(dataset=DatasetEnum.PLY_DIRECTORY,
                                   root_path=str(frames_dir))
    infos = pyct_icp.get_sequences(opts)
    assert len(infos) == 1
    name = pyct_icp.sequence_name(opts, 0)
    assert isinstance(name, str)
    assert not pyct_icp.has_ground_truth(opts, name)

    seq = pyct_icp.get_dataset_sequence(opts, name)
    assert seq.NumFrames() == 3
    assert seq.WithRandomAccess()
    assert seq.HasNext()
    f = seq.Next()
    assert f.points.shape[0] == 40
    f2 = seq.Frame(2)
    assert float(f2.points["timestamp"][0]) == 2.0
