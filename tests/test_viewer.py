"""Standalone HTML viewer export (the interactive half of the viz3d
capability, reference SlamCore-viz3d/viz3d_windows.h:97-213)."""

import base64
import re

import numpy as np
import pytest

from ct_icp_tpu.viewer import export_html


def _embedded_f32(html, name):
    m = re.search(name + r' = decode\("([A-Za-z0-9+/=]*)"\)', html)
    assert m, f"{name} payload missing"
    return np.frombuffer(base64.b64decode(m.group(1)), np.float32)


def test_export_html_embeds_points_and_trajectory(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    traj = np.stack([np.linspace(0, 9, 10), np.zeros(10), np.ones(10)], -1)
    p = export_html(tmp_path / "v.html", pts, traj, title="t")
    html = p.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "__POINTS__" not in html and "__META__" not in html
    got = _embedded_f32(html, "pts").reshape(-1, 3)
    np.testing.assert_allclose(got, pts, rtol=1e-6)
    got_t = _embedded_f32(html, "traj").reshape(-1, 3)
    np.testing.assert_allclose(got_t, traj.astype(np.float32), rtol=1e-6)
    # the inline WebGL viewer is present and self-contained
    assert "getContext(\"webgl\"" in html
    assert "http://" not in html and "https://" not in html


def test_export_html_decimates(tmp_path):
    pts = np.zeros((100_000, 3), np.float32)
    pts[:, 0] = np.arange(100_000)
    p = export_html(tmp_path / "v.html", pts, max_points=10_000)
    got = _embedded_f32(p.read_text(), "pts").reshape(-1, 3)
    assert len(got) <= 10_000
    assert got[1, 0] - got[0, 0] >= 10  # uniform stride, not a prefix


def test_export_html_no_trajectory(tmp_path):
    pts = np.ones((10, 3), np.float32)
    p = export_html(tmp_path / "v.html", pts)
    assert _embedded_f32(p.read_text(), "traj").size == 0


def test_export_html_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        export_html(tmp_path / "v.html", np.zeros((5, 2)))


@pytest.mark.slow
def test_export_odometry_html(tmp_path):
    from ct_icp_tpu.viewer import export_odometry_html
    from tests.test_odometry import make_acquisition, small_options
    from ct_icp_tpu.odometry.odometry import Odometry

    acq = make_acquisition(seed=2)
    odo = Odometry(small_options())
    for i in range(3):
        fr = acq.frame(i)
        odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)
    p = export_odometry_html(odo, tmp_path / "map.html")
    html = p.read_text()
    pts = _embedded_f32(html, "pts").reshape(-1, 3)
    traj = _embedded_f32(html, "traj").reshape(-1, 3)
    assert len(pts) > 1000
    assert len(traj) == 3


@pytest.mark.slow
def test_runner_html_viewer_flag(tmp_path):
    from tests.test_odometry import make_acquisition, small_options
    from ct_icp_tpu.config.yaml_config import RunnerConfig
    from ct_icp_tpu.datasets import dataset as D
    from ct_icp_tpu.runner import OdometryRunner

    acq = make_acquisition(seed=4)
    seq = D.SyntheticSequence(acq)
    seq.set_max_num_frames(3)
    cfg = RunnerConfig(odometry_options=small_options(),
                       output_dir=str(tmp_path), html_viewer=True,
                       generate_directory_prefix=False,
                       progress_bar=False, compute_metrics_period=0)
    OdometryRunner(cfg).run_sequence(seq, driving=False)
    out = list(tmp_path.rglob("viewer.html"))
    assert len(out) == 1 and out[0].stat().st_size > 10_000
