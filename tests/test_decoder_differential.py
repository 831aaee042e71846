"""Differential tests: Python decoders vs the reference-semantics C++
oracle (native/ref_oracle.cc).

The real-data rehearsal fixtures are synthesized by inverting the Python
decoders themselves (tests/test_real_data_rehearsal.py), so a format
misread — wrong endianness, wrong magic framing, wrong u16->meters offset
— would pass self-consistently. These tests close that hole: the oracle
re-implements the reference's decode logic (dataset.cpp:447-535 NCLT
stream, :85-111 KITTI filter, :998-1098 GT conjugation) standalone, both
sides consume RANDOM byte streams / point sets / pose tables, and the
outputs must agree bit-for-bit (decode) or to float tolerance (geometry).
"""

import ctypes
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
LIB = REPO / "native" / "libref_oracle.so"


@pytest.fixture(scope="module")
def oracle():
    if not LIB.exists():
        r = subprocess.run(["make", "-C", str(REPO / "native"),
                            "libref_oracle.so"], capture_output=True)
        if r.returncode != 0 or not LIB.exists():
            pytest.skip(f"cannot build ref oracle: {r.stderr.decode()[:200]}")
    lib = ctypes.CDLL(str(LIB))
    lib.ref_nclt_decode.restype = ctypes.c_long
    lib.ref_kitti_filter.restype = ctypes.c_long
    lib.ref_conjugate_poses.restype = ctypes.c_int
    lib.ref_kitti_gt_timestamp.restype = ctypes.c_double
    return lib


def _random_nclt_stream(rng, num_batches, truncate_tail=False):
    """A synthetic velodyne_hits.bin byte stream built from the FORMAT SPEC
    (magic/num_hits/utime/padding framing), independent of any decoder."""
    out = bytearray()
    utime0 = 1326030000000000
    for b in range(num_batches):
        num_hits = int(rng.integers(0, 60))
        out += struct.pack("<4H", 44444, 44444, 44444, 44444)
        out += struct.pack("<IQI", num_hits, utime0 + b * 100_000,
                           int(rng.integers(0, 2**32)))
        for _ in range(num_hits):
            out += struct.pack("<3H2B", *rng.integers(0, 65536, 3),
                               *rng.integers(0, 256, 2))
    if truncate_tail and len(out) > 10:
        out = out[:-int(rng.integers(1, 9))]
    return bytes(out)


def _oracle_nclt(lib, stream, num_aggregated, max_frames=64):
    cap = 1 << 16
    xyz = np.zeros((cap, 3), np.float64)
    ts = np.zeros((cap,), np.float64)
    sizes = np.zeros((max_frames,), np.int64)
    n = lib.ref_nclt_decode(
        stream, ctypes.c_long(len(stream)), ctypes.c_int(num_aggregated),
        ctypes.c_int(max_frames),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_long(cap),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    assert n >= 0, f"oracle rejected the stream: {n}"
    total = int(sizes[:n].sum())
    return sizes[:n].tolist(), xyz[:total], ts[:total]


def _python_nclt(tmp_path, stream, num_aggregated, native: bool):
    """Decode via the shipped NCLTIterator (expects the NCLT tree layout)."""
    from ct_icp_tpu.datasets.dataset import NCLTIterator

    seq = "2012-01-08"
    d = tmp_path / f"{seq}_vel" / seq
    d.mkdir(parents=True, exist_ok=True)
    (d / "velodyne_hits.bin").write_bytes(stream)
    it = NCLTIterator(tmp_path, seq, num_aggregated_pc=num_aggregated)
    if not native:
        it._native = None
    frames = []
    while it.has_next():
        try:
            frames.append(it._next_unfiltered())
        except StopIteration:
            break
    return frames


@pytest.mark.parametrize("native", [False, True])
@pytest.mark.parametrize("truncate", [False, True])
def test_nclt_stream_decode_matches_reference(oracle, tmp_path, native,
                                              truncate):
    """Random byte streams decode identically (frame framing, u16->meters,
    per-batch utime timestamps) through both the pure-python and the
    native-slamio readers. dataset.cpp:447-535 is the spec."""
    if native:
        from ct_icp_tpu.io.native import available
        if not available():
            pytest.skip("native slamio not built")
    rng = np.random.default_rng(13 + truncate)
    for trial in range(4):
        stream = _random_nclt_stream(rng, int(rng.integers(1, 12)),
                                     truncate_tail=truncate)
        num_agg = int(rng.integers(1, 5))
        sizes_ref, xyz_ref, ts_ref = _oracle_nclt(oracle, stream, num_agg)
        frames = _python_nclt(tmp_path / f"t{native}{truncate}{trial}",
                              stream, num_agg, native)
        # empty frames (all batches had 0 hits) are skipped by the python
        # iterator (reference DoNext returns an empty cloud there; the
        # odometry layer rejects empty frames either way) — compare the
        # non-empty frame sequence
        sizes_ref_ne = [s for s in sizes_ref if s > 0]
        sizes_py = [f["xyz"].shape[0] for f in frames]
        assert sizes_py == sizes_ref_ne, (sizes_py, sizes_ref, num_agg)
        if not frames:
            continue
        xyz_py = np.concatenate([f["xyz"] for f in frames])
        ts_py = np.concatenate([f["timestamps"] for f in frames])
        # bit-exact: both sides compute v * 0.005 - 100.0 in float64
        np.testing.assert_array_equal(xyz_py, xyz_ref)
        np.testing.assert_array_equal(ts_py, ts_ref)


def test_nclt_bad_magic_rejected(oracle, tmp_path):
    rng = np.random.default_rng(3)
    stream = bytearray(_random_nclt_stream(rng, 3))
    stream[0:2] = struct.pack("<H", 12345)          # corrupt the magic
    n = oracle.ref_nclt_decode(
        bytes(stream), ctypes.c_long(len(stream)), 2, 8,
        np.zeros((8, 3)).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.zeros((8,)).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_long(8),
        np.zeros((8,), np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    assert n == -2
    with pytest.raises(ValueError, match="magic"):
        _python_nclt(tmp_path, bytes(stream), 2, native=False)


def test_kitti_filter_matches_reference(oracle):
    """Random clouds through the z-crop + 0.205 deg vertical-angle
    correction (dataset.cpp:85-111)."""
    from ct_icp_tpu.datasets.dataset import kitti_frame_filter

    rng = np.random.default_rng(7)
    for _ in range(4):
        n = int(rng.integers(50, 400))
        xyz = rng.uniform(-40, 40, (n, 3))
        xyz[:, 2] = rng.uniform(-8, 4, n)       # some below the -5 crop
        out = np.zeros_like(xyz)
        kept = np.zeros((n,), np.int64)
        m = oracle.ref_kitti_filter(
            np.ascontiguousarray(xyz).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            ctypes.c_long(n),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            kept.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        ref = out[:m]
        got = kitti_frame_filter(xyz)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-9)
        # the kept set is exactly the z > -5 points, in order
        np.testing.assert_array_equal(kept[:m], np.nonzero(xyz[:, 2] > -5)[0])


def test_gt_conjugation_matches_reference(oracle):
    """Random pose tables conjugated with every shipped calibration:
    Calib^-1 * P * Calib with general (non-rigid-assuming) inverse
    (dataset.cpp:1004-1029)."""
    from ct_icp_tpu.core import se3_np as s3n
    from ct_icp_tpu.core.pose import Pose
    from ct_icp_tpu.datasets import dataset as ds

    rng = np.random.default_rng(11)
    calibs = [ds.kitti_calib(0), ds.kitti_calib(3), ds.kitti_calib(5),
              ds._KITTI_360_CALIB, ds._NCLT_CALIB, ds._HILTI_2021_CALIB,
              ds._HILTI_2022_CALIB]
    for calib in calibs:
        n = 16
        poses, mats = [], []
        for i in range(n):
            q = s3n.quat_normalize(rng.normal(size=4))
            tr = rng.uniform(-100, 100, 3)
            p = Pose(q, tr, timestamp=float(i))
            poses.append(p)
            mats.append(p.matrix())
        mats = np.ascontiguousarray(np.stack(mats))
        quat_out = np.zeros((n, 4))
        tr_out = np.zeros((n, 3))
        rc = oracle.ref_conjugate_poses(
            np.ascontiguousarray(calib).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            mats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_long(n),
            quat_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            tr_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert rc == 0
        got = ds.conjugate_poses(poses, calib)
        for i, p in enumerate(got):
            np.testing.assert_allclose(p.tr, tr_out[i], atol=1e-9)
            # compare as rotations (quat sign-free), via the matrix.
            # 1e-6: the conjugated matrix is only near-rigid (calibrations
            # are not exactly orthonormal), and the two quat-extraction
            # branch algorithms project it slightly differently — a wrong
            # conjugation order/convention errs at O(1), not O(1e-7)
            np.testing.assert_allclose(
                s3n.quat_to_matrix(s3n.quat_normalize(p.quat)),
                s3n.quat_to_matrix(quat_out[i]), atol=1e-6)


def test_kitti_gt_timestamps_match_reference(oracle):
    """Mid-scan timestamp convention (dataset.cpp:1030-1044)."""
    from ct_icp_tpu.core import se3_np as s3n
    from ct_icp_tpu.core.pose import Pose
    from ct_icp_tpu.datasets import dataset as ds

    rng = np.random.default_rng(2)
    gt_dir = None
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        gt_dir = Path(td)
        rows = []
        for i in range(5):
            q = s3n.quat_normalize(rng.normal(size=4))
            m = np.eye(4)
            m[:3, :3] = s3n.quat_to_matrix(q)
            m[:3, 3] = rng.uniform(-10, 10, 3)
            rows.append(" ".join(f"{v:.9f}" for v in m[:3].reshape(-1)))
        (gt_dir / "00.txt").write_text("\n".join(rows))
        poses = ds.load_kitti_gt(gt_dir, "00", 0, ds.DatasetEnum.KITTI_raw)
        for i, p in enumerate(poses):
            assert p.timestamp == oracle.ref_kitti_gt_timestamp(
                ctypes.c_long(i), 0)
        (gt_dir / "poses_gt.txt").write_text("\n".join(rows))
        carla = ds.load_kitti_gt(gt_dir, "Town01", 0,
                                 ds.DatasetEnum.KITTI_CARLA)
        for i, p in enumerate(carla):
            assert p.timestamp == oracle.ref_kitti_gt_timestamp(
                ctypes.c_long(i), 1)
