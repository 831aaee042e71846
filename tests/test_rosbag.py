"""rosbag 2.0 -> PLY_DIRECTORY round trip (reference rosbag_to_ply.cxx).

The fixture bag is hand-crafted bytes: a chunked bag with one
uncompressed and one bz2 chunk, each holding connection + PointCloud2 /
Imu message records, exactly the layout `rosbag record` emits.
"""

import bz2
import struct

import numpy as np
import pytest

from ct_icp_tpu.convert import bag_to_ply
from ct_icp_tpu.io import rosbag as rb
from ct_icp_tpu.io.ply import read_ply


def _header(fields: dict) -> bytes:
    out = b""
    for name, value in fields.items():
        item = name + b"=" + value
        out += struct.pack("<I", len(item)) + item
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _connection(conn_id: int, topic: bytes, msg_type: bytes) -> bytes:
    sub = _header({b"topic": topic, b"type": msg_type,
                   b"md5sum": b"0" * 32, b"message_definition": b""})
    return _record({b"op": bytes([rb.OP_CONNECTION]),
                    b"conn": struct.pack("<I", conn_id),
                    b"topic": topic}, sub)


def _message(conn_id: int, secs: int, nsecs: int, body: bytes) -> bytes:
    return _record({b"op": bytes([rb.OP_MESSAGE_DATA]),
                    b"conn": struct.pack("<I", conn_id),
                    b"time": struct.pack("<II", secs, nsecs)}, body)


def _string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def _pointcloud2_body(xyz: np.ndarray, ts: np.ndarray, stamp: float) -> bytes:
    """Serialize a sensor_msgs/PointCloud2 with x/y/z float32 + timestamp
    float64 fields (point_step 24, with 4 pad bytes after z)."""
    n = len(xyz)
    point_step = 24
    buf = np.zeros(n, np.dtype({
        "names": ["x", "y", "z", "timestamp"],
        "formats": [np.float32, np.float32, np.float32, np.float64],
        "offsets": [0, 4, 8, 16], "itemsize": point_step}))
    buf["x"], buf["y"], buf["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    buf["timestamp"] = ts
    data = buf.tobytes()

    secs, nsecs = int(stamp), int((stamp - int(stamp)) * 1e9)
    body = struct.pack("<I", 0)                      # header.seq
    body += struct.pack("<II", secs, nsecs)          # header.stamp
    body += _string(b"lidar")                        # header.frame_id
    body += struct.pack("<II", 1, n)                 # height, width
    fields = [(b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1),
              (b"timestamp", 16, 8, 1)]
    body += struct.pack("<I", len(fields))
    for name, off, dtype, count in fields:
        body += _string(name) + struct.pack("<IBI", off, dtype, count)
    body += struct.pack("<B", 0)                     # is_bigendian
    body += struct.pack("<II", point_step, point_step * n)
    body += struct.pack("<I", len(data)) + data
    body += struct.pack("<B", 1)                     # is_dense
    return body


def _imu_body(stamp: float, quat, gyro, accel) -> bytes:
    secs, nsecs = int(stamp), int(round((stamp - int(stamp)) * 1e9))
    body = struct.pack("<I", 0) + struct.pack("<II", secs, nsecs)
    body += _string(b"imu")
    body += struct.pack("<4d", *quat) + struct.pack("<9d", *([0.0] * 9))
    body += struct.pack("<3d", *gyro) + struct.pack("<9d", *([0.0] * 9))
    body += struct.pack("<3d", *accel) + struct.pack("<9d", *([0.0] * 9))
    return body


@pytest.fixture
def fixture_bag(tmp_path):
    rng = np.random.default_rng(7)
    clouds = []
    for i in range(3):
        xyz = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
        ts = 100.0 + i * 0.1 + np.linspace(0, 0.1, 50)
        clouds.append((xyz, ts, 100.0 + i * 0.1))

    chunk1 = (_connection(0, b"/ct_icp/pointcloud",
                          b"sensor_msgs/PointCloud2")
              + _connection(1, b"/imu", b"sensor_msgs/Imu")
              + _message(0, 100, 0, _pointcloud2_body(*clouds[0]))
              + _message(1, 100, 50_000_000,
                         _imu_body(100.05, (0, 0, 0, 1), (0.1, 0, 0),
                                   (0, 0, 9.81))))
    chunk2 = (_message(0, 100, 100_000_000, _pointcloud2_body(*clouds[1]))
              + _message(0, 100, 200_000_000, _pointcloud2_body(*clouds[2])))

    bag = rb.MAGIC
    bag += _record({b"op": bytes([rb.OP_BAG_HEADER]),
                    b"index_pos": struct.pack("<Q", 0),
                    b"conn_count": struct.pack("<I", 2),
                    b"chunk_count": struct.pack("<I", 2)}, b"\x20" * 64)
    bag += _record({b"op": bytes([rb.OP_CHUNK]), b"compression": b"none",
                    b"size": struct.pack("<I", len(chunk1))}, chunk1)
    bag += _record({b"op": bytes([rb.OP_CHUNK]), b"compression": b"bz2",
                    b"size": struct.pack("<I", len(chunk2))},
                   bz2.compress(chunk2))
    path = tmp_path / "fixture.bag"
    path.write_bytes(bag)
    return path, clouds


def test_read_bag_messages(fixture_bag):
    path, clouds = fixture_bag
    msgs = list(rb.read_bag(path))
    types = [m.msg_type for m in msgs]
    assert types.count("sensor_msgs/PointCloud2") == 3
    assert types.count("sensor_msgs/Imu") == 1


def test_iter_pointclouds_structured(fixture_bag):
    path, clouds = fixture_bag
    out = list(rb.iter_pointclouds(path, topic="/ct_icp/pointcloud"))
    assert len(out) == 3
    for (stamp, arr), (xyz, ts, hdr_stamp) in zip(out, clouds):
        assert abs(stamp - hdr_stamp) < 1e-6
        np.testing.assert_allclose(arr["x"], xyz[:, 0], rtol=1e-6)
        np.testing.assert_allclose(arr["timestamp"], ts, rtol=0, atol=1e-9)


def test_iter_imu(fixture_bag):
    path, _ = fixture_bag
    samples = list(rb.iter_imu(path))
    assert len(samples) == 1
    np.testing.assert_allclose(samples[0].linear_acceleration, [0, 0, 9.81])
    assert abs(samples[0].stamp - 100.05) < 1e-6


def test_bag_to_ply_round_trip(fixture_bag, tmp_path):
    path, clouds = fixture_bag
    out = tmp_path / "out"
    n = bag_to_ply(path, out)
    assert n == 3
    t0 = clouds[0][1].min()
    for i, (xyz, ts, _) in enumerate(clouds):
        cols = read_ply(out / "frames" / f"frame_{i:05d}.ply")
        np.testing.assert_allclose(cols["x"], xyz[:, 0], rtol=1e-6)
        np.testing.assert_allclose(cols["timestamp"], ts - t0, atol=1e-9)
    imu = read_ply(out / "imu_data.ply")
    np.testing.assert_allclose(imu["az"], [9.81])
    np.testing.assert_allclose(imu["timestamp"], [0.05], atol=1e-9)


def test_bag_to_ply_feeds_odometry_dataset(fixture_bag, tmp_path):
    """The converted layout must be a valid PLY_DIRECTORY sequence."""
    from ct_icp_tpu.datasets.dataset import (Dataset, DatasetEnum,
                                             DatasetOptions)
    path, clouds = fixture_bag
    out = tmp_path / "seq"
    bag_to_ply(path, out)
    ds = Dataset.load_dataset(DatasetOptions(
        dataset=DatasetEnum.PLY_DIRECTORY, root_path=str(out)))
    seq = ds.sequences[0]
    count = 0
    while seq.has_next():
        fr = seq.next_frame()
        assert fr["xyz"].shape == (50, 3)
        count += 1
    assert count == 3


def test_rejects_non_bag(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"#ROSBAG V1.2\n junk")
    with pytest.raises(ValueError, match="not a rosbag 2.0"):
        list(rb.read_bag(p))
