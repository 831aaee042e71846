"""Concurrency utilities: prefetching input pipeline, actors, pub-sub.

TPU-native re-expression of the reference's reactor/concurrency layer
(reference include/SlamCore/concurrent/blocking_queue.h:18-62,
include/SlamCore/reactors/{reactor.h,handler.h,scheduler.h},
include/ct_icp/reactors/): on TPU the role of the per-actor event-loop threads
is to keep the device fed — a background thread prefetches and preprocesses
dataset frames while the device crunches the previous one (SURVEY.md §2.4 P3).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Dict, Iterable, Iterator, List, Optional

_SENTINEL = object()


class BlockingQueue:
    """Capacity-clamped blocking queue (reference blocking_queue.h:18-62)."""

    def __init__(self, capacity: int = 0):
        self._q = queue.Queue(maxsize=capacity)

    def push(self, item, timeout: Optional[float] = None):
        self._q.put(item, timeout=timeout)

    def pop(self, timeout: Optional[float] = None):
        return self._q.get(timeout=timeout)

    def __len__(self):
        return self._q.qsize()


class PrefetchIterator:
    """Wrap a frame iterator with a lookahead thread (reactor P3 analog).

    ``transform`` runs in the background (e.g. voxel dedup + padding +
    host->device transfer) so the main loop only ever blocks on ready
    frames. With ``workers > 1``, transforms run on a thread pool with
    in-order delivery — numpy releases the GIL in the dedup sort, so the
    per-frame host prep (~8 ms for a 100k scan) scales across cores and
    stays off the streaming critical path.
    """

    def __init__(self, source: Iterable, depth: int = 2,
                 transform: Optional[Callable] = None, workers: int = 1):
        self._queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._transform = transform
        self._exc: Optional[BaseException] = None
        self._pool = None
        self._pooled = workers > 1 and transform is not None
        if self._pooled:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=workers)
        self._thread = threading.Thread(
            target=self._worker, args=(iter(source),), daemon=True)
        self._thread.start()

    def _worker(self, it: Iterator):
        try:
            for item in it:
                if self._pool is not None:
                    # bounded queue of futures = backpressure; consumer
                    # resolves them in submission order
                    item = self._pool.submit(self._transform, item)
                elif self._transform is not None:
                    item = self._transform(item)
                self._queue.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._exc = e
        finally:
            self._queue.put(_SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._exc is not None:
                raise self._exc
            self.close()
            raise StopIteration
        if self._pooled:
            return item.result()
        return item

    def close(self):
        """Release the transform pool. Safe to call more than once.

        Consumers that abandon iteration early (exception mid-stream)
        should call this — or use the context-manager form — so the
        non-daemon pool threads don't linger until interpreter exit.
        """
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Notifier:
    """Pub-sub (reference Notifier/Observer)."""

    def __init__(self):
        self._observers: List[Callable] = []
        self._lock = threading.Lock()

    def subscribe(self, fn: Callable):
        with self._lock:
            self._observers.append(fn)

    def notify(self, *args, **kwargs):
        with self._lock:
            observers = list(self._observers)
        for fn in observers:
            fn(*args, **kwargs)


class Actor:
    """Message-driven actor with its own event-loop thread
    (reference GenericReactor + Handler, reactors/handler.h:17-60).

    Subclasses (or handler callables registered per message type) process
    messages serially — mutable state is confined to one thread.
    """

    def __init__(self):
        self._queue = BlockingQueue()
        self._handlers: Dict[type, Callable] = {}
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def register_handler(self, message_type: type, fn: Callable):
        self._handlers[message_type] = fn

    def send(self, message):
        self._queue.push(message)

    def react(self, message):
        handler = self._handlers.get(type(message))
        if handler is not None:
            handler(message)

    def _loop(self):
        while True:
            msg = self._queue.pop()
            if msg is _SENTINEL:
                break
            self.react(msg)

    def stop(self, join: bool = True):
        self._running = False
        self._queue.push(_SENTINEL)
        if join:
            self._thread.join(timeout=5)


class Scheduler:
    """Periodic callback thread (reference reactors/scheduler.h:17-71)."""

    def __init__(self, period_sec: float, fn: Callable):
        self.period = period_sec
        self.fn = fn
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop.wait(self.period):
            self.fn()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)


class RegistrationActor(Actor):
    """Async registration front-end (reference RegistrationReactor,
    ct_icp/reactors/registration.h:36-76): feed frames, observe summaries."""

    def __init__(self, odometry):
        super().__init__()
        self.odometry = odometry
        self.output = Notifier()
        self.register_handler(dict, self._on_frame)

    def _on_frame(self, frame: dict):
        summary = self.odometry.register_frame(
            frame["xyz"], frame["timestamps"], frame_id=frame.get("frame_id"))
        self.output.notify(summary)
