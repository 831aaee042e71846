"""Shared honest-timing harness for the TPU experiment tools.

The axon client boots in a deferred mode where block_until_ready returns at
enqueue; the first device->host readback flips it to synchronous execution
(docs/PERF.md, "the axon client lies until the first readback"). Always
force_sync_mode() before timing, and compare against a trivial same-shape
op — chained timings carry a per-dispatch floor that varies by the hour.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def force_sync_mode():
    """Flip the axon client into honest synchronous mode via one readback."""
    _ = np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones(8)))


def chained(fn, *args, n=20):
    """Mean wall ms/call over ``n`` back-to-back dispatches (one final
    block). Honest only AFTER force_sync_mode(); includes the per-dispatch
    floor."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000
