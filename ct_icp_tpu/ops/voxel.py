"""Voxel coordinate / hashing primitives (device side).

Semantics match the reference:
  * truncation toward zero for voxel coordinates
    (``Voxel::Coordinates``, reference src/SlamCore/types.cxx:13-20 and the
    ``static_cast<short>`` in sub_sample_frame, reference src/ct_icp/ct_icp.cpp:69-73)
  * the 3-prime multiplicative hash of ``std::hash<slam::Voxel>``
    (reference include/SlamCore/types.h:611-623), reduced to uint32 — used both
    for the device hash table probing and for grouping.
"""

import jax.numpy as jnp
import numpy as np

# Primes of the reference voxel hash (types.h:615-618). numpy scalars, NOT
# jnp: a module-level jnp constant is an eager device array, and capturing a
# pre-existing device array in a jitted program permanently degrades the
# whole axon client ~150x (see docs/PERF.md, "the device-constant cliff").
_KP1 = np.uint32(73856093)
_KP2 = np.uint32(19349669)
_KP3 = np.uint32(83492791)


def voxel_coords(points, voxel_size):
    """Points [..., 3] -> int32 voxel coords [..., 3], truncated toward zero."""
    return jnp.trunc(points / voxel_size).astype(jnp.int32)


def voxel_hash_u32(coords):
    """Voxel int coords [..., 3] -> uint32 hash (reference 3-prime scheme)."""
    c = coords.astype(jnp.uint32)
    return c[..., 0] * _KP1 + c[..., 1] * _KP2 + c[..., 2] * _KP3


def lexsort_order(coords, valid):
    """Stable order grouping identical voxels together; invalid rows last.

    Returns the permutation such that coords[order] is sorted by
    (~valid, x, y, z) — all points of one voxel are contiguous and the point
    with the smallest original index comes first in its group.
    """
    inv = (~valid).astype(jnp.int32)
    keys = (coords[..., 2], coords[..., 1], coords[..., 0], inv)
    return jnp.lexsort(keys)


def group_starts(sorted_coords, sorted_valid):
    """Boolean mask of the first element of each voxel group (sorted order)."""
    n = sorted_coords.shape[0]
    same_as_prev = jnp.all(sorted_coords[1:] == sorted_coords[:-1], axis=-1)
    first = jnp.concatenate([jnp.ones((1,), bool), ~same_as_prev])
    return first & sorted_valid


def compact_mask(mask, capacity):
    """Pack the True positions of ``mask`` [N] into the front of a buffer.

    Sort-free: positions come from a prefix sum and land via scatter, so the
    packed order is the original order (what a stable argsort would give) at
    a fraction of the cost.

    Returns (indices [capacity] int32, count int32, out_valid [capacity] bool).
    Slots beyond ``count`` point at arbitrary entries and must stay masked.
    """
    n = mask.shape[0]
    pid = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dst = jnp.where(mask & (pos < capacity), pos, capacity)
    idx = jnp.zeros((capacity,), jnp.int32).at[dst].set(pid, mode="drop")
    count = jnp.sum(mask).astype(jnp.int32)
    out_valid = jnp.arange(capacity, dtype=jnp.int32) < count
    return idx, jnp.minimum(count, capacity), out_valid
