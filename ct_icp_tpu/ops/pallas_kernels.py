"""Pallas TPU kernels for the scatter/gather-bound hot ops.

XLA's TPU lowering of scatters and row-gathers processes a handful of rows
per cycle through the scalar core — the voxel-grid dedup of a 131k-point scan
costs ~30 ms as XLA scatter+gather even though it touches only a few MB. The
Pallas kernel keeps the claim table in VMEM and runs the whole
first-wins dedup + compaction as one sequential sweep on-chip (~2 scalar ops
per point), orders of magnitude less overhead per element.

Used on TPU only; the XLA path (ops/sampling.py) remains the portable
fallback (and the semantics oracle for tests).
"""

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only in this environment
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK and jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("capacity", "table_log2"))
def dedup_compact(h, n_valid, capacity: int, table_log2: int = 21):
    """First-occurrence selection + compaction, on-chip.

    Args:
      h: [N] int32 slot ids in [0, 2**table_log2) (hash of the voxel coords).
      n_valid: scalar int32 — entries with index >= n_valid are ignored.
      capacity: static output size.
      table_log2: VMEM claim-table size (2**21 x 4B = 8 MB).

    Returns:
      (idx [capacity] int32 — selected input indices in scan order,
       count int32).
    """
    n = h.shape[0]
    t = 1 << table_log2
    chunk = 8 * 128

    def kernel(h_ref, nv_ref, idx_ref, cnt_ref, table):
        # init the claim table and the output buffer (vector memsets)
        def init_table(c, _):
            table[pl.ds(c * chunk, chunk)] = jnp.full((chunk,), -1, jnp.int32)
            return 0

        jax.lax.fori_loop(0, t // chunk, init_table, 0)

        def init_idx(c, _):
            idx_ref[pl.ds(c * chunk, chunk)] = jnp.zeros((chunk,), jnp.int32)
            return 0

        jax.lax.fori_loop(0, max(capacity // chunk, 1), init_idx, 0)
        if capacity % chunk:
            idx_ref[pl.ds(capacity - capacity % chunk, capacity % chunk)] = \
                jnp.zeros((capacity % chunk,), jnp.int32)

        nv = nv_ref[0]

        # sequential first-wins claim + compaction
        def body(i, cursor):
            hi = h_ref[i]
            cur = table[hi]
            take = (cur < 0) & (i < nv) & (cursor < capacity)

            @pl.when(take)
            def _():
                table[hi] = i
                idx_ref[cursor] = i

            return jnp.where(take, cursor + 1, cursor)

        cursor = jax.lax.fori_loop(0, n, body, jnp.int32(0))
        cnt_ref[0] = cursor

    idx, cnt = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((capacity,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((t,), jnp.int32)],
    )(h, jnp.asarray(n_valid, jnp.int32).reshape(1))
    return idx, cnt[0]


def voxel_subsample_indices_pallas(points, valid, voxel_size, capacity,
                                   table_log2: int = 21):
    """Drop-in TPU variant of sampling.voxel_subsample_indices."""
    from ct_icp_tpu.ops import voxel as vx
    n = points.shape[0]
    coords = vx.voxel_coords(points, voxel_size)
    t = 1 << table_log2
    h = (vx.voxel_hash_u32(coords) & jnp.uint32(t - 1)).astype(jnp.int32)
    # invalid entries get an out-of-range marker slot 0 claimed by index < 0?
    # simpler: point them at a dedicated slot and drop by n_valid ordering —
    # valid is a prefix mask in this pipeline (padding tail), so n_valid
    # suffices
    n_valid = jnp.sum(valid.astype(jnp.int32))
    idx, count = dedup_compact(h, n_valid, capacity, table_log2)
    out_valid = jnp.arange(capacity, dtype=jnp.int32) < count
    return idx, out_valid, count
