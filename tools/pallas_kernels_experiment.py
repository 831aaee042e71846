"""Pallas TPU experiments for the scatter-bound dedup op.

Status: measured SLOWER than the XLA path and therefore NOT used in the
production pipeline. Kept as a documented experiment + test fixture.

Background: the voxel-grid dedup of a 131k-point scan costs ~30 ms through
XLA's scatter/gather lowering (~230 ns/row through the scalar core). The
kernel below keeps the claim table in VMEM and runs first-wins dedup +
compaction as one on-chip sweep — but Mosaic only allows (8,128)-tile-aligned
VMEM access, so every element costs a ~10-vector-op read-modify-write and the
sequential sweep lands at ~100 ms for 131k points: the per-iteration loop
overhead of the scalar core dominates. Conclusion recorded for future rounds:
beating XLA scatter here needs a fundamentally parallel formulation (e.g.
grid-parallel partial tables + merge), not a faster sequential sweep.
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

    assert n % 1024 == 0 and capacity % 1024 == 0 and t % 1024 == 0

    def kernel(h_ref, nv_ref, idx_ref, cnt_ref, table):
        # flattened (8,128)-tile ids 0..1023 for lane selects
        flat_id = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))

        # init the claim table and the output buffer (vector memsets); all
        # addressing is (8,128)-tile aligned — Mosaic's int32 VMEM granule
        def init_table(c, _):
            table[pl.ds(pl.multiple_of(c * 8, 8), 8), :] = jnp.full(
                (8, 128), -1, jnp.int32)
            return 0

        jax.lax.fori_loop(0, t // 1024, init_table, 0)

        def init_idx(c, _):
            idx_ref[pl.ds(pl.multiple_of(c * 8, 8), 8), :] = jnp.zeros(
                (8, 128), jnp.int32)
            return 0

        jax.lax.fori_loop(0, capacity // 1024, init_idx, 0)

        nv = nv_ref[0]

        # sequential first-wins claim + compaction. All VMEM accesses are
        # tile-aligned (8,128) read-modify-writes; scalars come out of the
        # vectors via flat-id selects.
        def outer(b, cursor):
            hblk = h_ref[pl.ds(pl.multiple_of(b * 8, 8), 8), :]   # (8,128)

            def inner(j, cursor):
                i = b * 1024 + j
                hi = jnp.sum(jnp.where(flat_id == j, hblk, 0))
                blk = hi >> 10
                lane = hi & 1023
                vec = table[pl.ds(pl.multiple_of(blk * 8, 8), 8), :]
                cur = jnp.sum(jnp.where(flat_id == lane, vec, 0))
                take = (cur < 0) & (i < nv) & (cursor < capacity)

                @pl.when(take)
                def _():
                    table[pl.ds(pl.multiple_of(blk * 8, 8), 8), :] = \
                        jnp.where(flat_id == lane, i, vec)
                    cblk = cursor >> 10
                    clane = cursor & 1023
                    ovec = idx_ref[pl.ds(pl.multiple_of(cblk * 8, 8), 8), :]
                    idx_ref[pl.ds(pl.multiple_of(cblk * 8, 8), 8), :] = \
                        jnp.where(flat_id == clane, i, ovec)

                return jnp.where(take, cursor + 1, cursor)

            return jax.lax.fori_loop(0, 1024, inner, cursor)

        cursor = jax.lax.fori_loop(0, n // 1024, outer, jnp.int32(0))
        cnt_ref[0] = cursor

    idx2d, cnt = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((capacity // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((t // 128, 128), jnp.int32)],
    )(h.reshape(n // 128, 128), jnp.asarray(n_valid, jnp.int32).reshape(1))
    return idx2d.reshape(capacity), cnt[0]


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
