"""Decompose voxel_subsample_indices cost at bench shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_subsample.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tools._timing import chained, force_sync_mode

from ct_icp_tpu.ops import sampling as smp
from ct_icp_tpu.ops import voxel as vx


def main():
    force_sync_mode()
    rng = np.random.default_rng(0)
    n = 65536
    pts = jnp.asarray(rng.uniform(-50, 50, (n, 3)), jnp.float32)
    valid = jnp.arange(n) < 48979
    vs = jnp.float32(0.5)

    for tl in (22, 20, 19, 18):
        fn = jax.jit(lambda p, v: smp.voxel_subsample_indices(
            p, v, vs, 16384, table_log2=tl))
        t = chained(fn, pts, valid)
        _, ok, cnt = fn(pts, valid)
        print(f"subsample table_log2={tl}:  {t:7.2f} ms  (kept {int(cnt)})",
              flush=True)

    # pieces at table_log2=22
    t22 = 1 << 22
    coords = vx.voxel_coords(pts, vs)
    h = (vx.voxel_hash_u32(coords) & jnp.uint32(t22 - 1)).astype(jnp.int32)
    pid = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready(h)

    def claim_only(h, valid):
        return jnp.full((t22,), jnp.int32(2147483647)).at[
            jnp.where(valid, h, t22)].min(pid, mode="drop")
    t = chained(jax.jit(claim_only), h, valid)
    print(f"claim scatter-min @4M:      {t:7.2f} ms", flush=True)

    claim = jax.jit(claim_only)(h, valid)
    jax.block_until_ready(claim)

    def gather_back(claim, h, valid):
        return valid & (claim[h] == pid)
    t = chained(jax.jit(gather_back), claim, h, valid)
    print(f"claim[h] gather-back:       {t:7.2f} ms", flush=True)

    mask = jax.jit(gather_back)(claim, h, valid)
    jax.block_until_ready(mask)
    t = chained(jax.jit(lambda m: vx.compact_mask(m, 16384)), mask)
    print(f"compact_mask:               {t:7.2f} ms", flush=True)

    t = chained(jax.jit(lambda p: vx.voxel_hash_u32(
        vx.voxel_coords(p, vs))), pts)
    print(f"coords+hash:                {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
