"""Measure the per-ICP-iteration rescore pipeline at bench shapes:
moments_from_planes + description_from_moments (+ weights).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_rescore.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tools._timing import chained, force_sync_mode

from ct_icp_tpu.mapping import voxel_map as vm
from ct_icp_tpu.ops.neighborhood import description_from_moments


def main():
    force_sync_mode()
    rng = np.random.default_rng(0)
    m, o, p = 2048, 27, 30
    rows = jnp.asarray(rng.normal(size=(m, o, 3 * p)), jnp.float32)
    cnt = jnp.asarray(rng.integers(0, p, (m, o)), jnp.int32)
    queries = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)

    mom = jax.jit(lambda r, c, q: vm.moments_from_planes(r, c, q, 0.75))
    t = chained(mom, rows, cnt, queries)
    print(f"moments_from_planes [2048,27,30]:   {t:7.3f} ms", flush=True)

    count, sum_rel, sum_outer, closest, cd = mom(rows, cnt, queries)
    jax.block_until_ready(count)

    desc = jax.jit(lambda c, sr, so, q: description_from_moments(
        c.astype(jnp.float32), sr, so, q))
    t = chained(desc, count, sum_rel, sum_outer, queries)
    print(f"description_from_moments [2048]:    {t:7.3f} ms", flush=True)

    # tax reference: trivial op on same input sizes
    triv = jax.jit(lambda r: jnp.sum(r, axis=(1, 2)))
    t = chained(triv, rows)
    print(f"trivial reduce of rows:             {t:7.3f} ms", flush=True)

    # full rescore chain fused in one jit
    def full(rows, cnt, queries):
        c, sr, so, cl, cd = vm.moments_from_planes(rows, cnt, queries, 0.75)
        d = description_from_moments(c.astype(jnp.float32), sr, so, queries)
        return d.normal, d.planarity, cl, cd
    t = chained(jax.jit(full), rows, cnt, queries)
    print(f"full rescore chain (one jit):       {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
