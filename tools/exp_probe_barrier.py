"""Does an optimization_barrier between window-build and row-gather fix the
probe pathology in find_slots_with_count?"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000, out


def main():
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.ops import voxel as vx

    _ = np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones(8)))  # sync mode
    rng = np.random.default_rng(0)
    c = 1 << 19
    level = vm.make_level(19, 40)
    # fill keys/counts directly (content irrelevant for timing)
    keys = rng.integers(2, 2**32, c, dtype=np.uint64).astype(np.uint32)
    level = level._replace(keys=jnp.asarray(keys),
                           count=jnp.asarray(
                               rng.integers(0, 40, c).astype(np.int32)))

    m = 2048
    for o in (27, 125):
        coords = jnp.asarray(rng.integers(-100, 100, (m, o, 3))
                             .astype(np.int32))

        t, _ = timeit(jax.jit(
            lambda cds: vm.find_slots_with_count(level, cds)), coords)
        print(f"[{m},{o}] find_slots_with_count (current): {t:7.2f} ms")

        def with_barrier(cds):
            shape = cds.shape[:-1]
            flat = cds.reshape(-1, 3)
            h = vx.voxel_hash_u32(flat)
            k2 = vm.voxel_key_u32(flat)
            win = jnp.concatenate(
                [vm._key_window(level.keys),
                 vm._key_window(level.count.astype(jnp.uint32))], axis=1)
            win = jax.lax.optimization_barrier(win)
            rows = win[(h & jnp.uint32(c - 1)).astype(jnp.int32)]
            j, any_hit = vm._select_first_match(
                rows[:, :vm.PROBE_WINDOW], k2)
            slot = ((h + j.astype(jnp.uint32))
                    & jnp.uint32(c - 1)).astype(jnp.int32)
            cnt = jnp.take_along_axis(
                rows[:, vm.PROBE_WINDOW:], j[:, None], axis=-1)[:, 0]
            return (jnp.where(any_hit, slot, -1).reshape(shape),
                    jnp.where(any_hit, cnt.astype(jnp.int32), 0)
                    .reshape(shape))

        t, _ = timeit(jax.jit(with_barrier), coords)
        print(f"[{m},{o}] with optimization_barrier:       {t:7.2f} ms")


if __name__ == "__main__":
    main()
