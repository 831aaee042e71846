"""Microbench the nv=2 candidate-search pieces at robust_driving shapes."""
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

    rng = np.random.default_rng(0)
    # level-1 robust shapes: capacity 2^19, P=40, ~13.5k occupied voxels
    level = vm.make_level(19, 40)
    npts = 160_000
    pts = rng.uniform(-60, 60, (npts, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) % 6.0   # flatten to a slab (realistic sheet)
    level, _ = vm.insert_points(level, jnp.asarray(pts),
                                jnp.ones(npts, bool), 0.5, 0.1,
                                jnp.zeros(3, jnp.float32), 1 << 14)
    jax.block_until_ready(level.count)
    print("occupied voxels:", int((level.count > 0).sum()),
          "pts:", int(level.count.sum()))

    m = 2048
    q = jnp.asarray(pts[rng.choice(npts, m)] + 0.1, jnp.float32)
    qv = jnp.ones(m, bool)

    for nv in (1, 2):
        o = (2 * nv + 1) ** 3
        offs = rng.integers(-nv, nv + 1, (m, o, 3)).astype(np.int32)
        qc = jax.jit(lambda q: vx.voxel_coords(q, jnp.float32(0.5)))(q)
        cand = jax.jit(lambda qc, offs: qc[:, None, :] + offs)(qc, jnp.asarray(offs))

        t, (slots, cnt) = timeit(
            jax.jit(lambda c: vm.find_slots_with_count(level, c)), cand)
        print(f"nv={nv}: find_slots_with_count [{m},{o}]:  {t:7.2f} ms")

        ok = cnt > 0
        oc = min(48, o)
        score = jnp.where(ok, 1.0, -1.0)
        t, _ = timeit(jax.jit(lambda s: jax.lax.top_k(s, oc)), score)
        print(f"nv={nv}: top_k({oc}) over [{m},{o}]:         {t:7.2f} ms")
        sel = jnp.argsort(-score, axis=1)[:, :oc]
        slot_c = jnp.take_along_axis(jnp.where(slots >= 0, slots, 0), sel, 1)
        t, rows = timeit(jax.jit(lambda s: level.points[s]), slot_c)
        print(f"nv={nv}: rows gather [{m},{oc},{level.points.shape[1]}]:"
              f"   {t:7.2f} ms")

        cnt_c = jnp.take_along_axis(cnt, sel, 1)
        t, _ = timeit(jax.jit(
            lambda r, c, q: vm.moments_from_planes(r, c, q, jnp.float32(0.8))),
            rows, cnt_c, q)
        print(f"nv={nv}: moments_from_planes:              {t:7.2f} ms")

        t, _ = timeit(jax.jit(
            lambda q: vm.gather_candidate_planes(
                level, q, qv, jnp.float32(0.5), nv,
                max_candidates=(48 if o > 27 else 0))), q)
        print(f"nv={nv}: gather_candidate_planes e2e:      {t:7.2f} ms")

        t, _ = timeit(jax.jit(
            lambda q: vm.ball_search(level, q, qv, jnp.float32(0.8),
                                     jnp.float32(0.5), nv=nv)), q)
        print(f"nv={nv}: ball_search e2e:                  {t:7.2f} ms")


if __name__ == "__main__":
    main()
