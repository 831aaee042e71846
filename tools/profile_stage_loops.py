"""Exact per-stage device times via in-dispatch fori_loop repetition.

Each stage runs R times inside ONE jitted program (carry-threaded so XLA
cannot CSE the iterations away); (t(R2) - t(R1)) / (R2 - R1) is the pure
device cost of one stage execution, with the tunnel RTT and dispatch tax
fully cancelled. This is the ground truth the single-dispatch timers
(profile_stages.py) cannot give over a ~25 ms-RTT tunnel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_stage_loops.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, n=6):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1000


def per_iter(build, r1=4, r2=24, n=6):
    f1, f2 = build(r1), build(r2)
    t1, t2 = timed(f1, n=n), timed(f2, n=n)
    return (t2 - t1) / (r2 - r1), t1


def main():
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.odometry import pipeline as pl
    from ct_icp_tpu.ops import sampling as smp

    _ = np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones(8)))  # sync mode
    o = default_driving_profile()
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    n_scan = o.max_scan_points          # 131072
    sc = np.empty((n_scan, 3), np.float32)
    h = n_scan // 2
    sc[:h] = np.stack([rng.uniform(-20, 60, h), rng.uniform(-12, 12, h),
                       rng.normal(0, 0.05, h)], -1)
    sc[h:] = np.stack([rng.uniform(-20, 60, n_scan - h),
                       np.where(rng.uniform(size=n_scan - h) < 0.5, -12.0,
                                12.0) + rng.normal(0, 0.05, n_scan - h),
                       rng.uniform(0, 8, n_scan - h)], -1)
    scan = jnp.asarray(sc)
    alphas = jnp.asarray(rng.uniform(0, 1, n_scan).astype(np.float32))
    valid = jnp.ones((n_scan,), bool)
    packed = jnp.asarray(
        pl.pack_scan_u16(np.asarray(scan), np.asarray(alphas), n_scan,
                         n_scan))

    def mk_unpack(r):
        @jax.jit
        def f(p):
            def body(i, c):
                xyz, al = pl.unpack_scan(p)
                return c + xyz[i, 0] + al[i]
            return jax.lax.fori_loop(0, r, body, jnp.float32(0))
        return lambda: f(packed)

    c, base = per_iter(mk_unpack)
    print(f"unpack_scan 131k:        {c:7.3f} ms/iter (base {base:.1f})")

    def mk_subsample(r):
        @jax.jit
        def f(pts, al, v):
            def body(i, carry):
                s, acc = carry
                idx, ok, cnt = smp.voxel_subsample_indices(
                    pts + s, v, jnp.float32(0.5), 16384)
                return (s + 1e-4, acc + cnt)
            return jax.lax.fori_loop(0, r, body,
                                     (jnp.float32(0), jnp.int32(0)))
        return lambda: f(scan, alphas, valid)

    c, base = per_iter(mk_subsample)
    print(f"voxel_subsample 131k:    {c:7.3f} ms/iter (base {base:.1f})")

    sub = scan[:16384]
    subv = jnp.ones((16384,), bool)

    def mk_keypoints(r):
        @jax.jit
        def f(pts, v):
            def body(i, carry):
                s, acc = carry
                idx, ok, cnt = smp.voxel_subsample_indices(
                    pts + s, v, jnp.float32(1.5), 4096)
                return (s + 1e-4, acc + cnt)
            return jax.lax.fori_loop(0, r, body,
                                     (jnp.float32(0), jnp.int32(0)))
        return lambda: f(sub, subv)

    c, base = per_iter(mk_keypoints)
    print(f"keypoint sample 16k:     {c:7.3f} ms/iter (base {base:.1f})")

    # map level shaped like the steady-state bench map
    r0 = o.map_options.resolutions[0]
    level = vm.make_level(r0.capacity_log2, r0.max_num_points)
    ins0 = jax.jit(lambda lvl, p: vm.insert_points(
        lvl, p, jnp.ones((p.shape[0],), bool), jnp.float32(r0.resolution),
        jnp.float32(r0.min_distance_between_points), jnp.zeros(3),
        o.max_dirty_voxels, with_normals=False))
    # bench-like SURFFACE map (corridor ground + walls): ~16k occupied
    # voxels at 2^18 slots (~6% load). A uniform-random map instead lands
    # ~200k occupied voxels (~80% load), blows up the probe chains, and
    # overstates insert 4x — measured both ways.
    n_m = 230_000
    third = n_m // 3
    gx = rng.uniform(-20, 230, n_m)
    pts_np = np.empty((n_m, 3), np.float32)
    pts_np[:third] = np.stack([gx[:third], rng.uniform(-12, 12, third),
                               rng.normal(0, 0.05, third)], -1)
    pts_np[third:2 * third] = np.stack(
        [gx[third:2 * third], np.full(third, -12.0)
         + rng.normal(0, 0.05, third), rng.uniform(0, 8, third)], -1)
    pts_np[2 * third:] = np.stack(
        [gx[2 * third:], np.full(n_m - 2 * third, 12.0)
         + rng.normal(0, 0.05, n_m - 2 * third),
         rng.uniform(0, 8, n_m - 2 * third)], -1)
    pts_m = jnp.asarray(pts_np)
    for i in range(4):
        level, _ = ins0(level, pts_m[i * 57_000:(i + 1) * 57_000 + 2768])
    level = jax.block_until_ready(level)
    print(f"map points: {int(level.num_points)}")

    batch = scan[:16384]

    def mk_insert(r):
        @jax.jit
        def f(lvl, p):
            def body(i, carry):
                lvl, s = carry
                lvl, _ = vm.insert_points(
                    lvl, p + s, jnp.ones((p.shape[0],), bool),
                    jnp.float32(r0.resolution),
                    jnp.float32(r0.min_distance_between_points),
                    jnp.zeros(3), o.max_dirty_voxels, with_normals=False)
                return (lvl, s + 1e-4)
            out, _ = jax.lax.fori_loop(0, r, body, (lvl, jnp.float32(0)))
            return out.num_points
        return lambda: f(level, batch)

    c, base = per_iter(mk_insert, r1=2, r2=10)
    print(f"insert 16k (one level):  {c:7.3f} ms/iter (base {base:.1f})")

    kp = scan[:1536]
    kpv = jnp.ones((1536,), bool)

    def mk_gather(r):
        @jax.jit
        def f(lvl, q):
            def body(i, carry):
                s, acc = carry
                rows, cnt = vm.gather_candidate_planes(
                    lvl, q + s, kpv, jnp.float32(r0.resolution), 1)
                return (s + 1e-4, acc + jnp.sum(cnt) + rows[0, 0, 0])
            return jax.lax.fori_loop(0, r, body,
                                     (jnp.float32(0), jnp.float32(0)))
        return lambda: f(level, kp)

    c, base = per_iter(mk_gather)
    print(f"gather 1536x27:          {c:7.3f} ms/iter (base {base:.1f})")

    def mk_prune(r):
        @jax.jit
        def f(lvl):
            def body(i, carry):
                lvl, s = carry
                out = vm.prune_level(lvl, jnp.asarray([s, 0.0, 0.0]),
                                     jnp.float32(100.0))
                return (out, s + 1e-3)
            out, _ = jax.lax.fori_loop(0, r, body, (lvl, jnp.float32(0)))
            return out.num_points
        return lambda: f(level)

    c, base = per_iter(mk_prune, r1=2, r2=10)
    print(f"prune (one level):       {c:7.3f} ms/iter (base {base:.1f})")

    def mk_transform(r):
        @jax.jit
        def f(pts, al):
            qb = jnp.asarray([0.0, 0, 0, 1.0])
            te = jnp.asarray([0.8, 0.0, 0.0])

            def body(i, carry):
                s, acc = carry
                w = pl.transform_points(pts[:16384], al[:16384], qb,
                                        jnp.zeros(3) + s, qb, te)
                return (s + 1e-4, acc + w[0, 0])
            return jax.lax.fori_loop(0, r, body,
                                     (jnp.float32(0), jnp.float32(0)))
        return lambda: f(scan, alphas)

    c, base = per_iter(mk_transform)
    print(f"transform 16k:           {c:7.3f} ms/iter (base {base:.1f})")


if __name__ == "__main__" and "sub" not in __import__("sys").argv:
    main()


def insert_substages():
    """Sub-stage decomposition of insert_points at bench shapes."""
    from ct_icp_tpu.config.options import default_driving_profile
    from ct_icp_tpu.mapping import voxel_map as vm
    from ct_icp_tpu.ops import voxel as vx

    _ = np.asarray(jax.jit(lambda v: v + 1.0)(jnp.ones(8)))
    o = default_driving_profile()
    rng = np.random.default_rng(0)
    r0 = o.map_options.resolutions[0]
    level = vm.make_level(r0.capacity_log2, r0.max_num_points)
    ins0 = jax.jit(lambda lvl, p: vm.insert_points(
        lvl, p, jnp.ones((p.shape[0],), bool), jnp.float32(r0.resolution),
        jnp.float32(r0.min_distance_between_points), jnp.zeros(3),
        o.max_dirty_voxels, with_normals=False))
    n_m = 230_000
    third = n_m // 3
    gx = rng.uniform(-20, 230, n_m)
    pts_np = np.empty((n_m, 3), np.float32)
    pts_np[:third] = np.stack([gx[:third], rng.uniform(-12, 12, third),
                               rng.normal(0, 0.05, third)], -1)
    pts_np[third:2 * third] = np.stack(
        [gx[third:2 * third], np.full(third, -12.0)
         + rng.normal(0, 0.05, third), rng.uniform(0, 8, third)], -1)
    pts_np[2 * third:] = np.stack(
        [gx[2 * third:], np.full(n_m - 2 * third, 12.0)
         + rng.normal(0, 0.05, n_m - 2 * third),
         rng.uniform(0, 8, n_m - 2 * third)], -1)
    for i in range(4):
        level, _ = ins0(level, jnp.asarray(
            pts_np[i * 57_000:(i + 1) * 57_000 + 2768]))
    level = jax.block_until_ready(level)
    print(f"map points: {int(level.num_points)}")

    batch = jnp.asarray(pts_np[:16384] + 0.01)
    valid = jnp.ones((16384,), bool)
    c_, p_ = level.capacity, level.max_points

    def stage_fn(depth):
        """depth: 1=claim only, 2=+mindist, 3=+elect, 4=+scatters,
        5=+window rebuild (full insert sans normals)."""
        def one(lvl, pts, s):
            pts = pts + s
            coords = vx.voxel_coords(pts, jnp.float32(r0.resolution))
            h = vx.voxel_hash_u32(coords)
            keys = vm.voxel_key_u32(coords)
            table, assigned, resolved = vm._resolve_or_claim_slots(
                lvl.keys, keys, h, valid,
                keys_window=lvl.win[:, :vm.PROBE_WINDOW])
            slot = jnp.where(resolved, assigned, 0)
            if depth == 1:
                return lvl, jnp.sum(slot)
            rows = lvl.points[slot]
            ex, ey, ez = vm._xyz_planes(rows, p_)
            ecount = lvl.count[slot]
            in_cap = jnp.arange(p_, dtype=jnp.int32)[None, :] < ecount[:, None]
            d2 = ((ex - pts[:, 0:1]) ** 2 + (ey - pts[:, 1:2]) ** 2
                  + (ez - pts[:, 2:3]) ** 2)
            d2 = jnp.where(in_cap, d2, jnp.inf)
            far = (ecount == 0) | (jnp.min(d2, -1)
                                   > r0.min_distance_between_points ** 2)
            eligible = resolved & far & (ecount < p_)
            if depth == 2:
                return lvl, jnp.sum(eligible)
            rank, first = vm._elect_ranks(slot, eligible, c_, 4)
            eligible = eligible & (rank >= 0)
            pos = ecount + rank
            accept = eligible & (pos < p_)
            if depth == 3:
                return lvl, jnp.sum(accept)
            pid3 = 3 * jnp.arange(16384, dtype=jnp.int32)
            base = jnp.where(accept, slot * (p_ * 3) + pos,
                             c_ * p_ * 3 + pid3)
            flat = lvl.points.reshape(-1)
            off = jnp.where(accept, p_, 1)
            idx = jnp.concatenate([base, base + off, base + 2 * off])
            val = jnp.concatenate([pts[:, 0], pts[:, 1], pts[:, 2]])
            flat = flat.at[idx].set(val, mode="drop", unique_indices=True)
            new_points = flat.reshape(c_, p_ * 3)
            add = jnp.zeros((c_,), jnp.int32).at[
                jnp.where(accept, slot, c_)].add(1, mode="drop")
            new_count = lvl.count + add
            lvl2 = lvl._replace(keys=table, count=new_count,
                                points=new_points)
            if depth == 4:
                return lvl2, jnp.sum(accept)
            lvl2 = lvl2._replace(win=vm.build_window(table, new_count))
            return lvl2, jnp.sum(accept)

        def build(r):
            @jax.jit
            def f(lvl, pts):
                def body(i, carry):
                    lvl, s, acc = carry
                    lvl, a = one(lvl, pts, s)
                    return (lvl, s + 1e-4, acc + a)
                out = jax.lax.fori_loop(
                    0, r, body, (lvl, jnp.float32(0), jnp.int32(0)))
                return out[2]
            return lambda: f(level, batch)
        return build

    names = {1: "claim", 2: "+mindist", 3: "+elect", 4: "+scatters",
             5: "+window"}
    prev = 0.0
    for depth in (1, 2, 3, 4, 5):
        c, base = per_iter(stage_fn(depth), r1=2, r2=10)
        print(f"insert[{names[depth]:10s}]: {c:7.3f} ms/iter "
              f"(delta {c - prev:+.3f})")
        prev = c


if __name__ == "__main__" and "sub" in __import__("sys").argv:
    insert_substages()
