"""Probe: which kernel construct costs the MT-rate gap.

Pure dense MT (fori over VMEM-resident chunks) measures ~50G pairs/s at
tile=256, but the full stream kernel delivers 20-27G. Candidate culprits,
each isolated here on identical data/shapes:

  base        fori over resident chunks (the 50G reference)
  cond        each chunk's MT wrapped in a data-dependent lax.cond (true)
  dma         chunks double-buffer-DMA'd from HBM, no conds
  dma_cond    DMA + per-chunk cond (the stream leaf loop's shape)
  refresh     base + scalar read of max(best_t) every 4th chunk
  while       base, but a while_loop with explicit counter instead of fori

Run: env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_kernel_overheads.py
"""

import functools
import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BIG = 3.4e38
    reps = int(os.environ.get("PROBE_REPS", 6))
    n_chunks = int(os.environ.get("PROBE_CHUNKS", 256))
    tile = int(os.environ.get("PROBE_TILE", 256))
    CR = 16

    def mt_one(tri_at, rays, c, best_t, best_s):
        ox, oy, oz, dx, dy, dz = rays
        sub_iota = jax.lax.broadcasted_iota(
            jnp.int32, (CR, 1), 0).astype(jnp.float32)
        chunk_t = jnp.full((1, tile), BIG, jnp.float32)
        chunk_s = jnp.full((1, tile), -1.0, jnp.float32)
        for i in range(8):
            def col(j):
                return tri_at(i * 16 + j)
            v0x, v0y, v0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)
            tid = col(9)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = det > 0.0
            invd = 1.0 / jnp.where(det == 0.0, 1.0, det)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * invd
            ok = ok & (u >= 0.0) & (u <= 1.0)
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * invd
            ok = ok & (v >= 0.0) & (u + v <= 1.0)
            tt = (e2x * qx + e2y * qy + e2z * qz) * invd
            ok = ok & (tt > 0.0) & (tid >= 0.0)
            t_m = jnp.where(ok, tt, BIG)
            slot = (c * CR + sub_iota) * 8.0 + i
            grp_min = jnp.min(t_m, axis=0, keepdims=True)
            slot_cand = jnp.where(t_m == grp_min, slot, BIG)
            grp_slot = jnp.min(slot_cand, axis=0, keepdims=True)
            take = grp_min <= chunk_t
            chunk_t = jnp.where(take, grp_min, chunk_t)
            chunk_s = jnp.where(take, grp_slot, chunk_s)
        take = (chunk_t < BIG) & (chunk_t <= best_t)
        return (jnp.where(take, chunk_t, best_t),
                jnp.where(take, chunk_s, best_s))

    def rays_of(o_ref, d_ref):
        return (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :],
                d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])

    def resident_at(tris_ref, c):
        def at(j):
            v = tris_ref[pl.ds(c * CR, CR), j:j + 1]
            return v.reshape(CR, 1)
        return at

    def buf_at(tri_buf, slot):
        def at(j):
            return tri_buf[slot, :, j:j + 1].reshape(CR, 1)
        return at

    def k_base(tris_ref, o_ref, d_ref, t_ref, s_ref):
        rays = rays_of(o_ref, d_ref)

        def body(c, carry):
            bt, bs = carry
            return mt_one(resident_at(tris_ref, c), rays, c, bt, bs)

        bt, bs = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.full((1, tile), BIG, jnp.float32),
             jnp.full((1, tile), -1.0, jnp.float32)))
        t_ref[:] = bt
        s_ref[:] = bs

    def k_cond(tris_ref, o_ref, d_ref, t_ref, s_ref):
        rays = rays_of(o_ref, d_ref)

        def body(c, carry):
            bt, bs = carry
            pred = tris_ref[0, 0] > -1.0e30  # data-dependent, always true

            def go(bt, bs):
                return mt_one(resident_at(tris_ref, c), rays, c, bt, bs)

            return jax.lax.cond(pred, go, lambda bt, bs: (bt, bs), bt, bs)

        bt, bs = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.full((1, tile), BIG, jnp.float32),
             jnp.full((1, tile), -1.0, jnp.float32)))
        t_ref[:] = bt
        s_ref[:] = bs

    def k_while(tris_ref, o_ref, d_ref, t_ref, s_ref):
        rays = rays_of(o_ref, d_ref)

        def body(state):
            c, bt, bs = state
            bt, bs = mt_one(resident_at(tris_ref, c), rays, c, bt, bs)
            return c + 1, bt, bs

        _, bt, bs = jax.lax.while_loop(
            lambda st: st[0] < n_chunks, body,
            (jnp.int32(0),
             jnp.full((1, tile), BIG, jnp.float32),
             jnp.full((1, tile), -1.0, jnp.float32)))
        t_ref[:] = bt
        s_ref[:] = bs

    def k_refresh(tris_ref, o_ref, d_ref, t_ref, s_ref):
        rays = rays_of(o_ref, d_ref)

        def body(state):
            c, bt, bs, tu = state
            bt, bs = mt_one(resident_at(tris_ref, c), rays, c, bt, bs)
            tu = jax.lax.cond((c & 3) == 0,
                              lambda: jnp.max(bt) * 1.0,
                              lambda: tu)
            return c + 1, bt, bs, tu

        _, bt, bs, tu = jax.lax.while_loop(
            lambda st: (st[0] < n_chunks) & (st[3] > -1.0), body,
            (jnp.int32(0),
             jnp.full((1, tile), BIG, jnp.float32),
             jnp.full((1, tile), -1.0, jnp.float32),
             jnp.float32(BIG)))
        t_ref[:] = bt
        s_ref[:] = bs

    def k_dma(tris_hbm, o_ref, d_ref, t_ref, s_ref, tri_buf, tri_sem,
              *, conds):
        rays = rays_of(o_ref, d_ref)

        def start(c, slot):
            pltpu.make_async_copy(
                tris_hbm.at[pl.ds(c * CR, CR), :],
                tri_buf.at[slot], tri_sem.at[slot]).start()

        def wait(c, slot):
            pltpu.make_async_copy(
                tris_hbm.at[pl.ds(c * CR, CR), :],
                tri_buf.at[slot], tri_sem.at[slot]).wait()

        start(0, 0)

        def body(c, carry):
            bt, bs = carry
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                start(c + 1, 1 - slot)

            wait(c, slot)
            if conds:
                pred = o_ref[0, 0] < 1.0e30  # always true

                def go(bt, bs):
                    return mt_one(buf_at(tri_buf, slot), rays, c, bt, bs)

                return jax.lax.cond(pred, go, lambda bt, bs: (bt, bs),
                                    bt, bs)
            return mt_one(buf_at(tri_buf, slot), rays, c, bt, bs)

        bt, bs = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.full((1, tile), BIG, jnp.float32),
             jnp.full((1, tile), -1.0, jnp.float32)))
        t_ref[:] = bt
        s_ref[:] = bs

    def k_scalar(tris_ref, nodes_ref, o_ref, d_ref, t_ref, s_ref,
                 *, nreads, smem_nodes):
        """dma-free MT + per-chunk SERIAL scalar reads from the node
        array (VMEM or SMEM) — models the interval walk's pops/cull
        tests: each read's index depends on the previous value, like a
        real stack walk."""
        rays = rays_of(o_ref, d_ref)
        nn = nodes_ref.shape[0] // 8 if smem_nodes else nodes_ref.shape[0]

        def body(state):
            c, idx, bt, bs = state
            bt, bs = mt_one(resident_at(tris_ref, c), rays, c, bt, bs)
            # nreads dependent scalar loads per chunk
            def rd(_, idx):
                if smem_nodes:
                    v = nodes_ref[idx * 8]      # flat 1-D SMEM
                    nxt = (idx + v.astype(jnp.int32) + 1) % nn
                else:
                    v = nodes_ref[idx, 0]
                    nxt = (idx + v.astype(jnp.int32) + 1) % nn
                return nxt
            idx = jax.lax.fori_loop(0, nreads, rd, idx)
            return c + 1, idx, bt, bs

        _, idx, bt, bs = jax.lax.while_loop(
            lambda st: (st[0] < n_chunks) & (st[1] >= 0), body,
            (jnp.int32(0), jnp.int32(0),
             jnp.full((1, tile), BIG, jnp.float32),
             jnp.full((1, tile), -1.0, jnp.float32)))
        t_ref[:] = bt
        s_ref[:] = bs + idx.astype(jnp.float32) * 0.0

    # ----- data ---------------------------------------------------------
    rng = np.random.default_rng(0)
    ntri = n_chunks * 128
    rows16 = np.zeros((ntri, 16), np.float32)
    rows16[:, 0:3] = rng.uniform(-5, 5, (ntri, 3))
    rows16[:, 3:6] = rng.uniform(-0.1, 0.1, (ntri, 3))
    rows16[:, 6:9] = rng.uniform(-0.1, 0.1, (ntri, 3))
    rows16[:, 9] = np.arange(ntri)
    tris_rows = jnp.asarray(rows16.reshape(-1, 128))

    nray = 64 * 1024
    grid = nray // tile
    o = jnp.asarray(rng.uniform(-1, 1, (3, nray)).astype(np.float32))
    d = jnp.asarray(rng.uniform(-1, 1, (3, nray)).astype(np.float32))
    pairs = nray * ntri

    specs = dict(
        out_shape=[jax.ShapeDtypeStruct((1, nray), jnp.float32),
                   jax.ShapeDtypeStruct((1, nray), jnp.float32)],
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
    )
    dma_specs = dict(specs)
    dma_specs["in_specs"] = [pl.BlockSpec(memory_space=pl.ANY)] \
        + specs["in_specs"][1:]

    def run(name, call):
        jf = jax.jit(call)
        t0 = time.time()
        out = jf(tris_rows, o, d)
        _ = float(np.asarray(out))
        log(f"# {name} compile {time.time()-t0:.1f}s")
        t0 = time.time()
        out = jf(tris_rows, o, d)
        _ = float(np.asarray(out))
        t1 = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = jf(tris_rows, o, d)
        _ = float(np.asarray(out))
        tk = (time.time() - t0) / reps
        print(json.dumps({"variant": name, "pairs_per_s": pairs / tk,
                          "ms": tk * 1e3}), flush=True)

    def plain(kern, **kw):
        def call(tris, o, d):
            return pl.pallas_call(kern, **specs, **kw)(tris, o, d)[0].sum()
        return call

    def dma_call(conds):
        def call(tris, o, d):
            return pl.pallas_call(
                functools.partial(k_dma, conds=conds),
                **dma_specs,
                scratch_shapes=[
                    pltpu.VMEM((2, CR, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ])(tris, o, d)[0].sum()
        return call

    nodes_np = np.zeros((2048, 8), np.float32)  # value 0 -> idx walks +1
    nodes = jnp.asarray(nodes_np)
    nodes_flat = jnp.asarray(nodes_np.reshape(-1))  # SMEM: 1-D, no padding

    def scalar_call(nreads, smem):
        def call(tris, o, d):
            in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=(pltpu.SMEM if smem
                                                   else pltpu.VMEM)),
                        ] + specs["in_specs"][1:]
            sp = dict(specs)
            sp["in_specs"] = in_specs
            return pl.pallas_call(
                functools.partial(k_scalar, nreads=nreads,
                                  smem_nodes=smem),
                **sp)(tris, nodes_flat if smem else nodes, o, d)[0].sum()
        return call

    log(f"# device {jax.devices()[0]} tile={tile}")
    if os.environ.get("PROBE_SCALAR_ONLY"):
        run("base", plain(k_base))
        for k in (4, 16):
            run(f"scalar_vmem_{k}", scalar_call(k, False))
            run(f"scalar_smem_{k}", scalar_call(k, True))
        return
    run("base", plain(k_base))
    run("while", plain(k_while))
    run("cond", plain(k_cond))
    run("refresh", plain(k_refresh))
    run("dma", dma_call(False))
    run("dma_cond", dma_call(True))
    for k in (4, 16):
        run(f"scalar_vmem_{k}", scalar_call(k, False))
        run(f"scalar_smem_{k}", scalar_call(k, True))


if __name__ == "__main__":
    main()
