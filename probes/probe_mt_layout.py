"""Probe: dense Moller-Trumbore throughput by operand layout.

The stream kernel's MT ops at tile=256 are [CHUNK_ROWS=16, 256] (4 native
vregs per instruction) and measure 23-27G pairs/s; at tile=1024 the same
math issues [16, 1024] (16 vregs) and reaches 47G — per-instruction
overhead dominates small ops. Hypothesis: transposing the chunk so rays
ride the SUBLANE axis and 128 window-triangles ride the LANE axis makes
every op [tile, 128] (32 vregs at tile=256), buying tile-1024 issue
efficiency at tile-256 packet granularity.

Also measures the plane-precomputed intersector (normal + plane offset
rows replace one cross product) in the transposed layout.

Run: env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_mt_layout.py
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

    # ----- kernels ------------------------------------------------------
    def mt_rows(tri_ref, o_ref, d_ref, t_ref, s_ref, *, tile, cr, nck):
        """Current layout: chunk rows [cr, 128], 8 tris of 16 attrs per
        row; ops [cr, tile] via [cr,1]x[1,tile] broadcasts."""
        ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
        dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
        sub_iota = jax.lax.broadcasted_iota(
            jnp.int32, (cr, 1), 0).astype(jnp.float32)

        def chunk(c, carry):
            best_t, best_s = carry
            chunk_t = jnp.full((1, tile), BIG, jnp.float32)
            chunk_s = jnp.full((1, tile), -1.0, jnp.float32)
            for i in range(8):
                def col(j):
                    v = tri_ref[pl.ds(c * cr, cr), i * 16 + j:i * 16 + j + 1]
                    return v.reshape(cr, 1)
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
                slot = (c * cr + sub_iota) * 8.0 + i
                grp_min = jnp.min(t_m, axis=0, keepdims=True)
                slot_cand = jnp.where(t_m == grp_min, slot, BIG)
                grp_slot = jnp.min(slot_cand, axis=0, keepdims=True)
                take = grp_min <= chunk_t
                chunk_t = jnp.where(take, grp_min, chunk_t)
                chunk_s = jnp.where(take, grp_slot, chunk_s)
            take = (chunk_t < BIG) & (chunk_t <= best_t)
            return (jnp.where(take, chunk_t, best_t),
                    jnp.where(take, chunk_s, best_s))

        best = (jnp.full((1, tile), BIG, jnp.float32),
                jnp.full((1, tile), -1.0, jnp.float32))
        best_t, best_s = jax.lax.fori_loop(0, nck, chunk, best)
        t_ref[:] = best_t
        s_ref[:] = best_s

    def so_rows_k(tri_ref, d_ref, t_ref, s_ref, *, tile, cr, nck):
        """Shared-origin signed-volume math in the rows16 layout (cols
        0-2 ab, 3-5 bc, 6-8 ca, 9 d0, 10 tid) — isolates the SO dense
        rate to split in-kernel frame time into math vs bubbles."""
        dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
        sub_iota = jax.lax.broadcasted_iota(
            jnp.int32, (cr, 1), 0).astype(jnp.float32)

        def chunk(c, carry):
            best_t, best_s = carry
            t_acc = jnp.full((cr, tile), BIG, jnp.float32)
            s_acc = jnp.full((cr, tile), -1.0, jnp.float32)
            for i in range(8):
                def col(j):
                    v = tri_ref[pl.ds(c * cr, cr), i * 16 + j:i * 16 + j + 1]
                    return v.reshape(cr, 1)
                s1 = dx * col(0) + dy * col(1) + dz * col(2)
                s2 = dx * col(3) + dy * col(4) + dz * col(5)
                s3 = dx * col(6) + dy * col(7) + dz * col(8)
                dsum = s1 + s2 + s3
                ok = (s1 <= 0.0) & (s2 <= 0.0) & (s3 <= 0.0) & (dsum < 0.0)
                tt = col(9) * (1.0 / jnp.where(dsum == 0.0, 1.0, dsum))
                ok = ok & (tt > 0.0)
                t_m = jnp.where(ok, tt, BIG)
                slot = (c * cr + sub_iota) * 8.0 + i
                take = t_m <= t_acc
                t_acc = jnp.where(take, t_m, t_acc)
                s_acc = jnp.where(take, slot, s_acc)
            chunk_t = jnp.min(t_acc, axis=0, keepdims=True)
            slot_cand = jnp.where(t_acc == chunk_t, s_acc, BIG)
            chunk_s = jnp.min(slot_cand, axis=0, keepdims=True)
            take = (chunk_t < BIG) & (chunk_t <= best_t)
            return (jnp.where(take, chunk_t, best_t),
                    jnp.where(take, chunk_s, best_s))

        best = (jnp.full((1, tile), BIG, jnp.float32),
                jnp.full((1, tile), -1.0, jnp.float32))
        best_t, best_s = jax.lax.fori_loop(0, nck, chunk, best)
        t_ref[:] = best_t
        s_ref[:] = best_s

    def mt_T(tri_ref, o_ref, t_ref, s_ref, *, tile, nck, plane):
        """Transposed layout: window w rows [16w:16w+16) hold attribute j
        of 128 tris in row j's lanes; ops are [tile, 128]."""
        OX, OY, OZ = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
        DX, DY, DZ = o_ref[:, 3:4], o_ref[:, 4:5], o_ref[:, 5:6]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1).astype(jnp.float32)

        def chunk(c, carry):
            best_t, best_s = carry
            r0 = c * 16

            def row(j):
                return tri_ref[pl.ds(r0 + j, 1), :]    # [1, 128]
            if plane:
                nx, ny, nz, d0 = row(10), row(11), row(12), row(13)
                den = nx * DX + ny * DY + nz * DZ
                ok = den < 0.0
                num = d0 - (nx * OX + ny * OY + nz * OZ)
                tt = num / jnp.where(den == 0.0, 1.0, den)
                # hit point barycentrics via two precomputed gradients
                bux, buy, buz, cu = row(3), row(4), row(5), row(9)
                bvx, bvy, bvz, cv = row(6), row(7), row(8), row(14)
                hx = OX + tt * DX
                hy = OY + tt * DY
                hz = OZ + tt * DZ
                u = hx * bux + hy * buy + hz * buz + cu
                v = hx * bvx + hy * bvy + hz * bvz + cv
                tid = row(15)
                ok = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (tt > 0.0) & (tid >= 0.0))
            else:
                v0x, v0y, v0z = row(0), row(1), row(2)
                e1x, e1y, e1z = row(3), row(4), row(5)
                e2x, e2y, e2z = row(6), row(7), row(8)
                tid = row(9)
                px = DY * e2z - DZ * e2y
                py = DZ * e2x - DX * e2z
                pz = DX * e2y - DY * e2x
                det = e1x * px + e1y * py + e1z * pz
                ok = det > 0.0
                invd = 1.0 / jnp.where(det == 0.0, 1.0, det)
                tx, ty, tz = OX - v0x, OY - v0y, OZ - v0z
                u = (tx * px + ty * py + tz * pz) * invd
                ok = ok & (u >= 0.0) & (u <= 1.0)
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (DX * qx + DY * qy + DZ * qz) * invd
                ok = ok & (v >= 0.0) & (u + v <= 1.0)
                tt = (e2x * qx + e2y * qy + e2z * qz) * invd
                ok = ok & (tt > 0.0) & (tid >= 0.0)
            t_m = jnp.where(ok, tt, BIG)
            slot = c * 128.0 + lane
            w_min = jnp.min(t_m, axis=1, keepdims=True)     # [tile, 1]
            slot_cand = jnp.where(t_m == w_min, slot, BIG)
            w_slot = jnp.min(slot_cand, axis=1, keepdims=True)
            take = (w_min < BIG) & (w_min <= best_t)
            return (jnp.where(take, w_min, best_t),
                    jnp.where(take, w_slot, best_s))

        best = (jnp.full((tile, 1), BIG, jnp.float32),
                jnp.full((tile, 1), -1.0, jnp.float32))
        best_t, best_s = jax.lax.fori_loop(0, nck, chunk, best)
        t_ref[:] = jnp.concatenate(
            [best_t, best_s] + [best_t] * 6, axis=1)
        s_ref[:] = best_s

    # ----- data ---------------------------------------------------------
    rng = np.random.default_rng(0)
    ntri = n_chunks * 128
    v0 = rng.uniform(-5, 5, (ntri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (ntri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (ntri, 3)).astype(np.float32)
    tid = np.arange(ntri, dtype=np.float32)
    n = np.cross(e1, e2)
    d0 = np.einsum("ij,ij->i", n, v0)
    # barycentric gradients: u = dot(p, bu) + cu with bu solving the 3x3
    den = np.einsum("ij,ij->i", n, n)
    bu = np.cross(e2, n) / den[:, None]
    bv = np.cross(n, e1) / den[:, None]
    cu = -np.einsum("ij,ij->i", bu, v0)
    cv = -np.einsum("ij,ij->i", bv, v0)

    rows16 = np.zeros((ntri, 16), np.float32)
    rows16[:, 0:3] = v0
    rows16[:, 3:6] = e1
    rows16[:, 6:9] = e2
    rows16[:, 9] = tid
    tris_rows = rows16.reshape(-1, 128)          # [ntri/8, 128]

    # transposed windows: [16*W, 128], MT attrs + plane attrs
    tT = np.zeros((16, n_chunks, 128), np.float32)
    attrs = {0: v0[:, 0], 1: v0[:, 1], 2: v0[:, 2],
             3: e1[:, 0], 4: e1[:, 1], 5: e1[:, 2],
             6: e2[:, 0], 7: e2[:, 1], 8: e2[:, 2], 9: tid,
             10: n[:, 0], 11: n[:, 1], 12: n[:, 2], 13: d0}
    for j, a in attrs.items():
        tT[j] = a.reshape(n_chunks, 128)
    tT = np.swapaxes(tT, 0, 1).reshape(-1, 128)  # [16W, 128]

    # plane layout variant: rows 3-5 bu, 6-8 bv, 9 cu, 14 cv, 15 tid
    tP = np.zeros((16, n_chunks, 128), np.float32)
    pattrs = {0: v0[:, 0], 1: v0[:, 1], 2: v0[:, 2],
              3: bu[:, 0], 4: bu[:, 1], 5: bu[:, 2],
              6: bv[:, 0], 7: bv[:, 1], 8: bv[:, 2], 9: cu,
              10: n[:, 0], 11: n[:, 1], 12: n[:, 2], 13: d0,
              14: cv, 15: tid}
    for j, a in pattrs.items():
        tP[j] = a.reshape(n_chunks, 128)
    tP = np.swapaxes(tP, 0, 1).reshape(-1, 128)

    import jax.numpy as jnp

    def run(name, fn, args, pairs):
        jf = jax.jit(fn)
        t0 = time.time()
        out = jf(*args)
        chk = float(np.asarray(out))
        log(f"# {name} compile {time.time()-t0:.1f}s chk={chk:.6g}")
        t0 = time.time()
        out = jf(*args)
        _ = np.asarray(out)
        t1 = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = jf(*args)
        _ = np.asarray(out)
        tk = (time.time() - t0) / reps
        rate = pairs / tk
        print(json.dumps({"layout": name, "pairs_per_s": rate,
                          "ms": tk * 1e3}), flush=True)
        return rate

    dev = jax.devices()[0]
    log(f"# device {dev}")

    for tile in (256, 512, 1024):
        nray = 64 * 1024
        grid = nray // tile
        o = rng.uniform(-1, 1, (3, nray)).astype(np.float32)
        d = rng.uniform(-1, 1, (3, nray)).astype(np.float32)
        od = np.concatenate([o, d], 0).T.copy()       # [nray, 6]
        od8 = np.concatenate(
            [od, np.zeros((nray, 2), np.float32)], 1)  # [nray, 8]
        pairs = nray * ntri

        def call_rows(tris, o, d, tile=tile):
            return pl.pallas_call(
                functools.partial(mt_rows, tile=tile, cr=16,
                                  nck=n_chunks),
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
            )(tris, o, d)[0].sum()

        def call_T(tris, od8, *, plane, tile=tile):
            return pl.pallas_call(
                functools.partial(mt_T, tile=tile, nck=n_chunks,
                                  plane=plane),
                out_shape=[
                    jax.ShapeDtypeStruct((nray, 8), jnp.float32),
                    jax.ShapeDtypeStruct((nray, 1), jnp.float32)],
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((tile, 8), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((tile, 8), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)],
            )(tris, od8)[0][:, 0].sum()

        run(f"rows16-tile{tile}", call_rows,
            (jnp.asarray(tris_rows), jnp.asarray(o), jnp.asarray(d)),
            pairs)
        run(f"T-mt-tile{tile}",
            functools.partial(call_T, plane=False),
            (jnp.asarray(tT), jnp.asarray(od8)), pairs)
        run(f"T-plane-tile{tile}",
            functools.partial(call_T, plane=True),
            (jnp.asarray(tP), jnp.asarray(od8)), pairs)

        def call_so(tris, d, tile=tile):
            return pl.pallas_call(
                functools.partial(so_rows_k, tile=tile, cr=16,
                                  nck=n_chunks),
                out_shape=[jax.ShapeDtypeStruct((1, nray), jnp.float32),
                           jax.ShapeDtypeStruct((1, nray), jnp.float32)],
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec((3, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((1, tile), lambda i: (0, i),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((1, tile), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)],
            )(tris, d)[0].sum()

        # rows reinterpreted as SO terms — rates only, math shape matches
        run(f"SO-rows16-tile{tile}", call_so,
            (jnp.asarray(tris_rows), jnp.asarray(d)), pairs)


if __name__ == "__main__":
    main()
