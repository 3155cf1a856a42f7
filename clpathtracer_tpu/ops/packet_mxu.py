"""MXU packet intersection: Möller–Trumbore as one matmul per 128 tris.

The stream kernel (ops/packet.py) is VPU issue-rate bound: dense MT costs
~40-55 vector ops per (ray, tri) pair, ~27G tests/s at tile=256 on one
v5e. But MT is a rank-10 bilinear form in (ray features) x (triangle
coefficients) — exactly what the MXU does. For ray features
F = [d, o, o×d, 1] (16-padded) and per-triangle coefficient columns
(n = e1×e2, unnormalized geometric normal):

    det   = -n·d                      (backface-culling determinant)
    u·det =  e2·(o×d) - (e2×v0)·d
    v·det = -e1·(o×d) - (v0×e1)·d
    t·det =  n·o - (v0·n)·1

so ONE [tile, 16] x [16, 512] matmul per 128-triangle chunk produces all
four quantities for every (ray, tri) pair ([tile, 512] = four [tile, 128]
planes), and the VPU only does the cheap part: accept masks (scaled by
det — no division until the winner), one guarded divide, and per-ray
lane-min reductions. Triangle chunks are stored feature-major [16, 512]
(64 B/tri, same as quad rows) and DMA'd with the same double buffering.

Rays ride the SUBLANE axis here ([tile, 1] columns, tris on lanes) —
the transpose of the VPU kernels' layout. Results are exact per ray with
precision=HIGHEST (float32-equivalent 6-pass bf16 matmul); tie winners
within a chunk resolve to the lowest slot.

Cites: same reference semantics as ops/packet.py (src/kernel.cl:227-255
Möller–Trumbore with backface cull; traversal src/kernel.cl:323-389).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clpathtracer_tpu.ops.packet import (
    BIG, INV_BIG, STACK_DEPTH, _box_interval)

MXU_TRIS = 128       # triangles per matmul chunk
MXU_ROWS = 16        # feature rows per chunk block ([16, 512])


def mxu_rows_from_quads(quads: jnp.ndarray) -> jnp.ndarray:
    """[Q, 64] quad rows → [C*16, 512] feature-major coefficient chunks
    (C = ceil(T/128)). Traced (cheap dense math); pad tris get all-zero
    coefficients so det=0 rejects them."""
    tris16 = quads.reshape(-1, 16)
    t = tris16.shape[0]
    pad = (-t) % MXU_TRIS
    if pad:
        tris16 = jnp.concatenate(
            [tris16, jnp.zeros((pad, 16), tris16.dtype)
             .at[:, 9].set(-1.0)], axis=0)
    v0, e1, e2 = tris16[:, 0:3], tris16[:, 3:6], tris16[:, 6:9]
    tid = tris16[:, 9]
    n = jnp.cross(e1, e2)
    e2xv0 = jnp.cross(e2, v0)
    v0xe1 = jnp.cross(v0, e1)
    v0n = jnp.sum(v0 * n, axis=-1, keepdims=True)
    z3 = jnp.zeros_like(n)
    z1 = jnp.zeros_like(v0n)
    one = jnp.ones_like(v0n)
    z6 = jnp.zeros((n.shape[0], 6), n.dtype)
    # feature convention: rows 0-2 d, 3-5 o, 6-8 o×d, 9 const-1, 10-15 pad
    c_det = jnp.concatenate([-n, z3, z3, z1, z6], axis=1)
    c_u = jnp.concatenate([-e2xv0, z3, e2, z1, z6], axis=1)
    c_v = jnp.concatenate([-v0xe1, z3, -e1, z1, z6], axis=1)
    c_t = jnp.concatenate([z3, n, z3, -v0n, z6], axis=1)
    valid = (tid >= 0.0).astype(tris16.dtype)[:, None]
    c_det = c_det * valid  # det=0 ⇒ rejected; other planes need no mask
    nchunk = tris16.shape[0] // MXU_TRIS

    def fold(c):  # [T, 16] → [C, 16, 128]
        return c.reshape(nchunk, MXU_TRIS, 16).transpose(0, 2, 1)

    block = jnp.concatenate(
        [fold(c_det), fold(c_u), fold(c_v), fold(c_t)], axis=2)
    return block.reshape(nchunk * MXU_ROWS, 4 * MXU_TRIS)


def _kernel_mxu(nodes_ref, tris_ref, o_ref, d_ref, a_ref, t_ref, slot_ref,
                stats_ref, nstack, tlo_stack, thi_stack, tri_buf, tri_sem,
                *, tile, layout):
    """Interval packet walk (as ops/packet._kernel_stream) + MXU leaf
    intersection. Rays as [tile, 1] columns."""
    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    act = a_ref[:, 0:1]
    n_act = jnp.sum(act)

    t_ref[:] = jnp.full((tile, 1), BIG, jnp.float32)
    slot_ref[:] = jnp.full((tile, 1), -1.0, jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    stats_ref[:] = jnp.where(lane == 2, n_act, 0.0)

    n_chunks = tris_ref.shape[0] // MXU_ROWS

    @pl.when(n_act > 0.0)
    def _run():
        on = act > 0.0

        def mm(x):
            return (jnp.min(jnp.where(on, x, BIG)),
                    jnp.max(jnp.where(on, x, -BIG)))

        def inv_mm(dc):
            inv = jnp.clip(1.0 / dc, -INV_BIG, INV_BIG)
            return (jnp.min(jnp.where(on, inv, INV_BIG)),
                    jnp.max(jnp.where(on, inv, -INV_BIG)))

        obnd = (mm(ox), mm(oy), mm(oz))
        ibnd = (inv_mm(dx), inv_mm(dy), inv_mm(dz))

        # ray feature matrix [tile, 16]: [d, o, o×d, 1, 0...]
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        feat = jnp.concatenate(
            [dx, dy, dz, ox, oy, oz, cx, cy, cz,
             jnp.ones((tile, 1), jnp.float32),
             jnp.zeros((tile, 6), jnp.float32)], axis=1)

        axinfo = []
        for ax in range(3):
            il, ih = ibnd[ax]
            ol, oh = obnd[ax]
            axinfo.append((il, ih, ol, oh, il * ih > 0.0, il + ih > 0.0))

        if layout == "padded":
            def read6(node):
                r = node + 1
                return tuple(nodes_ref[r, j] for j in range(6))
        else:
            def read6(node):
                r = 1 + node // 16

                def rd(k):
                    def f():
                        return tuple(nodes_ref[r, k * 8 + j]
                                     for j in range(6))
                    return f

                return jax.lax.switch(node % 16, [rd(k) for k in range(16)])

        hdr = tuple(nodes_ref[0, j] for j in range(6))
        rt_lo, rt_hi = _box_interval(hdr[0:3], hdr[3:6], obnd, ibnd)
        nstack[0] = 0
        tlo_stack[0] = rt_lo
        thi_stack[0] = rt_hi
        sp0 = ((rt_lo <= rt_hi) & (rt_hi > 0.0)).astype(jnp.int32)

        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (tile, MXU_TRIS), 1).astype(jnp.float32)

        def start_chunk(c, slot):
            pltpu.make_async_copy(
                tris_ref.at[pl.ds(c * MXU_ROWS, MXU_ROWS), :],
                tri_buf.at[slot], tri_sem.at[slot]).start()

        def mt_chunk(c, slot, best_t, best_s):
            pltpu.make_async_copy(
                tris_ref.at[pl.ds(c * MXU_ROWS, MXU_ROWS), :],
                tri_buf.at[slot], tri_sem.at[slot]).wait()
            out = jax.lax.dot_general(
                feat, tri_buf[slot],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # [tile, 512]
            det = out[:, 0:128]
            ud = out[:, 128:256]
            vd = out[:, 256:384]
            td = out[:, 384:512]
            ok = ((det > 0.0) & (ud >= 0.0) & (ud <= det) & (vd >= 0.0)
                  & (ud + vd <= det) & (td > 0.0) & on)
            denom = jnp.where(det == 0.0, 1.0, det)
            t = jnp.where(ok, td / denom, BIG)          # [tile, 128]
            rowmin = jnp.min(t, axis=1, keepdims=True)  # [tile, 1]
            base = (c * MXU_TRIS).astype(jnp.float32)
            cand = jnp.where(t == rowmin, lane_f + base, 3.0e38)
            rowslot = jnp.min(cand, axis=1, keepdims=True)
            take = (rowmin < BIG) & (rowmin <= best_t)
            best_t = jnp.where(take, rowmin, best_t)
            best_s = jnp.where(take, rowslot, best_s)
            return best_t, best_s

        def stream_leaf(qstart, count, best_t, best_s):
            first = qstart * 4
            c0 = first // MXU_TRIS
            c_end = (first + count + MXU_TRIS - 1) // MXU_TRIS
            nch = c_end - c0

            def c_of(b):
                return jnp.minimum(c0 + b, n_chunks - 1)

            # empty leaf: no DMA (an unwaited transfer corrupts the
            # semaphore pairing — see ops/packet.py stream_leaf)
            @pl.when(nch > 0)
            def _():
                start_chunk(c_of(0), 0)

            def body(b, cargo):
                bt, bs = cargo

                @pl.when(b + 1 < nch)
                def _():
                    start_chunk(c_of(b + 1), (b + 1) % 2)

                return mt_chunk(c_of(b), b % 2, bt, bs)

            best_t, best_s = jax.lax.fori_loop(0, nch, body,
                                               (best_t, best_s))
            return best_t, best_s, nch

        best_t0 = jnp.full((tile, 1), BIG, jnp.float32)
        best_s0 = jnp.full((tile, 1), -1.0, jnp.float32)

        def body(state):
            sp, best_t, best_s, t_upper, nv, nl = state
            node = nstack[sp - 1]
            tlo = tlo_stack[sp - 1]
            thi = thi_stack[sp - 1]
            sp = sp - 1
            nv = nv + 1
            live = (tlo <= jnp.minimum(thi, t_upper)) & (thi > 0.0)

            def visit(sp, best_t, best_s, t_upper, nl):
                flags_f, split, cl_f, ch_f, qs_f, cnt_f = read6(node)
                flags = flags_f.astype(jnp.int32)
                is_leaf = flags >= 4

                def leaf_case(sp, best_t, best_s, t_upper, nl):
                    best_t, best_s, nch = stream_leaf(
                        qs_f.astype(jnp.int32), cnt_f.astype(jnp.int32),
                        best_t, best_s)
                    t_up = jax.lax.cond(
                        (nv & 3) == 0,
                        lambda: jnp.max(jnp.where(on, best_t, -BIG)),
                        lambda: t_upper)
                    return sp, best_t, best_s, t_up, nl + nch

                def split_case(sp, best_t, best_s, t_upper, nl):
                    il, ih, ol, oh, uni, nlo = jax.lax.switch(
                        flags & 3,
                        [lambda i=i: axinfo[i] for i in range(3)])
                    c1 = (split - ol) * il
                    c2 = (split - ol) * ih
                    c3 = (split - oh) * il
                    c4 = (split - oh) * ih
                    tp_min = jnp.minimum(jnp.minimum(c1, c2),
                                         jnp.minimum(c3, c4))
                    tp_max = jnp.maximum(jnp.maximum(c1, c2),
                                         jnp.maximum(c3, c4))
                    tp_min = jnp.where(uni, tp_min, -INV_BIG)
                    tp_max = jnp.where(uni, tp_max, INV_BIG)
                    cl = cl_f.astype(jnp.int32)
                    ch = ch_f.astype(jnp.int32)
                    near = jnp.where(nlo, cl, ch)
                    far = jnp.where(nlo, ch, cl)
                    far_lo = jnp.maximum(tlo, tp_min)
                    near_hi = jnp.minimum(thi, tp_max)
                    push_far = far_lo <= jnp.minimum(thi, t_upper)

                    @pl.when(push_far)
                    def _():
                        nstack[sp] = far
                        tlo_stack[sp] = far_lo
                        thi_stack[sp] = thi

                    sp = sp + push_far.astype(jnp.int32)
                    push_near = tlo <= jnp.minimum(near_hi, t_upper)

                    @pl.when(push_near)
                    def _():
                        nstack[sp] = near
                        tlo_stack[sp] = tlo
                        thi_stack[sp] = near_hi

                    sp = sp + push_near.astype(jnp.int32)
                    return sp, best_t, best_s, t_upper, nl

                return jax.lax.cond(is_leaf, leaf_case, split_case,
                                    sp, best_t, best_s, t_upper, nl)

            sp, best_t, best_s, t_upper, nl = jax.lax.cond(
                live, visit,
                lambda sp, bt, bs, tu, nl: (sp, bt, bs, tu, nl),
                sp, best_t, best_s, t_upper, nl)
            return sp, best_t, best_s, t_upper, nv, nl

        _, best_t, best_s, _, nv, nl = jax.lax.while_loop(
            lambda st: st[0] > 0, body,
            (sp0, best_t0, best_s0, jnp.float32(BIG), jnp.int32(0),
             jnp.int32(0)))

        t_ref[:] = best_t
        slot_ref[:] = best_s
        stats_ref[:] = jnp.where(
            lane == 0, nv.astype(jnp.float32),
            jnp.where(lane == 1, nl.astype(jnp.float32),
                      jnp.where(lane == 2, n_act, 0.0)))


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "layout"))
def packet_call_mxu(nodes, mxu_tris, orig, dir, act, interpret=False,
                    tile=1024, layout="padded"):
    """orig/dir: [N, 3]; act: [N, 1]; mxu_tris: [C*16, 512]."""
    n = orig.shape[0]
    n_tiles = n // tile
    return pl.pallas_call(
        functools.partial(_kernel_mxu, tile=tile, layout=layout),
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
        ],
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # node fields
            pl.BlockSpec(memory_space=pl.ANY),        # mxu chunks (HBM)
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.VMEM((2, MXU_ROWS, 4 * MXU_TRIS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(nodes, mxu_tris, orig, dir, act)
