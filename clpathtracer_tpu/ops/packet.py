"""Pallas packet traversal: coherent ray tiles vs a VMEM-resident kd-tree.

The XLA wavefront (ops/traverse_fast.py) is gather-bound: ~200 wide
gathers per ray at ~130-260us per 65k-lane gather puts a hard ~2M rays/s
ceiling on one chip. This kernel removes per-lane gathers entirely by
exploiting RAY COHERENCE — the classic packet-tracing reformulation, which
is exactly the shape TPUs want:

* each grid program owns a TILE of rays (default 1024 = 8 sublanes x 128
  lanes) regrouped as a square block of screen pixels,
* ONE scalar stack traversal per tile (SMEM stack, scalar node reads from
  the VMEM-resident node table) culls subtrees against a conservative
  interval bound of the whole packet — control flow is per-tile scalar,
  exactly what the TPU scalar core is for,
* surviving leaves are intersected DENSELY: [4, TILE] Moller-Trumbore per
  quad row on the VPU — pure vector arithmetic, no gathers (measured
  ~4.8G tri-tests/s),
* packet-wide early termination: subtrees farther than the packet's
  current worst best-hit are skipped.

Results are exact per ray (the packet test only ever over-approximates:
every leaf that could beat a ray's current best is still tested densely).
Intra-leaf tie order matches the reference scan order; across-subtree
exact-t ties may resolve differently than the rope walk (both are valid
nearest hits with equal t).

Engines (see packet_mode): "vmem" keeps the whole scene on-chip;
"tri_stream" keeps the node table on-chip and double-buffer-DMAs leaf
triangles from HBM; "wide" (CLPT_WIDE=1) walks an experimental 8-wide
supernode table. The kernels share every building block below — one
packet-bound calculation, one interval test, one streaming MT pipeline —
so a kernel change happens exactly once.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

BIG = 3.4e38
TILE = 1024          # default rays per packet: 8 sublanes x 128 lanes
STACK_DEPTH = 128
VMEM_BUDGET = 12 * 1024 * 1024
# [CHUNK_ROWS, 128] tri rows per leaf DMA = CHUNK_ROWS*8 triangles.
# Measured on v5e (1M tris, 512², leaf 512 / tile 256): 8 rows (64 tris)
# 78.6 ms, 16 rows (128 tris) 71.7 ms soup / 63.6 ms terrain, 32 rows
# 80.9 ms — 16 halves the per-chunk loop+DMA overhead without starving
# the double buffer, 32 overshoots (first-chunk latency uncovered).
# Tunable for experiments (CLPT_CHUNK_ROWS).
CHUNK_ROWS = int(_os.environ.get("CLPT_CHUNK_ROWS", "16"))
# Packet-wide early-termination refresh cadence: every (TUP_MASK+1)-th node
# pop recomputes t_upper = max over live lanes of best_t — a VECTOR
# reduction consumed by the SCALAR walk, i.e. a cross-pipeline sync point.
# Tunable because each sync can stall the decoupled scalar queue; a staler
# t_upper only costs extra conservatively-kept windows.
# (nv & TUP_MASK) == 0 implements the cadence only for power-of-two
# values: round the knob up to one instead of silently misfiring
# (e.g. 3 would give mask 2, firing on nv in {0,1,4,5,...})
_TUP_EVERY = max(int(_os.environ.get("CLPT_TUP_EVERY", "4")), 1)
TUP_MASK = (1 << (_TUP_EVERY - 1).bit_length()) - 1
INV_BIG = 1e30


def packet_mode(tree, n_rays: int, tile: int = TILE, engine: str = "auto"):
    """Selected engine, or None when the packet tracer can't run:

    * "stream"     — v2 interval walk, node fields on-chip (32 B/node),
                     triangles streamed from HBM (the default)
    * "vmem"       — v1 walk, whole scene resident on-chip
    * "tri_stream" — v1 walk, node table on-chip, triangles streamed
    * "wide"       — experimental 8-wide supernode walk (CLPT_WIDE=1)

    engine: "auto" (stream when it fits, else v1 fallbacks), "stream", or
    "legacy" (v1 selection only — comparison/bench baseline).
    """
    if tree is None or tree.node_table is None:
        return None
    if n_rays % tile != 0:
        return None
    import os
    m = tree.node_table.shape[0]
    # 8-wide supernode table (opt-in via CLPT_WIDE=1): one 512 B row per
    # ~7 binary nodes, children at static lane offsets. Measured slower
    # than the binary tri-stream at 1M tris (the 8 sequential per-child
    # conds outweigh the pop savings) — kept as an experimental engine.
    wide = getattr(tree, "wide_table", None)
    if (os.environ.get("CLPT_WIDE") and wide is not None
            and wide.shape[0] * 512 <= VMEM_BUDGET):
        return "wide"
    if engine in ("auto", "stream", "stream2", "mxu", "queue"):
        # packed16 worst case: 32 B/node (+1 header row)
        if (1 + (m + 15) // 16) * 512 <= VMEM_BUDGET:
            if engine == "mxu":
                return "mxu"
            if engine == "stream2" and n_rays % (2 * tile) == 0:
                return "stream2"
            if engine == "stream2":
                return "stream"
            if engine == "queue":
                return "queue"
            return "stream"
        if engine in ("stream", "stream2", "mxu", "queue"):
            return None
    # v1 packet kernels use a ropeless 16-wide slice of the node table
    # (stack traversal never follows ropes) — 64 B per node
    table_bytes = m * 16 * 4
    tri_bytes = tree.tri_indices.shape[0] * 16 * 4
    if table_bytes + tri_bytes <= VMEM_BUDGET:
        return "vmem"
    if table_bytes <= VMEM_BUDGET:
        return "tri_stream"
    return None


def packet_supported(tree, n_rays: int, tile: int = TILE) -> bool:
    return packet_mode(tree, n_rays, tile) is not None


# ---------------------------------------------------------------------------
# shared kernel building blocks
# ---------------------------------------------------------------------------


def _ray_rows(o_ref, d_ref):
    """Per-tile ray data as [1, T] SoA row vectors."""
    return (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :],
            d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])


def _packet_bounds(rays):
    """Conservative scalar bounds of the whole packet: per-axis
    (origin_lo, origin_hi) and (invdir_lo, invdir_hi)."""
    ox, oy, oz, dx, dy, dz = rays

    def inv_bounds(dc):
        inv = jnp.clip(1.0 / dc, -INV_BIG, INV_BIG)
        return jnp.min(inv), jnp.max(inv)

    obnd = ((jnp.min(ox), jnp.max(ox)), (jnp.min(oy), jnp.max(oy)),
            (jnp.min(oz), jnp.max(oz)))
    ibnd = (inv_bounds(dx), inv_bounds(dy), inv_bounds(dz))
    return obnd, ibnd


def _packet_bounds_masked(rays, act):
    """_packet_bounds over the ACTIVE lanes only (act: [1, T] 1.0/0.0).
    Dead lanes otherwise poison the conservative bounds (their origins and
    directions are stale). Caller guarantees at least one active lane."""
    ox, oy, oz, dx, dy, dz = rays
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
    return obnd, ibnd


def _axis_interval(lo_a, hi_a, ob, ib):
    """Conservative [min t_near, max t_far] for one axis over the whole
    packet; non-uniform direction sign → unbounded (axis can't cull)."""
    ol, oh = ob
    il, ih = ib
    uniform = il * ih > 0.0
    pos = il > 0.0
    nearb = jnp.where(pos, lo_a, hi_a)
    farb = jnp.where(pos, hi_a, lo_a)

    def prods(b):
        c1 = (b - ol) * il
        c2 = (b - ol) * ih
        c3 = (b - oh) * il
        c4 = (b - oh) * ih
        return (jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4)),
                jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4)))

    near_min, _ = prods(nearb)
    _, far_max = prods(farb)
    near_min = jnp.where(uniform, near_min, -INV_BIG)
    far_max = jnp.where(uniform, far_max, INV_BIG)
    return near_min, far_max


def _box_interval(lo_xyz, hi_xyz, obnd, ibnd):
    """Packet-conservative [t_enter, t_exit] of an AABB given per-axis
    scalar bounds (lo_xyz/hi_xyz: 3-tuples of scalars)."""
    nx_min, nx_max = _axis_interval(lo_xyz[0], hi_xyz[0], obnd[0], ibnd[0])
    ny_min, ny_max = _axis_interval(lo_xyz[1], hi_xyz[1], obnd[1], ibnd[1])
    nz_min, nz_max = _axis_interval(lo_xyz[2], hi_xyz[2], obnd[2], ibnd[2])
    t_enter = jnp.maximum(jnp.maximum(nx_min, ny_min), nz_min)
    t_exit = jnp.minimum(jnp.minimum(nx_max, ny_max), nz_max)
    return t_enter, t_exit


def _axinfo(obnd, ibnd):
    """Per-axis packet constants for split-plane intervals: (inv_lo,
    inv_hi, orig_lo, orig_hi, sign-uniform, near-is-lo)."""
    out = []
    for ax in range(3):
        il, ih = ibnd[ax]
        ol, oh = obnd[ax]
        out.append((il, ih, ol, oh, il * ih > 0.0, il + ih > 0.0))
    return out


def _split_plane_interval(axinfo, axis, split):
    """Packet-conservative [t_min, t_max] of the crossing of one axis
    plane, plus whether the low child is the near child. Non-uniform
    direction sign on the axis → unbounded (the plane can't cull)."""
    il, ih, ol, oh, uni, nlo = jax.lax.switch(
        axis, [lambda i=i: axinfo[i] for i in range(3)])
    c1 = (split - ol) * il
    c2 = (split - ol) * ih
    c3 = (split - oh) * il
    c4 = (split - oh) * ih
    tp_min = jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4))
    tp_max = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
    tp_min = jnp.where(uni, tp_min, -INV_BIG)
    tp_max = jnp.where(uni, tp_max, INV_BIG)
    return tp_min, tp_max, nlo


def _node_fields(table_ref, node):
    """Read the 12 packet-relevant fields of one binary node.

    Nodes are packed 8 per 128-wide row (narrow VMEM arrays get lane-padded
    to 128 — a [M,16] table would physically cost 8x). Mosaic requires
    STATIC lane indices, so the sub-slot selects one of 8 branches, each
    reading its 12 fields at fixed lanes.
    """
    nrow = node // 8

    def _slot_reader(k):
        def f():
            return tuple(table_ref[nrow, k * 16 + j] for j in range(12))
        return f

    return jax.lax.switch(node % 8, [_slot_reader(k) for k in range(8)])


def _near_far_children(fields, ibnd):
    """Split-node child visit order from the packet's dominant direction
    sign on the split axis (near pushed last → popped first)."""
    flags = fields[7].astype(jnp.int32)
    axis = flags & 3
    cl = fields[8].astype(jnp.int32)
    ch = fields[9].astype(jnp.int32)
    il = jax.lax.switch(axis, [lambda: ibnd[0][0], lambda: ibnd[1][0],
                               lambda: ibnd[2][0]])
    ih = jax.lax.switch(axis, [lambda: ibnd[0][1], lambda: ibnd[1][1],
                               lambda: ibnd[2][1]])
    near_is_lo = il + ih > 0.0
    near = jnp.where(near_is_lo, cl, ch)
    far = jnp.where(near_is_lo, ch, cl)
    return near, far


def so_rows(tris16: jnp.ndarray, origin) -> jnp.ndarray:
    """Per-triangle shared-origin precomputation (signed-volume test).

    When every ray in the wavefront shares one origin `o` (primary pinhole
    rays — the reference's own camera model, /root/reference/src/kernel.cl:443),
    Moller-Trumbore collapses: with a = v0-o, b = v1-o, c = v2-o, a ray
    direction d hits the triangle iff the three signed tetrahedron volumes
    S1 = d.(a x b), S2 = d.(b x c), S3 = d.(c x a) share MT's sign
    convention (all <= 0 with backface cull d.n < 0, since
    S1+S2+S3 = d.n), and t = (a.n)/(S1+S2+S3). The cross/plane terms
    depend only on (o, triangle) — this bakes them ONCE per frame so the
    dense in-kernel test drops from ~52 to ~35 vector ops per
    (ray, triangle) pair, with NO per-pair cross products left.

    Conditioning matches standard MT: the crosses are built from MT's own
    well-conditioned intermediates (w1 = a x e1 = -q, w2 = a x e2,
    n = e1 x e2; b x c = w2 - w1 + n), never from near-parallel large
    vectors, so S-values carry the same relative error as the general
    path and winner flips stay confined to exact-tie noise.

    Layout (matches the [T, 16] quad-row DMA contract): cols 0-2 ab,
    3-5 bc, 6-8 ca, 9 d0 = a.n, 10 tid. Sentinel rows (tid < 0) zero out,
    making every S and D exactly 0 — rejected by the kernel's strict
    D < 0, so pads can never fake a hit.
    """
    o = jnp.asarray(origin, jnp.float32).reshape(3)
    v0, e1, e2 = tris16[:, 0:3], tris16[:, 3:6], tris16[:, 6:9]
    tid = tris16[:, 9:10]
    a = v0 - o[None, :]
    w1 = jnp.cross(a, e1)
    w2 = jnp.cross(a, e2)
    nrm = jnp.cross(e1, e2)
    ab = w1
    bc = w2 - w1 + nrm
    ca = -w2
    d0 = jnp.sum(a * nrm, axis=1, keepdims=True)
    out = jnp.concatenate(
        [ab, bc, ca, d0, tid, jnp.zeros((tris16.shape[0], 5), jnp.float32)],
        axis=1)
    return jnp.where(tid < 0.0, 0.0, out)


def so_affine_tables(quads: jnp.ndarray) -> jnp.ndarray:
    """Origin-independent affine decomposition of so_rows.

    Every baked shared-origin term is affine in the origin o: with
    constant per-triangle tables, ab = v0xe1 - o x e1, bc = (v0xe2 -
    v0xe1 + n) - o x (e2-e1), ca = -v0xe2 + o x e2 and d0 = v0.n - o.n,
    and each "o x e" is a linear combination of (ox, oy, oz) with
    per-triangle coefficient vectors. So the whole [R, 128] SO row array
    is B0 + ox*B1 + oy*B2 + oz*B3.

    This function builds the four tables ONCE per scene (they do not
    depend on o), already padded and folded into the [R, 128] DMA layout.
    The per-frame SO preparation then collapses from a full cross-product
    pass plus a 16-to-128 lane relayout (measured 30.7 ms/frame at 1M
    tris through XLA on v5e) to one fused elementwise combine (~0.5 ms
    of HBM traffic). Returns [4, R, 128] stacked (B0, B1, B2, B3).

    Conditioning note: so_rows computes a = v0 - o BEFORE the crosses
    (well-conditioned); the affine form rounds v0xe1 and o x e1
    separately, so edge tests lose ~|v0||o|/|a x e1| relative accuracy —
    at f32 this moves hit/miss boundaries sub-pixel amounts and can flip
    rare edge-grazing winners. Tests budget for that; t/u/v still
    re-resolve exactly from the winning slot.

    Built in bounded lax.map blocks: the straight-line form's dozens of
    [T, 16] concat/stack temporaries OOM'd the 16 GB chip at 10M tris
    (XLA kept ~50 GB of them live); per-block temporaries are a few MB
    regardless of scene size."""
    t0 = _pad_rows8(quads.reshape(-1, 16)).reshape(-1, 16)
    r0 = t0.shape[0] // 8  # output rows before block padding
    block = 1 << 17
    bpad = -t0.shape[0] % block
    if bpad:
        t0 = jnp.concatenate(
            [t0, jnp.full((bpad, 16), -1.0, t0.dtype)], axis=0)

    def build(t):
        v0, e1, e2, tid = t[:, 0:3], t[:, 3:6], t[:, 6:9], t[:, 9:10]
        n = jnp.cross(e1, e2)
        c01 = jnp.cross(v0, e1)
        c02 = jnp.cross(v0, e2)
        g = e2 - e1
        z1 = jnp.zeros_like(tid)
        z5 = jnp.zeros((t.shape[0], 5), t.dtype)

        # d(o x e)/d o_k for k = x, y, z
        def cx(e):
            return jnp.stack(
                [jnp.zeros_like(e[:, 0]), -e[:, 2], e[:, 1]], 1)

        def cy(e):
            return jnp.stack(
                [e[:, 2], jnp.zeros_like(e[:, 0]), -e[:, 0]], 1)

        def cz(e):
            return jnp.stack(
                [-e[:, 1], e[:, 0], jnp.zeros_like(e[:, 0])], 1)

        b0 = jnp.concatenate(
            [c01, c02 - c01 + n, -c02,
             jnp.sum(v0 * n, axis=1, keepdims=True), tid, z5], axis=1)

        def bk(ck, nk):
            return jnp.concatenate(
                [-ck(e1), -ck(g), ck(e2), -nk[:, None], z1, z5], axis=1)

        tabs = jnp.stack([b0, bk(cx, n[:, 0]), bk(cy, n[:, 1]),
                          bk(cz, n[:, 2])])
        tabs = jnp.where(tid[None] < 0.0, 0.0, tabs)  # sentinels: zero
        # fold to 128 lanes per block: a [.., 16] result would be lane-
        # padded 8x by the tiled layout (22 GB at 10M tris)
        return tabs.reshape(4, -1, 128)

    blocks = jax.lax.map(build, t0.reshape(-1, block, 16))
    tabs = jnp.transpose(blocks, (1, 0, 2, 3)).reshape(4, -1, 128)
    return tabs[:, :r0]


def _mt_chunk_math_so(tri_buf, buf_slot, rays, tile, chunk_row0, best_t,
                      best_s, act_row=None, row_ids=None, merge=True,
                      acc=None, d0cull=False):
    """Dense shared-origin signed-volume test of the CHUNK_ROWS*8 tris in
    tri_buf[buf_slot] (rows from so_rows) — the SO twin of _mt_chunk_math.
    Ray origins are ignored (folded into the baked rows); only directions
    enter. ~35 [CR, tile] vector ops per group vs the general path's ~52:
    no per-pair crosses, no u/v (winners re-resolve u/v outside).

    row_ids: optional [n_rows, 1] f32 of ABSOLUTE quad-row ids, replacing
    the contiguous chunk_row0 + iota numbering — the sub-gate plist
    kernel packs rows from FOUR different windows into one buffer.
    merge=False returns the raw [n_rows, tile] (t_acc, s_acc)
    accumulators for a caller-side (e.g. per-sub-gate) reduction;
    acc=(t_acc, s_acc) seeds them, letting a caller carry the argmin
    ACROSS windows and merge once per frame (the round-2 "per-leaf
    accumulator merge" lever, VERDICT r2 #8) — sound because row ids
    are globally unique across windows."""
    dxyz = rays if len(rays) == 3 else rays[3:6]
    dx, dy, dz = dxyz
    n_rows = tri_buf.shape[1]  # CHUNK_ROWS, or the plist engine's win_rows
    if row_ids is None:
        sub_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, 1), 0).astype(jnp.float32)
        row_ids = chunk_row0 * 1.0 + sub_iota
    if acc is None:
        t_acc = jnp.full((n_rows, tile), BIG, jnp.float32)
        s_acc = jnp.full((n_rows, tile), -1.0, jnp.float32)
    else:
        t_acc, s_acc = acc
    for i in range(8):  # 8 interleaved groups of n_rows tris
        def col(j):
            return tri_buf[buf_slot, :, i * 16 + j:i * 16 + j + 1] \
                .reshape(n_rows, 1)
        s1 = dx * col(0) + dy * col(1) + dz * col(2)
        s2 = dx * col(3) + dy * col(4) + dz * col(5)
        s3 = dx * col(6) + dy * col(7) + dz * col(8)
        dsum = s1 + s2 + s3              # = d.n (backface cull: < 0)
        # sign tests fused as one max-chain; given dsum < 0 strictly,
        # tt = d0/dsum > 0 iff d0 < 0 — a [CR, 1] per-TRI test, so the
        # old full-width tt > 0 compare is free. dsum == 0 lanes produce
        # inf/nan tt but ok is false there, and where() never leaks the
        # unselected branch.
        ok = ((jnp.maximum(jnp.maximum(s1, s2), s3) <= 0.0)
              & (dsum < 0.0))
        if not d0cull:
            # d0cull: the caller zeroed every d0 >= 0 row at combine
            # time (zero rows give s = dsum = 0, rejected by the strict
            # dsum < 0), so the per-pair broadcast AND here is dead ops
            ok = ok & (col(9) < 0.0)
        tt = col(9) / dsum
        if act_row is not None:
            ok = ok & (act_row > 0.0)  # dead lanes never take hits
        t_m = jnp.where(ok, tt, BIG)
        slot = row_ids * 8.0 + i  # [CR, 1]
        take = t_m <= t_acc
        t_acc = jnp.where(take, t_m, t_acc)
        s_acc = jnp.where(take, slot, s_acc)
    if not merge:
        return t_acc, s_acc
    chunk_t = jnp.min(t_acc, axis=0, keepdims=True)       # [1, tile]
    slot_cand = jnp.where(t_acc == chunk_t, s_acc, BIG)
    chunk_s = jnp.min(slot_cand, axis=0, keepdims=True)
    take = (chunk_t < BIG) & (chunk_t <= best_t)
    best_t = jnp.where(take, chunk_t, best_t)
    best_s = jnp.where(take, chunk_s, best_s)
    return best_t, best_s


def _mt_chunk_math(tri_buf, buf_slot, rays, tile, chunk_row0, best_t,
                   best_s, act_row=None, compute_dtype=jnp.float32,
                   row_ids=None, merge=True, acc=None):
    """Dense MT of the CHUNK_ROWS*8 tris already resident in
    tri_buf[buf_slot] against `rays` ([1, tile] SoA rows) — the math half
    of mt_chunk, no DMA wait (callers that share one DMA across
    sub-packets wait once).

    compute_dtype=bfloat16 is the opt-in PREVIEW mode: the per-pair
    arithmetic runs at twice the VPU issue rate, but bf16's 8-bit
    mantissa makes the o-v0 cancellation catastrophic for triangles much
    smaller than the scene scale — measured ~93% hit agreement on the
    small-triangle soup. Useful for interactive previews only; the exact
    f32 path is the production default."""
    bf = compute_dtype != jnp.float32
    ox, oy, oz, dx, dy, dz = (
        tuple(r.astype(compute_dtype) for r in rays) if bf else rays)
    n_rows = tri_buf.shape[1]  # CHUNK_ROWS, or the plist engine's win_rows
    if row_ids is None:
        sub_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, 1), 0).astype(jnp.float32)
        row_ids = chunk_row0 * 1.0 + sub_iota
    miss_val = 3.0e38 if bf else BIG  # bf16 max finite is ~3.39e38
    # [CR, tile] accumulators across the 8 groups: 3 elementwise ops per
    # group instead of a 2-reduction winner merge (~16) — one argmin per
    # CHUNK at the end. Ties: later group wins at equal t (t_m <= acc),
    # the final reduction picks the lowest slot among equal t — exact-t
    # tie winners are documented freedom, t/u/v arithmetic is unchanged.
    merge_old = _os.environ.get("CLPT_MERGE_OLD") == "1"  # A/B probes
    chunk_t = jnp.full((1, tile), BIG, jnp.float32)
    chunk_s = jnp.full((1, tile), -1.0, jnp.float32)
    if acc is None:
        t_acc = jnp.full((n_rows, tile), BIG, jnp.float32)
        s_acc = jnp.full((n_rows, tile), -1.0, jnp.float32)
    else:
        t_acc, s_acc = acc
    for i in range(8):  # 8 interleaved groups of n_rows tris
        def col(j):
            c = tri_buf[buf_slot, :, i * 16 + j:i * 16 + j + 1]
            c = c.reshape(n_rows, 1)
            return c.astype(compute_dtype) if bf else c
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
        if act_row is not None:
            ok = ok & (act_row > 0.0)  # dead lanes never take hits
        t_m = jnp.where(ok, tt, jnp.asarray(miss_val, compute_dtype))
        t_m = t_m.astype(jnp.float32)
        if bf:
            t_m = jnp.where(t_m >= miss_val, BIG, t_m)
        slot = row_ids * 8.0 + i  # [CR, 1]
        if merge_old:
            grp_min = jnp.min(t_m, axis=0, keepdims=True)
            slot_cand = jnp.where(t_m == grp_min, slot, BIG)
            grp_slot = jnp.min(slot_cand, axis=0, keepdims=True)
            take = grp_min <= chunk_t
            chunk_t = jnp.where(take, grp_min, chunk_t)
            chunk_s = jnp.where(take, grp_slot, chunk_s)
        else:
            take = t_m <= t_acc
            t_acc = jnp.where(take, t_m, t_acc)
            s_acc = jnp.where(take, slot, s_acc)
    if not merge:
        return t_acc, s_acc
    if not merge_old:
        chunk_t = jnp.min(t_acc, axis=0, keepdims=True)   # [1, tile]
        slot_cand = jnp.where(t_acc == chunk_t, s_acc, BIG)
        chunk_s = jnp.min(slot_cand, axis=0, keepdims=True)
    take = (chunk_t < BIG) & (chunk_t <= best_t)
    best_t = jnp.where(take, chunk_t, best_t)
    best_s = jnp.where(take, chunk_s, best_s)
    return best_t, best_s


def _mt_math(so, compute_dtype=jnp.float32):
    """The dense per-chunk intersection routine: shared-origin
    signed-volume rows (so_rows) or general MT quad rows."""
    if so:
        return _mt_chunk_math_so
    return functools.partial(_mt_chunk_math, compute_dtype=compute_dtype)


def _chunk_pipeline(tris_ref, tri_buf, tri_sem, rays, tile, act_row=None,
                    compute_dtype=jnp.float32, so=False):
    """Double-buffered HBM→VMEM leaf-triangle streaming + dense MT.

    Returns (start_chunk, mt_chunk, stream_leaf): start_chunk(row0, slot)
    begins the async copy of an [8, 128] chunk (64 tris, 4 KB); mt_chunk
    waits it and intersects all 64 tris against the packet as 8 interleaved
    [8, tile] groups; stream_leaf runs a whole leaf's chunk sequence with
    chunk b+1's DMA in flight while b is intersected.

    Within-chunk ties pick the lowest slot; chunk order preserves the
    later-wins rule across chunks. (Exact-t tie winners may differ from the
    rope walk — documented freedom, both are valid nearest hits.)
    """
    n_chunk_rows = tris_ref.shape[0]  # [T/8, 128]

    def start_chunk(chunk_row0, buf_slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(chunk_row0, CHUNK_ROWS), :],
            tri_buf.at[buf_slot], tri_sem.at[buf_slot]).start()

    def mt_chunk(chunk_row0, buf_slot, best_t, best_s):
        """Intersect the 64 tris in buffer `buf_slot` (waits its DMA)."""
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(chunk_row0, CHUNK_ROWS), :],
            tri_buf.at[buf_slot], tri_sem.at[buf_slot]).wait()
        return _mt_math(so, compute_dtype)(
            tri_buf, buf_slot, rays, tile, chunk_row0,
            best_t, best_s, act_row=act_row)

    def stream_leaf(qstart, count, best_t, best_s):
        first_tri = qstart * 4
        row0 = first_tri // 8
        row_end = (first_tri + count + 7) // 8
        nchunks = (row_end - row0 + CHUNK_ROWS - 1) // CHUNK_ROWS

        def row_of(b):
            return jnp.minimum(row0 + b * CHUNK_ROWS,
                               n_chunk_rows - CHUNK_ROWS)

        # double-buffered: chunk b+1's DMA flies while b is intersected.
        # EMPTY leaves (count=0 — open space, common in surface scenes)
        # must not start a DMA: the loop below never waits it, and an
        # orphaned transfer corrupts the semaphore pairing for every
        # later chunk (hardware "Internal" crash; interpret mode can't
        # see it).
        @pl.when(nchunks > 0)
        def _():
            start_chunk(row_of(0), 0)

        def chunk_body(b, c):
            bt, bs = c
            cur = b % 2

            @pl.when(b + 1 < nchunks)
            def _():
                start_chunk(row_of(b + 1), (b + 1) % 2)

            return mt_chunk(row_of(b), cur, bt, bs)

        best_t, best_s = jax.lax.fori_loop(
            0, nchunks, chunk_body, (best_t, best_s))
        return best_t, best_s, nchunks

    def stream_leaf_culled(qstart, count, win0, surv, best_t, best_s):
        """stream_leaf, but each DMA window is first tested with `surv`
        (a scalar window-id → bool packet-interval test against the
        window's AABB, see _kernel_stream) and skipped wholesale when the
        packet can't hit it — the chunk-culling half of the fat-leaf
        bargain. The prefetch tracks the NEXT SURVIVING window, so the
        double buffer still hides the DMA, and every started transfer is
        waited exactly once (b0 and every bn < nchunks are both started
        and later the loop's current chunk; a bn == nchunks is never
        started). Returns (best_t, best_s, streamed, nchunks)."""
        first_tri = qstart * 4
        row0 = first_tri // 8
        row_end = (first_tri + count + 7) // 8
        nchunks = (row_end - row0 + CHUNK_ROWS - 1) // CHUNK_ROWS

        def row_of(b):
            return jnp.minimum(row0 + b * CHUNK_ROWS,
                               n_chunk_rows - CHUNK_ROWS)

        def next_surv(b):
            # first surviving window index >= b, or nchunks. surv() is
            # also evaluated at i == nchunks before the & short-circuits
            # (it doesn't) — surv clamps its read in-bounds.
            return jax.lax.while_loop(
                lambda i: (i < nchunks) & jnp.logical_not(surv(win0 + i)),
                lambda i: i + 1, b)

        b0 = next_surv(jnp.int32(0))

        @pl.when(b0 < nchunks)
        def _():
            start_chunk(row_of(b0), 0)

        def chunk_body(state):
            b, par, bt, bs, ns = state
            bn = next_surv(b + 1)

            @pl.when(bn < nchunks)
            def _():
                start_chunk(row_of(bn), 1 - par)

            bt, bs = mt_chunk(row_of(b), par, bt, bs)
            return bn, 1 - par, bt, bs, ns + 1

        _, _, best_t, best_s, streamed = jax.lax.while_loop(
            lambda st: st[0] < nchunks, chunk_body,
            (b0, jnp.int32(0), best_t, best_s, jnp.int32(0)))
        return best_t, best_s, streamed, nchunks

    return start_chunk, mt_chunk, stream_leaf, stream_leaf_culled


def _write_stats(stats_ref, nv, nl):
    # Mosaic has no scatter: build the row with lane masks. TPU block
    # tiling needs >= 8 sublanes, so the row is replicated.
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    stats_ref[:] = jnp.where(
        lane == 0, nv.astype(jnp.float32),
        jnp.where(lane == 1, nl.astype(jnp.float32), 0.0))


def _binary_walk(table_ref, stack_ref, obnd, ibnd, tile, do_leaf):
    """The shared binary-node stack traversal: pops nodes, culls against
    the packet interval, pushes split children near-first, and hands
    surviving leaves to `do_leaf(fields, best_t, best_s, t_upper, nl)`
    (which returns the updated four). Returns (best_t, best_s, nv, nl)."""
    best_t0 = jnp.full((1, tile), BIG, jnp.float32)
    best_s0 = jnp.full((1, tile), -1.0, jnp.float32)
    stack_ref[0] = 0  # root

    def body(state):
        sp, best_t, best_s, t_upper, nv, nl = state
        node = stack_ref[sp - 1]
        sp = sp - 1
        nv = nv + 1

        fields = _node_fields(table_ref, node)
        lo = (fields[0], fields[1], fields[2])
        hi = (fields[3], fields[4], fields[5])
        t_enter, t_exit = _box_interval(lo, hi, obnd, ibnd)
        overlap = (t_enter <= t_exit) & (t_exit > 0.0) & (t_enter <= t_upper)

        flags = fields[7].astype(jnp.int32)
        is_leaf = flags >= 4

        def leaf_case(sp, best_t, best_s, t_upper, nl):
            best_t, best_s, t_upper, nl = do_leaf(
                fields, best_t, best_s, t_upper, nl)
            return sp, best_t, best_s, t_upper, nl

        def split_case(sp, best_t, best_s, t_upper, nl):
            near, far = _near_far_children(fields, ibnd)
            stack_ref[sp] = far
            stack_ref[sp + 1] = near
            return sp + 2, best_t, best_s, t_upper, nl

        def visit(sp, best_t, best_s, t_upper, nl):
            return jax.lax.cond(is_leaf, leaf_case, split_case,
                                sp, best_t, best_s, t_upper, nl)

        sp, best_t, best_s, t_upper, nl = jax.lax.cond(
            overlap, visit,
            lambda sp, bt, bs, tu, nl: (sp, bt, bs, tu, nl),
            sp, best_t, best_s, t_upper, nl)
        return sp, best_t, best_s, t_upper, nv, nl

    def cond(state):
        return state[0] > 0

    _, best_t, best_s, _, nv, nl = jax.lax.while_loop(
        cond, body, (jnp.int32(1), best_t0, best_s0, jnp.float32(BIG),
                     jnp.int32(0), jnp.int32(0)))
    return best_t, best_s, nv, nl


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _kernel(table_ref, tris_ref, o_ref, d_ref, t_ref, slot_ref, stats_ref,
            stack_ref, *, tile):
    """"vmem" engine: whole scene resident on-chip; leaves intersected as
    [4, T] quad rows straight out of VMEM."""
    rays = _ray_rows(o_ref, d_ref)
    ox, oy, oz, dx, dy, dz = rays
    obnd, ibnd = _packet_bounds(rays)

    def mt_block(qbase, count_left, best_t, best_s):
        """Dense [4, T] Moller-Trumbore of one quad row (4 consecutive
        16-wide tri rows starting at tri row qbase)."""
        blk = tris_ref[pl.ds(qbase, 4), :]       # [4, 16]
        def col(j):
            return blk[:, j:j + 1]               # [4, 1]
        v0x, v0y, v0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)
        tid = col(9)
        # pvec = cross(d, e2) ; [4, T] via [4,1]x[1,T]
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
        # sequential lanes preserve the reference's later-wins tie order
        for k in range(4):
            okk = ok[k:k + 1, :] & (k < count_left)
            tk = tt[k:k + 1, :]
            take = okk & (tk <= best_t)
            best_t = jnp.where(take, tk, best_t)
            best_s = jnp.where(take, (qbase + k) * 1.0, best_s)
        return best_t, best_s

    def do_leaf(fields, best_t, best_s, t_upper, nl):
        qstart = fields[10].astype(jnp.int32)
        count = fields[11].astype(jnp.int32)
        nrows = (count + 3) // 4

        def row_body(r, c):
            bt, bs = c
            return mt_block(qstart * 4 + r * 4, count - r * 4, bt, bs)

        best_t, best_s = jax.lax.fori_loop(
            0, nrows, row_body, (best_t, best_s))
        return best_t, best_s, jnp.max(best_t), nl + 1

    best_t, best_s, nv, nl = _binary_walk(
        table_ref, stack_ref, obnd, ibnd, tile, do_leaf)
    t_ref[:] = best_t
    slot_ref[:] = best_s
    _write_stats(stats_ref, nv, nl)


def _kernel_tri_stream(table_ref, tris_ref, o_ref, d_ref, t_ref, slot_ref,
                       stats_ref, stack_ref, tri_buf, tri_sem, *, tile):
    """"tri_stream" engine: node table VMEM-resident (fat leaves shrink it
    ~8x), but TRIANGLES stream from HBM per leaf via the shared
    double-buffered chunk pipeline."""
    rays = _ray_rows(o_ref, d_ref)
    obnd, ibnd = _packet_bounds(rays)
    _, _, stream_leaf, _ = _chunk_pipeline(tris_ref, tri_buf, tri_sem, rays,
                                        tile)

    def do_leaf(fields, best_t, best_s, t_upper, nl):
        qstart = fields[10].astype(jnp.int32)
        count = fields[11].astype(jnp.int32)
        best_t, best_s, nchunks = stream_leaf(qstart, count, best_t, best_s)
        return best_t, best_s, jnp.max(best_t), nl + nchunks

    best_t, best_s, nv, nl = _binary_walk(
        table_ref, stack_ref, obnd, ibnd, tile, do_leaf)
    t_ref[:] = best_t
    slot_ref[:] = best_s
    _write_stats(stats_ref, nv, nl)


def _kernel_wide(table_ref, tris_ref, o_ref, d_ref, t_ref, slot_ref,
                 stats_ref, stack_ref, tri_buf, tri_sem, *, tile):
    """8-wide supernode packet traversal (accel/wide.py layout): each pop
    reads one [*,128] row whose 8 child slots sit at STATIC lane offsets —
    no per-node switch — culls all children against the packet interval,
    pushes surviving internals, and streams surviving leaves' triangles
    from HBM with the shared double-buffered chunk pipeline."""
    rays = _ray_rows(o_ref, d_ref)
    obnd, ibnd = _packet_bounds(rays)
    _, _, stream_leaf, _ = _chunk_pipeline(tris_ref, tri_buf, tri_sem, rays,
                                        tile)

    best_t0 = jnp.full((1, tile), BIG, jnp.float32)
    best_s0 = jnp.full((1, tile), -1.0, jnp.float32)
    stack_ref[0] = 0

    def body(state):
        sp, best_t, best_s, t_upper, nv, nl = state
        snode = stack_ref[sp - 1]
        sp = sp - 1
        nv = nv + 1

        for k in range(8):  # unrolled: every lane offset is static
            def cf(j, k=k):
                return table_ref[snode, k * 16 + j]
            kind = cf(6)
            lo = (cf(0), cf(1), cf(2))
            hi = (cf(3), cf(4), cf(5))
            t_enter, t_exit = _box_interval(lo, hi, obnd, ibnd)
            overlap = ((t_enter <= t_exit) & (t_exit > 0.0)
                       & (t_enter <= t_upper) & (kind > 0.5))

            push = overlap & (kind < 1.5)

            @pl.when(push)
            def _(k=k, sp=sp, cf=cf):
                stack_ref[sp] = cf(7).astype(jnp.int32)

            sp = sp + push.astype(jnp.int32)

            do_stream = overlap & (kind > 1.5)

            def on_leaf(bt, bs, tu, nl, cf=cf):
                qstart = cf(7).astype(jnp.int32)
                count = cf(8).astype(jnp.int32)
                bt, bs, nch = stream_leaf(qstart, count, bt, bs)
                return bt, bs, jnp.max(bt), nl + nch

            def skip(bt, bs, tu, nl):
                return bt, bs, tu, nl

            best_t, best_s, t_upper, nl = jax.lax.cond(
                do_stream, on_leaf, skip, best_t, best_s, t_upper, nl)

        return sp, best_t, best_s, t_upper, nv, nl

    def cond(state):
        return state[0] > 0

    _, best_t, best_s, _, nv, nl = jax.lax.while_loop(
        cond, body, (jnp.int32(1), best_t0, best_s0, jnp.float32(BIG),
                     jnp.int32(0), jnp.int32(0)))

    t_ref[:] = best_t
    slot_ref[:] = best_s
    _write_stats(stats_ref, nv, nl)


def _kernel_stream(nodes_ref, tris_ref, o_ref, d_ref, a_ref, *refs,
                   so=False,
                   tile, layout, compute_dtype=jnp.float32, cull=False):
    """"stream" engine (v2): interval-arithmetic packet walk + HBM leaf
    streaming + active-lane masking.

    The node pop is restructured around the classic kd-tree t-interval
    traversal: each stack entry carries the packet-conservative
    [t_lo, t_hi] along the ray, tightened at every split plane — so a pop
    reads SIX node fields (flags, split, children, leaf range; no AABB) and
    runs ~15 scalar flops, where the v1 walk read 12 fields behind an 8-way
    switch and re-slab-tested the full AABB (~45 flops). Two node layouts:

      layout="padded":   nodes_ref [1+M, 8] — node fields at dynamic
                         sublane, static lane (no switch at all; physically
                         lane-padded to 128, so only for M ≤ ~8k).
      layout="packed16": nodes_ref [1+ceil(M/16), 128] — 16 nodes per row,
                         16-way switch, 32 B/node.

    Row 0 is a header holding the root AABB (lanes 0-5), which seeds the
    interval. `a_ref` [1, T] is the active mask: packet bounds and hit
    acceptance ignore dead lanes, and a fully-dead tile skips traversal
    entirely (~µs) — the per-tile half of wavefront compaction (the
    integrator sorts dead rays to the tail, ops/sort.py).

    cull=True adds a per-DMA-window AABB input (cbnd_ref, 16 windows per
    128-lane row; accel/sah.py chunk_bounds_host) and each leaf's windows
    are interval-tested before streaming — a window whose box interval
    misses [t_lo, min(t_hi, t_upper)] is skipped wholesale. Safe because
    any hit beyond the leaf interval lies in a neighboring leaf's volume
    and that leaf's list contains the triangle (straddler duplication) —
    the same invariant the interval walk itself relies on.
    """
    if cull:
        (cbnd_ref, t_ref, slot_ref, stats_ref, nstack, tlo_stack,
         thi_stack, tri_buf, tri_sem) = refs
    else:
        cbnd_ref = None
        (t_ref, slot_ref, stats_ref, nstack, tlo_stack, thi_stack,
         tri_buf, tri_sem) = refs
    rays = _ray_rows(o_ref, d_ref)
    act = a_ref[0:1, :]
    n_act = jnp.sum(act)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    # NOTE: no @pl.when around the walk. A conditional region enclosing
    # DMA issue/wait is exactly the construct that corrupted device state
    # when fully-dead tiles appeared (path-mode bounces) — instead the
    # stack seed below is forced empty for a dead tile, so the while loop
    # runs zero iterations and no DMA is ever issued, unconditionally.
    obnd, ibnd = _packet_bounds_masked(rays, act)
    _, _, stream_leaf, stream_leaf_culled = _chunk_pipeline(
        tris_ref, tri_buf, tri_sem, rays, tile, act_row=act,
        compute_dtype=compute_dtype, so=so)

    if cull:
        n_win = cbnd_ref.shape[0] * 16

        def read_cbnd(w):
            w = jnp.minimum(w, n_win - 1)  # next_surv probes one past
            r = w // 16

            def rd(k):
                def f():
                    return tuple(cbnd_ref[r, k * 8 + j] for j in range(6))
                return f

            return jax.lax.switch(w % 16, [rd(k) for k in range(16)])

    # per-axis packet constants for the split-plane interval
    axinfo = _axinfo(obnd, ibnd)

    nf = 7 if cull else 6  # lane 6 carries the node's chunk_start id
    if layout == "padded":
        def read6(node):
            r = node + 1
            return tuple(nodes_ref[r, j] for j in range(nf))
    else:
        def read6(node):
            r = 1 + node // 16

            def rd(k):
                def f():
                    return tuple(nodes_ref[r, k * 8 + j]
                                 for j in range(nf))
                return f

            return jax.lax.switch(node % 16, [rd(k) for k in range(16)])

    # root interval from the header AABB
    hdr = tuple(nodes_ref[0, j] for j in range(6))
    rt_lo, rt_hi = _box_interval(hdr[0:3], hdr[3:6], obnd, ibnd)
    nstack[0] = 0
    tlo_stack[0] = rt_lo
    thi_stack[0] = rt_hi
    sp0 = ((rt_lo <= rt_hi) & (rt_hi > 0.0)
           & (n_act > 0.0)).astype(jnp.int32)

    best_t0 = jnp.full((1, tile), BIG, jnp.float32)
    best_s0 = jnp.full((1, tile), -1.0, jnp.float32)

    def body(state):
        sp, best_t, best_s, t_upper, nv, nl, nc = state
        node = nstack[sp - 1]
        tlo = tlo_stack[sp - 1]
        thi = thi_stack[sp - 1]
        sp = sp - 1
        nv = nv + 1
        # re-check at pop time: t_upper may have shrunk since push
        live = (tlo <= jnp.minimum(thi, t_upper)) & (thi > 0.0)

        def visit(sp, best_t, best_s, t_upper, nl, nc):
            flds = read6(node)
            flags_f, split, cl_f, ch_f, qs_f, cnt_f = flds[:6]
            flags = flags_f.astype(jnp.int32)
            is_leaf = flags >= 4

            def leaf_case(sp, best_t, best_s, t_upper, nl, nc):
                if cull:
                    win0 = flds[6].astype(jnp.int32)

                    def surv(w):
                        l0, l1, l2, h0, h1, h2 = read_cbnd(w)
                        t_en, t_ex = _box_interval(
                            (l0, l1, l2), (h0, h1, h2), obnd, ibnd)
                        return ((t_en <= jnp.minimum(thi, t_upper))
                                & (t_ex >= tlo) & (t_ex > 0.0))

                    best_t, best_s, nch, ntot = stream_leaf_culled(
                        qs_f.astype(jnp.int32), cnt_f.astype(jnp.int32),
                        win0, surv, best_t, best_s)
                    nc = nc + (ntot - nch)
                else:
                    best_t, best_s, nch = stream_leaf(
                        qs_f.astype(jnp.int32), cnt_f.astype(jnp.int32),
                        best_t, best_s)
                # the t_upper refresh reads a VPU reduction into a
                # scalar — a hard scalar-core sync on the vector
                # pipeline. Refreshing on every 4th node visit keeps
                # pruning nearly as tight at a quarter of the stalls
                # (a stale t_upper is only ever conservative).
                t_up = jax.lax.cond(
                    (nv & TUP_MASK) == 0,
                    lambda: jnp.max(jnp.where(act > 0.0, best_t, -BIG)),
                    lambda: t_upper)
                return sp, best_t, best_s, t_up, nl + nch, nc

            def split_case(sp, best_t, best_s, t_upper, nl, nc):
                tp_min, tp_max, nlo = _split_plane_interval(
                    axinfo, flags & 3, split)
                cl = cl_f.astype(jnp.int32)
                ch = ch_f.astype(jnp.int32)
                near = jnp.where(nlo, cl, ch)
                far = jnp.where(nlo, ch, cl)
                far_lo = jnp.maximum(tlo, tp_min)
                near_hi = jnp.minimum(thi, tp_max)
                # far pushed first, near last → near popped first
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
                return sp, best_t, best_s, t_upper, nl, nc

            return jax.lax.cond(is_leaf, leaf_case, split_case,
                                sp, best_t, best_s, t_upper, nl, nc)

        sp, best_t, best_s, t_upper, nl, nc = jax.lax.cond(
            live, visit,
            lambda sp, bt, bs, tu, nl, nc: (sp, bt, bs, tu, nl, nc),
            sp, best_t, best_s, t_upper, nl, nc)
        return sp, best_t, best_s, t_upper, nv, nl, nc

    _, best_t, best_s, _, nv, nl, nc = jax.lax.while_loop(
        lambda st: st[0] > 0, body,
        (sp0, best_t0, best_s0, jnp.float32(BIG), jnp.int32(0),
         jnp.int32(0), jnp.int32(0)))

    t_ref[:] = best_t
    slot_ref[:] = best_s
    stats_ref[:] = jnp.where(
        lane == 0, nv.astype(jnp.float32),
        jnp.where(lane == 1, nl.astype(jnp.float32),
                  jnp.where(lane == 2, n_act,
                            jnp.where(lane == 3, nc.astype(jnp.float32),
                                      0.0))))


def _kernel_queue(nodes_ref, tris_ref, o_ref, d_ref, a_ref, *refs,
                  tile, layout, qdepth, cull=False, so=False):
    """"queue" engine (v3): the stream interval walk, decoupled from the
    dense intersection by a deep ring of in-flight leaf-window DMAs.

    Measured motivation: the dense MT math alone runs at ~50G pairs/s at
    tile=256 (probes/probe_mt_layout.py), but inside the stream kernel the
    delivered rate is 20-27G — the other half of the frame is pipeline
    bubbles: every leaf's first chunk DMA latency is exposed (the v2
    double buffer only pipelines *within* one leaf's chunk run, and at
    leaf_size <= 2*CHUNK_ROWS*8 almost every leaf is a single chunk), and
    the scalar pops between leaves serialize with the DMA waits.

    Restructure as producer/consumer inside one while loop:

      * PRODUCE (queue not full): either advance the current leaf's
        window cursor — cull-test the next DMA window and, if it
        survives, start its copy into ring slot `tail % qdepth` — or pop
        a node from the interval-walk stack (split: push children; leaf:
        open its window cursor).
      * CONSUME (queue full, or nothing left to produce): wait the DMA at
        `head % qdepth` and run the dense MT for that window.

    Producing is preferred, so the ring fills to `qdepth` windows of
    lookahead and stays full in steady state: chunk k's MT overlaps the
    DMAs of chunks k+1..k+qdepth-1 *across leaf boundaries*, and the
    scalar pops issue between MTs while those DMAs fly. Every started
    copy sits in exactly one ring slot and is waited exactly once by the
    consume of that slot; the loop only exits when the ring is empty, and
    a dead tile never seeds the stack, so no DMA is ever orphaned (the
    invariant the hardware requires).

    Node layouts, header row, active-lane masking, and the chunk-culling
    tables are exactly as _kernel_stream.
    """
    if cull:
        (cbnd_ref, t_ref, slot_ref, stats_ref, nstack, tlo_stack,
         thi_stack, ring_ref, ring_win, ring_tlo, ring_thi, tri_buf,
         tri_sem) = refs
    else:
        cbnd_ref = None
        (t_ref, slot_ref, stats_ref, nstack, tlo_stack, thi_stack,
         ring_ref, ring_win, ring_tlo, ring_thi, tri_buf,
         tri_sem) = refs
    rays = _ray_rows(o_ref, d_ref)
    act = a_ref[0:1, :]
    n_act = jnp.sum(act)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    obnd, ibnd = _packet_bounds_masked(rays, act)
    n_chunk_rows = tris_ref.shape[0]

    if cull:
        n_win = cbnd_ref.shape[0] * 16

        def read_cbnd(w):
            w = jnp.minimum(w, n_win - 1)
            r = w // 16

            def rd(k):
                def f():
                    return tuple(cbnd_ref[r, k * 8 + j] for j in range(6))
                return f

            return jax.lax.switch(w % 16, [rd(k) for k in range(16)])

    axinfo = _axinfo(obnd, ibnd)

    nf = 7 if cull else 6
    if layout == "padded":
        def read6(node):
            r = node + 1
            return tuple(nodes_ref[r, j] for j in range(nf))
    else:
        def read6(node):
            r = 1 + node // 16

            def rd(k):
                def f():
                    return tuple(nodes_ref[r, k * 8 + j]
                                 for j in range(nf))
                return f

            return jax.lax.switch(node % 16, [rd(k) for k in range(16)])

    hdr = tuple(nodes_ref[0, j] for j in range(6))
    rt_lo, rt_hi = _box_interval(hdr[0:3], hdr[3:6], obnd, ibnd)
    nstack[0] = 0
    tlo_stack[0] = rt_lo
    thi_stack[0] = rt_hi
    sp0 = ((rt_lo <= rt_hi) & (rt_hi > 0.0)
           & (n_act > 0.0)).astype(jnp.int32)

    best_t0 = jnp.full((1, tile), BIG, jnp.float32)
    best_s0 = jnp.full((1, tile), -1.0, jnp.float32)

    def start_win(row, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row, CHUNK_ROWS), :],
            tri_buf.at[slot], tri_sem.at[slot]).start()

    def wait_win(row, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row, CHUNK_ROWS), :],
            tri_buf.at[slot], tri_sem.at[slot]).wait()

    # Outer loop alternates two phases; vector state (best_t/best_s) only
    # flows through the outer carry and the consume drain, so the
    # scalar-heavy produce phase costs no vector copies per step.
    #
    #   PRODUCE (scalars only): pop nodes / advance the leaf-window
    #   cursor, cull-test windows, start their DMAs into ring slots —
    #   until the ring is full or the walk is exhausted.
    #   CONSUME: drain a tight MT loop over the ring — ALL of it when the
    #   walk is exhausted, else only half, so >= qdepth/2 DMAs stay in
    #   flight and the next batch's transfers land under this batch's MT.
    #
    # produce-phase carry: (sp, tail, wcur, wend, lrow0, win0, ltlo,
    #                       lthi, nv, nc)
    def produce_step(ps):
        (sp, tail, wcur, wend, lrow0, win0, ltlo, lthi, nv, nc,
         t_upper) = ps

        def enqueue(sp, wcur, wend, tail, lrow0, win0, ltlo, lthi, nv,
                    nc):
            if cull:
                def surv(w):
                    l0, l1, l2, h0, h1, h2 = read_cbnd(win0 + w)
                    t_en, t_ex = _box_interval(
                        (l0, l1, l2), (h0, h1, h2), obnd, ibnd)
                    return ((t_en <= jnp.minimum(lthi, t_upper))
                            & (t_ex >= ltlo) & (t_ex > 0.0))

                w = jax.lax.while_loop(
                    lambda w: (w < wend) & jnp.logical_not(surv(w)),
                    lambda w: w + 1, wcur)
            else:
                w = wcur
            nc = nc + (w - wcur)

            def do_enq(tail):
                row = jnp.minimum(lrow0 + w * CHUNK_ROWS,
                                  n_chunk_rows - CHUNK_ROWS)
                slot = tail % qdepth
                ring_ref[slot] = row
                ring_win[slot] = win0 + w
                ring_tlo[slot] = ltlo
                ring_thi[slot] = lthi
                start_win(row, slot)
                return tail + 1

            tail = jax.lax.cond(w < wend, do_enq, lambda t: t, tail)
            return (sp, tail, w + 1, wend, lrow0, win0, ltlo, lthi, nv,
                    nc)

        def pop(sp, wcur, wend, tail, lrow0, win0, ltlo, lthi, nv, nc):
            node = nstack[sp - 1]
            tlo = tlo_stack[sp - 1]
            thi = thi_stack[sp - 1]
            sp = sp - 1
            nv = nv + 1
            live = (tlo <= jnp.minimum(thi, t_upper)) & (thi > 0.0)

            def visit(sp, wcur, wend, nc):
                flds = read6(node)
                flags_f, split, cl_f, ch_f, qs_f, cnt_f = flds[:6]
                flags = flags_f.astype(jnp.int32)
                is_leaf = flags >= 4

                def leaf_case(sp, wcur, wend, nc):
                    qstart = qs_f.astype(jnp.int32)
                    count = cnt_f.astype(jnp.int32)
                    first = qstart * 4
                    r0 = first // 8
                    r_end = (first + count + 7) // 8
                    nwin = (r_end - r0 + CHUNK_ROWS - 1) // CHUNK_ROWS
                    return sp, jnp.int32(0), nwin, r0, nc

                def split_case(sp, wcur, wend, nc):
                    tp_min, tp_max, nlo = _split_plane_interval(
                        axinfo, flags & 3, split)
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
                    return sp, wcur, wend, r0_keep, nc

                r0_keep = lrow0  # unchanged on split/skip paths
                sp, wcur, wend, r0, nc = jax.lax.cond(
                    is_leaf, leaf_case, split_case, sp, wcur, wend, nc)
                # a fresh leaf's cull interval is the node's own
                ltlo_n = jnp.where(is_leaf, tlo, ltlo)
                lthi_n = jnp.where(is_leaf, thi, lthi)
                if cull:
                    win0_n = jnp.where(
                        is_leaf, flds[6].astype(jnp.int32), win0)
                else:
                    win0_n = win0
                return sp, wcur, wend, r0, win0_n, ltlo_n, lthi_n, nc

            def skip(sp, wcur, wend, nc):
                return sp, wcur, wend, lrow0, win0, ltlo, lthi, nc

            sp, wcur, wend, lr, w0, lt, lh, nc = jax.lax.cond(
                live, visit, skip, sp, wcur, wend, nc)
            return sp, tail, wcur, wend, lr, w0, lt, lh, nv, nc

        out = jax.lax.cond(wcur < wend, enqueue, pop,
                           sp, wcur, wend, tail, lrow0, win0, ltlo, lthi,
                           nv, nc)
        return out + (t_upper,)

    # outer carry: (sp, head, tail, wcur, wend, lrow0, win0, ltlo, lthi,
    #               best_t, best_s, t_upper, nv, nl, nc)
    def outer(state):
        (sp, head, tail, wcur, wend, lrow0, win0, ltlo, lthi,
         best_t, best_s, t_upper, nv, nl, nc) = state

        # ---- produce until ring full or walk exhausted (scalars only)
        def p_cond(ps):
            return ((ps[1] - head < qdepth)
                    & ((ps[2] < ps[3]) | (ps[0] > 0)))

        (sp, tail, wcur, wend, lrow0, win0, ltlo, lthi, nv, nc,
         _tu) = jax.lax.while_loop(
            p_cond, produce_step,
            (sp, tail, wcur, wend, lrow0, win0, ltlo, lthi, nv, nc,
             t_upper))

        # ---- consume: all if exhausted, else half the ring (keep the
        # rest in flight); at least one to guarantee progress
        done = jnp.logical_not((wcur < wend) | (sp > 0))
        ndrain = jnp.where(done, tail - head,
                           jnp.maximum(tail - head - qdepth // 2, 1))

        def drain(k, c):
            best_t, best_s, nl, nc = c
            idx = head + k
            slot = idx % qdepth
            row = ring_ref[slot]
            # the DMA must be waited no matter what; the MT may be
            # skipped if the window died since enqueue (t_upper shrank
            # during the lookahead) — lookahead then costs bandwidth,
            # not VPU time
            wait_win(row, slot)
            if cull:
                l0, l1, l2, h0, h1, h2 = read_cbnd(ring_win[slot])
                t_en, t_ex = _box_interval(
                    (l0, l1, l2), (h0, h1, h2), obnd, ibnd)
                still = ((t_en <= jnp.minimum(ring_thi[slot], t_upper))
                         & (t_ex >= ring_tlo[slot]) & (t_ex > 0.0))
            else:
                still = ring_tlo[slot] <= jnp.minimum(
                    ring_thi[slot], t_upper)

            def do_mt(best_t, best_s, nl, nc):
                best_t, best_s = _mt_math(so)(
                    tri_buf, slot, rays, tile, row, best_t, best_s,
                    act_row=act)
                return best_t, best_s, nl + 1, nc

            def skip_mt(best_t, best_s, nl, nc):
                return best_t, best_s, nl, nc + 1

            best_t, best_s, nl, nc = jax.lax.cond(
                still, do_mt, skip_mt, best_t, best_s, nl, nc)
            return best_t, best_s, nl, nc

        best_t, best_s, nl, nc = jax.lax.fori_loop(
            0, ndrain, drain, (best_t, best_s, nl, nc))
        head = head + ndrain
        # one scalar<-vector sync per batch instead of per chunk
        t_upper = jnp.max(jnp.where(act > 0.0, best_t, -BIG))
        return (sp, head, tail, wcur, wend, lrow0, win0, ltlo, lthi,
                best_t, best_s, t_upper, nv, nl, nc)

    state0 = (sp0, jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
              jnp.int32(0), jnp.int32(0), jnp.float32(0.0),
              jnp.float32(BIG), best_t0, best_s0, jnp.float32(BIG),
              jnp.int32(0), jnp.int32(0), jnp.int32(0))
    out = jax.lax.while_loop(
        lambda st: (st[0] > 0) | (st[3] < st[4]) | (st[1] < st[2]),
        outer, state0)
    best_t, best_s = out[9], out[10]
    nv, nl, nc = out[12], out[13], out[14]

    t_ref[:] = best_t
    slot_ref[:] = best_s
    stats_ref[:] = jnp.where(
        lane == 0, nv.astype(jnp.float32),
        jnp.where(lane == 1, nl.astype(jnp.float32),
                  jnp.where(lane == 2, n_act,
                            jnp.where(lane == 3, nc.astype(jnp.float32),
                                      0.0))))


# ---------------------------------------------------------------------------
# SMEM node tables: the scalar-read fix
#
# Measured (probes/probe_kernel_overheads.py, v5e): a SERIAL scalar read
# from VMEM costs ~56 ns; from SMEM ~17 ns. The interval walk does ~900
# scalar reads per tile (pops + chunk-cull tests) — ~50 ms/frame at 512²
# from VMEM, which is HALF the stream kernel's frame time. SMEM arrays
# lane-pad 2-D shapes (a [M, 8] table would cost 128 lanes/row = 1 MB),
# so the SMEM tables are FLAT 1-D, and node words are bit-packed so a
# split pop is 3 reads (w0 = flags|child_lo<<3, w1 = child_hi, split) and
# a leaf pop is 2 (w0 = flags|quad_start<<3, w1 = win0*16 + n_windows).
# ---------------------------------------------------------------------------

SMEM_BUDGET = 900 * 1024  # of the ~1 MB scalar memory; stacks/rings use
#   ~3 KB and Mosaic internals ~1 KB (measured: a 1.00 MB request
#   overflowed by exactly 1.1 KB)


def _smem_nodes(tree):
    """Flat SMEM node tables (nodes_i int32 [2M], nodes_f f32 [6+M]).

    nodes_f leads with the root AABB (seeds the packet interval), then
    per-node split values. Leaf w1 packs the chunk-cull window range as
    win0*64 + n_windows — 6 bits of window count covers leaves up to
    63*CHUNK_ROWS*8 triangles (the builder asserts the bound)."""
    nt = tree.node_table
    m = nt.shape[0]
    flags = nt[:, 7].astype(jnp.int32)
    is_leaf = flags >= 4
    cl = nt[:, 8].astype(jnp.int32)
    ch = nt[:, 9].astype(jnp.int32)
    qs = nt[:, 10].astype(jnp.int32)
    cnt = nt[:, 11].astype(jnp.int32)
    first = qs * 4
    r0 = first // 8
    r_end = (first + cnt + 7) // 8
    nwin = jnp.where(cnt > 0,
                     (r_end - r0 + CHUNK_ROWS - 1) // CHUNK_ROWS, 0)
    cs = getattr(tree, "chunk_start", None)
    win0 = (cs.astype(jnp.int32) if cs is not None
            else jnp.zeros((m,), jnp.int32))
    w0 = flags | jnp.where(is_leaf, qs, cl) << 3
    w1 = jnp.where(is_leaf, win0 * 64 + jnp.minimum(nwin, 63), ch)
    nodes_i = jnp.stack([w0, w1], axis=1).reshape(-1)
    nodes_f = jnp.concatenate([nt[0, 0:6], nt[:, 6]])
    return nodes_i, nodes_f


def _smem_cbnd(tree):
    """chunk_bnd ([W/16, 128] packed 16 windows/row for the VMEM path)
    re-flattened to f32 [6W] for SMEM: window w's AABB at [6w, 6w+6)."""
    cb = tree.chunk_bnd.reshape(-1, 8)  # [16*rows, 8]: lanes 0-5 = AABB
    return cb[:, 0:6].reshape(-1)


def _smem_fits(tree) -> bool:
    # the SMEM node word packs a leaf's window count in 6 bits: refuse
    # (→ VMEM-table fallback) any tree that could exceed 63 windows per
    # leaf instead of silently truncating its streams (ADVICE r2). The
    # bound uses the static max leaf size recorded at build/load time;
    # trees without it (hand-built) conservatively fall back. +1 row
    # covers worst-case qstart misalignment in _smem_nodes' r0/r_end.
    mlt = getattr(tree, "max_leaf_tris", None)
    if mlt is None:
        return False
    max_nwin = ((mlt + 7) // 8 + 1 + CHUNK_ROWS - 1) // CHUNK_ROWS
    if max_nwin > 63:
        return False
    m = tree.node_table.shape[0]
    n_bytes = (2 * m) * 4 + (6 + m) * 4
    cb = getattr(tree, "chunk_bnd", None)
    if cb is not None:
        n_bytes += cb.reshape(-1, 8).shape[0] * 6 * 4
    return n_bytes <= SMEM_BUDGET


def _smem_readers(nodes_i_ref, nodes_f_ref, cbnd_ref):
    def read_node(node):
        w0 = nodes_i_ref[2 * node]
        w1 = nodes_i_ref[2 * node + 1]
        sf = nodes_f_ref[6 + node]
        return w0, w1, sf

    def read_cbnd(w):
        n_vals = cbnd_ref.shape[0]
        b = jnp.minimum(6 * w, n_vals - 6)  # next_surv probes one past
        return tuple(cbnd_ref[b + j] for j in range(6))

    return read_node, read_cbnd


def _kernel_stream_smem(nodes_i_ref, nodes_f_ref, tris_ref, o_ref, d_ref,
                        a_ref, *refs, tile, cull=False, so=False,
                        frustum=False, strips=0):
    """_kernel_stream with the node/cull tables in SMEM (flat, packed) —
    same walk, same outputs; a pop costs 3 scalar reads at ~17 ns instead
    of 6-7 at ~56 ns, a window cull test 6. See the module comment above
    _smem_nodes for the measured motivation.

    frustum: shared-origin pixel-block tiles additionally cull each DMA
    window against the tile's EXACT 4-plane pinhole frustum (corner-ray
    hull planes precomputed per tile, _frustum_rows) — the interval test
    alone is an axis-aligned relaxation that keeps ~3/4 of windows on a
    1M-tri terrain; the plane test is ~40 scalar ops per window on the
    decoupled scalar core. Conservative: a window is culled only when its
    AABB's inner support point lies strictly outside a plane (with a
    relative slack), so hit results are identical.

    strips=k (k = tile//128 > 0): strip-gated mode. The tile's lanes are
    k 128-ray strips (8x16-pixel blocks, _blockify_strips); an XLA
    prepass (_strip_masks) has already tested EVERY leaf-DMA window
    against every strip's interval bounds AND exact corner frustum on
    the VPU, writing per-tile bitmask rows to HBM. The kernel DMAs its
    row into SMEM once and replaces the per-window scalar interval +
    frustum tests (~60-250 scalar ops each, measured NOT hidden by the
    vector pipeline) with one 17 ns SMEM read; the dense MT of each
    window then runs only for strips whose bit is set — windows the
    whole tile needed but one strip doesn't are skipped at [CR,128]
    granularity. Replaces cull/frustum (their tables aren't passed)."""
    if strips:
        cbnd_ref = None
        fr_ref = None
        (masks_ref, ten_ref, t_ref, slot_ref, stats_ref, nstack,
         tlo_stack, thi_stack, tri_buf, tri_sem, mask_smem, ten_smem,
         mask_sem, ten_sem) = refs
    elif cull and frustum:
        (cbnd_ref, fr_ref, t_ref, slot_ref, stats_ref, nstack, tlo_stack,
         thi_stack, tri_buf, tri_sem) = refs
    elif cull:
        fr_ref = None
        (cbnd_ref, t_ref, slot_ref, stats_ref, nstack, tlo_stack,
         thi_stack, tri_buf, tri_sem) = refs
    else:
        cbnd_ref = None
        fr_ref = None
        (t_ref, slot_ref, stats_ref, nstack, tlo_stack, thi_stack,
         tri_buf, tri_sem) = refs
    if strips:
        # per-tile window bitmask + entry-distance rows: two [8, Wc]
        # DMAs, scalar-read during the walk (started first so they land
        # under the bounds math below)
        mcp = pltpu.make_async_copy(
            masks_ref.at[pl.program_id(0)], mask_smem, mask_sem)
        mcp.start()
        tcp = pltpu.make_async_copy(
            ten_ref.at[pl.program_id(0)], ten_smem, ten_sem)
        tcp.start()
    rays = _ray_rows(o_ref, d_ref)
    act = a_ref[0:1, :]
    n_act = jnp.sum(act)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    obnd, ibnd = _packet_bounds_masked(rays, act)
    # flat SMEM frustum-table offset for this tile (hoisted: program_id
    # does not lower inside traced loop bodies in interpret mode)
    fb = 16 * pl.program_id(0) if fr_ref is not None else 0
    read_node, read_cbnd = _smem_readers(nodes_i_ref, nodes_f_ref,
                                         cbnd_ref)
    axinfo = _axinfo(obnd, ibnd)
    if strips:
        mcp.wait()
        tcp.wait()
        wlim = mask_smem.shape[0] * mask_smem.shape[1] - 1

        def read_mask(w):
            w = jnp.minimum(w, wlim)  # next_surv probes one past nwin
            return mask_smem[w % 8, w // 8]

        def read_ten(w):
            w = jnp.minimum(w, wlim)
            return ten_smem[w % 8, w // 8]

        # big tiles: dense math as tile//512 gates of 512 lanes, each
        # gated on its mask bit (the prepass emits gate-granular strips
        # there; 512 lanes keeps the ALU pipeline full); ray rows per
        # gate as DIRECT ref loads
        half_gate = None
        if tile // strips == 512:
            n_gates = strips
            half_rays = []
            for _g in range(n_gates):
                _sl = slice(512 * _g, 512 * (_g + 1))
                half_rays.append((o_ref[0:1, _sl], o_ref[1:2, _sl],
                                  o_ref[2:3, _sl], d_ref[0:1, _sl],
                                  d_ref[1:2, _sl], d_ref[2:3, _sl]))
            half_gate = (read_mask, half_rays, strips)

    hdr = tuple(nodes_f_ref[j] for j in range(6))
    rt_lo, rt_hi = _box_interval(hdr[0:3], hdr[3:6], obnd, ibnd)
    nstack[0] = 0
    tlo_stack[0] = rt_lo
    thi_stack[0] = rt_hi
    sp0 = ((rt_lo <= rt_hi) & (rt_hi > 0.0)
           & (n_act > 0.0)).astype(jnp.int32)

    best_t0 = jnp.full((1, tile), BIG, jnp.float32)
    best_s0 = jnp.full((1, tile), -1.0, jnp.float32)

    def body(state):
        sp, best_t, best_s, t_upper, nv, nl, nc, nsm = state
        node = nstack[sp - 1]
        tlo = tlo_stack[sp - 1]
        thi = thi_stack[sp - 1]
        sp = sp - 1
        nv = nv + 1
        live = (tlo <= jnp.minimum(thi, t_upper)) & (thi > 0.0)

        def visit(sp, best_t, best_s, t_upper, nl, nc, nsm):
            w0, w1, sf = read_node(node)
            flags = w0 & 7
            payload = w0 >> 3
            is_leaf = flags >= 4

            def leaf_case(sp, best_t, best_s, t_upper, nl, nc, nsm):
                qstart = payload
                r0 = qstart // 2  # qstart*4 tris / 8 per row
                if strips:
                    win0 = w1 >> 6
                    nwin = w1 & 63

                    def surv(w, tup):
                        # static geometry bit + dynamic occlusion: the
                        # prepass's conservative entry distance vs the
                        # live in-leaf t_upper (refreshed every
                        # CLPT_TUP_WIN windows; starts at the walk's
                        # min(thi, t_upper))
                        return ((read_mask(win0 + w) != 0)
                                & (read_ten(win0 + w) <= tup))

                    best_t, best_s, nch, ntot, nst = \
                        _stream_windows_culled(
                            r0, nwin, surv,
                            tris_ref, tri_buf, tri_sem, rays, tile, act,
                            best_t, best_s, so=so,
                            half_gate=(
                                lambda w: read_mask(win0 + w),
                                half_rays, strips
                            ) if half_gate is not None else None,
                            tup0=jnp.minimum(thi, t_upper))
                    nc = nc + (ntot - nch)
                    nsm = nsm + nst
                elif cull:
                    win0 = w1 >> 6
                    nwin = w1 & 63

                    def surv(w):
                        l0, l1, l2, h0, h1, h2 = read_cbnd(win0 + w)
                        t_en, t_ex = _box_interval(
                            (l0, l1, l2), (h0, h1, h2), obnd, ibnd)
                        keep = ((t_en <= jnp.minimum(thi, t_upper))
                                & (t_ex >= tlo) & (t_ex > 0.0))
                        if fr_ref is not None:
                            osx = fr_ref[fb + 12]
                            osy = fr_ref[fb + 13]
                            osz = fr_ref[fb + 14]
                            for p in range(4):
                                nx = fr_ref[fb + 3 * p]
                                ny = fr_ref[fb + 3 * p + 1]
                                nz = fr_ref[fb + 3 * p + 2]
                                cx = jnp.where(nx > 0.0, l0, h0) - osx
                                cy = jnp.where(ny > 0.0, l1, h1) - osy
                                cz = jnp.where(nz > 0.0, l2, h2) - osz
                                sup = nx * cx + ny * cy + nz * cz
                                slack = 1e-5 * (jnp.abs(cx) + jnp.abs(cy)
                                                + jnp.abs(cz))
                                keep = keep & (sup <= slack)
                        return keep

                    best_t, best_s, nch, ntot, nst = \
                        _stream_windows_culled(
                            r0, nwin, surv, tris_ref, tri_buf, tri_sem,
                            rays, tile, act, best_t, best_s, so=so)
                    nc = nc + (ntot - nch)
                    nsm = nsm + nst
                else:
                    # window count from w1 (packed even when cull tables
                    # are absent the builder stores nwin)
                    nwin = w1 & 63
                    best_t, best_s, nch, _, nst = \
                        _stream_windows_culled(
                            r0, nwin, lambda w: jnp.bool_(True), tris_ref,
                            tri_buf, tri_sem, rays, tile, act, best_t,
                            best_s, so=so)
                    nsm = nsm + nst
                t_up = jax.lax.cond(
                    (nv & TUP_MASK) == 0,
                    lambda: jnp.max(jnp.where(act > 0.0, best_t, -BIG)),
                    lambda: t_upper)
                return sp, best_t, best_s, t_up, nl + nch, nc, nsm

            def split_case(sp, best_t, best_s, t_upper, nl, nc, nsm):
                tp_min, tp_max, nlo = _split_plane_interval(
                    axinfo, flags & 3, sf)
                cl = payload
                ch = w1
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
                return sp, best_t, best_s, t_upper, nl, nc, nsm

            return jax.lax.cond(is_leaf, leaf_case, split_case,
                                sp, best_t, best_s, t_upper, nl, nc, nsm)

        sp, best_t, best_s, t_upper, nl, nc, nsm = jax.lax.cond(
            live, visit,
            lambda sp, bt, bs, tu, nl, nc, nsm: (sp, bt, bs, tu, nl, nc,
                                                 nsm),
            sp, best_t, best_s, t_upper, nl, nc, nsm)
        return sp, best_t, best_s, t_upper, nv, nl, nc, nsm

    _, best_t, best_s, _, nv, nl, nc, nsm = jax.lax.while_loop(
        lambda st: st[0] > 0, body,
        (sp0, best_t0, best_s0, jnp.float32(BIG), jnp.int32(0),
         jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    t_ref[:] = best_t
    slot_ref[:] = best_s
    stats_ref[:] = jnp.where(
        lane == 0, nv.astype(jnp.float32),
        jnp.where(lane == 1, nl.astype(jnp.float32),
                  jnp.where(lane == 2, n_act,
                            jnp.where(lane == 3, nc.astype(jnp.float32),
                                      jnp.where(lane == 4,
                                                nsm.astype(jnp.float32),
                                                0.0)))))


def _stream_windows_culled(r0, nwin, surv, tris_ref, tri_buf, tri_sem,
                           rays, tile, act, best_t, best_s, so=False,
                           half_gate=None, tup0=None):
    """Double-buffered DMA + dense MT over a leaf's `nwin` windows with a
    per-window survival test (shared by the SMEM kernels; the VMEM path's
    equivalent lives in _chunk_pipeline.stream_leaf_culled).

    (A per-128-lane-strip gated variant — lax.cond around [CR, 128]
    dense math per strip per window — was measured 2-3x SLOWER despite
    halving tests/ray: narrow op chains expose ALU latency the 512-lane
    form hides, collapsing the dense rate from ~70-80G to ~15G tests/s.
    Window masks from the strip prepass are still consumed, as the
    window-level union cull; the dense math stays full width.)

    tup0: in-leaf early termination (mask path). surv then takes a
    second argument, the CURRENT conservative t_upper, refreshed from
    the live best_t every CLPT_TUP_WIN streamed windows: fat leaves
    stream dozens of windows per pop, so the walk-level t_upper (updated
    per pop) goes stale exactly where the per-window t_en test could
    bite. One [1, tile] max + scalar sync per refresh.

    half_gate=(read_mask, gate_rays, n_bits): big-tile variant — the
    dense MT runs as tile//512 gates of 512 lanes, each under a scalar
    cond on its slice of the window's strip bitmask. 512 lanes keeps
    the ALU pipeline full (128-lane strips collapse it, above), so this
    keeps the walk/DMA amortization of the big tile while skipping the
    windows only other image regions need. gate_rays[g] must be DIRECT
    ref loads (lane slices of loaded registers carry offset layouts
    Mosaic can't broadcast)."""
    n_chunk_rows = tris_ref.shape[0]

    def row_of(b):
        return jnp.minimum(r0 + b * CHUNK_ROWS, n_chunk_rows - CHUNK_ROWS)

    def start_chunk(b, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row_of(b), CHUNK_ROWS), :],
            tri_buf.at[slot], tri_sem.at[slot]).start()

    def wait_chunk(b, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(b, CHUNK_ROWS), :],
            tri_buf.at[slot], tri_sem.at[slot]).wait()

    if tup0 is None:
        def surv2(w, tup):
            return surv(w)
        tup_start = jnp.float32(BIG)
        tup_every = 0
    else:
        surv2 = surv
        tup_start = tup0
        tup_every = TUP_WIN

    def next_surv(b, tup):
        return jax.lax.while_loop(
            lambda i: (i < nwin) & jnp.logical_not(surv2(i, tup)),
            lambda i: i + 1, b)

    b0 = next_surv(jnp.int32(0), tup_start)

    @pl.when(b0 < nwin)
    def _():
        start_chunk(b0, 0)

    def chunk_body(state):
        b, par, bt, bs, ns, nst, tup = state
        bn = next_surv(b + 1, tup)

        @pl.when(bn < nwin)
        def _():
            start_chunk(bn, 1 - par)

        wait_chunk(row_of(b), par)
        if half_gate is None:
            bt, bs = _mt_math(so)(tri_buf, par, rays, tile, row_of(b),
                                  bt, bs, act_row=act)
            nst = nst + 1
        else:
            read_mask, gate_rays, n_bits = half_gate
            m = read_mask(b)
            n_gates = len(gate_rays)
            gw = tile // n_gates
            gb = n_bits // n_gates
            parts_t, parts_s = [], []
            for g in range(n_gates):
                sl = slice(gw * g, gw * (g + 1))
                bt_g, bs_g = bt[:, sl], bs[:, sl]

                def run(bt0=bt_g, bs0=bs_g, rs=gate_rays[g]):
                    return _mt_math(so)(tri_buf, par, rs, gw,
                                        row_of(b), bt0, bs0,
                                        act_row=None)

                def skip(bt0=bt_g, bs0=bs_g):
                    return bt0, bs0

                on = ((m >> (gb * g)) & ((1 << gb) - 1)) != 0
                bt_g, bs_g = jax.lax.cond(on, run, skip)
                nst = nst + on.astype(jnp.int32)
                parts_t.append(bt_g)
                parts_s.append(bs_g)
            bt = jnp.concatenate(parts_t, axis=1)
            bs = jnp.concatenate(parts_s, axis=1)
        if tup_every:
            # refresh the in-leaf t_upper from the live best hits
            # (strips mode is fully active, no mask needed)
            tup = jax.lax.cond(
                (ns % tup_every) == tup_every - 1,
                lambda b=bt, t=tup: jnp.minimum(t, jnp.max(b)),
                lambda t=tup: t)
        return bn, 1 - par, bt, bs, ns + 1, nst, tup

    _, _, best_t, best_s, streamed, n_strip_mt, _ = jax.lax.while_loop(
        lambda st: st[0] < nwin, chunk_body,
        (b0, jnp.int32(0), best_t, best_s, jnp.int32(0), jnp.int32(0),
         tup_start))
    return best_t, best_s, streamed, nwin, n_strip_mt


def _kernel_queue_smem(nodes_i_ref, nodes_f_ref, tris_ref, o_ref, d_ref,
                       a_ref, *refs, tile, qdepth, cull=False, so=False):
    """_kernel_queue (phased producer/consumer ring) with SMEM node/cull
    tables — cross-leaf DMA lookahead AND cheap scalar reads."""
    if cull:
        (cbnd_ref, t_ref, slot_ref, stats_ref, nstack, tlo_stack,
         thi_stack, ring_ref, ring_win, ring_tlo, ring_thi, tri_buf,
         tri_sem) = refs
    else:
        cbnd_ref = None
        (t_ref, slot_ref, stats_ref, nstack, tlo_stack, thi_stack,
         ring_ref, ring_win, ring_tlo, ring_thi, tri_buf,
         tri_sem) = refs
    rays = _ray_rows(o_ref, d_ref)
    act = a_ref[0:1, :]
    n_act = jnp.sum(act)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    obnd, ibnd = _packet_bounds_masked(rays, act)
    n_chunk_rows = tris_ref.shape[0]
    read_node, read_cbnd = _smem_readers(nodes_i_ref, nodes_f_ref,
                                         cbnd_ref)
    axinfo = _axinfo(obnd, ibnd)

    hdr = tuple(nodes_f_ref[j] for j in range(6))
    rt_lo, rt_hi = _box_interval(hdr[0:3], hdr[3:6], obnd, ibnd)
    nstack[0] = 0
    tlo_stack[0] = rt_lo
    thi_stack[0] = rt_hi
    sp0 = ((rt_lo <= rt_hi) & (rt_hi > 0.0)
           & (n_act > 0.0)).astype(jnp.int32)

    best_t0 = jnp.full((1, tile), BIG, jnp.float32)
    best_s0 = jnp.full((1, tile), -1.0, jnp.float32)

    def start_win(row, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row, CHUNK_ROWS), :],
            tri_buf.at[slot], tri_sem.at[slot]).start()

    def wait_win(row, slot):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row, CHUNK_ROWS), :],
            tri_buf.at[slot], tri_sem.at[slot]).wait()

    # produce carry: (sp, tail, wcur, wend, lrow0, win0, ltlo, lthi, nv,
    #                 nc, t_upper)
    def produce_step(ps):
        (sp, tail, wcur, wend, lrow0, win0, ltlo, lthi, nv, nc,
         t_upper) = ps

        def enqueue(sp, wcur, wend, tail, lrow0, win0, ltlo, lthi, nv,
                    nc):
            if cull:
                def surv(w):
                    l0, l1, l2, h0, h1, h2 = read_cbnd(win0 + w)
                    t_en, t_ex = _box_interval(
                        (l0, l1, l2), (h0, h1, h2), obnd, ibnd)
                    return ((t_en <= jnp.minimum(lthi, t_upper))
                            & (t_ex >= ltlo) & (t_ex > 0.0))

                w = jax.lax.while_loop(
                    lambda w: (w < wend) & jnp.logical_not(surv(w)),
                    lambda w: w + 1, wcur)
            else:
                w = wcur
            nc = nc + (w - wcur)

            def do_enq(tail):
                row = jnp.minimum(lrow0 + w * CHUNK_ROWS,
                                  n_chunk_rows - CHUNK_ROWS)
                slot = tail % qdepth
                ring_ref[slot] = row
                ring_win[slot] = win0 + w
                ring_tlo[slot] = ltlo
                ring_thi[slot] = lthi
                start_win(row, slot)
                return tail + 1

            tail = jax.lax.cond(w < wend, do_enq, lambda t: t, tail)
            return (sp, tail, w + 1, wend, lrow0, win0, ltlo, lthi, nv,
                    nc)

        def pop(sp, wcur, wend, tail, lrow0, win0, ltlo, lthi, nv, nc):
            node = nstack[sp - 1]
            tlo = tlo_stack[sp - 1]
            thi = thi_stack[sp - 1]
            sp = sp - 1
            nv = nv + 1
            live = (tlo <= jnp.minimum(thi, t_upper)) & (thi > 0.0)

            def visit(sp, wcur, wend, nc):
                w0, w1, sf = read_node(node)
                flags = w0 & 7
                payload = w0 >> 3
                is_leaf = flags >= 4

                def leaf_case(sp, wcur, wend, nc):
                    return sp, jnp.int32(0), w1 & 63, payload // 2, nc

                def split_case(sp, wcur, wend, nc):
                    tp_min, tp_max, nlo = _split_plane_interval(
                        axinfo, flags & 3, sf)
                    cl = payload
                    ch = w1
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
                    return sp, wcur, wend, r0_keep, nc

                r0_keep = lrow0
                sp, wcur, wend, r0, nc = jax.lax.cond(
                    is_leaf, leaf_case, split_case, sp, wcur, wend, nc)
                ltlo_n = jnp.where(is_leaf, tlo, ltlo)
                lthi_n = jnp.where(is_leaf, thi, lthi)
                if cull:
                    win0_n = jnp.where(is_leaf, w1 >> 6, win0)
                else:
                    win0_n = win0
                return sp, wcur, wend, r0, win0_n, ltlo_n, lthi_n, nc

            def skip(sp, wcur, wend, nc):
                return sp, wcur, wend, lrow0, win0, ltlo, lthi, nc

            sp, wcur, wend, lr, w0_, lt, lh, nc = jax.lax.cond(
                live, visit, skip, sp, wcur, wend, nc)
            return sp, tail, wcur, wend, lr, w0_, lt, lh, nv, nc

        out = jax.lax.cond(wcur < wend, enqueue, pop,
                           sp, wcur, wend, tail, lrow0, win0, ltlo, lthi,
                           nv, nc)
        return out + (t_upper,)

    def outer(state):
        (sp, head, tail, wcur, wend, lrow0, win0, ltlo, lthi,
         best_t, best_s, t_upper, nv, nl, nc) = state

        def p_cond(ps):
            return ((ps[1] - head < qdepth)
                    & ((ps[2] < ps[3]) | (ps[0] > 0)))

        (sp, tail, wcur, wend, lrow0, win0, ltlo, lthi, nv, nc,
         _tu) = jax.lax.while_loop(
            p_cond, produce_step,
            (sp, tail, wcur, wend, lrow0, win0, ltlo, lthi, nv, nc,
             t_upper))

        done = jnp.logical_not((wcur < wend) | (sp > 0))
        ndrain = jnp.where(done, tail - head,
                           jnp.maximum(tail - head - qdepth // 2, 1))

        def drain(k, c):
            best_t, best_s, nl, nc = c
            idx = head + k
            slot = idx % qdepth
            row = ring_ref[slot]
            wait_win(row, slot)
            if cull:
                l0, l1, l2, h0, h1, h2 = read_cbnd(ring_win[slot])
                t_en, t_ex = _box_interval(
                    (l0, l1, l2), (h0, h1, h2), obnd, ibnd)
                still = ((t_en <= jnp.minimum(ring_thi[slot], t_upper))
                         & (t_ex >= ring_tlo[slot]) & (t_ex > 0.0))
            else:
                still = ring_tlo[slot] <= jnp.minimum(
                    ring_thi[slot], t_upper)

            def do_mt(best_t, best_s, nl, nc):
                best_t, best_s = _mt_math(so)(
                    tri_buf, slot, rays, tile, row, best_t, best_s,
                    act_row=act)
                return best_t, best_s, nl + 1, nc

            best_t, best_s, nl, nc = jax.lax.cond(
                still, do_mt,
                lambda bt, bs, nl, nc: (bt, bs, nl, nc + 1),
                best_t, best_s, nl, nc)
            return best_t, best_s, nl, nc

        best_t, best_s, nl, nc = jax.lax.fori_loop(
            0, ndrain, drain, (best_t, best_s, nl, nc))
        head = head + ndrain
        t_upper = jnp.max(jnp.where(act > 0.0, best_t, -BIG))
        return (sp, head, tail, wcur, wend, lrow0, win0, ltlo, lthi,
                best_t, best_s, t_upper, nv, nl, nc)

    state0 = (sp0, jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
              jnp.int32(0), jnp.int32(0), jnp.float32(0.0),
              jnp.float32(BIG), best_t0, best_s0, jnp.float32(BIG),
              jnp.int32(0), jnp.int32(0), jnp.int32(0))
    out = jax.lax.while_loop(
        lambda st: (st[0] > 0) | (st[3] < st[4]) | (st[1] < st[2]),
        outer, state0)
    best_t, best_s = out[9], out[10]
    nv, nl, nc = out[12], out[13], out[14]

    t_ref[:] = best_t
    slot_ref[:] = best_s
    stats_ref[:] = jnp.where(
        lane == 0, nv.astype(jnp.float32),
        jnp.where(lane == 1, nl.astype(jnp.float32),
                  jnp.where(lane == 2, n_act,
                            jnp.where(lane == 3, nc.astype(jnp.float32),
                                      0.0))))


def _machine_init(tile):
    """Per-packet traversal-machine state: (sp, rem, row0, cur, par, go_l,
    go_r, best_l, slot_l, best_r, slot_r, tu_l, tu_r, nv, nl). rem>0 ⇒
    mid-leaf: chunk `cur` of the leaf at quad-table row `row0` is DMA'd
    and due; go_l/go_r say which HALF-packets the leaf survives for."""
    h = tile // 2
    return (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.full((1, h), BIG, jnp.float32),
            jnp.full((1, h), -1.0, jnp.float32),
            jnp.full((1, h), BIG, jnp.float32),
            jnp.full((1, h), -1.0, jnp.float32),
            jnp.float32(BIG), jnp.float32(BIG),
            jnp.int32(0), jnp.int32(0))


def _make_machine(nodes_ref, tris_ref, stack_refs, m, tri_buf, tri_sem,
                  rays_refs, layout, tile, buf_base):
    """One packet's traversal as a single-STEP state machine, so two
    machines can interleave inside one while_loop body: each step is
    either one node pop (scalar work) or one leaf chunk (VPU work + DMA),
    and the VLIW scheduler overlaps machine A's dense MT with machine B's
    scalar pops — the two-packet software pipelining of VERDICT r1 #1a.

    Each packet is additionally SPLIT-CULLED in halves: the stack carries
    a [t_lo, t_hi] interval per half-packet (computed from the half's own
    conservative bounds — about half the spatial footprint), each half
    keeps its own t_upper, and a leaf's dense MT runs only for the halves
    it survives — packet granularity for the scalar walk, half-packet
    granularity for the (dominant) vector work.

    m: this machine's row in the (2, STACK) scratch arrays.
    buf_base: which pair of DMA buffers/semaphores this machine owns.
    """
    nstack, tlo_l_s, thi_l_s, tlo_r_s, thi_r_s = stack_refs
    h = tile // 2
    o_ref, d_ref, a_ref, base = rays_refs
    # read each half directly from the refs at static offsets — chained
    # lane-slicing of already-sliced VALUES produces layouts Mosaic's
    # broadcast can't consume ("Invalid input layout")
    def half(off):
        return (o_ref[0:1, base + off:base + off + h],
                o_ref[1:2, base + off:base + off + h],
                o_ref[2:3, base + off:base + off + h],
                d_ref[0:1, base + off:base + off + h],
                d_ref[1:2, base + off:base + off + h],
                d_ref[2:3, base + off:base + off + h])

    rays_l = half(0)
    rays_r = half(h)
    act_l = a_ref[0:1, base:base + h]
    act_r = a_ref[0:1, base + h:base + tile]
    na_l, na_r = jnp.sum(act_l), jnp.sum(act_r)
    bnd_l = _packet_bounds_masked(rays_l, act_l)
    bnd_r = _packet_bounds_masked(rays_r, act_r)
    n_chunk_rows = tris_ref.shape[0]

    ax_l = _axinfo(*bnd_l)
    ax_r = _axinfo(*bnd_r)

    if layout == "padded":
        def read6(node):
            r = node + 1
            return tuple(nodes_ref[r, j] for j in range(6))
    else:
        def read6(node):
            r = 1 + node // 16

            def rd(k):
                def f():
                    return tuple(nodes_ref[r, k * 8 + j] for j in range(6))
                return f

            return jax.lax.switch(node % 16, [rd(k) for k in range(16)])

    def row_of(row0, b):
        return jnp.minimum(row0 + b * CHUNK_ROWS,
                           n_chunk_rows - CHUNK_ROWS)

    def start_chunk(row0, b, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row_of(row0, b), CHUNK_ROWS), :],
            tri_buf.at[buf_base + par], tri_sem.at[buf_base + par]).start()

    def wait_chunk(row0, b, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row_of(row0, b), CHUNK_ROWS), :],
            tri_buf.at[buf_base + par], tri_sem.at[buf_base + par]).wait()

    def seed():
        """Push the root (header AABB interval per half); initial sp."""
        hdr = tuple(nodes_ref[0, j] for j in range(6))
        lo_h, hi_h = hdr[0:3], hdr[3:6]
        lt_lo, lt_hi = _box_interval(lo_h, hi_h, *bnd_l)
        rt_lo, rt_hi = _box_interval(lo_h, hi_h, *bnd_r)
        # an empty half must never go live: poison its interval
        lt_hi = jnp.where(na_l > 0.0, lt_hi, -BIG)
        rt_hi = jnp.where(na_r > 0.0, rt_hi, -BIG)
        nstack[m, 0] = 0
        tlo_l_s[m, 0] = lt_lo
        thi_l_s[m, 0] = lt_hi
        tlo_r_s[m, 0] = rt_lo
        thi_r_s[m, 0] = rt_hi
        ok = (((lt_lo <= lt_hi) & (lt_hi > 0.0))
              | ((rt_lo <= rt_hi) & (rt_hi > 0.0)))
        return ok.astype(jnp.int32)

    def step(state):
        (sp, rem, row0, cur, par, go_l, go_r, best_l, slot_l, best_r,
         slot_r, tu_l, tu_r, nv, nl) = state

        def chunk_step(sp, rem, row0, cur, par, go_l, go_r, best_l,
                       slot_l, best_r, slot_r, tu_l, tu_r, nv, nl):
            @pl.when(rem > 1)
            def _():
                start_chunk(row0, cur + 1, 1 - par)

            wait_chunk(row0, cur, par)
            crow = row_of(row0, cur)

            def mt_l(bt, bs):
                return _mt_chunk_math(tri_buf, buf_base + par, rays_l, h,
                                      crow, bt, bs, act_row=act_l)

            def mt_r(bt, bs):
                return _mt_chunk_math(tri_buf, buf_base + par, rays_r, h,
                                      crow, bt, bs, act_row=act_r)

            best_l, slot_l = jax.lax.cond(
                go_l > 0, mt_l, lambda bt, bs: (bt, bs), best_l, slot_l)
            best_r, slot_r = jax.lax.cond(
                go_r > 0, mt_r, lambda bt, bs: (bt, bs), best_r, slot_r)
            rem2 = rem - 1
            refresh = (rem2 == 0) & ((nv & TUP_MASK) == 0)
            tu_l = jax.lax.cond(
                refresh & (go_l > 0),
                lambda: jnp.max(jnp.where(act_l > 0.0, best_l, -BIG)),
                lambda: tu_l)
            tu_r = jax.lax.cond(
                refresh & (go_r > 0),
                lambda: jnp.max(jnp.where(act_r > 0.0, best_r, -BIG)),
                lambda: tu_r)
            return (sp, rem2, row0, cur + 1, 1 - par, go_l, go_r, best_l,
                    slot_l, best_r, slot_r, tu_l, tu_r, nv, nl)

        def pop_step(sp, rem, row0, cur, par, go_l, go_r, best_l, slot_l,
                     best_r, slot_r, tu_l, tu_r, nv, nl):
            node = nstack[m, sp - 1]
            tlo_l = tlo_l_s[m, sp - 1]
            thi_l = thi_l_s[m, sp - 1]
            tlo_r = tlo_r_s[m, sp - 1]
            thi_r = thi_r_s[m, sp - 1]
            sp = sp - 1
            nv = nv + 1
            # re-check at pop time: the t_uppers shrank since push
            live_l = (tlo_l <= jnp.minimum(thi_l, tu_l)) & (thi_l > 0.0)
            live_r = (tlo_r <= jnp.minimum(thi_r, tu_r)) & (thi_r > 0.0)

            def visit(sp, rem, row0, cur, par, go_l, go_r, nl):
                flags_f, split, cl_f, ch_f, qs_f, cnt_f = read6(node)
                flags = flags_f.astype(jnp.int32)
                is_leaf = flags >= 4

                def leaf_case(sp, rem, row0, cur, par, go_l, go_r, nl):
                    qstart = qs_f.astype(jnp.int32)
                    count = cnt_f.astype(jnp.int32)
                    first = qstart * 4
                    r0 = first // 8
                    r_end = (first + count + 7) // 8
                    nch = (r_end - r0 + CHUNK_ROWS - 1) // CHUNK_ROWS

                    # empty leaf (count=0): nch=0, and starting a DMA that
                    # no chunk step will ever wait corrupts the semaphore
                    # pairing (hardware crash on surface scenes)
                    @pl.when(nch > 0)
                    def _():
                        start_chunk(r0, 0, 0)

                    return (sp, nch, r0, jnp.int32(0), jnp.int32(0),
                            live_l.astype(jnp.int32),
                            live_r.astype(jnp.int32), nl + nch)

                def split_case(sp, rem, row0, cur, par, go_l, go_r, nl):
                    axis = flags & 3

                    lp_min, lp_max, l_nlo = _split_plane_interval(
                        ax_l, axis, split)
                    rp_min, rp_max, _ = _split_plane_interval(
                        ax_r, axis, split)
                    cl = cl_f.astype(jnp.int32)
                    ch = ch_f.astype(jnp.int32)
                    # visit order from the LEFT half's dominant sign (the
                    # halves share a camera; ties are harmless)
                    near = jnp.where(l_nlo, cl, ch)
                    far = jnp.where(l_nlo, ch, cl)
                    # left half's near/far assignment also fixes which
                    # plane bound applies to which child for the right
                    # half (same child ids, each half keeps its own t)
                    lfar_lo = jnp.maximum(tlo_l, lp_min)
                    rfar_lo = jnp.maximum(tlo_r, rp_min)
                    lnear_hi = jnp.minimum(thi_l, lp_max)
                    rnear_hi = jnp.minimum(thi_r, rp_max)
                    push_far = ((lfar_lo <= jnp.minimum(thi_l, tu_l))
                                | (rfar_lo <= jnp.minimum(thi_r, tu_r)))

                    @pl.when(push_far)
                    def _():
                        nstack[m, sp] = far
                        tlo_l_s[m, sp] = lfar_lo
                        thi_l_s[m, sp] = thi_l
                        tlo_r_s[m, sp] = rfar_lo
                        thi_r_s[m, sp] = thi_r

                    sp = sp + push_far.astype(jnp.int32)
                    push_near = ((tlo_l <= jnp.minimum(lnear_hi, tu_l))
                                 | (tlo_r <= jnp.minimum(rnear_hi, tu_r)))

                    @pl.when(push_near)
                    def _():
                        nstack[m, sp] = near
                        tlo_l_s[m, sp] = tlo_l
                        thi_l_s[m, sp] = lnear_hi
                        tlo_r_s[m, sp] = tlo_r
                        thi_r_s[m, sp] = rnear_hi

                    sp = sp + push_near.astype(jnp.int32)
                    return sp, rem, row0, cur, par, go_l, go_r, nl

                return jax.lax.cond(is_leaf, leaf_case, split_case,
                                    sp, rem, row0, cur, par, go_l, go_r,
                                    nl)

            sp, rem, row0, cur, par, go_l, go_r, nl = jax.lax.cond(
                live_l | live_r, visit,
                lambda sp, rem, row0, cur, par, gl, gr, nl: (
                    sp, rem, row0, cur, par, gl, gr, nl),
                sp, rem, row0, cur, par, go_l, go_r, nl)
            return (sp, rem, row0, cur, par, go_l, go_r, best_l, slot_l,
                    best_r, slot_r, tu_l, tu_r, nv, nl)

        def idle(*s):
            return s

        busy = (sp > 0) | (rem > 0)
        return jax.lax.cond(
            busy,
            lambda *s: jax.lax.cond(s[1] > 0, chunk_step, pop_step, *s),
            idle,
            sp, rem, row0, cur, par, go_l, go_r, best_l, slot_l, best_r,
            slot_r, tu_l, tu_r, nv, nl)

    return seed, step


def _kernel_stream2(nodes_ref, tris_ref, o_ref, d_ref, a_ref, t_ref,
                    slot_ref, stats_ref, nstack, tlo_l, thi_l, tlo_r,
                    thi_r, tri_buf, tri_sem, *, tile, layout):
    """Dual-packet stream engine: one grid program owns TWO adjacent ray
    tiles, stepping their traversal machines alternately so A's dense
    chunk intersection (VPU + DMA wait) overlaps B's node pops (scalar
    core) and vice versa — the scalar walk rides under the vector work
    instead of serializing with it. Each packet is half-split-culled
    (see _make_machine)."""
    act_a = a_ref[0:1, :tile]
    act_b = a_ref[0:1, tile:]
    na = jnp.sum(act_a)
    nb = jnp.sum(act_b)
    h = tile // 2

    t_ref[:] = jnp.full((1, 2 * tile), BIG, jnp.float32)
    slot_ref[:] = jnp.full((1, 2 * tile), -1.0, jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)

    stacks = (nstack, tlo_l, thi_l, tlo_r, thi_r)
    seed_a, step_a = _make_machine(
        nodes_ref, tris_ref, stacks, 0, tri_buf, tri_sem,
        (o_ref, d_ref, a_ref, 0), layout, tile, 0)
    seed_b, step_b = _make_machine(
        nodes_ref, tris_ref, stacks, 1, tri_buf, tri_sem,
        (o_ref, d_ref, a_ref, tile), layout, tile, 2)

    sa = _machine_init(tile)
    sb = _machine_init(tile)
    sp_a0 = jax.lax.cond(na > 0.0, seed_a, lambda: jnp.int32(0))
    sp_b0 = jax.lax.cond(nb > 0.0, seed_b, lambda: jnp.int32(0))
    sa = (sp_a0,) + sa[1:]
    sb = (sp_b0,) + sb[1:]

    def busy(s):
        return (s[0] > 0) | (s[1] > 0)

    def body(st):
        sa, sb = st
        return step_a(sa), step_b(sb)

    sa, sb = jax.lax.while_loop(lambda st: busy(st[0]) | busy(st[1]),
                                body, (sa, sb))

    t_ref[0:1, 0:h] = sa[7]
    t_ref[0:1, h:tile] = sa[9]
    t_ref[0:1, tile:tile + h] = sb[7]
    t_ref[0:1, tile + h:] = sb[9]
    slot_ref[0:1, 0:h] = sa[8]
    slot_ref[0:1, h:tile] = sa[10]
    slot_ref[0:1, tile:tile + h] = sb[8]
    slot_ref[0:1, tile + h:] = sb[10]
    va = jnp.where(lane == 0, sa[13].astype(jnp.float32),
                   jnp.where(lane == 1, sa[14].astype(jnp.float32),
                             jnp.where(lane == 2, na, 0.0)))
    vb = jnp.where(lane == 0, sb[13].astype(jnp.float32),
                   jnp.where(lane == 1, sb[14].astype(jnp.float32),
                             jnp.where(lane == 2, nb, 0.0)))
    stats_ref[:] = jnp.where(srow < 8, va, vb)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "layout"))
def _packet_call_stream2(nodes, tris128, orig_t, dir_t, act,
                         interpret=False, tile=TILE, layout="padded"):
    n = orig_t.shape[1]
    n_prog = n // (2 * tile)
    return pl.pallas_call(
        functools.partial(_kernel_stream2, tile=tile, layout=layout),
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((n // tile * 8, 128), jnp.float32),
        ],
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 2 * tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2 * tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, STACK_DEPTH), jnp.int32),
            pltpu.SMEM((2, STACK_DEPTH), jnp.float32),
            pltpu.SMEM((2, STACK_DEPTH), jnp.float32),
            pltpu.SMEM((2, STACK_DEPTH), jnp.float32),
            pltpu.SMEM((2, STACK_DEPTH), jnp.float32),
            pltpu.VMEM((4, CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(nodes, tris128, orig_t, dir_t, act)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _streaming_specs(n, tile):
    """in/out specs shared by the tri-streaming kernels (tri_stream, wide):
    table in VMEM, tris in HBM (pl.ANY), per-tile ray/result blocks."""
    n_tiles = n // tile
    return dict(
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
        ],
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # node table
            pl.BlockSpec(memory_space=pl.ANY),        # tri chunks (HBM)
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )


_STREAM_SCRATCH = [
    pltpu.SMEM((STACK_DEPTH,), jnp.int32),
    pltpu.VMEM((2, CHUNK_ROWS, 128), jnp.float32),
    pltpu.SemaphoreType.DMA((2,)),
]


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _packet_call_wide(wide_table, tris128, orig_t, dir_t, interpret=False,
                      tile=TILE):
    return pl.pallas_call(
        functools.partial(_kernel_wide, tile=tile),
        **_streaming_specs(orig_t.shape[1], tile),
        scratch_shapes=_STREAM_SCRATCH,
        interpret=interpret,
    )(wide_table, tris128, orig_t, dir_t)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _packet_call_tri_stream(table, tris128, orig_t, dir_t, interpret=False,
                            tile=TILE):
    return pl.pallas_call(
        functools.partial(_kernel_tri_stream, tile=tile),
        **_streaming_specs(orig_t.shape[1], tile),
        scratch_shapes=_STREAM_SCRATCH,
        interpret=interpret,
    )(table, tris128, orig_t, dir_t)


PAD_NODE_LIMIT = 8192  # padded layout: [M, 8] lane-pads to 512 B/node


def _stream_layout(num_nodes: int) -> str:
    return "padded" if num_nodes <= PAD_NODE_LIMIT else "packed16"


def _stream_nodes(tree):
    """Node data for the stream kernel: header row (root AABB) + per-node
    [flags, split, child_lo, child_hi, quad_start, tri_count,
    chunk_start, 0] (chunk_start 0 when the tree carries no chunk-culling
    tables)."""
    nt = tree.node_table
    m = nt.shape[0]
    cs = getattr(tree, "chunk_start", None)
    cs_col = (cs.astype(nt.dtype)[:, None] if cs is not None
              else jnp.zeros((m, 1), nt.dtype))
    body = jnp.concatenate(
        [nt[:, 7:8], nt[:, 6:7], nt[:, 8:12], cs_col,
         jnp.zeros((m, 1), nt.dtype)],
        axis=1)                                        # [M, 8]
    hdr = jnp.concatenate([nt[0, 0:6], jnp.zeros((2,), nt.dtype)])[None]
    if _stream_layout(m) == "padded":
        return jnp.concatenate([hdr, body], axis=0)    # [1+M, 8]
    pad = (-m) % 16
    if pad:
        body = jnp.concatenate(
            [body, jnp.zeros((pad, 8), nt.dtype)], axis=0)
    return jnp.concatenate(
        [jnp.pad(hdr, ((0, 0), (0, 120))), body.reshape(-1, 128)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "layout",
                                             "precision", "so"))
def _packet_call_stream(nodes, tris128, orig_t, dir_t, act, chunk_bnd=None,
                        interpret=False, tile=TILE, layout="padded",
                        precision="f32", so=False):
    specs = _streaming_specs(orig_t.shape[1], tile)
    specs["in_specs"].append(
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM))
    cull = chunk_bnd is not None
    args = [nodes, tris128, orig_t, dir_t, act]
    if cull:
        specs["in_specs"].append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(chunk_bnd)
    cdtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    return pl.pallas_call(
        functools.partial(_kernel_stream, tile=tile, layout=layout,
                          compute_dtype=cdtype, cull=cull, so=so),
        **specs,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.VMEM((2, CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)


QUEUE_DEPTH = int(_os.environ.get("CLPT_QUEUE_DEPTH", "8"))

# in-leaf t_upper refresh cadence for the mask-culled window stream
# (0 disables; see _stream_windows_culled tup0). Measured on terrain
# 1M tris / leaf 3072 / tile 2048: cadence 4 and 8 both LOSE ~2% (the
# [1, tile] max + vector->scalar sync per refresh outweighs the extra
# windows culled) — kept as an opt-in for scenes with more occlusion
# depth per leaf.
TUP_WIN = int(_os.environ.get("CLPT_TUP_WIN", "0"))


def _smem_specs(n, tile, cull, frustum=False, strips=False):
    """in/out specs for the SMEM-table kernels: flat node tables (and
    chunk AABBs) in scalar memory, triangles in HBM, per-tile blocks."""
    specs = _streaming_specs(n, tile)
    specs["in_specs"] = [
        pl.BlockSpec(memory_space=pltpu.SMEM),    # nodes_i (flat i32)
        pl.BlockSpec(memory_space=pltpu.SMEM),    # nodes_f (flat f32)
        pl.BlockSpec(memory_space=pl.ANY),        # tri chunks (HBM)
        pl.BlockSpec((3, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),    # active mask
    ]
    if strips:
        # mask-culled mode: per-tile window bitmask + entry-distance
        # rows stay in HBM (the kernel DMAs its own rows into SMEM
        # scratch); no cbnd/frustum tables
        specs["in_specs"].append(pl.BlockSpec(memory_space=pl.ANY))
        specs["in_specs"].append(pl.BlockSpec(memory_space=pl.ANY))
        return specs
    if cull:
        specs["in_specs"].append(
            pl.BlockSpec(memory_space=pltpu.SMEM))  # cbnd (flat f32)
    if frustum:
        # whole flat array (Mosaic rejects narrow blocked SMEM specs);
        # the kernel indexes row program_id(0) at 16*f32 stride
        specs["in_specs"].append(
            pl.BlockSpec(memory_space=pltpu.SMEM))  # per-tile planes
    return specs


def _frustum_rows(dir_b, origin, tile, th, tw):
    """Per-tile pinhole frustum planes for the scalar window cull.

    Each pixel-block tile's ray directions lie inside the cone hulled by
    its 4 corner rays; returns [n_tiles, 16] f32 rows: 4 unit outward
    plane normals (12), the shared origin (3), pad (1). Degenerate edges
    (zero cross) emit a zero normal, which never culls."""
    nt_ = dir_b.shape[0] // tile
    d2 = dir_b.reshape(nt_, tile, 3)
    c = d2[:, (0, tw - 1, (th - 1) * tw, tile - 1), :]   # [nt, 4, 3]
    ns = []
    for a, b in ((0, 1), (1, 3), (3, 2), (2, 0)):
        o0, o1 = (i for i in range(4) if i not in (a, b))
        n = jnp.cross(c[:, a], c[:, b])
        s = jnp.sum(n * (c[:, o0] + c[:, o1]), axis=-1, keepdims=True)
        n = jnp.where(s > 0.0, -n, n)   # interior dirs: n . d <= 0
        nn = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
        ns.append(jnp.where(nn > 1e-20, n / jnp.maximum(nn, 1e-30), 0.0))
    o = jnp.broadcast_to(
        jnp.asarray(origin, jnp.float32).reshape(1, 3), (nt_, 3))
    return jnp.concatenate(
        ns + [o, jnp.zeros((nt_, 1), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "so",
                                              "n_strips"))
def _packet_call_stream_smem(nodes_i, nodes_f, tris128, orig_t, dir_t,
                             act, chunk_bnd=None, frustum_rows=None,
                             masks=None, n_strips=0, interpret=False,
                             tile=TILE, so=False):
    strips = 0 if masks is None else n_strips
    cull = chunk_bnd is not None and not strips
    frustum = cull and frustum_rows is not None
    args = [nodes_i, nodes_f, tris128, orig_t, dir_t, act]
    if cull:
        args.append(chunk_bnd)
    if frustum:
        args.append(frustum_rows.reshape(-1))
    scratch = [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        pltpu.SMEM((STACK_DEPTH,), jnp.float32),
        pltpu.SMEM((STACK_DEPTH,), jnp.float32),
        pltpu.VMEM((2, CHUNK_ROWS, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if strips:
        mask, ten = masks
        args.append(mask)
        args.append(ten)
        scratch += [pltpu.SMEM(mask.shape[1:], jnp.int32),
                    pltpu.SMEM(ten.shape[1:], jnp.float32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA]
    return pl.pallas_call(
        functools.partial(_kernel_stream_smem, tile=tile, cull=cull,
                          so=so, frustum=frustum, strips=strips),
        **_smem_specs(orig_t.shape[1], tile, cull, frustum,
                      strips=bool(strips)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret", "tile",
                                             "qdepth", "so"))
def _packet_call_queue_smem(nodes_i, nodes_f, tris128, orig_t, dir_t,
                            act, chunk_bnd=None, interpret=False,
                            tile=TILE, qdepth=QUEUE_DEPTH, so=False):
    cull = chunk_bnd is not None
    args = [nodes_i, nodes_f, tris128, orig_t, dir_t, act]
    if cull:
        args.append(chunk_bnd)
    return pl.pallas_call(
        functools.partial(_kernel_queue_smem, tile=tile, qdepth=qdepth,
                          cull=cull, so=so),
        **_smem_specs(orig_t.shape[1], tile, cull),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.SMEM((qdepth,), jnp.int32),
            pltpu.SMEM((qdepth,), jnp.int32),
            pltpu.SMEM((qdepth,), jnp.float32),
            pltpu.SMEM((qdepth,), jnp.float32),
            pltpu.VMEM((qdepth, CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((qdepth,)),
        ],
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "layout",
                                             "qdepth", "so"))
def _packet_call_queue(nodes, tris128, orig_t, dir_t, act, chunk_bnd=None,
                       interpret=False, tile=TILE, layout="padded",
                       qdepth=QUEUE_DEPTH, so=False):
    specs = _streaming_specs(orig_t.shape[1], tile)
    specs["in_specs"].append(
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM))
    cull = chunk_bnd is not None
    args = [nodes, tris128, orig_t, dir_t, act]
    if cull:
        specs["in_specs"].append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(chunk_bnd)
    return pl.pallas_call(
        functools.partial(_kernel_queue, tile=tile, layout=layout,
                          qdepth=qdepth, cull=cull, so=so),
        **specs,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.SMEM((STACK_DEPTH,), jnp.float32),
            pltpu.SMEM((qdepth,), jnp.int32),      # ring: chunk row
            pltpu.SMEM((qdepth,), jnp.int32),      # ring: cull window id
            pltpu.SMEM((qdepth,), jnp.float32),    # ring: leaf t_lo
            pltpu.SMEM((qdepth,), jnp.float32),    # ring: leaf t_hi
            pltpu.VMEM((qdepth, CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((qdepth,)),
        ],
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _packet_call(table, tris16, orig_t, dir_t, interpret=False, tile=TILE):
    specs = _streaming_specs(orig_t.shape[1], tile)
    specs["in_specs"][1] = pl.BlockSpec(memory_space=pltpu.VMEM)  # tris
    return pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        **specs,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(table, tris16, orig_t, dir_t)


# ---------------------------------------------------------------------------
# host-side entry
# ---------------------------------------------------------------------------


def _blockify(x, h, w, th, tw):
    """Row-major [h*w, ...] → tile-major (each (th, tw) pixel block
    contiguous). Pure reshape/transpose — no gathers."""
    tail = x.shape[1:]
    x = x.reshape(h // th, th, w // tw, tw, *tail)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(h * w, *tail)


def _unblockify(x, h, w, th, tw):
    tail = x.shape[1:]
    x = x.reshape(h // th, w // tw, th, tw, *tail)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(h * w, *tail)


def _blockify_strips(x, h, w, th, tw, bh=8, bw=16):
    """Row-major [h*w, ...] → tile-major with each tile's lanes grouped
    into (bh, bw)-pixel STRIPS: tile (ti, tj) holds its (th//bh)x(tw//bw)
    grid of strips consecutively, each strip row-major. Every aligned
    bh*bw-lane group of a tile is then a compact 2D pixel block with its
    own tight direction cone — the granularity the mask prepass culls
    at: (8,16) = 128-lane strips for window-level masks, (16,32) =
    512-lane strips when the dense math is gated at that width. Pure
    reshape/transpose, like _blockify."""
    tail = x.shape[1:]
    gh, gw = th // bh, tw // bw
    x = x.reshape(h // th, gh, bh, w // tw, gw, bw, *tail)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5)
                      + tuple(range(6, 6 + len(tail))))
    return x.reshape(h * w, *tail)


def _unblockify_strips(x, h, w, th, tw, bh=8, bw=16):
    tail = x.shape[1:]
    gh, gw = th // bh, tw // bw
    x = x.reshape(h // th, w // tw, gh, gw, bh, bw, *tail)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)
                      + tuple(range(6, 6 + len(tail))))
    return x.reshape(h * w, *tail)


def _strip_masks(chunk_bnd, dir_bs, origin, n_strips, bh=8, bw=16):
    """XLA (VPU) prepass for the mask-culled stream kernel: per-tile
    window cull bitmasks [n_tiles, 8, Wc] i32 (window w's mask at
    [w % 8, w // 8], bit s = strip s must test window w) plus matching
    conservative entry distances [n_tiles, 8, Wc] f32 (min t_enter over
    keeping strips; +BIG when no strip keeps) for the kernel's dynamic
    occlusion test against its live t_upper.

    For every (strip, window) pair this runs the SAME conservative tests
    the kernel would do scalar-side — the _box_interval slab test over
    the strip's direction bounds and the exact 4-plane corner frustum
    (support-point, relative slack) — but as fused elementwise ops on
    [S, W] arrays: ~26M pairs cost well under a millisecond where the
    scalar-core equivalent measurably serialized with the walk. A window
    is kept on any uncertainty (zero-normal planes never cull, non-
    uniform direction signs disable the axis), so results are identical
    to the ungated kernel. Dead-lane masking is NOT handled: callers
    gate strips mode on a fully-active wavefront."""
    lanes = bh * bw
    cb = chunk_bnd.reshape(-1, 8)
    lo = [cb[:, j] for j in range(3)]            # [W] each
    hi = [cb[:, 3 + j] for j in range(3)]
    o = [jnp.float32(origin[j]) for j in range(3)]
    d = dir_bs.reshape(-1, lanes, 3)             # [S, lanes, 3]
    S = d.shape[0]
    keep = None
    t_en = jnp.full((S, 1), -INV_BIG, jnp.float32)
    t_ex = jnp.full((S, 1), INV_BIG, jnp.float32)
    for ax in range(3):
        inv = jnp.clip(1.0 / d[:, :, ax], -INV_BIG, INV_BIG)
        il = jnp.min(inv, axis=1, keepdims=True)  # [S, 1]
        ih = jnp.max(inv, axis=1, keepdims=True)
        uniform = il * ih > 0.0
        pos = il > 0.0
        nearb = jnp.where(pos, lo[ax][None, :], hi[ax][None, :])  # [S,W]
        farb = jnp.where(pos, hi[ax][None, :], lo[ax][None, :])
        c1, c2 = (nearb - o[ax]) * il, (nearb - o[ax]) * ih
        near_min = jnp.minimum(c1, c2)
        c1, c2 = (farb - o[ax]) * il, (farb - o[ax]) * ih
        far_max = jnp.maximum(c1, c2)
        t_en = jnp.maximum(t_en, jnp.where(uniform, near_min, -INV_BIG))
        t_ex = jnp.minimum(t_ex, jnp.where(uniform, far_max, INV_BIG))
    keep = (t_en <= t_ex) & (t_ex > 0.0)         # [S, W]

    fr = _frustum_rows(dir_bs, origin, lanes, bh, bw)  # [S, 16]
    for p in range(4):
        n = [fr[:, 3 * p + j:3 * p + j + 1] for j in range(3)]  # [S,1]
        sup = jnp.zeros_like(t_en)
        slack = jnp.zeros_like(t_en)
        for ax in range(3):
            c = jnp.where(n[ax] > 0.0, lo[ax][None, :],
                          hi[ax][None, :]) - o[ax]
            sup = sup + n[ax] * c
            slack = slack + jnp.abs(c)
        keep = keep & (sup <= 1e-5 * slack)

    nt_ = S // n_strips
    bits = keep.reshape(nt_, n_strips, -1).astype(jnp.int32)
    ten = jnp.where(keep, t_en, BIG).reshape(nt_, n_strips, -1)
    mask = jnp.zeros((nt_, bits.shape[2]), jnp.int32)
    for s in range(n_strips):
        mask = mask | (bits[:, s, :] << s)
    ten = jnp.min(ten, axis=1)                   # [nt, W] f32
    # pad W to a [8, Wc] row (Wc a lane multiple) for the per-tile DMA;
    # window w lands at [w % 8, w // 8]
    w_tot = mask.shape[1]
    w_pad = -w_tot % 1024
    if w_pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros((nt_, w_pad), jnp.int32)], axis=1)
        ten = jnp.concatenate(
            [ten, jnp.full((nt_, w_pad), BIG, jnp.float32)], axis=1)
    mask = mask.reshape(nt_, -1, 8).transpose(0, 2, 1)
    ten = ten.reshape(nt_, -1, 8).transpose(0, 2, 1)
    return mask, ten


def _pad_rows8(tris16, pad_value=-1.0):
    """Pad [T, 16] tri rows with sentinel rows (-1 for quad rows, whose
    tid < 0 marks them dead; 0 for shared-origin rows, whose all-zero
    volumes fail the strict D < 0 test) and fold into the [T/8, 128]
    DMA layout. Minimum CHUNK_ROWS*8 tri rows so even a tiny scene holds
    one full DMA chunk (the kernels clamp chunk starts, never lengths)."""
    t_rows = tris16.shape[0]
    target = max((t_rows + 7) // 8 * 8, CHUNK_ROWS * 8)
    if target != t_rows:
        tris16 = jnp.concatenate(
            [tris16,
             jnp.full((target - t_rows, 16), pad_value, tris16.dtype)],
            axis=0)
    return tris16.reshape(-1, 128)


def traverse_packet(tree, quads: jnp.ndarray, orig, dir,
                    interpret: bool = None, image_shape=None,
                    tile: int = TILE, engine: str = "auto", active=None,
                    precision: str = "f32", shared_origin: bool = False,
                    grid_dirs: bool = False):
    """Packet-trace a coherent wavefront. Same record contract as
    traverse_fast (minus per-ray step counts, which have no meaning for a
    shared-stack packet walk: steps = 0).

    image_shape: optional (height, width) of the row-major pixel wavefront;
    when divisible into sqrt(tile)-square blocks, rays are regrouped so
    each packet is a square screen tile instead of a scanline sliver —
    much tighter packet bounds, several-fold fewer node visits.

    engine: "auto" | "stream" | "legacy" (see packet_mode).
    precision: "f32" (exact, default) or "bf16" — PREVIEW mode: dense
    intersection arithmetic in bfloat16 (2x VPU issue rate for the
    dominant cost) at preview quality: bf16 cancellation in o-v0 costs
    real hits (~93% hit agreement measured on a small-triangle scene).
    Winners are still re-resolved in f32. Stream engine only.
    shared_origin: caller-asserted promise that EVERY ray origin is
    identical (primary pinhole rays). The stream/queue engines then
    stream so_rows (per-triangle signed-volume terms baked against that
    one origin — one elementwise pass over the quad array per call)
    instead of raw quads, cutting the dense per-pair test from ~52 to
    ~35 vector ops. Winner t/u/v are re-resolved from the winning slot
    in exact f32 either way, so images match the general path except at
    exact-t ties. Ignored by legacy/wide/stream2 engines and by the
    bf16 preview path.
    active: optional [N] bool — dead lanes are excluded from packet bounds
    and never report hits; a fully dead tile skips traversal (the kernel
    half of wavefront compaction; sort dead rays to the tail first).
    Only the stream engine honors it.
    grid_dirs: caller-asserted promise that the directions are the
    UNJITTERED pixel-grid rays of image_shape (generate_rays — one ray
    through each pixel center, row-major). The corner-ray frustum hull
    culls (CLPT_FRUSTUM and the strip-mask prepass) are only valid under
    this promise: per-pixel-jittered samples (spp>1 path mode) can fall
    outside the hull of the tile's 4 corner SAMPLES and would be wrongly
    culled (ADVICE r2). shared_origin alone no longer enables them.
    """
    n = orig.shape[0]
    assert n % tile == 0, (n, tile)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    # tile → screen-block shape: square when possible, else a 1:2
    # power-of-two rectangle (tile=512 → 16x32 pixel blocks)
    th = tw = int(math.isqrt(tile))
    if th * tw != tile:
        th = int(math.isqrt(tile // 2))
        tw = 2 * th
    blocked = (image_shape is not None and th * tw == tile
               and image_shape[0] % th == 0 and image_shape[1] % tw == 0)
    if blocked:
        h, w = image_shape
        orig_b = _blockify(orig, h, w, th, tw)
        dir_b = _blockify(dir, h, w, th, tw)
    else:
        orig_b, dir_b = orig, dir
    strip_layout = None  # (bh, bw) set by the mask-culled stream path

    tris16 = quads.reshape(-1, 16)
    mode = packet_mode(tree, n, tile, engine=engine)
    assert mode is not None, "scene/ray shape unsupported by packet tracer"
    if mode == "stream2":
        if active is None:
            act = jnp.ones((n,), jnp.float32)
        else:
            act = active.astype(jnp.float32)
            if blocked:
                act = _blockify(act, h, w, th, tw)
        out_t, out_s, tile_stats = _packet_call_stream2(
            _stream_nodes(tree), _pad_rows8(tris16),
            orig_b.T.astype(jnp.float32), dir_b.T.astype(jnp.float32),
            act[None, :], interpret=interpret, tile=tile,
            layout=_stream_layout(tree.node_table.shape[0]))
    if mode in ("vmem", "tri_stream"):
        # ropeless node rows packed 8-per-128-lane-row: cols 0-11 are all
        # the packet walk reads; narrow VMEM arrays lane-pad to 128 anyway
        t16 = tree.node_table[:, :16]
        m = t16.shape[0]
        pad_m = (-m) % 8
        if pad_m:
            t16 = jnp.concatenate(
                [t16, jnp.zeros((pad_m, 16), t16.dtype)], axis=0)
        table16 = t16.reshape(-1, 128)
    if mode in ("stream", "mxu", "queue"):
        if active is None:
            act = jnp.ones((n,), jnp.float32)
        else:
            act = active.astype(jnp.float32)
            if blocked:
                act = _blockify(act, h, w, th, tw)
        if mode == "mxu":
            from clpathtracer_tpu.ops.packet_mxu import (
                mxu_rows_from_quads, packet_call_mxu)
            out_t, out_s, tile_stats = packet_call_mxu(
                _stream_nodes(tree), mxu_rows_from_quads(quads),
                orig_b.astype(jnp.float32), dir_b.astype(jnp.float32),
                act[:, None], interpret=interpret, tile=tile,
                layout=_stream_layout(tree.node_table.shape[0]))
            out_t = out_t.reshape(1, n)
            out_s = out_s.reshape(1, n)
        else:
            # chunk culling: skip whole leaf-DMA windows whose AABB the
            # packet interval can't hit (tree carries the tables when
            # built with tri_block=4; CLPT_CHUNK_CULL=0 disables)
            cbnd = getattr(tree, "chunk_bnd", None)
            m_nodes = tree.node_table.shape[0]
            if (cbnd is not None
                    and getattr(tree, "chunk_rows", None) is not None
                    and tree.chunk_rows != CHUNK_ROWS):
                # tables built under a different CLPT_CHUNK_ROWS: their
                # window grid disagrees with this process's kernels —
                # using them would cull the WRONG windows (ADVICE r2)
                cbnd = None
            if (cbnd is not None
                    and _os.environ.get("CLPT_CHUNK_CULL", "1") != "1"):
                cbnd = None
            if (cbnd is not None and
                    (1 + (m_nodes + 15) // 16 + cbnd.shape[0]) * 512
                    > VMEM_BUDGET):
                cbnd = None
            # node/cull tables go to SMEM when they fit (scalar reads are
            # ~3x cheaper there — see _smem_nodes); CLPT_SMEM=0 forces
            # the VMEM layouts (also the bf16-preview path, which the
            # SMEM kernels don't implement)
            use_smem = (_smem_fits(tree) and precision == "f32"
                        and _os.environ.get("CLPT_SMEM", "1") != "0")
            so = (shared_origin and precision == "f32"
                  and _os.environ.get("CLPT_SO", "1") != "0")
            if so:
                sob = getattr(tree, "so_base", None)
                if sob is not None:
                    # affine tables (so_affine_tables): one fused
                    # elementwise combine per frame instead of the full
                    # per-frame so_rows pass (30.7 ms at 1M tris)
                    o = orig[0]
                    rows128 = (sob[0] + o[0] * sob[1] + o[1] * sob[2]
                               + o[2] * sob[3])
                else:
                    rows128 = _pad_rows8(so_rows(tris16, orig[0]),
                                         pad_value=0.0)
            else:
                rows128 = _pad_rows8(tris16)
            if use_smem:
                nodes_i, nodes_f = _smem_nodes(tree)
                cb_s = _smem_cbnd(tree) if cbnd is not None else None
                if mode == "queue":
                    out_t, out_s, tile_stats = _packet_call_queue_smem(
                        nodes_i, nodes_f, rows128,
                        orig_b.T.astype(jnp.float32),
                        dir_b.T.astype(jnp.float32),
                        act[None, :], chunk_bnd=cb_s,
                        interpret=interpret, tile=tile, so=so)
                else:
                    # strip-gated mode (see _kernel_stream_smem): fully
                    # active shared-origin pixel-block frames re-group
                    # each tile into (8,16)-px strips, an XLA prepass
                    # bitmasks every (strip, window) pair, and the
                    # kernel's dense MT runs per surviving strip only
                    # mask + t_en SMEM rows must fit next to the node
                    # tables (huge scenes: W windows -> 2 * 4 * W8 bytes)
                    _w8 = -(-tree.chunk_bnd.reshape(-1, 8).shape[0]
                            // 1024) * 1024
                    strips_ok = (
                        so and blocked and grid_dirs and active is None
                        and cbnd is not None and th % 8 == 0
                        and tw % 16 == 0 and tile % 128 == 0
                        and 8 * _w8 <= SMEM_BUDGET // 2
                        and _os.environ.get("CLPT_STRIPS", "1") != "0")
                    if strips_ok:
                        # gate-width strips when the dense math will be
                        # gated at 512 lanes (tile >= 1024): 4x cheaper
                        # prepass, identical gate-level culling
                        if (tile >= 1024 and th % 16 == 0
                                and tw % 32 == 0 and _os.environ.get(
                                    "CLPT_HALFGATE", "1") != "0"):
                            bh, bw = 16, 32
                        else:
                            bh, bw = 8, 16
                        n_strips = tile // (bh * bw)
                        orig_b = _blockify_strips(orig, h, w, th, tw,
                                                  bh, bw)
                        dir_b = _blockify_strips(dir, h, w, th, tw,
                                                 bh, bw)
                        strip_layout = (bh, bw)
                        masks = _strip_masks(
                            tree.chunk_bnd,
                            dir_b.astype(jnp.float32), orig[0],
                            n_strips, bh, bw)
                        out_t, out_s, tile_stats = \
                            _packet_call_stream_smem(
                                nodes_i, nodes_f, rows128,
                                orig_b.T.astype(jnp.float32),
                                dir_b.T.astype(jnp.float32),
                                act[None, :], masks=masks,
                                n_strips=n_strips,
                                interpret=interpret, tile=tile, so=so)
                    else:
                        # exact per-tile pinhole frustum planes tighten
                        # the window cull for shared-origin pixel-block
                        # tiles
                        fr = None
                        if (so and blocked and grid_dirs
                                and cb_s is not None
                                and _os.environ.get("CLPT_FRUSTUM", "1")
                                != "0"):
                            fr = _frustum_rows(
                                dir_b.astype(jnp.float32),
                                orig[0], tile, th, tw)
                        out_t, out_s, tile_stats = \
                            _packet_call_stream_smem(
                                nodes_i, nodes_f, rows128,
                                orig_b.T.astype(jnp.float32),
                                dir_b.T.astype(jnp.float32),
                                act[None, :], chunk_bnd=cb_s,
                                frustum_rows=fr, interpret=interpret,
                                tile=tile, so=so)
            elif mode == "queue":
                out_t, out_s, tile_stats = _packet_call_queue(
                    _stream_nodes(tree), rows128,
                    orig_b.T.astype(jnp.float32),
                    dir_b.T.astype(jnp.float32),
                    act[None, :], chunk_bnd=cbnd, interpret=interpret,
                    tile=tile,
                    layout=_stream_layout(tree.node_table.shape[0]),
                    so=so)
            else:
                out_t, out_s, tile_stats = _packet_call_stream(
                    _stream_nodes(tree), rows128,
                    orig_b.T.astype(jnp.float32),
                    dir_b.T.astype(jnp.float32),
                    act[None, :], chunk_bnd=cbnd, interpret=interpret,
                    tile=tile,
                    layout=_stream_layout(tree.node_table.shape[0]),
                    precision=precision, so=so)
    elif mode == "wide":
        out_t, out_s, tile_stats = _packet_call_wide(
            tree.wide_table, _pad_rows8(tris16),
            orig_b.T.astype(jnp.float32), dir_b.T.astype(jnp.float32),
            interpret=interpret, tile=tile)
    elif mode == "tri_stream":
        out_t, out_s, tile_stats = _packet_call_tri_stream(
            table16, _pad_rows8(tris16),
            orig_b.T.astype(jnp.float32), dir_b.T.astype(jnp.float32),
            interpret=interpret, tile=tile)
    elif mode == "vmem":
        out_t, out_s, tile_stats = _packet_call(table16, tris16,
                                    orig_b.T.astype(jnp.float32),
                                    dir_b.T.astype(jnp.float32),
                                    interpret=interpret, tile=tile)
    best_t = out_t[0]
    best_slot = out_s[0].astype(jnp.int32)
    if strip_layout is not None:
        best_t = _unblockify_strips(best_t, h, w, th, tw, *strip_layout)
        best_slot = _unblockify_strips(best_slot, h, w, th, tw,
                                       *strip_layout)
    elif blocked:
        best_t = _unblockify(best_t, h, w, th, tw)
        best_slot = _unblockify(best_slot, h, w, th, tw)
    hit = best_slot >= 0
    slot_safe = jnp.clip(best_slot, 0, tris16.shape[0] - 1)

    # re-resolve u/v/tri at the winner (same pattern as traverse_fast)
    qsel = quads[slot_safe // 4].reshape(-1, 4, 16)
    lane = slot_safe % 4
    sel = qsel[:, 0, :]
    for j in range(1, 4):
        sel = jnp.where((lane == j)[:, None], qsel[:, j, :], sel)
    v0s, e1s, e2s = sel[:, 0:3], sel[:, 3:6], sel[:, 6:9]
    from clpathtracer_tpu.ops.traverse_fast import _mt_pre
    ok, t, u, v = _mt_pre(v0s, e1s, e2s, orig, dir)
    tri = jnp.where(hit, sel[:, 9].astype(jnp.int32), -1)
    return {
        "hit": hit,
        "t": jnp.where(hit, t, BIG),
        "tri": tri,
        "u": jnp.where(hit, u, 0.0),
        "v": jnp.where(hit, v, 0.0),
        "steps": jnp.zeros((n,), jnp.int32),
        # per-tile diagnostics: [:, 0] node visits, [:, 1] leaf visits
        # (vmem) / tri chunks DMA'd (streaming engines), [:, 2] active lanes
        # (stream engine; legacy kernels write 0), [:, 3] leaf-DMA windows
        # skipped by chunk culling (stream engine w/ chunk tables), [:, 4]
        # strip-MT executions (stream SMEM engine: == [:, 1] when
        # ungated, 128 rays x CHUNK_ROWS*8 tris each when strip-gated;
        # other kernels write 0); kernel emits 8 replicated sublane rows
        # per tile
        "tile_stats": tile_stats[::8, :5],
    }
