"""Prepass-list packet engine: walk-free sorted-window streaming.

Round-3 redesign of the primary-ray intersector, driven by three probe
measurements (probes/probe_filter_potential.py, probe_sorted_stream.py,
probe_morton_windows.py):

1. The stream kernels' ~4.7-12k triangle tests/ray are NOT geometric
   overlap waste — ~70% of the geometrically surviving (packet, window)
   pairs contain real line intersections (a triangle-level prefilter has
   a ~30% ceiling). The dense 512-ray x 128-tri outer product is close
   to its structural floor for a given window layout.
2. The kd-leaf DMA windows inherit straddler DUPLICATION (1.12x terrain,
   1.66x soup) and leaf-boundary raggedness. Windows cut from a single
   GLOBAL Morton order of the triangles (every triangle in exactly one
   window) remove it: measured geometric pairs drop 1%/41% (terrain/
   soup) at 128-tri windows and 30%/56% at 64-tri windows.
3. The prepass already tests EVERY window against every packet — which
   makes the in-kernel tree walk redundant. Sorting each packet's
   surviving windows front-to-back by conservative entry distance lets
   the kernel be a pure streaming consumer with an early-termination
   BREAK (sorted t_en > packet t_upper ends the packet), the DMA
   sequence known in advance (no scalar culls between vector work, the
   round-2 serialization cost), and per-packet lists that scale to any
   scene size (the >7M-tri SMEM mask-row cliff disappears: list
   consumption is chunked DMA, not a resident table).

Pipeline:

  * build (host): global Morton order of triangle centroids; quad rows
    packed in that order; per-window AABBs. No kd-tree involved — the
    tree remains the engine for incoherent wavefronts (bounces,
    shadows) only.
  * prepass (XLA, on-device): for every 512-ray packet (16x32-pixel
    block, shared origin) x every window: slab interval + exact
    corner-frustum cull and conservative entry distance; per-packet
    argsort by t_en (+inf for culled windows). Fused elementwise math
    on [G, W] arrays — the VPU does in microseconds what the scalar
    core serialized (round-2 finding).
  * kernel (Pallas): each grid program owns one packet; streams its
    sorted list in chunks of 1024 entries (SMEM), double-buffers the
    window triangle DMAs (the NEXT window is known without any walk),
    runs the full-width 512-lane dense test (shared-origin signed
    volume or general MT, ops/packet.py's _mt_math), refreshes the
    packet's t_upper from live best hits, and exits as soon as the next
    entry distance exceeds it. Every started DMA is waited exactly once
    (the prefetch decision is made once per window, and a fetched
    window is always consumed).

Reference behavior matched: the per-ray early-exit economy of the
reference's rope walk (/root/reference/src/kernel.cl:381-383) — without
per-ray control flow, which TPUs cannot afford.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clpathtracer_tpu.ops.packet import (
    BIG, INV_BIG, _frustum_rows, _mt_chunk_math, _mt_chunk_math_so,
    _mt_math, _pad_rows8, _ray_rows, so_rows)

GATE = 512                    # rays per packet: GH x GW pixel block
# gate aspect (pixels): the footprint's window count scales with
# (frustum extent + window size)^2, so aspect is a per-scene tunable
# like win_rows (sweep via probe_plist.py with CLPT_GATE_H)
GH = int(_os.environ.get("CLPT_GATE_H", "16"))
GW = GATE // GH
assert GATE % GH == 0, GH
LIST_CHUNK = 1024             # sorted-list entries per [8, 128] DMA chunk
# windows per DMA in quad-row units: win_rows*8 triangles each. 16 rows
# (128 tris) matches the stream engine's measured DMA sweet spot; 8 is
# the probe-favored smaller window (fewer tests, more fixed costs).
WIN_ROWS = int(_os.environ.get("CLPT_WIN_ROWS", "16"))
TUP_EVERY = max(int(_os.environ.get("CLPT_PLIST_TUP", "1")), 1)
# windows per super-entry of the two-level (super) list variant: the
# sort and the kernel's DMA/t_upper granularity move to supers of
# SUPER consecutive Morton windows while per-window need bits keep the
# dense-math granularity at single windows
SUPER = 16


@struct.dataclass
class MortonWindows:
    """Global-Morton window structure for the plist engine.

    tris128: [R, 128] quad rows ([T/4, 64] pairs folded) in Morton
      order, padded so R is a multiple of win_rows (pad tri_id = -1).
    win_bnd: [W, 8] f32 per-window AABB (lo xyz, hi xyz, pad 2); pad
      windows carry an empty box (+big/-big) that nothing keeps.
    so_base: optional [4, R, 128] affine shared-origin tables
      (ops/packet.py::so_affine_tables) for one-combine SO rows.
    """

    tris128: jnp.ndarray
    win_bnd: jnp.ndarray
    so_base: jnp.ndarray = None
    resolve_rows: jnp.ndarray = None  # fused resolve+shade rows (packed)
    slot_of_tri: jnp.ndarray = None   # [T] i32 tri id -> record slot
    win_rows: int = struct.field(pytree_node=False, default=16)

    @property
    def num_windows(self) -> int:
        return self.win_bnd.shape[0]

    @property
    def quads(self) -> jnp.ndarray:
        return self.tris128.reshape(-1, 64)


def median_order(tri_verts: np.ndarray, span: int) -> np.ndarray:
    """Equal-count recursive median split of triangle centroids: split
    the widest-extent axis at the multiple-of-`span` index nearest the
    median, recurse, emit depth-first left-to-right.

    Every split lands on a multiple of `span`, so every window except
    possibly the global tail holds `span` triangles from one convex
    cell — the same zero-padding fixed-size windows as a Morton cut,
    but the cut can never straddle a space-filling-curve jump. Measured
    geometric surviving (gate, window) pairs vs the Morton cut
    (probes/probe_partition.py, 512², bench cameras): terrain 1M
    0.61x / supers 0.43x, soup 1M 0.66x / 0.75x. Depth-first emission
    also nests consecutive windows (tight SUPER hulls). O(N log N)
    via argpartition per level."""
    c = tri_verts.mean(axis=1).astype(np.float32)
    n = c.shape[0]
    out = np.empty(n, np.int64)
    pos = 0
    stack = [np.arange(n, dtype=np.int64)]
    while stack:
        seg = stack.pop()
        m = seg.shape[0]
        if m <= span:
            out[pos:pos + m] = seg
            pos += m
            continue
        cc = c[seg]
        ax = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
        nwin = (m + span - 1) // span
        half = int(np.clip(round(m / 2 / span), 1, nwin - 1)) * span
        part = np.argpartition(cc[:, ax], half)
        stack.append(seg[part[half:]])   # right half (emitted second)
        stack.append(seg[part[:half]])
    assert pos == n
    return out


def build_morton_windows(tri_verts: np.ndarray,
                         win_rows: int = None,
                         order: str = None) -> MortonWindows:
    """Host-side build: order triangles (equal-count median split by
    default; order="morton" for the round-3 global z-curve cut), pack
    quad rows, window AABBs. O(T log T) numpy; no kd-tree, no
    duplication. CLPT_WIN_ORDER overrides `order` for A/B probes."""
    from clpathtracer_tpu.accel.sah import _morton10, pack_quads_host
    if win_rows is None:
        win_rows = WIN_ROWS
    if order is None:
        order = _os.environ.get("CLPT_WIN_ORDER", "median")
    tv = np.asarray(tri_verts, np.float32)
    if order == "median":
        perm = median_order(tv, win_rows * 8)
    else:
        c = tv.mean(axis=1)
        lo, hi = c.min(axis=0), c.max(axis=0)
        q = np.clip((c - lo) / np.maximum(hi - lo, 1e-30) * 1023.0,
                    0.0, 1023.0).astype(np.uint32)
        perm = np.argsort(_morton10(q), kind="stable").astype(np.int64)
    t = tv[perm]
    n = t.shape[0]
    span = win_rows * 8
    # pad the window count to SUPER granularity (empty pad windows) so
    # the super-list kernel can DMA whole supers of SUPER windows
    pad = -n % (span * SUPER)
    ids = np.concatenate([perm, np.full(pad, -1, np.int64)])
    rows16 = pack_quads_host(ids, tv).reshape(-1, 16)
    vmin = t.min(axis=1)
    vmax = t.max(axis=1)
    if pad:
        vmin = np.concatenate([vmin, np.full((pad, 3), 1e30, np.float32)])
        vmax = np.concatenate([vmax, np.full((pad, 3), -1e30, np.float32)])
    w = vmin.shape[0] // span
    bnd = np.zeros((w, 8), np.float32)
    bnd[:, 0:3] = vmin.reshape(w, span, 3).min(axis=1)
    bnd[:, 3:6] = vmax.reshape(w, span, 3).max(axis=1)
    assert rows16.shape[0] < (1 << 24), "tri slots overflow f32-exact ids"
    # tri id -> record slot (inverse of the Morton perm): lets a per-ray
    # engine's winners (original tri ids, e.g. the grid DDA straggler
    # phase) merge into the slot-indexed resolve path
    sot = np.full((n,), -1, np.int32)
    sids = rows16[:, 9].astype(np.int64)
    valid = sids >= 0
    sot[sids[valid]] = np.nonzero(valid)[0].astype(np.int32)
    return MortonWindows(tris128=jnp.asarray(rows16.reshape(-1, 128)),
                         win_bnd=jnp.asarray(bnd),
                         slot_of_tri=jnp.asarray(sot), win_rows=win_rows)


def attach_so(mwin: MortonWindows) -> MortonWindows:
    """Attach affine shared-origin tables (device-side, jitted)."""
    from clpathtracer_tpu.ops.packet import so_affine_tables
    return mwin.replace(
        so_base=jax.jit(so_affine_tables)(mwin.quads))


def build_resolve_rows(tris128, shade_rows):
    """Fused resolve+shade rows: [ceil(S/4), 128] f32 where S is the
    16-lane record count of tris128 (= the kernels' winner-slot space);
    slot s lives in the 32-lane segment (s % 4) of row s // 4. Segment
    lanes 0:10 mirror the geometry record (v0, e1, e2, tri_id); lanes
    10:25 are the triangle's baked shade row (n0, n1, n2, albedo,
    emission — scene.bake_shading's layout, render/shading.py).

    Why: winner resolution (quads[slot]) and shading (shade_rows[tri])
    were TWO ~262k-lane latency-bound gathers per wave. A row gather
    costs the same at 64 and 128 lanes but MORE below that (narrow rows
    lane-pad in the tiled layout — probes/probe_gather_tpu.py; a first
    cut of this table at 32-lane rows measured 7 ms SLOWER than the two
    gathers it replaced, probes/probe_fused_ab.py), so the table packs
    FOUR slots per 128-lane row and the reader picks the segment with a
    static 4-way select — one optimally-wide gather carrying both
    records. Pad-slot shade lanes are zeroed (tri_id < 0)."""
    rec = tris128.reshape(-1, 16)
    tid = rec[:, 9].astype(jnp.int32)
    safe = jnp.clip(tid, 0, shade_rows.shape[0] - 1)
    sh = jnp.where((tid >= 0)[:, None], shade_rows[safe][:, :15], 0.0)
    pad = jnp.zeros((rec.shape[0], 7), rec.dtype)
    r32 = jnp.concatenate([rec[:, :10], sh, pad], axis=1)
    spad = -r32.shape[0] % 4
    if spad:
        r32 = jnp.concatenate(
            [r32, jnp.zeros((spad, 32), r32.dtype)], axis=0)
    return r32.reshape(-1, 128)


def attach_resolve(mwin: MortonWindows, shade_rows) -> MortonWindows:
    """Attach fused resolve rows (device-side, jitted). shade_rows:
    the scene's baked [T, 16] shade table (Scene.bake_shading)."""
    if shade_rows is None:
        return mwin
    return mwin.replace(resolve_rows=jax.jit(build_resolve_rows)(
        mwin.tris128, shade_rows))


# ---------------------------------------------------------------------------
# prepass: per-packet sorted window lists
# ---------------------------------------------------------------------------


def _win_keys(win_bnd, d, o, bh, bw, dilate_px: float = 0.0):
    """Per-(packet, window) sorted-stream keys: conservative entry
    distance where the packet must test the window, +inf where it is
    culled. d: [N, L, 3] directions of N packets of L rays each (an
    bh x bw pixel block); the cull math is the slab-interval + exact
    corner-frustum pair from ops/packet.py::_strip_masks, conservative
    (a window is kept on any uncertainty), so a kernel consuming the
    non-inf entries equals an unculled dense sweep. Returns [N, W].

    dilate_px > 0: the directions carry per-pixel subpixel JITTER of up
    to that many pixels around the pixel-grid hull (spp > 1 sampling).
    A pinhole frustum plane through the origin meets the image plane in
    a LINE, so "every jittered sample stays inside the plane" reduces
    to 2-D: jittered sample positions lie within the corner-lane
    position hull dilated by dilate_px pixels. The plane test relaxes
    by sin(dilate_px x per-gate pixel angle), with the pixel angle
    measured from this gate's own corner directions — no camera
    plumbing. Slab intervals already use the actual (jittered) lane
    directions and need no dilation. Soundness: a window is culled only
    when its most-inside AABB corner x* has n.(x*-o) > margin * slack
    >= sin(delta) * |x*-o|, i.e. the whole box sits more than the
    dilation angle outside the plane."""
    n_pk, n_lanes, _ = d.shape
    o = jnp.asarray(o, jnp.float32).reshape(3)
    lo = [win_bnd[:, j] for j in range(3)]
    hi = [win_bnd[:, 3 + j] for j in range(3)]

    t_en = jnp.full((n_pk, 1), -INV_BIG, jnp.float32)
    t_ex = jnp.full((n_pk, 1), INV_BIG, jnp.float32)
    for ax in range(3):
        inv = jnp.clip(1.0 / d[:, :, ax], -INV_BIG, INV_BIG)
        il = jnp.min(inv, axis=1, keepdims=True)
        ih = jnp.max(inv, axis=1, keepdims=True)
        uniform = il * ih > 0.0
        pos = il > 0.0
        nearb = jnp.where(pos, lo[ax][None, :], hi[ax][None, :])
        farb = jnp.where(pos, hi[ax][None, :], lo[ax][None, :])
        near_min = jnp.minimum((nearb - o[ax]) * il, (nearb - o[ax]) * ih)
        far_max = jnp.maximum((farb - o[ax]) * il, (farb - o[ax]) * ih)
        t_en = jnp.maximum(t_en, jnp.where(uniform, near_min, -INV_BIG))
        t_ex = jnp.minimum(t_ex, jnp.where(uniform, far_max, INV_BIG))
    keep = (t_en <= t_ex) & (t_ex > 0.0)

    margin = jnp.float32(1e-5)
    if dilate_px:
        def sin_between(a, b):  # dirs are normalized (|cross| = sin)
            cr = jnp.cross(a, b)
            return jnp.sqrt(jnp.sum(cr * cr, axis=-1))
        c0, c1, c2 = d[:, 0], d[:, bw - 1], d[:, (bh - 1) * bw]
        px_ang = jnp.maximum(sin_between(c0, c1) / max(bw - 1, 1),
                             sin_between(c0, c2) / max(bh - 1, 1))
        margin = margin + float(dilate_px) * px_ang[:, None]  # [N, 1]

    fr = _frustum_rows(d.reshape(-1, 3), o, n_lanes, bh, bw)  # [N, 16]
    for p in range(4):
        n = [fr[:, 3 * p + j:3 * p + j + 1] for j in range(3)]
        sup = jnp.zeros_like(t_en)
        slack = jnp.zeros_like(t_en)
        for ax in range(3):
            cc = jnp.where(n[ax] > 0.0, lo[ax][None, :],
                           hi[ax][None, :]) - o[ax]
            sup = sup + n[ax] * cc
            slack = slack + jnp.abs(cc)
        keep = keep & (sup <= margin * slack)

    return jnp.where(keep, jnp.maximum(t_en, 0.0), jnp.float32(jnp.inf))


def _bundle_keys(win_bnd, orig_b, dir_b):
    """Conservative per-(bundle, window) keys for ARBITRARY ray bundles
    (no shared origin, no pixel-grid frustum): interval-arithmetic slab
    test with per-axis origin ranges [olo, ohi] x inverse-direction
    ranges [il, ih]. Sound by interval bounds: the bundle entry key
    lower-bounds every lane's entry distance and the exit upper-bounds
    every lane's exit, so a culled window (en > ex or ex <= 0) provably
    misses every lane. Mixed-sign direction axes contribute nothing
    (conservative). orig_b/dir_b: [B, L, 3]. Returns [B, W] (+inf =
    culled); culling quality IS the bundle coherence — callers sort."""
    lo = [win_bnd[:, j] for j in range(3)]
    hi = [win_bnd[:, 3 + j] for j in range(3)]
    B = orig_b.shape[0]
    t_en = jnp.full((B, 1), -INV_BIG, jnp.float32)
    t_ex = jnp.full((B, 1), INV_BIG, jnp.float32)
    for ax in range(3):
        inv = jnp.clip(1.0 / dir_b[:, :, ax], -INV_BIG, INV_BIG)
        il = jnp.min(inv, axis=1, keepdims=True)
        ih = jnp.max(inv, axis=1, keepdims=True)
        olo = jnp.min(orig_b[:, :, ax], axis=1, keepdims=True)
        ohi = jnp.max(orig_b[:, :, ax], axis=1, keepdims=True)
        uniform = il * ih > 0.0
        pos = il > 0.0
        nearb = jnp.where(pos, lo[ax][None, :], hi[ax][None, :])
        farb = jnp.where(pos, hi[ax][None, :], lo[ax][None, :])
        na, nb = nearb - ohi, nearb - olo
        fa, fb = farb - ohi, farb - olo
        near_lo = jnp.minimum(jnp.minimum(na * il, na * ih),
                              jnp.minimum(nb * il, nb * ih))
        far_hi = jnp.maximum(jnp.maximum(fa * il, fa * ih),
                             jnp.maximum(fb * il, fb * ih))
        t_en = jnp.maximum(t_en, jnp.where(uniform, near_lo, -INV_BIG))
        t_ex = jnp.minimum(t_ex, jnp.where(uniform, far_hi, INV_BIG))
    keep = (t_en <= t_ex) & (t_ex > 0.0)
    return jnp.where(keep, jnp.maximum(t_en, 0.0), jnp.float32(jnp.inf))


def gate_lists(win_bnd, dir_g, origin, win_rows: int,
               dilate_px: float = 0.0, gh: int = None):
    """For every packet (gate), the windows it must test, sorted
    front-to-back. Returns (row0 [G, C, 8, 128] f32, ten [G, C, 8, 128]
    f32): entry j of gate g lives at [g, j // 1024, j % 8, (j % 1024)
    // 8]; culled/pad entries carry t_en = +inf (the tail the kernel's
    sorted BREAK never reaches). row0 is the window's first [*, 128]
    triangle row as an exact f32 integer."""
    gh = GH if gh is None else gh
    G = dir_g.shape[0] // GATE
    d = dir_g.reshape(G, GATE, 3).astype(jnp.float32)
    key = _win_keys(win_bnd, d, origin, gh, GATE // gh,
                    dilate_px=dilate_px)                    # [G, W]
    inf = jnp.float32(jnp.inf)
    w = key.shape[1]
    wpad = -w % LIST_CHUNK
    if wpad:
        key = jnp.concatenate(
            [key, jnp.full((G, wpad), jnp.inf, jnp.float32)], axis=1)
    # ONE key+payload sort: argsort + take_along_axis costs 46 ms/frame
    # on this chip (4.2M per-lane gathers — the known TPU poison) where
    # the fused variadic sort costs 2.3 ms (probes/probe_plist_prepass)
    payload = jnp.broadcast_to(
        jnp.arange(key.shape[1], dtype=jnp.float32)[None] * float(win_rows),
        key.shape)
    ten, row0 = jax.lax.sort((key, payload), dimension=1, num_keys=1)

    def pack(x):  # [G, Wpad] -> [G, C, 8, 128], entry e at [e%8, e//8]
        return x.reshape(G, -1, 128, 8).transpose(0, 1, 3, 2)

    return pack(row0), pack(ten)


_gate_lists = jax.jit(gate_lists,
                      static_argnames=("win_rows", "dilate_px", "gh"))


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel_plist(row0_ref, ten_ref, tris_ref, o_ref, d_ref, t_ref,
                  slot_ref, stats_ref, ids_smem, ten_smem, list_sem,
                  tri_buf, tri_sem, *, so, win_rows, nchunks,
                  d0cull=False, tup_every=None):
    tup_every = TUP_EVERY if tup_every is None else tup_every
    g = pl.program_id(0)
    rays = _ray_rows(o_ref, d_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    n_rows = tris_ref.shape[0]

    def load_chunk(c):
        # sequential (start, wait) pairs on one semaphore: the list
        # chunk swap happens once per 1024 windows — latency immaterial
        ca = pltpu.make_async_copy(row0_ref.at[g, c], ids_smem, list_sem)
        ca.start()
        ca.wait()
        cb = pltpu.make_async_copy(ten_ref.at[g, c], ten_smem, list_sem)
        cb.start()
        cb.wait()

    def ent(j):
        e = j % LIST_CHUNK
        return (ids_smem[e % 8, e // 8].astype(jnp.int32),
                ten_smem[e % 8, e // 8])

    def start_tri(row0, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row0, win_rows), :],
            tri_buf.at[par], tri_sem.at[par]).start()

    def wait_tri(row0, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row0, win_rows), :],
            tri_buf.at[par], tri_sem.at[par]).wait()

    load_chunk(0)
    row0_0, ten0 = ent(0)
    tup0 = jnp.float32(BIG)
    alive0 = ten0 <= tup0

    @pl.when(alive0)
    def _():
        start_tri(row0_0, 0)

    # argmin accumulators carried ACROSS windows (merged once at the
    # end): removes the ~6-op per-window reduction from the hot loop
    # (VERDICT r2 #8 — the "per-leaf accumulator merge" lever, sound
    # here because plist row ids are globally unique)
    t_acc0 = jnp.full((win_rows, GATE), BIG, jnp.float32)
    s_acc0 = jnp.full((win_rows, GATE), -1.0, jnp.float32)
    mt = (functools.partial(_mt_chunk_math_so, d0cull=d0cull) if so
          else _mt_chunk_math)
    w_total = nchunks * LIST_CHUNK

    def body(state):
        j, par, chunk, row0_j, alive, tup, ta, sa, ns = state
        # prefetch decision for j+1 (made ONCE; a fetched window is
        # always consumed, so no DMA is ever orphaned)
        j1 = j + 1

        @pl.when((j1 % LIST_CHUNK == 0) & (j1 < w_total))
        def _():
            load_chunk(j1 // LIST_CHUNK)

        row0_1, ten1 = ent(j1)  # j1 == w_total reads entry 0 of the
        # resident chunk: stale values, but nxt below is then False and
        # the loop exits without touching them
        nxt = (j1 < w_total) & (ten1 <= tup)

        @pl.when(nxt)
        def _():
            start_tri(row0_1, 1 - par)

        # consume window j
        wait_tri(row0_j, par)
        ta, sa = mt(tri_buf, par, rays, GATE, row0_j, None, None,
                    act_row=None, merge=False, acc=(ta, sa))
        ns = ns + 1
        tup = jax.lax.cond(
            ns % tup_every == 0,
            lambda: jnp.max(jnp.min(ta, axis=0)), lambda: tup)
        return j1, 1 - par, j1 // LIST_CHUNK, row0_1, nxt, tup, ta, sa, ns

    st = (jnp.int32(0), jnp.int32(0), jnp.int32(0), row0_0, alive0,
          tup0, t_acc0, s_acc0, jnp.int32(0))
    _, _, _, _, _, _, t_acc, s_acc, ns = jax.lax.while_loop(
        lambda s: s[4], body, st)

    best_t = jnp.min(t_acc, axis=0, keepdims=True)
    cand = jnp.where(t_acc == best_t, s_acc, BIG)
    best_s = jnp.min(cand, axis=0, keepdims=True)
    t_ref[:] = best_t
    slot_ref[:] = jnp.where(best_t < BIG, best_s, -1.0)
    stats_ref[:] = jnp.where(
        lane == 0, 0.0,
        jnp.where(lane == 1, ns.astype(jnp.float32),
                  jnp.where(lane == 2, jnp.float32(GATE),
                            jnp.where(lane == 4, ns.astype(jnp.float32),
                                      0.0))))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "so", "win_rows",
                                    "d0cull", "tup_every"))
def _plist_call(row0, ten, tris128, orig_t, dir_t, interpret=False,
                so=True, win_rows=16, d0cull=False, tup_every=None):
    n = orig_t.shape[1]
    grid = n // GATE
    nchunks = row0.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel_plist, so=so, win_rows=win_rows,
                          nchunks=nchunks, d0cull=d0cull,
                          tup_every=tup_every),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # row0 lists (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # ten lists (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # tri rows (HBM)
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((8 * grid, 128), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, 128), jnp.float32),      # ids chunk
            pltpu.SMEM((8, 128), jnp.float32),      # ten chunk
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, win_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(row0, ten, tris128, orig_t, dir_t)


# ---------------------------------------------------------------------------
# host entry
# ---------------------------------------------------------------------------


def plist_supported(mwin, n_rays: int, image_shape) -> bool:
    if mwin is None or image_shape is None:
        return False
    h, w = image_shape
    return (n_rays == h * w and h % GH == 0 and w % GW == 0
            and _os.environ.get("CLPT_PLIST", "1") != "0")


def traverse_plist(mwin: MortonWindows, orig, dir, image_shape,
                   interpret: bool = None, supers: bool = None,
                   grid=None, d0cull: bool = None,
                   dilate_px: float = 0.0, resolve_chunk: int = None,
                   gate_h: int = None, tup_every: int = None,
                   nobits: bool = None, gathered: bool = None,
                   kmax: int = None, cwin: int = None):
    """Trace shared-origin primary rays. Same record contract as
    traverse_packet. Requires grid_dirs-quality rays (the prepass
    frustum hulls assume it) — OR jittered pixel samples with
    dilate_px set to a bound on the subpixel offset plus slack (the
    frustum hulls dilate by that many pixels; see _win_keys). supers=
    True uses the two-level super-list variant (default: CLPT_PLIST_
    SUPER env, on when the window count is SUPER-granular). grid:
    optional UniformGrid — enables the two-phase straggler engine
    (CLPT_PLIST_KCAP > 0): phase 1 caps each gate's sorted stream,
    phase 2 finishes unsettled lanes on the per-ray grid DDA
    (_plist_two_phase)."""
    from clpathtracer_tpu.ops.packet import _blockify, _unblockify
    n = orig.shape[0]
    h, w = image_shape
    gh = GH if gate_h is None else int(gate_h)
    gw = GATE // gh
    assert GATE % gh == 0 and n == h * w and h % gh == 0 and w % gw == 0
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if supers is None:
        supers = _os.environ.get("CLPT_PLIST_SUPER", "1") != "0"
    supers = supers and mwin.num_windows % SUPER == 0
    # kernel knobs resolved at call time (jit cache keys on them as
    # static args — the round-3 advisor's stale-cache pattern)
    if tup_every is None:
        tup_every = TUP_EVERY
    if nobits is None:
        nobits = _os.environ.get("CLPT_SUPER_NOBITS") == "1"

    orig_b = _blockify(orig, h, w, gh, gw)
    dir_b = _blockify(dir, h, w, gh, gw).astype(jnp.float32)

    so = mwin.so_base is not None and _os.environ.get("CLPT_SO", "1") != "0"
    if d0cull is None:
        # MEASURED NEGATIVE, off by default (probes/probe_d0cull.py,
        # chip, same-session interleaved A/B): terrain 1M wr16
        # 12.2-12.9 ms base vs 13.3-14.4 ms d0cull — removing the
        # per-pair d0 AND made the kernel ~10% slower (the op was
        # hidden under the issue pipeline; the combine-time zeroing
        # select was not). Kept with bit-parity tests so it stays dead.
        d0cull = _os.environ.get("CLPT_SO_D0CULL", "0") != "0"
    d0cull = bool(so and d0cull)
    if so:
        o = orig[0]
        rows128 = (mwin.so_base[0] + o[0] * mwin.so_base[1]
                   + o[1] * mwin.so_base[2] + o[2] * mwin.so_base[3])
        if d0cull:
            # zero every d0 >= 0 record (backfacing-from-origin or pad:
            # those can never pass the kernel's d0 < 0 winner condition)
            # so the kernel drops its per-pair d0 test — zero rows give
            # s = dsum = 0 and die on the strict dsum < 0. One fused
            # select in the per-frame combine; bit-identical winners.
            r = rows128.reshape(-1, 8, 16)
            rows128 = jnp.where(r[:, :, 9:10] < 0.0, r, 0.0) \
                .reshape(-1, 128)
    else:
        rows128 = mwin.tris128

    if gathered is None:
        gathered = _os.environ.get("CLPT_PLIST_GATHER", "0") == "1"
    gathered = bool(gathered and so)
    if gathered:
        import math as _math
        wr = mwin.win_rows
        kmax_v = int(kmax) if kmax else max(1024 // wr, 8)
        cwin_v = int(cwin) if cwin else max(32 // wr, 1)
        # kmax must be a multiple of both 8 (SMEM packing) and cwin
        # (chunk count truncation would silently drop tail windows)
        q = _math.lcm(8, cwin_v)
        kmax_v = min(-(-kmax_v // q) * q, 1024)
        table, ids8, ten8, overflow = _gate_lists_gathered(
            mwin.win_bnd, dir_b, orig[0], wr, kmax_v, rows128,
            dilate_px=float(dilate_px), gh=gh)
        orig_t = orig_b.T.astype(jnp.float32)
        dir_t = dir_b.T

        def gath_path(_):
            return _plist_gath_call(ids8, ten8, table, orig_t, dir_t,
                                    interpret=interpret, win_rows=wr,
                                    kmax=kmax_v, cwin=cwin_v,
                                    tup_every=tup_every)

        def super_path(_):
            # a gate needs more than kmax windows: whole-frame fallback
            # to the super-list engine (identical intersector; only the
            # stream schedule differs). Recomputes its lists — rare.
            key, sid, bits = gate_lists_super(
                mwin.win_bnd, dir_b, orig[0], wr,
                dilate_px=float(dilate_px), gh=gh)
            tris_w = rows128.reshape(-1, wr, 128)
            t0 = jnp.full((1, n), BIG, jnp.float32)
            return _plist_super_call(
                key, sid, bits, tris_w, orig_t, dir_t, t0,
                interpret=interpret, so=so, win_rows=wr, d0cull=d0cull,
                tup_every=tup_every, nobits=nobits)

        def plain_path(_):
            # overflow fallback for window counts that are not
            # SUPER-granular (the super kernel can't run): the plain
            # per-window kernel is always valid. NEVER silently drop —
            # a gate beyond kmax would otherwise lose geometry.
            row0, ten = gate_lists(mwin.win_bnd, dir_b, orig[0], wr,
                                   dilate_px=float(dilate_px), gh=gh)
            return _plist_call(
                row0, ten, rows128, orig_t, dir_t, interpret=interpret,
                so=so, win_rows=wr, d0cull=d0cull, tup_every=tup_every)

        fallback = (super_path if mwin.num_windows % SUPER == 0
                    else plain_path)
        out_t, out_s, tile_stats = jax.lax.cond(
            overflow, fallback, gath_path, None)
        best_t = _unblockify(out_t[0], h, w, gh, gw)
        best_slot = _unblockify(out_s[0].astype(jnp.int32), h, w, gh, gw)
        return _resolve_winners(mwin, best_slot, orig, dir,
                                tile_stats[::8, :5],
                                resolve_chunk=resolve_chunk)
    if supers:
        key, sid, bits = _gate_lists_super(mwin.win_bnd, dir_b, orig[0],
                                           mwin.win_rows,
                                           dilate_px=float(dilate_px),
                                           gh=gh)
        tris_w = rows128.reshape(-1, mwin.win_rows, 128)
        t0 = jnp.full((1, n), BIG, jnp.float32)
        kcap = int(_os.environ.get("CLPT_PLIST_KCAP", "0"))
        total_entries = key.shape[1] * LIST_CHUNK
        if (0 < kcap < total_entries and grid is not None
                and mwin.slot_of_tri is not None):
            out_t, out_s, tile_stats = _plist_two_phase(
                mwin, grid, key, sid, bits, tris_w, orig, orig_b, dir_b,
                t0, kcap, interpret=interpret, so=so, d0cull=d0cull,
                tup_every=tup_every, nobits=nobits)
        else:
            out_t, out_s, tile_stats = _plist_super_call(
                key, sid, bits, tris_w, orig_b.T.astype(jnp.float32),
                dir_b.T, t0, interpret=interpret, so=so,
                win_rows=mwin.win_rows, d0cull=d0cull,
                tup_every=tup_every, nobits=nobits)
    else:
        row0, ten = _gate_lists(mwin.win_bnd, dir_b, orig[0],
                                mwin.win_rows,
                                dilate_px=float(dilate_px), gh=gh)
        out_t, out_s, tile_stats = _plist_call(
            row0, ten, rows128, orig_b.T.astype(jnp.float32), dir_b.T,
            interpret=interpret, so=so, win_rows=mwin.win_rows,
            d0cull=d0cull, tup_every=tup_every)

    best_t = _unblockify(out_t[0], h, w, gh, gw)
    best_slot = _unblockify(out_s[0].astype(jnp.int32), h, w, gh, gw)
    return _resolve_winners(mwin, best_slot, orig, dir,
                            tile_stats[::8, :5],
                            resolve_chunk=resolve_chunk)


def _plist_two_phase(mwin, grid, key, sid, bits, tris_w, orig, orig_b,
                     dir_b, t0, kcap, *, interpret, so, d0cull=False,
                     tup_every=None, nobits=None):
    """Two-phase straggler engine: per-gate break -> per-RAY finish.

    The super-list kernel BREAKs per gate — one deep or missing lane
    forces all 512 lanes through the gate's full sorted list. Measured
    on the 1M scenes (probes/probe_phase_potential.py): the per-LANE
    need is 3.62x smaller than the per-gate cost on the soup (p50 6 /
    p90 15 supers vs ~30 streamed), 1.23x on the terrain. So:

      phase 1: stream at most `kcap` sorted entries per gate (kernel
        kcap arg). A lane is SETTLED when its best t is at or inside
        the first unstreamed entry's conservative t_en — no remaining
        super can beat it (sorted keys lower-bound every later super).
      phase 2: finish the unsettled lanes on the per-ray grid DDA
        (ops/grid_walk.py), compacted to the front (stable sort keeps
        pixel order for gather locality) with per-lane t_max = their
        phase-1 best (hits at/beyond it cannot win the merge). Only a
        per-RAY engine pays per-lane need: re-bundling stragglers into
        fresh 512-lane packets was MEASURED DEAD (probe_two_phase.py
        first cut: kcap=12 -> 82 ms vs 34.8 single-phase — struggler
        bundles never break early and interval hulls cull far worse
        than pixel frustums).

    Grid winners carry original tri ids; mwin.slot_of_tri converts them
    into the slot-indexed resolve path, so the merged output is one
    (t, slot) pair per lane. Reference behavior matched: the PER-RAY
    early-exit economy of /root/reference/src/kernel.cl:381-383, which
    the per-gate break only approximates."""
    from clpathtracer_tpu.ops.grid_walk import traverse_grid
    n = dir_b.shape[0]
    wr = mwin.win_rows
    out_t, out_s, ts1 = _plist_super_call(
        key, sid, bits, tris_w, orig_b.T.astype(jnp.float32), dir_b.T,
        t0, interpret=interpret, so=so, win_rows=wr, kcap=kcap,
        d0cull=d0cull, tup_every=tup_every, nobits=nobits)
    # sorted key entry e of gate g lives at [g, e//1024, e%8,
    # (e%1024)//8]; pad/culled entries carry +inf, so every lane of an
    # exhausted gate settles (BIG*(1+1e-4) stays finite, and x <= inf).
    key_k = key[:, kcap // LIST_CHUNK, kcap % 8,
                (kcap % LIST_CHUNK) // 8]                 # [G]
    bt1 = out_t[0]
    # 1e-4 slack: bt is the kernel's SO-arithmetic t; the exact winner
    # may sit a few ulps above it and a remaining super could straddle
    # the gap
    settled = bt1 * (1.0 + 1e-4) <= jnp.repeat(key_k, GATE)
    perm = jnp.argsort(settled)               # stable: unsettled first
    act2 = ~settled[perm]
    o = jnp.asarray(orig[0], jnp.float32)
    o2 = jnp.broadcast_to(o[None, :], (n, 3))
    rec2 = traverse_grid(grid, o2, dir_b[perm],
                         t_max=bt1[perm] * (1.0 + 1e-4), active=act2)
    slot2 = jnp.where(
        rec2["hit"],
        mwin.slot_of_tri[jnp.clip(rec2["tri"], 0,
                                  mwin.slot_of_tri.shape[0] - 1)],
        -1).astype(jnp.float32)
    inv = jnp.argsort(perm)
    t2 = rec2["t"][inv]
    s2 = slot2[inv]
    take2 = (s2 >= 0.0) & (t2 < bt1)
    return (jnp.where(take2, t2, bt1)[None],
            jnp.where(take2, s2, out_s[0])[None],
            ts1)


def _resolve_winners(mwin, best_slot, orig, dir, tile_stats,
                     resolve_chunk: int = None):
    """Re-resolve the kernel's winner slots to the traverse record: the
    winner quad's exact f32 t/u/v via one general MT per ray
    (ops/traverse_fast.py::_mt_pre) — the kernels carry only (t, slot).
    best_slot must be in the caller's ray order (unblockify first).

    With fused resolve rows attached (attach_resolve) the record also
    carries pre-resolved shade attributes (snormal/salbedo/semission —
    the integrator's _surface skips its own shade_rows gather), and the
    whole resolution costs ONE 32-lane row gather instead of the
    quads + shade_rows pair (~2x on the latency-bound gather cost,
    probes/probe_gather_tpu.py)."""
    n = orig.shape[0]
    # the resolve gather is latency-bound and SUPERLINEAR in wave width
    # (probes/probe_gather_tpu.py: half-width costs 2.4x less — the same
    # model the grid walk exploits via CLPT_GRID_CHUNK); chunk the whole
    # resolve body (gather + MT re-resolve + shade math) when enabled
    chunk = (int(_os.environ.get("CLPT_RESOLVE_CHUNK", "0"))
             if resolve_chunk is None else resolve_chunk)
    if 0 < chunk < n and n % chunk == 0:
        def one(args):
            slots, og, dg = args
            return _resolve_winners_body(mwin, slots, og, dg)
        parts = jax.lax.map(one, (best_slot.reshape(-1, chunk),
                                  orig.reshape(-1, chunk, 3),
                                  dir.reshape(-1, chunk, 3)))
        out = {k: v.reshape((n,) + v.shape[2:]) for k, v in parts.items()}
        out["steps"] = jnp.zeros((n,), jnp.int32)
        out["tile_stats"] = tile_stats
        return out
    out = _resolve_winners_body(mwin, best_slot, orig, dir)
    out["steps"] = jnp.zeros((n,), jnp.int32)
    out["tile_stats"] = tile_stats
    return out


def _resolve_winners_body(mwin, best_slot, orig, dir):
    from clpathtracer_tpu.core import vecmath as vm
    from clpathtracer_tpu.ops.traverse_fast import _mt_pre
    hit = best_slot >= 0
    if mwin.resolve_rows is not None:
        nslots = mwin.resolve_rows.shape[0] * 4
        slot_safe = jnp.clip(best_slot, 0, nslots - 1)
        r128 = mwin.resolve_rows[slot_safe // 4]       # ONE [n,128] gather
        seg = slot_safe % 4
        rows = r128[:, 0:32]
        for j in range(1, 4):
            rows = jnp.where((seg == j)[:, None],
                             r128[:, 32 * j:32 * (j + 1)], rows)
        sel = rows[:, :10]
        extra = {}
    else:
        tris16 = mwin.tris128.reshape(-1, 16)
        slot_safe = jnp.clip(best_slot, 0, tris16.shape[0] - 1)
        quads = mwin.quads
        qsel = quads[slot_safe // 4].reshape(-1, 4, 16)
        lanes = slot_safe % 4
        sel = qsel[:, 0, :]
        for j in range(1, 4):
            sel = jnp.where((lanes == j)[:, None], qsel[:, j, :], sel)
        rows = None
        extra = {}
    v0s, e1s, e2s = sel[:, 0:3], sel[:, 3:6], sel[:, 6:9]
    ok, t, u, v = _mt_pre(v0s, e1s, e2s, orig, dir)
    tri = jnp.where(hit, sel[:, 9].astype(jnp.int32), -1)
    if rows is not None:
        # shade attrs from the same row — arithmetic matches
        # render/shading.py::resolve_tri_hits' baked path exactly so the
        # fused route is bit-identical to the two-gather route
        w = jnp.stack([1.0 - u - v, u, v], axis=-1)
        nrm = (w[:, 0:1] * rows[:, 10:13] + w[:, 1:2] * rows[:, 13:16]
               + w[:, 2:3] * rows[:, 16:19])
        extra = {
            "snormal": vm.normalize(nrm, eps=1e-30),
            "salbedo": rows[:, 19:22],
            "semission": rows[:, 22:25],
        }
    return {
        "hit": hit,
        "t": jnp.where(hit, t, BIG),
        "tri": tri,
        "u": jnp.where(hit, u, 0.0),
        "v": jnp.where(hit, v, 0.0),
        **extra,
    }


# ---------------------------------------------------------------------------
# super-list variant: two-level sorted lists
#
# The plain plist pays two per-WINDOW scalar costs the probes measure at
# ~0.3-0.6 us each (probe_plist.py win_rows=8 vs 16): a DMA start/wait
# pair and (at cadence 1) a vector->scalar t_upper sync. Both serialize
# with the dense math (the round-2 finding), which is why 64-tri windows
# LOSE end-to-end despite testing 28% fewer triangles. The super variant
# moves the sorted list, the DMA, the BREAK, and the t_upper refresh to
# supers of SUPER consecutive Morton windows (one [SUPER*win_rows, 128]
# DMA each) while per-window NEED BITS in the sort payload keep the
# dense-math granularity at single windows (a bit-gated pl.when skips a
# window's vector work entirely). The sort also shrinks 16x — the 10M-tri
# prepass cost (VERDICT r3 handoff #4's two-level window hierarchy).
# ---------------------------------------------------------------------------


def gate_lists_super(win_bnd, dir_g, origin, win_rows: int,
                     dilate_px: float = 0.0, gh: int = None):
    """Two-level lists: per-window keys (_win_keys) reduced to supers of
    SUPER windows. Returns (key, sid, bits), each [G, C, 8, 128] f32 with
    entry j of gate g at [g, j // 1024, j % 8, (j % 1024) // 8]:
    key = min over needed windows of the conservative entry distance
    (+inf when the gate needs nothing in the super — the sorted tail),
    sid = super id (exact f32 int), bits = SUPER need bits (f32-exact:
    SUPER <= 16 < 2^24)."""
    gh = GH if gh is None else gh
    G = dir_g.shape[0] // GATE
    d = dir_g.reshape(G, GATE, 3).astype(jnp.float32)
    key_w = _win_keys(win_bnd, d, origin, gh, GATE // gh,
                      dilate_px=dilate_px)                  # [G, W]
    return _super_pack(key_w)


def _super_pack(key_w):
    """Reduce per-window keys [G, W] to sorted super-entry lists (the
    gate_lists_super contract): min-key per super, need bits, variadic
    key+sid+bits sort, [G, C, 8, 128] chunk packing."""
    G, w = key_w.shape
    inf = jnp.float32(jnp.inf)
    spad = -w % SUPER
    if spad:  # unpadded builds (build_morton_windows pads to SUPER)
        key_w = jnp.concatenate(
            [key_w, jnp.full((G, spad), inf, jnp.float32)], axis=1)
    kw = key_w.reshape(G, -1, SUPER)                        # [G, Ws, 16]
    key = jnp.min(kw, axis=2)
    fin = jnp.isfinite(kw)
    bits = jnp.zeros(key.shape, jnp.int32)
    for k in range(SUPER):
        bits = bits | (fin[:, :, k].astype(jnp.int32) << k)
    ws = key.shape[1]
    sid = jnp.broadcast_to(
        jnp.arange(ws, dtype=jnp.float32)[None], key.shape)
    bitsf = bits.astype(jnp.float32)
    wpad = -ws % LIST_CHUNK
    if wpad:
        key = jnp.concatenate(
            [key, jnp.full((G, wpad), inf, jnp.float32)], axis=1)
        sid = jnp.concatenate(
            [sid, jnp.zeros((G, wpad), jnp.float32)], axis=1)
        bitsf = jnp.concatenate(
            [bitsf, jnp.zeros((G, wpad), jnp.float32)], axis=1)
    key, sid, bitsf = jax.lax.sort((key, sid, bitsf), dimension=1,
                                   num_keys=1)

    def pack(x):  # [G, Wpad] -> [G, C, 8, 128], entry e at [e%8, e//8]
        return x.reshape(G, -1, 128, 8).transpose(0, 1, 3, 2)

    return pack(key), pack(sid), pack(bitsf)


_gate_lists_super = jax.jit(gate_lists_super,
                            static_argnames=("win_rows", "dilate_px",
                                             "gh"))


def _kernel_plist_super(key_ref, sid_ref, bit_ref, tris_ref, o_ref,
                        d_ref, t0_ref, t_ref, slot_ref, stats_ref,
                        key_smem, sid_smem, bit_smem, list_sem, tri_buf,
                        tri_sem, acc_t, acc_s, *, so, win_rows, nchunks,
                        kcap=0, d0cull=False, tup_every=None,
                        nobits=None):
    tup_every = TUP_EVERY if tup_every is None else tup_every
    g = pl.program_id(0)
    rays = _ray_rows(o_ref, d_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    wr = win_rows
    # per-lane t upper-bound seeds ([1, GATE]): BIG for primary rays;
    # the light distance for shadow bundles (windows entirely beyond
    # every lane's bound can never occlude), 0 for dead lanes. Also
    # clamps the t_upper REFRESH per lane — without it a single
    # never-hit lane (acc stays BIG) would drag tup back to BIG and
    # void the bound.
    t0 = t0_ref[...]

    def load_chunk(c):
        for ref, sm in ((key_ref, key_smem), (sid_ref, sid_smem),
                        (bit_ref, bit_smem)):
            cp = pltpu.make_async_copy(ref.at[g, c], sm, list_sem)
            cp.start()
            cp.wait()

    def ent(j):
        e = j % LIST_CHUNK
        return (key_smem[e % 8, e // 8],
                sid_smem[e % 8, e // 8].astype(jnp.int32),
                bit_smem[e % 8, e // 8].astype(jnp.int32))

    def start_tri(sid, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(sid * SUPER, SUPER)],
            tri_buf.at[par], tri_sem.at[par]).start()

    def wait_tri(sid, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(sid * SUPER, SUPER)],
            tri_buf.at[par], tri_sem.at[par]).wait()

    # accumulators live in VMEM scratch, not loop carry: the bit-gated
    # per-window pl.when bodies must UPDATE them, and pl.when can't
    # return values
    acc_t[...] = jnp.full((wr, GATE), BIG, jnp.float32)
    acc_s[...] = jnp.full((wr, GATE), -1.0, jnp.float32)

    load_chunk(0)
    key0, sid0, bit0 = ent(0)
    tup0 = jnp.minimum(jnp.float32(BIG), jnp.max(t0))
    alive0 = key0 <= tup0

    @pl.when(alive0)
    def _():
        start_tri(sid0, 0)

    mt = (functools.partial(_mt_chunk_math_so, d0cull=d0cull) if so
          else _mt_chunk_math)
    w_total = nchunks * LIST_CHUNK
    # kcap: phase-1 stream budget of the two-phase engine — consume at
    # most kcap sorted entries per gate; the host finishes unsettled
    # lanes in compacted phase-2 bundles (traverse_plist)
    jcap = w_total if kcap <= 0 else min(kcap, w_total)
    iota_wr = jax.lax.broadcasted_iota(jnp.int32, (wr, 1), 0)

    def body(state):
        j, par, sid_j, bit_j, alive, tup, ns, nw = state
        j1 = j + 1

        @pl.when((j1 % LIST_CHUNK == 0) & (j1 < w_total))
        def _():
            load_chunk(j1 // LIST_CHUNK)

        key1, sid1, bit1 = ent(j1)  # j1 == w_total reads entry 0 of
        # the resident chunk: stale, but nxt is then False and the loop
        # exits without touching them
        nxt = (j1 < jcap) & (key1 <= tup)

        @pl.when(nxt)
        def _():
            start_tri(sid1, 1 - par)

        # consume super j: per-window bit-gated dense math. A/B knob
        # CLPT_SUPER_NOBITS=1 runs every window unconditionally (sound:
        # the cull is conservative, un-needed windows can only miss) —
        # measures the scalar-branch cost against the extra dense math.
        wait_tri(sid_j, par)
        nb = (_os.environ.get("CLPT_SUPER_NOBITS") == "1"
              if nobits is None else nobits)
        for k in range(SUPER):
            def consume(k=k):
                rid = ((sid_j * SUPER + k) * wr + iota_wr) \
                    .astype(jnp.float32)
                ta, sa = mt(tri_buf.at[par], k, rays, GATE, None, None,
                            None, act_row=None, row_ids=rid,
                            merge=False, acc=(acc_t[...], acc_s[...]))
                acc_t[...] = ta
                acc_s[...] = sa
            if nb:
                consume()
            else:
                pl.when(((bit_j >> k) & 1) == 1)(consume)
        ns = ns + 1
        nw_j = jnp.int32(0)
        for k in range(SUPER):
            nw_j = nw_j + ((bit_j >> k) & 1)
        nw = nw + nw_j
        tup = jax.lax.cond(
            ns % tup_every == 0,
            lambda: jnp.max(jnp.minimum(jnp.min(acc_t[...], axis=0),
                                        t0[0])), lambda: tup)
        return j1, 1 - par, sid1, bit1, nxt, tup, ns, nw

    st = (jnp.int32(0), jnp.int32(0), sid0, bit0, alive0, tup0,
          jnp.int32(0), jnp.int32(0))
    _, _, _, _, _, _, ns, nw = jax.lax.while_loop(
        lambda s: s[4], body, st)

    t_acc = acc_t[...]
    s_acc = acc_s[...]
    best_t = jnp.min(t_acc, axis=0, keepdims=True)
    cand = jnp.where(t_acc == best_t, s_acc, BIG)
    best_s = jnp.min(cand, axis=0, keepdims=True)
    t_ref[:] = best_t
    slot_ref[:] = jnp.where(best_t < BIG, best_s, -1.0)
    stats_ref[:] = jnp.where(
        lane == 0, 0.0,
        jnp.where(lane == 1, nw.astype(jnp.float32),
                  jnp.where(lane == 2, jnp.float32(GATE),
                            jnp.where(lane == 3, ns.astype(jnp.float32),
                                      jnp.where(lane == 4,
                                                nw.astype(jnp.float32),
                                                0.0)))))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "so", "win_rows",
                                    "kcap", "d0cull", "tup_every",
                                    "nobits"))
def _plist_super_call(key, sid, bits, tris_w, orig_t, dir_t, t0,
                      interpret=False, so=True, win_rows=16, kcap=0,
                      d0cull=False, tup_every=None, nobits=None):
    n = orig_t.shape[1]
    grid = n // GATE
    nchunks = key.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel_plist_super, so=so, win_rows=win_rows,
                          nchunks=nchunks, kcap=kcap, d0cull=d0cull,
                          tup_every=tup_every, nobits=nobits),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # key lists (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # sid lists (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # bit lists (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # tri rows (HBM)
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # t upper-bound seeds
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((8 * grid, 128), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, 128), jnp.float32),      # key chunk
            pltpu.SMEM((8, 128), jnp.float32),      # sid chunk
            pltpu.SMEM((8, 128), jnp.float32),      # bits chunk
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, SUPER, win_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((win_rows, GATE), jnp.float32),
            pltpu.VMEM((win_rows, GATE), jnp.float32),
        ],
        interpret=interpret,
    )(key, sid, bits, tris_w, orig_t, dir_t, t0)


@jax.jit
def _bundle_lists(win_bnd, ob, db):
    return _super_pack(_bundle_keys(win_bnd, ob, db))


def plist_bundle_supported(mwin, n_rays: int) -> bool:
    return (mwin is not None and n_rays % GATE == 0
            and mwin.num_windows % SUPER == 0
            and _os.environ.get("CLPT_PLIST_BOUNCE", "1") != "0")


def traverse_plist_bundle(mwin: MortonWindows, orig, dir, active=None,
                          t_max=None, interpret: bool = None,
                          resolve_chunk: int = None):
    """Trace an ARBITRARY wavefront (scattered bounce/shadow rays)
    through the Morton windows: consecutive 512-ray bundles get
    conservative interval-slab keys (_bundle_keys — no shared origin,
    no frustum) and ride the same super-list streaming kernel with the
    general per-lane MT math. Same record contract as traverse_plist.

    Callers should Morton/octant-sort the wavefront first (ops/sort.py)
    — culling quality IS the bundle coherence. Dead lanes (active
    False) get zeroed directions: their slab intervals collapse
    conservatively and the dense MT can never accept a hit (det == 0).
    t_max ([N] f32, optional): per-lane upper bound on useful hits
    (shadow-query light distances) — seeds the kernel's streaming break
    so windows beyond every lane's bound are never fetched; hits beyond
    a lane's own t_max may still be reported (callers compare t).
    Replaces the kd-walk packet engine for sorted bounce waves
    (reference analogue: the per-ray rope walk of
    /root/reference/src/kernel.cl:323-389 re-shaped for bundles)."""
    n = orig.shape[0]
    assert n % GATE == 0
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    dirm = (jnp.where(active[:, None], dir, 0.0)
            if active is not None else dir)
    ob = orig.reshape(-1, GATE, 3).astype(jnp.float32)
    db = dirm.reshape(-1, GATE, 3).astype(jnp.float32)
    key, sid, bits = _bundle_lists(mwin.win_bnd, ob, db)
    tris_w = mwin.tris128.reshape(-1, mwin.win_rows, 128)
    t0 = (jnp.full((n,), BIG, jnp.float32) if t_max is None
          else jnp.asarray(t_max, jnp.float32))
    if active is not None:
        t0 = jnp.where(active, t0, 0.0)
    out_t, out_s, tile_stats = _plist_super_call(
        key, sid, bits, tris_w,
        jnp.asarray(orig, jnp.float32).T, jnp.asarray(dirm, jnp.float32).T,
        t0.reshape(1, n),
        interpret=interpret, so=False, win_rows=mwin.win_rows)
    best_slot = out_s[0].astype(jnp.int32)
    return _resolve_winners(mwin, best_slot, orig, dir,
                            tile_stats[::8, :5],
                            resolve_chunk=resolve_chunk)


# ---------------------------------------------------------------------------
# gathered-stream variant: branch-free private per-gate window tables
#
# Round-5 schedule sweep (probes/probe_r5_sched.py, chip, min-separated
# timing): the super kernel runs its NEEDED windows at ~59.5G tests/s
# while the same kernel with unconditional window math streams at ~84G —
# the VPU ceiling. The ~3.5 ms gap on the terrain frame is pure schedule:
# 16 bit-gated pl.when branches per super (~69 per gate) plus the
# per-super scan/DMA-wait scalar work, all serializing with the vector
# pipe (the round-2 finding, again). This variant removes the branches
# entirely: the PREPASS gathers each gate's sorted windows into a
# private contiguous [KMAX*wr, 128] table (one big-block take — window
# blocks are 4-8 KB, so the gather is bandwidth-bound, unlike the
# 512-byte scattered row gathers the gather-cost model priced at
# 45 GB/s), and the kernel is a pure sequential consumer: Pallas
# auto-pipelines whole gate blocks into VMEM, the loop tests CHUNK
# windows per iteration with ONE sorted-break decision each (~7 scalar
# branches per gate), and winner slots come from a parallel window-id
# table in SMEM. Windows past a gate's need (pad entries) carry t_en
# = +inf, which the sorted break never reaches.
#
# Soundness: KMAX is static; a gate needing more than KMAX windows
# would lose geometry, so traverse_plist guards the whole frame with a
# lax.cond on max(needed) > KMAX that falls back to the super-list
# engine (identical results; the fallback recomputes its lists from the
# same per-window keys).
# ---------------------------------------------------------------------------


def gate_lists_gathered(win_bnd, dir_g, origin, win_rows: int,
                        kmax: int, rows128, dilate_px: float = 0.0,
                        gh: int = None):
    """Prepass for the gathered-stream kernel. Returns (table, ids8,
    ten8, overflow): table [G, kmax*win_rows, 128] — each gate's first
    kmax sorted-by-t_en windows' triangle rows, gathered contiguous
    (pad windows repeat window 0's rows; their +inf keys keep the
    kernel from ever testing them); ids8/ten8 [G, 8, 128] — window ids
    and entry distances, entry k at [k % 8, k // 8] (SMEM layout,
    lane-padded to 128); overflow — scalar bool, any gate needs more
    than kmax windows."""
    assert kmax % 8 == 0 and kmax <= 1024, kmax
    gh = GH if gh is None else gh
    G = dir_g.shape[0] // GATE
    d = dir_g.reshape(G, GATE, 3).astype(jnp.float32)
    key = _win_keys(win_bnd, d, origin, gh, GATE // gh,
                    dilate_px=dilate_px)                    # [G, W]
    overflow = jnp.max(jnp.sum(jnp.isfinite(key), axis=1)) > kmax
    wid = jnp.broadcast_to(
        jnp.arange(key.shape[1], dtype=jnp.float32)[None], key.shape)
    ten, wid = jax.lax.sort((key, wid), dimension=1, num_keys=1)
    ten, wid = ten[:, :kmax], wid[:, :kmax]
    widx = jnp.where(jnp.isfinite(ten), wid, 0.0).astype(jnp.int32)
    wr = win_rows
    wtab = rows128.reshape(-1, wr * 128)                    # [W, wr*128]
    table = wtab[widx.reshape(-1)].reshape(G, kmax * wr, 128)

    def pack8(x):  # [G, kmax] -> [G, 8, 128], entry k at [k%8, k//8]
        pad = jnp.zeros((G, 1024 - kmax), x.dtype)
        return jnp.concatenate([x, pad], axis=1) \
            .reshape(G, 128, 8).transpose(0, 2, 1)

    return table, pack8(wid), pack8(ten), overflow


_gate_lists_gathered = jax.jit(
    gate_lists_gathered,
    static_argnames=("win_rows", "kmax", "dilate_px", "gh"))


def _kernel_plist_gath(ids_ref, ten_ref, o_ref, d_ref, tris_ref, t_ref,
                       slot_ref, stats_ref, ids_smem, ten_smem,
                       list_sem, acc_t, acc_s, *, win_rows, kmax, cwin,
                       tup_every):
    g = pl.program_id(0)
    rays = _ray_rows(o_ref, d_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    wr = win_rows
    cr = cwin * wr                                 # rows per chunk

    for ref, sm in ((ids_ref, ids_smem), (ten_ref, ten_smem)):
        cp = pltpu.make_async_copy(ref.at[g], sm, list_sem)
        cp.start()
        cp.wait()

    def ten_at(k):
        # clamp: the non-short-circuit while cond evaluates
        # ten_at(nch * cwin) once at the exit boundary, which at
        # kmax=1024 would index [0, 128] — one past the SMEM pad. The
        # clamped value is never USED (the c < nch conjunct is false).
        k = jnp.minimum(k, 1023)
        return ten_smem[k % 8, k // 8]

    def wid_at(k):
        k = jnp.minimum(k, 1023)
        return ids_smem[k % 8, k // 8].astype(jnp.int32)

    iota_wr = jax.lax.broadcasted_iota(jnp.int32, (wr, 1), 0)
    assert kmax % cwin == 0, (kmax, cwin)  # else the tail windows drop
    nch = kmax // cwin
    # accumulators in VMEM scratch, not loop carries: [cr, GATE] carries
    # are copied per iteration by the lowering (the super kernel's
    # lesson; a carried-acc first cut of THIS kernel measured ~52G
    # where the scratch super kernel streams 96G unconditional)
    acc_t[...] = jnp.full((cr, GATE), BIG, jnp.float32)
    acc_s[...] = jnp.full((cr, GATE), -1.0, jnp.float32)

    def body(state):
        c, tup = state
        # absolute quad-row ids of this chunk's windows (slot space)
        rid = jnp.concatenate(
            [(wid_at(c * cwin + j) * wr + iota_wr).astype(jnp.float32)
             for j in range(cwin)], axis=0)         # [cr, 1]
        rows = tris_ref.at[:, pl.ds(c * cr, cr), :]
        ta, sa = _mt_chunk_math_so(rows, 0, rays, GATE, None, None,
                                   None, act_row=None, row_ids=rid,
                                   merge=False,
                                   acc=(acc_t[...], acc_s[...]))
        acc_t[...] = ta
        acc_s[...] = sa
        tup = jax.lax.cond(
            (c + 1) % tup_every == 0,
            lambda: jnp.max(jnp.min(ta, axis=0)), lambda: tup)
        return c + 1, tup

    def cond(state):
        c, tup = state
        return (c < nch) & (ten_at(c * cwin) <= tup)

    c, _ = jax.lax.while_loop(cond, body,
                              (jnp.int32(0), jnp.float32(BIG)))

    t_acc = acc_t[...]
    s_acc = acc_s[...]
    best_t = jnp.min(t_acc, axis=0, keepdims=True)
    cand = jnp.where(t_acc == best_t, s_acc, BIG)
    best_s = jnp.min(cand, axis=0, keepdims=True)
    t_ref[:] = best_t
    slot_ref[:] = jnp.where(best_t < BIG, best_s, -1.0)
    nw = c * cwin
    stats_ref[:] = jnp.where(
        lane == 0, 0.0,
        jnp.where(lane == 1, nw.astype(jnp.float32),
                  jnp.where(lane == 2, jnp.float32(GATE),
                            jnp.where(lane == 4, nw.astype(jnp.float32),
                                      0.0))))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "win_rows", "kmax",
                                    "cwin", "tup_every"))
def _plist_gath_call(ids8, ten8, table, orig_t, dir_t, interpret=False,
                     win_rows=16, kmax=64, cwin=2, tup_every=1):
    n = orig_t.shape[1]
    grid = n // GATE
    return pl.pallas_call(
        functools.partial(_kernel_plist_gath, win_rows=win_rows,
                          kmax=kmax, cwin=cwin, tup_every=tup_every),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # ids8 (HBM -> SMEM)
            pl.BlockSpec(memory_space=pl.ANY),      # ten8 (HBM -> SMEM)
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # the gate's private window table, auto-pipelined: Pallas
            # double-buffers consecutive gate blocks so the HBM read of
            # gate g+1 rides under gate g's dense math
            pl.BlockSpec((1, kmax * win_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((8 * grid, 128), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, 128), jnp.float32),      # window ids
            pltpu.SMEM((8, 128), jnp.float32),      # entry distances
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((cwin * win_rows, GATE), jnp.float32),
            pltpu.VMEM((cwin * win_rows, GATE), jnp.float32),
        ],
        interpret=interpret,
    )(ids8, ten8, orig_t, dir_t, table)


# ---------------------------------------------------------------------------
# sub-gate variant: 4 independent 128-ray packets per program
#
# At 512 rays per packet the sorted stream already reaches the geometric
# ideal (10M-tri probe: streams/gate == the footprint's window count), so
# the remaining redundancy is the FOOTPRINT itself: a 16x32-px packet
# tests ~4x the windows a ray needs. 128-ray packets shrink the footprint
# 4x, but [CR, 128] dense math collapses to ~15G tests/s (round-2 ALU-
# latency dead end). The fix: pack FOUR 128-ray sub-gates along the
# SUBLANE axis — tri rows of four DIFFERENT windows stacked as
# [4*win_rows, 128], each row block tested against its own sub-gate's
# direction rows — so every vector op is [64, 128] (8 native ops, full
# pipeline) while each sub-gate streams only ITS windows. Sub-gates keep
# independent cursors into the shared per-super-gate sorted list (4-bit
# need masks packed into the sort payload), independent t_uppers, and an
# idle sub-gate simply re-tests its last window (idempotent: re-testing
# cannot change a min) until the others finish.
# ---------------------------------------------------------------------------

SUB = 4
SBH, SBW = 8, 16                 # sub-gate pixel block (128 rays)


def gate_lists4(win_bnd, dir_g, origin, win_rows: int):
    """Per-super-gate sorted lists with per-sub-gate need bits.

    dir_g: strip-blocked directions — each consecutive 128 lanes is one
    8x16-px sub-gate, each consecutive 512 one super-gate. Returns
    (key [G, 8, Wc], pay [G, 8, Wc]) f32, entry j at [j % 8, j // 8]:
    key = min over needing sub-gates of the conservative entry distance
    (+inf when none needs it — the sorted tail), pay = window_id * 16 +
    need bits (f32-exact for windows < 2^20)."""
    d = dir_g.reshape(-1, GATE // SUB, 3).astype(jnp.float32)
    ten_s = _win_keys(win_bnd, d, origin, SBH, SBW)
    keep = jnp.isfinite(ten_s)
    w = keep.shape[1]
    g = d.shape[0] // SUB
    ten_g = ten_s.reshape(g, SUB, w)
    bits_g = keep.reshape(g, SUB, w)
    key = jnp.min(ten_g, axis=1)                       # [G, W]
    bits = jnp.zeros((g, w), jnp.int32)
    for s in range(SUB):
        bits = bits | (bits_g[:, s].astype(jnp.int32) << s)

    ids = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None] * 16.0, key.shape)
    pay = ids + bits.astype(jnp.float32)
    wpad = -w % LIST_CHUNK
    if wpad:
        key = jnp.concatenate(
            [key, jnp.full((g, wpad), jnp.inf, jnp.float32)], axis=1)
        pay = jnp.concatenate(
            [pay, jnp.zeros((g, wpad), jnp.float32)], axis=1)
    key, pay = jax.lax.sort((key, pay), dimension=1, num_keys=1)

    def pack(x):  # [G, Wpad] -> [G, 8, Wpad/8], entry j at [j%8, j//8]
        return x.reshape(g, -1, 8).transpose(0, 2, 1)

    return pack(key), pack(pay)


_gate_lists4 = jax.jit(gate_lists4, static_argnames=("win_rows",))

TUP4_EVERY = max(int(_os.environ.get("CLPT_PLIST4_TUP", "1")), 1)


def _kernel_plist4(key_ref, pay_ref, tris_ref, o_ref, d_ref, t_ref,
                   slot_ref, stats_ref, key_smem, pay_smem, list_sem,
                   tri_buf, tri_sem, *, so, win_rows, w_total):
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    wr = win_rows
    rows = SUB * wr

    # whole sorted list resident in SMEM (key + payload)
    ka = pltpu.make_async_copy(key_ref.at[g], key_smem, list_sem)
    ka.start()
    ka.wait()
    kb = pltpu.make_async_copy(pay_ref.at[g], pay_smem, list_sem)
    kb.start()
    kb.wait()

    def key_at(j):
        j = jnp.minimum(j, w_total - 1)
        return key_smem[j % 8, j // 8]

    def pay_at(j):
        j = jnp.minimum(j, w_total - 1)
        v = pay_smem[j % 8, j // 8].astype(jnp.int32)
        return v >> 4, v & 15          # window id, need bits

    # per-sub-gate direction rows, broadcast to this kernel's [rows,128]
    # dense shape (built once; rows s*wr..(s+1)*wr test sub-gate s)
    def dir_rows(axis):
        parts = []
        for s in range(SUB):
            dsl = d_ref[axis:axis + 1, 128 * s:128 * (s + 1)]
            parts.append(jnp.broadcast_to(dsl, (wr, 128)))
        return jnp.concatenate(parts, axis=0)

    rays = (None, None, None, dir_rows(0), dir_rows(1), dir_rows(2))

    def scan(j, tup_s, sbit):
        """First list index >= j needed by sub-gate s with key <= its
        t_upper; w_total when the sub-gate is done (sorted keys: the
        first key > tup_s ends it for good)."""
        def cond(i):
            _, bits = pay_at(i)
            return ((i < w_total) & (key_at(i) <= tup_s)
                    & ((bits & sbit) == 0))
        i = jax.lax.while_loop(cond, lambda i: i + 1, j)
        done = (i >= w_total) | (key_at(i) > tup_s)
        return jnp.where(done, w_total, i)

    def start_tri(row0, s, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row0, wr), :],
            tri_buf.at[par, pl.ds(s * wr, wr)],
            tri_sem.at[par, s]).start()

    def wait_tri(row0, s, par):
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(row0, wr), :],
            tri_buf.at[par, pl.ds(s * wr, wr)],
            tri_sem.at[par, s]).wait()

    big_t = jnp.float32(BIG)
    # init cursors: first needed window per sub-gate. DMAs are issued
    # UNCONDITIONALLY for every slot every iteration (a finished or
    # never-active slot refetches a window it already consumed / a
    # window its frustum provably misses — idempotent for the min
    # accumulator and hit-free respectively), which keeps the
    # started/waited pairing trivially exact and the buffer always
    # consistent with the carried row ids.
    js, row0s, alive = [], [], []
    for s in range(SUB):
        j0 = scan(jnp.int32(0), big_t, 1 << s)
        a0 = j0 < w_total
        wid0, _ = pay_at(j0)
        r0 = jnp.where(a0, wid0 * wr, 0)
        js.append(j0)
        row0s.append(r0)
        alive.append(a0)
        start_tri(r0, s, 0)

    iota_wr = jax.lax.broadcasted_iota(jnp.int32, (wr, 1), 0)

    def row_ids_of(r0s):
        return jnp.concatenate(
            [(r + iota_wr).astype(jnp.float32) for r in r0s], axis=0)

    t_acc0 = jnp.full((rows, 128), BIG, jnp.float32)
    s_acc0 = jnp.full((rows, 128), -1.0, jnp.float32)

    def sub_best(t_acc, s):
        return jnp.min(t_acc[s * wr:(s + 1) * wr], axis=0, keepdims=True)

    def body(state):
        (j0, j1, j2, j3, r0, r1, r2, r3, a0, a1, a2, a3,
         tu0, tu1, tu2, tu3, par, t_acc, s_acc, ns) = state
        js = [j0, j1, j2, j3]
        r0s = [r0, r1, r2, r3]
        al = [a0, a1, a2, a3]
        tus = [tu0, tu1, tu2, tu3]

        # prefetch each live sub-gate's NEXT window; finished slots
        # refetch their current one (idempotent), so every slot issues
        # exactly one DMA per iteration and waits exactly one
        njs, nr0s, nal = [], [], []
        for s in range(SUB):
            jn = scan(js[s] + 1, tus[s], 1 << s)
            an = al[s] & (jn < w_total)
            widn, _ = pay_at(jn)
            rn = jnp.where(an, widn * wr, r0s[s])
            start_tri(rn, s, 1 - par)
            njs.append(jnp.where(al[s], jn, js[s]))
            nr0s.append(rn)
            nal.append(an)

        # consume the current windows
        for s in range(SUB):
            wait_tri(r0s[s], s, par)

        t_acc, s_acc = _mt_chunk_math_so(
            tri_buf, par, rays, 128, None, None, None,
            row_ids=row_ids_of(r0s), merge=False) if so else \
            _mt_chunk_math(tri_buf, par, _general_rays4(o_ref, d_ref, wr),
                           128, None, None, None,
                           row_ids=row_ids_of(r0s), merge=False)
        ta, sa = state[17], state[18]
        take = t_acc <= ta
        t_acc = jnp.where(take, t_acc, ta)
        s_acc = jnp.where(take, s_acc, sa)

        ntus = list(tus)
        do_ref = (ns % TUP4_EVERY) == (TUP4_EVERY - 1)
        for s in range(SUB):
            ntus[s] = jax.lax.cond(
                do_ref & al[s],
                lambda s=s, t=t_acc: jnp.max(sub_best(t, s)),
                lambda s=s: tus[s])

        return (njs[0], njs[1], njs[2], njs[3],
                nr0s[0], nr0s[1], nr0s[2], nr0s[3],
                nal[0], nal[1], nal[2], nal[3],
                ntus[0], ntus[1], ntus[2], ntus[3],
                1 - par, t_acc, s_acc, ns + 1)

    state = (js[0], js[1], js[2], js[3],
             row0s[0], row0s[1], row0s[2], row0s[3],
             alive[0], alive[1], alive[2], alive[3],
             big_t, big_t, big_t, big_t,
             jnp.int32(0), t_acc0, s_acc0, jnp.int32(0))
    state = jax.lax.while_loop(
        lambda st: st[8] | st[9] | st[10] | st[11], body, state)
    t_acc, s_acc, ns = state[17], state[18], state[19]
    # drain: the final iteration prefetched one window per slot into
    # 1-par that the loop exit never consumed — wait them (discard)
    final_par = state[16]
    for s in range(SUB):
        wait_tri(state[4 + s], s, final_par)

    bt_parts, bs_parts = [], []
    for s in range(SUB):
        seg_t = t_acc[s * wr:(s + 1) * wr]
        seg_s = s_acc[s * wr:(s + 1) * wr]
        bt = jnp.min(seg_t, axis=0, keepdims=True)
        cand = jnp.where(seg_t == bt, seg_s, BIG)
        bs = jnp.min(cand, axis=0, keepdims=True)
        bt_parts.append(bt)
        bs_parts.append(jnp.where(bt < BIG, bs, -1.0))
    t_ref[:] = jnp.concatenate(bt_parts, axis=1)
    slot_ref[:] = jnp.concatenate(bs_parts, axis=1)
    stats_ref[:] = jnp.where(
        lane == 1, (SUB * ns).astype(jnp.float32),
        jnp.where(lane == 2, jnp.float32(GATE),
                  jnp.where(lane == 4, (SUB * ns).astype(jnp.float32),
                            0.0)))


def _general_rays4(o_ref, d_ref, wr):
    """General-MT ray rows for the sub-gate layout: [4*wr, 128] blocks
    of each sub-gate's origins/directions."""
    def rowsof(ref, axis):
        parts = []
        for s in range(SUB):
            sl = ref[axis:axis + 1, 128 * s:128 * (s + 1)]
            parts.append(jnp.broadcast_to(sl, (wr, 128)))
        return jnp.concatenate(parts, axis=0)

    return (rowsof(o_ref, 0), rowsof(o_ref, 1), rowsof(o_ref, 2),
            rowsof(d_ref, 0), rowsof(d_ref, 1), rowsof(d_ref, 2))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "so", "win_rows"))
def _plist4_call(key, pay, tris128, orig_t, dir_t, interpret=False,
                 so=True, win_rows=16):
    n = orig_t.shape[1]
    grid = n // GATE
    w_total = key.shape[2] * 8
    return pl.pallas_call(
        functools.partial(_kernel_plist4, so=so, win_rows=win_rows,
                          w_total=w_total),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # key lists (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # payload lists (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # tri rows (HBM)
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((8 * grid, 128), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GATE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM(key.shape[1:], jnp.float32),
            pltpu.SMEM(key.shape[1:], jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, SUB * win_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SUB)),
        ],
        interpret=interpret,
    )(key, pay, tris128, orig_t, dir_t)


def traverse_plist4(mwin: MortonWindows, orig, dir, image_shape,
                    interpret: bool = None):
    """Sub-gate variant of traverse_plist (4 independent 128-ray packets
    per program). Same record contract. SMEM bound: the whole sorted
    list lives on-chip — 2 * 4 * Wpad bytes <= ~700 KB caps the scene at
    ~10M triangles per 128-tri window (plist_supported4 checks)."""
    from clpathtracer_tpu.ops.packet import _blockify_strips, \
        _unblockify_strips
    n = orig.shape[0]
    h, w = image_shape
    assert n == h * w and h % GH == 0 and w % GW == 0
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    orig_b = _blockify_strips(orig, h, w, GH, GW, SBH, SBW)
    dir_b = _blockify_strips(dir, h, w, GH, GW, SBH, SBW) \
        .astype(jnp.float32)

    key, pay = _gate_lists4(mwin.win_bnd, dir_b, orig[0], mwin.win_rows)

    so = mwin.so_base is not None and _os.environ.get("CLPT_SO", "1") != "0"
    if so:
        o = orig[0]
        rows128 = (mwin.so_base[0] + o[0] * mwin.so_base[1]
                   + o[1] * mwin.so_base[2] + o[2] * mwin.so_base[3])
    else:
        rows128 = mwin.tris128

    out_t, out_s, tile_stats = _plist4_call(
        key, pay, rows128, orig_b.T.astype(jnp.float32), dir_b.T,
        interpret=interpret, so=so, win_rows=mwin.win_rows)

    best_t = _unblockify_strips(out_t[0], h, w, GH, GW, SBH, SBW)
    best_slot = _unblockify_strips(out_s[0].astype(jnp.int32), h, w,
                                   GH, GW, SBH, SBW)
    return _resolve_winners(mwin, best_slot, orig, dir,
                            tile_stats[::8, :5])


def plist4_supported(mwin, n_rays: int, image_shape) -> bool:
    if not plist_supported(mwin, n_rays, image_shape):
        return False
    wpad = (mwin.num_windows + LIST_CHUNK - 1) // LIST_CHUNK * LIST_CHUNK
    if 2 * 4 * wpad > 700 * 1024:
        return False
    if mwin.num_windows * 16 >= (1 << 24):  # payload f32-exactness
        return False
    return _os.environ.get("CLPT_SUBGATE", "1") != "0"
