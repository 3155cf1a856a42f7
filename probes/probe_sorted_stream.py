"""Simulate the SORTED-WINDOW streaming protocol and measure tests/ray.

Probe-driven design for the round-3 perf attack. probe_filter_potential
showed the triangle-level prefilter ceiling is low (~30% of surviving
(strip, window) pairs have zero line intersections): the packet tracer's
4.7k tests/ray are NOT geometric overlap waste — they are OCCLUSION
waste, line hits beyond the ray's true nearest hit, which the kernel
only avoids via its (stale) packet-wide t_upper and the leaf-order
window stream.

The candidate redesign: the prepass already computes a conservative
entry distance t_en for every (strip, window). Sort each tile's
surviving windows by t_en (front-to-back GLOBALLY, not in leaf order),
stream them in that order, keep a per-GATE t_upper refreshed as hits
land, and BREAK when the next window's t_en exceeds every gate's
t_upper. The tree walk disappears from the kernel entirely.

This probe simulates that protocol exactly (idealized refresh cadence
and variants) and reports simulated tests/ray vs today's
stream-every-surviving-window baseline, plus the unreachable ideal
(winning windows only). Run on CPU:

  python probes/probe_sorted_stream.py [tris] [res] [terrain|soup]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops import packet as pk
from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh

BIG = 3.4e38


def window_rows(tree):
    CR = pk.CHUNK_ROWS
    starts = np.asarray(tree.leaf_start).astype(np.int64)
    counts = np.asarray(tree.leaf_count).astype(np.int64)
    leaf = np.asarray(tree.is_leaf)
    row0 = starts // 8
    row_end = (starts + counts + 7) // 8
    nwin = np.where(leaf & (counts > 0),
                    (row_end - row0 + CR - 1) // CR, 0)
    cs = np.asarray(tree.chunk_start).astype(np.int64)
    n_rows = np.asarray(tree.quads).reshape(-1, 16).shape[0] // 8
    w_total = int(nwin.sum())
    win_leaf = np.repeat(np.arange(len(nwin)), nwin)
    win_b = np.arange(w_total) - cs[win_leaf]
    return np.minimum(row0[win_leaf] + win_b * CR, n_rows - CR), w_total


def strip_masks_np(chunk_bnd, d_strip, origin):
    """Per-strip geometric keep + t_en (numpy twin of pk._strip_masks,
    but returning PER-STRIP t_en instead of the per-tile min)."""
    cb = np.asarray(chunk_bnd).reshape(-1, 8)
    lo = cb[:, 0:3]
    hi = cb[:, 3:6]
    S, lanes, _ = d_strip.shape
    o = np.asarray(origin, np.float32)
    t_en = np.full((S, 1), -1e30, np.float32)
    t_ex = np.full((S, 1), 1e30, np.float32)
    for ax in range(3):
        inv = np.clip(1.0 / d_strip[:, :, ax], -1e30, 1e30)
        il = inv.min(axis=1, keepdims=True)
        ih = inv.max(axis=1, keepdims=True)
        uniform = il * ih > 0.0
        pos = il > 0.0
        nearb = np.where(pos, lo[None, :, ax], hi[None, :, ax])
        farb = np.where(pos, hi[None, :, ax], lo[None, :, ax])
        near_min = np.minimum((nearb - o[ax]) * il, (nearb - o[ax]) * ih)
        far_max = np.maximum((farb - o[ax]) * il, (farb - o[ax]) * ih)
        t_en = np.maximum(t_en, np.where(uniform, near_min, -1e30))
        t_ex = np.minimum(t_ex, np.where(uniform, far_max, 1e30))
    keep = (t_en <= t_ex) & (t_ex > 0.0)
    # exact 4-plane corner frustum per strip
    bh_bw = int(np.sqrt(lanes // 2))
    fr = np.asarray(pk._frustum_rows(
        jnp.asarray(d_strip.reshape(-1, 3)), origin, lanes,
        bh_bw, 2 * bh_bw))
    for p in range(4):
        n = fr[:, 3 * p:3 * p + 3]                   # [S, 3]
        sup = np.zeros_like(t_en)
        slack = np.zeros_like(t_en)
        for ax in range(3):
            c = np.where(n[:, ax:ax + 1] > 0.0, lo[None, :, ax],
                         hi[None, :, ax]) - o[ax]
            sup = sup + n[:, ax:ax + 1] * c
            slack = slack + np.abs(c)
        keep = keep & (sup <= 1e-5 * slack)
    return keep, np.where(keep, t_en, BIG).astype(np.float32)


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scene_kind = sys.argv[3] if len(sys.argv) > 3 else "terrain"

    t0 = time.time()
    if scene_kind == "terrain":
        scene = terrain_mesh(tris, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
        leaf, depth, tile = 3072, 11, 2048
    else:
        scene = random_tri_soup(tris, seed=0, extent=10.0, tri_size=0.01)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        leaf, depth, tile = 512, 14, 512
    th = tw = int(np.sqrt(tile))
    if th * tw != tile:
        th = int(np.sqrt(tile // 2))
        tw = 2 * th
    bh, bw = 16, 32                      # 512-lane gates
    n_strips = tile // (bh * bw)
    lanes = bh * bw

    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, max_depth=depth, leaf_size=leaf, tri_block=4)
    print(f"# scene+tree {time.time()-t0:.1f}s stats={tree.stats()}",
          flush=True)

    orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
    origin = np.asarray(orig[0])
    h = w = res
    dir_bs = np.asarray(
        pk._blockify_strips(dirs, h, w, th, tw, bh, bw), np.float32)
    d_strip = dir_bs.reshape(-1, lanes, 3)
    S = d_strip.shape[0]
    nt = S // n_strips

    keep, ten = strip_masks_np(tree.chunk_bnd, d_strip, origin)
    win_r0, w_total = window_rows(tree)
    keep, ten = keep[:, :w_total], ten[:, :w_total]

    rows16 = np.asarray(tree.quads, np.float32).reshape(-1, 16)
    so = np.asarray(pk.so_rows(jnp.asarray(rows16), origin), np.float32)
    g = so[:, 0:9].reshape(-1, 3, 3)
    d0 = so[:, 9]
    alive = (rows16[:, 9] >= 0) & (d0 < 0.0)
    CR = pk.CHUNK_ROWS
    span = CR * 8

    pairs = np.argwhere(keep)
    print(f"# strips={S} windows={w_total} pairs={len(pairs)} "
          f"({len(pairs)/S:.1f} win/strip)  baseline tests/ray="
          f"{len(pairs)*span*lanes/(res*res):.0f}", flush=True)

    # per-pair per-ray min line-hit t (BIG when none)
    t0 = time.time()
    mint = np.full((len(pairs), lanes), BIG, np.float32)
    B = 256
    for i in range(0, len(pairs), B):
        pb = pairs[i:i + B]
        sl = win_r0[pb[:, 1]][:, None] * 8 + np.arange(span)[None, :]
        gb = g[sl]                                  # [B, span, 3, 3]
        db = d_strip[pb[:, 0]]                      # [B, lanes, 3]
        s = np.einsum("blk,btik->blti", db, gb)     # [B,lanes,span,3]
        hit = (s <= 0.0).all(axis=3) & alive[sl][:, None, :]
        dsum = s.sum(axis=3)
        tt = np.where(hit, d0[sl][:, None, :]
                      / np.where(dsum == 0, -1.0, dsum), BIG)
        tt = np.where(tt > 0, tt, BIG)
        mint[i:i + B] = tt.min(axis=2)
    print(f"# exact sweep {time.time()-t0:.1f}s", flush=True)

    # oracle best_t per ray (min over all pairs)
    best = np.full((S, lanes), BIG, np.float32)
    np.minimum.at(best, pairs[:, 0], mint)
    hit_frac = float((best < BIG).mean())
    print(f"# hit_frac={hit_frac:.3f}")

    pair_id = -np.ones((S, w_total), np.int64)
    pair_id[pairs[:, 0], pairs[:, 1]] = np.arange(len(pairs))

    def simulate(cadence=1, per_gate=True, slack=1.0001):
        """Process each tile's surviving windows in t_en order."""
        tested = 0
        broke_at = []
        bt = np.full((S, lanes), BIG, np.float32)
        for t_i in range(nt):
            gs = np.arange(t_i * n_strips, (t_i + 1) * n_strips)
            union = keep[gs].any(axis=0)
            wids = np.flatnonzero(union)
            tmin = ten[gs][:, wids].min(axis=0)
            order = np.argsort(tmin, kind="stable")
            wids, tmin = wids[order], tmin[order]
            tup = np.full(n_strips, BIG, np.float32)
            since = np.zeros(n_strips, np.int64)
            for j, w in enumerate(wids):
                if tmin[j] * slack > tup.max():
                    broke_at.append(j / max(len(wids), 1))
                    break
                for k, sidx in enumerate(gs):
                    if not keep[sidx, w]:
                        continue
                    bound = tup[k] if per_gate else tup.max()
                    if ten[sidx, w] * slack > bound:
                        continue
                    tested += 1
                    bt[sidx] = np.minimum(bt[sidx],
                                          mint[pair_id[sidx, w]])
                    since[k] += 1
                    if since[k] % cadence == 0:
                        tup[k] = bt[sidx].max()
            else:
                broke_at.append(1.0)
        ok = bool((bt == best).all())
        return tested, ok, float(np.mean(broke_at))

    base = len(pairs)
    for label, kw in (
            ("sorted, per-gate tup, cadence 1", dict()),
            ("sorted, per-gate tup, cadence 2", dict(cadence=2)),
            ("sorted, per-gate tup, cadence 4", dict(cadence=4)),
            ("sorted, tile-wide tup, cadence 1", dict(per_gate=False)),
    ):
        tested, ok, brk = simulate(**kw)
        print(f"{label}: tested pairs {tested}/{base} "
              f"({tested/base:.3f}) -> tests/ray "
              f"{tested*span*lanes/(res*res):.0f}  exact={ok} "
              f"avg break at {brk:.2f} of list")

    # unreachable ideal: only pairs contributing a final winner
    win_pairs = 0
    for i in range(0, len(pairs), 4096):
        pb = pairs[i:i + 4096]
        win_pairs += int((mint[i:i + 4096]
                          == best[pb[:, 0]]).any(axis=1)
                         .sum())
    print(f"ideal (winning pairs only): {win_pairs}/{base} "
          f"({win_pairs/base:.3f}) -> tests/ray "
          f"{win_pairs*span*lanes/(res*res):.0f}")


if __name__ == "__main__":
    main()
