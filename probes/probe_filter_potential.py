"""Measure the headroom of a TRIANGLE-LEVEL maybe-hit prefilter.

Round-2 diagnosis: the packet kernels pay ~4.7k exact triangle tests/ray
on the 1M-tri terrain because the mask prepass culls only geometrically —
a (strip, window) pair survives when the strip's frustum merely OVERLAPS
the window's AABB. Most surviving pairs still produce ZERO hits: the
infinite rays never pass the signed-volume tests of any triangle in the
window. VERDICT r2 #1 prescribes a reduced-precision conservative
prefilter; before building it, this probe measures its ceiling on the
bench scenes:

  (a) fraction of surviving (strip, window) pairs with zero exact
      s-test passes — pairs a perfect filter removes entirely;
  (b) same at WINDOW granularity (zero passes across every strip of the
      tile) — windows whose DMA disappears too;
  (c) the same decisions made from SPARSE PROBE RAYS (one per 4x4 pixel
      block) with a conservative cone margin — the cheap realizable
      filter — reporting its false-cull count (must be 0) and how much
      of (a) it captures.

Run on CPU (exact XLA math, no kernels involved):
  python probes/probe_filter_potential.py [tris] [res]
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops import packet as pk
from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh


def window_rows(tree):
    """Global window id -> first tri row, exactly as chunk_bounds_host."""
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


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    scene_kind = sys.argv[3] if len(sys.argv) > 3 else "terrain"
    tile = 2048
    th, tw = 32, 64            # tile pixel block (1:2 rect, as production)
    bh, bw = 16, 32            # strip = 512-lane gate (production halfgate)
    n_strips = tile // (bh * bw)
    probe_step = 4             # probe rays: 1 per 4x4 pixel block

    t0 = time.time()
    if scene_kind == "terrain":
        scene = terrain_mesh(tris, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
        leaf, depth = 3072, 11
    else:
        scene = random_tri_soup(tris, seed=0, extent=10.0, tri_size=0.01)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        leaf, depth = 512, 14
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, max_depth=depth, leaf_size=leaf, tri_block=4)
    print(f"# scene+tree {time.time()-t0:.1f}s stats={tree.stats()}",
          flush=True)

    orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
    origin = np.asarray(orig[0])
    h = w = res
    dir_bs = pk._blockify_strips(dirs, h, w, th, tw, bh, bw)
    mask, _ten = pk._strip_masks(jnp.asarray(tree.chunk_bnd),
                                 jnp.asarray(dir_bs, jnp.float32),
                                 origin, n_strips, bh, bw)
    mask = np.asarray(mask)                       # [nt, 8, Wc]
    nt = mask.shape[0]
    wc = mask.shape[2] * 8
    # [nt, W] ints; bit s = strip s keeps window w
    bits = mask.transpose(0, 2, 1).reshape(nt, wc)
    win_r0, w_total = window_rows(tree)
    bits = bits[:, :w_total]

    # per-strip keep matrix [S_total, W]
    keep = np.stack([(bits >> s) & 1 for s in range(n_strips)],
                    axis=1).reshape(nt * n_strips, w_total).astype(bool)
    S = keep.shape[0]
    lanes = bh * bw
    d_strip = np.asarray(dir_bs, np.float32).reshape(S, lanes, 3)

    # baked SO rows for every tri slot (f64 for the oracle)
    rows16 = np.asarray(tree.quads, np.float64).reshape(-1, 16)
    so = np.asarray(pk.so_rows(jnp.asarray(rows16, jnp.float32),
                               origin), np.float64)
    g = so[:, 0:9].reshape(-1, 3, 3)              # [T, 3 planes, 3]
    d0 = so[:, 9]
    tid = rows16[:, 9]
    alive_tri = (tid >= 0) & (d0 < 0.0)
    gnorm = np.linalg.norm(g, axis=2)             # [T, 3]

    CR = pk.CHUNK_ROWS
    span = CR * 8

    # probe rays + cone radii per strip: centers of probe_step^2 cells
    pr = lanes // (probe_step * probe_step)
    cell = d_strip.reshape(S, bh // probe_step, probe_step,
                           bw // probe_step, probe_step, 3)
    cell = cell.transpose(0, 1, 3, 2, 4, 5).reshape(S, pr, -1, 3)
    d_probe = cell.mean(axis=2)                   # [S, pr, 3]
    r_cone = np.linalg.norm(cell - d_probe[:, :, None, :],
                            axis=-1).max(axis=2)  # [S, pr]

    pairs = np.argwhere(keep)                     # [(s, w)]
    print(f"# strips={S} windows={w_total} surviving pairs={len(pairs)} "
          f"({len(pairs)/S:.1f} windows/strip)", flush=True)

    # batch over pairs
    n_zero = 0
    n_zero_probe = 0
    false_cull = 0
    passes_total = 0
    t0 = time.time()
    B = 512
    for i in range(0, len(pairs), B):
        pb = pairs[i:i + B]
        sw_s, sw_w = pb[:, 0], pb[:, 1]
        rows = win_r0[sw_w]
        sl = rows[:, None] * 8 + np.arange(span)[None, :]   # [B, span]
        gb = g[sl]                                # [B, span, 3, 3]
        ab = alive_tri[sl]                        # [B, span]
        db = d_strip[sw_s]                        # [B, lanes, 3]
        # exact: s_i = d . g_i  -> [B, lanes, span, 3]
        s = np.einsum("blk,btpk->bltp", db, gb)
        hit = (s <= 0.0).all(axis=3) & ab[:, None, :]
        np_pass = hit.any(axis=(1, 2))
        n_zero += int((~np_pass).sum())
        passes_total += int(hit.sum())

        # probe filter: s at probes with margin r_cone * |g_i|
        dp = d_probe[sw_s]                        # [B, pr, 3]
        rp = r_cone[sw_s]                         # [B, pr]
        sp = np.einsum("bpk,btik->bpti", dp, gb)   # [B, pr, span, 3]
        marg = rp[:, :, None, None] * gnorm[sl][:, None, :, :]
        maybe = (sp <= marg).all(axis=3) & ab[:, None, :]
        probe_keep = maybe.any(axis=(1, 2))
        n_zero_probe += int((~probe_keep).sum())
        false_cull += int((np_pass & ~probe_keep).sum())
    dt = time.time() - t0

    npairs = len(pairs)
    print(f"# exact s-test sweep {dt:.1f}s")
    print(f"pairs with ZERO exact passes: {n_zero}/{npairs} "
          f"= {n_zero/npairs:.3f}  (filter ceiling)")
    print(f"pairs probe-filter culls:     {n_zero_probe}/{npairs} "
          f"= {n_zero_probe/npairs:.3f}  (realizable, {probe_step}x"
          f"{probe_step} probes)")
    print(f"FALSE CULLS (must be 0):      {false_cull}")
    print(f"avg exact passes per surviving pair: "
          f"{passes_total/max(npairs-n_zero,1):.1f}")
    print(f"tests/ray geometric: "
          f"{npairs * span * lanes / (res*res):.0f}", flush=True)
    print(f"tests/ray after probe filter: "
          f"{(npairs - n_zero_probe) * span * lanes / (res*res):.0f}",
          flush=True)


if __name__ == "__main__":
    main()
