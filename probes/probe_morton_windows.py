"""Compare DMA-window layouts: kd-leaf windows (straddler-duplicated)
vs GLOBAL Morton-clustered windows (each triangle in exactly one window).

The packet tracer's dense cost is (surviving windows/gate) x 128 tris.
kd windows inherit ~1.3-1.6x straddler duplication and leaf-boundary
raggedness; a global Morton order needs no tree at all for the sorted
prepass-driven stream (the prepass tests every window anyway) and has
zero duplication. This probe measures geometric surviving pairs and
simulated tests/ray for both layouts on the bench scenes.

  python probes/probe_morton_windows.py [tris] [res] [terrain|soup]
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
from probes.probe_sorted_stream import strip_masks_np, window_rows


def _morton10(q):
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x
    return spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))


def morton_windows(tv, span):
    """Global Morton order; windows of `span` tris; returns (perm,
    win_bnd [Wpad16, 8-col layout like chunk_bnd], w_total)."""
    c = tv.mean(axis=1)
    lo, hi = c.min(axis=0), c.max(axis=0)
    q = np.clip((c - lo) / np.maximum(hi - lo, 1e-30) * 1023.0,
                0, 1023).astype(np.uint32)
    perm = np.argsort(_morton10(q), kind="stable")
    t = tv[perm]
    n = t.shape[0]
    pad = -n % span
    vmin = t.min(axis=1)
    vmax = t.max(axis=1)
    if pad:
        vmin = np.concatenate([vmin, np.full((pad, 3), 1e30)], axis=0)
        vmax = np.concatenate([vmax, np.full((pad, 3), -1e30)], axis=0)
    w = vmin.shape[0] // span
    w_lo = vmin.reshape(w, span, 3).min(axis=1)
    w_hi = vmax.reshape(w, span, 3).max(axis=1)
    w_pad = (-w) % 16
    bnd = np.zeros((w + w_pad, 8), np.float32)
    bnd[:, 0:3] = 1e30
    bnd[:, 3:6] = -1e30
    bnd[:w, 0:3] = w_lo
    bnd[:w, 3:6] = w_hi
    return perm, bnd.reshape(-1, 128), w


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
    bh, bw = 16, 32
    lanes = bh * bw
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    span = pk.CHUNK_ROWS * 8

    orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
    origin = np.asarray(orig[0])
    dir_bs = np.asarray(
        pk._blockify_strips(dirs, res, res, th, tw, bh, bw), np.float32)
    d_strip = dir_bs.reshape(-1, lanes, 3)

    # (a) kd-leaf windows
    tree = build_kd_tree(tv, max_depth=depth, leaf_size=leaf, tri_block=4)
    _, w_total = window_rows(tree)
    keep, _ = strip_masks_np(
        np.asarray(tree.chunk_bnd), d_strip, origin)
    pairs_kd = int(keep[:, :w_total].sum())
    print(f"# build {time.time()-t0:.1f}s  kd windows={w_total} "
          f"(dup={w_total*span/tris:.2f}x) pairs={pairs_kd} "
          f"tests/ray={pairs_kd*span*lanes/(res*res):.0f}", flush=True)

    # (b) global Morton windows (no tree, no duplication)
    for wspan in (span, span // 2):
        _, bnd, w_m = morton_windows(tv, wspan)
        keep_m, _ = strip_masks_np(bnd, d_strip, origin)
        pairs_m = int(keep_m[:, :w_m].sum())
        print(f"morton span={wspan}: windows={w_m} pairs={pairs_m} "
              f"tests/ray={pairs_m*wspan*lanes/(res*res):.0f} "
              f"({pairs_m*wspan/(pairs_kd*span):.2f}x of kd)", flush=True)


if __name__ == "__main__":
    main()
