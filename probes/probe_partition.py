"""Window PARTITION quality: Morton-cut vs equal-count median-split.

The plist engine's dense cost is (surviving windows/gate) x span tris
and its DMA cost is (surviving supers/gate); both are proportional to
how tight the window hulls are. build_morton_windows cuts fixed-size
windows from one global Morton order — cuts can straddle z-curve jumps,
inflating the hull. An equal-count recursive median split (widest
centroid axis, split index snapped to a multiple of the window span)
yields the same zero-padding fixed-size windows with provably connected
convex-ish cells, and its depth-first emission order keeps consecutive
windows nested (tight SUPER hulls too).

Pure-CPU geometric proxy (probe_sorted_stream.strip_masks_np is the
numpy twin of the kernel prepass): surviving (gate, window) pairs and
surviving (gate, super) pairs for both orders, bench scenes/cameras.

  python probes/probe_partition.py [tris] [res] [terrain|soup] [span...]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops import packet as pk
from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh
from clpathtracer_tpu.ops.plist import median_order
from probes.probe_morton_windows import morton_windows
from probes.probe_sorted_stream import strip_masks_np


def windows_of(tv, perm, span):
    """Window AABBs for `perm` order, chunk_bnd layout ([*, 128])."""
    t = tv[perm]
    n = t.shape[0]
    pad = -n % span
    vmin = t.min(axis=1)
    vmax = t.max(axis=1)
    if pad:
        vmin = np.concatenate([vmin, np.full((pad, 3), 1e30)], axis=0)
        vmax = np.concatenate([vmax, np.full((pad, 3), -1e30)], axis=0)
    w = vmin.shape[0] // span
    w_pad = (-w) % 16
    bnd = np.zeros((w + w_pad, 8), np.float32)
    bnd[:, 0:3] = 1e30
    bnd[:, 3:6] = -1e30
    bnd[:w, 0:3] = vmin.reshape(w, span, 3).min(axis=1)
    bnd[:w, 3:6] = vmax.reshape(w, span, 3).max(axis=1)
    return bnd.reshape(-1, 128), w


def super_pairs(keep, w, group=16):
    """Surviving (gate, super) pairs: a super of `group` consecutive
    windows is DMA'd when any of its windows is kept."""
    kw = keep[:, :w]
    pad = -w % group
    if pad:
        kw = np.concatenate(
            [kw, np.zeros((kw.shape[0], pad), bool)], axis=1)
    return int(kw.reshape(kw.shape[0], -1, group).any(axis=2).sum())


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    scene_kind = sys.argv[3] if len(sys.argv) > 3 else "terrain"
    spans = [int(a) for a in sys.argv[4:]] or [64]

    t0 = time.time()
    if scene_kind == "terrain":
        scene = terrain_mesh(tris, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
        tile = 2048
    else:
        scene = random_tri_soup(tris, seed=0, extent=10.0, tri_size=0.01)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        tile = 512
    th = tw = int(np.sqrt(tile))
    if th * tw != tile:
        th = int(np.sqrt(tile // 2))
        tw = 2 * th
    bh, bw = 16, 32
    lanes = bh * bw
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)],
                  1).astype(np.float32)

    orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
    origin = np.asarray(orig[0])
    d_strip = np.asarray(
        pk._blockify_strips(dirs, res, res, th, tw, bh, bw),
        np.float32).reshape(-1, lanes, 3)
    print(f"# scene {scene_kind} {tris} tris, res {res}, "
          f"gates {d_strip.shape[0]}  ({time.time()-t0:.1f}s)", flush=True)

    for span in spans:
        rows = []
        for name, order_fn in (
                ("morton", None),
                ("median", lambda: median_order(tv, span))):
            t0 = time.time()
            if order_fn is None:
                _, bnd, w = morton_windows(tv, span)
            else:
                perm = order_fn()
                bnd, w = windows_of(tv, perm, span)
            t_build = time.time() - t0
            keep, _ = strip_masks_np(bnd, d_strip, origin)
            pairs = int(keep[:, :w].sum())
            sup = super_pairs(keep, w)
            rows.append((name, pairs, sup))
            print(f"span={span} {name:7s}: windows={w} "
                  f"pairs={pairs} (win/gate={pairs/keep.shape[0]:.1f}) "
                  f"supers={sup} tests/ray={pairs*span*lanes/(res*res):.0f} "
                  f"build={t_build:.1f}s", flush=True)
        m, d = rows[0], rows[1]
        print(f"span={span} median/morton: pairs {d[1]/m[1]:.3f}x "
              f"supers {d[2]/m[2]:.3f}x", flush=True)


if __name__ == "__main__":
    main()
