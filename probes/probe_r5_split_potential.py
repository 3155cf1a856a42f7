"""CPU probe: adaptive window-splitting potential for the plist engine.

VERDICT r4 #1(a). Fixed-span windows pay a fixed dense-math cost per
NEEDED window, so the only way a finer partition helps is DEAD SPACE:
gates whose frustum crossed the parent hull's empty gap need NEITHER
child after a split (the union of child hulls is smaller than the
parent hull). Gates straddling both children pay DOUBLE (each padded
child costs a full window of math). Per-window payoff is therefore

    delta_w = sum_g [ need_L(g) + need_R(g) - need_P(g) ]

in window-math units; splitting pays exactly where delta_w < 0. This
probe measures delta_w for every window of the median partition with
the REAL prepass cull (_win_keys) on the bench camera, projecting the
frame-time change before any kernel work — the whole computation is
host-side geometry, no chip needed.

  python probes/probe_r5_split_potential.py [terrain|soup]
  PROBE_LEVELS=2 re-splits the winning children once more.
"""

import json
import os
import sys

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("CLPT_PLIST", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops import plist as pls
    from clpathtracer_tpu.ops.packet import _blockify
    from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh

    ntris = int(os.environ.get("PROBE_TRIS", 1_000_000))
    res = int(os.environ.get("PROBE_RES", 512))
    win_rows = int(os.environ.get("PROBE_WIN_ROWS", 16))
    levels = int(os.environ.get("PROBE_LEVELS", 1))
    kind = (sys.argv[1] if len(sys.argv) > 1
            else os.environ.get("PROBE_SCENE", "terrain"))

    if kind == "terrain":
        scene = terrain_mesh(ntris, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
    else:
        scene = random_tri_soup(ntris, seed=0, extent=10.0, tri_size=0.01)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
    span = win_rows * 8

    # median partition (the round-4c winner) = the baseline
    perm = pls.median_order(tv, span)
    t = tv[perm]
    n = t.shape[0]
    pad = -n % span
    cent = t.mean(axis=1)

    G = res * res // pls.GATE
    dir_b = _blockify(dirs, res, res, pls.GH, pls.GW)
    d = jnp.asarray(dir_b).reshape(G, pls.GATE, 3).astype(jnp.float32)
    o = jnp.asarray(np.asarray(orig[0]), jnp.float32)

    keys_of = jax.jit(lambda bnd: pls._win_keys(bnd, d, o, pls.GH,
                                                pls.GW))

    def bounds_of(segs):
        """[W, 8] window AABBs for a list of (start, end) index ranges
        into the permuted triangle array."""
        out = np.zeros((len(segs), 8), np.float32)
        for i, (a, b) in enumerate(segs):
            if a >= n:
                out[i, 0:3], out[i, 3:6] = 1e30, -1e30
                continue
            b = min(b, n)
            out[i, 0:3] = t[a:b].min(axis=(0, 1))
            out[i, 3:6] = t[a:b].max(axis=(0, 1))
        return out

    segs = [(i, i + span) for i in range(0, n + pad, span)]
    need = np.asarray(jnp.isfinite(keys_of(jnp.asarray(bounds_of(segs)))))
    base_wpg = need.sum(axis=1).mean()
    log(f"# {kind}: {len(segs)} windows, windows/gate={base_wpg:.2f}")

    total_extra = 0
    cur_segs = list(segs)
    cur_need = need
    for lvl in range(levels):
        # split every current window at its widest-centroid-axis median
        kids = []
        for (a, b) in cur_segs:
            if a >= n or b - a < 16:
                kids.append(((a, b), (n, n)))  # unsplittable
                continue
            b = min(b, n)
            cc = cent[a:b]
            ax = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
            h = (b - a) // 2
            part = np.argpartition(cc[:, ax], h)
            # reorder the segment in place so children are contiguous
            idx = np.arange(a, b)[part]
            t[a:b] = t[idx]
            cent[a:b] = cent[idx]
            kids.append(((a, a + h), (a + h, b)))
        flat = [s for pair in kids for s in pair]
        kneed = np.asarray(jnp.isfinite(
            keys_of(jnp.asarray(bounds_of(flat)))))
        needL = kneed[:, 0::2]
        needR = kneed[:, 1::2]
        delta = (needL.sum(axis=0) + needR.sum(axis=0)
                 - cur_need.sum(axis=0))
        win = delta < 0
        log(f"# level {lvl}: {win.sum()}/{len(cur_segs)} windows pay, "
            f"delta sum {delta[win].sum()} (gate-windows) of "
            f"{cur_need.sum()}")
        # adopt winning splits; losers keep the parent
        new_segs, new_cols = [], []
        for i, (pair, w) in enumerate(zip(kids, win)):
            if w:
                new_segs.extend(pair)
                new_cols.extend([("L", i), ("R", i)])
            else:
                new_segs.append(cur_segs[i])
                new_cols.append(("P", i))
        cols = []
        for tag, i in new_cols:
            if tag == "P":
                cols.append(cur_need[:, i])
            elif tag == "L":
                cols.append(needL[:, i])
            else:
                cols.append(needR[:, i])
        cur_need = np.stack(cols, axis=1)
        cur_segs = new_segs
        total_extra = len(cur_segs) - len(segs)
        log(f"# level {lvl}: windows/gate -> "
            f"{cur_need.sum(axis=1).mean():.2f} "
            f"({len(cur_segs)} windows)")

    out = {
        "scene": kind, "tris": ntris, "win_rows": win_rows,
        "base_windows": len(segs),
        "base_windows_per_gate": float(base_wpg),
        "adaptive_windows": len(cur_segs),
        "adaptive_windows_per_gate": float(
            cur_need.sum(axis=1).mean()),
        "projected_speedup": float(
            base_wpg / cur_need.sum(axis=1).mean()),
        "extra_windows_frac": total_extra / len(segs),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
