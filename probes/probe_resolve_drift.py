"""Diagnose the chunked-vs-unchunked resolve drift (VERDICT r4 Weak #2).

Question: are the lanes where resolve_chunk=1024 and the unchunked
resolve disagree by >2e-6 the ill-conditioned (grazing / tiny-det) MT
solves, where a 1-ulp reassociation difference in XLA's codegen is
amplified by 1/|det|?  Or is there a chunk-boundary indexing bug?

Method: reproduce the failing test's scene exactly, recompute every
winner's MT solve in float64 on the host, and for each drifting lane
report |det| scaled by the operand magnitudes (the conditioning) plus
each path's distance to the f64 oracle.
"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops import plist as pls
from clpathtracer_tpu.scene.procedural import terrain_mesh

scene = terrain_mesh(30_000, seed=0, extent=10.0).bake_shading()
cam = Camera.create(position=[0.0, 14.0, 0.0], forward=[0.0, -1.0, 0.01])
v0, v1, v2 = scene.tri_verts()
tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
orig, dirs = generate_rays(cam_matrix(cam, 64), 64, 64)

mwin = pls.attach_so(pls.build_morton_windows(tv))
mwin = pls.attach_resolve(mwin, scene.shade_rows)
a = pls.traverse_plist(mwin, orig, dirs, (64, 64))
b = pls.traverse_plist(mwin, orig, dirs, (64, 64), resolve_chunk=1024)

assert (np.asarray(a["hit"]) == np.asarray(b["hit"])).all()
assert (np.asarray(a["tri"]) == np.asarray(b["tri"])).all()

# f64 oracle per winner
tri = np.asarray(a["tri"])
hit = np.asarray(a["hit"])
o = np.asarray(orig, np.float64)
d = np.asarray(dirs, np.float64)
tv64 = tv.astype(np.float64)
idx = np.clip(tri, 0, tv64.shape[0] - 1)
V0 = tv64[idx, 0]
E1 = tv64[idx, 1] - V0
E2 = tv64[idx, 2] - V0
P = np.cross(d, E2)
det = (E1 * P).sum(-1)
T = o - V0
u64 = (T * P).sum(-1) / det
Q = np.cross(T, E1)
v64 = (d * Q).sum(-1) / det
t64 = (E2 * Q).sum(-1) / det
# conditioning: |det| relative to the scale of its summands
scale = (np.abs(E1) * np.abs(P)).sum(-1) + 1e-300
cond = np.abs(det) / scale          # small => catastrophic cancellation

for k in ("t", "u", "v"):
    av, bv = np.asarray(a[k], np.float64), np.asarray(b[k], np.float64)
    err = np.abs(av - bv) / (np.abs(av) + 1e-12)
    bad = hit & (err > 2e-6)
    print(f"field {k}: {bad.sum()} lanes drift >2e-6 rel "
          f"(max {err[hit].max():.3e})")
    if bad.any():
        ref64 = {"t": t64, "u": u64, "v": v64}[k]
        ea = np.abs(av - ref64) / (np.abs(ref64) + 1e-12)
        eb = np.abs(bv - ref64) / (np.abs(ref64) + 1e-12)
        print(f"  drifting lanes: cond(|det|/scale) min={cond[bad].min():.3e} "
              f"median={np.median(cond[bad]):.3e} max={cond[bad].max():.3e}")
        print(f"  well-matched lanes: cond median="
              f"{np.median(cond[hit & ~bad]):.3e}")
        print(f"  dist to f64 oracle on drifting lanes: "
              f"a median={np.median(ea[bad]):.3e} b median={np.median(eb[bad]):.3e}")
        # is drift explained by conditioning?  expected f32 error ~ eps/cond
        expect = 1.2e-7 / np.maximum(cond, 1e-30)
        unexplained = bad & (err > 16 * expect)
        print(f"  lanes whose drift exceeds 16x the conditioning bound: "
              f"{unexplained.sum()}")

# chunk-boundary check: does drift cluster at multiples of 1024?
lanes = np.nonzero(hit & (np.abs(np.asarray(a["t"]) - np.asarray(b["t"]))
                          / np.abs(np.asarray(a["t"])) > 2e-6))[0]
if lanes.size:
    print("drifting lane indices mod 1024: ",
          np.unique(lanes % 1024)[:20], "... count", lanes.size)
