"""Edge-aware (silhouette) gradients for primary visibility.

diff/grad.py's detached-topology decomposition gives exact INTERIOR
gradients but exactly zero gradient where the image moves because a
silhouette moves — the flagship inverse-rendering failure mode (VERDICT
r2 #6; BASELINE north star: "reparameterized/edge-aware pixel
gradients").

This module closes it with screen-space silhouette reparameterization
in the style of nvdiffrast's analytic edge antialiasing, recast for a
ray tracer:

* the hit's barycentrics (u, v, 1-u-v) are differentiable functions of
  the scene (diff/grad.py re-resolve). Their minimum m is a
  differentiable "distance to the winning triangle's boundary" that
  goes to zero exactly on silhouettes;
* a pixel near a boundary blends its own shading toward the shading of
  the CONTINUATION ray (re-cast past the hit: the surface the
  silhouette occludes, or the background) with weight
  alpha = clip(m / |∇m|, 0, 1), where |∇m| is the DETACHED screen-space
  gradient of m — normalizing the blend band to ~1 pixel regardless of
  triangle size;
* gradients flow through m only: moving a vertex moves the silhouette,
  which moves alpha, which transfers radiance across the edge — the
  boundary integral term, estimated over a one-pixel band on the
  occluder side. Summed over the band, d(image)/d(edge position)
  equals the hard renderer's (c_in - c_out) x edge-length, so losses
  integrated over edge-straddling crops get the correct derivative.
* interior mesh edges (shared by adjacent coplanar-ish faces) blend
  two nearly equal shadings: bias and gradient contribution both ~0,
  so no silhouette classification pass is needed.

The smoothing perturbs the forward image only inside the one-pixel
band (alpha=1 elsewhere), so the estimator stays consistent with the
hard render as the band shrinks.

Reference parity note: the reference has no gradients at all; this is
part of the differentiable axis the TPU framework adds. Shading here is
the reference's normals-as-color mode (src/kernel.cl:395-397); the
continuation shading reuses the same rule.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from clpathtracer_tpu.core.camera import cam_matrix, generate_rays
from clpathtracer_tpu.render.integrator import RenderOptions, _surface, \
    intersect_scene
from clpathtracer_tpu.render.shading import normal_color

BIG = 3.4e38


def _shade(scene, rec, orig, dir, opts):
    """Normal-mode shading of a hit record (differentiable via the
    record's u/v and the scene's normals)."""
    _, normal, _, _ = _surface(scene, rec, orig, dir, opts)
    bg = jnp.full((orig.shape[0], 3), opts.background)
    return jnp.where(rec["hit"][:, None], normal_color(normal), bg)


def _band(m, h, w):
    """Per-pixel blend band: max |4-neighbour difference| of m, floored
    so flat regions don't blow the ratio up.

    NOT detached: the band itself moves with the scene (the m-field
    rescales as a silhouette sweeps), and a finite-difference probe of
    the smoothed render sees that motion — detaching it makes jax.grad
    disagree with FD in both sign and magnitude (measured on the
    occluder test before this was fixed). Differentiating through the
    max/abs picks the active branch, which is exactly what FD does."""
    mi = m.reshape(h, w)
    diffs = [jnp.abs(mi - jnp.roll(mi, s, axis=a))
             for a in (0, 1) for s in (1, -1)]
    g = jnp.maximum(jnp.maximum(diffs[0], diffs[1]),
                    jnp.maximum(diffs[2], diffs[3]))
    return jnp.maximum(g, 1e-4).reshape(-1)


def render_edgeaware(scene, camera, opts: RenderOptions, tree=None,
                     key=None):
    """[H, W, 3] normal-mode render whose jax.grad carries silhouette
    terms (w.r.t. scene.verts, normals and camera). Cost: two
    traversals (primary + continuation past the first hit)."""
    del key
    h, w = opts.height, opts.width
    opts_d = dataclasses.replace(opts, differentiable=True)
    cam_inv = cam_matrix(camera, h)
    orig, dir = generate_rays(cam_inv, w, h)

    rec1 = intersect_scene(scene, tree, orig, dir, opts_d)
    c1 = _shade(scene, rec1, orig, dir, opts_d)

    u, v = rec1["u"], rec1["v"]
    m = jnp.where(rec1["tri"] >= 0,
                  jnp.minimum(jnp.minimum(u, v), 1.0 - u - v), 1.0)

    # continuation ray: what the silhouette occludes. Topology and the
    # step are detached; its shading is differentiable on its own.
    sg = jax.lax.stop_gradient
    t_det = sg(rec1["t"])
    step = jnp.where(rec1["hit"], t_det * 1e-3 + opts.bounce_eps, 0.0)
    o2 = orig + (t_det + step)[:, None] * dir
    rec2 = intersect_scene(scene, tree, o2, dir, opts_d, coherent=False,
                           active=rec1["hit"])
    # lanes whose primary missed: continuation is meaningless, shade bg
    rec2 = dict(rec2)
    rec2["hit"] = rec2["hit"] & rec1["hit"]
    c2 = _shade(scene, rec2, o2, dir, opts_d)

    alpha = jnp.clip(m / _band(m, h, w), 0.0, 1.0)
    img = jnp.where(rec1["hit"][:, None],
                    alpha[:, None] * c1 + (1.0 - alpha[:, None]) * c2,
                    c1)
    return img.reshape(h, w, 3)
