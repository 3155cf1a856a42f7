"""Hit resolution and shading building blocks.

Turns (tri id, u, v) intersection records into differentiable surface
attributes: position, interpolated normal, material. The normal rules match
the reference (src/kernel.cl:344-365): smooth vertex-normal interpolation
`normalize((1-u-v)·n0 + u·n1 + v·n2)` when the face carries normal indices,
geometric `normalize(cross(v1-v0, v2-v0))` otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp

from clpathtracer_tpu.core import vecmath as vm


def resolve_tri_hits(scene, tri: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                     allow_baked: bool = True):
    """Surface attributes for triangle hits.

    tri: [N] i32 triangle ids (-1 = miss → garbage row 0, gate on your own
    mask). Returns dict(normal [N,3], albedo [N,3], emission [N,3]).
    Fully differentiable w.r.t. scene.verts / normals / materials — the
    discrete `tri` topology is the only detached piece.

    When the scene carries baked shade rows (Scene.bake_shading) and
    allow_baked is set, everything resolves from ONE wide [N, 16] gather —
    wide row gathers run ~50x faster than the narrow per-field ones.
    """
    safe = jnp.maximum(tri, 0)
    if allow_baked and getattr(scene, "shade_rows", None) is not None:
        rows = scene.shade_rows[safe]                 # [N, 16] wide gather
        w = jnp.stack([1.0 - u - v, u, v], axis=-1)   # [N, 3]
        n = (w[:, 0:1] * rows[:, 0:3] + w[:, 1:2] * rows[:, 3:6]
             + w[:, 2:3] * rows[:, 6:9])
        return {
            "normal": vm.normalize(n, eps=1e-30),
            "albedo": rows[:, 9:12],
            "emission": rows[:, 12:15],
        }
    face = scene.faces[safe]  # [N, 3, 3]
    vidx = face[:, :, 0]
    nidx = face[:, :, 1]
    p = scene.verts[vidx]  # [N, 3(corner), 3]
    v0, v1, v2 = p[:, 0], p[:, 1], p[:, 2]
    geom_n = vm.normalize(vm.cross(v1 - v0, v2 - v0), eps=1e-30)

    # reference checks the FIRST corner's normal index (src/kernel.cl:349);
    # we require all three to be valid to avoid garbage gathers
    has_n = jnp.all(nidx >= 0, axis=-1)
    nsafe = jnp.maximum(nidx, 0)
    nrm = scene.normals[nsafe]  # [N, 3, 3]
    w = jnp.stack([1.0 - u - v, u, v], axis=-1)  # [N, 3]
    smooth_n = vm.normalize(jnp.sum(nrm * w[:, :, None], axis=1), eps=1e-30)

    normal = jnp.where(has_n[:, None], smooth_n, geom_n)
    return {
        "normal": normal,
        "albedo": scene.albedo[safe],
        "emission": scene.emission[safe],
    }


def resolve_sphere_hits(scene, sph: jnp.ndarray, point: jnp.ndarray):
    """Surface attributes for sphere hits. sph: [N] sphere ids, point: [N,3]
    hit positions."""
    safe = jnp.maximum(sph, 0)
    center = scene.sphere_pos[safe]
    normal = vm.normalize(point - center, eps=1e-30)
    return {
        "normal": normal,
        "albedo": scene.sphere_albedo[safe],
        "emission": scene.sphere_emission[safe],
    }


def normal_color(normal: jnp.ndarray) -> jnp.ndarray:
    """The reference's normals-as-color visualization (src/kernel.cl:396)."""
    return (normal + 1.0) / 2.0


def cosine_sample_hemisphere(normal: jnp.ndarray, u1: jnp.ndarray,
                             u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted direction about `normal`. u1,u2: [N] uniforms."""
    r = jnp.sqrt(u1)
    theta = 2.0 * jnp.pi * u2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    # orthonormal basis about normal (branchless Frisvad-style)
    s = jnp.where(normal[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + normal[..., 2])
    b = normal[..., 0] * normal[..., 1] * a
    t1 = jnp.stack([1.0 + s * normal[..., 0] ** 2 * a, s * b,
                    -s * normal[..., 0]], axis=-1)
    t2 = jnp.stack([b, s + normal[..., 1] ** 2 * a, -normal[..., 1]], axis=-1)
    return vm.normalize(
        x[..., None] * t1 + y[..., None] * t2 + z[..., None] * normal,
        eps=1e-30)
