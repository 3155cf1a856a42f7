"""Ray reordering for bounce coherence.

Primary rays are screen-coherent by construction; bounce rays scatter.
The classic wavefront-path-tracing fix (SURVEY §5 long-context analogue:
rays are "tokens", keep lanes dense and coherent): sort the bounce
wavefront by direction octant + Morton code of the quantized origin, so
consecutive 1024-ray packets see similar geometry again. XLA sorts are
fast (~ms for 262k keys); the permutation gathers cost far less than the
packet tracer saves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _part1by2(x):
    """Spread 10 bits over 30 (Morton interleave), vectorized int32."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def ray_sort_keys(orig, dir, alive=None, bits: int = 7):
    """[N] i32 sort keys: direction octant (3 high bits) then Morton code
    of the origin quantized to 2^bits per axis. Dead rays sort to the end.
    """
    lo = jnp.min(orig, axis=0)
    ext = jnp.maximum(jnp.max(orig, axis=0) - lo, 1e-12)
    q = jnp.clip(((orig - lo) / ext) * (1 << bits), 0, (1 << bits) - 1)
    q = q.astype(jnp.int32)
    morton = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
              | (_part1by2(q[:, 2]) << 2))
    octant = ((dir[:, 0] > 0).astype(jnp.int32)
              + 2 * (dir[:, 1] > 0).astype(jnp.int32)
              + 4 * (dir[:, 2] > 0).astype(jnp.int32))
    key = (octant << 27) | (morton & 0x7FFFFFF)
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(0x7FFFFFFF))
    return key


def sort_rays(orig, dir, alive=None, bits: int = 7):
    """Returns (perm, inv_perm): apply x[perm] to reorder the wavefront
    coherently; results[inv_perm] restores the original order."""
    keys = ray_sort_keys(orig, dir, alive, bits)
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    return perm, inv
