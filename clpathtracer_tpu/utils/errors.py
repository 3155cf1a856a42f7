"""Error-checking harness: the reference's fail-fast layer, JAX-style.

The reference wraps every OpenCL call in HANDLE_ERR (name the error code,
print file:line, exit — src/error.c:147-154) and checks glGetError each
frame. A functional JAX renderer has no API calls to check; the failure
modes that matter are numeric (NaN/Inf radiance, negative t, degenerate
normals). This module provides:

* `checked(fn)` — wrap a jitted render/step function with
  `jax.experimental.checkify` so NaN/Inf and out-of-bounds indexing
  surface as Python errors with locations instead of silent garbage,
* `debug_nans()` — context manager enabling jax_debug_nans for a scope,
* `validate_image(img)` — host-side fail-fast assertions on a rendered
  frame (finite, non-negative), the analogue of the per-frame
  glGetError sweep (src/GLState.c:103-107).
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np
from jax.experimental import checkify


def checked(fn, errors=checkify.float_checks):
    """checkify-wrap fn; returns a callable that raises on NaN/Inf.

    Note: adds guards into the compiled program — use in tests/debug, not
    on the bench path.
    """
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scope-local jax_debug_nans (immediate NaN detection in eager/jit)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def validate_image(img, name: str = "frame") -> np.ndarray:
    """Fail fast on a bad rendered frame (host-side, post-device)."""
    a = np.asarray(img)
    if not np.isfinite(a).all():
        bad = int((~np.isfinite(a)).sum())
        raise FloatingPointError(
            f"{name}: {bad} non-finite pixel channels")
    if (a < 0).any():
        raise FloatingPointError(
            f"{name}: negative radiance (min {a.min()})")
    return a
