"""Elastic frame submission: chunked rendering with per-chunk retry.

The reference's failure policy is uniformly print-and-exit — every OpenCL
error terminates the process (src/error.c:147-154), so a transient device
fault costs the whole frame and the session. For multi-host renders the
SURVEY §5 failure-detection row calls for the opposite: detect the lost
work, resubmit it, keep the partial results.

This module splits a frame into independent row-chunk programs. Each chunk
submission that raises (device error, host loss surfacing as a failed
execute) or returns non-finite pixels is resubmitted, up to `max_retries`
per chunk; chunks that exhaust retries are filled with `fill_value` and
reported, so one bad region degrades instead of killing the frame. The
good chunks' results are never recomputed.

A `fault_hook(chunk_idx, attempt)` injection point lets tests simulate
host loss deterministically (tests/test_elastic.py).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from clpathtracer_tpu.core.camera import cam_matrix, generate_rays
from clpathtracer_tpu.render.integrator import RenderOptions, render_rays


class ChunkReport(dict):
    """attempts per chunk + list of chunks that exhausted retries."""


def render_frame_chunked(scene, camera, opts: RenderOptions, tree=None,
                         key=None, row_chunks: int = 4,
                         max_retries: int = 2, fill_value: float = 0.0,
                         fault_hook=None):
    """Render [H, W, 3] as `row_chunks` independent submissions.

    Returns (image, ChunkReport). Identical pixels to render_image for
    chunk counts that divide the height (each chunk re-runs the same pure
    function on its row slice; normal/mirror modes are deterministic, path
    mode folds the chunk index into the key so retries are reproducible).
    """
    h, w = opts.height, opts.width
    assert h % row_chunks == 0, (h, row_chunks)
    rows = h // row_chunks
    cam_inv = cam_matrix(camera, h)
    orig, dir = generate_rays(cam_inv, w, h)  # [H*W, 3]

    @partial(jax.jit, static_argnames=())
    def chunk_fn(scene, tree, o, d, k):
        img = render_rays(scene, tree, o, d, opts, k)
        return img.reshape(rows, w, 3)

    out = np.empty((h, w, 3), np.float32)
    report = ChunkReport(attempts={}, failed=[])
    for c in range(row_chunks):
        sl = slice(c * rows * w, (c + 1) * rows * w)
        ck = (None if key is None
              else jax.random.fold_in(key, c))
        done = False
        for attempt in range(max_retries + 1):
            report["attempts"][c] = attempt + 1
            try:
                if fault_hook is not None:
                    fault_hook(c, attempt)
                img = np.asarray(chunk_fn(scene, tree, orig[sl], dir[sl],
                                          ck))
                if not np.isfinite(img).all():
                    raise FloatingPointError(
                        f"chunk {c}: non-finite pixels")
                out[c * rows:(c + 1) * rows] = img
                done = True
                break
            except Exception as e:  # resubmit (reference would exit here)
                print(f"warning: chunk {c} attempt {attempt + 1} failed: "
                      f"{e}", file=sys.stderr)
        if not done:
            out[c * rows:(c + 1) * rows] = fill_value
            report["failed"].append(c)
    return jnp.asarray(out), report
