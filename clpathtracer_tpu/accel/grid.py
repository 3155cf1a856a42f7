"""Uniform-grid accelerator for fog-like scenes (host-side numpy build).

The kd-tree (accel/sah.py — the reference's structure, src/kd_tree.c) is
the right accelerator for SURFACE meshes, where geometry density varies
by orders of magnitude. The adversarial bench soup is the opposite: 1M
*uniformly* scattered tiny triangles — the textbook case for a uniform
grid, because cell lookup is pure arithmetic (`floor((p - lo) / h)`), the
3D-DDA walk needs no per-step node-table gather and no root descent, and
occlusion/nearest queries in dense fog terminate within a handful of
cells. On the TPU that matters doubly: every kd walk step costs a wide
row gather just to learn the node's shape, while the DDA's cell advance
is vector arithmetic on state the lane already holds.

Layout mirrors ops/traverse_fast.py's conventions so the walk kernel
(ops/grid_walk.py) reuses the same quad-row Möller–Trumbore:

  cells [C, 8] f32 rows: 0 quad-row start | 1 tri count | 2:8 pad
  quads [Q, 64] f32: 4 x (v0[3], e1[3], e2[3], tri_id, pad[6])
    (accel/sah.py::pack_quads_host format; tri_id -1 = pad slot)

Triangles are binned into every cell their AABB overlaps (the grid twin
of the kd builder's straddler duplication, src/kd_tree.c:166-183); the
walk's per-cell t-window makes duplicate hits harmless exactly as the
reference's early-exit slack does for duplicated kd leaves.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from clpathtracer_tpu.accel.sah import pack_quads_host

QBLOCK = 4  # triangles per quad row (ops/traverse_fast.py)


@struct.dataclass
class UniformGrid:
    """Device-resident uniform grid (SoA, gather-friendly rows)."""

    cells: jnp.ndarray   # [C, 8] f32 (quad_start, tri_count, pad…)
    quads: jnp.ndarray   # [Q, 64] f32 quad rows (pack_quads_host)
    lo: jnp.ndarray      # [3] f32 grid AABB min
    hi: jnp.ndarray      # [3] f32 grid AABB max
    h: jnp.ndarray       # [3] f32 cell size
    res: tuple = struct.field(pytree_node=False, default=(1, 1, 1))

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.res))

    def stats(self) -> dict:
        counts = np.asarray(self.cells[:, 1])
        occupied = counts > 0
        entries = float(counts.sum())
        return {
            "res": tuple(self.res),
            "cells": int(counts.shape[0]),
            "occupied_frac": float(occupied.mean()),
            "entries": int(entries),
            "avg_tris_per_occupied_cell": float(
                entries / max(occupied.sum(), 1)),
            "max_tris_per_cell": int(counts.max(initial=0)),
            "quad_rows": int(self.quads.shape[0]),
            "mem_mb": float((self.quads.size + self.cells.size) * 4 / 1e6),
        }


def _exclusive_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.zeros_like(a)
    np.cumsum(a[:-1], out=out[1:])
    return out


def fog_likeness(tri_verts: np.ndarray, res: int = 24) -> float:
    """Cheap scene-uniformity score in [0, 1]: the fraction of coarse
    grid cells occupied by triangle centroids. Volumetric fog fills most
    of its AABB (score near 1); surface meshes sweep a 2-D sheet through
    the 3-D volume (score ~ 1/res). Used to auto-pick the per-ray
    accelerator: uniform grid for fog-like scenes, walk-tuned kd tree
    for surfaces (cli/main.py).
    """
    tv = np.asarray(tri_verts, np.float32)
    c = tv.mean(axis=1)
    lo = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - lo, 1e-6)
    cell = np.clip((c - lo) / ext * res, 0, res - 1).astype(np.int64)
    cid = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
    return float(np.unique(cid).size / res ** 3)


def build_grid(tri_verts: np.ndarray, res=None,
               density: float = 1.0) -> UniformGrid:
    """Bin triangles into a uniform grid (vectorized numpy, host-side).

    tri_verts: [F, 3, 3]. res: per-axis cell counts; default picks
    roughly `density` triangles per cell with cells as close to cubical
    as the scene AABB allows (the classic lambda-heuristic with
    lambda = 1/density).
    """
    tv = np.asarray(tri_verts, np.float32)
    f = tv.shape[0]
    assert f > 0, "empty scene"
    tmin = tv.min(axis=1)
    tmax = tv.max(axis=1)
    lo = tmin.min(axis=0)
    hi = tmax.max(axis=0)
    ext = np.maximum(hi - lo, 1e-6)
    pad = 1e-4 * ext
    lo = (lo - pad).astype(np.float32)
    hi = (hi + pad).astype(np.float32)
    ext = hi - lo

    if res is None:
        # cells ~ f / density, shaped to the AABB: r_a = ext_a * k where
        # prod(r) = f/density  =>  k = (f / (density * V))^(1/3)
        k = (f / (density * float(np.prod(ext)))) ** (1.0 / 3.0)
        res = np.maximum(1, np.minimum(
            512, np.round(ext * k))).astype(np.int64)
    res = tuple(int(r) for r in np.broadcast_to(res, (3,)))
    rx, ry, rz = res
    ncells = rx * ry * rz
    h = (ext / np.asarray(res, np.float32)).astype(np.float32)
    inv_h = 1.0 / h

    # per-tri overlapped cell ranges from the tri AABB (conservative)
    clo = np.clip(np.floor((tmin - lo) * inv_h).astype(np.int64), 0,
                  np.asarray(res) - 1)
    chi = np.clip(np.floor((tmax - lo) * inv_h).astype(np.int64), 0,
                  np.asarray(res) - 1)
    spans = chi - clo + 1                       # [F, 3]
    counts = spans.prod(axis=1)                 # [F]
    total = int(counts.sum())

    # expand to (tri, cell) entries without a python loop: entry j of
    # triangle i enumerates the span box in z-fastest order
    tid = np.repeat(np.arange(f, dtype=np.int64), counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        _exclusive_cumsum(counts), counts)
    sy = np.repeat(spans[:, 1], counts)
    sz = np.repeat(spans[:, 2], counts)
    oz = within % sz
    oy = (within // sz) % sy
    ox = within // (sz * sy)
    cx = np.repeat(clo[:, 0], counts) + ox
    cy = np.repeat(clo[:, 1], counts) + oy
    cz = np.repeat(clo[:, 2], counts) + oz
    cellid = (cx * ry + cy) * rz + cz

    order = np.argsort(cellid, kind="stable")
    cellid_s = cellid[order]
    tid_s = tid[order]

    starts = np.searchsorted(cellid_s, np.arange(ncells, dtype=np.int64))
    ccount = np.diff(np.append(starts, total))

    # pad each cell's list to a QBLOCK multiple and scatter into slots
    padded = -(-ccount // QBLOCK) * QBLOCK
    pstart = _exclusive_cumsum(padded)
    total_padded = int(padded.sum())
    assert total_padded // QBLOCK < (1 << 24), (
        f"{total_padded} grid entries overflow f32-exact quad ids — "
        "lower the grid resolution/density")
    tri_slots = np.full(total_padded, -1, np.int32)
    dest = pstart[cellid_s] + (np.arange(total, dtype=np.int64)
                               - starts[cellid_s])
    tri_slots[dest] = tid_s.astype(np.int32)

    cells = np.zeros((ncells, 8), np.float32)
    cells[:, 0] = (pstart // QBLOCK).astype(np.float32)
    cells[:, 1] = ccount.astype(np.float32)

    quads = pack_quads_host(tri_slots, tv)
    return UniformGrid(cells=jnp.asarray(cells), quads=jnp.asarray(quads),
                       lo=jnp.asarray(lo), hi=jnp.asarray(hi),
                       h=jnp.asarray(h), res=res)
