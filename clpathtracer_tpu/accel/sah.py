"""SAH kd-tree builder with ropes — host-side, vectorized numpy.

Re-implements the reference's acceleration structure as data-parallel numpy
(the reference builds it with scalar C loops, src/kd_tree.c:94-200):

* binned SAH over 25 uniform candidate planes per axis
  (NBINS, src/kd_tree.c:9,118-120),
* the reference's *area-augmented* cost variant: each side's surface area
  term also accumulates member triangle areas (src/kd_tree.c:138-145),
* straddling triangles duplicated into both children (src/kd_tree.c:166-183),
* leaves at ≤ `leaf_size` triangles or depth exhaustion
  (DEPTH=15, src/kd_tree.c:8,97) or degenerate split (src/kd_tree.c:158),
* post-pass rope construction: 6 neighbor links per leaf, pushed down the
  neighbor subtree while provably non-straddling
  (add_ropes / optimize_rope, src/kd_tree.c:43-83).

Output is a `FlatKdTree` of flat SoA arrays — already the device layout
(the reference's packed 68-byte kdnode, include/kd_tree.h:31-50, exploded
into columns so the TPU can gather each field as a dense vector). Node
order is preorder (split, left subtree, right subtree), matching the
reference's append order (src/kd_tree.c:187-199), so node 0 is the root.

Defaults match the reference; `max_depth`/`leaf_size` are configurable
because DEPTH=15 produces pathologically fat leaves at 1M triangles.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from flax import struct

NBINS = 25          # candidate planes per axis (src/kd_tree.c:9)
DEFAULT_DEPTH = 15  # reference DEPTH (src/kd_tree.c:8)
EPS = 1e-9          # reference EPS (src/kd_tree.c:10)


@struct.dataclass
class FlatKdTree:
    """Device-resident kd-tree as SoA columns.

    For split nodes child_lo/child_hi are node indices; for leaves
    leaf_start/leaf_count index into tri_indices and ropes[6] are the
    per-face neighbor links (-1 = exit the tree), face order
    (L, R, D, U, B, F) = (-x, +x, -y, +y, -z, +z) as in the reference's
    KD_SIDE enum (src/kernel.cl:39-46).
    """

    node_min: jnp.ndarray     # [N, 3] f32
    node_max: jnp.ndarray     # [N, 3] f32
    is_leaf: jnp.ndarray      # [N] bool
    split_axis: jnp.ndarray   # [N] i32 (0 for leaves)
    split_value: jnp.ndarray  # [N] f32
    child_lo: jnp.ndarray     # [N] i32
    child_hi: jnp.ndarray     # [N] i32
    leaf_start: jnp.ndarray   # [N] i32
    leaf_count: jnp.ndarray   # [N] i32
    ropes: jnp.ndarray        # [N, 6] i32
    tri_indices: jnp.ndarray  # [T] i32 (concatenated leaf lists; -1 = pad)
    node_table: jnp.ndarray = None  # [N, 24] f32 gather-packed mirror of
    #   the columns above (ops/traverse_fast.py); present when the tree was
    #   built with tri_block=4
    quads: jnp.ndarray = None  # [T/4, 64] f32 pre-packed leaf triangle
    #   rows (v0, e1, e2, tri_id x4) baked at build time from the build
    #   vertices — saves a 3x full-scene gather per frame; the
    #   differentiable path ignores it and re-packs from live verts
    wide_table: jnp.ndarray = None  # [S, 128] f32 8-wide supernode rows
    #   (accel/wide.py) for the wide packet kernel; built for leaf_size>=8
    chunk_start: jnp.ndarray = None  # [N] i32 per-node index of the first
    #   leaf-DMA-window AABB in chunk_bnd (0 for split nodes); lets the
    #   stream packet kernel cull whole triangle chunks against the packet
    #   interval before intersecting them
    chunk_bnd: jnp.ndarray = None  # [ceil(W/16), 128] f32 per-DMA-window
    #   AABBs, 16 windows per 128-lane row (8 lanes each: lo xyz, hi xyz,
    #   pad 2); windows follow ops/packet.py stream_leaf's exact clamped
    #   CHUNK_ROWS grid, so bounds conservatively cover window overhang
    #   into neighboring leaves
    so_base: jnp.ndarray = None  # [4, R, 128] f32 affine shared-origin
    #   tables (ops/packet.py::so_affine_tables); attach_so_tables adds
    #   them so the packet engines' per-frame SO row preparation is one
    #   fused elementwise combine instead of a full cross-product pass
    mwin: "object" = None  # optional ops/plist.py::MortonWindows — the
    #   walk-free prepass-list engine's global-Morton window structure;
    #   attach_morton_windows adds it, and the integrator prefers it for
    #   unjittered shared-origin primary frames
    grid: "object" = None  # optional accel/grid.py::UniformGrid — the
    #   fog-scene accelerator (attach_grid). The DDA walk (ops/
    #   grid_walk.py) needs no root descent and no node-row gather, so
    #   for uniformly dense scenes it beats the kd rope walk on per-ray
    #   queries; _occluded prefers it over `shadow` when present.
    walk128: jnp.ndarray = None  # optional [N + S, 128] f32 fused walk
    #   rows (ops/traverse_fast.py::build_walk_table): node meta + first
    #   leaf quad row per row, 8-tri spill rows — one gather per walk
    #   step instead of two. Baked from build-time quads; traverse_fast
    #   engages it only when called with tree.quads itself.
    shadow: "object" = None  # optional second FlatKdTree tuned for the
    #   per-ray occlusion walk (attach_shadow_tree). The packet/plist
    #   optimum is very fat leaves, but the t_max rope walk tests 4 tris
    #   per step, so a fat-leaf tree wastes ~leaf/2 quad steps inside the
    #   first occupied leaf; a walk-tuned tree (leaf ~64) with any_hit
    #   measured 3.9x on the fog shadow wave (probe_shadow_wave.py).
    #   Used by render/integrator.py::_occluded when present.
    max_leaf_tris: int = struct.field(pytree_node=False, default=None)
    #   static: the largest leaf's triangle count, known at build/load
    #   time. The SMEM node layout packs a leaf's DMA-window count in 6
    #   bits; ops/packet.py _smem_fits uses this to REFUSE the SMEM
    #   kernels (fall back to VMEM tables) for trees whose leaves exceed
    #   63 windows instead of silently dropping triangles (ADVICE r2).
    #   None (e.g. a hand-built tree) conservatively disables SMEM.
    chunk_rows: int = struct.field(pytree_node=False, default=None)
    #   static: the ops/packet.py CHUNK_ROWS value chunk_start/chunk_bnd
    #   were computed under. traverse_packet drops the cull tables when
    #   it differs from the current process's CHUNK_ROWS (the window
    #   grids would disagree — wrong culls, not just slow ones).

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    def stats(self) -> dict:
        """Tree-quality stats (the reference printf, src/kd_tree.c:232-235)."""
        is_leaf = np.asarray(self.is_leaf)
        counts = np.asarray(self.leaf_count)[is_leaf]
        leaves = int(is_leaf.sum())
        leaf_tris = int(counts.sum())
        return {
            "leaf_tris": leaf_tris,
            "leaves": leaves,
            "avg_tris_per_leaf": leaf_tris / max(leaves, 1),
            "max_tris_per_leaf": int(counts.max()) if leaves else 0,
            "nodes": self.num_nodes,
        }


@dataclasses.dataclass
class _Builder:
    """Mutable build state (host-side numpy, converted to jnp at the end)."""

    node_min: list
    node_max: list
    is_leaf: list
    split_axis: list
    split_value: list
    child_lo: list
    child_hi: list
    leaf_start: list
    leaf_count: list
    tri_indices: list
    leaf_size: int
    vmin_c: np.ndarray  # [F, 3] per-tri min corner, per axis
    vmax_c: np.ndarray  # [F, 3] per-tri max corner, per axis
    area: np.ndarray    # [F] triangle surface areas

    def add_leaf(self, tri_ids: np.ndarray, lo, hi) -> int:
        idx = len(self.node_min)
        self.node_min.append(lo)
        self.node_max.append(hi)
        self.is_leaf.append(True)
        self.split_axis.append(0)
        self.split_value.append(0.0)
        self.child_lo.append(-1)
        self.child_hi.append(-1)
        self.leaf_start.append(len(self.tri_indices))
        self.leaf_count.append(len(tri_ids))
        self.tri_indices.extend(int(t) for t in tri_ids)
        return idx

    def add_split(self, lo, hi, value, axis) -> int:
        idx = len(self.node_min)
        self.node_min.append(lo)
        self.node_max.append(hi)
        self.is_leaf.append(False)
        self.split_axis.append(int(axis))
        self.split_value.append(float(value))
        self.child_lo.append(-1)
        self.child_hi.append(-1)
        self.leaf_start.append(0)
        self.leaf_count.append(0)
        return idx


def _best_plane(b: _Builder, tri_ids: np.ndarray, lo: np.ndarray,
                hi: np.ndarray):
    """Vectorized SAH sweep: 3 axes x NBINS planes at once.

    Cost per plane = NL*SL + NR*SR where SL/SR are the child box surface
    areas *plus* the summed areas of the triangles assigned to that side —
    the reference's nonstandard augmentation (src/kd_tree.c:121-145).
    Returns (axis, value) or None if no valid plane exists.
    """
    ext = hi - lo
    vmin = b.vmin_c[tri_ids]  # [n, 3]
    vmax = b.vmax_c[tri_ids]  # [n, 3]
    sa = b.area[tri_ids]      # [n]

    best = None  # (cost, axis, value)
    d = (np.arange(NBINS, dtype=np.float64) + 1.0) / (NBINS + 1.0)  # [B]
    for axis in range(3):
        e = ext[axis]
        if e < EPS:
            continue
        a1, a2 = (axis + 1) % 3, (axis + 2) % 3
        v = lo[axis] + d * e  # [B]
        base = ext[a1] * ext[a2]
        perim = ext[a1] + ext[a2]
        sl_box = 2.0 * (base + e * d * perim)          # [B]
        sr_box = 2.0 * (base + e * (1.0 - d) * perim)  # [B]

        is_l = vmin[:, axis][:, None] <= v[None, :]  # [n, B]
        is_r = vmax[:, axis][:, None] >= v[None, :]
        nl = is_l.sum(0)
        nr = is_r.sum(0)
        sl = sl_box + sa @ is_l
        sr = sr_box + sa @ is_r
        cost = nl * sl + nr * sr  # [B]

        k = int(np.argmin(cost))
        if best is None or cost[k] < best[0]:
            best = (cost[k], axis, float(v[k]))

    if best is None:
        return None
    cost, axis, value = best
    # degenerate-split guard (src/kd_tree.c:158)
    if value <= lo[axis] or hi[axis] <= value:
        return None
    # leaf-cost termination (NOT in the reference, which splits to depth
    # exhaustion and duplicates straddlers ~5x on big scenes): keep the
    # node a leaf when splitting isn't cheaper, in the same area-augmented
    # cost family: C_leaf = N * (S_box + sum tri areas).
    s_box = 2.0 * (ext[0] * ext[1] + ext[1] * ext[2] + ext[2] * ext[0])
    if cost >= len(tri_ids) * (s_box + sa.sum()):
        return None
    return axis, value


def _build_recursive(b: _Builder, tri_ids: np.ndarray, lo: np.ndarray,
                     hi: np.ndarray, depth: int) -> int:
    if len(tri_ids) <= b.leaf_size or depth == 0:
        return b.add_leaf(tri_ids, lo, hi)

    plane = _best_plane(b, tri_ids, lo, hi)
    if plane is None:
        return b.add_leaf(tri_ids, lo, hi)
    axis, value = plane

    # duplicate-into-both partition with EPS slack (src/kd_tree.c:166-183)
    vmin = b.vmin_c[tri_ids][:, axis]
    vmax = b.vmax_c[tri_ids][:, axis]
    l_ids = tri_ids[vmin <= value + EPS]
    r_ids = tri_ids[vmax >= value - EPS]
    if len(l_ids) == len(tri_ids) and len(r_ids) == len(tri_ids):
        # split separates nothing — every triangle straddles; stop here
        return b.add_leaf(tri_ids, lo, hi)

    l_hi = hi.copy(); l_hi[axis] = value
    r_lo = lo.copy(); r_lo[axis] = value

    idx = b.add_split(lo, hi, value, axis)
    l_index = _build_recursive(b, l_ids, lo, l_hi, depth - 1)
    r_index = _build_recursive(b, r_ids, r_lo, hi, depth - 1)
    b.child_lo[idx] = l_index
    b.child_hi[idx] = r_index
    return idx


def _optimize_rope(rope: int, node_lo, node_hi, axis_arr, value_arr,
                   is_leaf_arr, cl_arr, ch_arr, face: int) -> int:
    """Push a rope down its subtree while it can't straddle the face
    (reference optimize_rope, src/kd_tree.c:43-62)."""
    if rope == -1:
        return -1
    while not is_leaf_arr[rope]:
        ax = axis_arr[rope]
        if face // 2 == ax:
            break
        value = value_arr[rope]
        if value >= node_hi[ax]:
            rope = cl_arr[rope]
        elif value <= node_lo[ax]:
            rope = ch_arr[rope]
        else:
            break
    return rope


def _add_ropes(b_arrays: dict) -> np.ndarray:
    """Attach 6 neighbor links to every leaf (reference add_ropes,
    src/kd_tree.c:64-83). Iterative preorder walk with an explicit stack."""
    n = len(b_arrays["is_leaf"])
    is_leaf = b_arrays["is_leaf"]
    axis_arr = b_arrays["split_axis"]
    value_arr = b_arrays["split_value"]
    cl = b_arrays["child_lo"]
    ch = b_arrays["child_hi"]
    nmin = b_arrays["node_min"]
    nmax = b_arrays["node_max"]

    ropes_out = np.full((n, 6), -1, np.int32)
    stack = [(0, [-1] * 6)]
    while stack:
        index, ropes = stack.pop()
        if is_leaf[index]:
            ropes_out[index] = ropes
            continue
        opt = [
            _optimize_rope(ropes[f], nmin[index], nmax[index], axis_arr,
                           value_arr, is_leaf, cl, ch, f)
            for f in range(6)
        ]
        ax = axis_arr[index]
        ropes0 = list(opt)
        ropes0[2 * ax + 1] = ch[index]  # left child's +axis face → right child
        ropes1 = list(opt)
        ropes1[2 * ax] = cl[index]      # right child's -axis face → left child
        stack.append((ch[index], ropes1))
        stack.append((cl[index], ropes0))
    return ropes_out


def pack_quads_host(tri_indices: np.ndarray,
                    tri_verts: np.ndarray) -> np.ndarray:
    """Host-side quad-row packing (numpy twin of traverse_fast.pack_quads):
    [T/4, 64] rows of 4 x (v0, e1, e2, tri_id, pad)."""
    idx = np.asarray(tri_indices)
    safe = np.maximum(idx, 0)
    tv = np.asarray(tri_verts, np.float32)
    a = tv[safe, 0]
    e1 = tv[safe, 1] - a
    e2 = tv[safe, 2] - a
    rows16 = np.zeros((idx.shape[0], 16), np.float32)
    rows16[:, 0:3] = a
    rows16[:, 3:6] = e1
    rows16[:, 6:9] = e2
    rows16[:, 9] = idx.astype(np.float32)
    return rows16.reshape(-1, 64)


def tree_from_node_table(table: np.ndarray, tri_indices: np.ndarray,
                         tri_verts: np.ndarray = None) -> FlatKdTree:
    """Reconstruct the full column layout from a packed [M, 24] node table
    (the native builder's output; inverse of traverse_fast.pack_node_table).
    """
    # node/tri ids ride the table as f32: enforce the same exactness guard
    # the Python packer applies (pack_node_table) — the native path must
    # fail loudly, not round ids silently (ADVICE r1)
    m = table.shape[0]
    assert m < (1 << 24), f"{m} nodes overflows f32-exact int range"
    assert tri_indices.shape[0] < (1 << 24), (
        f"{tri_indices.shape[0]} tri slots overflows f32-exact int range")
    flags = table[:, 7].astype(np.int32)
    is_leaf = flags >= 4
    leaf_start = table[:, 10].astype(np.int32) * 4
    leaf_count = table[:, 11].astype(np.int32)
    if tri_verts is not None:
        # within-leaf Morton order → compact DMA windows for chunk culling
        tri_indices = sort_leaf_tris_spatial(
            tri_indices, leaf_start, leaf_count, is_leaf,
            table[:, 0:3], table[:, 3:6],
            np.asarray(tri_verts, np.float64).mean(axis=1))
    tree = FlatKdTree(
        node_min=jnp.asarray(table[:, 0:3]),
        node_max=jnp.asarray(table[:, 3:6]),
        is_leaf=jnp.asarray(is_leaf),
        split_axis=jnp.asarray(flags & 3),
        split_value=jnp.asarray(table[:, 6]),
        child_lo=jnp.asarray(table[:, 8].astype(np.int32)),
        child_hi=jnp.asarray(table[:, 9].astype(np.int32)),
        leaf_start=jnp.asarray(leaf_start),
        leaf_count=jnp.asarray(leaf_count),
        ropes=jnp.asarray(table[:, 12:18].astype(np.int32)),
        tri_indices=jnp.asarray(tri_indices),
        node_table=jnp.asarray(table),
        quads=(jnp.asarray(pack_quads_host(tri_indices, tri_verts))
               if tri_verts is not None else None),
        max_leaf_tris=int(leaf_count.max(initial=0)),
    )
    if tree.quads is not None:
        tree = attach_chunk_info(tree)
    return tree


def build_kd_tree(tri_verts: np.ndarray, max_depth: int = DEFAULT_DEPTH,
                  leaf_size: int = 1, tri_block: int = 1,
                  backend: str = "auto") -> FlatKdTree:
    """Build the SAH kd-tree with ropes.

    tri_verts: [F, 3, 3] f32 triangle corner positions (host numpy).
    max_depth: recursion cap (reference DEPTH=15).
    leaf_size: stop splitting at ≤ this many triangles (reference: 1).
    tri_block: pad each leaf's triangle list to a multiple of this with -1
      sentinels — lets the device intersector test fixed-size blocks with
      no tail logic. 1 = reference-exact compact layout.
    backend: "auto" (native C++ when available for tri_block=4, else
      numpy), "native", or "python".

    Mirrors build_kd's precompute (src/kd_tree.c:212-228): per-triangle
    area = |cross(B-A, C-A)| / 2 and the world AABB from vertex extremes.
    """
    if backend in ("auto", "native") and tri_block == 4:
        from clpathtracer_tpu.accel import native
        try:
            table, tri_indices = native.build_kd_native(
                np.asarray(tri_verts, np.float32), max_depth,
                max(1, leaf_size), tri_block)
            tree = tree_from_node_table(table, tri_indices,
                                        tri_verts=tri_verts)
            if leaf_size >= 8:
                from clpathtracer_tpu.accel.wide import build_wide_table
                tree = tree.replace(
                    wide_table=jnp.asarray(build_wide_table(tree)))
            return tree
        except native.NativeBuildError:
            if backend == "native":
                raise
    tri_verts = np.asarray(tri_verts, np.float64)
    assert tri_verts.ndim == 3 and tri_verts.shape[1:] == (3, 3), tri_verts.shape
    nf = tri_verts.shape[0]

    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    vmin_c = tri_verts.min(axis=1)
    vmax_c = tri_verts.max(axis=1)
    lo = vmin_c.min(axis=0)
    hi = vmax_c.max(axis=0)

    b = _Builder(
        node_min=[], node_max=[], is_leaf=[], split_axis=[], split_value=[],
        child_lo=[], child_hi=[], leaf_start=[], leaf_count=[],
        tri_indices=[], leaf_size=max(1, leaf_size),
        vmin_c=vmin_c, vmax_c=vmax_c, area=area,
    )
    _build_recursive(b, np.arange(nf, dtype=np.int64), lo.copy(), hi.copy(),
                     max_depth)

    arrays = {
        "node_min": np.asarray(b.node_min, np.float32),
        "node_max": np.asarray(b.node_max, np.float32),
        "is_leaf": np.asarray(b.is_leaf, bool),
        "split_axis": np.asarray(b.split_axis, np.int32),
        "split_value": np.asarray(b.split_value, np.float32),
        "child_lo": np.asarray(b.child_lo, np.int32),
        "child_hi": np.asarray(b.child_hi, np.int32),
        "leaf_start": np.asarray(b.leaf_start, np.int32),
        "leaf_count": np.asarray(b.leaf_count, np.int32),
    }
    arrays["ropes"] = _add_ropes(arrays)
    tri_indices = np.asarray(b.tri_indices, np.int32)

    if tri_block > 1:
        tri_indices, arrays = _pad_leaves(tri_indices, arrays, tri_block)

    node_table = None
    quads = None
    if tri_block == 4:
        from clpathtracer_tpu.ops.traverse_fast import pack_node_table
        node_table = jnp.asarray(pack_node_table(arrays))
        tri_indices = sort_leaf_tris_spatial(
            tri_indices, arrays["leaf_start"], arrays["leaf_count"],
            arrays["is_leaf"], arrays["node_min"], arrays["node_max"],
            tri_verts.mean(axis=1))
        quads = jnp.asarray(pack_quads_host(tri_indices, tri_verts))

    tree = FlatKdTree(
        node_table=node_table,
        quads=quads,
        node_min=jnp.asarray(arrays["node_min"]),
        node_max=jnp.asarray(arrays["node_max"]),
        is_leaf=jnp.asarray(arrays["is_leaf"]),
        split_axis=jnp.asarray(arrays["split_axis"]),
        split_value=jnp.asarray(arrays["split_value"]),
        child_lo=jnp.asarray(arrays["child_lo"]),
        child_hi=jnp.asarray(arrays["child_hi"]),
        leaf_start=jnp.asarray(arrays["leaf_start"]),
        leaf_count=jnp.asarray(arrays["leaf_count"]),
        ropes=jnp.asarray(arrays["ropes"]),
        tri_indices=jnp.asarray(tri_indices),
        max_leaf_tris=int(np.asarray(arrays["leaf_count"]).max(initial=0)),
    )
    if tri_block == 4 and leaf_size >= 8:
        from clpathtracer_tpu.accel.wide import build_wide_table
        tree = tree.replace(wide_table=jnp.asarray(build_wide_table(tree)))
    if tree.quads is not None:
        tree = attach_chunk_info(tree)
    return tree


def _pad_leaves(tri_indices: np.ndarray, arrays: dict, block: int):
    """Re-lay leaf triangle lists padded to multiples of `block` with -1."""
    is_leaf = arrays["is_leaf"]
    starts = arrays["leaf_start"]
    counts = arrays["leaf_count"]
    new_indices = []
    new_starts = starts.copy()
    for i in np.flatnonzero(is_leaf):
        s, c = int(starts[i]), int(counts[i])
        new_starts[i] = len(new_indices)
        seg = list(tri_indices[s:s + c])
        pad = (-c) % block
        seg += [-1] * pad
        new_indices.extend(seg)
    arrays = dict(arrays)
    arrays["leaf_start"] = new_starts.astype(np.int32)
    return np.asarray(new_indices, np.int32), arrays


# ---------------------------------------------------------------------------
# stream-kernel chunk culling: within-leaf spatial sort + DMA-window bounds
# ---------------------------------------------------------------------------


def _morton10(q: np.ndarray) -> np.ndarray:
    """Interleave 3x10-bit ints [K, 3] into 30-bit Morton codes."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def sort_leaf_tris_spatial(tri_indices: np.ndarray, leaf_start: np.ndarray,
                           leaf_count: np.ndarray, is_leaf: np.ndarray,
                           node_min: np.ndarray, node_max: np.ndarray,
                           centroids: np.ndarray) -> np.ndarray:
    """Reorder each leaf's triangle list by Morton code of the triangle
    centroid within the leaf's AABB, keeping -1 pad slots at the segment
    tail. Consecutive DMA windows of a leaf then cover spatially compact
    sub-volumes, which is what makes per-window AABBs (chunk_bounds_host)
    tight enough for the packet kernel to cull. Changes only the order
    within leaves — exact-t tie winners may shift (documented freedom) —
    and only in leaves spanning more than one DMA window (smaller leaves
    gain nothing from the sort, so they keep build order and the golden
    tie-break parity with the brute-force oracle).
    """
    idx = np.asarray(tri_indices)
    t = idx.shape[0]
    if t == 0:
        return idx
    from clpathtracer_tpu.ops.packet import CHUNK_ROWS
    # per-slot owning leaf (segments are contiguous in node preorder)
    leaves = np.flatnonzero(np.asarray(is_leaf))
    starts = np.asarray(leaf_start)[leaves]
    order = np.argsort(starts, kind="stable")
    leaves, starts = leaves[order], starts[order]
    seg_of_slot = np.searchsorted(starts, np.arange(t), side="right") - 1
    lo = np.asarray(node_min)[leaves][seg_of_slot]
    hi = np.asarray(node_max)[leaves][seg_of_slot]
    pad = idx < 0
    c = centroids[np.maximum(idx, 0)]
    ext = np.maximum(hi - lo, 1e-30)
    q = np.clip(((c - lo) / ext) * 1023.0, 0.0, 1023.0).astype(np.uint32)
    key = _morton10(q)
    key[pad] = np.uint64(0xFFFFFFFFFFFFFFFF)  # pads stay at the tail
    # single-window leaves: preserve build order (slot index as key)
    counts = np.asarray(leaf_count)[leaves][seg_of_slot]
    small = counts <= CHUNK_ROWS * 8
    key[small] = np.arange(t, dtype=np.uint64)[small]
    perm = np.lexsort((key, seg_of_slot))
    return idx[perm]


def chunk_bounds_host(tri_indices: np.ndarray, leaf_start: np.ndarray,
                      leaf_count: np.ndarray, is_leaf: np.ndarray,
                      vmin_c: np.ndarray, vmax_c: np.ndarray,
                      chunk_rows: int):
    """Per-node chunk_start [N] i32 and packed per-window AABBs
    [ceil(W/16), 128] f32 for the stream kernel's leaf-DMA windows.

    Replicates ops/packet.py stream_leaf's window grid EXACTLY (row0 =
    first_tri//8, windows of `chunk_rows` quad-rows, clamped at the padded
    table end), so window b of leaf L is rows
    [min(row0 + b*chunk_rows, n_rows - chunk_rows), +chunk_rows). Bounds
    cover every real triangle in the window — including overhang into
    neighboring leaves — making the cull conservative. Empty windows get
    inverted boxes (+BIG/-BIG) and always cull.
    """
    idx = np.asarray(tri_indices)
    n_nodes = np.asarray(leaf_start).shape[0]
    t = idx.shape[0]
    # padded DMA table size (ops/packet.py _pad_rows8)
    target = max((t + 7) // 8 * 8, chunk_rows * 8)
    n_rows = target // 8
    # per-slot AABB (pad slots inverted-empty)
    big = np.float32(3.4e38)
    slot_lo = np.full((target, 3), big, np.float32)
    slot_hi = np.full((target, 3), -big, np.float32)
    real = idx >= 0
    slot_lo[:t][real] = vmin_c[idx[real]].astype(np.float32)
    slot_hi[:t][real] = vmax_c[idx[real]].astype(np.float32)

    starts = np.asarray(leaf_start).astype(np.int64)
    counts = np.asarray(leaf_count).astype(np.int64)
    leaf_mask = np.asarray(is_leaf)
    row0 = starts // 8
    row_end = (starts + counts + 7) // 8
    nchunks = np.where(leaf_mask & (counts > 0),
                       (row_end - row0 + chunk_rows - 1) // chunk_rows, 0)
    chunk_start = np.zeros(n_nodes, np.int64)
    chunk_start[1:] = np.cumsum(nchunks)[:-1]
    w_total = int(nchunks.sum())
    assert w_total < (1 << 24), f"{w_total} chunk windows overflow f32 ids"

    # window -> clamped first row
    win_leaf = np.repeat(np.arange(n_nodes), nchunks)
    win_b = np.arange(w_total) - chunk_start[win_leaf]
    win_r0 = np.minimum(row0[win_leaf] + win_b * chunk_rows,
                        n_rows - chunk_rows)
    # reduce slot AABBs over each window's chunk_rows*8 slots
    span = chunk_rows * 8
    sl = win_r0[:, None] * 8 + np.arange(span)[None, :]
    w_lo = slot_lo[sl].min(axis=1)          # [W, 3]
    w_hi = slot_hi[sl].max(axis=1)

    w_pad = (-w_total) % 16
    bnd = np.zeros((w_total + w_pad, 8), np.float32)
    bnd[:, 0:3] = big
    bnd[:, 3:6] = -big
    bnd[:w_total, 0:3] = w_lo
    bnd[:w_total, 3:6] = w_hi
    return (chunk_start.astype(np.int32), bnd.reshape(-1, 128))


def attach_chunk_info(tree: FlatKdTree) -> FlatKdTree:
    """Compute + attach chunk_start/chunk_bnd for the stream packet
    kernel's chunk culling. Host-side; requires quads (tri_block=4).
    Window grid granularity comes from ops/packet.py CHUNK_ROWS at call
    time — trees cache it via the build-params record (scene/cache.py)."""
    if tree.quads is None:
        return tree
    from clpathtracer_tpu.ops.packet import CHUNK_ROWS
    rows16 = np.asarray(tree.quads).reshape(-1, 16)
    idx = rows16[:, 9].astype(np.int64)  # tri id lane (-1 = pad)
    v0 = rows16[:, 0:3]
    p1 = v0 + rows16[:, 3:6]
    p2 = v0 + rows16[:, 6:9]
    vmin = np.minimum(np.minimum(v0, p1), p2)
    vmax = np.maximum(np.maximum(v0, p1), p2)
    # chunk_bounds_host indexes per-TRI extremes by tri id; here bounds are
    # already per-slot, so feed an identity id list for real slots
    slot_ids = np.where(idx >= 0, np.arange(idx.shape[0]), -1)
    # the SMEM node layout packs a leaf's window count in 6 bits
    # (ops/packet.py _smem_nodes); enforce the bound where values are
    # still concrete
    max_leaf = int(np.asarray(tree.leaf_count).max(initial=0))
    assert max_leaf <= 63 * CHUNK_ROWS * 8, (
        f"leaf of {max_leaf} tris exceeds the 63-window SMEM packing "
        f"(CHUNK_ROWS={CHUNK_ROWS})")
    cs, bnd = chunk_bounds_host(
        slot_ids, np.asarray(tree.leaf_start), np.asarray(tree.leaf_count),
        np.asarray(tree.is_leaf), vmin, vmax, CHUNK_ROWS)
    return tree.replace(chunk_start=jnp.asarray(cs),
                        chunk_bnd=jnp.asarray(bnd),
                        chunk_rows=CHUNK_ROWS)


def attach_so_tables(tree: FlatKdTree) -> FlatKdTree:
    """Compute + attach the affine shared-origin tables
    (ops/packet.py::so_affine_tables) so traverse_packet's SO path costs
    one fused elementwise combine per frame instead of a full per-frame
    cross-product pass (measured 30.7 ms at 1M tris). Computed ON the
    device holding tree.quads (jitted — eager ops on a tunneled TPU
    round-trip the network), so call AFTER device_put of the tree.
    Requires quads (tri_block=4); no-op otherwise. Adds 4x the quad
    bytes of device memory."""
    if tree.quads is None:
        return tree
    import jax
    from clpathtracer_tpu.ops.packet import so_affine_tables
    return tree.replace(so_base=jax.jit(so_affine_tables)(tree.quads))


def attach_morton_windows(tree: FlatKdTree, tri_verts: np.ndarray,
                          win_rows: int = None,
                          with_so: bool = False,
                          shade_rows=None,
                          order: str = None) -> FlatKdTree:
    """Attach the plist engine's global-Morton window structure
    (ops/plist.py). Host-side numpy build like the kd build itself;
    with_so additionally bakes the affine shared-origin tables ON the
    current device (call after device_put, like attach_so_tables);
    shade_rows (the scene's baked [T, 16] shade table) additionally
    bakes fused resolve rows so winner resolution + shading cost ONE
    row gather per wave instead of two (ops/plist.py::attach_resolve).
    Adds ~1x (plus 4x with SO tables, plus 2x with resolve rows) of the
    quad bytes."""
    from clpathtracer_tpu.ops.plist import (attach_resolve, attach_so,
                                            build_morton_windows)
    mwin = build_morton_windows(np.asarray(tri_verts, np.float32),
                                win_rows=win_rows, order=order)
    if with_so or shade_rows is not None:
        import jax
        dev = None
        if tree.quads is not None:
            devs = getattr(tree.quads, "devices", lambda: None)()
            dev = next(iter(devs)) if devs else None
        if dev is not None:
            mwin = jax.device_put(mwin, dev)
        if with_so:
            mwin = attach_so(mwin)
        if shade_rows is not None:
            mwin = attach_resolve(mwin, shade_rows)
    return tree.replace(mwin=mwin)


def attach_shadow_tree(tree: FlatKdTree, tri_verts: np.ndarray,
                       leaf_size: int = 16,
                       max_depth: int = 26) -> FlatKdTree:
    """Attach a second kd-tree tuned for the per-ray occlusion walk
    (traverse_fast any_hit + t_max — NEE shadow rays).

    The packet/plist engines want very fat leaves (dense math amortizes
    DMA), but the shadow walk's cost is quad steps until the FIRST hit.
    Measured on the 1M-tri fog shadow wave (probes/probe_shadow_wave.py,
    chip, any_hit on): leaf 512 nearest-walk baseline 5.72 s/wave (274
    steps/ray mean); any_hit alone 3.82 s; walk-tuned leaves sweep
    128/64/32/16/8/4 -> 1.96/1.45/1.31/0.615/1.40/1.63 s — leaf 16 /
    depth 26 is a reproducible 9.3x over the baseline (51.7 steps/ray,
    bit-identical occlusion). In path mode the main tree serves only
    shadow queries once primaries/bounces ride the plist engine, so the
    walk-tuned build costs only memory (~1x tri bytes).
    """
    sub = build_kd_tree(np.asarray(tri_verts, np.float32),
                        max_depth=max_depth, leaf_size=leaf_size,
                        tri_block=4)
    # NOT baked: the fused one-gather walk table (attach_walk_table) is
    # a MEASURED NEGATIVE on this walk — see its docstring
    return tree.replace(shadow=sub)


def attach_walk_table(tree: FlatKdTree) -> FlatKdTree:
    """Attach fused one-gather walk rows (ops/traverse_fast.py::
    build_walk_table). MEASURED NEGATIVE, kept tested so it stays dead:
    same-session A/B on the 1M-terrain bounce wave (chip,
    probes/probe_surface_bounce.py PROBE_AB128=1) — fused 790 ms vs the
    two-gather walk's 614. Fusing halves the gathers per leaf step, but
    the unified table is ~10x the node table's bytes and gather cost
    grows with table size (probes/probe_gather_tpu.py f: a 16x smaller
    table gathers ~21% faster), so every DESCENT step pays more than
    the leaf fusion saves. The grid's inline layout won the same trade
    only because a grid has no descent steps at all."""
    from clpathtracer_tpu.ops.traverse_fast import build_walk_table
    if tree.node_table is None or tree.quads is None:
        return tree
    return tree.replace(walk128=jnp.asarray(
        build_walk_table(np.asarray(tree.node_table),
                         np.asarray(tree.quads))))


def attach_grid(tree: FlatKdTree, tri_verts: np.ndarray, res=None,
                density: float = 1.0) -> FlatKdTree:
    """Attach a uniform grid (accel/grid.py) for per-ray DDA queries.

    The right accelerator for fog-like scenes (uniform triangle density):
    render/integrator.py::_occluded prefers it over the shadow kd-tree,
    and intersect_scene's incoherent-wave branch can route bounce
    nearest-hit queries through it (CLPT_BOUNCE_GRID). Like the shadow
    tree this is a per-scene tuning choice, not a default — surface
    meshes with wildly varying density stay on the kd walk.
    """
    from clpathtracer_tpu.accel.grid import build_grid
    sub = build_grid(np.asarray(tri_verts, np.float32), res=res,
                     density=density)
    return tree.replace(grid=sub)
