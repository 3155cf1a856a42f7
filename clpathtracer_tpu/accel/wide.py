"""8-wide supernode collapse of the binary kd-tree.

One supernode = up to 8 binary descendants reached by greedily expanding
internal nodes (≈3 levels), laid out as ONE 128-lane f32 row — 16 floats
per child slot:

  0:3 child AABB min | 3:6 max | 6 kind (0 empty, 1 internal, 2 leaf)
  7 index (supernode row for internal; quad-row start for leaf)
  8 leaf tri count | 9:16 pad

Why: the packet kernels' per-node cost is scalar reads + interval math;
Mosaic only allows STATIC lane indices, so the binary layout needs an
8-way switch per visit. A supernode's 8 children all live at static lane
offsets of one dynamic row — no switch, and one pop replaces ~3 levels of
binary pops. Finer leaves then become affordable, cutting the dense
triangle tests that dominate at fat-leaf settings.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

WIDE_EMPTY = 0.0
WIDE_INTERNAL = 1.0
WIDE_LEAF = 2.0


def build_wide_table(tree) -> np.ndarray:
    """FlatKdTree (tri_block=4) → [S, 128] f32 supernode table.

    Row 0 is the root supernode. Leaf children reference quad-row starts
    (leaf_start // 4) and triangle counts, exactly as the packet kernels'
    leaf streaming expects.
    """
    is_leaf = np.asarray(tree.is_leaf)
    nmin = np.asarray(tree.node_min)
    nmax = np.asarray(tree.node_max)
    cl = np.asarray(tree.child_lo)
    ch = np.asarray(tree.child_hi)
    leaf_start = np.asarray(tree.leaf_start)
    leaf_count = np.asarray(tree.leaf_count)

    rows = []

    def collect_children(node: int):
        """Greedy frontier expansion to up to 8 binary descendants."""
        if is_leaf[node]:
            return [node]
        frontier = [cl[node], ch[node]]
        while len(frontier) < 8:
            # expand the internal frontier node with the widest AABB
            # (largest surface) to balance child sizes
            pick = -1
            best = -1.0
            for i, f in enumerate(frontier):
                if not is_leaf[f]:
                    ext = nmax[f] - nmin[f]
                    s = ext[0] * ext[1] + ext[1] * ext[2] + ext[2] * ext[0]
                    if s > best:
                        best = s
                        pick = i
            if pick < 0:
                break
            f = frontier.pop(pick)
            frontier.extend([cl[f], ch[f]])
        return frontier

    def emit(node: int) -> int:
        idx = len(rows)
        rows.append(np.zeros(128, np.float32))
        children = collect_children(node)
        row = rows[idx]
        for k, c in enumerate(children):
            base = k * 16
            row[base + 0:base + 3] = nmin[c]
            row[base + 3:base + 6] = nmax[c]
            if is_leaf[c]:
                row[base + 6] = WIDE_LEAF
                row[base + 7] = float(leaf_start[c] // 4)
                row[base + 8] = float(leaf_count[c])
            else:
                row[base + 6] = WIDE_INTERNAL
                row[base + 7] = float(emit(c))
        return idx

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        emit(0)
    finally:
        sys.setrecursionlimit(old)
    return np.stack(rows)
