"""Scene-parallel rendering: treelet-sharded triangles across chips.

For scenes too large to replicate per chip, the SURVEY §5 design: shard
PRIMITIVES across the mesh "scene" axis. Triangles are partitioned into
spatially coherent treelets (Morton-order chunks), each shard gets its own
kd-tree, every chip traverses its resident rays against its local treelet,
and the per-shard nearest hits are combined with XLA collectives
(min-reduction over the "scene" axis inside shard_map) — the TPU-native
replacement for the reference's single-device upload (src/CLState.c:124-202)
and for hand-written NCCL reductions.

Combination semantics: global nearest hit = min t over shards; on exact
ties the LOWEST shard index wins (cross-shard tie order is arbitrary since
each triangle lives in exactly one shard — within a shard the reference's
later-wins rule still applies via traverse_fast).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from clpathtracer_tpu.accel.sah import FlatKdTree, build_kd_tree

BIG = 3.4e38


@struct.dataclass
class ShardedTree:
    """S per-shard kd-trees, stacked and padded to common shapes.

    node_table: [S, M, 24] f32 (ops/traverse_fast.py layout)
    tri_slots:  [S, T] i32 — LOCAL slot → ORIGINAL triangle id (-1 pad)
    """

    node_table: jnp.ndarray
    tri_slots: jnp.ndarray

    @property
    def num_shards(self) -> int:
        return self.node_table.shape[0]


def morton_order(centroids: np.ndarray) -> np.ndarray:
    """Sort order of points along a 30-bit 3-D Morton curve (spatially
    coherent chunks → compact treelet bounding boxes)."""
    lo = centroids.min(0)
    ext = np.maximum(centroids.max(0) - lo, 1e-12)
    q = np.minimum((1024 * (centroids - lo) / ext).astype(np.uint64), 1023)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x30000FF)
        x = (x | (x << 8)) & np.uint64(0x300F00F)
        x = (x | (x << 4)) & np.uint64(0x30C30C3)
        x = (x | (x << 2)) & np.uint64(0x9249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def build_sharded_tree(tri_verts: np.ndarray, n_shards: int,
                       max_depth: int = 22, leaf_size: int = 4,
                       ) -> ShardedTree:
    """Partition triangles into n_shards Morton chunks and build one
    quad-packed kd-tree per chunk.

    tri_verts: [F, 3, 3] corner positions. Returns a ShardedTree whose
    leading axis is meant to be sharded over the mesh "scene" axis.
    """
    f = tri_verts.shape[0]
    order = morton_order(tri_verts.mean(axis=1))
    chunks = np.array_split(order, n_shards)

    tables, slots = [], []
    for chunk in chunks:
        sub = tri_verts[chunk]
        tree = build_kd_tree(sub, max_depth=max_depth, leaf_size=leaf_size,
                             tri_block=4)
        # local slot ids → original triangle ids
        local = np.asarray(tree.tri_indices)
        orig_ids = np.where(local >= 0, chunk[np.maximum(local, 0)], -1)
        tables.append(np.asarray(tree.node_table))
        slots.append(orig_ids.astype(np.int32))

    m = max(t.shape[0] for t in tables)
    tmax = max(s.shape[0] for s in slots)
    node_table = np.zeros((n_shards, m, 24), np.float32)
    tri_slots = np.full((n_shards, tmax), -1, np.int32)
    for i, (t, s) in enumerate(zip(tables, slots)):
        node_table[i, :t.shape[0]] = t
        tri_slots[i, :s.shape[0]] = s
    return ShardedTree(node_table=jnp.asarray(node_table),
                       tri_slots=jnp.asarray(tri_slots))


def intersect_sharded(stree: ShardedTree, scene, orig, dir, mesh: Mesh,
                      max_iters: int = 16384):
    """Nearest hit of row-sharded rays against the scene-sharded treelets.

    orig/dir: [N, 3] (sharded over "rows" by the caller's jit context or
    committed shardings). Returns the usual hit record ([N] arrays,
    replicated over "scene").
    """
    from clpathtracer_tpu.ops.traverse_fast import traverse_fast
    n_shards = stree.num_shards
    assert n_shards == mesh.shape["scene"], (n_shards, mesh.shape)

    v0, v1, v2 = scene.tri_verts()

    def local(table_blk, slots_blk, v0, v1, v2, o, d):
        # one shard's tree (leading axis length 1 inside shard_map)
        table = table_blk[0]
        slots = slots_blk[0]

        # local FlatKdTree shim: traverse_fast only touches node_table +
        # tri_indices
        class _T:
            node_table = table
            tri_indices = slots

        safe = jnp.maximum(slots, 0)
        a = v0[safe]
        e1 = v1[safe] - a
        e2 = v2[safe] - a
        tid = slots.astype(jnp.float32)[:, None]
        pad = jnp.zeros((slots.shape[0], 6), a.dtype)
        quads = jnp.concatenate([a, e1, e2, tid, pad],
                                axis=1).reshape(-1, 64)

        rec = traverse_fast(_T, quads, o, d, max_iters=max_iters,
                            compact=False)

        t_loc = jnp.where(rec["hit"], rec["t"], BIG)
        t_min = jax.lax.pmin(t_loc, "scene")
        my = jax.lax.axis_index("scene").astype(jnp.int32)
        cand = jnp.where(rec["hit"] & (t_loc == t_min), my, n_shards)
        win = jax.lax.pmin(cand, "scene")
        iswin = (win == my) & rec["hit"] & (t_loc == t_min)

        def pick(x, fill):
            return jax.lax.psum(jnp.where(iswin, x, fill), "scene")

        return {
            "hit": win < n_shards,
            "t": jnp.where(win < n_shards, t_min, BIG),
            "tri": pick(rec["tri"], 0) + jnp.where(win < n_shards, 0, -1),
            "u": pick(rec["u"], 0.0),
            "v": pick(rec["v"], 0.0),
        }

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("scene"), P("scene"), P(), P(), P(),
                  P("rows", None), P("rows", None)),
        out_specs={"hit": P("rows"), "t": P("rows"), "tri": P("rows"),
                   "u": P("rows"), "v": P("rows")},
    )
    return fn(stree.node_table, stree.tri_slots, v0, v1, v2, orig, dir)
