"""Scene-parallel (treelet-sharded) intersection must agree with the
single-tree renderer on the simulated mesh (SURVEY §5: primitives sharded
over the "scene" axis, hits min-reduced with collectives)."""

import numpy as np
import jax
import jax.numpy as jnp

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops.traverse_fast import pack_quads, traverse_fast
from clpathtracer_tpu.parallel.mesh import default_mesh
from clpathtracer_tpu.parallel.treelet import (
    build_sharded_tree, intersect_sharded, morton_order)
from clpathtracer_tpu.scene.procedural import icosphere, random_tri_soup


def test_morton_order_is_permutation():
    pts = np.random.default_rng(0).random((1000, 3))
    order = morton_order(pts)
    assert sorted(order) == list(range(1000))


def _rays(scene, w=32, h=32, pos=(0.0, 0.0, -4.0)):
    cam = Camera.create(position=list(pos), forward=[0.0, 0.0, 1.0])
    cam_inv = cam_matrix(cam, h)
    return generate_rays(cam_inv, w, h)


def test_sharded_matches_single_tree():
    scene = random_tri_soup(4000, seed=2, extent=2.0, tri_size=0.05)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    orig, dir = _rays(scene)

    # single-tree reference
    tree = build_kd_tree(tv, tri_block=4)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    ref = traverse_fast(tree, quads, orig, dir)

    # 2-way scene shard on a (rows=4, scene=2) mesh
    mesh = default_mesh(scene_parallel=2)
    stree = build_sharded_tree(tv, n_shards=2)
    rec = jax.jit(lambda o, d: intersect_sharded(
        stree, scene, o, d, mesh))(orig, dir)

    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(rec["hit"]))
    h = np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(ref["t"])[h],
                               np.asarray(rec["t"])[h], rtol=1e-5)
    # triangle ids agree wherever the hit is unambiguous (t strictly
    # unique); exact-tie winners may differ across shard boundaries
    t_ref = np.asarray(ref["t"])
    np.testing.assert_array_equal(np.asarray(ref["tri"])[h],
                                  np.asarray(rec["tri"])[h])


def test_sharded_icosphere_image_parity():
    scene = icosphere(2)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    orig, dir = _rays(scene, pos=(0.0, 0.0, -1.0))

    tree = build_kd_tree(tv, tri_block=4)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    ref = traverse_fast(tree, quads, orig, dir)

    mesh = default_mesh(scene_parallel=4)  # rows=2, scene=4
    stree = build_sharded_tree(tv, n_shards=4)
    rec = jax.jit(lambda o, d: intersect_sharded(
        stree, scene, o, d, mesh))(orig, dir)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(rec["hit"]))
    h = np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(ref["t"])[h],
                               np.asarray(rec["t"])[h], rtol=1e-5)
