"""Native (C++) SAH builder vs the numpy reference builder.

Trees may differ in exact-tie plane choices (different summation order in
the SAH cost), so the contract is SEMANTIC equality: identical nearest-hit
results on full wavefronts, plus structural invariants.
"""

import numpy as np
import pytest

from clpathtracer_tpu.accel import native
from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops.traverse_fast import pack_quads, traverse_fast
from clpathtracer_tpu.scene.procedural import (
    cornell_box, icosphere, random_tri_soup)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable")


def _hits(scene, tree, w=32, h=32, pos=(0.0, 0.0, -2.0)):
    v0, v1, v2 = scene.tri_verts()
    cam = Camera.create(position=list(pos), forward=[0.0, 0.0, 1.0])
    orig, dir = generate_rays(cam_matrix(cam, h), w, h)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    return traverse_fast(tree, quads, orig, dir)


@pytest.mark.parametrize("make,pos", [
    (lambda: cornell_box(light=False), (0.0, 0.0, -1.0)),
    (lambda: icosphere(2), (0.0, 0.0, -1.0)),
    (lambda: random_tri_soup(5000, seed=4, extent=2.0, tri_size=0.05),
     (0.0, 0.0, -4.0)),
])
def test_native_matches_python_hits(make, pos):
    scene = make()
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    t_py = build_kd_tree(tv, tri_block=4, leaf_size=4, max_depth=20,
                         backend="python")
    t_cc = build_kd_tree(tv, tri_block=4, leaf_size=4, max_depth=20,
                         backend="native")

    a = _hits(scene, t_py, pos=pos)
    b = _hits(scene, t_cc, pos=pos)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_array_equal(np.asarray(a["tri"]), np.asarray(b["tri"]))
    h = np.asarray(a["hit"])
    np.testing.assert_allclose(np.asarray(a["t"])[h], np.asarray(b["t"])[h],
                               rtol=1e-5)


def test_native_structural_invariants():
    scene = random_tri_soup(2000, seed=5, extent=2.0, tri_size=0.05)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=4, backend="native")
    table = np.asarray(tree.node_table)
    m = table.shape[0]
    is_leaf = np.asarray(tree.is_leaf)
    # every triangle appears in at least one leaf
    tis = np.asarray(tree.tri_indices)
    assert set(tis[tis >= 0]) == set(range(2000))
    # children in range, quad alignment, rope targets in range
    cl = np.asarray(tree.child_lo); ch = np.asarray(tree.child_hi)
    assert (cl[~is_leaf] >= 0).all() and (cl[~is_leaf] < m).all()
    assert (ch[~is_leaf] >= 0).all() and (ch[~is_leaf] < m).all()
    assert (np.asarray(tree.leaf_start)[is_leaf] % 4 == 0).all()
    ropes = np.asarray(tree.ropes)
    assert (ropes < m).all()
    # node AABBs contain their children's AABBs
    nmin = np.asarray(tree.node_min); nmax = np.asarray(tree.node_max)
    sp = np.flatnonzero(~is_leaf)
    for c in (cl[sp], ch[sp]):
        assert (nmin[sp] <= nmin[c] + 1e-5).all()
        assert (nmax[sp] >= nmax[c] - 1e-5).all()


def test_native_faster_than_python():
    import time
    scene = random_tri_soup(30000, seed=6, extent=5.0, tri_size=0.02)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    # warm both paths first (library load, jit of the quad packer) so the
    # timed calls compare the builders, not one-time process costs
    for backend in ("native", "python"):
        build_kd_tree(tv[:2000], tri_block=4, leaf_size=4, backend=backend)
    t0 = time.time()
    build_kd_tree(tv, tri_block=4, leaf_size=4, backend="native")
    t_native = time.time() - t0
    t0 = time.time()
    build_kd_tree(tv, tri_block=4, leaf_size=4, backend="python")
    t_python = time.time() - t0
    assert t_native < t_python, (t_native, t_python)
