"""Tests for the on-disk scene/tree cache and multi-model loading —
the reference's `.kd` checkpoint path (src/kd_tree.c:239-311) done as
portable .npz, plus N-mesh support the reference lacks."""

import os

import numpy as np
import jax.tree_util as jtu

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera
from clpathtracer_tpu.render.integrator import RenderOptions, render_image
from clpathtracer_tpu.scene.cache import (
    load_model, load_models, load_scene_cache, merge_scenes,
    save_scene_cache)
from clpathtracer_tpu.scene.procedural import cornell_box, icosphere

CUBE_OBJ = """\
# unit cube
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
v 1 0 1
v 1 1 1
v 0 1 1
f 1 2 3 4
f 8 7 6 5
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f 5 1 4 8
"""


def _tree_for(scene, tri_block=4):
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    return build_kd_tree(tv, tri_block=tri_block)


class TestCacheRoundTrip:
    def test_save_load_identical(self, tmp_path):
        scene = cornell_box()
        tree = _tree_for(scene)
        p = str(tmp_path / "box.kd.npz")
        save_scene_cache(p, scene, tree)
        scene2, tree2 = load_scene_cache(p)
        for a, b in zip(jtu.tree_leaves(scene), jtu.tree_leaves(scene2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jtu.tree_leaves(tree), jtu.tree_leaves(tree2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_model_builds_then_caches(self, tmp_path):
        obj = tmp_path / "cube.obj"
        obj.write_text(CUBE_OBJ)
        scene, tree = load_model(str(obj))
        assert scene.num_tris == 12
        cache = str(obj)[:-4] + ".kd.npz"
        assert os.path.exists(cache)
        # second load comes from the cache and matches exactly
        scene2, tree2 = load_model(str(obj))
        np.testing.assert_array_equal(np.asarray(scene.verts),
                                      np.asarray(scene2.verts))
        np.testing.assert_array_equal(np.asarray(tree.tri_indices),
                                      np.asarray(tree2.tri_indices))

    def test_cached_render_matches_fresh(self, tmp_path):
        obj = tmp_path / "cube.obj"
        obj.write_text(CUBE_OBJ)
        scene, tree = load_model(str(obj), use_cache=False)
        scene_c, tree_c = load_model(str(obj))  # builds + writes cache
        cam = Camera.create(position=[0.5, 0.5, -1.5], forward=[0, 0, 1.0])
        opts = RenderOptions(width=24, height=24, mode="normal")
        a = np.asarray(render_image(scene, cam, opts, tree=tree))
        b = np.asarray(render_image(scene_c, cam, opts, tree=tree_c))
        np.testing.assert_array_equal(a, b)

    def test_unknown_extension_raises(self, tmp_path):
        bad = tmp_path / "model.stl"
        bad.write_text("solid x")
        try:
            load_model(str(bad))
            assert False, "should have raised"
        except ValueError as e:
            assert "supported" in str(e)


class TestMultiMesh:
    def test_merge_preserves_both(self):
        a = cornell_box(light=False)
        b = icosphere(1, radius=0.3, center=(0.0, 0.0, 1.0))
        merged = merge_scenes([a, b])
        assert merged.num_tris == a.num_tris + b.num_tris
        # icosphere faces must still reference the right (shifted) verts
        tree = _tree_for(merged)
        cam = Camera.create(position=[0.0, 0.0, -1.0], forward=[0, 0, 1.0])
        opts = RenderOptions(width=32, height=32, mode="normal")
        img_m = np.asarray(render_image(merged, cam, opts, tree=tree))
        img_a = np.asarray(render_image(a, cam, opts, tree=_tree_for(a)))
        # the sphere occludes the back wall in the center
        assert np.abs(img_m - img_a).max() > 0.1
        # center pixel shows the sphere's smooth normal facing the camera
        np.testing.assert_allclose(img_m[16, 16], [0.5, 0.5, 0.0], atol=0.05)

    def test_load_models_skips_bad(self, tmp_path):
        good = tmp_path / "cube.obj"
        good.write_text(CUBE_OBJ)
        bad = tmp_path / "missing.obj"
        scene, tree, skipped = load_models([str(good), str(bad)])
        assert scene.num_tris == 12
        assert skipped == [str(bad)]


class TestMtl:
    def test_mtl_materials_resolve(self, tmp_path):
        """MTL Kd/Ke → per-face albedo/emission (the reference parses
        materials via tinyobj but never shades with them)."""
        (tmp_path / "m.mtl").write_text(
            "newmtl red\nKd 0.8 0.1 0.1\n"
            "newmtl lamp\nKd 0.0 0.0 0.0\nKe 5.0 5.0 5.0\n")
        (tmp_path / "tri.obj").write_text(
            "mtllib m.mtl\n"
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "usemtl red\nf 1 2 3\n"
            "usemtl lamp\nf 2 4 3\n")
        from clpathtracer_tpu.scene.scene import Scene
        s = Scene.from_obj(str(tmp_path / "tri.obj"))
        np.testing.assert_allclose(np.asarray(s.albedo[0]), [0.8, 0.1, 0.1])
        np.testing.assert_allclose(np.asarray(s.emission[0]), [0, 0, 0])
        np.testing.assert_allclose(np.asarray(s.emission[1]), [5, 5, 5])

    def test_missing_mtl_nonfatal(self, tmp_path):
        (tmp_path / "tri.obj").write_text(
            "mtllib missing.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        from clpathtracer_tpu.scene.scene import Scene
        s = Scene.from_obj(str(tmp_path / "tri.obj"))
        assert s.num_tris == 1
        np.testing.assert_allclose(np.asarray(s.albedo[0]), [0.75] * 3)
