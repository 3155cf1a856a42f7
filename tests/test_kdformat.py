"""Reference `.kd` binary format interop (scene/kdformat.py):
write → read round-trip, and rendering through the imported (compact,
rope-linked) tree must match the original."""

import numpy as np

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera
from clpathtracer_tpu.render.integrator import RenderOptions, render_image
from clpathtracer_tpu.scene.kdformat import load_reference_kd, save_reference_kd
from clpathtracer_tpu.scene.procedural import cornell_box, icosphere


def _compact_tree(scene):
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    return build_kd_tree(tv, tri_block=1)  # reference-compatible layout


class TestKdFormat:
    def test_round_trip_arrays(self, tmp_path):
        scene = icosphere(1)
        tree = _compact_tree(scene)
        p = str(tmp_path / "model.obj.kd")
        save_reference_kd(p, scene, tree)
        scene2, tree2 = load_reference_kd(p)

        np.testing.assert_allclose(np.asarray(scene.verts),
                                   np.asarray(scene2.verts))
        np.testing.assert_array_equal(np.asarray(scene.faces),
                                      np.asarray(scene2.faces))
        for f in ("node_min", "node_max", "is_leaf", "split_axis",
                  "split_value", "child_lo", "child_hi", "leaf_start",
                  "leaf_count", "ropes", "tri_indices"):
            np.testing.assert_array_equal(
                np.asarray(getattr(tree, f)), np.asarray(getattr(tree2, f)),
                err_msg=f)

    def test_imported_tree_renders_identically(self, tmp_path):
        scene = cornell_box(light=False)
        tree = _compact_tree(scene)
        p = str(tmp_path / "box.obj.kd")
        save_reference_kd(p, scene, tree)
        scene2, tree2 = load_reference_kd(p)
        cam = Camera.create(position=[0.0, 0.0, -1.0], forward=[0, 0, 1.0])
        # tri_block=1 trees carry no node_table → the integrator routes to
        # the reference wavefront engine for both
        opts = RenderOptions(width=24, height=24, mode="normal", tri_block=1)
        a = np.asarray(render_image(scene, cam, opts, tree=tree))
        b = np.asarray(render_image(scene2, cam, opts, tree=tree2))
        np.testing.assert_array_equal(a, b)

    def test_node_struct_is_68_bytes(self):
        from clpathtracer_tpu.scene.kdformat import _NODE_DTYPE
        assert _NODE_DTYPE.itemsize == 68  # include/kd_tree.h pack(1)

    def test_load_model_dispatches_kd(self, tmp_path):
        scene = icosphere(1)
        tree = _compact_tree(scene)
        p = str(tmp_path / "model.obj.kd")
        save_reference_kd(p, scene, tree)
        from clpathtracer_tpu.scene.cache import load_model
        s2, t2 = load_model(p)
        assert s2.num_tris == scene.num_tris
        assert t2.node_table is not None  # rebuilt packed tree
