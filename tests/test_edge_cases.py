"""Edge cases and robustness: empty scenes, degenerate geometry, camera
extremes. The reference mostly exits on such inputs; the framework should
produce defined output wherever the reference's math does."""

import numpy as np
import jax
import jax.numpy as jnp

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera
from clpathtracer_tpu.render.integrator import RenderOptions, render_image
from clpathtracer_tpu.scene.scene import Scene
from clpathtracer_tpu.utils.errors import validate_image


class TestEdgeCases:
    def test_empty_scene_renders_background(self):
        scene = Scene.create(np.zeros((0, 3)), np.zeros((0, 3, 3), np.int32))
        cam = Camera.create(position=[0, 0, -1.0], forward=[0, 0, 1.0])
        img = np.asarray(render_image(
            scene, cam, RenderOptions(width=8, height=8, mode="normal",
                                      use_tree=False)))
        np.testing.assert_allclose(img, 1.0)

    def test_single_triangle(self):
        v = np.array([[-1, -1, 2], [1, -1, 2], [0, 1, 2]], np.float32)
        f = np.full((1, 3, 3), -1, np.int32)
        f[0, :, 0] = [0, 2, 1]
        scene = Scene.create(v, f)
        tree = build_kd_tree(scene.tri_corners(), tri_block=4)
        cam = Camera.create(position=[0, 0, -1.0], forward=[0, 0, 1.0])
        img = validate_image(render_image(
            scene, cam, RenderOptions(width=16, height=16, mode="normal"),
            tree=tree))
        assert (img < 1.0).any()  # something was hit

    def test_degenerate_zero_area_triangle_no_nan(self):
        v = np.array([[0, 0, 2], [0, 0, 2], [0, 0, 2],       # degenerate
                      [-1, -1, 3], [1, -1, 3], [0, 1, 3]], np.float32)
        f = np.full((2, 3, 3), -1, np.int32)
        f[0, :, 0] = [0, 1, 2]
        f[1, :, 0] = [3, 5, 4]
        scene = Scene.create(v, f)
        tree = build_kd_tree(scene.tri_corners(), tri_block=4)
        cam = Camera.create(position=[0, 0, -1.0], forward=[0, 0, 1.0])
        img = validate_image(render_image(
            scene, cam, RenderOptions(width=16, height=16, mode="normal"),
            tree=tree))
        assert (img < 1.0).any()  # the good triangle still renders

    def test_near_vertical_camera(self):
        """forward = exactly +/-y is singular (parity with the reference's
        horizon-locked basis, src/camera.c:5-33); near-vertical must
        produce finite frames."""
        v = np.array([[-1, 2, -1], [1, 2, -1], [0, 2, 1]], np.float32)
        f = np.full((1, 3, 3), -1, np.int32)
        f[0, :, 0] = [0, 1, 2]
        scene = Scene.create(v, f)
        cam = Camera.create(position=[0, 0, 0.0],
                            forward=[0.01, 0.99, 0.01])
        img = np.asarray(render_image(
            scene, cam, RenderOptions(width=8, height=8, mode="normal",
                                      use_tree=False)))
        assert np.isfinite(img).all()

    def test_rays_starting_inside_sphere(self):
        """The reference's hit_sphere rejects rays born inside the sphere
        (a bug in dead code, src/kernel.cl:206-208); ours must hit the far
        shell."""
        scene = Scene.create(
            np.zeros((0, 3)), np.zeros((0, 3, 3), np.int32),
            sphere_pos=[[0.0, 0.0, 0.0]], sphere_radius=[2.0])
        cam = Camera.create(position=[0, 0, 0.0], forward=[0, 0, 1.0])
        img = np.asarray(render_image(
            scene, cam, RenderOptions(width=8, height=8, mode="normal",
                                      use_tree=False)))
        assert (img < 1.0).any()

    def test_huge_coordinates_finite(self):
        v = 1e6 * np.array([[-1, -1, 2], [1, -1, 2], [0, 1, 2]], np.float32)
        f = np.full((1, 3, 3), -1, np.int32)
        f[0, :, 0] = [0, 2, 1]
        scene = Scene.create(v, f)
        tree = build_kd_tree(scene.tri_corners(), tri_block=4)
        cam = Camera.create(position=[0, 0, -1e6], forward=[0, 0, 1.0],
                            near=1.0, far=10.0)
        img = np.asarray(render_image(
            scene, cam, RenderOptions(width=8, height=8, mode="normal"),
            tree=tree))
        assert np.isfinite(img).all()
