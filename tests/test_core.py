"""Unit tests for core vec/mat/camera math vs independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clpathtracer_tpu.core import vecmath as vm
from clpathtracer_tpu.core.matrix import mat_inverse, mat_multiply
from clpathtracer_tpu.core.camera import (
    Camera, cam_matrix, camera_transform, device_transform, generate_rays,
    projection_transform,
)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestVecmath:
    def test_dot_cross_length(self):
        r = rng()
        a = r.normal(size=(32, 3)).astype(np.float32)
        b = r.normal(size=(32, 3)).astype(np.float32)
        np.testing.assert_allclose(vm.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
        np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(vm.length(a), np.linalg.norm(a, axis=-1), rtol=1e-5)

    def test_normalize(self):
        r = rng(1)
        a = r.normal(size=(16, 3)).astype(np.float32)
        n = np.asarray(vm.normalize(a))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)

    def test_reflect(self):
        d = jnp.array([1.0, -1.0, 0.0]) / np.sqrt(2)
        n = jnp.array([0.0, 1.0, 0.0])
        out = np.asarray(vm.reflect(d, n))
        np.testing.assert_allclose(out, np.array([1.0, 1.0, 0.0]) / np.sqrt(2), atol=1e-6)


class TestMatrix:
    def test_inverse_matches_numpy(self):
        r = rng(2)
        for _ in range(20):
            m = r.normal(size=(4, 4)).astype(np.float32)
            if abs(np.linalg.det(m)) < 1e-3:
                continue
            inv = np.asarray(mat_inverse(jnp.asarray(m)))
            np.testing.assert_allclose(inv, np.linalg.inv(m), rtol=2e-3, atol=2e-4)

    def test_singular_gives_zero(self):
        m = jnp.zeros((4, 4))
        np.testing.assert_array_equal(np.asarray(mat_inverse(m)), np.zeros((4, 4)))

    def test_batched(self):
        r = rng(3)
        ms = r.normal(size=(5, 4, 4)).astype(np.float32)
        inv = np.asarray(mat_inverse(jnp.asarray(ms)))
        for k in range(5):
            np.testing.assert_allclose(inv[k], np.linalg.inv(ms[k]), rtol=2e-3, atol=2e-4)

    def test_multiply(self):
        r = rng(4)
        a = r.normal(size=(4, 4)).astype(np.float32)
        b = r.normal(size=(4, 4)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(mat_multiply(a, b)), a @ b, rtol=1e-5)


def _reference_cam_matrix_numpy(pos, fwd, fov, near, far, height):
    """Independent numpy construction of src/camera.c:62-70 semantics."""
    fwd = np.asarray(fwd, np.float64)
    fwd = fwd / np.linalg.norm(fwd)
    left = np.array([fwd[2], 0.0, -fwd[0]])
    left = left / np.linalg.norm(left)
    up = np.cross(fwd, left)
    view = np.eye(4)
    view[0, :3], view[1, :3], view[2, :3] = left, up, fwd
    view[:3, 3] = view[:3, :3] @ (-np.asarray(pos, np.float64))

    c = 1.0 / np.tan(fov / 2.0)
    proj = np.zeros((4, 4))
    proj[0, 0] = proj[1, 1] = c
    proj[2, 2] = -(far + near) / (near - far)
    proj[2, 3] = (2 * far * near) / (near - far)
    proj[3, 2] = 1.0
    dev = np.diag([height / 2.0, height / 2.0, 1.0, 1.0])
    return np.linalg.inv(dev @ proj @ view)


class TestCamera:
    def setup_method(self):
        # Reference defaults: src/game.c:275-277
        self.cam = Camera.create(
            position=[0.0, 0.1, -0.2], forward=[0.0, 0.0, 1.0],
            fov=np.pi / 3, near=0.1, far=1.0)

    def test_view_matrix_orthonormal(self):
        v = np.asarray(camera_transform(self.cam))
        rot = v[:3, :3]
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-6)

    def test_cam_matrix_matches_numpy_reference(self):
        for fwd in ([0, 0, 1], [0.3, -0.2, 0.9], [-1, 0.1, 0.2]):
            cam = Camera.create(position=[1.0, 2.0, -3.0], forward=fwd,
                                fov=1.1, near=0.1, far=1.0)
            got = np.asarray(cam_matrix(cam, 480))
            want = _reference_cam_matrix_numpy([1, 2, -3], fwd, 1.1, 0.1, 1.0, 480)
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    def test_ray_origin_is_camera_position(self):
        inv = cam_matrix(self.cam, 64)
        origins, dirs = generate_rays(inv, 64, 64)
        np.testing.assert_allclose(
            np.asarray(origins[0]), np.asarray(self.cam.position), atol=1e-4)

    def test_center_ray_points_forward(self):
        inv = cam_matrix(self.cam, 128)
        origins, dirs = generate_rays(inv, 128, 128)
        # pixel (W/2, H/2) has offset (0, 0) → ray through the view axis
        center = np.asarray(dirs.reshape(128, 128, 3)[64, 64])
        np.testing.assert_allclose(center, [0, 0, 1], atol=1e-4)

    def test_dirs_unit_norm(self):
        inv = cam_matrix(self.cam, 32)
        _, dirs = generate_rays(inv, 32, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5)

    def test_fov_controls_spread(self):
        wide = Camera.create([0, 0, 0], [0, 0, 1], fov=np.pi / 2)
        narrow = Camera.create([0, 0, 0], [0, 0, 1], fov=np.pi / 6)
        _, dw = generate_rays(cam_matrix(wide, 64), 64, 64)
        _, dn = generate_rays(cam_matrix(narrow, 64), 64, 64)
        # corner ray z-component: wide FOV → more spread → smaller z
        assert float(dw[0, 2]) < float(dn[0, 2])

    def test_camera_is_differentiable(self):
        def loss(pos):
            cam = Camera.create(pos, [0.0, 0.0, 1.0])
            inv = cam_matrix(cam, 16)
            _, dirs = generate_rays(inv, 16, 16)
            return jnp.sum(dirs ** 2)

        g = jax.grad(loss)(jnp.array([0.0, 0.1, -0.2]))
        assert np.all(np.isfinite(np.asarray(g)))
