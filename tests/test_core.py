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


class TestNativeObjParser:
    """C++ OBJ scanner (scene/native/) must be record-for-record identical
    to the Python parser on every form it covers."""

    FIXTURE = """
# comment
v 0 0 0
v 1.5 -2e-1 3.25
v 0 1 0
v 1 1 1
vn 0 0 1
vn 0 1 0
vt 0.5 0.5
vt 0.25 0.75
usemtl red
f 1 2 3
f 1/1 2/2 3/1
f 1//2 2//1 3//2
usemtl green
f 1/1/1 2/2/2 3/1/1 4/2/2
f -4 -3 -2
mtllib scene.mtl other.mtl
o object1
g group
s off
"""

    def _native(self, text):
        from clpathtracer_tpu.scene import native
        if not native.available():
            import pytest
            pytest.skip("g++ unavailable")
        return native.parse_obj_native(text)

    def test_matches_python_parser(self):
        from clpathtracer_tpu.scene.objparser import parse_obj
        py = parse_obj(self.FIXTURE)
        geo, tri_mat, mats, libs = self._native(self.FIXTURE)
        np.testing.assert_array_equal(py["verts"], geo["verts"])
        np.testing.assert_array_equal(py["normals"], geo["normals"])
        np.testing.assert_array_equal(py["texcoords"], geo["texcoords"])
        np.testing.assert_array_equal(py["faces"], geo["faces"])
        assert mats == ["red", "green"]
        assert libs == ["scene.mtl", "other.mtl"]
        # quad fan-triangulates to 2 tris; green stays current for the
        # negative-index face too (matches the Python parser)
        assert list(tri_mat) == [0, 0, 0, 1, 1, 1]

    def test_load_obj_native_path_with_materials(self, tmp_path):
        from clpathtracer_tpu.scene.objparser import load_obj
        (tmp_path / "m.mtl").write_text(
            "newmtl red\nKd 0.9 0.1 0.1\nKe 0 0 0\n")
        (tmp_path / "a.obj").write_text(
            "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "usemtl red\nf 1 2 3\nf 1 3 2\n")
        out = load_obj(str(tmp_path / "a.obj"))
        assert out["faces"].shape == (2, 3, 3)
        np.testing.assert_allclose(out["albedo"][0], [0.9, 0.1, 0.1])

    def test_malformed_falls_back_to_python_error(self, tmp_path):
        import pytest
        from clpathtracer_tpu.scene.objparser import ObjParseError, load_obj
        (tmp_path / "bad.obj").write_text("v 0 0\n")
        with pytest.raises(ObjParseError):
            load_obj(str(tmp_path / "bad.obj"))

    def test_random_soup_roundtrip_parity(self, tmp_path):
        """Bulk parity: a generated many-face OBJ parses identically and
        ~20x faster (speed not asserted — environment-dependent)."""
        from clpathtracer_tpu.scene.objparser import parse_obj
        rng = np.random.default_rng(0)
        lines = []
        for v in rng.normal(size=(3000, 3)):
            lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
        for i in range(0, 2997, 3):
            lines.append(f"f {i+1} {i+2} {i+3}")
        text = "\n".join(lines)
        py = parse_obj(text)
        geo, _, _, _ = self._native(text)
        np.testing.assert_array_equal(py["verts"], geo["verts"])
        np.testing.assert_array_equal(py["faces"], geo["faces"])
