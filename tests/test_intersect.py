"""Unit tests: Moller-Trumbore, AABB slab tests, spheres — vs hand math."""

import numpy as np
import jax.numpy as jnp

from clpathtracer_tpu.ops.intersect import (
    hit_aabb, hit_sphere, moller_trumbore, traverse_aabb,
    nearest_hit_bruteforce)
from clpathtracer_tpu.scene.procedural import two_triangles


def _ray(orig, dir):
    orig = np.asarray(orig, np.float32)
    dir = np.asarray(dir, np.float32)
    invdir = 1.0 / dir
    sign = (invdir < 0).astype(np.int32)
    return orig, dir, invdir, sign


class TestTriangle:
    v0 = jnp.array([[-1.0, -1.0, 2.0]])
    v1 = jnp.array([[0.0, 1.0, 2.0]])   # CCW seen from -z ⇒ normal -z
    v2 = jnp.array([[1.0, -1.0, 2.0]])

    def test_center_hit(self):
        ok, t, u, v = moller_trumbore(
            self.v0, self.v1, self.v2,
            jnp.array([[0.0, -0.2, 0.0]]), jnp.array([[0.0, 0.0, 1.0]]))
        assert bool(ok[0])
        np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)

    def test_miss_outside(self):
        ok, *_ = moller_trumbore(
            self.v0, self.v1, self.v2,
            jnp.array([[5.0, 5.0, 0.0]]), jnp.array([[0.0, 0.0, 1.0]]))
        assert not bool(ok[0])

    def test_backface_culled(self):
        # approach from +z: ray sees the back side → det < 0 → culled
        ok, *_ = moller_trumbore(
            self.v0, self.v1, self.v2,
            jnp.array([[0.0, -0.2, 4.0]]), jnp.array([[0.0, 0.0, -1.0]]))
        assert not bool(ok[0])

    def test_behind_origin_rejected(self):
        ok, *_ = moller_trumbore(
            self.v0, self.v1, self.v2,
            jnp.array([[0.0, -0.2, 5.0]]), jnp.array([[0.0, 0.0, 1.0]]))
        assert not bool(ok[0])

    def test_barycentrics(self):
        # aim at corner v1 (u=1) — reference convention: u weights v1
        ok, t, u, v = moller_trumbore(
            self.v0, self.v1, self.v2,
            jnp.array([[0.0, 0.999, 0.0]]), jnp.array([[0.0, 0.0, 1.0]]))
        assert bool(ok[0]) and float(u[0]) > 0.99


class TestAABB:
    lo = jnp.array([0.0, 0.0, 0.0])
    hi = jnp.array([1.0, 2.0, 3.0])

    def test_through_center(self):
        o, d, inv, s = _ray([0.5, 1.0, -1.0], [0.0, 0.0, 1.0])
        hit, tmin, tmax, near, far = hit_aabb(
            self.lo, self.hi, jnp.asarray(o), jnp.asarray(inv), jnp.asarray(s))
        assert bool(hit)
        np.testing.assert_allclose(float(tmin), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(tmax), 4.0, rtol=1e-6)
        assert int(near) == 4 and int(far) == 5  # enter -z face, exit +z

    def test_miss(self):
        o, d, inv, s = _ray([5.0, 5.0, -1.0], [0.0, 0.0, 1.0])
        hit, *_ = hit_aabb(self.lo, self.hi, jnp.asarray(o),
                           jnp.asarray(inv), jnp.asarray(s))
        assert not bool(hit)

    def test_box_behind(self):
        o, d, inv, s = _ray([0.5, 1.0, 5.0], [0.0, 0.0, 1.0])
        hit, *_ = hit_aabb(self.lo, self.hi, jnp.asarray(o),
                           jnp.asarray(inv), jnp.asarray(s))
        assert not bool(hit)  # tmax < 0 (reference src/kernel.cl:143)

    def test_inside_box(self):
        o, d, inv, s = _ray([0.5, 1.0, 1.0], [0.0, 0.0, 1.0])
        hit, tmin, tmax, near, far = hit_aabb(
            self.lo, self.hi, jnp.asarray(o), jnp.asarray(inv), jnp.asarray(s))
        assert bool(hit) and float(tmin) < 0 < float(tmax)

    def test_exit_faces_all_axes(self):
        for dir, want_far in ([[1, 0, 0], 1], [[-1, 0, 0], 0],
                              [[0, 1, 0], 3], [[0, -1, 0], 2],
                              [[0, 0, 1], 5], [[0, 0, -1], 4]):
            o, d, inv, s = _ray([0.5, 1.0, 1.5], dir)
            tmin, tmax, far = traverse_aabb(
                self.lo, self.hi, jnp.asarray(o), jnp.asarray(inv),
                jnp.asarray(s))
            assert int(far) == want_far, (dir, int(far))


class TestSphere:
    def test_outside_hit(self):
        ok, t = hit_sphere(jnp.array([0.0, 0.0, 5.0]), jnp.asarray(1.0),
                           jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]))
        assert bool(ok)
        np.testing.assert_allclose(float(t), 4.0, rtol=1e-6)

    def test_inside_hit(self):
        # reference's dead hit_sphere rejects rays starting inside
        # (src/kernel.cl:206-208) — deliberately fixed here
        ok, t = hit_sphere(jnp.array([0.0, 0.0, 0.0]), jnp.asarray(1.0),
                           jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]))
        assert bool(ok)
        np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)

    def test_miss(self):
        ok, _ = hit_sphere(jnp.array([0.0, 5.0, 5.0]), jnp.asarray(1.0),
                           jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]))
        assert not bool(ok)


class TestBruteForce:
    def test_nearest_of_two(self):
        scene = two_triangles()
        orig = jnp.array([[0.0, -0.2, 0.0]])
        dir = jnp.array([[0.0, 0.0, 1.0]])
        rec = nearest_hit_bruteforce(scene, orig, dir)
        assert bool(rec["hit"][0])
        assert int(rec["prim_id"][0]) == 0
        np.testing.assert_allclose(float(rec["t"][0]), 2.0, rtol=1e-6)
