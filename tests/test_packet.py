"""Pallas packet tracer vs the wavefront traversal (interpret mode on CPU).

Hits and t must agree everywhere; triangle ids must agree except where two
different triangles share the exact same nearest t (cross-subtree tie,
where stack order and rope order legitimately differ)."""

import numpy as np
import jax
import pytest

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops.packet import TILE, packet_supported, traverse_packet
from clpathtracer_tpu.ops.traverse_fast import pack_quads, traverse_fast
from clpathtracer_tpu.scene.procedural import (
    cornell_box, icosphere, random_tri_soup)


def _fixture(scene, w=32, h=32, pos=(0.0, 0.0, -1.0)):
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4)
    cam = Camera.create(position=list(pos), forward=[0.0, 0.0, 1.0])
    orig, dir = generate_rays(cam_matrix(cam, h), w, h)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    return tree, quads, orig, dir


@pytest.mark.parametrize("make,pos", [
    (lambda: cornell_box(light=False), (0.0, 0.0, -1.0)),
    (lambda: icosphere(2), (0.0, 0.0, -1.0)),
    (lambda: random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
     (0.0, 0.0, -4.0)),
])
def test_packet_matches_wavefront(make, pos):
    tree, quads, orig, dir = _fixture(make(), pos=pos)
    assert packet_supported(tree, orig.shape[0])

    ref = traverse_fast(tree, quads, orig, dir)
    pkt = traverse_packet(tree, quads, orig, dir)

    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(pkt["hit"]))
    h = np.asarray(ref["hit"])
    rt = np.asarray(ref["t"])[h]
    pt = np.asarray(pkt["t"])[h]
    np.testing.assert_allclose(rt, pt, rtol=1e-5, atol=1e-6)
    # tri ids: allow mismatches only at exact-t ties
    rtri = np.asarray(ref["tri"])[h]
    ptri = np.asarray(pkt["tri"])[h]
    diff = rtri != ptri
    assert np.allclose(rt[diff], pt[diff], rtol=1e-6), (
        f"{diff.sum()} non-tie tri mismatches")


def test_packet_hbm_variant_matches(monkeypatch):
    """Force the HBM (DMA-per-visit) kernel and check parity — the path
    big scenes take."""
    import clpathtracer_tpu.ops.packet as pk
    monkeypatch.setattr(pk, "VMEM_BUDGET", 2_000_000)  # table fits, tris stream
    tree, quads, orig, dir = _fixture(
        random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
        pos=(0.0, 0.0, -4.0))
    assert pk.packet_mode(tree, orig.shape[0]) == "tri_stream"
    ref = traverse_fast(tree, quads, orig, dir)
    pkt = pk.traverse_packet(tree, quads, orig, dir)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(pkt["hit"]))
    h = np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(ref["t"])[h],
                               np.asarray(pkt["t"])[h], rtol=1e-5)


def test_packet_incoherent_rays_still_correct():
    """Random (incoherent) rays: packet culling degenerates but results
    must stay exact."""
    scene = random_tri_soup(2000, seed=7, extent=2.0, tri_size=0.08)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)

    rng = np.random.default_rng(0)
    orig = rng.uniform(-3, 3, (TILE, 3)).astype(np.float32)
    dir = rng.normal(size=(TILE, 3)).astype(np.float32)
    dir /= np.linalg.norm(dir, axis=1, keepdims=True)
    import jax.numpy as jnp
    orig, dir = jnp.asarray(orig), jnp.asarray(dir)

    ref = traverse_fast(tree, quads, orig, dir)
    pkt = traverse_packet(tree, quads, orig, dir)
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(pkt["hit"]))
    h = np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(ref["t"])[h],
                               np.asarray(pkt["t"])[h], rtol=1e-5)


def test_sorted_bounce_packet_matches_wavefront_image():
    """Mirror mode (3 bounces, deterministic): full-frame render with
    packet + bounce sorting must match the wavefront render (tie-pixel
    budget only)."""
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.integrator import RenderOptions, render_image
    scene = icosphere(2)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=8, max_depth=14)
    cam = Camera.create(position=[0.0, 0.0, -1.0], forward=[0, 0, 1.0])
    a = np.asarray(render_image(
        scene, cam, RenderOptions(width=32, height=32, mode="mirror",
                                  bounces=3), tree=tree))
    b = np.asarray(render_image(
        scene, cam, RenderOptions(width=32, height=32, mode="mirror",
                                  bounces=3, intersector="packet"),
        tree=tree))
    close = np.isclose(a, b, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.99, f"{(~close).sum()} pixels differ"


@pytest.mark.parametrize("make,pos", [
    (lambda: icosphere(2), (0.0, 0.0, -1.0)),
    (lambda: random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
     (0.0, 0.0, -4.0)),
])
def test_wide_kernel_matches_wavefront(make, pos, monkeypatch):
    """8-wide supernode kernel (accel/wide.py + _kernel_wide) vs the
    reference wavefront: same hits, same t. (Opt-in engine: CLPT_WIDE.)"""
    monkeypatch.setenv("CLPT_WIDE", "1")
    import clpathtracer_tpu.ops.packet as pk
    scene = make()
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=16, max_depth=14)
    assert tree.wide_table is not None
    assert pk.packet_mode(tree, 1024) == "wide"
    cam = Camera.create(position=list(pos), forward=[0.0, 0.0, 1.0])
    orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    ref = traverse_fast(tree, quads, orig, dir)
    pkt = pk.traverse_packet(tree, quads, orig, dir, image_shape=(32, 32))
    np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                  np.asarray(pkt["hit"]))
    h = np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(ref["t"])[h],
                               np.asarray(pkt["t"])[h], rtol=1e-5)
