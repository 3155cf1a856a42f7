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


@pytest.mark.parametrize("engine", ["auto", "legacy"])
@pytest.mark.parametrize("make,pos", [
    (lambda: cornell_box(light=False), (0.0, 0.0, -1.0)),
    (lambda: icosphere(2), (0.0, 0.0, -1.0)),
    (lambda: random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
     (0.0, 0.0, -4.0)),
])
def test_packet_matches_wavefront(make, pos, engine):
    tree, quads, orig, dir = _fixture(make(), pos=pos)
    assert packet_supported(tree, orig.shape[0])

    ref = traverse_fast(tree, quads, orig, dir)
    pkt = traverse_packet(tree, quads, orig, dir, engine=engine)

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
    assert pk.packet_mode(tree, orig.shape[0],
                          engine="legacy") == "tri_stream"
    ref = traverse_fast(tree, quads, orig, dir)
    pkt = pk.traverse_packet(tree, quads, orig, dir, engine="legacy")
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


class TestStreamEngine:
    """v2 interval-walk kernel (engine="stream", the default): parity with
    the wavefront, active-lane masking, dead-tile skip, and integrator
    compaction end-to-end."""

    def test_stream_is_default_engine(self):
        tree, quads, orig, dir = _fixture(cornell_box(light=False))
        from clpathtracer_tpu.ops.packet import packet_mode
        assert packet_mode(tree, orig.shape[0]) == "stream"

    @pytest.mark.parametrize("make,pos,leaf", [
        (lambda: cornell_box(light=False), (0.0, 0.0, -1.0), 1),
        (lambda: icosphere(2), (0.0, 0.0, -1.0), 4),
        (lambda: random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
         (0.0, 0.0, -4.0), 16),
    ])
    def test_stream_matches_wavefront(self, make, pos, leaf):
        scene = make()
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=leaf)
        cam = Camera.create(position=list(pos), forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        ref = traverse_fast(tree, quads, orig, dir)
        pkt = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                              engine="stream")
        np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                      np.asarray(pkt["hit"]))
        h = np.asarray(ref["hit"])
        rt = np.asarray(ref["t"])[h]
        pt = np.asarray(pkt["t"])[h]
        np.testing.assert_allclose(rt, pt, rtol=1e-5, atol=1e-6)
        rtri = np.asarray(ref["tri"])[h]
        ptri = np.asarray(pkt["tri"])[h]
        diff = rtri != ptri
        assert np.allclose(rt[diff], pt[diff], rtol=1e-6), (
            f"{diff.sum()} non-tie tri mismatches")

    def test_chunk_cull_parity_and_effect(self, monkeypatch):
        """Leaf-DMA-window chunk culling (accel/sah.py chunk_bounds_host +
        the kernel's stream_leaf_culled) must not change the image, and on
        a fat-leaf scene with a narrow packet it must actually skip
        windows (tile_stats lane 3 > 0 somewhere)."""
        import clpathtracer_tpu.ops.packet as pk
        scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        # fat leaves -> multiple 128-tri DMA windows per leaf
        tree = build_kd_tree(tv, tri_block=4, leaf_size=512, max_depth=8)
        assert tree.chunk_bnd is not None
        cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        on = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                             engine="stream")
        monkeypatch.setenv("CLPT_CHUNK_CULL", "0")
        off = pk.traverse_packet(tree, quads, orig, dir,
                                 image_shape=(32, 32), engine="stream")
        np.testing.assert_array_equal(np.asarray(on["hit"]),
                                      np.asarray(off["hit"]))
        h = np.asarray(on["hit"])
        np.testing.assert_allclose(np.asarray(on["t"])[h],
                                   np.asarray(off["t"])[h], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(on["tri"]),
                                      np.asarray(off["tri"]))
        assert np.asarray(off["tile_stats"])[:, 3].sum() == 0

        # effectiveness needs a NARROW packet (a full-frame tile's frustum
        # covers every window above): a pencil beam crossing the fat
        # leaves diagonally must skip windows and DMA fewer chunks
        import jax.numpy as jnp
        n = 512
        po = jnp.tile(jnp.array([[0.05, 0.03, -4.0]]), (n, 1))
        pd = np.tile(np.array([[0.01, -0.005, 1.0]]), (n, 1))
        pd += np.random.default_rng(0).normal(0.0, 1e-4, pd.shape)
        pd = jnp.asarray(pd / np.linalg.norm(pd, axis=1, keepdims=True))
        monkeypatch.setenv("CLPT_CHUNK_CULL", "1")
        pon = pk.traverse_packet(tree, quads, po, pd, engine="stream",
                                 tile=512)
        monkeypatch.setenv("CLPT_CHUNK_CULL", "0")
        poff = pk.traverse_packet(tree, quads, po, pd, engine="stream",
                                  tile=512)
        np.testing.assert_array_equal(np.asarray(pon["tri"]),
                                      np.asarray(poff["tri"]))
        assert np.asarray(pon["tile_stats"])[:, 3].sum() > 0, (
            "chunk culling never fired on a pencil beam")
        assert (np.asarray(pon["tile_stats"])[:, 1].sum()
                < np.asarray(poff["tile_stats"])[:, 1].sum())

    def test_stream_packed16_layout(self, monkeypatch):
        """Force the packed16 node layout (large-tree path) and check
        parity with the padded layout."""
        import clpathtracer_tpu.ops.packet as pk
        scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=16)
        cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        a = traverse_packet(tree, quads, orig, dir, engine="stream")
        monkeypatch.setattr(pk, "PAD_NODE_LIMIT", 0)
        b = pk.traverse_packet(tree, quads, orig, dir, engine="stream")
        np.testing.assert_array_equal(np.asarray(a["hit"]),
                                      np.asarray(b["hit"]))
        np.testing.assert_array_equal(np.asarray(a["tri"]),
                                      np.asarray(b["tri"]))

    def test_active_mask(self):
        import jax.numpy as jnp
        scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=16)
        cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        rng = np.random.default_rng(0)
        act = jnp.asarray(rng.random(orig.shape[0]) < 0.5)
        full = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32))
        msk = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                              active=act)
        a = np.asarray(act)
        # dead lanes never hit; alive lanes identical to the unmasked run
        assert not np.asarray(msk["hit"])[~a].any()
        np.testing.assert_array_equal(np.asarray(msk["hit"])[a],
                                      np.asarray(full["hit"])[a])
        hh = a & np.asarray(full["hit"])
        np.testing.assert_allclose(np.asarray(msk["t"])[hh],
                                   np.asarray(full["t"])[hh], rtol=1e-6)

    def test_dead_tiles_skip_traversal(self):
        import jax.numpy as jnp
        tree, quads, orig, dir = _fixture(
            random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
            pos=(0.0, 0.0, -4.0))
        dead = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                               active=jnp.zeros(orig.shape[0], bool))
        assert not np.asarray(dead["hit"]).any()
        st = np.asarray(dead["tile_stats"])
        assert st[:, 0].sum() == 0  # zero node pops anywhere

    def test_wavefront_active_mask(self):
        import jax.numpy as jnp
        tree, quads, orig, dir = _fixture(
            random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
            pos=(0.0, 0.0, -4.0))
        rng = np.random.default_rng(1)
        act = jnp.asarray(rng.random(orig.shape[0]) < 0.3)
        full = traverse_fast(tree, quads, orig, dir)
        msk = traverse_fast(tree, quads, orig, dir, active=act)
        a = np.asarray(act)
        assert not np.asarray(msk["hit"])[~a].any()
        np.testing.assert_array_equal(np.asarray(msk["hit"])[a],
                                      np.asarray(full["hit"])[a])

    def test_compacted_path_mode_matches(self):
        """Integrator-level compaction (active masks through bounces) must
        not change the image: path mode, fixed key, packet vs wavefront
        intersector — Monte-Carlo draws are identical, so any drift is a
        masking bug."""
        import jax
        from clpathtracer_tpu.render.integrator import (
            RenderOptions, render_image)
        scene = cornell_box(light=True)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4)
        cam = Camera.create(position=[0.0, 0.0, -1.0], forward=[0, 0, 1.0])
        key = jax.random.PRNGKey(5)
        base = dict(width=16, height=16, mode="path", bounces=4,
                    background=0.0)
        a = np.asarray(render_image(
            scene, cam, RenderOptions(**base), tree=tree, key=key))
        b = np.asarray(render_image(
            scene, cam, RenderOptions(**base, intersector="packet",
                                      packet_tile=256), tree=tree, key=key))
        close = np.isclose(a, b, atol=1e-4).all(axis=-1)
        assert close.mean() > 0.99, f"{(~close).sum()} pixels differ"


def test_mxu_engine_experimental_parity():
    """ops/packet_mxu.py (engine="mxu"): MT as MXU matmuls. Measured
    slower than the VPU stream engine on v5e (f32-HIGHEST costs 6 passes
    and K=16 wastes 8/9 of the systolic array) — kept as an experimental
    engine. Its different summation order can flip accept decisions for
    grazing edge rays, so parity is budgeted, not exact."""
    scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=16)
    cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
    orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    ref = traverse_fast(tree, quads, orig, dir)
    pkt = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                          engine="mxu")
    rh, ph = np.asarray(ref["hit"]), np.asarray(pkt["hit"])
    assert (rh == ph).mean() > 0.995, (rh != ph).sum()
    both = rh & ph
    np.testing.assert_allclose(np.asarray(ref["t"])[both],
                               np.asarray(pkt["t"])[both], rtol=1e-4)


def test_empty_leaf_scenes_all_engines():
    """Surface scenes produce EMPTY kd leaves (open space). Regression for
    the orphaned-DMA bug: an empty leaf must not start a chunk transfer
    that nothing waits (corrupted the DMA semaphore pairing and crashed
    real hardware; results here lock the logic in interpret mode)."""
    from clpathtracer_tpu.scene.procedural import terrain_mesh
    scene = terrain_mesh(50000)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=512, max_depth=14)
    il = np.asarray(tree.is_leaf)
    assert (np.asarray(tree.leaf_count)[il] == 0).any(), \
        "fixture must contain empty leaves"
    cam = Camera.create(position=[0.0, 14.0, 0.0], forward=[0.0, -1.0, 0.01])
    orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    ref = traverse_fast(tree, quads, orig, dir)
    for engine in ("stream", "stream2", "queue"):
        pkt = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                              tile=256, engine=engine)
        np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                      np.asarray(pkt["hit"]), err_msg=engine)
        h = np.asarray(ref["hit"])
        np.testing.assert_allclose(np.asarray(ref["t"])[h],
                                   np.asarray(pkt["t"])[h], rtol=1e-5)


class TestQueueEngine:
    """v3 producer/consumer kernel (engine="queue"): the stream interval
    walk decoupled from dense MT by a ring of in-flight window DMAs
    (cross-leaf lookahead). Must be hit/t-exact vs the wavefront; culling
    and active-mask semantics identical to the stream engine."""

    @pytest.mark.parametrize("make,pos,leaf", [
        (lambda: cornell_box(light=False), (0.0, 0.0, -1.0), 1),
        (lambda: icosphere(2), (0.0, 0.0, -1.0), 4),
        (lambda: random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
         (0.0, 0.0, -4.0), 16),
        (lambda: random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05),
         (0.0, 0.0, -4.0), 512),
    ])
    def test_queue_matches_wavefront(self, make, pos, leaf):
        scene = make()
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=leaf)
        cam = Camera.create(position=list(pos), forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        ref = traverse_fast(tree, quads, orig, dir)
        pkt = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                              engine="queue")
        np.testing.assert_array_equal(np.asarray(ref["hit"]),
                                      np.asarray(pkt["hit"]))
        h = np.asarray(ref["hit"])
        rt = np.asarray(ref["t"])[h]
        pt = np.asarray(pkt["t"])[h]
        np.testing.assert_allclose(rt, pt, rtol=1e-5, atol=1e-6)
        rtri = np.asarray(ref["tri"])[h]
        ptri = np.asarray(pkt["tri"])[h]
        diff = rtri != ptri
        assert np.allclose(rt[diff], pt[diff], rtol=1e-6), (
            f"{diff.sum()} non-tie tri mismatches")

    def test_queue_cull_parity(self, monkeypatch):
        import clpathtracer_tpu.ops.packet as pk
        scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=512, max_depth=8)
        assert tree.chunk_bnd is not None
        cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        on = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                             engine="queue")
        monkeypatch.setenv("CLPT_CHUNK_CULL", "0")
        off = pk.traverse_packet(tree, quads, orig, dir,
                                 image_shape=(32, 32), engine="queue")
        np.testing.assert_array_equal(np.asarray(on["hit"]),
                                      np.asarray(off["hit"]))
        np.testing.assert_array_equal(np.asarray(on["tri"]),
                                      np.asarray(off["tri"]))

    def test_queue_packed16_layout(self, monkeypatch):
        import clpathtracer_tpu.ops.packet as pk
        scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=16)
        cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        a = traverse_packet(tree, quads, orig, dir, engine="queue")
        monkeypatch.setattr(pk, "PAD_NODE_LIMIT", 0)
        b = pk.traverse_packet(tree, quads, orig, dir, engine="queue")
        np.testing.assert_array_equal(np.asarray(a["hit"]),
                                      np.asarray(b["hit"]))
        np.testing.assert_array_equal(np.asarray(a["tri"]),
                                      np.asarray(b["tri"]))

    def test_queue_active_mask_and_dead_tiles(self):
        import jax.numpy as jnp
        scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=16)
        cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        quads = pack_quads(tree.tri_indices, v0, v1, v2)
        rng = np.random.default_rng(0)
        act = jnp.asarray(rng.random(orig.shape[0]) < 0.5)
        full = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                               engine="queue")
        msk = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                              engine="queue", active=act)
        a = np.asarray(act)
        assert not np.asarray(msk["hit"])[~a].any()
        np.testing.assert_array_equal(np.asarray(msk["hit"])[a],
                                      np.asarray(full["hit"])[a])
        dead = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                               engine="queue",
                               active=jnp.zeros(orig.shape[0], bool))
        assert not np.asarray(dead["hit"]).any()
        assert np.asarray(dead["tile_stats"])[:, 0].sum() == 0


def test_bf16_preview_mode_runs():
    """precision="bf16" (preview mode): runs, and agreement with the f32
    engine is high-but-imperfect by design (bf16 o-v0 cancellation; the
    docstring's measured ~93% bound)."""
    scene = random_tri_soup(3000, seed=1, extent=2.0, tri_size=0.05)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=16)
    cam = Camera.create(position=[0, 0, -4.0], forward=[0.0, 0.0, 1.0])
    orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
    quads = pack_quads(tree.tri_indices, v0, v1, v2)
    ref = traverse_fast(tree, quads, orig, dir)
    fast = traverse_packet(tree, quads, orig, dir, image_shape=(32, 32),
                           tile=256, engine="stream", precision="bf16")
    agree = (np.asarray(ref["hit"]) == np.asarray(fast["hit"])).mean()
    assert agree > 0.88, agree


class TestSharedOrigin:
    """shared_origin=True (primary pinhole rays): the stream/queue engines
    stream so_rows (per-triangle signed-volume terms, ops/packet.py) —
    winners must match the general quad path everywhere but exact-t
    ties, and t/u/v bit-match because both re-resolve from the slot."""

    @pytest.mark.parametrize("engine", ["stream", "queue"])
    @pytest.mark.parametrize("smem", ["0", "1"])
    def test_so_matches_general(self, engine, smem, monkeypatch):
        monkeypatch.setenv("CLPT_SMEM", smem)
        tree, quads, orig, dir = _fixture(
            random_tri_soup(3000, seed=5, extent=2.0, tri_size=0.05),
            pos=(0.0, 0.0, -4.0))
        gen = traverse_packet(tree, quads, orig, dir, engine=engine)
        so = traverse_packet(tree, quads, orig, dir, engine=engine,
                             shared_origin=True)
        np.testing.assert_array_equal(np.asarray(gen["hit"]),
                                      np.asarray(so["hit"]))
        h = np.asarray(gen["hit"])
        gt = np.asarray(gen["t"])[h]
        st = np.asarray(so["t"])[h]
        np.testing.assert_allclose(gt, st, rtol=1e-5, atol=1e-6)
        diff = np.asarray(gen["tri"])[h] != np.asarray(so["tri"])[h]
        assert np.allclose(gt[diff], st[diff], rtol=1e-6), (
            f"{diff.sum()} non-tie tri mismatches")

    def test_so_active_mask(self):
        tree, quads, orig, dir = _fixture(
            random_tri_soup(2000, seed=6, extent=2.0, tri_size=0.05),
            pos=(0.0, 0.0, -4.0))
        act = jax.numpy.asarray(np.arange(orig.shape[0]) % 2 == 0)
        gen = traverse_packet(tree, quads, orig, dir, active=act)
        so = traverse_packet(tree, quads, orig, dir, active=act,
                             shared_origin=True)
        np.testing.assert_array_equal(np.asarray(gen["hit"]),
                                      np.asarray(so["hit"]))
        assert not np.asarray(so["hit"])[1::2].any()

    def test_render_image_uses_so(self):
        """End-to-end: render_image (which passes shared_origin=True for
        its pinhole primaries) matches a render with SO disabled."""
        import os
        from clpathtracer_tpu.render.integrator import (RenderOptions,
                                                        render_image)
        from clpathtracer_tpu.scene.procedural import random_tri_soup
        sc = random_tri_soup(2000, seed=7, extent=2.0,
                             tri_size=0.05).bake_shading()
        v0, v1, v2 = sc.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4)
        cam = Camera.create(position=[0.0, 0.0, -4.0],
                            forward=[0.0, 0.0, 1.0])
        opts = RenderOptions(width=32, height=32, intersector="packet")
        img_so = np.asarray(render_image(sc, cam, opts, tree=tree))
        os.environ["CLPT_SO"] = "0"
        jax.clear_caches()  # render_image is jitted; force a retrace so
        #   the env toggle is actually read
        try:
            img_gen = render_image(sc, cam, opts, tree=tree)
        finally:
            del os.environ["CLPT_SO"]
            jax.clear_caches()
        np.testing.assert_allclose(np.asarray(img_so),
                                   np.asarray(img_gen), atol=1e-5)

    def test_so_affine_tables_match_so_rows(self):
        """so_affine_tables is an exact affine refactor of so_rows: for
        any origin, B0 + ox*B1 + oy*B2 + oz*B3 equals the padded so_rows
        output to f32 rounding."""
        from clpathtracer_tpu.ops.packet import (so_affine_tables,
                                                 so_rows, _pad_rows8)
        rng = np.random.default_rng(11)
        tris = (rng.normal(size=(513, 16)) * 3).astype(np.float32)
        tris[:, 9] = np.arange(513)
        tris[::17, 9] = -1  # sentinel rows must zero in every table
        q = jax.numpy.asarray(tris)
        tabs = so_affine_tables(q)
        for o in ([0.3, -1.2, 2.5], [7.0, 0.0, -4.0]):
            o = np.asarray(o, np.float32)
            ref = np.asarray(_pad_rows8(so_rows(q, o), pad_value=0.0))
            aff = np.asarray(tabs[0] + o[0] * tabs[1] + o[1] * tabs[2]
                             + o[2] * tabs[3])
            scale = np.abs(ref).max()
            np.testing.assert_allclose(aff, ref, atol=1e-6 * scale)

    @pytest.mark.parametrize("smem", ["0", "1"])
    def test_so_affine_engine_parity(self, smem, monkeypatch):
        """Stream engine fed the affine so_base tables agrees with the
        general quad path. The affine form rounds v0xe1 and o x e1
        separately (so_affine_tables docstring), so a tiny budget of
        edge-grazing winner flips is allowed; surviving hits must carry
        near-identical t."""
        monkeypatch.setenv("CLPT_SMEM", smem)
        from clpathtracer_tpu.accel.sah import attach_so_tables
        tree, quads, orig, dir = _fixture(
            random_tri_soup(3000, seed=5, extent=2.0, tri_size=0.05),
            pos=(0.0, 0.0, -4.0))
        tree_so = attach_so_tables(tree)
        assert tree_so.so_base is not None
        gen = traverse_packet(tree, quads, orig, dir, engine="stream")
        so = traverse_packet(tree_so, quads, orig, dir, engine="stream",
                             shared_origin=True)
        h_g = np.asarray(gen["hit"])
        h_s = np.asarray(so["hit"])
        flips = (h_g != h_s).mean()
        assert flips < 2e-3, f"hit flip fraction {flips}"
        both = h_g & h_s
        np.testing.assert_allclose(np.asarray(gen["t"])[both],
                                   np.asarray(so["t"])[both],
                                   rtol=1e-4, atol=1e-5)


class TestFrustumCull:
    """Exact per-tile pinhole frustum window culling (stream SMEM engine,
    shared-origin blocked tiles): strictly conservative — identical
    hit/t/tri to the interval-only cull, never fewer culled windows.
    Replaces nothing in the reference (its per-pixel walk needs no packet
    culling, /root/reference/src/kernel.cl:323-389); this is the packet
    analogue of its per-ray kd restart bounds."""

    def _render(self, fr, monkeypatch):
        monkeypatch.setenv("CLPT_FRUSTUM", fr)
        scene = random_tri_soup(20_000, seed=11, extent=10.0,
                                tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        # fat leaves -> multi-window leaves so the window cull has work
        tree = build_kd_tree(tv, max_depth=10, leaf_size=512, tri_block=4)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 32), 32, 32)
        return tree, traverse_packet(
            tree, tree.quads, orig, dir, image_shape=(32, 32),
            engine="stream", shared_origin=True, grid_dirs=True)

    def test_frustum_parity_and_culls(self, monkeypatch):
        tree, off = self._render("0", monkeypatch)
        assert tree.chunk_bnd is not None
        _, on = self._render("1", monkeypatch)
        np.testing.assert_array_equal(np.asarray(off["hit"]),
                                      np.asarray(on["hit"]))
        h = np.asarray(off["hit"])
        np.testing.assert_array_equal(np.asarray(off["t"])[h],
                                      np.asarray(on["t"])[h])
        np.testing.assert_array_equal(np.asarray(off["tri"])[h],
                                      np.asarray(on["tri"])[h])
        culled_off = float(np.asarray(off["tile_stats"])[:, 3].sum())
        culled_on = float(np.asarray(on["tile_stats"])[:, 3].sum())
        assert culled_on >= culled_off


class TestStripGating:
    """Mask-culled stream kernel (CLPT_STRIPS): the XLA per-strip
    window-mask prepass (union consumed as the window cull) must be
    bit-identical to the scalar interval/frustum-culled walk. Packet-
    level analogue of the per-ray traversal the reference gets for free
    from per-pixel work-items (/root/reference/src/kernel.cl:323-389)."""

    def _trace(self, st, tile, monkeypatch):
        monkeypatch.setenv("CLPT_STRIPS", st)
        scene = random_tri_soup(20_000, seed=13, extent=10.0,
                                tri_size=0.05)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, max_depth=10, leaf_size=512, tri_block=4)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        orig, dir = generate_rays(cam_matrix(cam, 64), 64, 64)
        return traverse_packet(tree, tree.quads, orig, dir,
                               image_shape=(64, 64), tile=tile,
                               engine="stream", shared_origin=True,
                               grid_dirs=True)

    @pytest.mark.parametrize("tile", [256, 512])
    def test_strips_parity_and_gating(self, tile, monkeypatch):
        off = self._trace("0", tile, monkeypatch)
        on = self._trace("1", tile, monkeypatch)
        h = np.asarray(off["hit"])
        np.testing.assert_array_equal(h, np.asarray(on["hit"]))
        for k in ("t", "tri", "u", "v"):
            np.testing.assert_array_equal(np.asarray(off[k])[h],
                                          np.asarray(on[k])[h])
        ts = np.asarray(on["tile_stats"])
        streamed = ts[:, 1].sum()
        assert streamed > 0
        # dense math runs full width: one MT execution per streamed
        # window (lane 4 == lane 1)
        assert ts[:, 4].sum() == streamed
