"""plist (prepass-list) engine: walk-free sorted-window streaming.

Parity contract: identical hit/t to the wavefront reference on both
bench scene shapes; tri ids may differ only at exact-t ties (documented
freedom shared by all packet engines). The reference behavior matched is
the per-ray nearest-hit semantics of /root/reference/src/kernel.cl:
323-389 — the engine itself has no reference counterpart (the prepass+
sorted-stream split is the TPU-shaped replacement for per-ray control
flow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
from clpathtracer_tpu.ops import plist as pls
from clpathtracer_tpu.ops.traverse_fast import traverse_fast
from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh


def _scene(kind):
    if kind == "terrain":
        scene = terrain_mesh(30_000, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
    else:
        scene = random_tri_soup(20_000, seed=11, extent=10.0,
                                tri_size=0.05)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    orig, dirs = generate_rays(cam_matrix(cam, 64), 64, 64)
    return tv, orig, dirs


def _assert_parity(rec, ref):
    h_p, h_r = np.asarray(rec["hit"]), np.asarray(ref["hit"])
    np.testing.assert_array_equal(h_p, h_r)
    both = h_p & h_r
    np.testing.assert_allclose(np.asarray(rec["t"])[both],
                               np.asarray(ref["t"])[both],
                               rtol=1e-5, atol=1e-6)
    # winners may differ only at exact ties: where tris disagree, the
    # ts must still match (checked above) — additionally require >95%
    # agreement so a systematic slot bug cannot hide behind "ties"
    tri_eq = (np.asarray(rec["tri"])[both]
              == np.asarray(ref["tri"])[both]).mean()
    assert tri_eq > 0.95, tri_eq


@pytest.mark.parametrize("kind", ["terrain", "soup"])
@pytest.mark.parametrize("win_rows", [16, 8])
@pytest.mark.parametrize("supers", [False, True])
def test_plist_parity_vs_wavefront(kind, win_rows, supers):
    tv, orig, dirs = _scene(kind)
    mwin = pls.build_morton_windows(tv, win_rows=win_rows)
    assert mwin.num_windows * win_rows * 8 >= tv.shape[0]
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=supers)
    ref = traverse_fast(tree, tree.quads, orig, dirs)
    _assert_parity(rec, ref)


@pytest.mark.parametrize("kind", ["terrain", "soup"])
def test_plist_super_exact_match_plain(kind):
    """The two-level super-list variant is the same intersector with a
    different stream schedule: results must match the plain plist kernel
    EXACTLY (same windows tested, same tie rules), and the need-bit
    window count must equal the plain stream count when no break cuts
    either (identical culling)."""
    tv, orig, dirs = _scene(kind)
    for mwin in (pls.build_morton_windows(tv),
                 pls.attach_so(pls.build_morton_windows(tv))):
        a = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=False)
        b = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=True)
        for k in ("hit", "t", "tri", "u", "v"):
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


def test_plist_super_empty_gates():
    tv, _, _ = _scene("terrain")
    mwin = pls.build_morton_windows(tv)
    cam = Camera.create(position=[0.0, 14.0, 0.0],
                        forward=[0.0, 1.0, 0.01])
    orig, dirs = generate_rays(cam_matrix(cam, 64), 64, 64)  # sky-facing
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=True)
    assert not np.asarray(rec["hit"]).any()
    assert np.asarray(rec["tile_stats"])[:, 1].sum() == 0


@pytest.mark.parametrize("kind", ["terrain", "soup"])
def test_plist_so_affine_parity(kind):
    """Shared-origin affine tables: same hits as the general quad path
    (edge-grazing flip budget as the stream engine's SO tests)."""
    tv, orig, dirs = _scene(kind)
    mwin = pls.build_morton_windows(tv)
    rec_gen = pls.traverse_plist(mwin, orig, dirs, (64, 64))
    mso = pls.attach_so(mwin)
    assert mso.so_base is not None
    rec_so = pls.traverse_plist(mso, orig, dirs, (64, 64))
    h_g = np.asarray(rec_gen["hit"])
    h_s = np.asarray(rec_so["hit"])
    assert (h_g != h_s).mean() < 2e-3
    both = h_g & h_s
    np.testing.assert_allclose(np.asarray(rec_gen["t"])[both],
                               np.asarray(rec_so["t"])[both],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind", ["terrain", "soup"])
@pytest.mark.parametrize("supers", [False, True])
def test_plist_d0cull_bit_parity(kind, supers):
    """d0cull (zero every d0 >= 0 SO record at combine time, drop the
    kernel's per-pair d0 test) must be BIT-identical to the guarded
    path: a d0 >= 0 record can never pass the kernel's d0 < 0 winner
    condition, so zeroing it (s = dsum = 0, rejected by the strict
    dsum < 0) changes nothing."""
    tv, orig, dirs = _scene(kind)
    mwin = pls.attach_so(pls.build_morton_windows(tv))
    a = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=supers,
                           d0cull=False)
    b = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=supers,
                           d0cull=True)
    for k in ("hit", "t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_plist_resolve_chunk_parity():
    """Chunked winner resolve (the half-width gather economics of
    probes/probe_gather_tpu.py) is a pure re-batching: identical winner
    slots and hit flags (the kernel side is untouched), bit-identical
    shade-row gathers, and re-resolved floats equal up to XLA
    reassociation (FMAs form differently inside a lax.map body).

    The float comparison is conditioning-aware (probes/
    probe_resolve_drift.py): t agrees to <1e-6 rel everywhere, but u/v
    near barycentric edges amplify a 1-ulp reassociation by the dot-
    product cancellation in the MT numerators — the right per-lane
    bound is eps * sum|summands| / |det| (measured: every lane within
    1.0x that bound; a flat rtol=2e-6 fails 157/4096 lanes at up to
    6.9e-3 rel where u ~ 1e-3). Both paths sit equally close to an f64
    oracle, so neither is "wrong" — the bound below is the honest
    contract."""
    tv, orig, dirs = _scene("terrain")
    from clpathtracer_tpu.scene.procedural import terrain_mesh
    scene = terrain_mesh(30_000, seed=0, extent=10.0).bake_shading()
    mwin = pls.attach_so(pls.build_morton_windows(tv))
    mwin = pls.attach_resolve(mwin, scene.shade_rows)
    a = pls.traverse_plist(mwin, orig, dirs, (64, 64))
    b = pls.traverse_plist(mwin, orig, dirs, (64, 64),
                           resolve_chunk=1024)
    for k in ("hit", "tri"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # gather-only fields must be bit-identical across program shapes
    for k in ("salbedo", "semission"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               rtol=2e-6, atol=2e-6)
    # interpolated normals: smooth field, 1-ulp agreement measured
    np.testing.assert_allclose(np.asarray(a["snormal"]),
                               np.asarray(b["snormal"]), atol=1e-6)
    # u/v: per-lane conditioning-amplified ulp bound (f64 MT solve)
    hit = np.asarray(a["hit"])
    tri = np.asarray(a["tri"])
    idx = np.clip(tri, 0, tv.shape[0] - 1)
    tv64 = tv.astype(np.float64)
    o64 = np.asarray(orig, np.float64)
    d64 = np.asarray(dirs, np.float64)
    v0 = tv64[idx, 0]
    e1 = tv64[idx, 1] - v0
    e2 = tv64[idx, 2] - v0
    p = np.cross(d64, e2)
    det = np.abs((e1 * p).sum(-1)) + 1e-300
    tvec = o64 - v0
    q = np.cross(tvec, e1)
    amp_u = np.abs(tvec * p).sum(-1) / det
    amp_v = np.abs(d64 * q).sum(-1) / det
    eps32 = 1.1920929e-07
    for k, amp in (("u", amp_u), ("v", amp_v)):
        dv = np.abs(np.asarray(a[k], np.float64)
                    - np.asarray(b[k], np.float64))
        bound = 8.0 * eps32 * np.maximum(amp, 1.0)
        viol = hit & (dv > bound)
        assert not viol.any(), (
            f"{k}: {viol.sum()} lanes exceed the conditioning bound; "
            f"max ratio {(dv[hit] / bound[hit]).max():.3g}")


@pytest.mark.parametrize("kind", ["terrain", "soup"])
def test_plist_jitter_dilated_hulls(kind):
    """Jittered spp samples ride the plist engine when the frustum
    hulls are dilated by the jitter bound (ops/plist.py::_win_keys
    dilate_px): parity vs the per-ray wavefront across several jitter
    keys. Without dilation the corner-hull cull DROPS edge samples —
    asserted too, so this test fails loudly if the dilation ever stops
    being exercised."""
    from clpathtracer_tpu.core.camera import generate_rays_jittered
    tv, _, _ = _scene(kind)
    if kind == "terrain":
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
    else:
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
    mwin = pls.attach_so(pls.build_morton_windows(tv))
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    ci = cam_matrix(cam, 64)
    dropped_any = False
    for seed in range(3):
        jitter = jax.random.uniform(jax.random.PRNGKey(seed),
                                    (1, 64 * 64, 2))
        o, d = generate_rays_jittered(ci, 64, 64, jitter)
        orig, dirs = o[0], d[0]
        rec = pls.traverse_plist(mwin, orig, dirs, (64, 64),
                                 dilate_px=3.0)
        ref = traverse_fast(tree, tree.quads, orig, dirs)
        _assert_parity(rec, ref)
        # undilated: the corner-hull cull is UNSOUND for jittered rays
        rec0 = pls.traverse_plist(mwin, orig, dirs, (64, 64))
        dropped_any |= bool(
            (np.asarray(rec0["hit"]) != np.asarray(ref["hit"])).any())
    # negative control on the surface scene only: the fog's windows
    # overlap nearly every frustum, so its undilated cull rarely fires
    # at all (the same reason bench tunes the soup with CLPT_FRUSTUM=0)
    if kind == "terrain":
        assert dropped_any, ("undilated hulls dropped nothing — "
                             "dilation is not being exercised")


@pytest.mark.parametrize("supers", [False, True])
def test_plist_sorted_break_is_conservative(supers):
    """The early break must never drop a real hit: compare against the
    same engine with the break disabled (t_upper pinned at BIG via
    cadence larger than any list)."""
    tv, orig, dirs = _scene("terrain")
    mwin = pls.build_morton_windows(tv)
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=supers)
    # cadence larger than any list -> never refresh -> no break
    full = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=supers,
                              tup_every=10 ** 9)
    np.testing.assert_array_equal(np.asarray(rec["hit"]),
                                  np.asarray(full["hit"]))
    h = np.asarray(rec["hit"])
    np.testing.assert_array_equal(np.asarray(rec["t"])[h],
                                  np.asarray(full["t"])[h])
    # ...and the break must actually cut work on an occluded scene
    assert (np.asarray(rec["tile_stats"])[:, 1].sum()
            <= np.asarray(full["tile_stats"])[:, 1].sum())


@pytest.mark.parametrize("knobs", [
    {"gate_h": 8}, {"gate_h": 32}, {"tup_every": 2},
    {"nobits": True}, {"supers": False, "tup_every": 4},
])
def test_plist_kernel_knobs_parity(knobs):
    """The schedule knobs (gate aspect, t_upper cadence, unconditional
    window math) change only WHEN work happens, never the nearest hit:
    hit/t must match the default schedule exactly (tri may differ at
    exact-t ties — gate regrouping changes tie winners)."""
    tv, orig, dirs = _scene("terrain")
    mwin = pls.build_morton_windows(tv)
    base = pls.traverse_plist(mwin, orig, dirs, (64, 64))
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64), **knobs)
    np.testing.assert_array_equal(np.asarray(rec["hit"]),
                                  np.asarray(base["hit"]))
    h = np.asarray(base["hit"])
    # a tie winner flips under regrouping -> re-resolved t moves a ulp
    np.testing.assert_allclose(np.asarray(rec["t"])[h],
                               np.asarray(base["t"])[h],
                               rtol=1e-6, atol=1e-6)
    same = h & (np.asarray(rec["tri"]) == np.asarray(base["tri"]))
    np.testing.assert_array_equal(np.asarray(rec["t"])[same],
                                  np.asarray(base["t"])[same])


@pytest.mark.parametrize("kind", ["terrain", "soup"])
def test_plist_gathered_parity(kind):
    """The gathered-stream variant (branch-free private per-gate window
    tables, round 5) is the same intersector with a different stream
    schedule: hit/t parity with the wavefront reference, and the
    kmax-overflow lax.cond fallback to the super engine must produce
    the same answers (tiny kmax forces it)."""
    tv, orig, dirs = _scene(kind)
    mwin = pls.attach_so(pls.build_morton_windows(tv))
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    ref = traverse_fast(tree, tree.quads, orig, dirs)
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64), gathered=True)
    _assert_parity(rec, ref)
    rec2 = pls.traverse_plist(mwin, orig, dirs, (64, 64), gathered=True,
                              kmax=8)  # forces the overflow fallback
    _assert_parity(rec2, ref)


def test_plist_gathered_break_is_conservative():
    """The gathered kernel's per-chunk sorted break must never drop a
    real hit: equal hits/t with the break disabled, and fewer windows
    consumed on an occluded scene."""
    tv, orig, dirs = _scene("terrain")
    mwin = pls.attach_so(pls.build_morton_windows(tv))
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64), gathered=True)
    full = pls.traverse_plist(mwin, orig, dirs, (64, 64), gathered=True,
                              tup_every=10 ** 9)
    np.testing.assert_array_equal(np.asarray(rec["hit"]),
                                  np.asarray(full["hit"]))
    h = np.asarray(rec["hit"])
    np.testing.assert_array_equal(np.asarray(rec["t"])[h],
                                  np.asarray(full["t"])[h])
    assert (np.asarray(rec["tile_stats"])[:, 1].sum()
            <= np.asarray(full["tile_stats"])[:, 1].sum())


def test_plist_empty_gates():
    """Gates whose frustum misses the whole scene stream nothing and
    report misses (the all-inf list head must not start a DMA)."""
    tv, _, _ = _scene("terrain")
    mwin = pls.build_morton_windows(tv)
    cam = Camera.create(position=[0.0, 14.0, 0.0], forward=[0.0, 1.0, 0.01])
    orig, dirs = generate_rays(cam_matrix(cam, 64), 64, 64)  # sky-facing
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64))
    assert not np.asarray(rec["hit"]).any()
    assert np.asarray(rec["tile_stats"])[:, 1].sum() == 0


def test_plist_multi_chunk_lists():
    """Lists longer than one 1024-entry chunk cross the chunk boundary
    correctly (tiny windows force thousands of windows)."""
    tv, orig, dirs = _scene("soup")
    mwin = pls.build_morton_windows(tv, win_rows=1)  # 8-tri windows
    assert mwin.num_windows > pls.LIST_CHUNK
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64))
    ref = traverse_fast(tree, tree.quads, orig, dirs)
    _assert_parity(rec, ref)


def test_render_image_uses_plist_when_attached():
    """End-to-end dispatch: a tree with Morton windows attached renders
    identically through the public API (the plist engine handles the
    primary wave); with jittered spp sampling the engine must NOT
    engage (grid_dirs=False) and the render stays finite."""
    from clpathtracer_tpu.accel.sah import (attach_morton_windows,
                                            build_kd_tree)
    from clpathtracer_tpu.render.integrator import (RenderOptions,
                                                    render_image)
    tv, _, _ = _scene("terrain")
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    tree_m = attach_morton_windows(tree, tv)
    assert tree_m.mwin is not None
    cam = Camera.create(position=[0.0, 14.0, 0.0],
                        forward=[0.0, -1.0, 0.01])
    opts = RenderOptions(width=64, height=64, mode="normal",
                         intersector="packet", packet_tile=256)
    a = np.asarray(render_image(tv_scene(), cam, opts, tree=tree))
    b = np.asarray(render_image(tv_scene(), cam, opts, tree=tree_m))
    # same hits -> same image, up to exact-t tie winners at shared
    # mesh edges (documented freedom; the winners carry different
    # per-face normals, so those pixels shade differently). Budget
    # 1.5%: measured 0.4-1.1% tie pixels on this fixture across gate
    # aspects (CLPT_GATE_H 8/16 regroup packets -> different tie picks)
    assert (np.abs(a - b).max(axis=-1) > 1e-5).mean() < 1.5e-2
    opts_j = RenderOptions(width=64, height=64, mode="path", spp=2,
                           bounces=1, intersector="packet",
                           packet_tile=256, background=0.6)
    c = np.asarray(render_image(tv_scene(), cam, opts_j, tree=tree_m,
                                key=jax.random.PRNGKey(0)))
    assert np.isfinite(c).all()


def tv_scene():
    from clpathtracer_tpu.scene.procedural import terrain_mesh
    return terrain_mesh(30_000, seed=0, extent=10.0)


@pytest.mark.parametrize("kind", ["terrain", "soup"])
def test_plist_bundle_parity_vs_wavefront(kind):
    """The bundle engine (arbitrary scattered rays, interval-slab keys,
    general per-lane MT) matches the wavefront reference exactly on
    Morton-sorted random rays."""
    from clpathtracer_tpu.ops.sort import sort_rays
    tv, _, _ = _scene(kind)
    mwin = pls.build_morton_windows(tv, win_rows=8)
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    rng = np.random.default_rng(3)
    n = 2048
    orig = jnp.asarray(rng.uniform(-12, 12, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)
    perm, inv = sort_rays(orig, dirs)
    rec = pls.traverse_plist_bundle(mwin, orig[perm], dirs[perm])
    rec = {k: (v[inv] if v.shape[:1] == perm.shape else v)
           for k, v in rec.items()}
    ref = traverse_fast(tree, tree.quads, orig, dirs)
    _assert_parity(rec, ref)


def test_plist_bundle_active_mask():
    """Dead lanes (active False) never take hits and alive lanes match
    the all-alive trace."""
    from clpathtracer_tpu.ops.sort import sort_rays
    tv, _, _ = _scene("terrain")
    mwin = pls.build_morton_windows(tv, win_rows=8)
    rng = np.random.default_rng(5)
    n = 1024
    orig = jnp.asarray(rng.uniform(-12, 12, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)
    perm, inv = sort_rays(orig, dirs)
    full = pls.traverse_plist_bundle(mwin, orig[perm], dirs[perm])
    full = {k: (v[inv] if v.shape[:1] == perm.shape else v)
            for k, v in full.items()}
    act = jnp.asarray(np.arange(n) % 2 == 0)
    perm2, inv2 = sort_rays(orig, dirs, alive=act)
    rec = pls.traverse_plist_bundle(mwin, orig[perm2], dirs[perm2],
                                    active=act[perm2])
    rec = {k: (v[inv2] if v.shape[:1] == perm2.shape else v)
           for k, v in rec.items()}
    a = np.asarray(act)
    assert not np.asarray(rec["hit"])[~a].any()
    np.testing.assert_array_equal(np.asarray(rec["hit"])[a],
                                  np.asarray(full["hit"])[a])
    h = a & np.asarray(full["hit"])
    np.testing.assert_array_equal(np.asarray(rec["t"])[h],
                                  np.asarray(full["t"])[h])


@pytest.mark.parametrize("kind", ["terrain", "soup"])
def test_plist4_parity_vs_wavefront(kind):
    """Sub-gate engine (4 independent 128-ray packets per program):
    identical hits to the wavefront reference."""
    tv, orig, dirs = _scene(kind)
    mwin = pls.build_morton_windows(tv, win_rows=16)
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    rec = pls.traverse_plist4(mwin, orig, dirs, (64, 64))
    ref = traverse_fast(tree, tree.quads, orig, dirs)
    _assert_parity(rec, ref)


def test_plist4_so_parity():
    tv, orig, dirs = _scene("terrain")
    mwin = pls.attach_so(pls.build_morton_windows(tv))
    rec = pls.traverse_plist4(mwin, orig, dirs, (64, 64))
    gen = pls.traverse_plist4(mwin.replace(so_base=None), orig, dirs,
                              (64, 64))
    h_s, h_g = np.asarray(rec["hit"]), np.asarray(gen["hit"])
    assert (h_s != h_g).mean() < 2e-3
    both = h_s & h_g
    np.testing.assert_allclose(np.asarray(rec["t"])[both],
                               np.asarray(gen["t"])[both],
                               rtol=1e-4, atol=1e-5)


def test_plist4_empty_gates():
    tv, _, _ = _scene("terrain")
    mwin = pls.build_morton_windows(tv)
    cam = Camera.create(position=[0.0, 14.0, 0.0],
                        forward=[0.0, 1.0, 0.01])
    orig, dirs = generate_rays(cam_matrix(cam, 64), 64, 64)
    rec = pls.traverse_plist4(mwin, orig, dirs, (64, 64))
    assert not np.asarray(rec["hit"]).any()


def test_plist_fused_resolve_parity():
    """Fused resolve rows (attach_resolve): the traverse record must be
    BIT-identical to the unfused quads-gather route, and the pre-resolved
    shade attributes must match the integrator's resolve_tri_hits baked
    path exactly on hit lanes (same arithmetic, one gather instead of
    two)."""
    from clpathtracer_tpu.render.shading import resolve_tri_hits
    from clpathtracer_tpu.scene.procedural import terrain_mesh

    scene = terrain_mesh(30_000, seed=0, extent=10.0).bake_shading()
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    cam = Camera.create(position=[0.0, 14.0, 0.0],
                        forward=[0.0, -1.0, 0.01])
    orig, dirs = generate_rays(cam_matrix(cam, 64), 64, 64)

    mwin = pls.build_morton_windows(tv, win_rows=8)
    mfused = pls.attach_resolve(mwin, scene.shade_rows)
    assert mfused.resolve_rows is not None
    assert mfused.resolve_rows.shape[1] == 128  # 4 slots/row

    a = pls.traverse_plist(mwin, orig, dirs, (64, 64))
    b = pls.traverse_plist(mfused, orig, dirs, (64, 64))
    for k in ("hit", "t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    for k in ("snormal", "salbedo", "semission"):
        assert k in b and k not in a

    at = resolve_tri_hits(scene, b["tri"], b["u"], b["v"])
    hit = np.asarray(b["hit"])
    np.testing.assert_array_equal(np.asarray(b["snormal"])[hit],
                                  np.asarray(at["normal"])[hit])
    np.testing.assert_array_equal(np.asarray(b["salbedo"])[hit],
                                  np.asarray(at["albedo"])[hit])
    np.testing.assert_array_equal(np.asarray(b["semission"])[hit],
                                  np.asarray(at["emission"])[hit])


def test_fused_resolve_image_parity():
    """End to end through render_image: a tree whose Morton windows carry
    fused resolve rows renders the bit-identical normal-mode image to the
    unfused route (intersect_scene forwards the attrs, _surface skips its
    shade gather)."""
    from clpathtracer_tpu.accel.sah import (attach_morton_windows,
                                            build_kd_tree)
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.integrator import (RenderOptions,
                                                    render_image)
    from clpathtracer_tpu.scene.procedural import terrain_mesh

    scene = terrain_mesh(30_000, seed=0, extent=10.0).bake_shading()
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, max_depth=12, leaf_size=64, tri_block=4)
    cam = Camera.create(position=[0.0, 14.0, 0.0],
                        forward=[0.0, -1.0, 0.01])
    opts = RenderOptions(width=64, height=64, mode="normal",
                         intersector="packet")

    t_plain = attach_morton_windows(tree, tv, win_rows=8)
    t_fused = attach_morton_windows(tree, tv, win_rows=8,
                                    shade_rows=scene.shade_rows)
    img_a = np.asarray(render_image(scene, cam, opts, tree=t_plain))
    img_b = np.asarray(render_image(scene, cam, opts, tree=t_fused))
    np.testing.assert_array_equal(img_a, img_b)


@pytest.mark.parametrize("kind", ["terrain", "soup"])
@pytest.mark.parametrize("kcap", [1, 3, 24])
def test_plist_two_phase_parity(kind, kcap, monkeypatch):
    """Two-phase straggler engine (CLPT_PLIST_KCAP + attached grid):
    phase-1 truncation + per-ray grid finish must reproduce the
    single-phase result — identical hits, identical t (winners may
    differ only at exact-t ties, like every engine pair)."""
    from clpathtracer_tpu.accel.grid import build_grid
    tv, orig, dirs = _scene(kind)
    mwin = pls.attach_so(pls.build_morton_windows(tv, win_rows=8))
    grid = build_grid(tv, density=1.0)
    ref = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=True)
    monkeypatch.setenv("CLPT_PLIST_KCAP", str(kcap))
    rec = pls.traverse_plist(mwin, orig, dirs, (64, 64), supers=True,
                             grid=grid)
    # engagement canary: a tiny phase-1 budget must stream fewer
    # windows than the single-phase run (stats count phase 1 only)
    if kcap <= 3:
        assert (np.asarray(rec["tile_stats"])[:, 1].sum()
                < np.asarray(ref["tile_stats"])[:, 1].sum())
    np.testing.assert_array_equal(np.asarray(rec["hit"]),
                                  np.asarray(ref["hit"]))
    both = np.asarray(rec["hit"]) & np.asarray(ref["hit"])
    np.testing.assert_allclose(np.asarray(rec["t"])[both],
                               np.asarray(ref["t"])[both],
                               rtol=1e-5, atol=1e-6)
    tri_eq = (np.asarray(rec["tri"])[both]
              == np.asarray(ref["tri"])[both]).mean()
    assert tri_eq > 0.95, tri_eq


@pytest.mark.parametrize("kind", ["terrain", "soup"])
@pytest.mark.parametrize("span", [64, 128])
def test_median_order_invariants(kind, span):
    """median_order is a permutation; every split lands on a multiple
    of span (only the global tail window may be ragged); and the
    partition's total window-hull cross-section is no worse than the
    Morton cut's (the geometric claim the engine's cost rides on)."""
    tv, _, _ = _scene(kind)
    perm = pls.median_order(tv, span)
    assert np.array_equal(np.sort(perm), np.arange(tv.shape[0]))

    def hull_area(order):
        t = tv[order]
        n = (t.shape[0] // span) * span
        lo = t[:n].min(axis=1).reshape(-1, span, 3).min(axis=1)
        hi = t[:n].max(axis=1).reshape(-1, span, 3).max(axis=1)
        e = hi - lo
        return (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                + e[:, 2] * e[:, 0]).sum()

    mwin_m = pls.build_morton_windows(tv, order="morton")
    morton_perm = np.asarray(
        mwin_m.tris128.reshape(-1, 16)[:, 9], np.int64)
    morton_perm = morton_perm[morton_perm >= 0]
    assert hull_area(perm) < hull_area(morton_perm)


def test_median_vs_morton_image_parity():
    """Partition order changes DMA layout only: hits and ts must be
    identical between median and morton windows (winners may differ
    only at exact-t ties)."""
    tv, orig, dirs = _scene("terrain")
    rec_a = pls.traverse_plist(
        pls.build_morton_windows(tv, win_rows=8, order="median"),
        orig, dirs, (64, 64), supers=True)
    rec_b = pls.traverse_plist(
        pls.build_morton_windows(tv, win_rows=8, order="morton"),
        orig, dirs, (64, 64), supers=True)
    _assert_parity(rec_a, rec_b)
