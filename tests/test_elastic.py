"""Elastic chunked submission (parallel/elastic.py): fault-injected chunks
are resubmitted and the frame still matches the one-shot render — the
failure-recovery behavior the reference lacks (it exits on any device
error, src/error.c:147-154)."""

import numpy as np
import jax

from clpathtracer_tpu.accel.sah import build_kd_tree
from clpathtracer_tpu.core.camera import Camera
from clpathtracer_tpu.parallel.elastic import render_frame_chunked
from clpathtracer_tpu.render.integrator import RenderOptions, render_image
from clpathtracer_tpu.scene.procedural import random_tri_soup


def _fixture():
    # soup, not cornell: XLA fuses FMAs differently at different batch
    # shapes, so a chunk-rendered coplanar-tie pixel can legitimately pick
    # the other triangle; the soup has no exact ties
    scene = random_tri_soup(2000, seed=5, extent=2.0, tri_size=0.05)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=8)
    cam = Camera.create(position=[0.0, 0.0, -4.0], forward=[0.0, 0.0, 1.0])
    return scene, tree, cam


def test_chunked_matches_one_shot():
    scene, tree, cam = _fixture()
    opts = RenderOptions(width=32, height=32, mode="normal")
    ref = np.asarray(render_image(scene, cam, opts, tree=tree))
    img, report = render_frame_chunked(scene, cam, opts, tree=tree,
                                       row_chunks=4)
    np.testing.assert_array_equal(ref, np.asarray(img))
    assert report["failed"] == []
    assert all(v == 1 for v in report["attempts"].values())


def test_fault_injected_chunk_is_resubmitted():
    """Chunk 2 'loses its host' on the first attempt: the retry must
    re-render exactly the dropped rows and the frame must still be
    bit-identical to the one-shot render."""
    scene, tree, cam = _fixture()
    opts = RenderOptions(width=32, height=32, mode="normal")
    ref = np.asarray(render_image(scene, cam, opts, tree=tree))

    calls = []

    def hook(chunk, attempt):
        calls.append((chunk, attempt))
        if chunk == 2 and attempt == 0:
            raise RuntimeError("injected host loss")

    img, report = render_frame_chunked(scene, cam, opts, tree=tree,
                                       row_chunks=4, fault_hook=hook)
    np.testing.assert_array_equal(ref, np.asarray(img))
    assert report["attempts"][2] == 2
    assert report["failed"] == []
    assert (2, 0) in calls and (2, 1) in calls


def test_chunk_exhausting_retries_fills_and_reports():
    scene, tree, cam = _fixture()
    opts = RenderOptions(width=32, height=32, mode="normal")

    def hook(chunk, attempt):
        if chunk == 1:
            raise RuntimeError("permanently lost")

    img, report = render_frame_chunked(scene, cam, opts, tree=tree,
                                       row_chunks=4, max_retries=1,
                                       fill_value=0.5, fault_hook=hook)
    a = np.asarray(img)
    assert report["failed"] == [1]
    assert (a[8:16] == 0.5).all()       # the dead chunk, filled
    assert np.isfinite(a).all()
    # the other chunks rendered normally
    ref = np.asarray(render_image(scene, cam, opts, tree=tree))
    np.testing.assert_array_equal(ref[0:8], a[0:8])
    np.testing.assert_array_equal(ref[16:], a[16:])
