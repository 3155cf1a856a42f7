"""Tests for the error harness, device inventory, profiling utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clpathtracer_tpu.utils.device import device_inventory, host_cpu, pick_device
from clpathtracer_tpu.utils.errors import checked, debug_nans, validate_image
from clpathtracer_tpu.utils.profiling import StageTimer, emit_metric


class TestErrors:
    def test_checked_catches_nan(self):
        f = checked(jax.jit(lambda x: jnp.log(x)))
        f(jnp.float32(1.0))  # fine
        with pytest.raises(Exception):
            f(jnp.float32(-1.0))  # log(-1) = nan

    def test_validate_image(self):
        validate_image(np.ones((4, 4, 3)))
        with pytest.raises(FloatingPointError):
            validate_image(np.array([[np.nan]]))
        with pytest.raises(FloatingPointError):
            validate_image(np.array([[-0.5]]))

    def test_debug_nans_scope_restores(self):
        prev = jax.config.jax_debug_nans
        with debug_nans(True):
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == prev


class TestDevice:
    def test_inventory(self):
        inv = device_inventory()
        assert len(inv) == 8  # simulated mesh (conftest)
        assert all(d["platform"] == "cpu" for d in inv)

    def test_pick(self):
        d = pick_device("cpu", 3)
        assert d.id == 3
        with pytest.raises(RuntimeError):
            pick_device("cpu", 99)

    def test_host_cpu(self):
        assert host_cpu().platform == "cpu"


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        assert "a" in t.report() and t.report()["a"] >= 0

    def test_emit_metric(self, capsys):
        rec = emit_metric("rays/s", 1e6, "rays/s", vs_baseline=0.005)
        out = capsys.readouterr().out
        assert '"metric"' in out and rec["value"] == 1e6


class TestPurity:
    def test_render_deterministic(self):
        """Functional purity = the race-detection story (SURVEY §5): same
        inputs → bit-identical frames."""
        from clpathtracer_tpu.core.camera import Camera
        from clpathtracer_tpu.render.integrator import (
            RenderOptions, render_image)
        from clpathtracer_tpu.scene.procedural import cornell_box
        scene = cornell_box()
        cam = Camera.create(position=[0, 0, -1.0], forward=[0, 0, 1.0])
        opts = RenderOptions(width=16, height=16, mode="normal",
                             use_tree=False)
        a = np.asarray(render_image(scene, cam, opts))
        b = np.asarray(render_image(scene, cam, opts))
        np.testing.assert_array_equal(a, b)


def test_packet_tile_heatmap():
    """render/debug.py::packet_tile_image — per-tile packet cost channel
    (the reference's commented-out heatmap idea at packet granularity)."""
    import numpy as np
    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.debug import (
        colorize_heatmap, packet_tile_image)
    from clpathtracer_tpu.render.integrator import RenderOptions
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    scene = random_tri_soup(2000, seed=3, extent=2.0, tri_size=0.05)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
    tree = build_kd_tree(tv, tri_block=4, leaf_size=16)
    cam = Camera.create(position=[0.0, 0.0, -4.0], forward=[0.0, 0.0, 1.0])
    opts = RenderOptions(width=32, height=32, packet_tile=256)
    img = packet_tile_image(scene, cam, opts, tree, stat="chunks")
    assert img.shape == (2, 2)
    assert img.sum() > 0
    rgb = colorize_heatmap(img)
    assert rgb.shape == (2, 2, 3)
    act = packet_tile_image(scene, cam, opts, tree, stat="active")
    assert (act == 256).all()
