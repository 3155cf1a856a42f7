"""Round-4: decompose the path-gate frame (2-bounce NEE emissive soup).

Times, chained, on the chip:
  (a) full path frame (the bench gate)
  (b) no-NEE path frame          -> NEE block = a - b
  (c) 1-bounce no-NEE            -> second bounce wave ~ b - c
  (d) normal-mode frame          -> primary traverse + shade
  (e) primary-only path (bounces=1, no NEE ~ c) vs d -> path overhead

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_path_split.py
"""

import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from clpathtracer_tpu.accel.sah import (attach_grid,
                                            attach_morton_windows,
                                            build_kd_tree)
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.integrator import RenderOptions, render_image
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    res = 512
    reps = 4
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")
    with jax.default_device(cpu):
        scene = random_tri_soup(1_000_000, seed=0, extent=10.0,
                                tri_size=0.01,
                                emissive_frac=0.001).bake_shading()
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, max_depth=14, leaf_size=512, tri_block=4)
        tree = attach_grid(tree, tv)
    scene = jax.device_put(scene, dev)
    tree = jax.device_put(tree, dev)
    tree = attach_morton_windows(tree, tv, win_rows=8, with_so=True,
                                 shade_rows=scene.shade_rows)
    cam = jax.device_put(cam, dev)

    def chain(opts):
        def f(n, scene, tree, cam):
            def body(i, chk):
                cam_i = cam.replace(position=cam.position + chk * 1e-38)
                img = render_image(scene, cam_i, opts, tree=tree,
                                   key=jax.random.PRNGKey(0))
                return jnp.sum(img)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(f)

    def timeit(name, jf):
        t0 = time.time()
        chk = float(jf(1, scene, tree, cam))
        comp = time.time() - t0
        t0 = time.time()
        _ = float(jf(1, scene, tree, cam))
        t1 = time.time() - t0
        t0 = time.time()
        chk2 = float(jf(1 + reps, scene, tree, cam))
        tk = time.time() - t0
        log(f"{name}: compile {comp:5.1f}s  frame {(tk-t1)/reps*1e3:7.2f}"
            f" ms  chk={chk2:.6g}")

    def opts(mode="path", bounces=2, nee=True):
        return RenderOptions(width=res, height=res, mode=mode,
                             bounces=bounces, nee=nee, sort_bounces=True,
                             intersector="packet", packet_tile=512,
                             background=0.0)

    timeit("a) path 2b NEE ", chain(opts()))
    timeit("b) path 2b     ", chain(opts(nee=False)))
    timeit("c) path 1b     ", chain(opts(bounces=1, nee=False)))
    timeit("d) normal      ", chain(opts(mode="normal", bounces=0,
                                         nee=False)))
    timeit("e) path 1b NEE ", chain(opts(bounces=1)))


if __name__ == "__main__":
    main()
