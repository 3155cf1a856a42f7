"""Round-4: same-session A/B of the fused resolve rows (attach_resolve).

Cross-session chip numbers drift +-15-20% (tunnel/server load), so the
fused-vs-unfused comparison must run inside ONE session, interleaved:

  A) traverse_plist, unfused (quads-gather resolve)
  B) traverse_plist, fused   (one 32-lane resolve_rows gather + shade)
  C) render_image normal mode, unfused tree (resolve + shade gathers)
  D) render_image normal mode, fused tree   (one gather, no shade gather)

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_fused_ab.py
"""

import os
import sys
import time

import numpy as np

SCENE = os.environ.get("PROBE_SCENE", "terrain")
WR = int(os.environ.get("CLPT_WIN_ROWS", "8"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from clpathtracer_tpu.accel.sah import (attach_morton_windows,
                                            build_kd_tree)
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops import plist as pls
    from clpathtracer_tpu.render.integrator import RenderOptions, render_image
    from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh

    res = 512
    reps = 10
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev} wr={WR} scene={SCENE}")
    with jax.default_device(cpu):
        if SCENE == "terrain":
            scene = terrain_mesh(1_000_000, seed=0, extent=10.0)
            cam = Camera.create(position=[0.0, 14.0, 0.0],
                                forward=[0.0, -1.0, 0.01])
        else:
            scene = random_tri_soup(1_000_000, seed=0, extent=10.0,
                                    tri_size=0.01)
            cam = Camera.create(position=[0.0, 0.0, -25.0],
                                forward=[0.0, 0.0, 1.0])
        scene = scene.bake_shading()
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        tree = build_kd_tree(tv, max_depth=11, leaf_size=3072, tri_block=4)
    scene = jax.device_put(scene, dev)
    tree = jax.device_put(tree, dev)
    tree_a = attach_morton_windows(tree, tv, win_rows=WR, with_so=True)
    tree_b = tree_a.replace(mwin=pls.attach_resolve(tree_a.mwin,
                                                    scene.shade_rows))
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)
    opts = RenderOptions(width=res, height=res, mode="normal",
                         intersector="packet")

    def timeit(name, f, *args):
        t0 = time.time()
        chk = float(f(1, *args))
        comp = time.time() - t0
        t0 = time.time()
        _ = float(f(1, *args))
        t1 = time.time() - t0
        t0 = time.time()
        chk2 = float(f(1 + reps, *args))
        tk = time.time() - t0
        log(f"{name}: compile {comp:.1f}s  frame {(tk-t1)/reps*1e3:.2f} ms"
            f"  chk={chk2:.6g}")

    def trav(n, mwin, orig, dirs):
        def body(i, chk):
            rec = pls.traverse_plist(mwin, orig + chk * 1e-38, dirs,
                                     (res, res))
            return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def rend(n, scene, tree, orig):
        def body(i, chk):
            cam_i = cam.replace(position=cam.position + chk * 1e-38)
            img = render_image(scene, cam_i, opts, tree=tree,
                               key=jax.random.PRNGKey(0))
            return jnp.sum(img)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jt = jax.jit(trav)
    jr = jax.jit(rend)
    # interleave A/B twice to expose drift within the session
    timeit("A trav unfused", jt, tree_a.mwin, orig, dirs)
    timeit("B trav fused  ", jt, tree_b.mwin, orig, dirs)
    timeit("A trav unfused", jt, tree_a.mwin, orig, dirs)
    timeit("B trav fused  ", jt, tree_b.mwin, orig, dirs)
    timeit("C render unfused", jr, scene, tree_a, orig)
    timeit("D render fused  ", jr, scene, tree_b, orig)
    timeit("C render unfused", jr, scene, tree_a, orig)
    timeit("D render fused  ", jr, scene, tree_b, orig)


if __name__ == "__main__":
    main()
