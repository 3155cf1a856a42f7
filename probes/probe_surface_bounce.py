"""Round-4: bounce-wave engine A/B on a SURFACE scene (terrain).

The path gate's fog routes bounce waves through the grid DDA; surface
scenes have no grid, and today their sorted bounce waves ride the
bundle plist (measured 1.8x over the kd-walk packet on the FOG — never
A/B'd on a surface). Terrain bounce rays are hemisphere-scattered off
the surface and mostly escape to the sky: a bundle hull covering a
hemisphere culls nothing, while the per-ray rope walk exits a miss in
a handful of rope hops. Engines, same wave, chained:

  a) sorted bundle plist (current default)
  b) Morton-sorted kd-walk packet engine (CLPT_PLIST_BOUNCE=0 route)
  c) per-ray gather-packed rope walk (traverse_fast, wind-down)
  d) c on the walk-tuned small-leaf tree (attach_shadow_tree's build)

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_surface_bounce.py
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
    from clpathtracer_tpu.accel.sah import (attach_morton_windows,
                                            build_kd_tree)
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops.plist import traverse_plist_bundle
    from clpathtracer_tpu.ops.sort import sort_rays
    from clpathtracer_tpu.ops.traverse_fast import traverse_fast
    from clpathtracer_tpu.scene.procedural import terrain_mesh

    res = 512
    reps = 4
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")
    with jax.default_device(cpu):
        scene = terrain_mesh(1_000_000, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        tree = build_kd_tree(tv, max_depth=11, leaf_size=3072, tri_block=4)
        wtree = build_kd_tree(tv, max_depth=26, leaf_size=16, tri_block=4)
    tree = jax.device_put(tree, dev)
    wtree = jax.device_put(wtree, dev)
    tree = attach_morton_windows(tree, tv, win_rows=8, with_so=True)
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)

    # build a real bounce wave on-device: primary hits + cosine dirs
    from clpathtracer_tpu.core import vecmath as vm
    from clpathtracer_tpu.ops.plist import traverse_plist

    @jax.jit
    def bounce_wave(tree, orig, dirs):
        rec = traverse_plist(tree.mwin, orig, dirs, (res, res))
        t = jnp.where(rec["hit"], rec["t"], 0.0)
        p = orig + t[:, None] * dirs
        # geometric normal from the winning tri via fused-free route:
        # use the record's u/v plane — cheap proxy: reflect about +y
        # jittered (terrain normals point up); exactness doesn't matter
        # for an engine A/B, the DIRECTION DISTRIBUTION does
        key = jax.random.PRNGKey(0)
        u = jax.random.uniform(key, (orig.shape[0], 2))
        r = jnp.sqrt(u[:, 0:1])
        phi = 2.0 * np.pi * u[:, 1:2]
        d = jnp.concatenate([r * jnp.cos(phi), jnp.sqrt(1.0 - u[:, 0:1]),
                             r * jnp.sin(phi)], axis=1)
        d = vm.normalize(d, eps=1e-30)
        o = p + d * 1e-3
        return o, d, rec["hit"]

    o_b, d_b, alive = bounce_wave(tree, orig, dirs)
    o_b = jax.device_put(jax.block_until_ready(o_b), dev)

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
        log(f"{name}: compile {comp:5.1f}s  wave {(tk-t1)/reps*1e3:7.2f} ms"
            f"  chk={chk2:.6g}")

    def bundle(n, mwin, o, d, act):
        def body(i, c):
            perm, inv = sort_rays(o + c * 1e-38, d, alive=act)
            rec = traverse_plist_bundle(mwin, (o + c * 1e-38)[perm],
                                        d[perm], active=act[perm])
            return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def walk(n, tree, o, d, act):
        def body(i, c):
            rec = traverse_fast(tree, tree.quads, o + c * 1e-38, d,
                                active=act)
            return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def walk_sorted(n, tree, o, d, act):
        def body(i, c):
            perm, inv = sort_rays(o + c * 1e-38, d, alive=act)
            rec = traverse_fast(tree, tree.quads, (o + c * 1e-38)[perm],
                                d[perm], active=act[perm])
            return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # engine selection via PROBE_ENGINES: the fat-leaf (3072) rope walk
    # is excluded by default — a single leaf costs ~768 masked
    # iterations per ray and the 5-frame chained program crashed the
    # remote worker (watchdog); the walk engines belong on the
    # walk-tuned small-leaf tree
    engines = os.environ.get("PROBE_ENGINES", "a,d,ds").split(",")
    if "a" in engines:
        timeit("a) bundle plist     ", jax.jit(bundle), tree.mwin, o_b,
               d_b, alive)
    if "c" in engines:
        timeit("c) rope walk (fat)  ", jax.jit(walk), tree, o_b, d_b,
               alive)
    if "d" in engines:
        timeit("d) walk, leaf16 tree", jax.jit(walk), wtree, o_b, d_b,
               alive)
    if "ds" in engines:
        timeit("d') leaf16 sorted   ", jax.jit(walk_sorted), wtree, o_b,
               d_b, alive)


def ab_walk128():
    """Same-session A/B: leaf-16 walk with vs without the fused
    one-gather walk table (build_walk_table) on the terrain bounce
    wave. Run: PROBE_AB128=1 python probes/probe_surface_bounce.py"""
    import jax
    import jax.numpy as jnp
    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, \
        generate_rays
    from clpathtracer_tpu.ops.traverse_fast import (build_walk_table,
                                                    traverse_fast)
    from clpathtracer_tpu.scene.procedural import terrain_mesh
    import time

    res, reps = 512, 4
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        scene = terrain_mesh(1_000_000, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        wtree = build_kd_tree(tv, max_depth=26, leaf_size=16, tri_block=4)
        w128 = build_walk_table(np.asarray(wtree.node_table),
                                np.asarray(wtree.quads))
    wtree = jax.device_put(wtree, dev)
    wt = wtree.replace(walk128=jax.device_put(jnp.asarray(w128), dev))
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(res * res, 3)).astype(np.float32)
    bd[:, 1] = np.abs(bd[:, 1])  # upward hemisphere off the terrain
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    d_b = jax.device_put(jnp.asarray(bd), dev)
    act = jax.device_put(jnp.asarray(
        rng.uniform(size=(res * res,)) < 0.9), dev)
    # origins just above the terrain surface: reuse primary hits
    from clpathtracer_tpu.ops.traverse_fast import traverse_fast as tf

    @jax.jit
    def hits(tree, orig, dirs):
        rec = tf(tree, tree.quads, orig, dirs)
        t = jnp.where(rec["hit"], rec["t"], 0.0)
        return orig + t[:, None] * dirs + 1e-3 * jnp.array([0, 1, 0.0])
    o_b = jax.block_until_ready(hits(wtree, orig, dirs))

    def mk(tree):
        def f(n, tree, o, d, act):
            def body(i, c):
                rec = tf(tree, tree.quads, o + c * 1e-38, d, active=act)
                return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(f)

    def timeit(name, f, tree):
        t0 = time.time()
        chk = float(f(1, tree, o_b, d_b, act))
        comp = time.time() - t0
        t0 = time.time()
        _ = float(f(1, tree, o_b, d_b, act))
        t1 = time.time() - t0
        t0 = time.time()
        chk2 = float(f(1 + reps, tree, o_b, d_b, act))
        tk = time.time() - t0
        log(f"{name}: compile {comp:5.1f}s  wave {(tk-t1)/reps*1e3:7.2f}"
            f" ms  chk={chk2:.6g}")

    fa = mk(wtree)
    fb = mk(wt)
    timeit("A two-gather walk", fa, wtree)
    timeit("B fused walk128  ", fb, wt)
    timeit("A two-gather walk", fa, wtree)
    timeit("B fused walk128  ", fb, wt)


if os.environ.get("PROBE_AB128") == "1":
    main = ab_walk128  # noqa: F811

if __name__ == "__main__":
    main()
