"""Chip probe: uniform-grid DDA walk (ops/grid_walk.py) vs the incumbent
engines on the two incoherent path-mode waves of the emissive-soup gate:

  shadow  — fog-interior origins, per-lane random light directions,
            any_hit occlusion with t_max (incumbent: walk-tuned shadow
            kd-tree + traverse_fast any_hit, 0.615 s/wave measured)
  bounce  — fog-interior origins, random unit directions, nearest hit
            (incumbent: Morton-sorted traverse_plist_bundle,
            ~0.49 s/wave as half of the 0.97 s two-wave pass)

Sweeps grid density (tris per cell). Timing per the chained-frame
protocol (bench.py): one compiled fori_loop, (t(1+k)-t(1))/k.

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_grid.py
"""

import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(jf, args, reps):
    t0 = time.time()
    out = jf(1, *args)
    chk = float(out[0])
    comp = time.time() - t0
    t0 = time.time()
    float(jf(1, *args)[0])
    t1 = time.time() - t0
    t0 = time.time()
    out = jf(1 + reps, *args)
    chk2 = float(out[0])
    tk = time.time() - t0
    return chk, chk2, comp, max((tk - t1) / reps, 1e-9), [
        float(x) for x in out[1:]]


def main():
    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.accel.grid import build_grid
    from clpathtracer_tpu.accel.sah import (attach_morton_windows,
                                            build_kd_tree)
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, \
        generate_rays
    from clpathtracer_tpu.ops.grid_walk import traverse_grid
    from clpathtracer_tpu.ops.sort import sort_rays
    from clpathtracer_tpu.ops.traverse_fast import traverse_fast
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    ntris = int(os.environ.get("PROBE_TRIS", 1_000_000))
    res = int(os.environ.get("PROBE_RES", 512))
    reps = int(os.environ.get("PROBE_REPS", 5))
    wave = os.environ.get("PROBE_WAVE", "shadow,bounce").split(",")
    densities = [float(x) for x in os.environ.get(
        "PROBE_DENS", "0.5,1,2,4").split(",")]
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")

    with jax.default_device(cpu):
        scene = random_tri_soup(ntris, seed=0, extent=10.0, tri_size=0.01)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        rng = np.random.default_rng(0)
        dpt = rng.uniform(18.0, 30.0, (res * res, 1)).astype(np.float32)
        o_np = np.asarray(orig) + np.asarray(dirs) * dpt
        lp = rng.uniform(-10, 10, (res * res, 3)).astype(np.float32)
        to_l = lp - o_np
        dist_np = np.linalg.norm(to_l, axis=1)
        d_np = to_l / np.maximum(dist_np[:, None], 1e-9)
        # bounce wave: random unit dirs, ~70% alive (post-first-bounce)
        bd = rng.normal(size=(res * res, 3)).astype(np.float32)
        bd /= np.linalg.norm(bd, axis=1, keepdims=True)
        act_np = rng.uniform(size=(res * res,)) < 0.7

    o = jax.device_put(jnp.asarray(o_np), dev)
    d = jax.device_put(jnp.asarray(d_np), dev)
    bdir = jax.device_put(jnp.asarray(bd), dev)
    dist = jax.device_put(jnp.asarray(dist_np), dev)
    act = jax.device_put(jnp.asarray(act_np), dev)

    layouts = os.environ.get("PROBE_LAYOUTS", "inline,split").split(",")
    grids = {}
    for dens in densities:
        for layout in layouts:
            t0 = time.time()
            with jax.default_device(cpu):
                g = build_grid(tv, density=dens, layout=layout)
            log(f"# grid dens={dens} {layout}: {time.time()-t0:.1f}s "
                f"{g.stats()}")
            grids[(dens, layout)] = jax.device_put(g, dev)

    if "shadow" in wave:
        # incumbent: walk-tuned kd tree, any_hit (bench path gate config)
        with jax.default_device(cpu):
            stree = build_kd_tree(tv, max_depth=26, leaf_size=16,
                                  tri_block=4)
        stree = jax.device_put(stree, dev)

        def kd_chain(n, tree, o, d, dist, act):
            def body(i, c):
                rec = traverse_fast(tree, tree.quads, o + c[0] * 1e-38, d,
                                    t_max=dist - 1e-3, active=act,
                                    any_hit=True)
                return (jnp.sum(rec["hit"].astype(jnp.float32)),
                        jnp.mean(rec["steps"].astype(jnp.float32)))
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.float32(0), jnp.float32(0)))

        chk, chk2, comp, t, extra = timed(
            jax.jit(kd_chain), (stree, o, d, dist, act), reps)
        print(json.dumps({"wave": "shadow", "engine": "kd16_anyhit",
                          "s": round(t, 4), "occ": chk, "occ2": chk2,
                          "compile_s": round(comp, 1),
                          "steps_mean": extra[0]}), flush=True)

        for (dens, layout), g in grids.items():
            def g_chain(n, g, o, d, dist, act):
                def body(i, c):
                    rec = traverse_grid(g, o + c[0] * 1e-38, d,
                                        t_max=dist - 1e-3, active=act,
                                        any_hit=True)
                    return (jnp.sum(rec["hit"].astype(jnp.float32)),
                            jnp.mean(rec["steps"].astype(jnp.float32)))
                return jax.lax.fori_loop(0, n, body,
                                         (jnp.float32(0), jnp.float32(0)))

            chk, chk2, comp, t, extra = timed(
                jax.jit(g_chain), (g, o, d, dist, act), reps)
            print(json.dumps({"wave": "shadow", "engine": "grid",
                              "layout": layout,
                              "density": dens, "s": round(t, 4),
                              "occ": chk, "occ2": chk2,
                              "compile_s": round(comp, 1),
                              "steps_mean": extra[0]}), flush=True)

    if "bounce" in wave:
        if os.environ.get("PROBE_SKIP_INCUMBENT") != "1":
            # incumbent: Morton-sorted bundle plist (integrator bounce
            # route before the grid)
            with jax.default_device(cpu):
                btree = build_kd_tree(tv, max_depth=14, leaf_size=512,
                                      tri_block=4)
            btree = jax.device_put(btree, dev)
            btree = attach_morton_windows(btree, tv, win_rows=8,
                                          with_so=True)
            from clpathtracer_tpu.ops.plist import traverse_plist_bundle

            def pb_chain(n, mwin, o, d, act):
                def body(i, c):
                    perm, inv = sort_rays(o + c[0] * 1e-38, d, alive=act)
                    rec = traverse_plist_bundle(
                        mwin, (o + c[0] * 1e-38)[perm], d[perm],
                        active=act[perm])
                    t = jnp.where(rec["hit"], rec["t"], 0.0)
                    return (jnp.sum(t), jnp.float32(0))
                return jax.lax.fori_loop(0, n, body,
                                         (jnp.float32(0), jnp.float32(0)))

            chk, chk2, comp, t, _ = timed(
                jax.jit(pb_chain), (btree.mwin, o, bdir, act), reps)
            print(json.dumps({"wave": "bounce", "engine": "plist_bundle",
                              "s": round(t, 4), "tsum": chk, "tsum2": chk2,
                              "compile_s": round(comp, 1)}), flush=True)

        sorts = ((False, True) if os.environ.get("PROBE_SORTS", "1") == "1"
                 else (False,))
        for (dens, layout), g in grids.items():
            for sort in sorts:
                def gb_chain(n, g, o, d, act):
                    def body(i, c):
                        oo = o + c[0] * 1e-38
                        if sort:
                            perm, inv = sort_rays(oo, d, alive=act)
                            rec = traverse_grid(g, oo[perm], d[perm],
                                                active=act[perm])
                            t = jnp.where(rec["hit"], rec["t"], 0.0)[inv]
                            st = rec["steps"][inv]
                        else:
                            rec = traverse_grid(g, oo, d, active=act)
                            t = jnp.where(rec["hit"], rec["t"], 0.0)
                            st = rec["steps"]
                        return (jnp.sum(t),
                                jnp.mean(st.astype(jnp.float32)))
                    return jax.lax.fori_loop(0, n, body,
                                             (jnp.float32(0),
                                              jnp.float32(0)))

                chk, chk2, comp, t, extra = timed(
                    jax.jit(gb_chain), (g, o, bdir, act), reps)
                print(json.dumps({"wave": "bounce", "engine": "grid",
                                  "layout": layout,
                                  "density": dens, "sorted": sort,
                                  "s": round(t, 4), "tsum": chk,
                                  "tsum2": chk2,
                                  "compile_s": round(comp, 1),
                                  "steps_mean": extra[0]}), flush=True)


if __name__ == "__main__":
    main()
