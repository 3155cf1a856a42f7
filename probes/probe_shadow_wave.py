"""Isolate one NEE shadow wave on the chip: traverse_fast with t_max on
fog-interior origins and per-lane random light directions — the
configuration that dominates the path-mode frame (2x ~1.2s of 3.49s).

Variants: unsorted (the integrator today), Morton-sorted, compact
on/off, a max_iters sweep, and any_hit occlusion mode; PROBE_LEAF /
PROBE_DEPTH re-tune the kd tree for the walk (in path mode the tree
serves ONLY shadow rays — primaries/bounces ride plist — so a
walk-tuned build is free to differ from the packet-tuned one).

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_shadow_wave.py
"""

import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops.sort import sort_rays
    from clpathtracer_tpu.ops.traverse_fast import traverse_fast
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    ntris = int(os.environ.get("PROBE_TRIS", 1_000_000))
    res = int(os.environ.get("PROBE_RES", 512))
    reps = int(os.environ.get("PROBE_REPS", 5))
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")

    with jax.default_device(cpu):
        scene = random_tri_soup(ntris, seed=0, extent=10.0, tri_size=0.01)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        leaf = int(os.environ.get("PROBE_LEAF", 512))
        depth = int(os.environ.get("PROBE_DEPTH", 14))
        tree = build_kd_tree(tv, max_depth=depth, leaf_size=leaf,
                             tri_block=4)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        # primary hit points as shadow origins (host-side oracle trace is
        # too slow at 1M; approximate: points along each primary ray at a
        # fog-typical depth plus noise — same spatial statistics)
        rng = np.random.default_rng(0)
        depth = rng.uniform(18.0, 30.0, (res * res, 1)).astype(np.float32)
        o_np = np.asarray(orig) + np.asarray(dirs) * depth
        # per-lane random light points in the fog volume
        lp = rng.uniform(-10, 10, (res * res, 3)).astype(np.float32)
        to_l = lp - o_np
        dist_np = np.linalg.norm(to_l, axis=1)
        d_np = to_l / np.maximum(dist_np[:, None], 1e-9)
        act_np = rng.uniform(size=(res * res,)) < 0.7

    o = jax.device_put(jnp.asarray(o_np), dev)
    d = jax.device_put(jnp.asarray(d_np), dev)
    dist = jax.device_put(jnp.asarray(dist_np), dev)
    act = jax.device_put(jnp.asarray(act_np), dev)
    tree = jax.device_put(tree, dev)
    quads = tree.quads

    def occ_wave(tree, quads, o, d, dist, act, sort, compact, max_iters,
                 anyh):
        if sort:
            perm, inv = sort_rays(o, d, alive=act)
            o, d, dist, act = o[perm], d[perm], dist[perm], act[perm]
        rec = traverse_fast(tree, quads, o, d, max_iters=max_iters,
                            compact=compact, t_max=dist - 1e-3,
                            active=act, any_hit=anyh)
        occ = rec["hit"]
        if sort:
            occ = occ[inv]
        return occ, rec["steps"]

    combos = os.environ.get(
        "PROBE_COMBOS",
        "0:1:16384:0,0:1:16384:1,1:1:16384:1").split(",")
    for combo in combos:
        s, c, m, ah = (combo.split(":") + ["0"])[:4]
        for sort, compact, mi, anyh in [
                (s == "1", c == "1", int(m), ah == "1")]:
                def chain(n, tree, quads, o, d, dist, act):
                    def body(i, c):
                        occ, st = occ_wave(tree, quads, o + c[0] * 1e-38,
                                           d, dist, act, sort, compact,
                                           mi, anyh)
                        return (jnp.sum(occ.astype(jnp.float32)),
                                jnp.mean(st.astype(jnp.float32)),
                                jnp.max(st))
                    z = (jnp.float32(0.0), jnp.float32(0.0), jnp.int32(0))
                    return jax.lax.fori_loop(0, n, body, z)

                jf = jax.jit(chain)
                t0 = time.time()
                out = jf(1, tree, quads, o, d, dist, act)
                chk = float(out[0])
                comp = time.time() - t0
                t0 = time.time()
                _ = float(jf(1, tree, quads, o, d, dist, act)[0])
                t1 = time.time() - t0
                t0 = time.time()
                out = jf(1 + reps, tree, quads, o, d, dist, act)
                chk2 = float(out[0])
                tk = time.time() - t0
                wave = max((tk - t1) / reps, 1e-9)
                print(json.dumps({
                    "sort": sort, "compact": compact, "max_iters": mi,
                    "any_hit": anyh,
                    "leaf": int(os.environ.get("PROBE_LEAF", 512)),
                    "wave_ms": wave * 1e3,
                    "us_per_ray": wave / (res * res) * 1e6,
                    "occluded_frac": chk / (res * res * 0.7),
                    "steps_mean": float(out[1]),
                    "steps_max": int(out[2]),
                    "compile_s": comp}), flush=True)


if __name__ == "__main__":
    main()
