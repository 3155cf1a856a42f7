"""Probe: wavefront-compaction payoff on the real chip.

Measures the packet engine on a 1M-tri soup with (a) all rays alive,
(b) 50% dead UNSORTED (dead lanes scattered — old behavior: every tile
still traverses), (c) 50% dead SORTED (ops/sort.py clusters dead rays
into tail tiles the kernel skips — the integrator's bounce path).
The (b)/(c) ratio is the compaction win the VERDICT r1 #3 criterion
asks to demonstrate (≳2x at ~50% dead).

Run: env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_compaction.py
"""

import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ntris = int(os.environ.get("PROBE_TRIS", 1_000_000))
    res = int(os.environ.get("PROBE_RES", 512))
    reps = int(os.environ.get("PROBE_REPS", 10))
    tile = int(os.environ.get("PROBE_TILE", 256))

    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops.packet import traverse_packet
    from clpathtracer_tpu.ops.sort import sort_rays
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log("# building scene (cpu)")
    with jax.default_device(cpu):
        scene = random_tri_soup(ntris, seed=0, extent=10.0, tri_size=0.01)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, max_depth=14, leaf_size=512, tri_block=4)
        ci = cam_matrix(Camera.create(position=[0.0, 0.0, -25.0],
                                      forward=[0.0, 0.0, 1.0]), res)
        orig, dir = generate_rays(ci, res, res)
        alive_np = np.random.default_rng(0).random(res * res) < 0.5
        # ship as f32 (bool-array transfers have wedged the tunnel);
        # cast back to bool inside the jitted chain
        alive = jnp.asarray(alive_np, jnp.float32)
    log("# putting tree")
    tree = jax.device_put(tree, dev)
    log("# putting rays")
    orig = jax.device_put(orig, dev)
    dir = jax.device_put(dir, dev)
    alive = jax.device_put(alive, dev)
    # NO eager device ops here — they wedge the tunnel (CLAUDE.md)
    log(f"# tree {tree.stats()['nodes']} nodes; alive "
        f"{alive_np.mean():.2f}")

    def variant(kind):
        def chain(n, tree, quads, orig, dir, alive_f):
            alive = alive_f > 0.5
            def body(i, c):
                chk = c
                eps = chk * 1e-38
                o = orig + eps
                if kind == "all":
                    rec = traverse_packet(tree, quads, o, dir,
                                          image_shape=(res, res), tile=tile)
                elif kind == "dead_unsorted":
                    rec = traverse_packet(tree, quads, o, dir,
                                          image_shape=(res, res), tile=tile,
                                          active=alive)
                else:  # dead_sorted — the integrator's bounce path
                    perm, inv = sort_rays(o, dir, alive=alive)
                    rec = traverse_packet(tree, quads, o[perm], dir[perm],
                                          tile=tile, active=alive[perm])
                    rec = {"hit": rec["hit"][inv], "t": rec["t"][inv]}
                return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(chain)

    out = {}
    for kind in ("all", "dead_unsorted", "dead_sorted"):
        jf = variant(kind)
        t0 = time.time()
        chk = float(jf(1, tree, tree.quads, orig, dir, alive))
        compile_s = time.time() - t0
        t0 = time.time()
        _ = float(jf(1, tree, tree.quads, orig, dir, alive))
        t1 = time.time() - t0
        t0 = time.time()
        chk2 = float(jf(1 + reps, tree, tree.quads, orig, dir, alive))
        tk = time.time() - t0
        frame = max((tk - t1) / reps, 1e-9)
        out[kind] = frame
        log(f"# {kind}: compile {compile_s:.1f}s frame {frame*1e3:.1f}ms "
            f"chk {chk:.6g}/{chk2:.6g}")

    print(json.dumps({
        "frames_ms": {k: v * 1e3 for k, v in out.items()},
        "compaction_speedup_vs_unsorted":
            out["dead_unsorted"] / out["dead_sorted"],
        "sorted_vs_full": out["all"] / out["dead_sorted"],
    }), flush=True)


if __name__ == "__main__":
    main()
