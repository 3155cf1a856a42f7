"""Probe: packet-kernel work breakdown on the real chip.

Emits JSON lines with per-tile node-visit / leaf-chunk distributions and
rays/s for several (leaf_size, tile) configs on the 1M-tri bench scene —
the denominators VERDICT r1 asked for, measured before kernel surgery.

Run: env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_packet_stats.py
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
    reps = int(os.environ.get("PROBE_REPS", 5))
    configs = os.environ.get(
        "PROBE_CFGS", "512:14:256,512:14:1024,128:18:256").split(",")

    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops.packet import packet_mode, traverse_packet
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")

    with jax.default_device(cpu):
        t0 = time.time()
        scene = random_tri_soup(ntris, seed=0, extent=10.0, tri_size=0.01)
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        cam = Camera.create(position=[0.0, 0.0, -25.0],
                            forward=[0.0, 0.0, 1.0])
        ci = cam_matrix(cam, res)
        orig, dir = generate_rays(ci, res, res)
        log(f"# scene gen {time.time()-t0:.1f}s")
    orig = jax.device_put(orig, dev)
    dir = jax.device_put(dir, dev)

    # tunnel rtt floor
    triv = jax.jit(lambda x: x + 1.0)
    _ = float(triv(jnp.float32(0.0)))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = float(triv(jnp.float32(1.0)))
        rtts.append(time.time() - t0)
    rtt = min(rtts)
    log(f"# rtt {rtt*1e3:.1f}ms")

    trees = {}
    for cfg in configs:
        leaf, depth, tile = (int(x) for x in cfg.split(":"))
        key = (leaf, depth)
        if key not in trees:
            t0 = time.time()
            with jax.default_device(cpu):
                tree = build_kd_tree(tv, max_depth=depth, leaf_size=leaf,
                                     tri_block=4)
            log(f"# build leaf={leaf} depth={depth}: {time.time()-t0:.1f}s "
                f"{tree.stats()}")
            trees[key] = (jax.device_put(tree, dev), tree.stats())
        tree, stats = trees[key]

        mode = packet_mode(tree, res * res, tile)
        log(f"# cfg leaf={leaf} depth={depth} tile={tile} mode={mode}")

        def run(orig, dir, tree=tree, tile=tile):
            rec = traverse_packet(tree, tree.quads, orig, dir,
                                  image_shape=(res, res), tile=tile)
            ok = rec["hit"]
            chk = jnp.sum(jnp.where(ok, rec["t"], 0.0))
            return chk, jnp.sum(rec["tri"] % 97), rec["tile_stats"]

        jf = jax.jit(run)
        t0 = time.time()
        chk, tchk, tstats = jf(orig, dir)
        chk = float(chk)
        compile_s = time.time() - t0
        tstats = np.asarray(tstats)
        log(f"# compile+run {compile_s:.1f}s checksum {chk:.6g}/{int(tchk)}")

        times = []
        for _ in range(reps):
            t0 = time.time()
            out = jf(orig, dir)
            _ = float(out[0])
            times.append(time.time() - t0)
        best = max(min(times) - rtt, 1e-9)

        nv, nl = tstats[:, 0], tstats[:, 1]
        n_rays = res * res
        n_tiles = n_rays // tile
        chunk_tris = 64 if mode in ("tri_stream", "wide") else None
        rec = {
            "cfg": {"leaf": leaf, "depth": depth, "tile": tile,
                    "mode": mode, "tris": ntris, "res": res},
            "tree": stats,
            "rays_per_s": n_rays / best,
            "frame_s": best,
            "compile_s": compile_s,
            "node_visits": {"mean": float(nv.mean()), "p50": float(np.median(nv)),
                            "p90": float(np.percentile(nv, 90)),
                            "max": float(nv.max()), "sum": float(nv.sum())},
            "leaf_chunks": {"mean": float(nl.mean()), "p50": float(np.median(nl)),
                            "p90": float(np.percentile(nl, 90)),
                            "max": float(nl.max()), "sum": float(nl.sum())},
            "derived": {
                "node_pops_per_s": float(nv.sum()) / best,
                "chunks_per_s": float(nl.sum()) / best,
                "tri_tests_per_s": (float(nl.sum()) * chunk_tris * tile / best
                                    if chunk_tris else
                                    float(nl.sum()) * leaf * tile / best),
                "tests_per_ray": (float(nl.sum()) * chunk_tris * tile / n_rays
                                  if chunk_tris else None),
                "hbm_gb_per_frame": (float(nl.sum()) * 4096 / 1e9
                                     if chunk_tris else 0.0),
                "us_per_tile": best / n_tiles * 1e6,
                "us_per_pop": best / max(nv.sum(), 1) * 1e6,
            },
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
