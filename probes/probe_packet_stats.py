"""Probe: packet-kernel work breakdown on the real chip.

Emits JSON lines with per-tile node-visit / leaf-chunk distributions and
rays/s for several (leaf_size, depth, tile, engine) configs on the 1M-tri
bench scene — the denominators VERDICT r1 asked for, measured before/after
kernel surgery.

Timing protocol: the tunnel's device→host fetch latency is unpredictable
(30 ms on a good day, ~90 s when congested), so instead of per-rep fetches
the probe compiles ONE function that runs `n` data-chained renders
(lax.fori_loop with a traced bound — each iteration's rays are perturbed
by the previous checksum so XLA cannot parallelize) and times wall(n=1)
vs wall(n=1+K): per-frame = (tK - t1)/K, fetch latency cancels.

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
    reps = int(os.environ.get("PROBE_REPS", 10))
    configs = os.environ.get(
        "PROBE_CFGS",
        # current per-scene optima first (terrain / soup), then the
        # historical comparison points
        "3072:11:2048:stream:1,512:14:512:stream:1,"
        "512:14:256:stream,512:14:256:legacy").split(",")

    scene_kind = os.environ.get("PROBE_SCENE", "soup")

    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops.packet import packet_mode, traverse_packet
    from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh

    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")

    with jax.default_device(cpu):
        t0 = time.time()
        if scene_kind == "terrain":
            scene = terrain_mesh(ntris, seed=0, extent=10.0)
            cam = Camera.create(position=[0.0, 14.0, 0.0],
                                forward=[0.0, -1.0, 0.01])
        else:
            scene = random_tri_soup(ntris, seed=0, extent=10.0,
                                    tri_size=0.01)
            cam = Camera.create(position=[0.0, 0.0, -25.0],
                                forward=[0.0, 0.0, 1.0])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        ci = cam_matrix(cam, res)
        orig, dir = generate_rays(ci, res, res)
        log(f"# scene gen {time.time()-t0:.1f}s kind={scene_kind}")
    orig = jax.device_put(orig, dev)
    dir = jax.device_put(dir, dev)
    log("# rays on device")

    trees = {}
    for cfg in configs:
        parts = cfg.split(":")
        leaf, depth, tile = int(parts[0]), int(parts[1]), int(parts[2])
        engine = parts[3] if len(parts) > 3 else "auto"
        cfg_so = parts[4] if len(parts) > 4 else None
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

        mode = packet_mode(tree, res * res, tile, engine=engine)
        log(f"# cfg leaf={leaf} depth={depth} tile={tile} engine={engine} "
            f"mode={mode}")
        n_tiles = res * res // tile

        so = (cfg_so in ("1", "rows") if cfg_so is not None
              else os.environ.get("PROBE_SO") == "1")
        if so and cfg_so != "rows":
            # production SO path: affine tables ("rows" forces the legacy
            # per-frame so_rows pass for comparison)
            from clpathtracer_tpu.accel.sah import attach_so_tables
            t0 = time.time()
            tree = attach_so_tables(tree)
            log(f"# so tables: {time.time()-t0:.1f}s")

        def chain(n, tree, quads, orig, dir, tile=tile, engine=engine):
            def body(i, c):
                chk, _, _ = c
                eps = chk * 1e-38
                rec = traverse_packet(tree, quads, orig + eps, dir,
                                      image_shape=(res, res), tile=tile,
                                      engine=engine, shared_origin=so,
                                      grid_dirs=so)
                ok = rec["hit"]
                chk = jnp.sum(jnp.where(ok, rec["t"], 0.0))
                t2 = jnp.sum(rec["tri"] % 97).astype(jnp.float32)
                return (chk, t2, rec["tile_stats"])
            z = (jnp.float32(0.0), jnp.float32(0.0),
                 jnp.zeros((n_tiles, 5), jnp.float32))
            return jax.lax.fori_loop(0, n, body, z)

        jf = jax.jit(chain)

        t0 = time.time()
        out = jf(1, tree, tree.quads, orig, dir)
        chk = float(out[0])
        compile_s = time.time() - t0
        log(f"# compile+first {compile_s:.1f}s checksum {chk:.6g}")

        t0 = time.time()
        out = jf(1, tree, tree.quads, orig, dir)
        _ = float(out[0])
        t1 = time.time() - t0
        t0 = time.time()
        out = jf(1 + reps, tree, tree.quads, orig, dir)
        chk2 = float(out[0])
        tk = time.time() - t0
        best = max((tk - t1) / reps, 1e-9)
        log(f"# t1={t1:.2f}s t{1+reps}={tk:.2f}s -> frame {best*1e3:.1f}ms "
            f"(chk {chk2:.6g})")
        if abs(chk2 - chk) > 1e-3 * abs(chk):
            log("# WARNING checksum drift across chain")

        tstats = np.asarray(out[2])
        nv, nl, ncul = tstats[:, 0], tstats[:, 1], tstats[:, 3]
        # strip-gated stream kernel: lane 4 counts 128-ray strip-MT
        # executions (the true dense-work unit); ungated smem kernels
        # write streamed windows there (x tile rays each)
        strip_gated = (so and engine == "stream"
                       and os.environ.get("CLPT_STRIPS", "1") != "0"
                       and tstats[:, 4].sum() > 0
                       and tstats[:, 4].sum() != nl.sum())
        test_rays = 512 if strip_gated else tile  # 512-lane gates
        n_tests = (tstats[:, 4].sum() if strip_gated else nl.sum())
        n_rays = res * res
        from clpathtracer_tpu.ops.packet import CHUNK_ROWS
        chunk_tris = CHUNK_ROWS * 8
        rec = {
            "cfg": {"scene": scene_kind, "so": so,
                    "leaf": leaf, "depth": depth, "tile": tile,
                    "engine": engine, "mode": mode, "tris": ntris,
                    "res": res},
            "tree": stats,
            "rays_per_s": n_rays / best,
            "frame_s": best,
            "compile_s": compile_s,
            "node_visits": {"mean": float(nv.mean()),
                            "p50": float(np.median(nv)),
                            "p90": float(np.percentile(nv, 90)),
                            "max": float(nv.max()), "sum": float(nv.sum())},
            "leaf_chunks": {"mean": float(nl.mean()),
                            "p50": float(np.median(nl)),
                            "p90": float(np.percentile(nl, 90)),
                            "max": float(nl.max()), "sum": float(nl.sum())},
            "culled_windows": {"mean": float(ncul.mean()),
                               "sum": float(ncul.sum())},
            "derived": {
                "node_pops_per_s": float(nv.sum()) / best,
                "chunks_per_s": float(nl.sum()) / best,
                "tri_tests_per_s": float(n_tests) * chunk_tris
                * test_rays / best,
                "tests_per_ray": float(n_tests) * chunk_tris
                * test_rays / n_rays,
                "strip_gated": bool(strip_gated),
                "hbm_gb_per_frame": float(nl.sum()) * chunk_tris * 64 / 1e9,
                "us_per_tile": best / n_tiles * 1e6,
                "us_per_pop": best / max(float(nv.sum()), 1.0) * 1e6,
            },
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
