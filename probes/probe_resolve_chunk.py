"""Chip A/B: chunked winner-resolve gather vs full-width.

The round-4 gather model says a latency-bound row gather is SUPERLINEAR
in wave width (half-width costs 2.4x less per element) — the grid walk
chunks its waves (CLPT_GRID_CHUNK) and won ~17%. The resolve gather in
_resolve_winners is the last full-width (262k-lane) gather in a
normal-mode plist frame; this probe sweeps chunk sizes with fused
resolve rows attached (the bench configuration). Variants are separate
compiled programs over one window table, interleaved across rounds.

  env PYTHONPATH=/root/.axon_site:/root/repo \
      python probes/probe_resolve_chunk.py [terrain|soup]
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
    rounds = int(os.environ.get("PROBE_ROUNDS", 2))
    scene_kind = (sys.argv[1] if len(sys.argv) > 1
                  else os.environ.get("PROBE_SCENE", "terrain"))
    win_rows = int(os.environ.get(
        "PROBE_WIN_ROWS", "16" if scene_kind == "terrain" else "8"))
    chunks = [int(x) for x in os.environ.get(
        "PROBE_CHUNKS", "0,131072,65536,32768").split(",")]

    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops import plist as pls
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
        scene = scene.bake_shading()
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        log(f"# scene gen {time.time()-t0:.1f}s kind={scene_kind}")
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)

    t0 = time.time()
    mwin = pls.build_morton_windows(tv, win_rows=win_rows)
    mwin = pls.attach_so(jax.device_put(mwin, dev))
    mwin = pls.attach_resolve(mwin, jax.device_put(scene.shade_rows, dev))
    log(f"# windows build+so+resolve {time.time()-t0:.1f}s "
        f"windows={mwin.num_windows} wr={win_rows}")

    def make_chain(chunk):
        def chain(n, mwin, orig, dirs):
            def body(i, c):
                chk, _ = c
                eps = chk * 1e-38
                rec = pls.traverse_plist(mwin, orig + eps, dirs,
                                         (res, res), resolve_chunk=chunk)
                # consume the shade attrs too (the fused-resolve payload)
                chk = jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
                s2 = jnp.sum(jnp.where(rec["hit"][:, None],
                                       rec["snormal"], 0.0))
                return (chk, s2)
            return jax.lax.fori_loop(
                0, n, body, (jnp.float32(0.0), jnp.float32(0.0)))
        return jax.jit(chain)

    jfs = {c: make_chain(c) for c in chunks}
    t0 = time.time()
    chk = {c: tuple(float(x) for x in jf(1, mwin, orig, dirs))
           for c, jf in jfs.items()}
    log(f"# compile+first {time.time()-t0:.1f}s checksums {chk}")
    # per-ray records are BIT-identical (tests/test_plist.py::
    # test_plist_resolve_chunk_bit_parity); the probe's own jnp.sum
    # reduces in a different order under lax.map chunking, so the
    # checksum may differ in the last ulp — compare loosely here
    ref = chk[chunks[0]]
    for c, v in chk.items():
        assert all(abs(a - b) <= 1e-6 * max(abs(a), 1.0)
                   for a, b in zip(v, ref)), (c, v, ref)

    frames = {c: [] for c in chunks}
    for r in range(rounds):
        for c, jf in jfs.items():
            t0 = time.time()
            _ = float(jf(1, mwin, orig, dirs)[0])
            t1 = time.time() - t0
            t0 = time.time()
            out = jf(1 + reps, mwin, orig, dirs)
            c2 = float(out[0])
            tk = time.time() - t0
            best = max((tk - t1) / reps, 1e-9)
            frames[c].append(best)
            log(f"# round {r} chunk={c:6d}: frame {best*1e3:.2f}ms "
                f"(chk {c2:.6g})")

    res_j = {str(c): {"frame_ms": [round(f * 1e3, 2) for f in v],
                      "best_ms": min(v) * 1e3}
             for c, v in frames.items()}
    res_j["cfg"] = {"scene": scene_kind, "tris": ntris, "res": res,
                    "win_rows": win_rows}
    print(json.dumps(res_j), flush=True)


if __name__ == "__main__":
    main()
