"""Chip A/B: d0cull (combine-time zeroing of d0 >= 0 SO records + no
per-pair d0 test in the dense loop) vs the guarded baseline.

The two variants are separate compiled programs (static-arg difference)
over the SAME window tables, interleaved across rounds to cancel the
session drift (ARCHITECTURE round-4 methodology). Expected effect: the
dense SO loop drops ~1 broadcast AND + 1 small compare of its ~22 vector
ops per (ray, tri) pair — measurable only if the loop is issue-bound.
Checksums must be bit-identical (tests/test_plist.py::
test_plist_d0cull_bit_parity proves parity in interpret mode; this probe
re-checks on hardware).

  env PYTHONPATH=/root/.axon_site:/root/repo \
      python probes/probe_d0cull.py [terrain|soup]
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
    rounds = int(os.environ.get("PROBE_ROUNDS", 3))
    scene_kind = (sys.argv[1] if len(sys.argv) > 1
                  else os.environ.get("PROBE_SCENE", "terrain"))
    win_rows = int(os.environ.get(
        "PROBE_WIN_ROWS", "16" if scene_kind == "terrain" else "8"))

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
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        log(f"# scene gen {time.time()-t0:.1f}s kind={scene_kind}")
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)

    t0 = time.time()
    mwin = pls.build_morton_windows(tv, win_rows=win_rows)
    mwin = pls.attach_so(jax.device_put(mwin, dev))
    log(f"# windows build+so {time.time()-t0:.1f}s "
        f"windows={mwin.num_windows} wr={win_rows}")

    def make_chain(d0cull):
        def chain(n, mwin, orig, dirs):
            def body(i, c):
                chk, _, _ = c
                eps = chk * 1e-38
                rec = pls.traverse_plist(mwin, orig + eps, dirs,
                                         (res, res), d0cull=d0cull)
                chk = jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
                t2 = jnp.sum(rec["tri"] % 97).astype(jnp.float32)
                return (chk, t2, rec["tile_stats"])
            z = (jnp.float32(0.0), jnp.float32(0.0),
                 jnp.zeros((res * res // pls.GATE, 5), jnp.float32))
            return jax.lax.fori_loop(0, n, body, z)
        return jax.jit(chain)

    jfs = {"base": make_chain(False), "d0cull": make_chain(True)}
    t0 = time.time()
    chk = {k: float(jf(1, mwin, orig, dirs)[0]) for k, jf in jfs.items()}
    log(f"# compile+first {time.time()-t0:.1f}s checksums {chk}")
    assert chk["base"] == chk["d0cull"], chk

    frames = {"base": [], "d0cull": []}
    for r in range(rounds):
        for k, jf in jfs.items():
            t0 = time.time()
            _ = float(jf(1, mwin, orig, dirs)[0])
            t1 = time.time() - t0
            t0 = time.time()
            out = jf(1 + reps, mwin, orig, dirs)
            c2 = float(out[0])
            tk = time.time() - t0
            best = max((tk - t1) / reps, 1e-9)
            frames[k].append(best)
            log(f"# round {r} {k:6s}: frame {best*1e3:.2f}ms "
                f"(chk {c2:.6g})")

    res_j = {k: {"frame_ms": [round(f * 1e3, 2) for f in v],
                 "best_ms": min(v) * 1e3}
             for k, v in frames.items()}
    res_j["cfg"] = {"scene": scene_kind, "tris": ntris, "res": res,
                    "win_rows": win_rows}
    res_j["speedup"] = (res_j["base"]["best_ms"]
                        / res_j["d0cull"]["best_ms"])
    print(json.dumps(res_j), flush=True)


if __name__ == "__main__":
    main()
