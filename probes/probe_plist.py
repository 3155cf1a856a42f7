"""Probe: plist (prepass-list) engine vs the stream engine on the chip.

Times the full plist pipeline (prepass + sort + kernel) on the 1M-tri
bench scenes with the chained-frame protocol, for a sweep of win_rows
and t_upper cadences, and reports streams/gate so the dynamic-culling
effect is visible.

  env PYTHONPATH=/root/.axon_site:/root/repo \
      python probes/probe_plist.py [terrain|soup]
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
    scene_kind = (sys.argv[1] if len(sys.argv) > 1
                  else os.environ.get("PROBE_SCENE", "terrain"))
    win_rows_list = [int(x) for x in os.environ.get(
        "PROBE_WIN_ROWS", "16,8").split(",")]
    engine = os.environ.get("PROBE_ENGINE", "plist")

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
        orig, dir = generate_rays(cam_matrix(cam, res), res, res)
        log(f"# scene gen {time.time()-t0:.1f}s kind={scene_kind}")
    orig = jax.device_put(orig, dev)
    dir = jax.device_put(dir, dev)

    for win_rows in win_rows_list:
        t0 = time.time()
        mwin = pls.build_morton_windows(tv, win_rows=win_rows)
        log(f"# morton build {time.time()-t0:.1f}s win_rows={win_rows} "
            f"windows={mwin.num_windows}")
        mwin = jax.device_put(mwin, dev)
        t0 = time.time()
        mwin = pls.attach_so(mwin)
        log(f"# so tables {time.time()-t0:.1f}s")

        trav = (pls.traverse_plist4 if engine == "plist4"
                else pls.traverse_plist)

        def chain(n, mwin, orig, dir):
            def body(i, c):
                chk, _, _ = c
                eps = chk * 1e-38
                rec = trav(mwin, orig + eps, dir, (res, res))
                chk = jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
                t2 = jnp.sum(rec["tri"] % 97).astype(jnp.float32)
                return (chk, t2, rec["tile_stats"])
            z = (jnp.float32(0.0), jnp.float32(0.0),
                 jnp.zeros((res * res // pls.GATE, 5), jnp.float32))
            return jax.lax.fori_loop(0, n, body, z)

        jf = jax.jit(chain)
        t0 = time.time()
        out = jf(1, mwin, orig, dir)
        chk = float(out[0])
        compile_s = time.time() - t0
        log(f"# compile+first {compile_s:.1f}s checksum {chk:.6g}")
        t0 = time.time()
        _ = float(jf(1, mwin, orig, dir)[0])
        t1 = time.time() - t0
        t0 = time.time()
        out = jf(1 + reps, mwin, orig, dir)
        chk2 = float(out[0])
        tk = time.time() - t0
        best = max((tk - t1) / reps, 1e-9)
        log(f"# t1={t1:.2f}s t{1+reps}={tk:.2f}s -> frame {best*1e3:.1f}ms "
            f"(chk {chk2:.6g})")

        ts = np.asarray(out[2])
        ns = ts[:, 1]
        n_rays = res * res
        span = win_rows * 8
        print(json.dumps({
            "cfg": {"scene": scene_kind, "win_rows": win_rows,
                    "tris": ntris, "res": res, "engine": engine,
                    "tup_every": pls.TUP_EVERY},
            "rays_per_s": n_rays / best,
            "frame_s": best,
            "compile_s": compile_s,
            "streams_per_gate": {"mean": float(ns.mean()),
                                 "p90": float(np.percentile(ns, 90)),
                                 "max": float(ns.max()),
                                 "sum": float(ns.sum())},
            # super-list kernel: lane 3 counts consumed supers
            "supers_per_gate": float(ts[:, 3].mean()),
            "tests_per_ray": float(ns.sum()) * span * pls.GATE / n_rays,
            "tri_tests_per_s": float(ns.sum()) * span * pls.GATE / best,
            "checksum": chk2,
        }), flush=True)


if __name__ == "__main__":
    main()
