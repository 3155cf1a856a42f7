"""Chip A/B: median-split vs Morton-cut window partitions (plist).

Both partitions have IDENTICAL shapes, so one compiled program serves
both (the tables are arguments) — the cleanest possible same-session
interleaved A/B (ARCHITECTURE round-4: identical programs drift
+-15-20% across sessions; alternation cancels it). Reports frame time,
streamed windows/gate and consumed supers/gate for each order.

  env PYTHONPATH=/root/.axon_site:/root/repo \
      python probes/probe_partition_ab.py [terrain|soup]
  PROBE_TRIS=10000000 PROBE_WIN_ROWS=16 ... for the 10M config
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
    win_rows = int(os.environ.get("PROBE_WIN_ROWS", 8))

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

    # PROBE_SEQ=1: scenes whose two SO-attached tables cannot be HBM-
    # resident together (10M tris) upload one order at a time; the
    # compiled program is still shared (identical shapes).
    seq = bool(int(os.environ.get("PROBE_SEQ", "0")))
    use_so = bool(int(os.environ.get("PROBE_SO", "1")))
    host_mwins = {}
    for order in ("median", "morton"):
        t0 = time.time()
        mw = pls.build_morton_windows(tv, win_rows=win_rows, order=order)
        log(f"# {order} build {time.time()-t0:.1f}s "
            f"windows={mw.num_windows}")
        host_mwins[order] = mw
    assert (host_mwins["median"].tris128.shape
            == host_mwins["morton"].tris128.shape)

    mwins = {}

    def get_mwin(order):
        if seq:
            for o in list(mwins):
                if o != order:
                    del mwins[o]
        if order not in mwins:
            t0 = time.time()
            mw = jax.device_put(host_mwins[order], dev)
            if use_so:
                mw = pls.attach_so(mw)
            mwins[order] = mw
            log(f"# {order} upload{'+so' if use_so else ''} "
                f"{time.time()-t0:.1f}s")
        return mwins[order]

    def chain(n, mwin, orig, dirs):
        def body(i, c):
            chk, _, _ = c
            eps = chk * 1e-38
            rec = pls.traverse_plist(mwin, orig + eps, dirs, (res, res))
            chk = jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
            t2 = jnp.sum(rec["tri"] % 97).astype(jnp.float32)
            return (chk, t2, rec["tile_stats"])
        z = (jnp.float32(0.0), jnp.float32(0.0),
             jnp.zeros((res * res // pls.GATE, 5), jnp.float32))
        return jax.lax.fori_loop(0, n, body, z)

    jf = jax.jit(chain)
    t0 = time.time()
    chk = {o: float(jf(1, get_mwin(o), orig, dirs)[0])
           for o in ("median", "morton")}
    log(f"# compile+first {time.time()-t0:.1f}s checksums {chk}")

    frames = {"median": [], "morton": []}
    stats = {}
    for r in range(rounds):
        for o in ("median", "morton"):
            mw = get_mwin(o)
            t0 = time.time()
            _ = float(jf(1, mw, orig, dirs)[0])
            t1 = time.time() - t0
            t0 = time.time()
            out = jf(1 + reps, mw, orig, dirs)
            c2 = float(out[0])
            tk = time.time() - t0
            best = max((tk - t1) / reps, 1e-9)
            frames[o].append(best)
            stats[o] = np.asarray(out[2])
            log(f"# round {r} {o:6s}: frame {best*1e3:.2f}ms "
                f"(chk {c2:.6g})")

    span = win_rows * 8
    n_rays = res * res
    res_j = {}
    for o in ("median", "morton"):
        best = min(frames[o])
        ns = stats[o][:, 1]
        res_j[o] = {
            "frame_ms": [round(f * 1e3, 2) for f in frames[o]],
            "best_ms": best * 1e3,
            "rays_per_s": n_rays / best,
            "windows_per_gate": float(ns.mean()),
            "supers_per_gate": float(stats[o][:, 3].mean()),
            "tests_per_ray": float(ns.sum()) * span * pls.GATE / n_rays,
        }
    res_j["cfg"] = {"scene": scene_kind, "tris": ntris, "res": res,
                    "win_rows": win_rows}
    res_j["speedup"] = (res_j["morton"]["best_ms"]
                        / res_j["median"]["best_ms"])
    print(json.dumps(res_j), flush=True)


if __name__ == "__main__":
    main()
