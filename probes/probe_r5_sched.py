"""Chip A/B: plist kernel-schedule knobs under the median partition.

VERDICT r4 #1(b)+(c): the terrain frame is ~pure kernel at 61G of the
~77-86G measured dense ceiling — sweep the schedule levers that could
close that gap, same-session interleaved (identical programs drift
+-15-20% across sessions):

  - gate aspect gate_h 8/16/32 (footprint: windows/gate scales with
    (frustum extent + window size)^2, so aspect shapes the hull count)
  - t_upper refresh cadence tup_every 1/2/4 (each refresh is a
    vector->scalar sync that serializes with the dense math)
  - nobits (skip the 16 per-window pl.when branches per super, test
    every window: branch cost vs extra dense math)
  - plain (non-super) kernel: per-window DMAs with no super over-fetch
    — at windows/gate ~21.8 the per-window scalar costs may now be
    cheaper than the super variant's 16x DMA over-fetch

Every config is a separate jitted function (fresh function object per
config — the round-4 jit-cache trap) with the knobs as real static
args (this round's refactor). Checksums must all agree (hit/t parity;
tie winners may flip across gate aspects, so the checksum is sum(t)
not sum(tri)).

  env PYTHONPATH=/root/.axon_site:/root/repo \
      python probes/probe_r5_sched.py [terrain|soup]
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
    win_rows = int(os.environ.get("PROBE_WIN_ROWS", 16))

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
        mw = pls.build_morton_windows(tv, win_rows=win_rows)
        log(f"# scene+windows {time.time()-t0:.1f}s kind={scene_kind} "
            f"windows={mw.num_windows}")
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)
    mwin = pls.attach_so(jax.device_put(mw, dev))

    configs = [
        ("base", {}),
        ("gh8", {"gate_h": 8}),
        ("gh32", {"gate_h": 32}),
        ("tup2", {"tup_every": 2}),
        ("tup4", {"tup_every": 4}),
        ("nobits", {"nobits": True}),
        ("plain", {"supers": False}),
        # round-5 gathered-stream engine (branch-free private tables)
        ("gath", {"gathered": True}),
        ("gathc4", {"gathered": True, "cwin": 4}),
        ("gathk2", {"gathered": True, "kmax": 128}),
        # kmax=80 just covers the bench camera's max needed (75); the
        # chunked break + sparse tup cadence minimize per-gate syncs
        ("gath80", {"gathered": True, "kmax": 80, "cwin": 4,
                    "tup_every": 2}),
    ]
    sel = os.environ.get("PROBE_CFGS")
    if sel:
        names = sel.split(",")
        configs = [c for c in configs if c[0] in names]

    def make_chain(knobs):
        def chain(n, mwin, orig, dirs):
            def body(i, c):
                chk, _ = c
                eps = chk * 1e-38
                rec = pls.traverse_plist(mwin, orig + eps, dirs,
                                         (res, res), **knobs)
                chk = jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
                return (chk, rec["tile_stats"])
            z = (jnp.float32(0.0),
                 jnp.zeros((res * res // pls.GATE, 5), jnp.float32))
            return jax.lax.fori_loop(0, n, body, z)
        return jax.jit(chain)

    jfs = {}
    chks = {}
    for name, knobs in configs:
        jfs[name] = make_chain(knobs)
        t0 = time.time()
        chks[name] = float(jfs[name](1, mwin, orig, dirs)[0])
        log(f"# compile {name}: {time.time()-t0:.1f}s "
            f"chk={chks[name]:.6g}")

    # Min-separated timing: the tunnel's fetch latency swings hundreds
    # of ms between calls, so per-round (t_k - t_1)/reps pairs are
    # noise (observed "2.26 ms" frames = 324G tests/s, 4x the physical
    # ceiling). Collect MANY t(1) and t(1+reps) samples interleaved
    # across configs; min(t_k) - min(t_1) cancels the fetch FLOOR,
    # which is stable within a session even when individual calls
    # spike.
    t1s = {n: [] for n, _ in configs}
    tks = {n: [] for n, _ in configs}
    stats = {}
    for r in range(rounds):
        for name, _ in configs:
            jf = jfs[name]
            t0 = time.time()
            _ = float(jf(1, mwin, orig, dirs)[0])
            t1s[name].append(time.time() - t0)
            t0 = time.time()
            out = jf(1 + reps, mwin, orig, dirs)
            c2 = float(out[0])
            tks[name].append(time.time() - t0)
            stats[name] = np.asarray(out[1])
            log(f"# round {r} {name:7s}: t1 {t1s[name][-1]*1e3:.0f}ms "
                f"tk {tks[name][-1]*1e3:.0f}ms (chk {c2:.6g})")

    span = win_rows * 8
    n_rays = res * res
    res_j = {"cfg": {"scene": scene_kind, "tris": ntris, "res": res,
                     "win_rows": win_rows, "reps": reps},
             "checksums": chks}
    for name, _ in configs:
        best = max((min(tks[name]) - min(t1s[name])) / reps, 1e-9)
        ns = stats[name][:, 1]
        res_j[name] = {
            "t1_ms": [round(f * 1e3, 1) for f in t1s[name]],
            "tk_ms": [round(f * 1e3, 1) for f in tks[name]],
            "best_ms": round(best * 1e3, 3),
            "rays_per_s": n_rays / best,
            "windows_per_gate": float(ns.mean()),
            "supers_per_gate": float(stats[name][:, 3].mean()),
            "consumed_per_gate": float(stats[name][:, 4].mean()),
            "tests_per_s": float(ns.sum()) * span * pls.GATE / best,
        }
        log(f"# {name:7s}: frame {best*1e3:.2f}ms "
            f"({n_rays/best/1e6:.1f}M rays/s)")
    print(json.dumps(res_j), flush=True)


if __name__ == "__main__":
    main()
