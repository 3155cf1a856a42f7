"""Round-4: chip sweep of the two-phase plist's phase-1 budget
(CLPT_PLIST_KCAP) on the bench scenes, same-session interleaved with the
single-phase baseline (cross-session chip numbers drift +-15-20%).

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_two_phase.py
"""

import os
import sys
import time

import numpy as np

SCENE = os.environ.get("PROBE_SCENE", "soup")
WR = int(os.environ.get("CLPT_WIN_ROWS", "8"))
KCAPS = [int(x) for x in os.environ.get(
    "PROBE_KCAPS", "0,12,16,24,32,48").split(",")]


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops import plist as pls
    from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh

    res = 512
    reps = 8
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev} wr={WR} scene={SCENE} kcaps={KCAPS}")
    with jax.default_device(cpu):
        if SCENE == "terrain":
            scene = terrain_mesh(1_000_000, seed=0, extent=10.0)
            cam = Camera.create(position=[0.0, 14.0, 0.0],
                                forward=[0.0, -1.0, 0.01])
        else:
            scene = random_tri_soup(1_000_000, seed=0, extent=10.0,
                                    tri_size=0.01)
            cam = Camera.create(position=[0.0, 0.0, -25.0],
                                forward=[0.0, 0.0, 1.0])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        mwin = pls.build_morton_windows(tv, win_rows=WR)
        from clpathtracer_tpu.accel.grid import build_grid
        t0 = time.time()
        grid = build_grid(tv, density=1.0)
        log(f"# grid build {time.time()-t0:.1f}s {grid.stats()}")
    mwin = jax.device_put(mwin, dev)
    mwin = pls.attach_so(mwin)
    grid = jax.device_put(grid, dev)
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)

    def make_trav():
        # a FRESH function object per kcap: jax.jit's trace cache is
        # keyed on the function identity, so reusing one `trav` across
        # env changes silently reuses the first kcap's program
        def trav(n, mwin, grid, orig, dirs):
            def bd(i, c):
                rec = pls.traverse_plist(mwin, orig + c[0] * 1e-38, dirs,
                                         (res, res), grid=grid)
                return (jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0)),
                        jnp.sum(rec["tile_stats"][:, 1]))
            return jax.lax.fori_loop(0, n, bd, (jnp.float32(0.0),
                                                jnp.float32(0.0)))
        return trav

    for kcap in KCAPS:
        os.environ["CLPT_PLIST_KCAP"] = str(kcap)
        jt = jax.jit(make_trav())
        t0 = time.time()
        chk, w = jt(1, mwin, grid, orig, dirs)
        chk = float(chk)
        comp = time.time() - t0
        t0 = time.time()
        _ = float(jt(1, mwin, grid, orig, dirs)[0])
        t1 = time.time() - t0
        t0 = time.time()
        chk2, w2 = jt(1 + reps, mwin, grid, orig, dirs)
        chk2 = float(chk2)
        tk = time.time() - t0
        log(f"kcap={kcap:3d}: compile {comp:5.1f}s  frame "
            f"{(tk-t1)/reps*1e3:6.2f} ms  windows/gate "
            f"{float(w)/512:7.1f}  chk={chk2:.6g}")


if __name__ == "__main__":
    main()
