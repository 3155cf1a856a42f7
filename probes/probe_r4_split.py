"""Round-4: decompose the bench terrain frame (wr8 SUPER-list plist).

Times, each with the finite-chained protocol on the chip:
  (a) full traverse_plist (prepass + kernel + resolve)
  (b) kernel only (_plist_super_call, lists precomputed)
  (c) prepass only (gate_lists_super)
  -> resolve+glue = a - b - c; per-window branch cost = b - dense floor.

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_r4_split.py

Knobs: CLPT_WIN_ROWS (default 8, the bench terrain tuning),
PROBE_SCENE=soup for the fog scene.
"""

import os
import sys
import time

import numpy as np

WR = int(os.environ.get("CLPT_WIN_ROWS", "8"))
SCENE = os.environ.get("PROBE_SCENE", "terrain")
NTRIS = int(os.environ.get("PROBE_TRIS", 1_000_000))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops import plist as pls
    from clpathtracer_tpu.ops.packet import _blockify
    from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh

    res = 512
    reps = 8
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev} wr={WR} scene={SCENE}")
    with jax.default_device(cpu):
        if SCENE == "terrain":
            scene = terrain_mesh(NTRIS, seed=0, extent=10.0)
            cam = Camera.create(position=[0.0, 14.0, 0.0],
                                forward=[0.0, -1.0, 0.01])
        else:
            scene = random_tri_soup(NTRIS, seed=0, extent=10.0,
                                    tri_size=0.01)
            cam = Camera.create(position=[0.0, 0.0, -25.0],
                                forward=[0.0, 0.0, 1.0])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        mwin = pls.build_morton_windows(tv, win_rows=WR)
    mwin = jax.device_put(mwin, dev)
    mwin = pls.attach_so(mwin)
    orig = jax.device_put(orig, dev)
    dirs = jax.device_put(dirs, dev)

    def timeit(name, f, *args):
        t0 = time.time()
        chk = float(f(1, *args))
        comp = time.time() - t0
        t0 = time.time()
        _ = float(f(1, *args))
        t1 = time.time() - t0
        t0 = time.time()
        chk2 = float(f(1 + reps, *args))
        tk = time.time() - t0
        log(f"{name}: compile {comp:.1f}s  frame {(tk-t1)/reps*1e3:.2f} ms"
            f"  chk={chk2:.6g}")

    # (a) full pipeline (prepass every frame)
    def full(n, mwin, orig, dirs):
        def body(i, chk):
            rec = pls.traverse_plist(mwin, orig + chk * 1e-38, dirs,
                                     (res, res))
            return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # (b) kernel-only: super lists precomputed once, chained on keys
    dir_b = _blockify(dirs, res, res, pls.GH, pls.GW).astype(jnp.float32)
    key, sid, bits = pls._gate_lists_super(mwin.win_bnd, dir_b, orig[0],
                                           WR)
    o = orig[0]
    rows128 = (mwin.so_base[0] + o[0] * mwin.so_base[1]
               + o[1] * mwin.so_base[2] + o[2] * mwin.so_base[3])
    tris_w = rows128.reshape(-1, WR, 128)
    orig_t = _blockify(orig, res, res, pls.GH, pls.GW).T.astype(jnp.float32)
    n_rays = res * res
    t0s = jnp.full((1, n_rays), pls.BIG, jnp.float32)

    def kern(n, key, sid, bits, tris_w, orig_t, dir_b, t0s):
        def body(i, chk):
            out_t, out_s, _ = pls._plist_super_call(
                key + chk * 1e-38, sid, bits, tris_w, orig_t, dir_b.T,
                t0s, interpret=False, so=True, win_rows=WR)
            return jnp.sum(jnp.where(out_s[0] >= 0, out_t[0], 0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # (c) prepass only, chained on origin
    def prep(n, win_bnd, dir_b, o):
        def body(i, chk):
            k, s, b = pls.gate_lists_super(win_bnd, dir_b, o + chk * 1e-38,
                                           WR)
            return jnp.sum(jnp.minimum(k[:, 0], 1e6)) + jnp.sum(b[:, 0, :1])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    timeit("full traverse", jax.jit(full), mwin, orig, dirs)
    timeit("kernel only  ", jax.jit(kern), key, sid, bits, tris_w, orig_t,
           dir_b, t0s)
    timeit("prepass only ", jax.jit(prep), mwin.win_bnd, dir_b, o)


if __name__ == "__main__":
    main()
