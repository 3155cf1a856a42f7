"""Decompose the plist frame: full pipeline vs kernel-only (lists
precomputed) vs prepass-only, all with the finite-chained protocol.

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_plist_split.py
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops import plist as pls
    from clpathtracer_tpu.ops.packet import _blockify
    from clpathtracer_tpu.scene.procedural import terrain_mesh

    res = 512
    reps = 8
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")
    with jax.default_device(cpu):
        scene = terrain_mesh(1_000_000, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        mwin = pls.build_morton_windows(tv, win_rows=16)
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

    # (b) kernel-only: lists precomputed once, chained on the kernel
    dir_b = _blockify(dirs, res, res, pls.GH, pls.GW).astype(jnp.float32)
    row0, ten = pls._gate_lists(mwin.win_bnd, dir_b, orig[0],
                                mwin.win_rows)
    o = orig[0]
    rows128 = (mwin.so_base[0] + o[0] * mwin.so_base[1]
               + o[1] * mwin.so_base[2] + o[2] * mwin.so_base[3])
    orig_t = _blockify(orig, res, res, pls.GH, pls.GW).T.astype(jnp.float32)

    def kern(n, row0, ten, rows128, orig_t, dir_b):
        def body(i, chk):
            out_t, out_s, _ = pls._plist_call(
                row0, ten + chk * 1e-38, rows128, orig_t, dir_b.T,
                interpret=False, so=True, win_rows=16)
            return jnp.sum(jnp.where(out_s[0] >= 0, out_t[0], 0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # (c) prepass only, chained on origin
    def prep(n, win_bnd, dir_b, o):
        def body(i, chk):
            r0, tn = pls.gate_lists(win_bnd, dir_b, o + chk * 1e-38, 16)
            return jnp.sum(tn[:, 0, :, :1]) * 0.0 + jnp.sum(
                jnp.minimum(tn[:, 0], 1e6))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # n must stay TRACED: a static n would compile separate programs
    # for n=1 and n=1+reps and the second compile lands inside the timed
    # window (measured: it inflated per-frame 10x before this fix)
    timeit("full pipeline", jax.jit(full), mwin, orig, dirs)
    timeit("kernel only  ", jax.jit(kern), row0, ten, rows128, orig_t,
           dir_b)
    timeit("prepass only ", jax.jit(prep), mwin.win_bnd, dir_b, o)


if __name__ == "__main__":
    main()
