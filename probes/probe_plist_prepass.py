"""Time the plist prepass (keep/t_en + sort/pack) in isolation on the
chip, for argsort+take_along_axis vs lax.sort key/payload variants.

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_plist_prepass.py
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
    from clpathtracer_tpu.scene.procedural import terrain_mesh

    res = 512
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
        from clpathtracer_tpu.ops.packet import _blockify
        dir_b = _blockify(dirs, res, res, pls.GH, pls.GW)
    win_bnd = jax.device_put(mwin.win_bnd, dev)
    dir_b = jax.device_put(jnp.asarray(dir_b, jnp.float32), dev)
    orig = jax.device_put(orig, dev)

    def chain(fn, n, *args):
        def body(i, c):
            chk = c
            out = fn(args[0], args[1], args[2] + chk * 1e-38)
            return sum(jnp.sum(jnp.minimum(o.reshape(-1)[:128], 1e6))
                       for o in out)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def time_fn(name, fn):
        # n stays traced: ONE program for all rep counts (a static n puts
        # the n=9 compile inside the timed window)
        f = jax.jit(lambda n, *a: chain(fn, n, *a))
        t0 = time.time()
        chk = float(f(1, win_bnd, dir_b, orig[0]))
        comp = time.time() - t0
        t0 = time.time()
        chk = float(f(1, win_bnd, dir_b, orig[0]))
        t1 = time.time() - t0
        t0 = time.time()
        chk = float(f(9, win_bnd, dir_b, orig[0]))
        tk = time.time() - t0
        log(f"{name}: compile {comp:.1f}s  per-call "
            f"{(tk - t1) / 8 * 1e3:.2f} ms  chk={chk:.4g}")

    # full current prepass (argsort + take_along_axis)
    def full(bnd, d, o):
        return pls.gate_lists(bnd, d, o, 16)

    # keep/t_en math only (no sort, no pack)
    def cullmath(bnd, d, o):
        G = d.shape[0] // pls.GATE
        dd = d.reshape(G, pls.GATE, 3)
        lo = [bnd[:, j] for j in range(3)]
        hi = [bnd[:, 3 + j] for j in range(3)]
        t_en = jnp.full((G, 1), -1e30, jnp.float32)
        t_ex = jnp.full((G, 1), 1e30, jnp.float32)
        for ax in range(3):
            inv = jnp.clip(1.0 / dd[:, :, ax], -1e30, 1e30)
            il = jnp.min(inv, axis=1, keepdims=True)
            ih = jnp.max(inv, axis=1, keepdims=True)
            uniform = il * ih > 0.0
            pos = il > 0.0
            nearb = jnp.where(pos, lo[ax][None], hi[ax][None])
            farb = jnp.where(pos, hi[ax][None], lo[ax][None])
            near = jnp.minimum((nearb - o[ax]) * il, (nearb - o[ax]) * ih)
            far = jnp.maximum((farb - o[ax]) * il, (farb - o[ax]) * ih)
            t_en = jnp.maximum(t_en, jnp.where(uniform, near, -1e30))
            t_ex = jnp.minimum(t_ex, jnp.where(uniform, far, 1e30))
        keep = (t_en <= t_ex) & (t_ex > 0.0)
        return (jnp.where(keep, t_en, jnp.inf),)

    # lax.sort key+payload (no gathers)
    def lsort(bnd, d, o):
        (ten,) = cullmath(bnd, d, o)
        w = ten.shape[1]
        wpad = -w % 1024
        if wpad:
            ten = jnp.concatenate(
                [ten, jnp.full((ten.shape[0], wpad), jnp.inf)], axis=1)
        ids = jnp.broadcast_to(
            jnp.arange(ten.shape[1], dtype=jnp.float32)[None],
            ten.shape)
        skey, sid = jax.lax.sort((ten, ids), dimension=1, num_keys=1)
        return skey, sid

    # pack step (transpose to chunk layout) on sorted pairs
    def lsort_pack(bnd, d, o):
        skey, sid = lsort(bnd, d, o)
        G = skey.shape[0]

        def pack(x):
            return x.reshape(G, -1, 128, 8).transpose(0, 1, 3, 2)

        return pack(sid * 16.0), pack(skey)

    time_fn("cull math only", cullmath)
    time_fn("cull + lax.sort kv", lsort)
    time_fn("cull + lax.sort + pack", lsort_pack)
    time_fn("full gate_lists (argsort+take)", full)


if __name__ == "__main__":
    main()
