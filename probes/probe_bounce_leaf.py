"""Leaf-size sweep for the NEAREST-hit bounce walk on terrain (the
shadow tree's leaf16 was tuned for ANY-HIT occlusion; the bounce-walk
route reuses it for nearest hits)."""
import os, sys, time
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays
    from clpathtracer_tpu.ops.traverse_fast import traverse_fast as tf
    from clpathtracer_tpu.scene.procedural import terrain_mesh
    res, reps = 512, 4
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        scene = terrain_mesh(1_000_000, seed=0, extent=10.0)
        cam = Camera.create(position=[0.0, 14.0, 0.0], forward=[0.0, -1.0, 0.01])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
        trees = {}
        for leaf, depth in ((8, 28), (16, 26), (32, 24), (64, 22)):
            t0 = time.time()
            trees[leaf] = build_kd_tree(tv, max_depth=depth, leaf_size=leaf, tri_block=4)
            log(f"# leaf{leaf}: build {time.time()-t0:.1f}s nodes={trees[leaf].num_nodes}")
    trees = {k: jax.device_put(v, dev) for k, v in trees.items()}
    orig = jax.device_put(orig, dev); dirs = jax.device_put(dirs, dev)
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(res*res, 3)).astype(np.float32)
    bd[:, 1] = np.abs(bd[:, 1])
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    d_b = jax.device_put(jnp.asarray(bd), dev)
    act = jax.device_put(jnp.asarray(rng.uniform(size=(res*res,)) < 0.9), dev)
    @jax.jit
    def hits(tree, orig, dirs):
        rec = tf(tree, tree.quads, orig, dirs)
        t = jnp.where(rec["hit"], rec["t"], 0.0)
        return orig + t[:, None]*dirs + 1e-3*jnp.array([0, 1, 0.0])
    o_b = jax.block_until_ready(hits(trees[16], orig, dirs))
    def mk():
        def f(n, tree, o, d, act):
            def body(i, c):
                rec = tf(tree, tree.quads, o + c*1e-38, d, active=act)
                return jnp.sum(jnp.where(rec["hit"], rec["t"], 0.0))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return jax.jit(f)
    for leaf, tree in trees.items():
        f = mk()
        t0 = time.time(); chk = float(f(1, tree, o_b, d_b, act)); comp = time.time()-t0
        t0 = time.time(); _ = float(f(1, tree, o_b, d_b, act)); t1 = time.time()-t0
        t0 = time.time(); chk2 = float(f(1+reps, tree, o_b, d_b, act)); tk = time.time()-t0
        log(f"leaf{leaf:3d}: compile {comp:5.1f}s  wave {(tk-t1)/reps*1e3:7.2f} ms  chk={chk2:.6g}")

main()
