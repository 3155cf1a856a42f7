"""Probe: inverse-rendering train-step wall time on the real chip.

One-device (rows=1, scene=1) mesh; the chained protocol threads the
optimizer state through lax.fori_loop so tunnel fetch latency cancels
(see probe_packet_stats.py docstring). Reports steps/s and the
backward-inclusive step wall next to a forward-only render of the same
shape, on the packet-forward differentiable path (diff/grad.py).

Run: env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_train_tpu.py
"""

import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ntris = int(os.environ.get("PROBE_TRIS", 100_000))
    res = int(os.environ.get("PROBE_RES", 256))
    reps = int(os.environ.get("PROBE_REPS", 5))

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.parallel import default_mesh, make_train_step
    from clpathtracer_tpu.render.integrator import (RenderOptions,
                                                    render_image)
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")

    with jax.default_device(cpu):
        scene = random_tri_soup(ntris, seed=0, extent=10.0, tri_size=0.05,
                                emissive_frac=0.001).bake_shading()
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, tri_block=4, leaf_size=512, max_depth=14)
        if os.environ.get("PROBE_GRID", "1") == "1":
            # bounce waves ride the uniform-grid DDA (accel/grid.py) in
            # diff mode too — the fog is its scene class
            from clpathtracer_tpu.accel.sah import attach_grid
            tree = attach_grid(tree, tv)
            log(f"# grid: {tree.grid.stats()}")
    cam = Camera.create(position=[0.0, 0.0, -25.0], forward=[0.0, 0.0, 1.0])
    opts = RenderOptions(width=res, height=res, mode="path", bounces=2,
                         background=0.0, differentiable=True,
                         intersector="packet")
    key = jax.random.PRNGKey(0)

    mesh = default_mesh(devices=[dev])
    scene_d = jax.device_put(scene, dev)
    tree_d = jax.device_put(tree, dev)
    target = jax.device_put(
        jnp.zeros((res, res, 3), jnp.float32),
        NamedSharding(mesh, P("rows", None, None)))
    grey = scene_d.replace(albedo=jnp.full_like(scene_d.albedo, 0.5))
    step, init = make_train_step(grey, opts, mesh, optax.adam(3e-2),
                                 tree=tree_d, param_fields=("albedo",))
    state = init()

    def chain(n, state, cam, target, key):
        def body(i, c):
            st, _ = c
            # fresh key per step: with a FIXED key and albedo-only params
            # the whole traversal is loop-invariant and XLA hoists it out
            # of the chain — the "step" then measures only shading +
            # backward (observed: 10 ms/step vs the 42 ms forward). Real
            # training re-samples paths every step; measure that.
            st2, loss = step(st, cam, target, jax.random.fold_in(key, i))
            return st2, loss
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    jf = jax.jit(chain)
    t0 = time.time()
    st, loss = jf(1, state, cam, target, key)
    loss = float(loss)
    log(f"# train compile+first {time.time()-t0:.1f}s loss {loss:.6f}")
    t0 = time.time()
    _, l1 = jf(1, state, cam, target, key)
    l1 = float(l1)
    t1 = time.time() - t0
    t0 = time.time()
    _, lk = jf(1 + reps, state, cam, target, key)
    lk = float(lk)
    tk = time.time() - t0
    step_s = max((tk - t1) / reps, 1e-9)

    # forward-only for the bwd/fwd ratio — matched to the train step's
    # OWN forward (render_rays without the shared-origin/grid-dirs
    # primary-cull promises; render_image's promised primaries run a
    # different, prepass-heavy engine config and make the ratio
    # incomparable)
    import dataclasses

    from clpathtracer_tpu.core.camera import cam_matrix, generate_rays
    from clpathtracer_tpu.render.integrator import render_rays
    fopts = dataclasses.replace(opts, differentiable=False)

    def fchain(n, scene, tree, camera):
        def body(i, c):
            cam_i = camera.replace(position=camera.position + c * 1e-38)
            ci = cam_matrix(cam_i, fopts.height)
            orig, dir = generate_rays(ci, fopts.width, fopts.height)
            img = render_rays(scene, tree, orig, dir, fopts, key)
            return jnp.sum(img)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jff = jax.jit(fchain)
    t0 = time.time()
    _ = float(jff(1, scene_d, tree_d, cam))
    log(f"# fwd compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    _ = float(jff(1, scene_d, tree_d, cam))
    f1 = time.time() - t0
    t0 = time.time()
    _ = float(jff(1 + reps, scene_d, tree_d, cam))
    fk = time.time() - t0
    fwd_s = max((fk - f1) / reps, 1e-9)

    print(json.dumps({
        "metric": f"inverse-render train step, {ntris} tris, {res}^2, "
                  "path 2-bounce, 1 chip",
        "train_step_s": step_s,
        "steps_per_s": 1.0 / step_s,
        "forward_s": fwd_s,
        "bwd_fwd_ratio": step_s / fwd_s,
        "rays_per_s_fwd": res * res / fwd_s,
    }), flush=True)


if __name__ == "__main__":
    main()
