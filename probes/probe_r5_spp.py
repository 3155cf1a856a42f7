"""Chip A/B: jitter-dilated plist hulls for spp>1 path frames.

Round-4 built (71a5a67) but never chip-measured: spp>1 path frames
jitter their primary rays, which breaks the pixel-grid assumption of
the plist prepass; _win_keys(dilate_px) relaxes the corner-frustum
planes by sin(dilate_px * pixel angle) so jittered primaries still ride
the plist engine instead of falling back to the uncull-prepass stream
packet path. This probe times the SAME spp=4 path+NEE terrain frame
with (a) Morton windows attached (dilated plist primaries) and (b) the
plain tree + SO tables (stream-packet primaries) — the routing is
decided by the tree pytree itself, so both variants are separate traces
of one function and interleave in one session. Checksums must agree to
tie-level tolerance (both engines are exact f32 intersectors).

  env PYTHONPATH=/root/.axon_site:/root/repo \
      python probes/probe_r5_spp.py
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
    reps = int(os.environ.get("PROBE_REPS", 3))
    rounds = int(os.environ.get("PROBE_ROUNDS", 4))
    spp = int(os.environ.get("PROBE_SPP", 4))

    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.accel.sah import (attach_morton_windows,
                                            attach_shadow_tree,
                                            attach_so_tables,
                                            build_kd_tree)
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.integrator import (RenderOptions,
                                                    render_image)
    from clpathtracer_tpu.scene.procedural import terrain_mesh

    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev}")

    with jax.default_device(cpu):
        t0 = time.time()
        scene = terrain_mesh(ntris, seed=0, extent=10.0)
        # a couple of emissive patches so path+NEE has lights
        em = np.zeros((scene.num_tris, 3), np.float32)
        em[:200] = 4.0
        scene = scene.replace(emission=jnp.asarray(em)).bake_shading()
        cam = Camera.create(position=[0.0, 14.0, 0.0],
                            forward=[0.0, -1.0, 0.01])
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], 1)
        tree = build_kd_tree(tv, max_depth=11, leaf_size=3072,
                             tri_block=4)
        tree = attach_shadow_tree(tree, tv)
        tree_plist = attach_morton_windows(tree, tv, win_rows=16,
                                           with_so=True,
                                           shade_rows=scene.shade_rows)
        tree_stream = attach_so_tables(tree)
        log(f"# scene+trees {time.time()-t0:.1f}s")
    scene = jax.device_put(scene, dev)
    trees = {"plist": jax.device_put(tree_plist, dev),
             "stream": jax.device_put(tree_stream, dev)}

    opts = RenderOptions(width=res, height=res, mode="path", bounces=2,
                         spp=spp, nee=True, intersector="packet",
                         packet_tile=2048, background=0.0)

    def chain(n, scene, tree, cam):
        def body(i, c):
            chk, _ = c
            cam_i = cam.replace(position=cam.position + chk * 1e-38)
            img = render_image(scene, cam_i, opts, tree=tree,
                               key=jax.random.PRNGKey(0))
            return (jnp.sum(img), jnp.float32(0.0))
        return jax.lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.float32(0.0)))

    jf = jax.jit(chain)
    chks = {}
    for name, tr in trees.items():
        t0 = time.time()
        chks[name] = float(jf(1, scene, tr, cam)[0])
        log(f"# compile {name}: {time.time()-t0:.1f}s chk={chks[name]:.6g}")

    t1s = {n: [] for n in trees}
    tks = {n: [] for n in trees}
    for r in range(rounds):
        for name, tr in trees.items():
            t0 = time.time()
            _ = float(jf(1, scene, tr, cam)[0])
            t1s[name].append(time.time() - t0)
            t0 = time.time()
            c2 = float(jf(1 + reps, scene, tr, cam)[0])
            tks[name].append(time.time() - t0)
            log(f"# round {r} {name:6s}: t1 {t1s[name][-1]:.2f}s "
                f"tk {tks[name][-1]:.2f}s chk {c2:.6g}")

    out = {"cfg": {"tris": ntris, "res": res, "spp": spp, "reps": reps},
           "checksums": chks}
    for name in trees:
        frame = max((min(tks[name]) - min(t1s[name])) / reps, 1e-9)
        out[name] = {"frame_s": round(frame, 4),
                     "paths_per_s": res * res * spp / frame}
    out["speedup_plist"] = (out["stream"]["frame_s"]
                            / out["plist"]["frame_s"])
    rel = abs(chks["plist"] - chks["stream"]) / max(abs(chks["stream"]),
                                                    1e-9)
    out["checksum_rel_diff"] = rel
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
