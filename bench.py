"""Benchmark: rays/s on the real TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The headline metric is primary rays traced per second through the kd-tree
on a large random-triangle scene (BASELINE config[3] shape; north-star
target 2e8 rays/s/chip at 1M tris). The reference publishes no numbers
(SURVEY.md §6), so vs_baseline is measured against the BASELINE.json
north-star target.

Timing notes for the tunneled-TPU environment this runs in:
* scene/tree construction is pinned to the host CPU backend (eager ops on
  the remote device round-trip a network tunnel),
* `block_until_ready` does not reliably block through the tunnel, so each
  timed rep materializes a jitted scalar reduction of the image — the
  device must finish the full render to produce it,
* the tunnel round-trip latency is measured with a trivial jitted op and
  subtracted.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    scene_tris = int(os.environ.get("BENCH_TRIS", 1_000_000))
    width = int(os.environ.get("BENCH_W", 512))
    height = int(os.environ.get("BENCH_H", 512))
    reps = int(os.environ.get("BENCH_REPS", 5))
    mode = os.environ.get("BENCH_MODE", "normal")
    bounces = int(os.environ.get("BENCH_BOUNCES", 2))
    nee = bool(int(os.environ.get("BENCH_NEE", "0")))
    intersector = os.environ.get("BENCH_INTERSECTOR", "packet")
    # fat leaves favor the packet tracer (dense MT is nearly free; node
    # visits cost); the wavefront prefers small leaves
    leaf_size = int(os.environ.get(
        "BENCH_LEAF", 512 if intersector == "packet" else 4))
    max_depth = int(os.environ.get(
        "BENCH_DEPTH", 14 if intersector == "packet" else 22))
    packet_tile = int(os.environ.get("BENCH_TILE", 256))

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: on a local TPU this lets repeated
    # bench runs skip recompiles (the tunneled remote-compile path ignores
    # it, harmlessly)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.integrator import RenderOptions, render_image
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    dev = jax.devices()[0]
    log(f"# device: {dev}")

    # Build scene + tree pinned to host CPU (remote-device eager ops are
    # tunnel round-trips); one device_put ships the finished arrays.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        t0 = time.time()
        scene = random_tri_soup(
            scene_tris, seed=0, extent=10.0, tri_size=0.01,
            emissive_frac=0.001 if mode == "path" else 0.0).bake_shading()
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)],
                      axis=1)
        log(f"# scene gen: {time.time()-t0:.1f}s")
        t0 = time.time()
        tree = build_kd_tree(tv, max_depth=max_depth, leaf_size=leaf_size,
                             tri_block=4)
    log(f"# kd build: {time.time()-t0:.1f}s  stats={tree.stats()}")

    from clpathtracer_tpu.ops.packet import packet_mode
    log(f"# intersector: {intersector} "
        f"(packet mode: {packet_mode(tree, width * height)})")

    cam = Camera.create(position=[0.0, 0.0, -25.0], forward=[0.0, 0.0, 1.0])
    opts = RenderOptions(width=width, height=height, mode=mode,
                         bounces=bounces, use_tree=True, tri_block=4,
                         intersector=intersector, packet_tile=packet_tile,
                         nee=nee,
                         background=0.0 if mode == "path" else 1.0)

    scene = jax.device_put(scene, dev)
    tree = jax.device_put(tree, dev)
    key = jax.device_put(jax.random.PRNGKey(0), dev)

    # Jitted render → scalar checksum; fetching the scalar forces the full
    # render to complete on device (block_until_ready is unreliable here).
    def render_sum(scene, camera, tree, key):
        img = render_image(scene, camera, opts, tree=tree, key=key)
        return jnp.sum(img), jnp.mean((img < 1.0).any(-1).astype(jnp.float32))

    jf = jax.jit(render_sum)

    t0 = time.time()
    s, hit_frac = jf(scene, cam, tree, key)
    s = float(s)
    log(f"# compile+first run: {time.time()-t0:.1f}s  checksum={s:.6g} "
        f"hit_frac={float(hit_frac):.3f}")

    # tunnel round-trip floor: trivial jitted op, same fetch pattern
    triv = jax.jit(lambda x: x + 1.0)
    _ = float(triv(jnp.float32(0.0)))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = float(triv(jnp.float32(1.0)))
        rtts.append(time.time() - t0)
    rtt = min(rtts)
    log(f"# tunnel rtt floor: {rtt*1e3:.1f}ms")

    times = []
    for _ in range(reps):
        t0 = time.time()
        s, _ = jf(scene, cam, tree, key)
        s = float(s)
        times.append(time.time() - t0)
    best = max(min(times) - rtt, 1e-9)
    n_rays = width * height
    rays_per_s = n_rays / best
    log(f"# times: {[f'{t:.3f}' for t in times]} (rtt-adjusted best: "
        f"{best:.3f}s)")

    target = 2e8  # BASELINE.json north-star rays/s/chip
    label = ("primary rays/s/chip" if mode == "normal"
             else f"{bounces}-bounce paths/s/chip")
    print(json.dumps({
        "metric": f"{label}, {scene_tris} tris, kd {intersector}, "
                  f"mode={mode}",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / target,
    }), flush=True)


if __name__ == "__main__":
    main()
