"""Benchmark: rays/s on the real TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The headline metric is primary rays traced per second through the kd-tree
on a large random-triangle scene (BASELINE config[3] shape; north-star
target 2e8 rays/s/chip at 1M tris). The reference publishes no numbers
(SURVEY.md §6), so vs_baseline is measured against the BASELINE.json
north-star target.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    scene_tris = int(os.environ.get("BENCH_TRIS", 1_000_000))
    width = int(os.environ.get("BENCH_W", 512))
    height = int(os.environ.get("BENCH_H", 512))
    reps = int(os.environ.get("BENCH_REPS", 5))

    import jax
    import jax.numpy as jnp

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.integrator import RenderOptions, render_image
    from clpathtracer_tpu.scene.procedural import random_tri_soup

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    t0 = time.time()
    scene = random_tri_soup(scene_tris, seed=0, extent=10.0, tri_size=0.01)
    v0, v1, v2 = scene.tri_verts()
    tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], axis=1)
    print(f"# scene gen: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    tree = build_kd_tree(tv, max_depth=22, leaf_size=4, tri_block=4)
    print(f"# kd build: {time.time()-t0:.1f}s  stats={tree.stats()}",
          file=sys.stderr)

    cam = Camera.create(position=[0.0, 0.0, -25.0], forward=[0.0, 0.0, 1.0])
    opts = RenderOptions(width=width, height=height, mode="normal",
                         use_tree=True, tri_block=4)

    scene = jax.device_put(scene, dev)
    tree = jax.device_put(tree, dev)

    # compile
    t0 = time.time()
    img = render_image(scene, cam, opts, tree=tree)
    img.block_until_ready()
    print(f"# compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # timed reps
    times = []
    for _ in range(reps):
        t0 = time.time()
        img = render_image(scene, cam, opts, tree=tree)
        img.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    n_rays = width * height
    rays_per_s = n_rays / best
    print(f"# times: {[f'{t:.3f}' for t in times]}", file=sys.stderr)
    print(f"# hit fraction: {float(jnp.mean((img < 1.0).any(-1))):.3f}",
          file=sys.stderr)

    target = 2e8  # BASELINE.json north-star rays/s/chip
    print(json.dumps({
        "metric": f"primary rays/s/chip, {scene_tris} tris, kd traversal",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / target,
    }))


if __name__ == "__main__":
    main()
