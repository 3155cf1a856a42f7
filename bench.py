"""Benchmark: rays/s on the real TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"detail": {...}}.

The headline metric is primary rays traced per second through the kd-tree
on a 1M-triangle SURFACE scene (procedural terrain) — the reference's
actual workload is OBJ surface meshes (src/model.c), not volumetric
fog. The adversarial random-tri "soup" (fog of 1M tiny triangles, ~24%
miss rays that defeat occlusion culling) is measured too and reported in
detail.adversarial_soup — it stresses the tracer far beyond any real
scene. The reference publishes no numbers (SURVEY.md §6), so vs_baseline
is measured against the BASELINE.json north-star target (2e8 rays/s/chip
at 1M tris). `detail` carries the perf denominators (VERDICT r1 #2):
node visits/tile, leaf chunks/tile, tri-tests/ray, tri-tests/s and an HBM
byte estimate from the packet kernel's tile_stats.

Per-scene engine tuning (measured, probes/probe_packet_stats.py): the
terrain wants the mask-cull prepass + 512-lane gated big tiles
(CLPT_STRIPS=1, tile=1024 — 25.2 ms); the soup has no frustum-cullable
structure at window granularity, so the prepass only costs (CLPT_STRIPS=0,
tile=512 — 44.1 ms). These are scene knobs exactly like leaf_size.

Timing protocol for the tunneled-TPU environment (fetch latency has been
observed anywhere from 30 ms to 90 s): ONE compiled function runs `n`
data-chained renders (lax.fori_loop over a traced bound; each iteration's
camera is nudged by the previous checksum so XLA cannot parallelize,
CSE or elide the loop body — a dependence it can constant-fold, like
key-from-chk*0, silently collapses the chain to one frame), timed at n=1
and n=1+reps — per-frame = (t_k - t_1)/reps, fetch
latency and dispatch overhead cancel. Scene/tree build is pinned to the
host CPU backend (eager ops on the remote device round-trip the tunnel).
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# measured per-scene optima (probe_packet_stats.py, 1M tris, 512^2)
_USER_ENV = {k: v for k, v in os.environ.items()
             if k.startswith("CLPT_")}

SCENE_TUNING = {
    # Primary rays ride the plist super-list engine (ops/plist.py,
    # round-3: 64-tri windows + two-level super lists) on BOTH scenes —
    # measured probes/probe_plist.py: terrain 16.5 ms vs the stream
    # engine's 17.9, soup 34.8 vs 44. The kd-tree knobs below still
    # shape the tree used by bounce/shadow wavefronts (path mode) and
    # the stream-engine fallback.
    # plist_rows: the median-split partition (round 4c) shifted the
    # terrain optimum from 64-tri back to 128-tri windows (chip sweep
    # probes/probe_plist.py: wr16/8/4 -> 12.3/13.9/17.0 ms — tighter
    # hulls cut the per-window fixed-cost pressure); soup stays wr8
    # (25.0 vs 27.9 ms).
    # CLPT_PLIST_TUP=4: sparser t_upper refreshes (each is a
    # vector->scalar sync, ~0.5us). Chip-measured r5, checksum-identical
    # everywhere, never negative: terrain 1M 12.18 vs 12.43 ms, terrain
    # 10M 55.6 vs 56.7 ms (+2.0% -- meaningful against the 5e6 gate),
    # soup 24.84 vs 24.96 ms (probes/probe_r5_sched.py).
    "terrain": {"tile": 2048, "leaf": 3072, "depth": 11,
                "CLPT_STRIPS": "1", "CLPT_PLIST": "1", "plist_rows": 16,
                "CLPT_PLIST_TUP": "4"},
    # soup: single-phase. The two-phase straggler engine (CLPT_PLIST_KCAP
    # + attached grid, ops/plist.py::_plist_two_phase) is a MEASURED
    # NEGATIVE despite the fog's 3.62x per-lane/per-gate need ratio:
    # kcap 8/12/16/24/32 -> 105/94/81/74/74 ms vs 34.7 single-phase
    # (probes/probe_two_phase.py) — the per-ray DDA costs 0.36 us/lane
    # where the dense engine amortizes to 0.13, so any straggler set big
    # enough to matter is cheaper to finish densely. Kept off.
    "soup": {"tile": 512, "leaf": 512, "depth": 14,
             "CLPT_STRIPS": "0", "CLPT_FRUSTUM": "0",
             "CLPT_PLIST": "1", "plist_rows": 8,
             "CLPT_PLIST_TUP": "4"},
}


def run_scene(scene_kind, jax, jnp, mode=None, nee=None, bounces=None,
              reps=None, ntris=None):
    scene_tris = (int(os.environ.get("BENCH_TRIS", 1_000_000))
                  if ntris is None else ntris)
    width = int(os.environ.get("BENCH_W", 512))
    height = int(os.environ.get("BENCH_H", 512))
    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", 10))
    if mode is None:
        mode = os.environ.get("BENCH_MODE", "normal")
    if bounces is None:
        bounces = int(os.environ.get("BENCH_BOUNCES", 2))
    if nee is None:
        nee = bool(int(os.environ.get("BENCH_NEE", "0")))
    intersector = os.environ.get("BENCH_INTERSECTOR", "packet")
    engine = os.environ.get("BENCH_ENGINE", "auto")
    sort_bounces = bool(int(os.environ.get("BENCH_SORT", "1")))
    tuning = SCENE_TUNING.get(scene_kind, {})
    # fat leaves favor the packet tracer (dense MT is nearly free; node
    # visits cost); the wavefront prefers small leaves
    leaf_size = int(os.environ.get(
        "BENCH_LEAF",
        tuning.get("leaf", 512) if intersector == "packet" else 4))
    max_depth = int(os.environ.get(
        "BENCH_DEPTH",
        tuning.get("depth", 14) if intersector == "packet" else 22))
    if "BENCH_DEPTH" not in os.environ and scene_tris > 1_500_000:
        # the per-scene depth tunings assume ~1M tris; larger meshes need
        # proportionally deeper trees or leaves blow past the stream
        # engine's SMEM packing limit (observed: leaf of 19.7k tris at
        # 10M with the 1M terrain tuning's depth 11)
        max_depth += max(0, int(np.ceil(np.log2(scene_tris / 1e6)))) + 1
    packet_tile = int(os.environ.get("BENCH_TILE",
                                     tuning.get("tile", 512)))
    # user-provided CLPT_* env wins; otherwise apply (and overwrite any
    # previous scene's) tuning — both scenes run in this process
    for k, v in tuning.items():
        if k.startswith("CLPT_"):
            os.environ[k] = _USER_ENV.get(k, v)

    from clpathtracer_tpu.accel.sah import build_kd_tree
    from clpathtracer_tpu.core.camera import Camera
    from clpathtracer_tpu.render.integrator import RenderOptions, render_image
    from clpathtracer_tpu.scene.procedural import random_tri_soup, terrain_mesh

    dev = jax.devices()[0]

    # Build scene + tree pinned to host CPU (remote-device eager ops are
    # tunnel round-trips); one device_put ships the finished arrays.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        t0 = time.time()
        if scene_kind == "terrain":
            # surface scene (what the reference renders: OBJ meshes);
            # the soup is the adversarial fog stress case
            scene = terrain_mesh(scene_tris, seed=0, extent=10.0)
            scene = scene.bake_shading()
            cam_pos, cam_fwd = [0.0, 14.0, 0.0], [0.0, -1.0, 0.01]
        else:
            scene = random_tri_soup(
                scene_tris, seed=0, extent=10.0, tri_size=0.01,
                emissive_frac=0.001 if mode == "path" else 0.0
            ).bake_shading()
            cam_pos, cam_fwd = [0.0, 0.0, -25.0], [0.0, 0.0, 1.0]
        v0, v1, v2 = scene.tri_verts()
        tv = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)],
                      axis=1)
        log(f"# scene gen: {time.time()-t0:.1f}s kind={scene_kind}")
        t0 = time.time()
        tree = build_kd_tree(tv, max_depth=max_depth, leaf_size=leaf_size,
                             tri_block=4)
        if mode == "path":
            # second accelerator for per-ray path-mode waves, auto-picked
            # like cli/main.py: the uniform-grid DDA on fog-like scenes
            # (bounce 7.6x / shadow 3.3x — probes/probe_grid.py) and the
            # walk-tuned shadow kd-tree on surface meshes (3.9x on NEE
            # occlusion walks, 1.6x on the whole frame via the
            # bounce-walk route), so env-driven non-soup path configs
            # don't silently fall back to the packet-tuned fat-leaf tree
            from clpathtracer_tpu.accel.grid import fog_likeness
            from clpathtracer_tpu.accel.sah import (attach_grid,
                                                    attach_shadow_tree)
            ts = time.time()
            if fog_likeness(tv) > 0.5:
                tree = attach_grid(tree, tv)
                log(f"# grid: {time.time()-ts:.1f}s "
                    f"stats={tree.grid.stats()}")
            elif mode == "path":
                # serves BOTH the NEE occlusion walk and the bounce-walk
                # nearest-hit route (render/integrator.py bounce_walk)
                tree = attach_shadow_tree(tree, tv)
                log(f"# shadow tree: {time.time()-ts:.1f}s")
    log(f"# kd build: {time.time()-t0:.1f}s  stats={tree.stats()}")

    from clpathtracer_tpu.ops.packet import packet_mode
    kmode = packet_mode(tree, width * height, packet_tile, engine=engine)
    log(f"# intersector: {intersector} engine={engine} tile={packet_tile} "
        f"strips={os.environ.get('CLPT_STRIPS', '1')} "
        f"(packet mode: {kmode})")

    cam = Camera.create(position=cam_pos, forward=cam_fwd)
    opts = RenderOptions(width=width, height=height, mode=mode,
                         bounces=bounces, use_tree=True, tri_block=4,
                         intersector=intersector, packet_tile=packet_tile,
                         nee=nee, sort_bounces=sort_bounces,
                         nee_light_stride=int(
                             os.environ.get("BENCH_NEE_STRIDE", "1")),
                         background=0.0 if mode == "path" else 1.0)

    scene = jax.device_put(scene, dev)
    tree = jax.device_put(tree, dev)
    # plist engine (ops/plist.py): walk-free sorted-window streaming.
    # Per-scene choice like CLPT_STRIPS (the integrator auto-routes
    # primary frames when Morton windows are attached); CLPT_PLIST=0/1
    # overrides the tuning.
    plist_flag = _USER_ENV.get("CLPT_PLIST",
                               tuning.get("CLPT_PLIST", "0"))
    use_plist = plist_flag == "1" and intersector == "packet"
    if intersector == "packet" and tree.quads is not None and not use_plist:
        # affine shared-origin tables for the STREAM engine: computed
        # once on-device, turns the per-frame SO row preparation into
        # one fused elementwise combine (accel/sah.py::attach_so_tables).
        # Skipped when plist is engaged — the plist engine bakes its own
        # SO tables on the Morton windows, and carrying both is 2x4
        # quad-bytes of dead HBM (the difference between fitting and
        # OOMing a 10M-tri scene with fused resolve rows attached).
        from clpathtracer_tpu.accel.sah import attach_so_tables
        t0 = time.time()
        tree = attach_so_tables(tree)
        log(f"# so tables: {time.time()-t0:.1f}s")
    if use_plist:
        from clpathtracer_tpu.accel.sah import attach_morton_windows
        plist_rows = int(_USER_ENV.get(
            "CLPT_WIN_ROWS", tuning.get("plist_rows", 16)))
        t0 = time.time()
        tree = attach_morton_windows(tree, tv, win_rows=plist_rows,
                                     with_so=True,
                                     shade_rows=scene.shade_rows)
        log(f"# morton windows: {time.time()-t0:.1f}s "
            f"({tree.mwin.num_windows} windows, {plist_rows} rows)")

    # n data-chained frames in one program (traced bound → one compile).
    # The chain dependence must be one XLA cannot constant-fold away
    # (x*0.0 folds; a key that normal mode ignores doesn't chain): nudge
    # the camera position by checksum*1e-38 — numerically nothing,
    # semantically a hard serial dependence.
    def chain(n, scene, tree, camera):
        def body(i, c):
            chk, _ = c
            cam_i = camera.replace(
                position=camera.position + chk * 1e-38)
            img = render_image(scene, cam_i, opts, tree=tree,
                               key=jax.random.PRNGKey(0))
            return (jnp.sum(img),
                    jnp.mean((img < 1.0).any(-1).astype(jnp.float32)))
        return jax.lax.fori_loop(0, n, body,
                                 (jnp.float32(0.0), jnp.float32(0.0)))

    jf = jax.jit(chain, static_argnames=())

    t0 = time.time()
    s, hit_frac = jf(1, scene, tree, cam)
    s = float(s)
    compile_s = time.time() - t0
    log(f"# compile+first run: {compile_s:.1f}s  checksum={s:.6g} "
        f"hit_frac={float(hit_frac):.3f}")

    # min-separated sampling (round 5): the tunnel's fetch latency can
    # swing hundreds of ms between calls, so a single (t_k - t_1)/reps
    # pair inherits that noise directly (observed flipping the 10M gate
    # across otherwise-identical runs). Collect several samples of each
    # and difference the minima — the fetch FLOOR is stable within a
    # session even when individual calls spike.
    t1s, tks = [], []
    s1 = sk = 0.0
    for _ in range(int(os.environ.get("BENCH_ROUNDS", "3"))):
        t0 = time.time()
        s1 = float(jf(1, scene, tree, cam)[0])
        t1s.append(time.time() - t0)
        t0 = time.time()
        sk = float(jf(1 + reps, scene, tree, cam)[0])
        tks.append(time.time() - t0)
    best = max((min(tks) - min(t1s)) / reps, 1e-9)
    n_rays = width * height
    rays_per_s = n_rays / best
    log(f"# t(1)={min(t1s):.2f}s t({1+reps})={min(tks):.2f}s "
        f"({len(t1s)} samples) -> frame {best*1e3:.1f}ms"
        f"  checksums {s1:.6g}/{sk:.6g}")

    # perf denominators from the packet kernel's tile_stats (one extra
    # program; cheap next to the render)
    detail = {"frame_s": best, "compile_s": compile_s,
              "leaf_size": leaf_size, "max_depth": max_depth,
              "packet_tile": packet_tile, "engine": engine,
              "kernel_mode": kmode, "hit_frac": float(hit_frac)}
    if intersector == "packet" and getattr(tree, "mwin", None) is not None:
        # plist engine engaged: its tile_stats are per 512-ray gate,
        # lane 1 = windows streamed
        try:
            from clpathtracer_tpu.core.camera import (
                cam_matrix, generate_rays)
            from clpathtracer_tpu.ops.plist import GATE, traverse_plist

            def stats_fn(scene, tree):
                ci = cam_matrix(cam, height)
                orig, dir = generate_rays(ci, width, height)
                rec = traverse_plist(tree.mwin, orig, dir,
                                     (height, width))
                return rec["tile_stats"]

            tstats = np.asarray(jax.jit(stats_fn)(scene, tree))
            ns = tstats[:, 1]
            span = tree.mwin.win_rows * 8
            detail.update({
                "engine_used": "plist",
                "windows_per_gate": float(ns.mean()),
                "tri_tests_per_ray": float(ns.sum()) * span * GATE
                / n_rays,
                "tri_tests_per_s": float(ns.sum()) * span * GATE / best,
                "hbm_gb_per_frame": float(ns.sum()) * span * 64 / 1e9,
            })
            log(f"# denominators (plist): windows/gate={ns.mean():.1f} "
                f"tests/ray={detail['tri_tests_per_ray']:.0f}")
        except Exception as e:
            log(f"# stats collection failed: {e}")
    elif intersector == "packet" and kmode is not None:
        try:
            from clpathtracer_tpu.core.camera import (
                cam_matrix, generate_rays)
            from clpathtracer_tpu.ops.packet import traverse_packet

            def stats_fn(scene, tree):
                ci = cam_matrix(cam, height)
                orig, dir = generate_rays(ci, width, height)
                quads = tree.quads
                rec = traverse_packet(tree, quads, orig, dir,
                                      image_shape=(height, width),
                                      tile=packet_tile, engine=engine,
                                      shared_origin=True, grid_dirs=True)
                return rec["tile_stats"]

            tstats = np.asarray(jax.jit(stats_fn)(scene, tree))
            nv, nl = tstats[:, 0], tstats[:, 1]
            from clpathtracer_tpu.ops.packet import CHUNK_ROWS
            chunk_tris = 128 if kmode == "mxu" else CHUNK_ROWS * 8
            # mask-culled stream kernel with 512-lane gates: lane 4 =
            # gate-MT executions (ungated smem kernels write streamed
            # windows there, x packet_tile rays each)
            gated = (tstats.shape[1] > 4 and tstats[:, 4].sum() > 0
                     and tstats[:, 4].sum() != nl.sum())
            n_tests = tstats[:, 4].sum() if gated else nl.sum()
            test_rays = 512 if gated else packet_tile  # 512-lane gates
            detail.update({
                "node_visits_per_tile": float(nv.mean()),
                "leaf_chunks_per_tile": float(nl.mean()),
                "strip_gated": bool(gated),
                "tri_tests_per_ray": float(n_tests) * chunk_tris
                * test_rays / n_rays,
                "tri_tests_per_s": float(n_tests) * chunk_tris
                * test_rays / best,
                "hbm_gb_per_frame": float(nl.sum()) * chunk_tris * 64 / 1e9,
                "node_pops_per_s": float(nv.sum()) / best,
            })
            if tstats.shape[1] > 3:
                detail["culled_windows_per_tile"] = float(
                    tstats[:, 3].mean())
            log(f"# denominators: nv/tile={nv.mean():.1f} "
                f"chunks/tile={nl.mean():.1f} "
                f"tests/ray={detail['tri_tests_per_ray']:.0f}")
        except Exception as e:  # denominators must never sink the bench
            log(f"# stats collection failed: {e}")

    return rays_per_s, detail


def main():
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
    log(f"# device: {jax.devices()[0]}")

    scene_tris = int(os.environ.get("BENCH_TRIS", 1_000_000))
    mode = os.environ.get("BENCH_MODE", "normal")
    bounces = int(os.environ.get("BENCH_BOUNCES", 2))
    intersector = os.environ.get("BENCH_INTERSECTOR", "packet")

    forced = os.environ.get("BENCH_SCENE")
    if forced:
        scenes = [forced]
    else:
        scenes = ["terrain", "soup"]  # headline surface scene first

    results = {}
    for kind in scenes:
        log(f"# === scene {kind} ===")
        if kind == scenes[0]:
            results[kind] = run_scene(kind, jax, jnp)  # headline: raise
        else:
            try:  # secondary legs must never sink the headline
                results[kind] = run_scene(kind, jax, jnp)
            except Exception as e:
                log(f"# scene {kind} failed: {e}")
                results[kind] = (0.0, {"error": str(e)})

    head_kind = scenes[0]
    rays_per_s, detail = results[head_kind]
    for kind in scenes[1:]:
        v, d = results[kind]
        detail[f"adversarial_{kind}"] = ({"rays_per_s": v, **d}
                                         if "error" not in d else d)

    # gated path-mode metric (VERDICT r2 #3): 2-bounce sorted NEE path
    # tracing on the EMISSIVE soup (the only bench scene with lights).
    # Reported as paths/s plus total traversal rays/s: each path launches
    # `bounces` intersect waves and, with NEE, as many shadow waves.
    if (mode == "normal" and not forced
            and os.environ.get("BENCH_PATH", "1") != "0"):
        log("# === path-mode gate (soup, 2 bounces, NEE, sorted) ===")
        try:
            pb = 2
            v, d = run_scene("soup", jax, jnp, mode="path", nee=True,
                             bounces=pb, reps=3)
            n = (int(os.environ.get("BENCH_W", 512))
                 * int(os.environ.get("BENCH_H", 512)))
            detail["path_mode"] = {
                "paths_per_s": v,
                "rays_per_s": v * pb * 2,   # bounce + shadow waves
                "bounces": pb, "nee": True,
                "frame_s": d.get("frame_s"),
                "compile_s": d.get("compile_s"),
            }
        except Exception as e:  # the gate must never sink the headline
            log(f"# path-mode bench failed: {e}")
            detail["path_mode"] = {"error": str(e)}

    # large-scene leg (VERDICT r4 #3): 10M-tri terrain through the same
    # pipeline — the reference handles any device-resident mesh
    # uniformly (/root/reference/src/CLState.c:124-202), so the bench
    # must carry a current large-mesh number, not a stale README row.
    # Kill switch BENCH_10M=0; failures never sink the headline.
    if (mode == "normal" and not forced and scene_tris == 1_000_000
            and os.environ.get("BENCH_10M", "1") != "0"):
        log("# === large-scene leg (terrain, 10M tris) ===")
        try:
            v, d = run_scene("terrain", jax, jnp, reps=8,
                             ntris=10_000_000)
            detail["terrain_10m"] = {"rays_per_s": v, **d}
        except Exception as e:
            log(f"# 10M leg failed: {e}")
            detail["terrain_10m"] = {"error": str(e)}

    target = 2e8  # BASELINE.json north-star rays/s/chip
    label = ("primary rays/s/chip" if mode == "normal"
             else f"{bounces}-bounce paths/s/chip")
    # standing round gates, machine-visible across rounds (VERDICT r4
    # #8): terrain 3e7, soup 1e7, path 1e6 paths/s, 10M-tri 5e6
    gates = {}
    if mode == "normal" and not forced:
        def gate(leg, key_, threshold):
            # tri-state: True/False only when the leg actually ran —
            # a skipped (kill-switch) or failed leg must not read as a
            # regression
            if leg is None:
                return "skipped"
            if "error" in leg:
                return "error"
            if key_ not in leg:
                return "skipped"
            return bool(leg[key_] >= threshold)

        if scene_tris == 1_000_000:
            gates["terrain_3e7"] = bool(rays_per_s >= 3e7)
        gates["soup_1e7"] = gate(detail.get("adversarial_soup"),
                                 "rays_per_s", 1e7)
        gates["path_1e6"] = gate(detail.get("path_mode"),
                                 "paths_per_s", 1e6)
        gates["tris10m_5e6"] = gate(detail.get("terrain_10m"),
                                    "rays_per_s", 5e6)
        detail["gates"] = gates
        log(f"# gates: {gates}")
    print(json.dumps({
        "metric": f"{label}, {scene_tris} tris ({head_kind}), "
                  f"kd {intersector}, mode={mode}",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / target,
        "detail": detail,
    }), flush=True)


if __name__ == "__main__":
    main()
