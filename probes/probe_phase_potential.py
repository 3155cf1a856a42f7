"""Round-4: upper bound for a two-phase (straggler-compaction) plist.

The super-list kernel BREAKs per GATE: the 512-lane packet streams its
sorted supers until the next conservative entry distance exceeds the
max-over-lanes best hit. One deep or missing lane forces the whole gate
through its full list. This probe measures, on the real scenes, the
per-LANE need — the supers a lane would stream if it could break on its
own best_t — against the per-gate cost actually paid:

  gate_supers  = sum_g #{k : key[g, k] <= max_lane best_t}
  lane_supers  = sum_g sum_l #{k : key[g, k] <= best_t[g, l]} / GATE

lane/gate work ratio bounds what phase-1-truncate + phase-2-recompact
could save in dense math (phase 2 pays re-grouping and worse culls on
top, so the realizable win is smaller).

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_phase_potential.py
"""

import os
import sys

import numpy as np

SCENES = os.environ.get("PROBE_SCENES", "terrain,soup").split(",")
WR = int(os.environ.get("CLPT_WIN_ROWS", "8"))
TRIS = int(os.environ.get("PROBE_TRIS", "1000000"))


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
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    log(f"# device {dev} wr={WR}")

    for kind in SCENES:
        with jax.default_device(cpu):
            if kind == "terrain":
                scene = terrain_mesh(TRIS, seed=0, extent=10.0)
                cam = Camera.create(position=[0.0, 14.0, 0.0],
                                    forward=[0.0, -1.0, 0.01])
            else:
                scene = random_tri_soup(TRIS, seed=0, extent=10.0,
                                        tri_size=0.01)
                cam = Camera.create(position=[0.0, 0.0, -25.0],
                                    forward=[0.0, 0.0, 1.0])
            v0, v1, v2 = scene.tri_verts()
            tv = np.stack([np.asarray(v0), np.asarray(v1),
                           np.asarray(v2)], 1)
            orig, dirs = generate_rays(cam_matrix(cam, res), res, res)
            mwin = pls.build_morton_windows(tv, win_rows=WR)
        mwin = jax.device_put(mwin, dev)
        mwin = pls.attach_so(mwin)
        orig = jax.device_put(orig, dev)
        dirs = jax.device_put(dirs, dev)

        @jax.jit
        def stats(mwin, orig, dirs):
            # per-lane best_t from the production engine
            rec = pls.traverse_plist(mwin, orig, dirs, (res, res))
            best_t = jnp.where(rec["hit"], rec["t"], jnp.float32(pls.BIG))
            dir_b = _blockify(dirs, res, res, pls.GH, pls.GW)
            key_w = pls._win_keys(
                mwin.win_bnd,
                dir_b.reshape(-1, pls.GATE, 3).astype(jnp.float32),
                orig[0], pls.GH, pls.GW)                  # [G, W]
            kw = key_w.reshape(key_w.shape[0], -1, pls.SUPER)
            key = jnp.min(kw, axis=1 + 1)                 # [G, Ws]
            # blockify best_t to match gate order
            bt_b = _blockify(best_t[:, None], res, res, pls.GH, pls.GW)
            bt = bt_b.reshape(-1, pls.GATE)               # [G, GATE]
            gate_need = jnp.sum(key <= jnp.max(bt, axis=1, keepdims=True),
                                axis=1)                   # [G]
            lane_need = jnp.sum(
                key[:, None, :] <= bt[:, :, None], axis=2)  # [G, GATE]
            # quantiles of per-lane need, in supers
            q = jnp.percentile(lane_need.astype(jnp.float32),
                               jnp.array([50.0, 90.0, 99.0]))
            return (jnp.sum(gate_need), jnp.sum(jnp.mean(
                lane_need.astype(jnp.float32), axis=1)), q,
                jnp.mean(rec["hit"]))

        g, l, q, hf = stats(mwin, orig, dirs)
        g, l = float(g), float(l)
        log(f"{kind}: gate-supers {g:.0f}  lane-supers {l:.0f} "
            f"(ratio {g / max(l, 1e-9):.2f}x)  per-lane need p50/p90/p99 "
            f"= {np.asarray(q)}  hit_frac={float(hf):.4f}")


if __name__ == "__main__":
    main()
