"""3D-DDA uniform-grid traversal (lockstep wavefront, XLA).

The grid twin of ops/traverse_fast.py: every ray advances one step per
iteration — one 4-triangle quad-row test, then (when the cell's list is
done) one DDA cell advance. The payoff vs the kd rope walk on fog-like
scenes (accel/grid.py's docstring): no root descent, no node-row gather —
the cell advance is pure vector arithmetic on per-lane state (cell
coords + per-axis next-crossing t), so an iteration costs ONE wide
gather (the quad row; the [C, 8] cell row re-fetch is folded into the
same step) instead of the kd walk's two, and dense fog settles nearest /
any-hit queries within a handful of cells where the kd walk pays tens of
descent+rope steps (src/kernel.cl:323-389's structure, lifted to a grid).

Semantics match traverse_fast: Möller–Trumbore with `det > 0` backface
cull (src/kernel.cl:227-255 convention), nearest hit with the per-cell
t-window termination rule — a lane stops once its best hit is at or
inside the current cell's exit (every later cell starts at t >= that
exit, so nothing closer can appear; duplicated straddling triangles are
harmless exactly as the reference's early-exit slack makes kd leaf
duplicates harmless, src/kernel.cl:381-383). `t_max`/`any_hit` give the
distance-bounded occlusion query (NEE shadow rays).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from clpathtracer_tpu.ops.traverse_fast import _mt_pre, resolve_slot

BIG = 3.4e38
QBLOCK = 4


def traverse_grid(grid, orig, dir, max_iters: int = 16384,
                  compact: bool = True, t_max=None, active=None,
                  any_hit: bool = False):
    """Trace a wavefront through a UniformGrid (accel/grid.py).

    Returns the traverse_fast record: dict of [N] arrays
    hit/t/tri/u/v/steps. Options mirror traverse_fast:

    t_max: per-ray bound — hits at or beyond it are ignored, and a lane
    exits once its current cell's exit reaches the bound.
    active: lanes that start dead never walk (fold out on the first
    wind-down round).
    any_hit: occlusion semantics — stop on the FIRST accepted hit below
    the bound (requires t_max); `hit` is exact, t/tri describe *a* hit.
    """
    assert not any_hit or t_max is not None, "any_hit needs t_max"
    n = orig.shape[0]
    cells = grid.cells
    quads = grid.quads
    nq = quads.shape[0]
    ncells = cells.shape[0]
    rx, ry, rz = grid.res

    # grid geometry as traced values (pass-through from the grid pytree:
    # keeping the jaxpr constant-free — CLAUDE.md jax 0.9 note)
    glo, gh = grid.lo, grid.h
    inv_d = 1.0 / dir

    # slab test against the grid AABB → entry distance
    t_lo = (glo[None, :] - orig) * inv_d
    t_hi = (grid.hi[None, :] - orig) * inv_d
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)
    t_en = jnp.max(t_near, axis=1)
    t_ex = jnp.min(t_far, axis=1)
    t0 = jnp.maximum(t_en, 0.0)
    inside = (t_ex >= t0) & (t_ex > 0.0)

    act0 = inside
    if active is not None:
        act0 = act0 & active
    if t_max is not None:
        act0 = act0 & (t0 < t_max)

    p = orig + t0[:, None] * dir
    # per-axis clip with python-scalar bounds (no literal arrays in traced
    # code — the jax 0.9 hoisted-constant hazard, CLAUDE.md)
    cellf = jnp.floor((p - glo[None, :]) / gh[None, :])
    cell = jnp.stack([jnp.clip(cellf[:, 0], 0, rx - 1),
                      jnp.clip(cellf[:, 1], 0, ry - 1),
                      jnp.clip(cellf[:, 2], 0, rz - 1)],
                     axis=1).astype(jnp.int32)
    step = jnp.where(dir > 0, 1, jnp.where(dir < 0, -1, 0)).astype(
        jnp.int32)
    # t at the next boundary crossing per axis (BIG when dir == 0)
    next_b = glo[None, :] + (cell + (dir > 0)).astype(jnp.float32) \
        * gh[None, :]
    t_next = jnp.where(dir != 0, (next_b - orig) * inv_d, BIG)
    dt = jnp.where(dir != 0, gh[None, :] * jnp.abs(inv_d), BIG)

    zero_i = cell[:, 0] * 0
    state = {
        "cell": cell,
        "t_next": t_next,
        "offset": zero_i,
        "active": act0,
        "best_t": (BIG + orig[:, 0] * 0.0 if t_max is None
                   else t_max + orig[:, 0] * 0.0),
        "best_slot": zero_i - 1,
        "steps": zero_i,
        "orig": orig,
        "dir": dir,
        "step3": step,
        "dt": dt,
    }
    if t_max is not None:
        state["t_bound"] = t_max + orig[:, 0] * 0.0

    def body(s):
        act = s["active"]
        o, d = s["orig"], s["dir"]
        c = s["cell"]
        cid = (c[:, 0] * ry + c[:, 1]) * rz + c[:, 2]
        row = cells[jnp.clip(cid, 0, ncells - 1)]      # [n', 8] wide gather
        qstart = row[:, 0].astype(jnp.int32)
        count = row[:, 1].astype(jnp.int32)

        qidx = qstart + s["offset"] // QBLOCK
        qrow = quads[jnp.clip(qidx, 0, nq - 1)]        # [n', 64] wide gather
        qr = qrow.reshape(-1, QBLOCK, 16)
        tv0, te1, te2 = qr[..., 0:3], qr[..., 3:6], qr[..., 6:9]
        tid = qr[..., 9].astype(jnp.int32)
        in_cell = (s["offset"][:, None] + jnp.arange(QBLOCK)[None, :]
                   ) < count[:, None]
        valid = in_cell & (tid >= 0) & act[:, None]
        ok, t, _, _ = _mt_pre(tv0, te1, te2, o[:, None, :], d[:, None, :])
        ok = ok & valid
        t_m = jnp.where(ok, t, BIG)
        k = (QBLOCK - 1) - jnp.argmin(t_m[:, ::-1], axis=1)
        bt = jnp.min(t_m, axis=1)
        bslot = (qidx * QBLOCK + k).astype(jnp.int32)
        take = (bt < BIG) & (bt <= s["best_t"])
        if t_max is not None:
            take = take & (bt < s["t_bound"])
        best_t = jnp.where(take, bt, s["best_t"])
        best_slot = jnp.where(take, bslot, s["best_slot"])

        # --- DDA advance (when this cell's list is exhausted) ---
        offset_next = s["offset"] + QBLOCK
        cell_done = offset_next >= count
        tn = s["t_next"]
        t_exit = jnp.min(tn, axis=1)
        # settled: nothing in a later cell (entry >= t_exit) can beat the
        # best; with a bound, later cells are irrelevant past it
        settled = (best_slot >= 0) & (best_t <= t_exit)
        if t_max is not None:
            settled = settled | (t_exit >= s["t_bound"])
        # step the min-t axis (where-chains; no per-lane gathers, no
        # literal index arrays)
        on0 = tn[:, 0] <= jnp.minimum(tn[:, 1], tn[:, 2])
        on1 = ~on0 & (tn[:, 1] <= tn[:, 2])
        on2 = ~on0 & ~on1
        c_new = jnp.stack(
            [c[:, 0] + jnp.where(on0, s["step3"][:, 0], 0),
             c[:, 1] + jnp.where(on1, s["step3"][:, 1], 0),
             c[:, 2] + jnp.where(on2, s["step3"][:, 2], 0)], axis=1)
        tn_new = jnp.stack(
            [tn[:, 0] + jnp.where(on0, s["dt"][:, 0], 0.0),
             tn[:, 1] + jnp.where(on1, s["dt"][:, 1], 0.0),
             tn[:, 2] + jnp.where(on2, s["dt"][:, 2], 0.0)], axis=1)
        out = ((c_new[:, 0] < 0) | (c_new[:, 0] >= rx)
               | (c_new[:, 1] < 0) | (c_new[:, 1] >= ry)
               | (c_new[:, 2] < 0) | (c_new[:, 2] >= rz))

        adv = act & cell_done
        cell2 = jnp.where(adv[:, None], c_new, c)
        t_next2 = jnp.where(adv[:, None], tn_new, tn)
        offset2 = jnp.where(act & ~cell_done, offset_next, 0)
        active2 = act & ~(cell_done & (settled | out))
        if any_hit:
            active2 = active2 & ~take
        return {**s, "cell": cell2, "t_next": t_next2, "offset": offset2,
                "active": active2, "best_t": best_t,
                "best_slot": best_slot,
                "steps": s["steps"] + act.astype(jnp.int32)}

    if not compact:
        def cond(carry):
            s, it = carry
            return jnp.any(s["active"]) & (it < max_iters)

        def bd(carry):
            s, it = carry
            return body(s), it + 1
        state, _ = jax.lax.while_loop(cond, bd, (state, jnp.int32(0)))
        out = state
    else:
        # geometric wind-down, as in traverse_fast: run until <= 1/4 of
        # the lanes are active, fold finished results out, quarter the
        # wavefront; stragglers stop costing full-width iterations
        results_t = jnp.full((n,), BIG)
        results_slot = jnp.full((n,), -1, jnp.int32)
        results_steps = jnp.zeros((n,), jnp.int32)
        state["ridx"] = jnp.arange(n, dtype=jnp.int32)
        it = jnp.int32(0)
        size = n
        # the DDA's stragglers are the rays that miss everything and walk
        # the whole grid (~sum(res) cells), so the tail floor is a real
        # cost knob: sweepable via CLPT_GRID_MIN (chip-measured default)
        floor = int(os.environ.get("CLPT_GRID_MIN", "2048"))
        min_size = min(n, max(floor, n // 64))

        def run_loop(s, it0):
            def cond(carry):
                s, it = carry
                return (jnp.any(s["active"]) & (it < it0 + max_iters)
                        & (jnp.sum(s["active"])
                           > s["active"].shape[0] // 4))

            def bd(carry):
                s, it = carry
                return body(s), it + 1
            return jax.lax.while_loop(cond, bd, (s, it0))

        while size >= min_size:
            state, it = run_loop(state, it)
            results_t = results_t.at[state["ridx"]].set(state["best_t"])
            results_slot = results_slot.at[state["ridx"]].set(
                state["best_slot"])
            results_steps = results_steps.at[state["ridx"]].set(
                state["steps"])
            if size <= min_size:
                break
            order = jnp.argsort(~state["active"])
            quarter = max(size // 4, min_size)
            state = jax.tree.map(lambda a: a[order[:quarter]], state)
            size = quarter

        def cond(carry):
            s, it = carry
            return jnp.any(s["active"]) & (it < max_iters)

        def bd(carry):
            s, it = carry
            return body(s), it + 1
        state, _ = jax.lax.while_loop(cond, bd, (state, it))
        results_t = results_t.at[state["ridx"]].set(state["best_t"])
        results_slot = results_slot.at[state["ridx"]].set(
            state["best_slot"])
        results_steps = results_steps.at[state["ridx"]].set(state["steps"])
        out = {"best_t": results_t, "best_slot": results_slot,
               "steps": results_steps}

    rec = resolve_slot(quads, out["best_slot"], orig, dir)
    rec["steps"] = out["steps"]
    return rec
