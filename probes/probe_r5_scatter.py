"""Chip probe: is there a cheaper scattered-row primitive than XLA's
gather? (VERDICT r4 #5 — the one unexplored lever on the path gate.)

The path frame is ~80% scattered-row gathers (grid-DDA cell rows, kd
walk node+quad rows) at ~45 GB/s effective (probes/probe_gather_tpu.py:
latency-bound, no cross-chain overlap). This probe measures every
primitive this chip generation offers for the same access pattern —
fetch N scattered 512-byte rows per wave step — head to head:

  a) XLA row gather (the incumbent): table[idx] for [N] random indices.
  b) Pallas per-row dynamic DMA: one make_async_copy per row with a
     dynamic HBM offset read from SMEM, double-buffered. The per-DMA
     scalar start/wait cost is the known ~0.3-0.6 us — if that holds,
     this loses to (a) by >25x and per-lane HBM fetch is closed.
  c) Pallas multi-row batched DMA, depth-8 queue: amortizes semaphore
     waits over 8 in-flight DMAs; measures whether outstanding-DMA
     parallelism can approach the gather's pipelining.
  d) Pallas VMEM-resident table with dynamic SUBLANE scalar reads: the
     only in-kernel "gather" Mosaic offers ([M, 8]-style tables, env
     notes). Bounded by the scalar core; also bounded by VMEM (~16 MB
     => M <= ~30k rows of 128 lanes) — a leaf-16 walk table for 1M tris
     is 12 MB of nodes + 64 MB of quads, so (d) could only ever serve
     treelet-chunked walks even if fast.

Each timing uses the data-chained protocol (result feeds next indices)
with min-separated t(1)/t(1+k) sampling.

  env PYTHONPATH=/root/.axon_site:/root/repo \
      python probes/probe_r5_scatter.py
"""

import functools
import json
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = int(os.environ.get("PROBE_ROWS", 1 << 20))   # 1M-row table
    n = int(os.environ.get("PROBE_N", 1 << 18))         # 262k fetches
    reps = int(os.environ.get("PROBE_REPS", 8))
    rounds = int(os.environ.get("PROBE_ROUNDS", 5))
    steps = int(os.environ.get("PROBE_STEPS", 4))       # chained steps

    dev = jax.devices()[0]
    log(f"# device {dev}")
    interp = dev.platform != "tpu"
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        table = np.random.default_rng(0).random((rows, 128), np.float32)
        idx0 = np.random.default_rng(1).integers(0, rows, n)
    table = jax.device_put(jnp.asarray(table), dev)
    idx0 = jax.device_put(jnp.asarray(idx0, jnp.int32), dev)

    # --- a) XLA gather ----------------------------------------------------
    def xla_chain(k, table, idx):
        def body(i, c):
            s, ix = c
            r = table[ix]                                # [n, 128]
            s = s + jnp.sum(r[:, 0])
            ix = (ix + r[:, 1].astype(jnp.int32) + i) % rows
            return s, ix
        return jax.lax.fori_loop(0, k * steps, body,
                                 (jnp.float32(0.0), idx))[0]

    # --- b/c) Pallas scattered DMA, depth-D queue ------------------------
    CH = 512                    # indices per grid program

    def dma_kernel(idx_ref, tab_ref, out_ref, ix_smem, buf, sems, sem1,
                   *, depth):
        g = pl.program_id(0)
        cp = pltpu.make_async_copy(idx_ref.at[g], ix_smem, sem1)
        cp.start()
        cp.wait()

        def row_dma(j, slot):
            ix = ix_smem[j % 8, j // 8].astype(jnp.int32)
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(ix, 1), :], buf.at[slot],
                sems.at[slot])

        for j in range(depth):   # prime the queue
            row_dma(j, j).start()

        def body(j, acc):
            slot = j % depth
            ix = ix_smem[j % 8, j // 8].astype(jnp.int32)
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(ix, 1), :], buf.at[slot],
                sems.at[slot]).wait()
            acc = acc + buf[slot, 0, :1]                 # consume
            jn = j + depth

            @pl.when(jn < CH)
            def _():
                row_dma(jn, slot).start()
            return acc

        acc = jax.lax.fori_loop(0, CH, body,
                                jnp.zeros((1,), jnp.float32))
        out_ref[:] = jnp.full((8, 128), acc[0], jnp.float32)

    def pallas_dma(idx8, table, depth):
        g = idx8.shape[0]
        return pl.pallas_call(
            functools.partial(dma_kernel, depth=depth),
            grid=(g,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=jax.ShapeDtypeStruct((g * 8, 128), jnp.float32),
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((8, 128), jnp.float32),
                pltpu.VMEM((depth, 1, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interp,
        )(idx8, table)

    def pack_idx(ix):
        # [.., CH] -> [g, 8, 128]: entry j at [j % 8, j // 8], lane-
        # padded to 128 (DMAs need 128-wide last dims)
        g = ix.shape[0] // CH
        x = ix.astype(jnp.float32).reshape(g, CH // 8, 8) \
            .transpose(0, 2, 1)
        pad = jnp.zeros((g, 8, 128 - CH // 8), jnp.float32)
        return jnp.concatenate([x, pad], axis=2)

    def dma_chain(k, table, idx, depth):
        idx8 = pack_idx(idx)

        def body(i, c):
            s, ix8 = c
            out = pallas_dma(ix8, table, depth)[::8, :1]   # [g, 1]
            s = s + jnp.sum(out)
            ix8 = jnp.abs(ix8 + out.reshape(-1, 1, 1) + i) % rows
            return s, ix8
        return jax.lax.fori_loop(0, k * steps, body,
                                 (jnp.float32(0.0), idx8))[0]

    # --- d) VMEM-resident table, dynamic sublane reads -------------------
    MV = int(os.environ.get("PROBE_MV", 16384))          # 8 MB resident

    def vmem_kernel(idx_ref, tab_ref, out_ref, ix_smem, sem1):
        g = pl.program_id(0)
        cp = pltpu.make_async_copy(idx_ref.at[g], ix_smem, sem1)
        cp.start()
        cp.wait()

        def body(j, acc):
            ix = ix_smem[j % 8, j // 8].astype(jnp.int32)
            row = tab_ref[pl.ds(ix, 1), :]               # [1, 128]
            return acc + row[0, :1]
        acc = jax.lax.fori_loop(0, CH, body,
                                jnp.zeros((1,), jnp.float32))
        out_ref[:] = jnp.full((8, 128), acc[0], jnp.float32)

    def pallas_vmem(idx8, tabv):
        g = idx8.shape[0]
        return pl.pallas_call(
            vmem_kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(MV_BLOCK, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_shape=jax.ShapeDtypeStruct((g * 8, 128), jnp.float32),
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interp,
        )(idx8, tabv)

    MV_BLOCK = (MV, 128)
    tabv = table[:MV]

    def vmem_chain(k, tabv, idx):
        idx8 = pack_idx(jnp.mod(idx, MV))

        def body(i, c):
            s, ix8 = c
            out = pallas_vmem(ix8, tabv)[::8, :1]          # [g, 1]
            s = s + jnp.sum(out)
            ix8 = jnp.abs(ix8 + out.reshape(-1, 1, 1) + i) % MV
            return s, ix8
        return jax.lax.fori_loop(0, k * steps, body,
                                 (jnp.float32(0.0), idx8))[0]

    variants = {
        "xla_gather": jax.jit(xla_chain, static_argnames=()),
        "dma_d2": jax.jit(functools.partial(dma_chain, depth=2)),
        "dma_d8": jax.jit(functools.partial(dma_chain, depth=8)),
        "vmem_sublane": jax.jit(vmem_chain),
    }
    args = {
        "xla_gather": (table, idx0),
        "dma_d2": (table, idx0),
        "dma_d8": (table, idx0),
        "vmem_sublane": (tabv, idx0),
    }
    sel = os.environ.get("PROBE_CFGS")
    if sel:
        keep = sel.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    for name, jf in variants.items():
        t0 = time.time()
        chk = float(jf(1, *args[name]))
        log(f"# compile {name}: {time.time()-t0:.1f}s chk={chk:.6g}")

    res = {"cfg": {"rows": rows, "n": n, "steps": steps, "ch": CH,
                   "mv": MV}}
    t1s = {k: [] for k in variants}
    tks = {k: [] for k in variants}
    for r in range(rounds):
        for name, jf in variants.items():
            t0 = time.time()
            _ = float(jf(1, *args[name]))
            t1s[name].append(time.time() - t0)
            t0 = time.time()
            _ = float(jf(1 + reps, *args[name]))
            tks[name].append(time.time() - t0)
            log(f"# round {r} {name:12s}: t1 {t1s[name][-1]*1e3:.0f}ms "
                f"tk {tks[name][-1]*1e3:.0f}ms")
    for name in variants:
        per_call = max((min(tks[name]) - min(t1s[name])) / reps, 1e-9)
        per_step = per_call / steps
        res[name] = {
            "step_ms": round(per_step * 1e3, 3),
            "ns_per_row": per_step / n * 1e9,
            "gb_per_s": n * 512 / per_step / 1e9,
        }
        log(f"# {name}: {res[name]}")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
