"""Measure VPU f32 divide vs multiply throughput inside a Pallas kernel.

The SO dense test spends one [CR, tile] divide per 8-group per window
(tt = d0/dsum). If divides cost several multiply-slots on the VPU, a
rational (division-free) winner accumulator is a 15-25% dense-math win.
This kernel times N back-to-back data-dependent ops of each kind on
[8, 512] blocks — the same native shape the packet kernels issue.

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_div_cost.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 1024          # chained ops per kernel pass
PASSES = 64          # fori_loop passes inside the kernel


N_CHAINS = 8  # independent chains -> throughput, not latency


def make_kernel(op):
    def kernel(x_ref, o_ref):
        def body(i, ys):
            # data-dependent chains the compiler cannot fold; N_CHAINS
            # independent accumulators expose ISSUE RATE (a single
            # dependent chain only measures op latency)
            for _ in range(REPS // 8):
                ys = list(ys)
                for k in range(N_CHAINS):
                    y = ys[k]
                    c = y * 1e-8 + 1.000001
                    if op == "div":
                        y = y / c
                    elif op == "mul":
                        y = y * c
                    elif op == "fma":
                        y = y * c + 1e-7
                    elif op == "max":
                        y = jnp.maximum(y * 0.999999, c)
                    elif op == "cmpsel":
                        y = jnp.where(y > c, y * 0.999999, y + 1e-7)
                    elif op == "recip":
                        y = pl.reciprocal(y, approx=True) + c
                    ys[k] = y
                ys = tuple(ys)
            return ys

        ys = jax.lax.fori_loop(
            0, PASSES, body,
            tuple(x_ref[:] * (1.0 + 0.1 * k) for k in range(N_CHAINS)))
        acc = ys[0]
        for k in range(1, N_CHAINS):
            acc = acc + ys[k]
        o_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("op",))
def run(x, op):
    return pl.pallas_call(
        make_kernel(op),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    dev = jax.devices()[0]
    print(f"# device {dev}", file=sys.stderr, flush=True)
    x = jnp.full((8, 512), 1.5, jnp.float32)
    x = jax.device_put(x, dev)
    # ops per run: REPS/8 iters x 8 chain steps... each chain step is
    # (1 aux mul + 1 aux add) + 1 timed op on [8,512] = 4 native [8,128]
    for op in ("mul", "fma", "div", "recip", "max", "cmpsel"):
        t0 = time.time()
        r = run(x, op)
        chk = float(jnp.sum(r))   # forced fetch = real completion
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            chk = float(jnp.sum(run(x, op)))
        dt = (time.time() - t0) / 3
        n_ops = (REPS // 8) * PASSES * N_CHAINS  # timed ops total
        lanes = 8 * 512
        print(f"{op:7s} compile {compile_s:5.1f}s  run {dt*1e3:7.2f} ms  "
              f"-> {n_ops * lanes / dt / 1e9:7.1f} G elem-ops/s  chk={chk:.3g}",
              flush=True)


if __name__ == "__main__":
    main()
