"""Round-4: gather concurrency on the chip — can the grid walk's
latency-bound row gather (2.79 ms / 262k lanes, ~48 GB/s effective vs
~800 GB/s HBM) be pipelined?

Times data-chained gather loops (the DDA access pattern: next index
derived from gathered data) in several shapes:

  a) 1 chain,  [n]   indices            — the current walk's iteration
  b) 2 chains, [n]   each, interleaved  — software pipelining: XLA may
     overlap chain A's gather latency with chain B's math
  c) 4 chains, [n]   each, interleaved
  d) 1 chain,  [n,2] indices            — multi-row lookahead (fetch the
     DDA's next cell too; its id needs no data)
  e) 1 chain,  [n/2] indices            — is cost linear in lanes?
  f) 1 chain,  [n]   from a 16x smaller table — does table size matter?

  env PYTHONPATH=/root/.axon_site:/root/repo python probes/probe_gather_tpu.py
"""

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


N = 262144
R = 1_300_000   # ~ the 1M-fog inline grid table (1.3M rows x 128 f32)
ITERS = 16
REPS = 4


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"# device {dev}  n={N} rows={R} iters={ITERS}")
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        rng = np.random.RandomState(0)
        table_h = rng.rand(R, 128).astype(np.float32)
        # column 0: a jump in [1, R) so chained indices stay scattered
        table_h[:, 0] = rng.randint(1, R, size=R).astype(np.float32)
        idx_h = rng.randint(0, R, size=N).astype(np.int32)
    table = jax.device_put(jnp.asarray(table_h), dev)
    idx0 = jax.device_put(jnp.asarray(idx_h), dev)
    small = table[: R // 16]

    def timeit(name, f, *args):
        t0 = time.time()
        chk = float(f(1, *args))
        comp = time.time() - t0
        t0 = time.time()
        _ = float(f(1, *args))
        t1 = time.time() - t0
        t0 = time.time()
        _ = float(f(1 + REPS, *args))
        tk = time.time() - t0
        per_run = (tk - t1) / REPS
        log(f"{name}: compile {comp:.1f}s  {per_run/ITERS*1e3:.3f} ms/iter"
            f"  ({per_run*1e3:.1f} ms per {ITERS}-iter run)  chk={chk:.4g}")

    def step(table, idx, acc, nrows):
        rows = table[idx]                       # [n, 128] gather
        acc = acc + jnp.sum(rows[:, 64:66], axis=1)  # touch data
        nxt = (idx + rows[:, 0].astype(jnp.int32)) % nrows
        return nxt, acc

    def one_chain(k, table, idx0):
        nrows = table.shape[0]
        def run(i, carry):
            idx, acc = carry
            def it(j, c):
                return step(table, c[0], c[1], nrows)
            idx, acc = jax.lax.fori_loop(0, ITERS, it, (idx, acc))
            # re-arm for the next run with a data dependence
            return (idx0 + idx % 7) % nrows, acc
        _, acc = jax.lax.fori_loop(
            0, k, run, (idx0, jnp.zeros(idx0.shape, jnp.float32)))
        return jnp.sum(acc)

    def k_chains(nch):
        def f(k, table, idx0):
            nrows = table.shape[0]
            idxs = [(idx0 + 97 * c) % nrows for c in range(nch)]
            accs = [jnp.zeros((N,), jnp.float32) for _ in range(nch)]
            def run(i, carry):
                idxs, accs = list(carry[0]), list(carry[1])
                def it(j, c):
                    ii, aa = list(c[0]), list(c[1])
                    for ch in range(nch):
                        ii[ch], aa[ch] = step(table, ii[ch], aa[ch], nrows)
                    return tuple(ii), tuple(aa)
                ii, aa = jax.lax.fori_loop(0, ITERS, it,
                                           (tuple(idxs), tuple(accs)))
                ii = tuple((idx0 + x % 7) % nrows for x in ii)
                return ii, aa
            _, accs = jax.lax.fori_loop(
                0, k, run, (tuple(idxs), tuple(accs)))
            return sum(jnp.sum(a) for a in accs)
        return f

    def two_wide(k, table, idx0):
        """[n, 2] indices per gather: current row + lookahead row."""
        nrows = table.shape[0]
        def run(i, carry):
            idx, acc = carry
            def it(j, c):
                idx, acc = c
                idx2 = jnp.stack([idx, (idx + 1) % nrows], axis=1)
                rows = table[idx2]                  # [n, 2, 128]
                acc = acc + jnp.sum(rows[:, :, 64], axis=1)
                nxt = (idx + rows[:, 0, 0].astype(jnp.int32)) % nrows
                return nxt, acc
            idx, acc = jax.lax.fori_loop(0, ITERS, it, (idx, acc))
            return (idx0 + idx % 7) % nrows, acc
        _, acc = jax.lax.fori_loop(0, k, run,
                                   (idx0, jnp.zeros((N,), jnp.float32)))
        return jnp.sum(acc)

    def half(k, table, idx0):
        return one_chain(k, table, idx0[: N // 2])

    timeit("a) 1 chain  [n]   ", jax.jit(one_chain), table, idx0)
    timeit("b) 2 chains [n]   ", jax.jit(k_chains(2)), table, idx0)
    timeit("c) 4 chains [n]   ", jax.jit(k_chains(4)), table, idx0)
    timeit("d) 1 chain  [n,2] ", jax.jit(two_wide), table, idx0)
    timeit("e) 1 chain  [n/2] ", jax.jit(half), table, idx0)
    timeit("f) small table    ", jax.jit(one_chain), small,
           idx0 % (R // 16))


if __name__ == "__main__":
    main()
