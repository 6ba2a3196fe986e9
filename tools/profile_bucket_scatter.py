"""Why does the bucket-table scatter copy the whole 432 MB table?

A 64k-update scatter into an (N*64,) s32 scan carry should update in
place (~5 ns/update). The day-200 trace (2026-08-20) shows it as a
~1.6 ms kCustom fusion instead — a full table read+write. This repro
times a scan-carried table + per-iteration scatter under the
structures the engine uses, to find which one defeats XLA's in-place
buffer assignment:

  A: scatter only
  B: gather-read (tracing-like) then scatter
  C: gather-read under lax.cond, then scatter
  D: B with the gather under the same carry, unroll=2

Usage: python tools/profile_bucket_scatter.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1686528
CAPB = 64
K = 65536
ITERS = 20


def bench(name, body):
    from reina_tpu.utils.compile import TPU_COMPILER_OPTIONS

    @functools.partial(jax.jit, compiler_options=TPU_COMPILER_OPTIONS)
    def run(table, idx, val):
        def step(tab, xs):
            i, v = xs
            return body(tab, i, v), 0
        tab, _ = jax.lax.scan(step, table,
                              (idx, val))
        return tab

    table = jnp.full(N * CAPB, N, jnp.int32)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N * CAPB, (ITERS, K)).astype(np.int32))
    val = jnp.asarray(rng.integers(0, N, (ITERS, K)).astype(np.int32))
    out = run(table, idx, val)
    float(np.asarray(out)[0])                       # hard sync
    t0 = time.perf_counter()
    out = run(table, idx, val)
    float(np.asarray(out)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.3f} ms/iter", flush=True)


def main():
    bench("A scatter only",
          lambda tab, i, v: tab.at[i].set(v, mode="drop"))

    def b(tab, i, v):
        s = jnp.sum(tab[jnp.clip(i, 0, N * CAPB - 1)])
        return tab.at[jnp.where(s >= 0, i, i)].set(v, mode="drop")
    bench("B gather then scatter", b)

    def c(tab, i, v):
        s = jax.lax.cond(i[0] >= 0,
                         lambda: jnp.sum(tab[jnp.clip(i, 0, N * CAPB - 1)]),
                         lambda: jnp.int32(0))
        return tab.at[jnp.where(s >= 0, i, i)].set(v, mode="drop")
    bench("C cond-gather then scatter", c)


if __name__ == "__main__":
    main()
