"""Microbenchmark: cumulative-pass layouts for the ledger scan and the
phase-6 cumsums (same methodology as profile_ops_sync.py: K-chained
ops inside one jit, hard host sync, min of 5, noop subtracted).

Candidates at N=1.7M, k=4:
  k separate (N,) passes
  (N, k) one lane-stacked pass  (pads lanes k -> 128 on TPU tiles)
  (k, N) one sublane-stacked pass along axis=1 (pads sublanes k -> 8)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1_686_528
K = 4
REPS = 16
NOOP_MS = None


def timed(fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def bench(label, fn, *args):
    ms = timed(fn, *args)
    per = (ms - NOOP_MS) / REPS
    print(f"{label:40s} {per:8.3f} ms/op   (total {ms:7.1f} ms)", flush=True)


def rep(f):
    def g(x):
        acc = x
        for i in range(REPS):
            acc = f(acc + np.float32(i) * 1e-7)
        return jnp.sum(acc.reshape(-1)[:8])
    return g


def main():
    global NOOP_MS
    print("device:", jax.devices()[0], flush=True)
    NOOP_MS = timed(lambda x: x[0] + 1.0, jnp.zeros(8))
    print(f"hard-sync noop roundtrip: {NOOP_MS:.1f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    xk_lane = jax.random.normal(key, (N, K), jnp.float32)
    xk_sub = jnp.asarray(xk_lane.T.copy())
    x1 = jnp.asarray(xk_lane[:, 0].copy())

    bench("1x (N,) f32 cumsum",
          rep(lambda x: jnp.cumsum(x, axis=0) * 1e-6), x1)
    bench(f"{K}x separate (N,) f32 cumsum",
          rep(lambda x: sum(jnp.cumsum(x * (1.0 + 0.1 * i), axis=0)
                            for i in range(K)) * 1e-6), x1)
    bench(f"(N, {K}) f32 cumsum axis0",
          rep(lambda x: jnp.cumsum(x, axis=0) * 1e-6), xk_lane)
    bench(f"({K}, N) f32 cumsum axis1",
          rep(lambda x: jnp.cumsum(x, axis=1) * 1e-6), xk_sub)
    bench(f"(N, {K}) f32 cumsum+cummax axis0",
          rep(lambda x: (jnp.cumsum(x, axis=0) + lax.cummax(x, axis=0))
              * 1e-6), xk_lane)
    bench(f"({K}, N) f32 cumsum+cummax axis1",
          rep(lambda x: (jnp.cumsum(x, axis=1) + lax.cummax(x, axis=1))
              * 1e-6), xk_sub)
    bench("(N, 8) f32 cumsum+cummax axis0",
          rep(lambda x: (jnp.cumsum(x, axis=0) + lax.cummax(x, axis=0))
              * 1e-6),
          jax.random.normal(key, (N, 8), jnp.float32))
    bench("(8, N) f32 cumsum+cummax axis1",
          rep(lambda x: (jnp.cumsum(x, axis=1) + lax.cummax(x, axis=1))
              * 1e-6),
          jax.random.normal(key, (8, N), jnp.float32))


if __name__ == "__main__":
    main()
