"""Honest TPU op microbenchmarks: through the axon tunnel
``block_until_ready`` does not synchronize, so each measurement chains
the op k times inside one jit and hard-syncs with a host transfer;
per-op cost = (T - T_noop)/k.

Run: python tools/profile_ops_sync.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

N = 1686528
A, V, T, S, B, G = 101, 2, 21, 2, 8, 10
KCAP = 1 << 16

key = jr.PRNGKey(0)
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


def bench(label, k, fn, *args):
    ms = timed(fn, *args)
    per = (ms - NOOP_MS) / k
    print(f"{label:48s} {per:8.3f} ms/op   (total {ms:7.1f} ms, k={k})",
          flush=True)
    return per


def main():
    global NOOP_MS
    print("device:", jax.devices()[0], flush=True)

    NOOP_MS = timed(lambda x: x[0] + 1.0, jnp.zeros(8))
    print(f"hard-sync noop roundtrip: {NOOP_MS:.1f} ms", flush=True)

    x = jr.uniform(key, (N,), jnp.float32)
    perm = jr.permutation(key, N)
    small_idx = jr.randint(key, (N,), 0, 42)
    tab42 = jr.uniform(key, (42,))
    q = jr.randint(key, (KCAP,), 0, N)
    st8 = jr.randint(key, (N,), 0, 7).astype(jnp.int8)
    ages8 = jr.randint(key, (N,), 0, A).astype(jnp.int8)
    seg101 = jr.randint(key, (N,), 0, A)
    kvals = jr.randint(key, (N,), 0, 128).astype(jnp.int32)
    onehot104 = jax.nn.one_hot(jr.randint(key, (N,), 0, 104), 104,
                               dtype=jnp.bfloat16)

    K = 16

    def rep(f):
        """Chain op K times with a data dependency."""
        def g(x, *rest):
            acc = x
            for i in range(K):
                acc = f(acc + np.float32(i) * 1e-7, *rest)
            return jnp.sum(acc[:8]) if acc.ndim else acc
        return g

    # elementwise
    bench("elementwise mul-add f32", K, rep(lambda a: a * 1.000001 + 1e-7), x)
    bench("elementwise 10-op f32", K,
          rep(lambda a: jnp.exp(a * 1e-3) + jnp.log1p(jnp.abs(a)) - a * a
              + jnp.sqrt(jnp.abs(a) + 1)), x)

    # RNG
    def draw_u(a, i=[0]):
        return a + jr.uniform(jr.fold_in(key, a[0].astype(jnp.int32)), (N,))
    bench("uniform(N) threefry", K, rep(draw_u), x)
    bench("normal(N) threefry", K,
          rep(lambda a: a + jr.normal(jr.fold_in(key, a[0].astype(jnp.int32)), (N,))), x)
    from reina_tpu.ops.random import gamma_fixed
    bench("gamma_fixed(N) 6 rounds", K,
          rep(lambda a: a + gamma_fixed(
              jr.fold_in(key, a[0].astype(jnp.int32)), 4.94, (N,))), x)

    # gathers
    bench("gather N<-N (perm)", K, rep(lambda a, p: a[p] + 0.0, ), x, perm)
    bench("gather N<-42 table", K,
          rep(lambda a, t: a + t[small_idx]), x, tab42)
    bench("gather 64k<-N", K,
          rep(lambda a: a.at[:KCAP].add(a[q] * 1e-9)), x)

    # scatters
    bench("scatter-add N->101", K,
          rep(lambda a: a + jnp.zeros(A + 1).at[seg101].add(a)[0]), x)
    bench("scatter-set 64k->N drop", K,
          rep(lambda a: a.at[q].set(1.0, mode="drop")), x)

    # one-hot + selects
    def iot_chain(a):
        idx = jnp.clip((a * 21).astype(jnp.int32), 0, 20)
        val = jnp.zeros(N)
        for t in range(T):
            val = jnp.where(idx == t, np.float32(t) * 0.1, val)
        return a + val * 1e-9
    bench("21-way where select chain", K, iot_chain, x)

    def vsel_chain(a):
        v = (a > 0.5).astype(jnp.int32)
        out = jnp.where(v == 1, a * 2, a)
        return out
    bench("2-way where (vsel)", K, rep(vsel_chain), x)

    # matmuls
    def big_mm(a, oh):
        # the one-hot rides as an ARGUMENT: closed-over it bakes a
        # ~350 MB constant into the remote-compile request (HTTP 413 —
        # the pitfall this file documents)
        lhs = (a[:, None] * jnp.ones(84, jnp.bfloat16)[None, :]).astype(jnp.bfloat16)
        out = jnp.dot(lhs.T, oh, preferred_element_type=jnp.float32)
        return a + out[0, 0] * 1e-12
    bench("(84,N)@(N,104) bf16 + lhs build", K, big_mm, x, onehot104)

    def small_mm(a):
        oh = jax.nn.one_hot((a * 13).astype(jnp.int32) % 13, 13,
                            dtype=jnp.bfloat16)
        out = jnp.dot(oh, jnp.ones((13, 8), jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return a + out[0, 0] * 1e-12
    bench("(N,13)@(13,8) bf16 onehot mm", K, small_mm, x)

    # scans
    bench("cumsum N f32", K, rep(lambda a: jnp.cumsum(a) * 1e-9 + a), x)
    from reina_tpu.ops.clamped import clamped_counter_grants
    def clamped(a):
        rel = (a > 0.9).astype(jnp.int32)
        req = a > 0.99
        g, after = clamped_counter_grants(rel, req, jnp.int32(100),
                                          jnp.int32(12345))
        return a + after.astype(jnp.float32) * 1e-9
    bench("clamped_counter_grants N", K, clamped, x)

    # searchsorted (bracketed, 17 steps, 64k queries from N-array)
    from reina_tpu.ops.random import searchsorted_fixed
    cum = jnp.cumsum(jr.uniform(key, (N,)))
    qs = jr.uniform(key, (KCAP,)) * cum[-1]
    def ss(a):
        pos = searchsorted_fixed(cum + a[0] * 1e-9, qs, side="left")
        return a + pos[0].astype(jnp.float32) * 1e-9
    bench("searchsorted 64k queries, 21 steps", K, ss, x)

    # int8/bool passes
    bench("int8 where pass", K,
          rep(lambda a: a + jnp.where(st8 == 2, 1, 0).astype(jnp.float32)[0] * 1e-9), x)


if __name__ == "__main__":
    main()
