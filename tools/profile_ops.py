"""Microbenchmark the day-step's building blocks on the real device."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

N = 1686528
A, V, T, S, B, G = 101, 2, 21, 2, 15, 10
KCAP = 1 << 16


def bench(name, fn, *args, n=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {ms:8.3f} ms")
    return ms


def main():
    key = jr.PRNGKey(0)
    print("device:", jax.devices()[0])

    idx = jr.randint(key, (N,), 0, A * V * T * S)
    vals = jr.uniform(key, (N,))
    bench("scatter-add N->8484 bins", lambda i, v: jnp.zeros(A * V * T * S + 1, jnp.float32).at[i].add(v), idx, vals)

    seg = jr.randint(key, (N,), 0, G)
    bench("scatter-add N->10 bins", lambda i, v: jnp.zeros(G + 1, jnp.float32).at[i].add(v), seg, vals)

    onehot = jax.nn.one_hot(seg, G, dtype=jnp.bfloat16)
    masks = jr.bernoulli(key, 0.5, (13, N)).astype(jnp.bfloat16)
    bench("group stats matmul (13,N)x(N,10)", lambda m, o: jnp.dot(m, o, preferred_element_type=jnp.float32), masks, onehot)

    bench("cumsum N f32", jnp.cumsum, vals)
    bench("cumsum N i32", jnp.cumsum, seg.astype(jnp.int32))

    def assoc(a, m):
        def comp(f, g):
            return f[0] + g[0], jnp.maximum(f[1] + g[1], g[1] * 0 + g[1])
        return jax.lax.associative_scan(comp, (a, m))
    a = jr.randint(key, (N,), -1, 2)
    bench("associative_scan N (pair)", assoc, a, a)

    big = jnp.sort(vals)
    q = jr.uniform(key, (KCAP,))
    bench("searchsorted N x 65536", lambda c, x: jnp.searchsorted(c, x), big, q)

    totals = jr.uniform(key, (A, V, T, S)) * 1000
    probs = jr.uniform(key, (A, V, T, S, B)) * 0.01
    def binom_split(k, tot, pr):
        rem, remp = tot, jnp.ones_like(tot)
        outs = []
        for b in range(B):
            pb = pr[..., b]
            cond = jnp.clip(pb / jnp.maximum(remp, 1e-9), 0, 1)
            nb = jr.binomial(jr.fold_in(k, b), rem, cond)
            outs.append(nb)
            rem = rem - nb
            remp = remp - pb
        return jnp.stack(outs, -1)
    bench("binomial split (8484,15)", binom_split, key, totals, probs)

    bench("gamma N", lambda k: jr.gamma(k, 1.35, (N,)), key)
    bench("uniform N", lambda k: jr.uniform(k, (N,)), key)
    bench("normal N", lambda k: jr.normal(k, (N,)), key)

    bench("roll N dynamic", lambda v, s: jnp.roll(v, s), vals, jnp.int32(12345))

    g = jr.gumbel(key, (KCAP, A))
    bench("argmax (65536,101)", lambda x: jnp.argmax(x, axis=1), g)

    perm = jr.permutation(key, N)
    bench("gather N perm", lambda v, p: v[p], vals, perm)
    bench("scatter set N (drop)", lambda v, p: v.at[p].set(1.0, mode="drop"), vals, perm)

    bench("elementwise 10-op N", lambda v: jnp.exp(v) * 2 + jnp.log1p(v) - v * v + jnp.sqrt(v + 1), vals)


if __name__ == "__main__":
    main()
