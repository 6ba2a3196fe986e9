"""Morph a fast synthetic program toward the real day step, one feature
at a time, to find what makes large programs slow."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import jax.random as jr

from reina_tpu.ops.clamped import clamped_counter_grants

N = 1686528
A = 101


def bench(label, fn, args, n=6):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:38s} {(time.perf_counter() - t0) / n * 1000:9.2f} ms "
          f"(c {comp:.0f}s)", flush=True)


def make(n_phases, feats):
    def fn(x, st8, dl16, pred, tab, ages8, key, beds):
        ages = ages8.astype(jnp.int32)
        acc = x
        st = st8
        dl = dl16
        pd = pred
        for p in range(n_phases):
            k = jr.fold_in(key, p)
            if "rng" in feats:
                u = jr.uniform(k, (N,))
            else:
                u = acc * 0.3
            g = tab[p % 2, jnp.clip(ages + p, 0, A - 1)]
            m = (u < g) & pd
            if "int8" in feats:
                st = jnp.where(m, (st + 1) % 7, st).astype(jnp.int8)
                dl = jnp.where(m, dl + 1, dl).astype(jnp.int16)
                pd = pd ^ m
            acc = jnp.where(m, acc * g + u, acc)
            if "scatter" in feats and p % 8 == 0:
                bins = jnp.zeros(8485, jnp.float32).at[
                    jnp.clip(ages * (p + 1), 0, 8484)].add(acc)
                acc = acc + bins[jnp.clip(ages, 0, 8484)]
            if "ledger" in feats and p % 32 == 16:
                off = jr.randint(jr.fold_in(k, 1), (), 0, N)
                granted, bal = clamped_counter_grants(
                    m.astype(jnp.int32), pd & m, beds, off)
                acc = acc + granted
            if "matmul" in feats and p % 16 == 8:
                onehot = jax.nn.one_hot(ages % 10, 10, dtype=jnp.bfloat16)
                stats = jnp.dot(jnp.stack([m, pd]).astype(jnp.bfloat16),
                                onehot, preferred_element_type=jnp.float32)
                acc = acc + stats.sum() * 1e-9
        return acc.sum(), st.sum(), dl.sum()
    return fn


def main():
    key = jr.PRNGKey(0)
    x = jr.uniform(key, (N,))
    st8 = jr.randint(key, (N,), 0, 7, dtype=jnp.int8)
    dl16 = jr.randint(key, (N,), 0, 30, dtype=jnp.int16)
    pred = jr.bernoulli(key, 0.5, (N,))
    tab = jr.uniform(key, (2, A))
    ages8 = jr.randint(key, (N,), 0, A, dtype=jnp.uint8)
    args = (x, st8, dl16, pred, tab, ages8, key, jnp.int32(100))

    for label, feats in [
        ("64ph base", set()),
        ("64ph +rng", {"rng"}),
        ("64ph +int8", {"int8"}),
        ("64ph +rng+int8", {"rng", "int8"}),
        ("64ph +rng+int8+scatter", {"rng", "int8", "scatter"}),
        ("64ph +all(no ledger)", {"rng", "int8", "scatter", "matmul"}),
        ("64ph +all+ledger", {"rng", "int8", "scatter", "matmul", "ledger"}),
    ]:
        bench(label, make(64, feats), args)


if __name__ == "__main__":
    main()
