"""Quantify small-table gather strategies on TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import jax.random as jr

N = 1686528
A = 101


def bench(name, fn, *args, n=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter() - t0) / n * 1000:8.3f} ms", flush=True)


def main():
    key = jr.PRNGKey(0)
    ages = jr.randint(key, (N,), 0, A)
    table = jr.uniform(key, (A,))
    table2d = jr.uniform(key, (2, A))
    big = jr.uniform(key, (N,))
    variant = jr.randint(key, (N,), 0, 2)

    bench("gather (101,) by (N,) idx", lambda t, i: t[i], table, ages)
    bench("gather (2,101) by (var,age)", lambda t, v, i: t[v, i],
          table2d, variant, ages)
    bench("take_along/jnp.take small", lambda t, i: jnp.take(t, i), table, ages)
    bench("gather (N,) by (N,) idx", lambda t, i: t[i], big,
          jr.randint(key, (N,), 0, N))

    onehot = jax.nn.one_hot(ages, A, dtype=jnp.bfloat16)
    bench("onehot matmul (N,101)@(101,1)",
          lambda o, t: jnp.dot(o, t.astype(jnp.bfloat16)[:, None],
                               preferred_element_type=jnp.float32), onehot, table)
    cols = jr.uniform(key, (A, 8))
    bench("onehot matmul (N,101)@(101,8)",
          lambda o, t: jnp.dot(o, t.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32), onehot, cols)

    def select_chain(t, i):
        acc = jnp.zeros(i.shape, jnp.float32)
        for k in range(A):
            acc = jnp.where(i == k, t[k], acc)
        return acc
    bench("select-chain 101 entries", select_chain, table, ages)

    def select_chain21(t, i):
        acc = jnp.zeros(i.shape, jnp.float32)
        for k in range(21):
            acc = jnp.where(i == k, t[k], acc)
        return acc
    iot_idx = jr.randint(key, (N,), 0, 21)
    bench("select-chain 21 entries", select_chain21, jr.uniform(key, (21,)), iot_idx)

    # scatter-adds
    vals = jr.uniform(key, (N,))
    g_idx = jr.randint(key, (N,), 0, 8485)
    bench("scatter-add N->8485", lambda i, v: jnp.zeros(8485, jnp.float32).at[i].add(v),
          g_idx, vals)
    tgt_idx = jr.randint(key, (N,), 0, N + 1)
    bench("scatter-add N->N+1 (i32 ones)",
          lambda i: jnp.zeros(N + 1, jnp.int32).at[i].add(1), tgt_idx)
    small_idx = jr.randint(key, (16384,), 0, N + 1)
    bench("scatter-add 16k->N+1",
          lambda i: jnp.zeros(N + 1, jnp.int32).at[i].add(1), small_idx)
    # segment-sum via sort-free matmul: (8485 bins)
    bench("bincount via sort+segment",
          lambda i, v: jax.ops.segment_sum(v, i, 8485), g_idx, vals)


if __name__ == "__main__":
    main()
