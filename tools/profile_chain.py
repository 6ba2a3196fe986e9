"""Ablation bisect of the chained repro (which component poisons it?)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import jax.random as jr

from reina_tpu.ops.clamped import clamped_counter_grants

N = 1686528
A = 101
V = 2
KCAP = 65536


def make(ablate):
    def chained(state_f, ages, perm, tab2, key, beds):
        k1, k2, k3, k4, k5 = jr.split(key, 5)
        z = jr.normal(k1, (N,))
        g1 = tab2[0, ages]
        g2 = tab2[1, ages]
        f = jnp.exp(0.5 * z) * g1
        k_s = jnp.clip(jnp.floor(jnp.maximum(f, 1.0)).astype(jnp.int32) - 1, 0, 100)
        mask = (state_f > 0.3)
        k_s = jnp.where(mask, k_s, 0)
        if "scatter" not in ablate:
            gidx = jnp.where(mask, ages * V, A * V)
            Kg = jnp.zeros(A * V + 1, jnp.float32).at[gidx].add(
                k_s.astype(jnp.float32))[:A * V]
        else:
            Kg = jnp.ones(A * V, jnp.float32)
        u = jr.uniform(k2, (N,))
        h = -jnp.expm1(Kg[jnp.clip(ages, 0, A * V - 1)] * jnp.log1p(-g2 * 1e-7))
        newly = mask & (u < h)
        if "cumsum" not in ablate:
            pos = jnp.cumsum(newly.astype(jnp.int32)) - 1
        else:
            pos = jnp.arange(N, dtype=jnp.int32)
        if "scatter" not in ablate:
            slot = jnp.where(newly & (pos < KCAP), pos, KCAP)
            buf = jnp.full(KCAP + 1, N, jnp.int32).at[slot].set(
                jnp.arange(N, dtype=jnp.int32))[:KCAP]
        else:
            buf = jnp.arange(KCAP, dtype=jnp.int32)
        if "attr" not in ablate:
            c_sorted = (k_s.astype(jnp.float32))[perm]
            cum = jnp.cumsum(c_sorted)
            x = jr.uniform(k3, (KCAP,)) * cum[-1]
            posv = jnp.searchsorted(cum, x).astype(jnp.int32)
            src = perm[jnp.clip(posv, 0, N - 1)]
        else:
            c_sorted = k_s.astype(jnp.float32)
            src = buf
        if "scatter" not in ablate:
            nin = jnp.zeros(N, jnp.int32).at[
                jnp.where(buf < N, buf, N)].add(1, mode="drop")
        else:
            nin = jnp.zeros(N, jnp.int32)
        if "gamma" not in ablate:
            gam = jr.gamma(k4, 1.35, (N,)) * g2
        else:
            gam = u * g2
        req = newly & (gam > 2.0)
        rel = (state_f > 0.9).astype(jnp.int32)
        if "ledger" not in ablate:
            offset = jr.randint(k5, (), 0, N)
            granted, bal = clamped_counter_grants(rel, req, beds, offset)
        else:
            granted, bal = req, beds
        out = jnp.where(granted, gam, state_f) + nin + c_sorted
        return out.sum(), bal, Kg.sum()
    return chained


def run(label, ablate):
    key = jr.PRNGKey(0)
    state_f = jr.uniform(key, (N,))
    ages = jr.randint(key, (N,), 0, A)
    perm = jr.permutation(key, N)
    tab2 = jr.uniform(key, (V, A))
    f = jax.jit(make(ablate))
    t0 = time.perf_counter()
    out = f(state_f, ages, perm, tab2, key, jnp.int32(1000))
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(8):
        out = f(state_f, ages, perm, tab2, jr.fold_in(key, i), jnp.int32(1000))
    jax.block_until_ready(out)
    print(f"{label:28s} {(time.perf_counter() - t0) / 8 * 1000:9.2f} ms "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    for label, ablate in [
        ("full", ""),
        ("no ledger", "ledger"),
        ("no gamma", "gamma"),
        ("no attr(searchsorted)", "attr"),
        ("no scatters", "scatter"),
        ("no cumsum", "cumsum"),
        ("only gathers+elementwise", "ledger,gamma,attr,scatter,cumsum"),
    ]:
        run(label, ablate)
