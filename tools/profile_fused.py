"""Per-op Pallas-vs-XLA microbenchmarks at HUS shapes (real TPU).

Each measurement chains the op k times inside one jit (a scalar from
iteration i feeds iteration i+1) and hard-syncs with a host transfer —
``block_until_ready`` does not synchronize through the axon tunnel.

Run: python tools/profile_fused.py [max_block ...]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from reina_tpu.ops.fusedmap import (fused_bihistogram, fused_concat_prefix,
                                    fused_fn_onehot_sum, fused_map,
                                    fused_onehot_sum)
from reina_tpu.core.step import _output_masks

N = 1686528
A, V, T, S, B, G = 101, 2, 21, 2, 8, 10
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
    print(f"{label:52s} {per:8.3f} ms/op   (total {ms:7.1f} ms, k={k})",
          flush=True)
    return per


def main():
    global NOOP_MS
    print("device:", jax.devices()[0], flush=True)
    NOOP_MS = timed(lambda x: x[0] + 1.0, jnp.zeros(8))
    print(f"hard-sync noop roundtrip: {NOOP_MS:.1f} ms", flush=True)

    blocks = [int(a) for a in sys.argv[1:]] or [8192]

    ks = jr.split(key, 16)
    code_g = jr.randint(ks[0], (N,), 0, G + 1)       # group codes
    ages = jr.randint(ks[1], (N,), 0, A)
    fields = [
        jr.bernoulli(ks[2], 0.9, (N,)),              # active
        jr.bernoulli(ks[3], 0.1, (N,)),              # is_infected
        jr.bernoulli(ks[4], 0.2, (N,)),              # has_immunity
        jr.randint(ks[5], (N,), -1, 400).astype(jnp.int16),  # dov
        jr.bernoulli(ks[6], 0.01, (N,)),             # detected_today
        jr.randint(ks[7], (N,), 0, 8),               # new_st (i32)
        jr.bernoulli(ks[8], 0.01, (N,)),             # ever_icu
        jr.bernoulli(ks[9], 0.01, (N,)),             # death_outside
        jr.bernoulli(ks[10], 0.005, (N,)),           # newly
    ]
    eligible = jr.bernoulli(ks[11], 0.4, (N,))
    vts = jr.randint(ks[12], (N,), -1, V * T * 2)
    k_s = jr.randint(ks[13], (N,), 0, 30).astype(jnp.float32)
    wf = jr.uniform(ks[14], (N,), jnp.float32)
    codes_v = jr.randint(ks[15], (N,), 0, V)

    K = 10
    for mb in blocks:
        for force in ("xla", "pallas"):
            def f1(c, _s):
                out = 0.0
                s = _s
                for i in range(K):
                    r = fused_fn_onehot_sum(
                        [fields[0]] + [fields[1]] + fields[2:] + [],
                        _output_masks, 13, c + (s.astype(jnp.int32) & 0),
                        G + 1, max_block=mb, force=force)
                    s = r[0, 0]
                    out = out + s
                return out
            bench(f"fn_onehot_sum[13 masks,{force},mb={mb}]", K, f1,
                  code_g, jnp.float32(0))

            def f2(c, _s):
                s = _s
                for i in range(K):
                    r = fused_onehot_sum(
                        [eligible], c + (s.astype(jnp.int32) & 0), A,
                        max_block=mb, force=force)
                    s = r[0, 0]
                return s
            bench(f"onehot_sum[K=1,{force},mb={mb}]", K, f2,
                  ages, jnp.float32(0))

            def f3(c, _s):
                s = _s
                for i in range(K):
                    r = fused_bihistogram(
                        c + (s.astype(jnp.int32) & 0), V * T * 2,
                        k_s, ages, A, max_block=mb, force=force)
                    s = r[0, 0]
                return s
            bench(f"bihistogram[84x101,{force},mb={mb}]", K, f3,
                  vts, jnp.float32(0))

    for force in ("xla", "pallas"):
        def f4(w, _s):
            s = _s
            for i in range(K):
                r = fused_concat_prefix(w + (s * 0), None, 1, force=force)
                s = r[-1]
            return s
        bench(f"concat_prefix[none,{force}]", K, f4, wf, jnp.float32(0))

        def f5(w, _s):
            s = _s
            for i in range(K):
                r = fused_concat_prefix(w + (s & 0), codes_v, V,
                                        force=force)
                s = r[-1]
            return s
        bench(f"concat_prefix[V=2,{force}]", K, f5, wf, jnp.float32(0))


if __name__ == "__main__":
    main()
