"""Microbenchmark fused_concat_prefix (Pallas vs XLA fallback vs
jnp.cumsum) at HUS scale on the TPU.

Validates bit-identity between the kernel and the blocked fallback
(the module's design rule), then times each path with the hard
host-sync protocol (block_until_ready does not synchronize through
this TPU plugin — docs/performance.md).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from reina_tpu.ops.fusedmap import fused_concat_prefix
from reina_tpu.utils.compile import engine_jit

N = 1686528
V = 2
REPS = 20


def sync(x):
    return float(np.asarray(x.ravel()[-1]))


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random(N, dtype=np.float32) * 3)
    codes = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

    @engine_jit(static_argnums=(2,))
    def chain(w, codes, force):
        # chain REPS dependent calls so the per-op cost dominates the
        # ~30 ms host round-trip
        acc = jnp.float32(0)
        for _ in range(REPS):
            out = fused_concat_prefix(w + acc * 1e-20, codes, V,
                                      force=force)
            acc = out[-1]
        return out, acc

    @engine_jit
    def chain_cumsum(w, codes):
        acc = jnp.float32(0)
        for _ in range(REPS):
            out = jnp.cumsum(jnp.concatenate(
                [jnp.where(codes == s, w + acc * 1e-20, 0.0)
                 for s in range(V)]))
            acc = out[-1]
        return out, acc

    results = {}
    for force in ("pallas", "xla"):
        try:
            out, acc = chain(w, codes, force)
            sync(acc)
            t0 = time.perf_counter()
            out, acc = chain(w, codes, force)
            sync(acc)
            dt = (time.perf_counter() - t0) / REPS
            results[force] = (np.asarray(out), dt)
            print(f"{force:8s}: {dt * 1e3:7.3f} ms / call")
        except Exception as e:  # Mosaic rejection is a finding, not a crash
            print(f"{force:8s}: FAILED {type(e).__name__}: {e}")
    out, acc = chain_cumsum(w, codes)
    sync(acc)
    t0 = time.perf_counter()
    out, acc = chain_cumsum(w, codes)
    sync(acc)
    print(f"cumsum  : {(time.perf_counter() - t0) / REPS * 1e3:7.3f} ms / call")

    if "pallas" in results and "xla" in results:
        same = np.array_equal(results["pallas"][0], results["xla"][0])
        print("pallas == fallback bit-identical:", same)


if __name__ == "__main__":
    main()
