"""Microbenchmark: streaming clamped-ledger kernel vs the XLA
reduce-window path at HUS scale (run on the TPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from reina_tpu.ops.clamped import clamped_counter_grants
from reina_tpu.utils.compile import enable_persistent_cache


def main():
    enable_persistent_cache()
    N = 1686528
    rng = np.random.default_rng(0)
    releases = jnp.asarray(rng.integers(0, 2, (N, 2)), jnp.int32)
    requests = jnp.asarray(rng.random((N, 2)) < 0.01)
    init = jnp.asarray([200, 50], jnp.int32)
    offset = jnp.int32(123457)

    for force in ("xla", None):
        @jax.jit
        def f(rel, req, off):
            g, b = clamped_counter_grants(rel, req, init, off, force=force)
            # chain k reps to amortize the ~30 ms host sync
            tot = g.sum() + b.sum()
            for k in range(9):
                g2, b2 = clamped_counter_grants(
                    rel, req, init, (off + k + 1) % N, force=force)
                tot = tot + g2.sum() + b2.sum()
            return tot

        t0 = time.perf_counter()
        out = f(releases, requests, offset)
        v = float(np.asarray(out))   # hard sync
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            v = float(np.asarray(f(releases, requests, offset)))
        wall = (time.perf_counter() - t0) / reps
        print(f"force={force}: compile+1st {compile_s:.1f}s, "
              f"then {wall * 1000 / 10:.3f} ms per 2-ledger call "
              f"(check={v})", flush=True)


if __name__ == "__main__":
    main()
