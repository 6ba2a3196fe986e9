"""TPU sanity check: the Pallas paths of the fusedmap ops must agree
bit-for-bit with their XLA fallbacks (run on a real TPU; the kernels
never engage on CPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from reina_tpu.ops.fusedmap import fused_bihistogram, fused_onehot_sum


def main():
    print("device:", jax.devices()[0], flush=True)
    N, K, B, A = 1 << 16, 13, 11, 84
    ks = jr.split(jr.PRNGKey(0), K)
    parts = [jr.bernoulli(k, 0.3, (N,)) for k in ks]
    code = jr.randint(jr.PRNGKey(1), (N,), -1, B + 2)
    for force in ("xla", "pallas"):
        out = np.asarray(fused_onehot_sum(parts, code, B, force=force))
        print(f"onehot_sum[{force}] total={out.sum():.0f}", flush=True)
        if force == "xla":
            ref = out
    np.testing.assert_array_equal(
        ref, np.asarray(fused_onehot_sum(parts, code, B, force="pallas")))
    print("fused_onehot_sum: pallas == xla", flush=True)

    ca = jr.randint(jr.PRNGKey(2), (N,), -1, A + 1)
    cb = jr.randint(jr.PRNGKey(3), (N,), 0, 101)
    w = jr.randint(jr.PRNGKey(4), (N,), 0, 128).astype(jnp.float32)
    ref = np.asarray(fused_bihistogram(ca, A, w, cb, 101, force="xla"))
    got = np.asarray(fused_bihistogram(ca, A, w, cb, 101, force="pallas"))
    np.testing.assert_array_equal(ref, got)
    print("fused_bihistogram: pallas == xla", flush=True)


if __name__ == "__main__":
    main()
