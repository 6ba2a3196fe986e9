"""fused_map: the Pallas path and the XLA fallback are bit-identical
(CPU runs exercise the fallback + the interpreter-independent shape
logic; the TPU path is exercised by bench/production runs)."""
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from reina_tpu.ops.fusedmap import fused_map


def _body(x, s, tab2, day2):
    t = jnp.where(s == 0, tab2[0, 0],
                  jnp.where(s == 1, tab2[0, 1], tab2[0, 2]))
    y = x * t + day2[0, 0].astype(jnp.float32)
    m = (y > 0) & (s > 0)
    return y, m, jnp.where(m, s + 1, s).astype(jnp.int16)


def test_fused_map_fallback_matches_direct():
    N = 4096
    x = jr.normal(jr.PRNGKey(0), (N,), jnp.float32)
    s = jr.randint(jr.PRNGKey(1), (N,), 0, 3, jnp.int32)
    tab = jnp.array([1.0, 2.0, 4.0], jnp.float32)
    day = jnp.int32(7)

    got = fused_map(_body, 3, [x, s], [tab, day], force="xla")
    want = _body(x, s, tab.reshape(1, -1), jnp.asarray(day).reshape(1, 1))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert [g.dtype for g in got] == [jnp.float32, bool, jnp.int16]


def test_fused_onehot_sum_fallback():
    N, K, B = 2048, 5, 11
    ks = jr.split(jr.PRNGKey(2), K)
    parts = [jr.bernoulli(k, 0.3, (N,)) for k in ks]
    code = jr.randint(jr.PRNGKey(3), (N,), -1, B + 2)  # incl. out-of-range

    from reina_tpu.ops.fusedmap import fused_onehot_sum
    got = np.asarray(fused_onehot_sum(parts, code, B, force="xla"))
    want = np.zeros((K, B))
    c = np.asarray(code)
    for k in range(K):
        m = np.asarray(parts[k])
        for b in range(B):
            want[k, b] = m[c == b].sum()
    np.testing.assert_array_equal(got, want)


def test_fused_bihistogram_fallback():
    N, A, B = 4096, 7, 13
    ca = jr.randint(jr.PRNGKey(4), (N,), -1, A + 1)
    cb = jr.randint(jr.PRNGKey(5), (N,), 0, B)
    w = jr.randint(jr.PRNGKey(6), (N,), 0, 100).astype(jnp.float32)

    from reina_tpu.ops.fusedmap import fused_bihistogram
    got = np.asarray(fused_bihistogram(ca, A, w, cb, B, force="xla"))
    want = np.zeros((A, B))
    can, cbn, wn = np.asarray(ca), np.asarray(cb), np.asarray(w)
    for a in range(A):
        for b in range(B):
            want[a, b] = wn[(can == a) & (cbn == b)].sum()
    np.testing.assert_array_equal(got, want)
