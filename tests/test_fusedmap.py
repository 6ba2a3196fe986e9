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


def test_fused_fn_onehot_sum_fallback():
    from reina_tpu.ops.fusedmap import fused_fn_onehot_sum, fused_onehot_sum
    N, B = 2048, 9
    a = jr.bernoulli(jr.PRNGKey(9), 0.4, (N,))
    v = jr.randint(jr.PRNGKey(10), (N,), -3, 40, jnp.int16)
    s = jr.randint(jr.PRNGKey(11), (N,), 0, 5, jnp.int32)
    code = jr.randint(jr.PRNGKey(12), (N,), 0, B)

    def mask_fn(a, v, s):
        v = v.astype(jnp.int32)
        return [a & (v >= 0), a & (s == 2), (v >= 10) & ~a]

    got = np.asarray(fused_fn_onehot_sum([a, v, s], mask_fn, 3, code, B,
                                         force="xla"))
    want = np.asarray(fused_onehot_sum(mask_fn(a, v, s), code, B,
                                       force="xla"))
    np.testing.assert_array_equal(got, want)


def test_fused_concat_prefix():
    from reina_tpu.ops.fusedmap import fused_concat_prefix
    N, V = 4096, 2
    w = jr.uniform(jr.PRNGKey(7), (N,), jnp.float32) * 3
    codes = jr.randint(jr.PRNGKey(8), (N,), 0, V, jnp.int32)

    out = np.asarray(fused_concat_prefix(w, codes, V, force="xla"))
    ref = np.cumsum(np.concatenate(
        [np.where(np.asarray(codes) == s, np.asarray(w), 0.0)
         for s in range(V)]), dtype=np.float64)
    assert out.shape == (V * N,)
    # f32 tree-sum accuracy + the same worst-case dip class as
    # jnp.cumsum (docs/parity.md deviation 12)
    assert np.abs(out - ref).max() / ref[-1] < 1e-6
    dip = -min(np.diff(out).min(), 0.0) / out[-1]
    assert dip < 1e-6

    # integer-valued f32 streams are EXACT under any association
    wi = jnp.floor(w * 10)
    outi = np.asarray(fused_concat_prefix(wi, codes, V, force="xla"))
    refi = np.cumsum(np.concatenate(
        [np.where(np.asarray(codes) == s, np.asarray(wi), 0.0)
         for s in range(V)]))
    np.testing.assert_array_equal(outi, refi)

    # the interpreted Pallas kernel is bit-identical to the fallback
    ki = np.asarray(fused_concat_prefix(w, codes, V, force="interpret"))
    np.testing.assert_array_equal(ki, out)

    # codes=None: plain fused cumsum, same three properties
    out1 = np.asarray(fused_concat_prefix(w, None, 1, force="xla"))
    k1 = np.asarray(fused_concat_prefix(w, None, 1, force="interpret"))
    np.testing.assert_array_equal(k1, out1)
    assert np.abs(out1 - np.cumsum(np.asarray(w), dtype=np.float64)
                  ).max() / out1[-1] < 1e-6

    # odd N (not a multiple of 1024) takes the plain-jnp path
    o3 = np.asarray(fused_concat_prefix(w[:1000], codes[:1000], V))
    assert o3.shape == (2000,)
    np.testing.assert_allclose(
        o3[-1], np.asarray(w[:1000]).sum(), rtol=1e-5)


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


# ---- interpret-mode bit-identity: the ACTUAL kernel bodies (grid
# walk, block specs, SMEM/VMEM accumulators) vs the XLA fallbacks, on
# CPU CI. A Mosaic toolchain regression still needs TPU hardware to
# surface, but any kernel-logic bug turns a test red here instead of a
# silent bench fallback. Sizes chosen so the grid has > 1 step.


def test_fused_map_kernel_matches_fallback():
    N = 8192  # R = 64, blk = 64 → then force multi-block via max rows
    x = jr.normal(jr.PRNGKey(20), (N,), jnp.float32)
    s = jr.randint(jr.PRNGKey(21), (N,), 0, 3, jnp.int32)
    tab = jnp.array([1.0, 2.0, 4.0], jnp.float32)
    day = jnp.int32(7)

    got = fused_map(_body, 3, [x, s], [tab, day], max_block_rows=16,
                    force="interpret")  # R=64, blk=16 → grid of 4
    want = fused_map(_body, 3, [x, s], [tab, day], force="xla")
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fused_onehot_sum_kernel_matches_fallback():
    from reina_tpu.ops.fusedmap import fused_onehot_sum
    N, K, B = 4096, 5, 11
    ks = jr.split(jr.PRNGKey(22), K)
    parts = [jr.bernoulli(k, 0.3, (N,)) for k in ks]
    code = jr.randint(jr.PRNGKey(23), (N,), -1, B + 2)

    got = np.asarray(fused_onehot_sum(parts, code, B, max_block=1024,
                                      force="interpret"))  # grid of 4
    want = np.asarray(fused_onehot_sum(parts, code, B, force="xla"))
    np.testing.assert_array_equal(got, want)


def test_fused_fn_onehot_sum_kernel_matches_fallback():
    from reina_tpu.ops.fusedmap import fused_fn_onehot_sum
    N, B = 4096, 9
    a = jr.bernoulli(jr.PRNGKey(24), 0.4, (N,))
    v = jr.randint(jr.PRNGKey(25), (N,), -3, 40, jnp.int16)
    s = jr.randint(jr.PRNGKey(26), (N,), 0, 5, jnp.int32)
    code = jr.randint(jr.PRNGKey(27), (N,), 0, B)

    def mask_fn(a, v, s):
        v = v.astype(jnp.int32)
        return [a & (v >= 0), a & (s == 2), (v >= 10) & ~a]

    got = np.asarray(fused_fn_onehot_sum([a, v, s], mask_fn, 3, code, B,
                                         max_block=1024, force="interpret"))
    want = np.asarray(fused_fn_onehot_sum([a, v, s], mask_fn, 3, code, B,
                                          force="xla"))
    np.testing.assert_array_equal(got, want)


def test_fused_bihistogram_kernel_matches_fallback():
    from reina_tpu.ops.fusedmap import fused_bihistogram
    N, A, B = 4096, 7, 13
    ca = jr.randint(jr.PRNGKey(28), (N,), -1, A + 1)
    cb = jr.randint(jr.PRNGKey(29), (N,), 0, B)
    w = jr.randint(jr.PRNGKey(30), (N,), 0, 100).astype(jnp.float32)

    got = np.asarray(fused_bihistogram(ca, A, w, cb, B, max_block=1024,
                                       force="interpret"))  # grid of 4
    want = np.asarray(fused_bihistogram(ca, A, w, cb, B, force="xla"))
    np.testing.assert_array_equal(got, want)


# ---- shard_map islands: each fused op wrapped over a mesh agent axis
# (the program multi-chip mesh runs execute — ops/fusedmap.shard_pallas)
# is bit-identical to its unsharded fallback. Interpret-mode kernels on
# a 2×2 virtual CPU mesh; collectives (psum stitches, the exact-int
# prefix offset fold, the ledger carry fold) run for real.


def _mesh22():
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("seed", "agent"))


def test_shard_island_fused_map(monkeypatch):
    import jax
    from reina_tpu.ops.fusedmap import shard_pallas
    monkeypatch.setenv("REINA_SHARD_INTERPRET", "1")
    N = 8192
    x = jr.normal(jr.PRNGKey(31), (N,), jnp.float32)
    s = jr.randint(jr.PRNGKey(32), (N,), 0, 3, jnp.int32)
    tab = jnp.array([1.0, 2.0, 4.0], jnp.float32)
    day = jnp.int32(7)
    want = fused_map(_body, 3, [x, s], [tab, day], force="xla")
    with shard_pallas(_mesh22()):
        got = jax.jit(
            lambda x, s: fused_map(_body, 3, [x, s], [tab, day]))(x, s)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_shard_island_histograms_psum(monkeypatch):
    import jax
    from reina_tpu.ops.fusedmap import (fused_bihistogram,
                                        fused_fn_onehot_sum,
                                        fused_onehot_sum, shard_pallas)
    monkeypatch.setenv("REINA_SHARD_INTERPRET", "1")
    N, K, B, A = 8192, 4, 11, 7
    parts = [jr.bernoulli(k, 0.3, (N,)) for k in jr.split(jr.PRNGKey(33), K)]
    code = jr.randint(jr.PRNGKey(34), (N,), -1, B + 2)
    ca = jr.randint(jr.PRNGKey(35), (N,), -1, A + 1)
    w = jr.randint(jr.PRNGKey(36), (N,), 0, 100).astype(jnp.float32)

    def mask_fn(a, b):
        return [a & b, a | b, a ^ b]

    want1 = np.asarray(fused_onehot_sum(parts, code, B, force="xla"))
    want2 = np.asarray(fused_bihistogram(ca, A, w, code, B, force="xla"))
    want3 = np.asarray(fused_fn_onehot_sum(parts[:2], mask_fn, 3, code, B,
                                           force="xla"))
    with shard_pallas(_mesh22()):
        got1 = jax.jit(lambda c, *p: fused_onehot_sum(p, c, B))(code, *parts)
        got2 = jax.jit(lambda a, w, c: fused_bihistogram(a, A, w, c, B))(
            ca, w, code)
        got3 = jax.jit(
            lambda c, *p: fused_fn_onehot_sum(p, mask_fn, 3, c, B))(
            code, *parts[:2])
    np.testing.assert_array_equal(np.asarray(got1), want1)
    np.testing.assert_array_equal(np.asarray(got2), want2)
    np.testing.assert_array_equal(np.asarray(got3), want3)


def test_shard_island_concat_prefix_exact_int(monkeypatch):
    import jax
    from reina_tpu.ops.fusedmap import fused_concat_prefix, shard_pallas
    monkeypatch.setenv("REINA_SHARD_INTERPRET", "1")
    N, V = 8192, 3
    w = jnp.floor(jr.uniform(jr.PRNGKey(37), (N,), jnp.float32) * 5)
    codes = jr.randint(jr.PRNGKey(38), (N,), 0, V, jnp.int32)
    want = np.asarray(fused_concat_prefix(w, codes, V, force="xla"))
    want1 = np.asarray(fused_concat_prefix(w, None, 1, force="xla"))
    with shard_pallas(_mesh22()):
        got = jax.jit(lambda w, c: fused_concat_prefix(
            w, c, V, exact_int=True))(w, codes)
        got1 = jax.jit(lambda w: fused_concat_prefix(
            w, None, 1, exact_int=True))(w)
        # real-float weights DECLINE the island (association is fixed
        # by the sequential chain): same values as the fallback because
        # it IS the fallback
        gotf = jax.jit(lambda w, c: fused_concat_prefix(w, c, V))(
            w + 0.5, codes)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(got1), want1)
    np.testing.assert_array_equal(
        np.asarray(gotf),
        np.asarray(fused_concat_prefix(w + 0.5, codes, V, force="xla")))
