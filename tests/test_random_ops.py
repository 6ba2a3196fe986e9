"""While-free samplers vs reference distributions (scipy ground truth).

The sampler tests run in ONE fresh child interpreter
(test_random_ops_isolated): their big eager scan compiles land
~100 compiles into a full-suite run, where the cumulative XLA:CPU
defect segfaults (tests/_isolation.py; reproduced 2026-08-19 at
test_binomial_fixed_large_n inside ``pxla.compile``).
"""
import numpy as np
import pytest
import jax.numpy as jnp
import jax.random as jr
from scipy import stats

from _isolation import ISOLATED, run_isolated

from reina_tpu.ops.random import (binomial_fixed, gamma_fixed,
                                  searchsorted_fixed)

N = 200_000

needs_fresh_process = pytest.mark.skipif(
    not ISOLATED,
    reason="compile-fragile: executed inside test_random_ops_isolated's "
           "child interpreter")


def test_random_ops_isolated():
    """Run the guarded tests below in a fresh interpreter."""
    if ISOLATED:
        pytest.skip("already inside the isolated child")
    run_isolated("tests/test_random_ops.py")


@pytest.mark.parametrize("kappa", [1.35, 4.94, 2.0])
@needs_fresh_process
def test_gamma_fixed_matches(kappa):
    x = np.asarray(gamma_fixed(jr.PRNGKey(0), kappa, (N,)))
    assert np.isfinite(x).all() and (x > 0).all()
    # moments
    np.testing.assert_allclose(x.mean(), kappa, rtol=0.01)
    np.testing.assert_allclose(x.var(), kappa, rtol=0.03)
    # KS test against the exact distribution
    ks = stats.kstest(x[:20000], "gamma", args=(kappa,))
    assert ks.pvalue > 1e-4, ks


@pytest.mark.parametrize("n,p", [(50, 0.3), (1000, 0.02), (5, 0.5),
                                 (100000, 0.001), (40, 0.9), (200, 0.35)])
@needs_fresh_process
def test_binomial_fixed_matches(n, p):
    ns = jnp.full((N,), float(n))
    ps = jnp.full((N,), float(p))
    x = np.asarray(binomial_fixed(jr.PRNGKey(1), ns, ps))
    assert (x >= 0).all() and (x <= n).all()
    mean, var = n * p, n * p * (1 - p)
    assert abs(x.mean() - mean) < 5 * np.sqrt(var / N) + 1e-3, (x.mean(), mean)
    np.testing.assert_allclose(x.var(), var, rtol=0.05)
    # chi-square on the histogram vs exact pmf
    lo = max(0, int(mean - 5 * np.sqrt(var)))
    hi = min(n, int(mean + 5 * np.sqrt(var))) + 1
    ks = np.arange(lo, hi)
    pmf = stats.binom.pmf(ks, n, p)
    obs = np.array([(x == k).sum() for k in ks], dtype=float)
    keep = pmf * N > 10
    if keep.sum() > 3:
        chi2 = (((obs - pmf * N) ** 2) / (pmf * N))[keep].sum()
        dof = keep.sum() - 1
        # generous: catches gross sampler bugs, tolerates edge binning
        assert chi2 < dof + 8 * np.sqrt(2 * dof), (chi2, dof)


@needs_fresh_process
def test_binomial_zero_and_full():
    x = np.asarray(binomial_fixed(jr.PRNGKey(2), jnp.full((1000,), 20.0),
                                  jnp.zeros(1000)))
    assert (x == 0).all()
    x = np.asarray(binomial_fixed(jr.PRNGKey(3), jnp.full((1000,), 20.0),
                                  jnp.ones(1000)))
    assert (x == 20).all()


@needs_fresh_process
def test_searchsorted_fixed_matches():
    rng = np.random.default_rng(0)
    arr = np.sort(rng.uniform(0, 1, 10000)).astype(np.float32)
    q = rng.uniform(-0.1, 1.1, 5000).astype(np.float32)
    q = np.concatenate([q, arr[:100]])  # exact hits exercise side='left'
    want = np.searchsorted(arr, q, side="left")
    got = np.asarray(searchsorted_fixed(jnp.asarray(arr), jnp.asarray(q)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,p", [(2_000_000, 0.1), (100000, 0.4)])
@needs_fresh_process
def test_binomial_fixed_large_n(n, p):
    ns = jnp.full((50000,), float(n))
    ps = jnp.full((50000,), float(p))
    x = np.asarray(binomial_fixed(jr.PRNGKey(4), ns, ps))
    mean, var = n * p, n * p * (1 - p)
    assert abs(x.mean() - mean) < 6 * np.sqrt(var / 50000)
    np.testing.assert_allclose(x.var(), var, rtol=0.05)


@needs_fresh_process
def test_searchsorted_blocked_matches_reference():
    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np
    from reina_tpu.ops.random import searchsorted_blocked

    key = jr.PRNGKey(7)
    w = jnp.where(jr.uniform(key, (4096,)) > 0.7,
                  jr.uniform(jr.fold_in(key, 1), (4096,)), 0.0)
    cum = jnp.cumsum(w)
    q = jr.uniform(jr.fold_in(key, 2), (1000,)) * cum[-1]
    ref = jnp.searchsorted(cum, q, side="left")
    got = searchsorted_blocked(cum, q, side="left", block=128)
    assert bool(jnp.all(got == ref))
    # bracketed variant (brackets contain the answer)
    lo_i = jnp.maximum(ref - jr.randint(jr.fold_in(key, 3), (1000,), 0, 300), 0)
    hi_i = jnp.minimum(ref + 1 + jr.randint(jr.fold_in(key, 4), (1000,), 0, 300), 4096)
    got2 = searchsorted_blocked(cum, q, side="left", block=128,
                                lo_init=lo_i, hi_init=hi_i)
    assert bool(jnp.all(got2 == ref))


@needs_fresh_process
def test_searchsorted_compact_matches_fixed():
    """The free-level-1 routing gives bit-identical results to the
    plain bisect on exact-integer arrays (its only engine use)."""
    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np
    from reina_tpu.ops.random import (searchsorted_compact,
                                      searchsorted_fixed,
                                      tiny_level1_block)

    assert tiny_level1_block(1686528) == 17568      # HUS-padded N: 96 subs
    assert tiny_level1_block(4096) == 4096 // 64
    assert tiny_level1_block(10007) is None         # prime: no divisor

    for n in (4096, 1686528 // 128):
        mask = jr.bernoulli(jr.PRNGKey(5), 0.01, (n,))
        cum = jnp.cumsum(mask.astype(jnp.float32))
        q = jnp.arange(1, 130, dtype=jnp.float32)
        got = np.asarray(searchsorted_compact(cum, q, side="left"))
        want = np.asarray(searchsorted_fixed(cum, q, side="left"))
        np.testing.assert_array_equal(got, want)


@needs_fresh_process
def test_compact_indices():
    import jax.random as jr
    import numpy as np
    from reina_tpu.ops.compact import compact_indices

    key = jr.PRNGKey(3)
    for trial in range(4):
        m = jr.uniform(jr.fold_in(key, trial), (2048,)) < 0.13
        buf, cnt = compact_indices(m, 512)
        idx = np.flatnonzero(np.asarray(m))
        b = np.asarray(buf)
        assert int(cnt) == len(idx)
        assert (b[:len(idx)] == idx[:512]).all()
        assert (b[len(idx):] == 2048).all()
