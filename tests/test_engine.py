"""End-to-end engine invariants on a synthetic population."""

import pytest as _pytest

from _isolation import ISOLATED as _ISOLATED

# engine-compiling module: runs only inside a fresh child interpreter
# (tests/test_isolated_modules.py) -- see the cumulative XLA:CPU defect
# note in tests/_isolation.py
pytestmark = _pytest.mark.skipif(
    not _ISOLATED,
    reason="compile-fragile: executed via test_isolated_modules")
import numpy as np

from reina_tpu.core import constants as C


def test_epidemic_happens(tiny_result):
    out, state, carry = tiny_result
    all_infected = out.by_group[:, 3].sum(axis=1)
    assert all_infected[-1] > 100, all_infected
    assert (np.diff(all_infected) >= 0).all()  # cumulative


def test_conservation(tiny_run, tiny_result):
    out, state, carry = tiny_result
    n = tiny_run.n_agents
    # susceptible + all_infected == population, every day
    susceptible = out.by_group[:, 0].sum(axis=1)
    all_infected = out.by_group[:, 3].sum(axis=1)
    np.testing.assert_array_equal(susceptible + all_infected, n)
    # infected == in agent states incubation/illness/hosp/icu
    st = np.asarray(state.state)
    active = np.asarray(state.active)
    infected_final = out.by_group[-1, 2].sum()
    in_flight = (active & np.isin(st, [C.INCUBATION, C.ILLNESS,
                                       C.HOSPITALIZED, C.IN_ICU])).sum()
    assert infected_final == in_flight
    # dead + recovered + infected == all_infected
    dead = out.by_group[:, 9].sum(axis=1)
    recovered = out.by_group[:, 10].sum(axis=1)
    infected = out.by_group[:, 2].sum(axis=1)
    np.testing.assert_array_equal(dead + recovered + infected, all_infected)


def test_capacity_ledgers(tiny_result):
    out, state, carry = tiny_result
    assert (out.available_hospital_beds >= 0).all()
    assert (out.available_icu_units >= 0).all()
    # builds on 2020-03-03 (day 14) visible the following row
    assert out.total_icu_units[0] == 10
    assert out.total_icu_units[-1] == 15


def test_detection_and_tracing_ran(tiny_result):
    out, state, carry = tiny_result
    detected_cum = out.by_group[:, 5].sum(axis=1)
    assert detected_cum[-1] > 0
    assert (np.diff(detected_cum) >= 0).all()
    # contact tracing queue processed after CT mode starts (day 16+)
    assert out.ct_cases_per_day[17:].sum() > 0


def test_vaccination_oldest_first(tiny_result):
    out, state, carry = tiny_result
    vacc = out.by_group[:, 1]  # (days, G)
    assert vacc[-1].sum() > 0
    # campaign targets 60+: nobody under 60 vaccinated
    assert vacc[-1, :6].sum() == 0
    dov = np.asarray(state.day_of_vaccination)
    ages = np.asarray(state.age)
    active = np.asarray(state.active)
    vaccinated = active & (dov >= 0)
    assert vaccinated.sum() > 0
    assert ages[vaccinated].min() >= 60
    # oldest-first: earlier vaccination days have older (or equal) ages;
    # check the oldest age group saturates before younger ones start
    first_day = dov[vaccinated].min()
    ages_first = ages[vaccinated & (dov == first_day)]
    ages_last = ages[vaccinated & (dov == dov[vaccinated].max())]
    assert ages_first.mean() >= ages_last.mean()


def test_mobility_metric(tiny_result):
    out, _state, _carry = tiny_result
    # limit-mobility 30% on day 12 → metric 0.3 from row 13 on
    assert out.mobility_limitation[0] == 0
    np.testing.assert_allclose(out.mobility_limitation[-1], 0.3, atol=1e-6)


def test_determinism_and_seed_sensitivity(tiny_run):
    # shape hygiene on this 1-core CI host: n_days=17 makes the two
    # chunkings exact (16 = 2×8 = 4×4), so the test adds ONE compiled
    # program (chunk 4) — the chunk-8 program is the tiny_result
    # fixture's, and remainder chunks (which each compile their own
    # chunk_len) never arise
    from reina_tpu.core.engine import run_days
    out1, _, _, _ = run_days(tiny_run, n_days=17, chunk_days=4)
    out2, _, _, _ = run_days(tiny_run, n_days=17, chunk_days=8)
    np.testing.assert_array_equal(out1.by_group, out2.by_group)
    out3, _, _, _ = run_days(tiny_run, n_days=17, chunk_days=8, seed=999)
    assert (out3.by_group != out1.by_group).any()


def test_rt_reasonable(tiny_result):
    out, _, _ = tiny_result
    r = out.r
    assert (r >= 0).all()
    assert r.max() < 30


def test_exposures_match_places(tiny_result):
    """Place counts are independent per-place binomial marginals
    (docs/parity.md §2): their sum tracks exposed_per_day to within
    binomial noise instead of summing exactly."""
    out, _, _ = tiny_result
    total = out.exposures_by_place.sum(axis=1).astype(np.float64)
    expect = out.exposed_per_day.astype(np.float64)
    slack = 6.0 * np.sqrt(np.maximum(expect, 1.0)) + 10.0
    assert (np.abs(total - expect) <= slack).all(), (
        np.abs(total - expect).max(), slack.max())


def test_infectee_buckets_and_overflow():
    """Per-source infectee buckets (the reference's fixed-capacity
    infectees arrays, main.pyx:128,209-233): contents and fill counts
    match an independent host-side reconstruction from per-agent state
    (the checkpoint-resume rebuild path), and a bucket too small for a
    source's infectees fails loudly with the reference's
    TOO_MANY_INFECTEES problem (main.pyx:219-220)."""
    import numpy as np
    import pytest

    from reina_tpu.core import constants as C
    from reina_tpu.core.checkpoint import rebuild_buckets
    from reina_tpu.core.engine import run_days
    from reina_tpu.testing import build_synthetic_run

    ivs = [
        ["test-with-contact-tracing", "2020-02-18", 80],
        ["import-infections", "2020-02-20", 60],
    ]
    run = build_synthetic_run(
        n_agents=8000, days=16, seed=11, interventions=ivs,
        pad_multiple=256, cfg_overrides={"max_infectees": 16})
    out, state, carry, _ = run_days(run, chunk_days=8)
    assert int(carry.problem) == 0
    bg = out.by_group.sum(axis=2)
    assert bg[-1, 5] > 0  # detections happened under CT
    # the engine's incremental appends equal the pure-function rebuild.
    # The carried table is one day BEHIND by design (the final day's
    # appends ride carry.app_pos/app_val and land at the next step's
    # phase-0 apply — core/state.DayCarry); apply them host-side first.
    bkt, fill = rebuild_buckets(state, 16)
    np.testing.assert_array_equal(np.asarray(carry.bkt_fill), fill)
    bd = np.asarray(carry.bkt_dst).copy()
    pos = np.asarray(carry.app_pos)
    val = np.asarray(carry.app_val)
    ok = pos < bd.shape[0]
    bd[pos[ok]] = val[ok]
    np.testing.assert_array_equal(bd.reshape(bkt.shape), bkt)
    assert fill.max() >= 2       # multi-infectee sources exist
    assert fill.sum() > 0

    # pathologically small per-source capacity: overflow must fail
    # loudly, like the reference's MAX_INFECTEES guard
    run2 = build_synthetic_run(
        n_agents=8000, days=16, seed=11, interventions=ivs,
        pad_multiple=256, cfg_overrides={"max_infectees": 1})
    with pytest.raises(C.SimulationFailed, match="infectees"):
        run_days(run2, chunk_days=8)


def test_expand_by_age_count_exactness():
    """terms=3 + rounding recovers exact integers for cumulative counts
    near 2^21 (two bf16 residual terms carry up to ~±16 there — the
    vaccination oldest-first boundary math depends on exactness)."""
    import types

    import jax
    import jax.numpy as jnp

    from reina_tpu.core.step import expand_by_age

    rng = np.random.default_rng(0)
    A = 101
    ages = rng.integers(0, A, size=4096)
    arrays = types.SimpleNamespace(
        age_onehot_hi=jax.nn.one_hot(ages // 8, (A + 7) // 8,
                                     dtype=jnp.bfloat16),
        age_onehot_lo=jax.nn.one_hot(ages % 8, 8, dtype=jnp.bfloat16))
    # worst-case magnitudes: counts spanning the full HUS cumulative range
    table = rng.integers(0, 1_700_000, size=A).astype(np.float32)
    got = np.round(np.asarray(
        expand_by_age(arrays, jnp.asarray(table), terms=3)))
    np.testing.assert_array_equal(got, table[ages])


def test_reseed_run_matches_fresh_build():
    """engine.reseed_run (the serving build cache's new-seed path)
    produces exactly the state a from-scratch build_run with that seed
    would — only the initial state and capacity scalars depend on
    random_seed."""
    from reina_tpu.core.engine import build_run, reseed_run
    from reina_tpu.config.variables import VARIABLE_DEFAULTS

    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 10
    base = build_run(v)
    v2 = dict(v)
    v2["random_seed"] = 4242
    got = reseed_run(base, 4242)
    want = build_run(v2)
    assert got.arrays is base.arrays          # shared, not rebuilt
    assert got.random_seed == 4242
    for field in ("state", "severity", "days_left", "day_of_infection",
                  "death_outside"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got.init_state, field)),
            np.asarray(getattr(want.init_state, field)), err_msg=field)
    assert int(got.init_carry.beds_avail) == int(want.init_carry.beds_avail)
    assert int(got.init_carry.icu_avail) == int(want.init_carry.icu_avail)
