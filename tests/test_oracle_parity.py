"""Distributional parity: vectorized engine vs the sequential oracle.

The engine's exposure model (group-aggregated binomial darts with
receiver thinning) is provably mean-equivalent to the reference's
per-contact trials; these tests check the whole coupled system end to
end on a small population across seeds.
"""

import pytest as _pytest

from _isolation import ISOLATED as _ISOLATED

# engine-compiling module: runs only inside a fresh child interpreter
# (tests/test_isolated_modules.py) -- see the cumulative XLA:CPU defect
# note in tests/_isolation.py
pytestmark = _pytest.mark.skipif(
    not _ISOLATED,
    reason="compile-fragile: executed via test_isolated_modules")
import numpy as np
import pytest

from reina_tpu.core.engine import build_run, run_days
from reina_tpu.core.params import compile_disease, create_disease_params
from reina_tpu.data import loaders
from reina_tpu.testing import synthetic_age_counts, synthetic_variables

N_AGENTS = 3000
DAYS = 30
IMPORT_DAYS = 5
IMPORTS_PER_DAY = 4
SEEDS = 12


def _variables():
    return synthetic_variables(
        days=DAYS, seed=0,
        interventions=[
            ["import-infections", "2020-02-18", IMPORTS_PER_DAY],
            ["import-infections", "2020-02-19", IMPORTS_PER_DAY],
            ["import-infections", "2020-02-20", IMPORTS_PER_DAY],
            ["import-infections", "2020-02-21", IMPORTS_PER_DAY],
            ["import-infections", "2020-02-22", IMPORTS_PER_DAY],
        ],
        hospital_beds=60, icu_units=10,
        variants=[],
        imported_infection_ages=[[0, 1.0]],
    )


@pytest.fixture(scope="module")
def engine_curves():
    v = _variables()
    run = build_run(v, age_counts_override=synthetic_age_counts(N_AGENTS),
                    pad_multiple=256)
    curves = []
    for s in range(SEEDS):
        out, _, _, _ = run_days(run, chunk_days=DAYS - 1, seed=1000 + s)
        curves.append({
            "all_infected": out.by_group[:, 3].sum(axis=1),
            "dead": out.by_group[:, 9].sum(axis=1),
            "in_ward": out.by_group[:, 8].sum(axis=1),
            "in_icu": out.by_group[:, 6].sum(axis=1),
        })
    return curves


@pytest.fixture(scope="module")
def oracle_curves():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import Oracle
    v = _variables()
    dis, _ = compile_disease(create_disease_params(v), 101)
    contacts = loaders.get_contact_tensor()
    band_of_age = contacts.band_of_age(100)
    base = contacts.per_year_participant(100)
    curves = []
    for s in range(SEEDS):
        o = Oracle(synthetic_age_counts(N_AGENTS), dis, base, band_of_age,
                   beds=60, icu=10, seed=2000 + s,
                   daily_imports=IMPORTS_PER_DAY,
                   import_days=set(range(IMPORT_DAYS)))
        hist = o.run(DAYS - 1)
        curves.append({k: np.array([h[k] for h in hist])
                       for k in hist[0]})
    return curves


@pytest.fixture(scope="module")
def engine_curves_tiny_head():
    """Same scenario through the TAIL-TIER code path: an 8-slot
    infection head makes nearly every epidemic day exceed the head, so
    compact_part tail tiers, slot_pipeline parts >= 1 and the tiered
    scatters produce these curves (they never run at default head on
    3k agents). Oracle parity below proves the tiers are semantically
    invisible (main.pyx:209-245)."""
    v = _variables()
    run = build_run(v, age_counts_override=synthetic_age_counts(N_AGENTS),
                    pad_multiple=256,
                    cfg_overrides={"infection_head": 8,
                                   "infection_buffer": 512})
    curves = []
    for s in range(SEEDS):
        out, _, carry, _ = run_days(run, chunk_days=DAYS - 1, seed=3000 + s)
        assert int(carry.problem) == 0
        assert out.by_group[:, 12].sum(axis=1).max() > 8  # tiers engaged
        curves.append({
            "all_infected": out.by_group[:, 3].sum(axis=1),
            "dead": out.by_group[:, 9].sum(axis=1),
            "in_ward": out.by_group[:, 8].sum(axis=1),
            "in_icu": out.by_group[:, 6].sum(axis=1),
        })
    return curves


def _mean_se(curves, key, day):
    vals = np.array([c[key][day] for c in curves], dtype=float)
    return vals.mean(), vals.std(ddof=1) / np.sqrt(len(vals))


def test_epidemic_growth_matches(engine_curves, oracle_curves):
    """Cumulative-infection curves agree within sampling error bounds."""
    for day in (10, 20, DAYS - 1):
        me, se_e = _mean_se(engine_curves, "all_infected", day)
        mo, se_o = _mean_se(oracle_curves, "all_infected", day)
        tol = 4 * np.hypot(se_e, se_o) + 0.10 * max(mo, 10)
        assert abs(me - mo) <= tol, (
            f"day {day}: engine {me:.1f}±{se_e:.1f} vs oracle {mo:.1f}±{se_o:.1f}")


def test_growth_rate_matches(engine_curves, oracle_curves):
    """Exponential growth rate (log-slope of cumulative infections)."""
    def rate(curves):
        out = []
        for c in curves:
            y = c["all_infected"].astype(float)
            t0, t1 = 12, DAYS - 1
            if y[t0] > 0 and y[t1] > y[t0]:
                out.append((np.log(y[t1]) - np.log(y[t0])) / (t1 - t0))
        return np.array(out)

    re, ro = rate(engine_curves), rate(oracle_curves)
    assert len(re) >= 3 and len(ro) >= 3
    tol = 4 * np.hypot(re.std(ddof=1) / np.sqrt(len(re)),
                       ro.std(ddof=1) / np.sqrt(len(ro))) + 0.03
    assert abs(re.mean() - ro.mean()) <= tol, (re.mean(), ro.mean())


def test_tail_tier_epidemic_matches_oracle(engine_curves_tiny_head,
                                           oracle_curves):
    """Oracle parity with the infection-slot TAIL TIERS doing the work:
    cumulative-infection curves from the 8-slot-head engine agree with
    the sequential oracle within sampling error — a wrong tail tier,
    tail scatter or per-tier key shifts the epidemic and turns this
    red."""
    for day in (10, 20, DAYS - 1):
        me, se_e = _mean_se(engine_curves_tiny_head, "all_infected", day)
        mo, se_o = _mean_se(oracle_curves, "all_infected", day)
        tol = 4 * np.hypot(se_e, se_o) + 0.10 * max(mo, 10)
        assert abs(me - mo) <= tol, (
            f"day {day}: tiny-head engine {me:.1f}±{se_e:.1f} "
            f"vs oracle {mo:.1f}±{se_o:.1f}")


def test_hospital_load_matches(engine_curves, oracle_curves):
    """Ward occupancy parity at a statistical tolerance (not the old
    50%-of-peak scale check): seed-averaged ward person-days (the
    integral of the occupancy curve — the lowest-variance functional of
    the rare-event severity tail) and fixed-day occupancy both agree
    within mean ± 4·SE + 12%."""
    def stat(curves, fn):
        vals = np.array([fn(c) for c in curves], dtype=float)
        return vals.mean(), vals.std(ddof=1) / np.sqrt(len(vals))

    # person-days in ward over the whole run
    me, se_e = stat(engine_curves, lambda c: c["in_ward"].sum())
    mo, se_o = stat(oracle_curves, lambda c: c["in_ward"].sum())
    tol = 4 * np.hypot(se_e, se_o) + 0.12 * max(mo, 5.0)
    assert abs(me - mo) <= tol, (
        f"ward person-days: engine {me:.1f}±{se_e:.1f} "
        f"vs oracle {mo:.1f}±{se_o:.1f} (tol {tol:.1f})")

    # fixed-day occupancy at the late-run days the curve is largest
    for day in (20, DAYS - 1):
        me, se_e = stat(engine_curves, lambda c: c["in_ward"][day])
        mo, se_o = stat(oracle_curves, lambda c: c["in_ward"][day])
        tol = 4 * np.hypot(se_e, se_o) + 0.12 * max(mo, 2.0)
        assert abs(me - mo) <= tol, (
            f"day {day} in_ward: engine {me:.2f}±{se_e:.2f} "
            f"vs oracle {mo:.2f}±{se_o:.2f} (tol {tol:.2f})")
