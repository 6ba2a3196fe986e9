"""Distributional parity for the hardest exposure math: two variants
(per-variant λ tables, dart variant pick), the mask p(A∪B) save,
mobility-scaled contact tensors and weekly imports with per-variant
shares — vectorized engine vs the sequential oracle (reference
main.pyx:908-934, 1184-1266, 1671-1685).

Alignment: engine output row d == oracle history[d] (both snapshot
before day d runs); engine per-variant cumulative infections are the
cumsum of the per-day ``infected_by_variant`` series.
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
SEEDS = 12
IMPORT_DAYS = 5
IMPORTS_PER_DAY = 4
WEEKLY = 28                 # 4/day, split 50/50 wild-type vs beta
BETA_SHARE = 50             # %
MASK_DAY, MASK_SHARE = 12, 60          # %
MOB_DAY, MOB_REDUCTION = 14, 40        # % (factor 0.6)
# the variant at 3× the wild-type transmissibility so the takeover is visible
# inside 29 days on a 3k population
BETA_MULT = 1.65


def _variables():
    ivs = [["import-infections", "2020-02-%02d" % (18 + k), IMPORTS_PER_DAY]
           for k in range(IMPORT_DAYS)]
    ivs += [
        ["import-infections-weekly", "2020-02-18", WEEKLY, BETA_SHARE],
        ["wear-masks", "2020-03-01", MASK_SHARE],          # day 12
        ["limit-mobility", "2020-03-03", MOB_REDUCTION],   # day 14
    ]
    return synthetic_variables(
        days=DAYS, seed=0, interventions=ivs,
        hospital_beds=60, icu_units=10,
        variants=[{"name": "b1.1.7", "infectiousness_multiplier": BETA_MULT}],
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
            "all_infected": np.asarray(out.by_group[:, 3].sum(axis=1)),
            "by_variant": np.cumsum(
                np.asarray(out.infected_by_variant), axis=0),
        })
    return curves


@pytest.fixture(scope="module")
def oracle_curves():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import Oracle
    v = _variables()
    dis, names = compile_disease(create_disease_params(v), 101)
    assert names == ["wild-type", "b1.1.7"]
    contacts = loaders.get_contact_tensor()
    band_of_age = contacts.band_of_age(100)
    base = contacts.per_year_participant(100)
    events = [
        (0, "import-weekly", (WEEKLY, [1 - BETA_SHARE / 100,
                                       BETA_SHARE / 100])),
        (MASK_DAY, "masks", (MASK_SHARE / 100, None, None, None)),
        (MOB_DAY, "mobility", (1 - MOB_REDUCTION / 100, None, None, None)),
    ]
    curves = []
    for s in range(SEEDS):
        o = Oracle(synthetic_age_counts(N_AGENTS), dis, base, band_of_age,
                   beds=60, icu=10, seed=2000 + s,
                   daily_imports=IMPORTS_PER_DAY,
                   import_days=set(range(IMPORT_DAYS)), events=events)
        hist = o.run(DAYS - 1)
        curves.append({
            "all_infected": np.array([h["all_infected"] for h in hist],
                                     dtype=float),
            "by_variant": np.array([h["by_variant"] for h in hist],
                                   dtype=float),
        })
    return curves


def _mean_se(vals):
    vals = np.asarray(vals, dtype=float)
    return vals.mean(), vals.std(ddof=1) / np.sqrt(len(vals))


def test_total_infections_match(engine_curves, oracle_curves):
    """Cumulative infections agree through the masked + mobility-limited
    regime — the combined suppression math can't drift."""
    for day in (10, 20, DAYS - 1):
        me, se_e = _mean_se([c["all_infected"][day] for c in engine_curves])
        mo, se_o = _mean_se([c["all_infected"][day] for c in oracle_curves])
        tol = 4 * np.hypot(se_e, se_o) + 0.10 * max(mo, 10)
        assert abs(me - mo) <= tol, (
            f"day {day}: engine {me:.1f}±{se_e:.1f} "
            f"vs oracle {mo:.1f}±{se_o:.1f}")


def test_per_variant_counts_match(engine_curves, oracle_curves):
    """Per-variant cumulative infections agree — validates the
    per-variant λ tables, the dart variant pick and the per-variant
    weekly import shares end to end."""
    for day in (15, DAYS - 1):
        for v, name in enumerate(("wild-type", "b1.1.7")):
            me, se_e = _mean_se(
                [c["by_variant"][day, v] for c in engine_curves])
            mo, se_o = _mean_se(
                [c["by_variant"][day, v] for c in oracle_curves])
            tol = 4 * np.hypot(se_e, se_o) + 0.12 * max(mo, 8)
            assert abs(me - mo) <= tol, (
                f"day {day} {name}: engine {me:.1f}±{se_e:.1f} "
                f"vs oracle {mo:.1f}±{se_o:.1f}")


def test_variant_takeover_curve(engine_curves, oracle_curves):
    """The more-transmissible variant's share of cumulative infections
    RISES over the run in both implementations, and the final shares
    agree (reference exposes the same curve via infected_by_variant,
    main.pyx:1847-1850)."""
    def share(curves, day):
        tot = np.array([c["by_variant"][day].sum() for c in curves])
        beta = np.array([c["by_variant"][day, 1] for c in curves])
        return beta / np.maximum(tot, 1.0)

    for curves in (engine_curves, oracle_curves):
        early = share(curves, 10).mean()
        late = share(curves, DAYS - 1).mean()
        assert late > early + 0.02, (early, late)
        assert late > 0.5, late   # beta overtakes its 50% import share

    se_, see = _mean_se(share(engine_curves, DAYS - 1))
    so_, seo = _mean_se(share(oracle_curves, DAYS - 1))
    tol = 4 * np.hypot(see, seo) + 0.06
    assert abs(se_ - so_) <= tol, (se_, so_)


def test_suppressed_growth_rate_matches(engine_curves, oracle_curves):
    """Log-slope of cumulative infections over the suppressed window
    (masks + mobility active) agrees — the mask save and the mobility
    contact rescaling have exactly the same strength in both."""
    def rate(curves):
        out = []
        for c in curves:
            y = c["all_infected"].astype(float)
            t0, t1 = MOB_DAY + 2, DAYS - 1
            if y[t0] > 0 and y[t1] > y[t0]:
                out.append((np.log(y[t1]) - np.log(y[t0])) / (t1 - t0))
        return np.array(out)

    re, ro = rate(engine_curves), rate(oracle_curves)
    assert len(re) >= 3 and len(ro) >= 3
    tol = 4 * np.hypot(re.std(ddof=1) / np.sqrt(len(re)),
                       ro.std(ddof=1) / np.sqrt(len(ro))) + 0.03
    assert abs(re.mean() - ro.mean()) <= tol, (re.mean(), ro.mean())
