"""Distributional parity for the policy layer: testing modes, 2-level
contact tracing, vaccination quotas and capacity rationing, vectorized
engine vs the sequential oracle (reference main.pyx:441-660).

Alignment: engine output row 0 is the initial snapshot and row d the
state after day d-1 (emit-then-iterate); oracle history[d] is snapshotted
at the top of day d — so engine[d] == oracle[d], including the queue
drain series (both report day d-1's drain at index d).
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
DAYS = 35
SEEDS = 12
IMPORT_DAYS = 5


def _import_ivs(per_day):
    return [["import-infections", "2020-02-%02d" % (18 + k), per_day]
            for k in range(IMPORT_DAYS)]


def _engine_curves(variables):
    run = build_run(variables,
                    age_counts_override=synthetic_age_counts(N_AGENTS),
                    pad_multiple=256)
    curves = []
    for s in range(SEEDS):
        out, _, _, _ = run_days(run, chunk_days=DAYS - 1, seed=1000 + s)
        curves.append({
            "all_infected": np.asarray(out.by_group[:, 3].sum(axis=1)),
            "all_detected": np.asarray(out.by_group[:, 5].sum(axis=1)),
            "vaccinated": np.asarray(out.by_group[:, 1].sum(axis=1)),
            "dead": np.asarray(out.by_group[:, 9].sum(axis=1)),
            "non_hospital_dead": np.asarray(out.by_group[:, 11].sum(axis=1)),
            "ct_cases": np.asarray(out.ct_cases_per_day),
        })
    return curves


def _oracle_curves(variables, beds, icu, per_day, events):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import Oracle
    dis, _ = compile_disease(create_disease_params(variables), 101)
    contacts = loaders.get_contact_tensor()
    band_of_age = contacts.band_of_age(100)
    base = contacts.per_year_participant(100)
    curves = []
    for s in range(SEEDS):
        o = Oracle(synthetic_age_counts(N_AGENTS), dis, base, band_of_age,
                   beds=beds, icu=icu, seed=2000 + s,
                   daily_imports=per_day,
                   import_days=set(range(IMPORT_DAYS)), events=events)
        hist = o.run(DAYS - 1)
        c = {k: np.array([h[k] for h in hist], dtype=float)
             for k in hist[0]}
        # non_hospital_dead in the oracle history is already cumulative
        curves.append(c)
    return curves


# --- scenario A: contact tracing + vaccination ------------------------------

@pytest.fixture(scope="module")
def policy_engine():
    v = synthetic_variables(
        days=DAYS, seed=0,
        interventions=_import_ivs(4) + [
            ["test-with-contact-tracing", "2020-02-21", 60],
            ["vaccinate", "2020-02-23", 1400, 60, None],
        ],
        hospital_beds=60, icu_units=10, variants=[],
        imported_infection_ages=[[0, 1.0]])
    return _engine_curves(v)


@pytest.fixture(scope="module")
def policy_oracle():
    v = synthetic_variables(days=DAYS, seed=0, hospital_beds=60,
                            icu_units=10, variants=[],
                            imported_infection_ages=[[0, 1.0]])
    return _oracle_curves(v, beds=60, icu=10, per_day=4, events=[
        (3, "testing-mode", ("all_ct", 0.6)),
        (5, "vaccinate", (200, 60, None)),
    ])


# --- scenario B: severe-only testing under capacity scarcity ----------------

@pytest.fixture(scope="module")
def scarcity_engine():
    v = synthetic_variables(
        days=DAYS, seed=0,
        interventions=_import_ivs(10) + [
            ["test-only-severe-symptoms", "2020-02-21", 20],
        ],
        hospital_beds=2, icu_units=1, variants=[],
        imported_infection_ages=[[0, 1.0]])
    return _engine_curves(v)


@pytest.fixture(scope="module")
def scarcity_oracle():
    v = synthetic_variables(days=DAYS, seed=0, hospital_beds=2,
                            icu_units=1, variants=[],
                            imported_infection_ages=[[0, 1.0]])
    return _oracle_curves(v, beds=2, icu=1, per_day=10, events=[
        (3, "testing-mode", ("severe", 0.2)),
    ])


def _mean_se(curves, key, day):
    vals = np.array([c[key][day] for c in curves], dtype=float)
    return vals.mean(), vals.std(ddof=1) / np.sqrt(len(vals))


def _assert_close(engine_curves, oracle_curves, key, days, rel=0.10,
                  floor=5.0):
    for day in days:
        me, se_e = _mean_se(engine_curves, key, day)
        mo, se_o = _mean_se(oracle_curves, key, day)
        tol = 4 * np.hypot(se_e, se_o) + rel * max(mo, floor)
        assert abs(me - mo) <= tol, (
            f"{key} day {day}: engine {me:.1f}±{se_e:.1f} "
            f"vs oracle {mo:.1f}±{se_o:.1f} (tol {tol:.1f})")


def test_detected_curve_with_tracing(policy_engine, policy_oracle):
    _assert_close(policy_engine, policy_oracle, "all_detected",
                  (15, 25, DAYS - 1))


def test_epidemic_suppression_under_tracing(policy_engine, policy_oracle):
    """Tracing + quarantine feed back into exposure; the suppressed
    cumulative-infection curve must agree, not just detections."""
    _assert_close(policy_engine, policy_oracle, "all_infected",
                  (15, 25, DAYS - 1))


def test_traced_queue_volume(policy_engine, policy_oracle):
    """Total tests performed (sum of daily queue drains) agree."""
    te = np.array([c["ct_cases"].sum() for c in policy_engine], dtype=float)
    to = np.array([c["ct_cases"].sum() for c in policy_oracle], dtype=float)
    se = np.hypot(te.std(ddof=1) / np.sqrt(len(te)),
                  to.std(ddof=1) / np.sqrt(len(to)))
    tol = 4 * se + 0.12 * max(to.mean(), 10)
    assert abs(te.mean() - to.mean()) <= tol, (te.mean(), to.mean(), tol)


def test_vaccinated_counts(policy_engine, policy_oracle):
    """Oldest-first quota fill: near-deterministic, so the match must be
    tight (daily quota 200, 60+ cohort saturates within days)."""
    for day in (7, 12, DAYS - 1):
        me, _ = _mean_se(policy_engine, "vaccinated", day)
        mo, _ = _mean_se(policy_oracle, "vaccinated", day)
        assert abs(me - mo) <= max(10.0, 0.03 * mo), (day, me, mo)


def test_dead_under_scarcity(scarcity_engine, scarcity_oracle):
    """With 2 beds/1 ICU the death toll is rationing-dominated
    (denied-care death chances, main.pyx:321-352)."""
    _assert_close(scarcity_engine, scarcity_oracle, "dead",
                  (20, DAYS - 1), rel=0.12, floor=8.0)


def test_outside_deaths_under_scarcity(scarcity_engine, scarcity_oracle):
    """Deaths split by place: the outside-hospital subset must agree,
    which pins the denied-care (in-hospital) remainder too."""
    _assert_close(scarcity_engine, scarcity_oracle, "non_hospital_dead",
                  (DAYS - 1,), rel=0.15, floor=5.0)


def test_detected_curve_severe_mode(scarcity_engine, scarcity_oracle):
    """ONLY_SEVERE_SYMPTOMS: detections = severe cases + the 20%
    mild-detection channel + hospitalizations."""
    _assert_close(scarcity_engine, scarcity_oracle, "all_detected",
                  (20, DAYS - 1), rel=0.12)
