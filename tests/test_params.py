"""Parameter and schedule compiler unit tests."""
import numpy as np

from reina_tpu.config.interventions import iv_tuple_to_obj
from reina_tpu.core import constants as C
from reina_tpu.core.params import (compile_disease, compile_import_ages,
                                   create_disease_params,
                                   expand_greatest_lte, make_age_groups)
from reina_tpu.core.schedule import compile_schedules


def test_expand_greatest_lte():
    table = expand_greatest_lte([(0, 1.0), (10, 2.0), (20, 3.0)], 25)
    assert table[0] == 1.0 and table[9] == 1.0
    assert table[10] == 2.0 and table[19] == 2.0
    assert table[20] == 3.0 and table[24] == 3.0


def test_conditional_probability_chain():
    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    dp = create_disease_params(VARIABLE_DEFAULTS)
    dis, names = compile_disease(dp, 101)
    assert names == ["wild-type", "b1.1.7"]
    # chain product reconstructs the absolute fatal probability
    age = 75
    absolute = (dis.p_fatal_c[0, age] * dis.p_critical_c[0, age]
                * dis.p_severe_c[0, age] * dis.p_sympt[0, age])
    np.testing.assert_allclose(absolute, 0.02439, rtol=1e-5)
    # variant overrides only infectiousness_multiplier
    np.testing.assert_allclose(dis.inf_mult[1], 0.9075, rtol=1e-6)
    np.testing.assert_array_equal(dis.p_fatal_c[0], dis.p_fatal_c[1])


def test_age_groups():
    labels = make_age_groups(100)
    assert labels[0] == "0–9" and labels[79] == "70–79"
    assert labels[80] == "80+" and labels[100] == "80+"
    assert len(sorted(set(labels))) == 9


def test_import_ages():
    ia = compile_import_ages([(0, 15.0), (20, 40.0), (40, 40.0),
                              (60, 5.0), (70, 0)], 101)
    np.testing.assert_allclose(ia.cum_p[-1], 1.0, rtol=1e-6)
    assert list(ia.min_age) == [0, 20, 40, 60, 70]
    assert list(ia.max_age) == [19, 39, 59, 69, 100]


def _sched(ivs, days=30, start="2020-02-18"):
    objs = [iv_tuple_to_obj(iv) for iv in ivs]
    return compile_schedules(objs, start, days, 101, ["wild-type", "b1.1.7"])


def test_schedule_mobility_scoped():
    sched, slots = _sched([
        ["limit-mobility", "2020-02-20", 50],
        ["limit-mobility", "2020-02-25", 80, 7, 12, "school"],
    ])
    school = C.PLACE_TO_IDX["school"]
    assert sched.mobility[0].min() == 1.0
    np.testing.assert_allclose(sched.mobility[2], 0.5)
    np.testing.assert_allclose(sched.mobility[7, 10, school], 0.5 * 0.2, rtol=1e-6)
    np.testing.assert_allclose(sched.mobility[7, 20, school], 0.5, rtol=1e-6)
    # headline scalar tracks the last-set factor (reference quirk)
    np.testing.assert_allclose(sched.mobility_scalar[7], 0.2, rtol=1e-6)


def test_schedule_mobility_update_overwrites():
    sched, _ = _sched([
        ["limit-mobility", "2020-02-20", 50],
        ["limit-mobility", "2020-02-25", 20],
    ])
    np.testing.assert_allclose(sched.mobility[2], 0.5)
    np.testing.assert_allclose(sched.mobility[10], 0.8)


def test_schedule_testing_and_masks():
    sched, _ = _sched([
        ["test-only-severe-symptoms", "2020-02-20", 30],
        ["test-with-contact-tracing", "2020-02-25", 60],
        ["wear-masks", "2020-02-22", 40, 65, None],
    ])
    assert sched.testing_mode[1] == C.TESTING_NO_TESTING
    assert sched.testing_mode[2] == C.TESTING_ONLY_SEVERE_SYMPTOMS
    np.testing.assert_allclose(sched.detect_anyway_p[2], 0.3)
    assert sched.testing_mode[7] == C.TESTING_ALL_WITH_SYMPTOMS_CT
    np.testing.assert_allclose(sched.trace_p[7], 0.6)
    assert sched.mask_p[4, 64].max() == 0
    np.testing.assert_allclose(sched.mask_p[4, 65], 0.4)


def test_schedule_imports_weekly_shares():
    sched, _ = _sched([
        ["import-infections", "2020-02-20", 25, "b1.1.7"],
        ["import-infections-weekly", "2020-02-22", 70, 40],
    ])
    assert sched.import_today[2, 1] == 25
    np.testing.assert_allclose(sched.weekly_amount[4], 70)
    np.testing.assert_allclose(sched.weekly_shares[4], [0.6, 0.4])


def test_schedule_vaccination_slots():
    sched, slots = _sched([
        ["vaccinate", "2020-02-20", 700, 60, None],
        ["vaccinate", "2020-02-25", 1400, 60, None],
        ["vaccinate", "2020-02-25", 70, 20, 40],
    ])
    assert slots.count == 2
    np.testing.assert_allclose(sched.vacc_nr[2, 0], 100.0)
    np.testing.assert_allclose(sched.vacc_nr[10, 0], 200.0)
    np.testing.assert_allclose(sched.vacc_nr[10, 1], 10.0)
    assert slots.min_age[1] == 20 and slots.max_age[1] == 40


def test_schedule_vaccination_raw_key_campaigns():
    """Campaign identity is the RAW (min_age, max_age) pair: the
    reference keys on the unnormalized values (main.pyx:585-593) and
    normalizes None only at execution (main.pyx:551-556), so an
    age-less campaign and an explicit (0, max) campaign run
    CONCURRENTLY instead of the second replacing the first."""
    sched, slots = _sched([
        ["vaccinate", "2020-02-20", 700],            # (None, None)
        ["vaccinate", "2020-02-25", 1400, 0, 100],   # explicit full range
    ])
    assert slots.count == 2
    np.testing.assert_allclose(sched.vacc_nr[10, 0], 100.0)  # still running
    np.testing.assert_allclose(sched.vacc_nr[10, 1], 200.0)
    # normalized bounds agree at execution time
    assert slots.min_age[0] == 0 and slots.min_age[1] == 0


def test_iv_tuple_roundtrip():
    iv = iv_tuple_to_obj(["limit-mobility", "2020-03-01", 45, 7, 12, "school"])
    assert iv.get_param_values() == {
        "reduction": 45, "min_age": 7, "max_age": 12, "place": "school"}
    assert iv.make_iv_tuple() == ["limit-mobility", "2020-03-01", 45, 7, 12,
                                  "school"]
