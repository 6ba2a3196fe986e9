"""Calibration sweep: a vmapped parameter grid recovers the
transmission level that produced synthetic "observed" data."""

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

from reina_tpu.calibration import calibrate, grid_points, sweep_grid
from reina_tpu.testing import synthetic_age_counts, synthetic_variables


def test_grid_points():
    pts = grid_points({"infectiousness_multiplier": [0.4, 0.6],
                       "mean_incubation_duration": [4.0, 5.1, 6.0]})
    assert len(pts) == 6
    assert {"infectiousness_multiplier": 0.6,
            "mean_incubation_duration": 6.0} in pts
    # non-disease variables cannot be swept (they would be silently
    # ignored: all points share init state / schedules / config)
    with pytest.raises(ValueError, match="not sweepable"):
        grid_points({"random_seed": [1, 2]})


@pytest.fixture(scope="module")
def sweep():
    v = synthetic_variables(days=18, seed=5, interventions=[
        ["import-infections", "2020-02-19", 80]])
    grid = {"infectiousness_multiplier": [0.2, 0.55, 1.2]}
    points, outs, base = sweep_grid(
        v, grid, batch_size=3, pad_multiple=256,
        age_counts_override=synthetic_age_counts(12000))
    return v, grid, points, outs, base


def test_sweep_monotone_in_infectiousness(sweep):
    _v, _grid, points, outs, _base = sweep
    # cumulative infections at the end grow with infectiousness
    final = outs.by_group[..., 3, :].sum(axis=-1)[:, -1]
    assert final[0] < final[1] < final[2], final.tolist()


def test_calibrate_recovers_generating_point(sweep):
    v, grid, points, outs, base = sweep
    # synthesize "observed" confirmed cases from the middle point's
    # detected curve and check calibration ranks it first
    from datetime import date, timedelta
    truth = outs.by_group[1, :, 5, :].sum(axis=-1)   # all_detected cum
    start = date.fromisoformat(v["start_date"])
    rows = [{"date": (start + timedelta(days=d + 1)).isoformat(),
             "confirmed": int(truth[d])} for d in range(len(truth))]
    best, ranked = calibrate(
        v, grid, observed_rows=rows, batch_size=3, pad_multiple=256,
        age_counts_override=synthetic_age_counts(12000))
    assert best == {"infectiousness_multiplier": 0.55}
    assert ranked[0][1] <= ranked[-1][1]
