"""Launchers for the engine-compiling test modules, one fresh child
interpreter each.

The cumulative XLA:CPU defect (tests/_isolation.py) segfaults the
process after it has compiled several large engine programs — observed
at the vmapped-ensemble compiles (test_parallel), the sampler programs
(test_sampling), the tail-tier head variants, and, on a cold
compilation cache, at test_oracle_exposure's first cache write after
the parent had already compiled test_calibration/checkpoint/engine's
programs (2026-08-21, put_executable_and_time). Every module that
compiles whole-engine programs therefore runs in its own child
interpreter: the canonical `python -m pytest tests/ -q` keeps only
cheap modules in the parent, and a child crash surfaces as a loud
launcher failure instead of silently discarding the rest of the run.

The guarded modules carry `pytestmark = skipif(not ISOLATED)`, so the
parent collects them as skips and the child (REINA_ISOLATED_SUBTEST=1)
runs them for real.
"""
import pytest

from _isolation import ISOLATED, run_isolated

MODULES = [
    "tests/test_calibration.py",
    "tests/test_checkpoint.py",
    "tests/test_engine.py",
    "tests/test_oracle_exposure.py",
    "tests/test_oracle_parity.py",
    "tests/test_oracle_policy.py",
]


@pytest.mark.parametrize("module", MODULES)
def test_module_isolated(module):
    if ISOLATED:
        pytest.skip("already inside an isolated child")
    run_isolated(module)
