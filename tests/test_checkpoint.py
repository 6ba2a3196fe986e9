"""Checkpoint/resume: resumed runs are bit-identical to uninterrupted."""

import pytest as _pytest

from _isolation import ISOLATED as _ISOLATED

# engine-compiling module: runs only inside a fresh child interpreter
# (tests/test_isolated_modules.py) -- see the cumulative XLA:CPU defect
# note in tests/_isolation.py
pytestmark = _pytest.mark.skipif(
    not _ISOLATED,
    reason="compile-fragile: executed via test_isolated_modules")
import os

import numpy as np

from reina_tpu.core.engine import run_days


def test_resume_bit_identical(tiny_run, tmp_path):
    full, state_a, carry_a, _ = run_days(tiny_run, n_days=17, chunk_days=8)

    ckpt = tmp_path / "ckpts"
    # first leg: run 8 days and snapshot
    out1, _, _, _ = run_days(tiny_run, n_days=9, chunk_days=8,
                             checkpoint_dir=str(ckpt), checkpoint_every=8)
    assert os.listdir(ckpt)
    # second leg: resume and finish
    out2, state_b, carry_b, _ = run_days(
        tiny_run, n_days=17, chunk_days=8,
        checkpoint_dir=str(ckpt), checkpoint_every=8)

    np.testing.assert_array_equal(full.by_group, out2.by_group)
    np.testing.assert_array_equal(full.r, out2.r)
    np.testing.assert_array_equal(np.asarray(state_a.state),
                                  np.asarray(state_b.state))
    np.testing.assert_array_equal(np.asarray(state_a.infector),
                                  np.asarray(state_b.infector))
    assert int(carry_a.beds_avail) == int(carry_b.beds_avail)


def test_debug_dump(tiny_run, tiny_result):
    from reina_tpu.core.debug import dump_state, infection_tree, person_str
    _, state, _ = tiny_result
    s = dump_state(state, today=24)
    assert "ILLNESS" in s and "INCUBATION" in s
    infectors = np.asarray(state.infector)
    with_src = np.flatnonzero(infectors >= 0)
    if len(with_src):
        root = int(infectors[with_src[0]])
        tree = infection_tree(state, root)
        assert f"#{root}:" in tree
        assert person_str(state, root) in tree
