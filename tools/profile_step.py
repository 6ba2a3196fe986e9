"""Bisect the day step's cost by knocking out phases (monkeypatch)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from reina_tpu.config.variables import VARIABLE_DEFAULTS
from reina_tpu.core import step as step_mod
from reina_tpu.core.engine import build_run
from reina_tpu.core.step import SchedRow, day_step


def time_step(run, label, n=30):
    @partial(jax.jit, static_argnums=0)
    def many(cfg, arrays, schedules, state, carry, key):
        def body(sc, row):
            st, cr = sc
            st, cr, out = day_step(cfg, arrays, SchedRow(*row), st, cr, key)
            return (st, cr), out.exposed_per_day
        sched = jax.tree.map(lambda x: x[:n], schedules)
        (st, cr), outs = jax.lax.scan(body, (state, carry), sched)
        return st, cr, outs

    key = jr.PRNGKey(0)
    t0 = time.perf_counter()
    st, cr, outs = many(run.cfg, run.arrays, run.schedules,
                        run.init_state, run.init_carry, key)
    jax.block_until_ready(outs)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    st, cr, outs = many(run.cfg, run.arrays, run.schedules,
                        run.init_state, run.init_carry, key)
    jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    print(f"{label:35s} {wall / n * 1000:8.2f} ms/day   (compile {compile_s:.0f}s)")
    return wall / n


def main():
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 40
    run = build_run(v)
    print("agents:", run.n_agents)

    time_step(run, "full step")

    orig_split = step_mod._binomial_split
    orig_clamped = step_mod.clamped_counter_grants
    orig_sev = step_mod._severity_draw
    orig_groups = step_mod._group_counts

    # knockout: binomial split → expectation (no binomial sampling)
    step_mod._binomial_split = lambda key, totals, probs: totals[..., None] * probs
    time_step(run, "no binomial sampling")
    step_mod._binomial_split = orig_split

    # knockout: capacity scans → always grant
    step_mod.clamped_counter_grants = \
        lambda rel, req, init, off: (req, init)
    time_step(run, "no clamped scans")
    step_mod.clamped_counter_grants = orig_clamped

    # knockout: severity draw → constant mild
    step_mod._severity_draw = lambda key, arrays, variant, age, dov, day: (
        jnp.ones(age.shape, jnp.int8), jnp.zeros(age.shape, bool))
    time_step(run, "no severity draw")
    step_mod._severity_draw = orig_sev

    # knockout: stats matmul → zeros
    step_mod._group_counts = lambda cfg, arrays, masks: jnp.zeros(
        (len(masks), cfg.nr_groups), jnp.int32)
    time_step(run, "no group stats")
    step_mod._group_counts = orig_groups


if __name__ == "__main__":
    main()
