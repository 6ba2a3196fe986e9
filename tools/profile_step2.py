"""Is the slowness in the step body or the scan wrapper?"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.random as jr

from reina_tpu.config.variables import VARIABLE_DEFAULTS
from reina_tpu.core.engine import build_run, run_chunk
from reina_tpu.core.step import SchedRow, day_step


def main():
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 40
    run = build_run(v)
    key = jr.PRNGKey(0)
    row = SchedRow(*(x[0] for x in run.schedules))

    fn = jax.jit(partial(day_step, run.cfg))
    print("compiling bare day_step...", flush=True)
    t0 = time.perf_counter()
    st, cr, out = fn(run.arrays, row, run.init_state, run.init_carry, key)
    jax.block_until_ready(out)
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)

    n = 16
    t0 = time.perf_counter()
    st, cr = run.init_state, run.init_carry
    for _ in range(n):
        st, cr, out = fn(run.arrays, row, st, cr, key)
    jax.block_until_ready(out)
    print(f"bare day_step: {(time.perf_counter() - t0) / n * 1000:.2f} ms/day",
          flush=True)

    print("compiling scan-of-1...", flush=True)
    t0 = time.perf_counter()
    st, cr, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                             run.init_state, run.init_carry, key, 1, 0)
    jax.block_until_ready(outs)
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    st, cr = run.init_state, run.init_carry
    for i in range(n):
        st, cr, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                 st, cr, key, 1, i)
    jax.block_until_ready(outs)
    print(f"scan-of-1: {(time.perf_counter() - t0) / n * 1000:.2f} ms/day",
          flush=True)


if __name__ == "__main__":
    main()
