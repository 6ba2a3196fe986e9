"""Test XLA TPU compiler options against the day step's slowdown."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.random as jr

from reina_tpu.config.variables import VARIABLE_DEFAULTS
from reina_tpu.core.engine import build_run
from reina_tpu.core.step import SchedRow, day_step


def main():
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 40
    run = build_run(v)
    key = jr.PRNGKey(0)
    row = SchedRow(*(x[0] for x in run.schedules))
    args = (run.arrays, row, run.init_state, run.init_carry, key)

    variants = [
        ("msa off", {"xla_msa_enable": "false"}),
        ("vf vmem msa off", {"xla_vf_vmem_memory_space_assignment": "false"}),
    ]
    for label, opts in variants:
        try:
            t0 = time.perf_counter()
            lowered = jax.jit(partial(day_step, run.cfg)).lower(*args)
            compiled = lowered.compile(compiler_options=opts)
            out = compiled(*args)
            jax.block_until_ready(out)
            comp = time.perf_counter() - t0
            n = 16
            st, cr = run.init_state, run.init_carry
            t0 = time.perf_counter()
            for _ in range(n):
                st, cr, o = compiled(run.arrays, row, st, cr, key)
            jax.block_until_ready(o)
            ms = (time.perf_counter() - t0) / n * 1000
            print(f"{label:30s} {ms:9.2f} ms/day (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{label:30s} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
