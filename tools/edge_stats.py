"""Measure the live edge-table trajectory over the headline run.

Prints edge_n / edge_floor / drained-queue size at every 28-day chunk
boundary plus the per-day new-infection counts, to size the tracing
tier heads from data instead of guesswork (the day-196 trace showed the
third 24k edge tier running daily — docs/performance.md).
Uses bench-identical shapes so the persistent compile cache serves it.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.random as jr

from reina_tpu.utils.compile import enable_persistent_cache
enable_persistent_cache()
from reina_tpu.config.variables import VARIABLE_DEFAULTS
from reina_tpu.core.engine import build_run, run_chunk


def main():
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 365
    run = build_run(v)
    key = jr.PRNGKey(run.random_seed)
    state, carry = run.init_state, run.init_carry
    day = 0
    print("day  edge_n  floor  daily_inf(min/p50/p90/max in chunk)")
    while day < 364:
        state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                       state, carry, key, 28, day)
        day += 28
        en = int(np.asarray(carry.edge_n))
        fl = int(np.asarray(carry.edge_floor))
        gi = np.asarray(outs.by_group)  # (28, rows, groups)
        # row 3 = all_infected cumulative; daily new = diff
        tot = gi[:, 3].sum(axis=-1)
        daily = np.diff(np.concatenate([[tot[0]], tot]))
        q = np.percentile(daily, [0, 50, 90, 100]).astype(int)
        print(f"{day:4d} {en:7d} {fl:6d}  {q[0]}/{q[1]}/{q[2]}/{q[3]}",
              flush=True)


if __name__ == "__main__":
    main()
