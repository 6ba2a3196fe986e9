"""Timed headline run under EngineConfig overrides — A/B harness for
tier-sizing experiments (infection_head, max_infectees, ...).

Usage:  python tools/bench_cfg.py '{"infection_head": 2048}'

Same shapes/chunking as bench.py so numbers are comparable; compare
only within one tunnel session (session speed varies ~20%,
docs/performance.md). A non-default override is a DIFFERENT program —
expect a cold compile (1-18 min on this toolchain).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}

    from reina_tpu.utils.compile import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.random as jr

    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    from reina_tpu.core.engine import build_run, run_chunk

    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 365
    run = build_run(v, cfg_overrides=overrides or None)
    print(f"cfg overrides: {overrides}, device={jax.devices()[0]}",
          file=sys.stderr)

    chunk = 28
    key = jr.PRNGKey(run.random_seed)

    t0 = time.perf_counter()
    state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                   run.init_state, run.init_carry, key,
                                   chunk, 0)
    np.asarray(outs.by_group)  # hard sync (block_until_ready lies here)
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    state, carry = run.init_state, run.init_carry
    day = 0
    for _ in range(364 // chunk):
        state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                       state, carry, key, chunk, day)
        day += chunk
    infected_final = int(np.asarray(outs.by_group)[-1, 3].sum())
    wall = time.perf_counter() - t0
    n_agents = int(run.n_agents)
    record = {
        "overrides": overrides,
        "wall_s": round(wall, 3),
        "ms_per_day": round(wall / day * 1000, 2),
        "n_agents": n_agents,
        "agent_days_per_s": round(n_agents * day / wall),
        "final_all_infected": infected_final,
    }
    # mirror bench.py: fallback runs must be flagged or they read as
    # Pallas-comparable headline numbers (ADVICE.md round 3)
    if os.environ.get("REINA_PALLAS") == "0":
        record["pallas"] = "FALLBACK"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
