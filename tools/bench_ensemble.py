"""Measure the Monte-Carlo ensemble axis at HUS scale: ms/day/seed for
a vmapped seed batch vs the single-run path, and the implied 1000-seed
364-day wall-clock (reference workload: calc/simulation.py:349-385).

Usage: python tools/bench_ensemble.py [batch_size ...] [--days N]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    days = 28
    for a in sys.argv[1:]:
        if a.startswith("--days"):
            days = int(a.split("=")[1])
    batches = [int(a) for a in args] or [8, 32]

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from reina_tpu.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    from reina_tpu.core.engine import build_run, run_chunk
    from reina_tpu.ensemble import _ensemble_scan

    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = days + 1
    run = build_run(v)
    sched = jax.tree.map(lambda x: x[:days], run.schedules)
    print(f"N={run.init_state.age.shape[0]}, days={days}, "
          f"device={jax.devices()[0]}", flush=True)

    # single-run reference point
    t0 = time.perf_counter()
    _, _, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                           run.init_state, run.init_carry,
                           jr.PRNGKey(0), days, 0)
    np.asarray(outs.by_group)  # hard sync
    print(f"single: compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _, _, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                           run.init_state, run.init_carry,
                           jr.PRNGKey(1), days, 0)
    np.asarray(outs.by_group)
    per_day_single = (time.perf_counter() - t0) / days * 1000
    print(f"single: {per_day_single:.2f} ms/day", flush=True)

    for S in batches:
        keys = jnp.stack([jr.PRNGKey(100 + s) for s in range(S)])
        t0 = time.perf_counter()
        _, cr_b, outs = _ensemble_scan(run.cfg, run.arrays, sched,
                                       run.init_state, run.init_carry, keys)
        np.asarray(outs.by_group)
        print(f"S={S}: compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        keys = jnp.stack([jr.PRNGKey(200 + s) for s in range(S)])
        _, cr_b, outs = _ensemble_scan(run.cfg, run.arrays, sched,
                                       run.init_state, run.init_carry, keys)
        np.asarray(outs.by_group)
        wall = time.perf_counter() - t0
        per_seed_day = wall / days / S * 1000
        est_1000 = per_seed_day * 364 * 1000 / 1000 / 3600
        print(f"S={S}: {wall:.2f}s → {per_seed_day:.2f} ms/day/seed "
              f"({per_seed_day / per_day_single:.2f}× single); "
              f"1000-seed 364-day est: {est_1000:.2f} h "
              f"({3600 / (per_seed_day * 364 / 1000):.0f} seeds/h)",
              flush=True)


if __name__ == "__main__":
    main()
