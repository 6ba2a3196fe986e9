"""Measured 1000-seed Monte-Carlo wall-clock at HUS scale (the
reference workload: calc/simulation.py:349-385, 1000 seeds / scenario).

Seeds run sequentially through the one compiled single-run program —
the measured-fastest single-chip strategy (BASELINE.md). Writes
BENCH_MC.json with the record and prints progress.

Usage: python tools/bench_monte_carlo.py [n_seeds] [--days N]
"""
import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    n_seeds = 1000
    days = 365
    for a in sys.argv[1:]:
        if a.startswith("--days="):
            days = int(a.split("=")[1])
        elif a.isdigit():
            n_seeds = int(a)

    import jax
    import jax.random as jr

    from reina_tpu.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    from reina_tpu.core.engine import build_run, run_chunk

    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = days
    run = build_run(v)
    steps = days - 1
    chunk = 28
    print(f"N={run.init_state.age.shape[0]}, {n_seeds} seeds × {steps} days, "
          f"device={jax.devices()[0]}", flush=True)

    # warm-up compile
    t0 = time.perf_counter()
    _, _, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                           run.init_state, run.init_carry,
                           jr.PRNGKey(0), chunk, 0)
    np.asarray(outs.by_group)
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_MC.json")

    def write_record(done, wall, finals):
        rec = {
            "metric": "hus_monte_carlo_seeds_per_hour_per_chip",
            "n_seeds": done, "n_seeds_requested": n_seeds, "days": steps,
            "wall_s": round(wall, 1),
            "seeds_per_hour": round(done / wall * 3600, 1),
            "final_all_infected_mean": float(np.mean(finals)),
            "final_all_infected_std": float(np.std(finals)),
        }
        with open(out_path, "w") as f:
            json.dump(rec, f)
        return rec

    finals = []
    t0 = time.perf_counter()
    for s in range(n_seeds):
        key = jr.PRNGKey(s)
        state, carry = run.init_state, run.init_carry
        day = 0
        while day < steps:
            step = min(chunk, steps - day)
            state, carry, outs = run_chunk(run.cfg, run.arrays,
                                           run.schedules, state, carry,
                                           key, step, day)
            day += step
        finals.append(int(np.asarray(outs.by_group)[-1, 3].sum()))  # sync
        if (s + 1) % 25 == 0:
            el = time.perf_counter() - t0
            print(f"{s + 1}/{n_seeds} seeds, {el:.0f}s elapsed "
                  f"({(s + 1) / el * 3600:.0f} seeds/h)", flush=True)
            # checkpoint the record: the remote tunnel can stall for
            # tens of minutes, and a timeout-killed run must still
            # leave an honest partial measurement on disk
            write_record(s + 1, el, finals)
    rec = write_record(len(finals), time.perf_counter() - t0, finals)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
