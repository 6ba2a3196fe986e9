"""Workload-statistics collector for tier-head sizing.

Runs the headline 364-day HUS simulation once (reusing the persistent
compile cache) and prints percentiles of the day-level quantities that
size the engine's geometric tiers: the contact-tracing test-queue
(``ct_cases_per_day`` — the member-tier axis of the tracing BFS), the
daily new-infection count (``new_infections`` — the slot/append tiers)
and the tracing-active day count.

Usage: python tools/run_stats.py [days]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from reina_tpu.utils.compile import enable_persistent_cache
    enable_persistent_cache()

    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    from reina_tpu.core.engine import build_run, run_days

    days = int(sys.argv[1]) if len(sys.argv) > 1 else 365
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = days
    run = build_run(v)
    out, state, carry, times = run_days(run, n_days=days, chunk_days=28)

    from reina_tpu.core.step import GROUP_ROW
    q = np.asarray(out.ct_cases_per_day)[1:]
    ni = np.asarray(out.by_group)[1:, GROUP_ROW["new_infections"]].sum(axis=1)

    def pct(x, what):
        qs = [50, 75, 90, 95, 99, 100]
        vals = {p: int(np.percentile(x, p)) for p in qs}
        active = x[x > 0]
        act = ({p: int(np.percentile(active, p)) for p in qs}
               if len(active) else {})
        print(f"{what}: days>0 = {len(active)}/{len(x)}")
        print(f"  all-days percentiles: {vals}")
        print(f"  active-days percentiles: {act}")

    pct(q, "test-queue size (ct_cases_per_day)")
    pct(ni, "daily new infections")
    fill = np.asarray(carry.bkt_fill)
    fl = fill[fill > 0]
    print(f"bucket fills: sources with >0 = {len(fl)}, "
          f"p50={int(np.percentile(fl, 50)) if len(fl) else 0}, "
          f"p90={int(np.percentile(fl, 90)) if len(fl) else 0}, "
          f"p99={int(np.percentile(fl, 99)) if len(fl) else 0}, "
          f"max={int(fl.max()) if len(fl) else 0}")


if __name__ == "__main__":
    main()
