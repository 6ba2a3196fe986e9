"""Capture an XLA device profile of the day step and print the op-level
time breakdown (no TensorBoard needed — parses the trace events)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import gzip
import json
import time
from collections import defaultdict
from functools import partial

import jax
import jax.random as jr

from reina_tpu.config.variables import VARIABLE_DEFAULTS
from reina_tpu.core.engine import build_run, run_chunk

TRACE_DIR = "/tmp/reina_trace"


def main():
    import numpy as np
    start_day = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    # chunk=28 matches bench.py's chunk size, so the persistent compile
    # cache built by a bench run serves the trace too (the 8-day variant
    # cost a separate 10+ min remote compile every session)
    chunk = int(os.environ.get("TRACE_CHUNK", "28"))
    start_day = (start_day // chunk) * chunk
    v = dict(VARIABLE_DEFAULTS)
    # 365 matches bench.py exactly (schedule length is baked into the
    # compiled program shape — any other value is a compile-cache miss)
    v["simulation_days"] = max(365, start_day + 2 * chunk)
    run = build_run(v)
    key = jr.PRNGKey(0)

    t0 = time.perf_counter()
    state, carry = run.init_state, run.init_carry
    day = 0
    outs = None
    while day < start_day:
        step = min(chunk, start_day - day)
        state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                       state, carry, key, step, day)
        day += step
    inf = (int(np.asarray(outs.by_group)[-1, 3].sum())
           if outs is not None else 0)  # hard sync
    print(f"compile+advance to day {day}: {time.perf_counter() - t0:.1f}s "
          f"(all_infected={inf})", flush=True)

    t0 = time.perf_counter()
    state2, carry2, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                     state, carry, key, chunk, day)
    float(np.asarray(outs.by_group)[-1, 3].sum())
    wall = time.perf_counter() - t0
    print(f"steady (days {day}..{day+chunk}): {wall / chunk * 1000:.1f} ms/day",
          flush=True)

    with jax.profiler.trace(TRACE_DIR):
        state2, carry2, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                         state, carry, key, chunk, day)
        float(np.asarray(outs.by_group)[-1, 3].sum())

    # aggregate device trace events by op name
    paths = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    if not paths:
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    longname = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        durs[name] += ev.get("dur", 0)
        counts[name] += 1
        ln = args.get("long_name") or args.get("tf_op") or ""
        if ln and name not in longname:
            longname[name] = ln
    total = sum(durs.values())
    print(f"\ntotal device-event time: {total/1e3:.1f} ms over {chunk} days")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:45]:
        # the long_name carries the jaxpr op path (source attribution) —
        # print it so hot fusions map to engine phases without a
        # separate HLO dump
        ln = longname.get(name, "")
        print(f"{d/1e3:10.2f} ms {counts[name]:6d}x  {name[:60]}"
              f"  {ln[:160]}")


if __name__ == "__main__":
    main()
