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
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 40
    run = build_run(v)
    key = jr.PRNGKey(0)
    chunk = 8

    t0 = time.perf_counter()
    state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                   run.init_state, run.init_carry, key,
                                   chunk, 0)
    jax.block_until_ready(outs)
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                   state, carry, key, chunk, 8)
    jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    print(f"steady: {wall / chunk * 1000:.1f} ms/day", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                       state, carry, key, chunk, 16)
        jax.block_until_ready(outs)

    # aggregate device trace events by op name
    paths = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    if not paths:
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        cat = args.get("long_name") or name
        durs[name] += ev.get("dur", 0)
        counts[name] += 1
    total = sum(durs.values())
    print(f"\ntotal device-event time: {total/1e3:.1f} ms over {chunk} days")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{d/1e3:10.2f} ms {counts[name]:6d}x  {name[:100]}")


if __name__ == "__main__":
    main()
