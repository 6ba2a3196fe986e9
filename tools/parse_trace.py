"""Aggregate a jax.profiler trace directory by op name (the same
breakdown tools/trace_step.py prints, for traces captured elsewhere —
e.g. bench_mesh.py's REINA_MESH_TRACE).

Usage: python tools/parse_trace.py /tmp/mesh_trace [top_n]
"""
import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 45
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths)
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
    print(f"\ntotal device-event time: {total/1e3:.1f} ms")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top_n]:
        ln = longname.get(name, "")
        print(f"{d/1e3:10.2f} ms {counts[name]:6d}x  {name[:60]}"
              f"  {ln[:160]}")


if __name__ == "__main__":
    main()
