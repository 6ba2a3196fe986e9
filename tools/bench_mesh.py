"""Headline bench under the MESH formulation.

Runs the 364-day HUS workload through run_days(mesh=...) on however
many devices are present (1 on the bench TPU; set
XLA_FLAGS=--xla_force_host_platform_device_count=k + JAX_PLATFORMS=cpu
for a virtual mesh), measuring what the GSPMD-partitioned program —
the one multi-chip runs execute, with the XLA fallbacks replacing the
unpartitionable Pallas kernels — costs per chip next to bench.py's
unsharded headline. Prints ONE JSON line.

Usage: python tools/bench_mesh.py [n_agent_shards]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from reina_tpu.utils.compile import enable_persistent_cache
    enable_persistent_cache()

    import jax

    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    from reina_tpu.core.engine import build_run, run_days
    from reina_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    n_agent = int(sys.argv[1]) if len(sys.argv) > 1 else n_dev
    mesh = make_mesh(n_seed=n_dev // n_agent, n_agent=n_agent)

    days = 365
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = days
    run = build_run(v)
    print(f"mesh={mesh.devices.shape} devices={jax.devices()[0].platform} "
          f"agents={run.n_agents}", file=sys.stderr)

    # first pass compiles (and runs) the mesh program
    t0 = time.perf_counter()
    out, _, carry, times = run_days(run, n_days=days, chunk_days=28,
                                    mesh=mesh)
    del out
    print(f"mesh compile+run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # timed pass (compiled): run_days returns per-chunk wall times
    trace_dir = os.environ.get("REINA_MESH_TRACE")
    t0 = time.perf_counter()
    if trace_dir:
        import jax.profiler
        with jax.profiler.trace(trace_dir):
            out2, _, carry2, times2 = run_days(run, n_days=days,
                                               chunk_days=28, mesh=mesh)
    else:
        out2, _, carry2, times2 = run_days(run, n_days=days, chunk_days=28,
                                           mesh=mesh)
    wall = time.perf_counter() - t0
    steps = days - 1
    infected = int(np.asarray(out2.by_group)[-1, 3].sum())
    mode = ("FALLBACK (GSPMD)"
            if os.environ.get("REINA_MESH_SHARD_PALLAS", "1") == "0"
            else "shard_map islands")
    # loop-only: the per-chunk walls run_days returns (excludes the
    # day-0 snapshot and the final host-side stacking; includes the
    # per-chunk output transfer) — the quantity that scales with chips
    loop_s = sum(t for _, t in times2)
    print(json.dumps({
        "metric": "hus_365d_mesh_ms_per_day",
        "mesh_seed_x_agent": list(mesh.devices.shape),
        "wall_s": round(wall, 3),
        "ms_per_day": round(wall / steps * 1000, 2),
        "loop_ms_per_day": round(loop_s / steps * 1000, 2),
        "final_all_infected": infected,
        "pallas": mode,
    }))


if __name__ == "__main__":
    main()
