"""Measured 1000-seed Monte-Carlo wall-clock at HUS scale (the
reference workload: calc/simulation.py:349-385, 1000 seeds / scenario).

Seeds run sequentially through the one compiled single-run program —
the measured-fastest single-chip strategy (BASELINE.md). Writes
BENCH_MC.json with the record and prints progress.

Usage: python tools/bench_monte_carlo.py [n_seeds] [--days N]

``--mesh=K`` instead drives the SEED-SHARDED mesh path: a (K-seed × 1)
mesh runs K ensemble members per program invocation, each member on its
own device (reina_tpu/ensemble.py's vmapped branch + batch_placement).
On the single-chip bench TPU use K=1 to price the mesh formulation; on
a CPU host it builds K virtual devices (correctness + scaling shape).
Writes BENCH_MC_MESH.json. Seed-axis scaling is embarrassingly parallel
— per-chip ensemble throughput equals the member wall-clock, so the
projected pod rate is K × the measured per-device rate.
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
    mesh_k = 0
    for a in sys.argv[1:]:
        if a.startswith("--days="):
            days = int(a.split("=")[1])
        elif a.startswith("--mesh="):
            mesh_k = int(a.split("=")[1])
        elif a.isdigit():
            n_seeds = int(a)

    if mesh_k:
        return main_mesh(n_seeds, days, mesh_k)

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


def main_mesh(n_seeds, days, mesh_k):
    """Seed-sharded mesh ensemble: K members per program invocation,
    one per device along the mesh's 'seed' axis."""
    import os as _os
    if not _os.environ.get("REINA_MC_TPU"):
        # default to a virtual CPU mesh (the bench TPU is one chip);
        # set REINA_MC_TPU=1 to run the mesh path on the real device(s)
        flags = _os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={mesh_k}"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from reina_tpu.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    from reina_tpu.core.engine import build_run
    from reina_tpu.ensemble import run_ensemble
    from reina_tpu.parallel.mesh import make_mesh

    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = days
    if not _os.environ.get("REINA_MC_TPU"):
        # CPU correctness/scaling-shape run: synthetic small population
        from reina_tpu.testing import build_synthetic_run
        run = build_synthetic_run(
            n_agents=20000, days=days, seed=0,
            interventions=[["import-infections", "2020-02-20", 50],
                           ["test-all-with-symptoms", "2020-02-20"]],
            pad_multiple=1024)
    else:
        run = build_run(v)
    mesh = make_mesh(n_seed=mesh_k, n_agent=1,
                     devices=jax.devices()[:mesh_k])
    steps = days - 1
    print(f"mesh seed×agent={tuple(mesh.devices.shape)} N="
          f"{run.init_state.age.shape[0]} device="
          f"{jax.devices()[0].platform}", flush=True)

    t0 = time.perf_counter()
    outs = run_ensemble(run, seeds=list(range(mesh_k)),
                        batch_size=mesh_k, mesh=mesh, n_days=days)
    compile_s = time.perf_counter() - t0

    n_batches = max(1, n_seeds // mesh_k)
    t0 = time.perf_counter()
    finals = []
    for b in range(n_batches):
        seeds = list(range(b * mesh_k, (b + 1) * mesh_k))
        outs = run_ensemble(run, seeds=seeds, batch_size=mesh_k,
                            mesh=mesh, n_days=days)
        finals.extend(outs.by_group[:, -1, 3].sum(axis=1).tolist())
    wall = time.perf_counter() - t0
    done = n_batches * mesh_k
    rec = {
        "metric": "monte_carlo_mesh_seeds_per_hour",
        "mesh_seed_shards": mesh_k,
        "platform": jax.devices()[0].platform,
        "n_agents": int(run.init_state.age.shape[0]),
        "n_seeds": done, "days": steps,
        "compile_s": round(compile_s, 1),
        "wall_s": round(wall, 1),
        "seeds_per_hour": round(done / wall * 3600, 1),
        "seeds_per_hour_per_device": round(done / wall * 3600 / mesh_k, 1),
        "final_all_infected_mean": float(np.mean(finals)),
        "final_all_infected_std": float(np.std(finals)),
        "seed_distinct": len(set(finals)) > 1,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_MC_MESH.json")
    with open(out_path, "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
