"""Headline benchmark: 365-day HUS run (~1.7M agents) wall-clock.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no benchmark numbers (BASELINE.md); the driver
north star is a sub-1 s 365-day HUS run per chip, so ``vs_baseline`` is
reported against that 1.0 s target (>1 means faster than target).
Secondary detail goes to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from reina_tpu.utils.compile import enable_persistent_cache
    enable_persistent_cache()

    from reina_tpu.config.variables import VARIABLE_DEFAULTS
    from reina_tpu.core.engine import build_run, run_chunk
    import jax.random as jr

    days = 365
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = days

    t0 = time.perf_counter()
    run = build_run(v)
    build_s = time.perf_counter() - t0
    print(f"build: {build_s:.1f}s, agents={run.n_agents}, "
          f"padded={run.init_state.age.shape[0]}, device={jax.devices()[0]}",
          file=sys.stderr)

    # 364 steps = 13×28 = 7×52 = 4×91. XLA compile time grows super-
    # linearly with the scan trip count on this toolchain, but each
    # chunk boundary pays a ~25 ms tunnel-latency bubble between
    # executes (wall − device ≈ 0.8 ms/day at chunk 28), so fewer,
    # larger chunks trade one-time compile for steady wall.
    chunk = int(os.environ.get("REINA_BENCH_CHUNK", "52"))
    key = jr.PRNGKey(run.random_seed)

    # Warm-up: compile the chunk program and run the first chunk.
    t0 = time.perf_counter()
    state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                   run.init_state, run.init_carry, key,
                                   chunk, 0)
    # hard sync — block_until_ready does not synchronize through the
    # axon tunnel, and warm-up work must not bleed into the timed region
    np.asarray(outs.by_group)
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # Timed full run (fresh state, compiled program): 364 = 13 × 28 days.
    t0 = time.perf_counter()
    state, carry = run.init_state, run.init_carry
    day = 0
    for _ in range(364 // chunk):
        state, carry, outs = run_chunk(run.cfg, run.arrays, run.schedules,
                                       state, carry, key, chunk, day)
        day += chunk
    # block_until_ready does not synchronize through the axon tunnel;
    # the host transfer below is the hard sync that ends the timing.
    infected_final = int(np.asarray(outs.by_group)[-1, 3].sum())
    wall = time.perf_counter() - t0
    print(f"wall: {wall:.3f}s for {day} steps "
          f"({wall / day * 1000:.2f} ms/day), final all_infected={infected_final}",
          file=sys.stderr)

    agent_days_per_sec = run.n_agents * day / wall
    target_wall_s = 1.0
    record = {
        "metric": "hus_365d_agent_days_per_sec_per_chip",
        "value": round(agent_days_per_sec, 1),
        "unit": "agent-days/s/chip",
        "vs_baseline": round(target_wall_s / wall, 3),
    }
    if os.environ.get("REINA_PALLAS") == "0":
        # the retry path engaged: a Mosaic compile failure silently cost
        # the Pallas kernels — make that loud in the recorded artifact
        record["pallas"] = "FALLBACK"
    print(json.dumps(record))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # Safety net: if the Pallas kernels ever fail to compile on a
        # new toolchain, rerun once with the bit-identical XLA
        # fallbacks (ops/fusedmap.py reads REINA_PALLAS at trace time).
        if os.environ.get("REINA_PALLAS") == "0":
            raise
        import traceback
        traceback.print_exc()
        print("retrying with REINA_PALLAS=0", file=sys.stderr)
        os.environ["REINA_PALLAS"] = "0"
        os.execv(sys.executable, [sys.executable] + sys.argv)
