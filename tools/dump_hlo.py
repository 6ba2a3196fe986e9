"""Dump the optimized HLO of the compiled day step and extract the
bodies of the hottest fusions identified by the profiler."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re
from functools import partial

import jax
import jax.random as jr

from reina_tpu.config.variables import VARIABLE_DEFAULTS
from reina_tpu.core.engine import build_run
from reina_tpu.core.step import SchedRow, day_step

HOT = ["fusion.2878", "fusion.2768", "fusion.2766", "fusion.2744",
       "fusion.2783", "fusion.2747", "fusion.2857"]


def main():
    v = dict(VARIABLE_DEFAULTS)
    v["simulation_days"] = 40
    run = build_run(v)
    key = jr.PRNGKey(0)
    row = SchedRow(*(x[0] for x in run.schedules))
    args = (run.arrays, row, run.init_state, run.init_carry, key)

    compiled = jax.jit(partial(day_step, run.cfg)).lower(*args).compile()
    txt = compiled.as_text()
    print("HLO chars:", len(txt), flush=True)
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)

    # fused computation bodies are named e.g. %fused_computation.N; map
    # fusion instructions to their called computation and print it
    for name in HOT:
        m = re.search(rf"%{re.escape(name)} = .*", txt)
        if not m:
            print(f"{name}: not found")
            continue
        line = m.group(0)
        print("=" * 100)
        print(line[:600])
        cm = re.search(r"calls=%([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            cdef = re.search(
                rf"^%{re.escape(comp)} \(.*?\n(.*?)^}}", txt,
                re.M | re.S)
            if cdef:
                body = cdef.group(0)
                print(body[:3000])


if __name__ == "__main__":
    main()
