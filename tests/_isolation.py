"""Fresh-interpreter isolation for compile-fragile tests.

XLA:CPU segfaults in native code once a process has accumulated enough
compiles: reproduced 5× at the big vmapped whole-engine programs
(test_parallel ensemble tests) and 2× at a small eagerly-dispatched
gamma scan ~100 tests into the full suite (test_sampling) — inside
``backend_compile_and_load`` as well as at both persistent-cache
(de)serialization paths, with and without the cache and with a 512 MB
thread-stack rlimit. The identical compiles always succeed in a fresh
process, so this is a cumulative jaxlib/XLA:CPU defect, not an engine
bug.

Guarded tests run their REAL body in a child interpreter (the
``REINA_ISOLATED_SUBTEST`` env flag routes them); the parent only
checks the exit status.
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ISOLATED = os.environ.get("REINA_ISOLATED_SUBTEST") == "1"


def run_isolated(nodeid, timeout=7200):
    """Run one test (or module) in a fresh interpreter and assert it
    passed. The default timeout fits test_parallel.py's whole-module
    child: its ensemble tests compile ~5 distinct vmapped whole-engine
    programs that deliberately skip the persistent cache (the
    (de)serialization paths themselves segfault — module docstring), so
    a cold child takes ~30 min on this host."""
    env = dict(os.environ, REINA_ISOLATED_SUBTEST="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", nodeid],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (
        f"isolated test failed (rc={r.returncode}):\n"
        f"{r.stdout[-3000:]}\n{r.stderr[-2000:]}")
