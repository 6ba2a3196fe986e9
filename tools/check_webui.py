"""Behavioral + static web-UI check (no browser exists in this image).

Replaces the old ``b"startPan" in html`` string assert with checks that
actually fail on a broken page (round-4 verdict, weak #6):

  1. STATIC: the page's inline JS has balanced brackets outside
     strings/comments; every identifier referenced from HTML ``on*=``
     attributes or ``addEventListener(..., name)`` is a declared
     function; every ``getElementById("x")`` target exists as an
     ``id="x"`` element. A renamed/mistyped handler or element id
     fails here.
  2. LIVE: every GraphQL document embedded in the page is executed
     against the real schema engine with representative variables —
     field drift between the UI and the schema fails here (the same
     guarantee the conformance suite gives reina-ui's documents).
  3. PROTOCOL: the full run→poll loop (runSimulation → poll
     simulationResults at the UI's cadence until finished) runs
     against the real worker/cache plumbing with a fast fake engine,
     asserting the phase transitions and growing partial results the
     chart code consumes.

Usage: python tools/check_webui.py  (exit 0 = all green)
Also imported by tests/test_webui_check.py.
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

APP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "reina_tpu", "webui", "app.html")


def _read():
    with open(APP, encoding="utf-8") as f:
        return f.read()


def _strip_js_literals(js: str) -> str:
    """Remove string/template/comment/regex content (keeps newlines), so
    bracket counting and identifier scans see only code."""
    out = []
    i, n = len(js) and 0, len(js)
    mode = None   # None | "'" | '"' | '`' | '//' | '/*'
    while i < n:
        c = js[i]
        nxt = js[i + 1] if i + 1 < n else ""
        if mode is None:
            if c in "'\"`":
                mode = c
                out.append(c)
            elif c == "/" and nxt == "/":
                mode = "//"
            elif c == "/" and nxt == "*":
                mode = "/*"
                i += 1
            else:
                out.append(c)
        elif mode in "'\"`":
            if c == "\\":
                i += 1
            elif c == mode:
                mode = None
                out.append(c)
            elif c == "\n":
                out.append("\n")
        elif mode == "//":
            if c == "\n":
                mode = None
                out.append("\n")
        elif mode == "/*":
            if c == "*" and nxt == "/":
                mode = None
                i += 1
            elif c == "\n":
                out.append("\n")
        i += 1
    return "".join(out)


def check_static() -> list:
    html = _read()
    errors = []
    scripts = re.findall(r"<script>(.*?)</script>", html, re.S)
    js = "\n".join(scripts)
    code = _strip_js_literals(js)

    # 1a. balanced brackets
    pairs = {")": "(", "]": "[", "}": "{"}
    stack = []
    for ln, line in enumerate(code.split("\n"), 1):
        for ch in line:
            if ch in "([{":
                stack.append((ch, ln))
            elif ch in ")]}":
                if not stack or stack[-1][0] != pairs[ch]:
                    errors.append(f"unbalanced '{ch}' at script line {ln}")
                    stack = stack or [("?", ln)]
                    stack.pop()
                else:
                    stack.pop()
    for ch, ln in stack:
        errors.append(f"unclosed '{ch}' opened at script line {ln}")

    # 1b. handler references resolve to declared functions
    declared = set(re.findall(r"\bfunction\s+([A-Za-z_$][\w$]*)", code))
    declared |= set(re.findall(
        r"\b(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=", code))
    js_kw = {"if", "for", "while", "switch", "return", "new", "typeof"}
    for m in re.finditer(r'\son([a-z]+)="([A-Za-z_$][\w$]*)\s*\(', html):
        name = m.group(2)
        if name not in declared and name not in js_kw | {"event"}:
            errors.append(f"on{m.group(1)} references undeclared "
                          f"function '{name}'")
    for m in re.finditer(
            r"addEventListener\(\s*['\"][a-z]+['\"]\s*,\s*"
            r"([A-Za-z_$][\w$]*)\s*[,)]", js):
        if m.group(1) not in declared:
            errors.append(f"addEventListener references undeclared "
                          f"'{m.group(1)}'")

    # 1c. getElementById targets exist
    ids = set(re.findall(r'id="([^"]+)"', html))
    for m in re.finditer(r"getElementById\(\s*['\"]([^'\"]+)['\"]\s*\)", js):
        if m.group(1) not in ids:
            errors.append(f"getElementById('{m.group(1)}') has no matching "
                          f"id= element")

    # the interaction handlers the reference toolkit provides must be
    # wired (crosshair/zoom/pan/reset/PNG — components/graphs.py:14-64)
    for needed in ("startPan", "downloadPng", "dblclick", "mousemove"):
        if needed not in js:
            errors.append(f"expected interaction hook '{needed}' missing")
    return errors


def extract_documents():
    """(document, needs) for every gql(`...`) call in the page."""
    html = _read()
    docs = []
    # JS template interpolations inside the documents get sample
    # values (e.g. the Distributions panel's ${what})
    subs = {"what": "symptom_severity", "extra": ""}
    for m in re.finditer(r"gql\(\s*`([^`]+)`", html):
        doc = m.group(1)
        doc = re.sub(r"\$\{(\w+)\}",
                     lambda mm: subs.get(mm.group(1), "1"), doc)
        docs.append(doc)
    return docs


def check_documents(execute, schema, ctx_factory) -> list:
    """Execute every embedded document against the real schema."""
    errors = []
    # a real disease-parameter id for the setParameter document
    pq = execute(schema, "{ diseaseParameters { id value } }",
                 context=ctx_factory())
    params = (pq.get("data") or {}).get("diseaseParameters") or []
    sample_vars = {
        "id": "check-run", "d": 365, "v": 1.0, "a": 60, "m": 0, "e": {
            "type": "limit-mobility", "date": "2020-05-01",
            "parameters": [{"id": "reduction", "value": 10}],
        },
    }
    for doc in extract_documents():
        wanted = set(re.findall(r"\$([A-Za-z_]\w*)", doc))
        variables = {k: v for k, v in sample_vars.items() if k in wanted}
        if "setParameter" in doc and params:
            variables["id"] = params[0]["id"]
            variables["v"] = params[0]["value"]
        if "activateScenario" in doc:
            variables["id"] = "default"
        missing = wanted - set(variables)
        if missing:
            errors.append(f"no sample variable for {missing} in: {doc[:60]}")
            continue
        out = execute(schema, doc, variables=variables,
                      context=ctx_factory())
        for err in (out.get("errors") or []):
            msg = err.get("message", "")
            # sample ids that legitimately don't resolve to live objects
            if ("No simulation run active" in msg
                    or "invalid intervention ID" in msg):
                continue
            errors.append(f"document failed: {msg} :: {doc[:80]}")
    return errors


def check_protocol() -> list:
    """run→poll against the real worker plumbing with a fast fake."""
    import time

    from drive_webui import fake_simulate
    from reina_tpu.runtime import cache, runner
    from reina_tpu.runtime.graphql.engine import execute
    from reina_tpu.runtime.graphql.schema import SCHEMA
    from reina_tpu.config.variables import VariableStore

    errors = []
    cache.init_backend("memory")
    runner.simulate_individuals = fake_simulate
    ctx = {"store": VariableStore()}

    out = execute(SCHEMA, "mutation { runSimulation { runId } }",
                  context=ctx)
    if out.get("errors"):
        return [f"runSimulation failed: {out['errors']}"]
    run_id = out["data"]["runSimulation"]["runId"]

    poll_q = ("query($id: ID!){ simulationResults(runId:$id) { finished "
              "phase predictedMetrics { dates metrics { type intValues "
              "floatValues } } } }")
    phases, lengths = [], []
    deadline = time.time() + 30
    while time.time() < deadline:
        out = execute(SCHEMA, poll_q, variables={"id": run_id},
                      context=ctx)
        if out.get("errors"):
            errors.append(f"poll failed: {out['errors']}")
            break
        res = out["data"]["simulationResults"]
        phases.append(res["phase"])
        lengths.append(len(res["predictedMetrics"]["dates"]))
        if res["finished"]:
            break
        time.sleep(0.25)
    else:
        errors.append("poll never finished")

    if not phases or phases[-1] != "finished":
        errors.append(f"terminal phase != finished: {phases[-5:]}")
    if set(phases) - {"compiling", "running", "finished"}:
        errors.append(f"unknown phases: {set(phases)}")
    if not lengths or lengths[-1] < 60:
        errors.append(f"final frame too short: {lengths[-3:]}")
    if lengths != sorted(lengths):
        errors.append(f"partial frames shrank: {lengths}")
    # the metric types the chart render() picks must be present
    types = {m["type"] for m in res["predictedMetrics"]["metrics"]}
    for needed in ("infected", "recovered", "dead", "all_detected", "r",
                   "ifr", "cfr", "in_ward", "in_icu",
                   "available_hospital_beds", "available_icu_units"):
        if needed not in types:
            errors.append(f"metric '{needed}' missing from results "
                          f"(render() picks it)")
    return errors


def main() -> int:
    from reina_tpu.runtime.graphql.engine import execute
    from reina_tpu.runtime.graphql.schema import SCHEMA
    from reina_tpu.config.variables import VariableStore

    errs = check_static()
    errs += check_documents(execute, SCHEMA,
                            lambda: {"store": VariableStore()})
    errs += check_protocol()
    for e in errs:
        print("FAIL:", e)
    print("webui check:", "FAILED" if errs else "OK",
          f"({len(extract_documents())} documents replayed)")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
