"""GraphQL engine + REINA schema tests (no simulation run needed)."""
import numpy as np
import pandas as pd
import pytest

from reina_tpu.config.variables import VariableStore
from reina_tpu.runtime.graphql.engine import execute, parse
from reina_tpu.runtime.graphql.schema import SCHEMA, results_to_metrics


def ctx():
    return {"store": VariableStore()}


def test_parser_basics():
    doc = parse("""
      query Foo($id: ID!, $n: Int = 3) {
        a: field1(x: $id, y: [1, 2.5, "s", true, null, ENUMV])
        nested { inner @include(if: $flag) }
        ... frag
        ... on SomeType { z }
      }
      fragment frag on SomeType { w }
    """)
    assert len(doc.operations) == 1
    op = doc.operations[0]
    assert op.name == "Foo"
    assert "id" in op.variable_defs
    assert doc.fragments["frag"].type_condition == "SomeType"


def test_execute_simple_schema():
    schema = {"query": {
        "hello": lambda _r, _i: "world",
        "add": lambda _r, _i, a, b: a + b,
        "obj": lambda _r, _i: {"x": 1, "y": [1, 2, 3]},
    }}
    out = execute(schema, "{ hello add(a: 2, b: 40) obj { x y } }")
    assert out == {"data": {"hello": "world", "add": 42,
                            "obj": {"x": 1, "y": [1, 2, 3]}}}


def test_available_events():
    out = execute(SCHEMA, """
      { availableEvents { type description parameters {
          __typename id description required
          ... on EventIntParameter { minValue maxValue unit }
          ... on EventChoiceParameter { choices { id label } }
      } } }""", context=ctx())
    assert "errors" not in out
    events = out["data"]["availableEvents"]
    types = {e["type"] for e in events}
    assert types == {
        "test-all-with-symptoms", "test-only-severe-symptoms",
        "test-with-contact-tracing", "limit-mobility", "wear-masks",
        "vaccinate", "import-infections", "import-infections-weekly",
        "build-new-hospital-beds", "build-new-icu-units"}
    lm = next(e for e in events if e["type"] == "limit-mobility")
    place = next(p for p in lm["parameters"] if p["id"] == "place")
    assert {c["id"] for c in place["choices"]} == {
        "home", "work", "school", "transport", "leisure", "other"}
    red = next(p for p in lm["parameters"] if p["id"] == "reduction")
    assert red["minValue"] == 0 and red["maxValue"] == 100


def test_active_events_and_add_delete():
    c = ctx()
    out = execute(SCHEMA, "{ activeEvents { id date type modifiable } }",
                  context=c)
    assert "errors" not in out
    n0 = len(out["data"]["activeEvents"])
    assert n0 > 10

    out = execute(SCHEMA, """
      mutation { addEvent(event: {date: "2020-12-24", type: LIMIT_MOBILITY,
        parameters: [{id: "reduction", value: 42}]}) { id } }""",
        context=c)
    # enum input arrives as the enum name; the schema maps it
    if out.get("errors"):
        # EventType enum uses upper-snake names mapped to type strings
        assert False, out["errors"]
    out2 = execute(SCHEMA, "{ activeEvents { date type } }", context=c)
    dates = [e["date"] for e in out2["data"]["activeEvents"]]
    assert "2020-12-24" in dates

    # delete it again via its id
    out3 = execute(SCHEMA, "{ activeEvents { id date } }", context=c)
    ev = next(e for e in out3["data"]["activeEvents"]
              if e["date"] == "2020-12-24")
    out4 = execute(SCHEMA,
                   'mutation { deleteEvent(eventId: "%s") { ok } }' % ev["id"],
                   context=c)
    assert out4["data"]["deleteEvent"]["ok"] is True


def test_delete_short_form_default_event():
    """Stored defaults keep the short tuple form (no trailing Nones for
    omitted optional params); make_iv_tuple pads them — deletion must
    match the two spellings (the reference's exact-equality comparison
    cannot delete its own short-form defaults, a bit-rot we fix)."""
    c = ctx()
    out = execute(SCHEMA, "{ activeEvents { id type parameters { id } } }",
                  context=c)
    store_short = {i for i, t in enumerate(c["store"].get("interventions"))
                   if t[0] == "limit-mobility" and len(t) == 3}
    assert store_short, "fixture needs a short-form default"
    events = out["data"]["activeEvents"]
    ev = next(e for e in events if e["id"] == str(min(store_short)))
    assert ev["type"] == "limit-mobility"
    n0 = len(c["store"].get("interventions"))
    # int-typed ID (GraphQL ID may arrive un-stringified)
    out2 = execute(SCHEMA,
                   "mutation { deleteEvent(eventId: %s) { ok } }" % ev["id"],
                   context=c)
    assert not out2.get("errors"), out2
    assert len(c["store"].get("interventions")) == n0 - 1


def test_resolver_crash_returns_error_envelope(monkeypatch):
    """A resolver bug must surface as {data, errors}, not a dropped
    connection (graphene wraps resolver exceptions the same way)."""
    def boom(_root, _info):
        raise RuntimeError("resolver exploded")

    monkeypatch.setitem(SCHEMA["query"], "scenarios", boom)
    out = execute(SCHEMA, "{ scenarios { id } }", context=ctx())
    assert out["data"] is None
    assert out["errors"] and "resolver exploded" in out["errors"][0]["message"]


def test_area_and_scenarios():
    out = execute(SCHEMA, """
      { area { name totalPopulation ageGroups { label count } }
        scenarios { id label active } }""", context=ctx())
    assert "errors" not in out, out
    area = out["data"]["area"]
    assert area["name"] == "HUS"
    assert area["totalPopulation"] == 1685983
    assert sum(g["count"] for g in area["ageGroups"]) == 1685983
    scen = out["data"]["scenarios"]
    assert scen[0]["id"] == "default" and scen[0]["active"] is True


def test_validation_metrics():
    out = execute(SCHEMA, """
      { validationMetrics { dates metrics { type intValues isSimulated } } }""",
                  context=ctx())
    assert "errors" not in out, out
    vm = out["data"]["validationMetrics"]
    assert len(vm["dates"]) > 100
    types = {m["type"] for m in vm["metrics"]}
    assert {"dead", "in_icu", "in_ward", "all_detected", "detected"} <= types
    for m in vm["metrics"]:
        assert m["isSimulated"] is False


def test_activate_scenario_and_reset():
    c = ctx()
    out = execute(SCHEMA,
                  'mutation { activateScenario(scenarioId: "default") { ok } }',
                  context=c)
    assert out["data"]["activateScenario"]["ok"] is True
    out = execute(SCHEMA,
                  'mutation { activateScenario(scenarioId: "nope") { ok } }',
                  context=c)
    assert out["errors"]
    out = execute(SCHEMA, "mutation { resetVariables { ok } }", context=c)
    assert out["data"]["resetVariables"]["ok"] is True


def test_results_to_metrics_postprocessing():
    days = 30
    idx = pd.date_range("2020-02-18", periods=days)
    df = pd.DataFrame({
        "dead": np.linspace(0, 60, days).round(),
        "all_infected": np.linspace(0, 4000, days).round(),
        "all_detected": np.linspace(0, 900, days).round(),
        "detected": np.full(days, 30.0),
        "new_infections": np.full(days, 100.0),
        "r": np.full(days, 1.4),
        "susceptible": np.full(days, 10000),
        "vaccinated": np.zeros(days),
        "infected": np.full(days, 500),
        "in_ward": np.full(days, 40),
        "in_icu": np.full(days, 8),
        "recovered": np.zeros(days),
        "available_hospital_beds": np.full(days, 100),
        "available_icu_units": np.full(days, 10),
        "total_icu_units": np.full(days, 300),
        "mobility_limitation": np.full(days, 0.25),
        # per-variant prefix columns (simulation.outputs_to_frames)
        "infected_by_variant_wild-type": np.full(days, 80.0),
        "infected_by_variant_b117": np.linspace(0, 20, days).round(),
    }, index=idx)
    dates, metrics = results_to_metrics({"total": df, "age_groups": None})
    assert len(dates) == days
    by_id = {m.type: m for m in metrics}
    # variant takeover is a categorized metric built from prefix columns
    # (reference main.pyx:1847-1850 exposes infected_by_variant per day)
    ibv = by_id["infected_by_variant"].categorized_int_values
    assert ibv.categories == ["wild-type", "b117"]
    assert ibv.values[-1] == [80, 20]
    # IFR = dead / all_infected, 7-day mean, % — late-window check
    ifr = by_id["ifr"].float_values
    assert ifr[0] is None  # rolling window warm-up
    assert abs(ifr[-1] - 1.5) < 0.1  # 60/4000 = 1.5%
    # 14-day rolling means leave the first 13 values null
    det = by_id["detected"].int_values
    assert det[12] is None and det[20] == 30


def test_disease_parameters_roundtrip():
    """Parameter-explorer API (reference Dash components/params.py:144-298)."""
    c = {"store": VariableStore()}
    out = execute(SCHEMA, "{ diseaseParameters { id label value unit } }",
                  context=c)
    assert not out.get("errors"), out
    params = {p["id"]: p for p in out["data"]["diseaseParameters"]}
    assert params["mean_incubation_duration"]["value"] == 5.1
    assert params["ratio_of_duration_in_ward"]["unit"] == "%"
    assert len(params) == 11

    out = execute(SCHEMA, """
        mutation { setParameter(parameterId: "mean_incubation_duration",
                                value: 6.5) { ok } }""", context=c)
    assert not out.get("errors"), out
    out = execute(SCHEMA, "{ diseaseParameters { id value } }", context=c)
    vals = {p["id"]: p["value"] for p in out["data"]["diseaseParameters"]}
    assert vals["mean_incubation_duration"] == 6.5

    out = execute(SCHEMA, "mutation { resetParameters { ok } }", context=c)
    assert not out.get("errors"), out
    out = execute(SCHEMA, "{ diseaseParameters { id value } }", context=c)
    vals = {p["id"]: p["value"] for p in out["data"]["diseaseParameters"]}
    assert vals["mean_incubation_duration"] == 5.1

    out = execute(SCHEMA, """
        mutation { setParameter(parameterId: "random_seed", value: 1) { ok } }""",
        context=c)
    assert out.get("errors")  # only whitelisted parameters are editable


def test_sample_distribution_endpoint():
    c = {"store": VariableStore()}
    out = execute(SCHEMA, """
        { sampleDistribution(what: "symptom_severity", age: 80)
          { what categories counts } }""", context=c)
    assert not out.get("errors"), out
    d = out["data"]["sampleDistribution"]
    assert sum(d["counts"]) == 10000
    assert set(d["categories"]) <= {
        "ASYMPTOMATIC", "MILD", "SEVERE", "CRITICAL", "FATAL"}

    # mobility limit shifts the contact distribution down
    def mean_contacts(limit):
        out = execute(SCHEMA, """
            query($m: Int!) { sampleDistribution(what: "contacts_per_day",
                age: 30, limitMobility: $m) { categories counts } }""",
            variables={"m": limit}, context=c)
        assert not out.get("errors"), out
        d = out["data"]["sampleDistribution"]
        tot = sum(d["counts"])
        return sum(float(c_) * n for c_, n in zip(d["categories"], d["counts"])) / tot

    assert mean_contacts(80) < mean_contacts(0) * 0.5

    out = execute(SCHEMA, '{ sampleDistribution(what: "bogus") { what } }',
                  context=c)
    assert out.get("errors")


def test_mobility_change_metrics(monkeypatch):
    """7-day rolling means from the raw mobility archive
    (reference graphql_schema.py:322-347)."""
    from reina_tpu.data import mobility as mob

    dates = ["2020-03-%02d" % d for d in range(1, 15)]
    vals = list(range(-5, -33, -2))  # 14 strictly decreasing values
    monkeypatch.setattr(mob, "get_mobility_series", lambda area: {
        "dates": dates,
        "values": {"workplaces": vals, "parks": [None] * 14},
    })
    out = execute(SCHEMA, """
        { mobilityChangeMetrics { dates metrics { type intValues isSimulated } } }
    """, context={"store": VariableStore()})
    assert not out.get("errors"), out
    d = out["data"]["mobilityChangeMetrics"]
    by_id = {m["type"]: m for m in d["metrics"]}
    wp = by_id["workplaces_mobility_change"]
    assert wp["isSimulated"] is False
    # first 6 days lack a full window -> trimmed to the first valid row
    assert d["dates"][0] == "2020-03-07"
    assert wp["intValues"][0] == round(sum(vals[:7]) / 7)
    # parks is all-null -> all None
    assert all(v is None for v in by_id["parks_mobility_change"]["intValues"])


def test_mobility_change_metrics_absent(monkeypatch):
    from reina_tpu.data import mobility as mob
    monkeypatch.setattr(mob, "get_mobility_series", lambda area: None)
    out = execute(SCHEMA, "{ mobilityChangeMetrics { dates metrics { type } } }",
                  context={"store": VariableStore()})
    assert out["data"]["mobilityChangeMetrics"] == {"dates": [], "metrics": []}


def test_set_simulation_days():
    """Timeframe selector write-through (reference corona.py:244-254)."""
    c = {"store": VariableStore()}
    out = execute(SCHEMA, "mutation { setSimulationDays(days: 90) { ok } }",
                  context=c)
    assert not out.get("errors"), out
    assert c["store"].get("simulation_days") == 90
    out = execute(SCHEMA, "mutation { setSimulationDays(days: 0) { ok } }",
                  context=c)
    assert out.get("errors")
    assert c["store"].get("simulation_days") == 90


def test_restrict_to_preset_scenarios(monkeypatch):
    """Overload gate (reference corona.py:584-585): customized sessions
    cannot start runs while the restriction is active."""
    from reina_tpu.config import settings

    monkeypatch.setattr(settings, "RESTRICT_TO_PRESET_SCENARIOS", True)
    c = {"store": VariableStore()}
    execute(SCHEMA, """
        mutation { setParameter(parameterId: "mean_incubation_duration",
                                value: 6.5) { ok } }""", context=c)
    out = execute(SCHEMA, "mutation { runSimulation { runId } }", context=c)
    assert out.get("errors")
    assert "preset scenarios" in out["errors"][0]["message"]


# The canonical introspection document graphiql/codegen clients send
# (graphql-js getIntrospectionQuery(), trimmed to one ofType depth of 7).
INTROSPECTION_QUERY = """
query IntrospectionQuery {
  __schema {
    description
    queryType { name }
    mutationType { name }
    subscriptionType { name }
    types { ...FullType }
    directives {
      name description locations
      args(includeDeprecated: true) { ...InputValue }
      isRepeatable
    }
  }
}
fragment FullType on __Type {
  kind name description specifiedByURL
  fields(includeDeprecated: true) {
    name description
    args(includeDeprecated: true) { ...InputValue }
    type { ...TypeRef }
    isDeprecated deprecationReason
  }
  inputFields(includeDeprecated: true) { ...InputValue }
  interfaces { ...TypeRef }
  enumValues(includeDeprecated: true) {
    name description isDeprecated deprecationReason
  }
  possibleTypes { ...TypeRef }
}
fragment InputValue on __InputValue {
  name description type { ...TypeRef } defaultValue
  isDeprecated deprecationReason
}
fragment TypeRef on __Type {
  kind name
  ofType { kind name ofType { kind name ofType { kind name ofType { kind name
    ofType { kind name ofType { kind name ofType { kind name } } } } } } }
}
"""


def test_introspection_full_query():
    out = execute(SCHEMA, INTROSPECTION_QUERY)
    assert not out.get("errors"), out.get("errors")
    s = out["data"]["__schema"]
    assert s["queryType"] == {"name": "Query"}
    assert s["mutationType"] == {"name": "Mutation"}
    by_name = {t["name"]: t for t in s["types"]}
    # reference type names all present (graphql_schema.py:27-120)
    for name in ("Event", "EventParameter", "EventIntParameter",
                 "EventChoiceParameter", "Metric", "DailyMetrics",
                 "Scenario", "SimulationResults", "SimulationArea",
                 "EventType", "MetricType", "EventInput", "RunSimulation"):
        assert name in by_name, name
    # meta-types are in the type list (buildClientSchema reads them)
    for name in ("__Schema", "__Type", "__Field", "__InputValue",
                 "__EnumValue", "__Directive", "__TypeKind"):
        assert name in by_name, name
    # interface wiring both directions
    ep = by_name["EventParameter"]
    assert ep["kind"] == "INTERFACE"
    assert {t["name"] for t in ep["possibleTypes"]} == {
        "EventIntParameter", "EventChoiceParameter"}
    eip = by_name["EventIntParameter"]
    assert [i["name"] for i in eip["interfaces"]] == ["EventParameter"]
    # enums generated from the live registries
    ev_vals = {v["name"] for v in by_name["EventType"]["enumValues"]}
    assert "LIMIT_MOBILITY" in ev_vals and "VACCINATE" in ev_vals
    # input object fields visible
    ei = by_name["EventInput"]
    assert {f["name"] for f in ei["inputFields"]} == {
        "date", "type", "parameters"}
    # non-null/list wrapping round-trips: runSimulation: RunSimulation
    q = by_name["Query"]
    sr = [f for f in q["fields"] if f["name"] == "simulationResults"][0]
    (arg,) = sr["args"]
    assert arg["name"] == "runId"
    assert arg["type"]["kind"] == "NON_NULL"
    assert arg["type"]["ofType"]["name"] == "ID"
    # directive surface
    assert {d["name"] for d in s["directives"]} >= {
        "skip", "include", "deprecated"}


def test_introspection_type_query():
    out = execute(SCHEMA, """
      { __type(name: "Metric") {
          kind name
          fields { name type { kind name ofType { name } } } } }""")
    assert not out.get("errors")
    t = out["data"]["__type"]
    assert t["kind"] == "OBJECT"
    fields = {f["name"]: f for f in t["fields"]}
    assert fields["type"]["type"]["kind"] == "NON_NULL"
    assert fields["intValues"]["type"]["kind"] == "LIST"
    # unknown type resolves to null, not an error
    out2 = execute(SCHEMA, '{ __type(name: "Nope") { name } }')
    assert out2 == {"data": {"__type": None}}


def test_graphiql_page_served():
    from reina_tpu.runtime.graphql.server import GRAPHIQL_HTML
    assert "graphiql" in GRAPHIQL_HTML.lower()
    assert "/graphql" in GRAPHIQL_HTML


def test_simulation_results_phase_field():
    """simulationResults.phase surfaces compile progress: 'compiling'
    before the first partial, 'running' after, 'finished' at the end
    (additive field — a fresh config's first chunk sits inside a
    multi-minute XLA compile while the client polls at 0.5 s)."""
    from reina_tpu.runtime import cache

    key = "phasetest"
    q = ('{ simulationResults(runId: "%s") '
         '{ runId finished phase } }') % key

    cache.set("%s-finished" % key, False)
    cache.set("%s-phase" % key, "compiling")
    out = execute(SCHEMA, q, context=ctx())
    assert out["data"]["simulationResults"]["phase"] == "compiling"
    assert out["data"]["simulationResults"]["finished"] is False

    cache.set("%s-phase" % key, "running")
    out = execute(SCHEMA, q, context=ctx())
    assert out["data"]["simulationResults"]["phase"] == "running"

    # terminal state; and a missing phase key falls back sensibly
    cache.set("%s-finished" % key, True)
    cache.set("%s-phase" % key, None)
    out = execute(SCHEMA, q, context=ctx())
    assert out["data"]["simulationResults"]["phase"] == "finished"
    assert out["data"]["simulationResults"]["finished"] is True

    # SDL carries the field (introspection contract for clients)
    from reina_tpu.runtime.graphql.sdl import SDL
    assert "phase: String!" in SDL
