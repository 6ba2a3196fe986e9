"""Conformance: the exact operation documents the reina-ui Next.js
client issues, executed end-to-end against the hand-rolled GraphQL
engine + schema.

The shapes are derived from the reference's schema surface
(/root/reference/graphql_schema.py:239-508) and its gql smoke script
(/root/reference/test_graphql.py): named operations with variables,
fragment spreads + inline fragments on the EventParameter interface,
enum round-trips through variable coercion (an enum arrives as its
NAME string in the variables JSON), input-object coercion for
EventInput, @skip/@include with boolean variables, and the
runSimulation → polled simulationResults protocol.
"""
import time

import numpy as np
import pandas as pd
import pytest

from reina_tpu.config.variables import VariableStore
from reina_tpu.runtime import cache, runner
from reina_tpu.runtime.graphql.engine import execute
from reina_tpu.runtime.graphql.schema import SCHEMA


@pytest.fixture(autouse=True)
def fresh_cache():
    cache.init_backend("memory")
    yield


def ctx():
    return {"store": VariableStore()}


def _full_result_df(days=20):
    """A result frame with every column results_to_metrics consumes
    (simulation.outputs_to_frames schema)."""
    idx = pd.date_range("2020-02-18", periods=days)
    return pd.DataFrame({
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
        "infected_by_variant_wild-type": np.full(days, 80.0),
        "infected_by_variant_b117": np.linspace(0, 20, days).round(),
    }, index=idx)


@pytest.fixture
def fake_engine(monkeypatch):
    """Swap the real engine for a fast fake streaming full-schema rows."""
    def fake(step_callback=None, callback_day_interval=1,
             variable_store=None):
        df = _full_result_df()
        if step_callback and not step_callback(df.iloc[:7]):
            from reina_tpu.core.engine import ExecutionInterrupted
            raise ExecutionInterrupted()
        return df, None

    fake._calcfunc_variables = ["random_seed", "area_name",
                                "simulation_days"]
    fake._calcfunc_funcs = []
    fake._calcfunc_filedeps = []
    monkeypatch.setattr(runner, "simulate_individuals", fake)
    return fake


# --- the documents, verbatim-shaped after the reference client ---------------

GET_AVAILABLE_EVENTS = """
query GetAvailableEvents {
  availableEvents {
    type
    description
    parameters {
      __typename
      id
      description
      required
      ... on EventChoiceParameter {
        choices { id label }
      }
      ...intParamFields
    }
  }
}
fragment intParamFields on EventIntParameter {
  minValue
  maxValue
  unit
}
"""

GET_ACTIVE_EVENTS = """
query GetActiveEvents {
  activeEvents {
    id
    type
    date
    description
    modifiable
    modifiedByUser
    parameters {
      id
      ... on EventIntParameter { value unit }
      ... on EventChoiceParameter { choice { id label } }
    }
  }
}
"""

ADD_EVENT = """
mutation AddEvent($event: EventInput!) {
  addEvent(event: $event) { id }
}
"""

DELETE_EVENT = """
mutation DeleteEvent($eventId: ID!) {
  deleteEvent(eventId: $eventId) { ok }
}
"""

RUN_SIMULATION = """
mutation RunSim($seed: Int) {
  runSimulation(randomSeed: $seed) { runId }
}
"""

GET_SIMULATION_RESULTS = """
query getSimulationResults($runId: ID!) {
  simulationResults(runId: $runId) {
    runId
    finished
    endDate
    predictedMetrics {
      dates
      metrics {
        type
        label
        description
        unit
        color
        isInteger
        isSimulated
        isCategorized
        intValues
        floatValues
        categorizedIntValues { categories values }
      }
    }
  }
}
"""


def test_available_events_with_interface_fragments():
    out = execute(SCHEMA, GET_AVAILABLE_EVENTS, context=ctx())
    assert not out.get("errors"), out.get("errors")
    events = {e["type"]: e for e in out["data"]["availableEvents"]}
    lm = events["limit-mobility"]
    params = {p["id"]: p for p in lm["parameters"]}
    # named fragment applied only to the int params
    assert params["reduction"]["__typename"] == "EventIntParameter"
    assert params["reduction"]["minValue"] == 0
    assert params["reduction"]["maxValue"] == 100
    assert "choices" not in params["reduction"]
    # inline fragment applied only to the choice param
    assert params["place"]["__typename"] == "EventChoiceParameter"
    assert "minValue" not in params["place"]
    assert {c["id"] for c in params["place"]["choices"]} == {
        "home", "work", "school", "transport", "leisure", "other"}


def test_add_event_via_input_object_variable_and_enum_coercion():
    """The client passes the whole EventInput through variables; the
    enum arrives as its NAME string and round-trips to the wire type
    id. Mirrors the reference gql script's AddIntervention shape."""
    c = ctx()
    out = execute(SCHEMA, ADD_EVENT, variables={"event": {
        "date": "2020-12-01",
        "type": "LIMIT_MOBILITY",
        "parameters": [
            {"id": "reduction", "value": 50},
            {"id": "min_age", "value": 7},
            {"id": "max_age", "value": 12},
            {"id": "place", "choice": "school"},
        ]}}, context=c)
    assert not out.get("errors"), out.get("errors")
    assert out["data"]["addEvent"]["id"] is not None

    out2 = execute(SCHEMA, GET_ACTIVE_EVENTS, context=c)
    assert not out2.get("errors"), out2.get("errors")
    ev = next(e for e in out2["data"]["activeEvents"]
              if e["date"] == "2020-12-01")
    assert ev["type"] == "limit-mobility"       # enum → wire id
    # the reference declares modifiedByUser but never assigns it
    # (graphql_schema.py:63); the field must resolve, not be truthy
    assert ev["modifiedByUser"] in (False, None)
    params = {p["id"]: p for p in ev["parameters"]}
    assert params["reduction"]["value"] == 50
    assert params["place"]["choice"]["id"] == "school"
    assert params["min_age"]["value"] == 7

    # delete through an ID variable (DeleteIntervention shape)
    out3 = execute(SCHEMA, DELETE_EVENT,
                   variables={"eventId": ev["id"]}, context=c)
    assert not out3.get("errors"), out3.get("errors")
    assert out3["data"]["deleteEvent"]["ok"] is True
    out4 = execute(SCHEMA, GET_ACTIVE_EVENTS, context=c)
    assert "2020-12-01" not in [e["date"]
                                for e in out4["data"]["activeEvents"]]


def test_run_simulation_and_poll_results(fake_engine):
    """The client's core loop: runSimulation(randomSeed) → poll
    simulationResults(runId) until finished, then read
    predictedMetrics (reference test_graphql.py:130-159 /
    graphql_schema.py:263-290,382-408)."""
    c = ctx()
    out = execute(SCHEMA, RUN_SIMULATION, variables={"seed": 1234},
                  context=c)
    assert not out.get("errors"), out.get("errors")
    run_id = out["data"]["runSimulation"]["runId"]
    assert run_id

    # poll like the UI does (500 ms interval; the fake finishes fast)
    deadline = time.time() + 20
    res = None
    while time.time() < deadline:
        out = execute(SCHEMA, GET_SIMULATION_RESULTS,
                      variables={"runId": run_id}, context=c)
        assert not out.get("errors"), out.get("errors")
        res = out["data"]["simulationResults"]
        if res["finished"]:
            break
        time.sleep(0.05)
    assert res and res["finished"] is True
    assert res["runId"] == run_id
    assert res["endDate"] > "2020"
    pm = res["predictedMetrics"]
    assert len(pm["dates"]) == 20
    by_type = {m["type"]: m for m in pm["metrics"]}
    # int metric serializes into intValues, float into floatValues
    assert by_type["dead"]["isInteger"] is True
    assert by_type["dead"]["intValues"][-1] == 60
    assert by_type["dead"]["floatValues"] is None
    assert by_type["r"]["isInteger"] is False
    assert by_type["r"]["floatValues"][-1] == pytest.approx(1.4)
    # categorized (per-variant) metric carries the category matrix
    civ = by_type["infected_by_variant"]["categorizedIntValues"]
    assert civ["categories"] == ["wild-type", "b117"]
    assert civ["values"][-1] == [80, 20]
    # every simulated metric flagged as such
    assert all(m["isSimulated"] for m in pm["metrics"])


def test_unknown_run_id_is_error(fake_engine):
    out = execute(SCHEMA, GET_SIMULATION_RESULTS,
                  variables={"runId": "nope"}, context=ctx())
    assert out.get("errors")
    assert "No simulation run active" in out["errors"][0]["message"]


def test_skip_include_with_boolean_variables():
    doc = """
    query Events($withParams: Boolean!) {
      activeEvents {
        id
        parameters @include(if: $withParams) { id }
        date @skip(if: $withParams)
      }
    }
    """
    c = ctx()
    with_p = execute(SCHEMA, doc, variables={"withParams": True}, context=c)
    assert not with_p.get("errors"), with_p.get("errors")
    ev = with_p["data"]["activeEvents"][0]
    assert "parameters" in ev and "date" not in ev
    without = execute(SCHEMA, doc, variables={"withParams": False},
                      context=c)
    ev = without["data"]["activeEvents"][0]
    assert "parameters" not in ev and "date" in ev


def test_missing_required_variable_is_error():
    out = execute(SCHEMA, GET_SIMULATION_RESULTS, variables={},
                  context=ctx())
    assert out.get("errors")


def test_operation_selection_by_name():
    """Clients batch several named operations in one document and pick
    one via operationName."""
    doc = GET_AVAILABLE_EVENTS + GET_ACTIVE_EVENTS
    out = execute(SCHEMA, doc, operation_name="GetActiveEvents",
                  context=ctx())
    assert not out.get("errors"), out.get("errors")
    assert "activeEvents" in out["data"]
    assert "availableEvents" not in out["data"]
