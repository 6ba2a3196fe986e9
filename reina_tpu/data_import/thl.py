"""THL open-data importers (reference: data_import/thl.py).

Transforms THL pivot-API JSON-stat payloads into the framework's
datasets: weekly confirmed cases per municipality/district and weekly
vaccinations per (area, age band). The reference fetches these from
``sampo.thl.fi`` at deploy time; here the payload is a local file
(no network egress in this environment).
"""
from __future__ import annotations

import argparse
from datetime import date
from typing import Dict, List, Optional

from .jsonstat import parse

# THL epi-weeks: "Vuosi 2020 Viikko 10" → ISO week start date
def week_label_to_date(label: str) -> Optional[str]:
    parts = label.split()
    try:
        year = int(parts[1])
        week = int(parts[3])
    except (IndexError, ValueError):
        return None
    d = date.fromisocalendar(year, week, 1)
    return d.isoformat()


def parse_weekly_cases(payload) -> Dict[str, Dict[str, float]]:
    """{area_label: {week_start: confirmed}} from a THL cases cube with
    dimensions (hcdmunicipality2020, dateweek*)."""
    rows = parse(payload)
    out: Dict[str, Dict[str, float]] = {}
    for r in rows:
        if r.get("value") is None:
            continue
        area = next((v for k, v in r.items()
                     if k.startswith("hcdmunicipality")), None)
        week_label = next((v for k, v in r.items()
                           if k.startswith("dateweek")), None)
        if not area or not week_label:
            continue
        week = week_label_to_date(str(week_label))
        if week is None:
            continue
        out.setdefault(area, {})[week] = float(r["value"])
    return out


def parse_vaccinations(payload) -> List[dict]:
    """Rows of {area, age, week_start, vaccinations} from a THL
    vaccination cube with (area, cov_vac_age, dateweek*) dimensions."""
    rows = parse(payload)
    out = []
    for r in rows:
        if r.get("value") is None:
            continue
        area = next((v for k, v in r.items()
                     if k.startswith(("area", "hcdmunicipality"))), None)
        age = next((v for k, v in r.items() if "age" in k), None)
        week_label = next((v for k, v in r.items()
                           if k.startswith("dateweek")), None)
        week = week_label_to_date(str(week_label)) if week_label else None
        if not (area and age and week):
            continue
        out.append(dict(area=str(area), age=str(age), week=week,
                        vaccinations=float(r["value"])))
    return out


def vaccination_interventions(rows: List[dict], area: str) -> List[list]:
    """``vaccinate`` intervention tuples for an area: one per
    (week, age band), daily rate = weekly/7 handled by the schedule
    compiler (the reference emits weekly numbers the same way,
    calc/datasets.py:251-275)."""
    ivs = []
    for r in sorted(rows, key=lambda x: (x["week"], x["age"])):
        if r["area"] != area:
            continue
        age = r["age"]
        if "-" in age:
            lo, hi = age.split("-")
            lo, hi = int(lo), int(hi)
        elif age.endswith("+"):
            lo, hi = int(age[:-1]), None
        else:
            continue
        ivs.append(["vaccinate", r["week"], int(r["vaccinations"]), lo, hi])
    return ivs


def update_vaccination_data(payload_path: str, areas: List[str]) -> dict:
    from ..data.mobility import update_derived

    with open(payload_path, "rb") as f:
        rows = parse_vaccinations(f.read())
    return update_derived({"vaccinations": {
        area: vaccination_interventions(rows, area) for area in areas}})


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vaccinations", help="THL vaccination JSON-stat file")
    ap.add_argument("--areas", nargs="+", default=["HUS", "Turku"])
    args = ap.parse_args()
    if args.vaccinations:
        d = update_vaccination_data(args.vaccinations, args.areas)
        for area, ivs in d["vaccinations"].items():
            print(f"{area}: {len(ivs)} vaccination interventions")


if __name__ == "__main__":
    main()
