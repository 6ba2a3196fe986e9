"""Google COVID-19 Community Mobility → weekly ``limit-mobility``
interventions (reference: data_import/google_covid_mobility.py +
calc/datasets.py:176-248).

Transform: per-region daily percent-change series → weekly means →
one ``limit-mobility`` tuple per (week, place) when mobility is below
baseline and moved ≥5 points since the last emitted value.
"""
from __future__ import annotations

import argparse
import csv
import io
from datetime import date, timedelta
from typing import Dict, List, Optional
from zipfile import ZipFile

import numpy as np

# (mobility CSV column, engine contact place)
PLACE_COLUMNS = (
    ("retail_and_recreation_percent_change_from_baseline", "leisure"),
    ("workplaces_percent_change_from_baseline", "work"),
    ("transit_stations_percent_change_from_baseline", "transport"),
)

# all six Google place categories (raw series for mobilityChangeMetrics)
ALL_CATEGORIES = (
    "retail_and_recreation", "grocery_and_pharmacy", "parks",
    "transit_stations", "workplaces", "residential",
)
ALL_COLUMNS = tuple("%s_percent_change_from_baseline" % c
                    for c in ALL_CATEGORIES)

REGIONS = {
    "HUS": (1, "Uusimaa"),
    "Varsinais-Suomi": (1, "Southwest Finland"),
    "Turku": (2, "Turku"),
    "Helsinki": (2, "Helsinki"),
    "Espoo": (2, "Helsinki"),
}


def read_region_series(csv_bytes: bytes, area_name: str) -> Dict[str, Dict[str, float]]:
    """{date: {column: value}} for the area's region rows."""
    region_id, region = REGIONS[area_name]
    out: Dict[str, Dict[str, float]] = {}
    for row in csv.DictReader(io.StringIO(csv_bytes.decode("utf8"))):
        if region_id == 1:
            if row.get("sub_region_1") != region or row.get("sub_region_2"):
                continue
        else:
            if row.get("sub_region_2") != region:
                continue
        vals = {}
        for col in ALL_COLUMNS:
            v = row.get(col, "")
            if v not in ("", None):
                vals[col] = float(v)
        out[row["date"]] = vals
    return out


def raw_daily_series(series: Dict[str, Dict[str, float]]) -> dict:
    """{"dates": [...], "values": {category: [v|None, ...]}} — the raw
    daily percent-change series served as mobilityChangeMetrics."""
    dates = sorted(series)
    values = {}
    for cat, col in zip(ALL_CATEGORIES, ALL_COLUMNS):
        values[cat] = [series[d].get(col) for d in dates]
    return {"dates": dates, "values": values}


def weekly_means(series: Dict[str, Dict[str, float]]) -> List[tuple]:
    """[(week_start_iso, {col: mean})] — weekly (W-SUN) means, shifted
    one week earlier like the reference's ``.shift(-1)``."""
    buckets: Dict[date, Dict[str, List[float]]] = {}
    for d_str, vals in series.items():
        d = date.fromisoformat(d_str)
        week_end = d + timedelta(days=(6 - d.weekday()) % 7)
        b = buckets.setdefault(week_end, {})
        for col, v in vals.items():
            b.setdefault(col, []).append(v)
    out = []
    weeks = sorted(buckets)
    for i, w in enumerate(weeks[:-1]):
        nxt = buckets[weeks[i + 1]]
        means = {col: float(np.mean(vs)) for col, vs in nxt.items()}
        out.append((w.isoformat(), means))
    return out


def mobility_interventions(weekly: List[tuple]) -> List[list]:
    ivs: List[list] = []
    for col, place in PLACE_COLUMNS:
        last_val: Optional[int] = None
        for week_iso, means in weekly:
            if week_iso < "2020-03-08" or col not in means:
                continue
            val = int(means[col])
            if val > 0:
                continue
            if last_val is not None and abs(last_val - val) < 5:
                continue
            ivs.append(["limit-mobility", week_iso, -val, None, None, place])
            last_val = val
    return ivs


def import_zip(zip_path: str, areas: List[str], country: str = "FI",
               out_path: Optional[str] = None) -> dict:
    from ..data.mobility import DERIVED_PATH, update_derived

    out_path = out_path or DERIVED_PATH
    mob: dict = {}
    raw: dict = {}
    with ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist()
                 if n.endswith(f"{country}_Region_Mobility_Report.csv")]
        for area in areas:
            series: Dict[str, Dict[str, float]] = {}
            for n in sorted(names):
                series.update(read_region_series(zf.read(n), area))
            mob[area] = mobility_interventions(weekly_means(series))
            raw[area] = raw_daily_series(series)

    return update_derived({"mobility": mob, "mobility_raw": raw},
                          path=out_path)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--zip", required=True)
    ap.add_argument("--areas", nargs="+", default=["HUS", "Turku"])
    args = ap.parse_args()
    d = import_zip(args.zip, args.areas)
    for area, ivs in d["mobility"].items():
        print(f"{area}: {len(ivs)} mobility interventions")


if __name__ == "__main__":
    main()
