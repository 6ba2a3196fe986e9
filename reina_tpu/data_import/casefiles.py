"""Compose per-area casefiles (reference: data_import/fi_cases.py,
data_import/hs.py, data_import/turku.py).

Municipality-level observed series are built by joining THL weekly
confirmed cases with catchment-area hospitalization/death series
(HS open data in the reference), downscaling the catchment numbers by
the municipality's share of confirmed cases — the reference's approach
for Turku inside Varsinais-Suomi.
"""
from __future__ import annotations

import argparse
import csv
import io
import json
import os
from typing import Dict, List

import numpy as np


def downscale_catchment(catchment_rows: List[dict], muni_weekly: Dict[str, float],
                        catchment_weekly: Dict[str, float]) -> List[dict]:
    """Scale a catchment area's hospital series to one municipality by
    the ratio of confirmed cases, per date (reference fi_cases.py:10-57)."""
    out = []
    for r in catchment_rows:
        d = r["date"]
        week = max((w for w in muni_weekly if w <= d), default=None)
        if week is None:
            continue
        c_muni = muni_weekly.get(week, 0.0)
        c_catch = catchment_weekly.get(week, 0.0)
        ratio = (c_muni / c_catch) if c_catch else 0.0
        out.append(dict(
            date=d,
            dead=int(round(float(r["dead"]) * ratio)),
            in_icu=int(round(float(r["in_icu"]) * ratio)),
            in_ward=int(round(float(r["in_ward"]) * ratio)),
            hospitalized=int(round(float(r["hospitalized"]) * ratio)),
            confirmed=int(round(c_muni)),
        ))
    return out


def write_casefile(area: str, rows: List[dict]) -> None:
    """Append/replace an area's series in the cases.npz archive."""
    from ..data.loaders import FILES_DIR, _cases

    path = os.path.join(FILES_DIR, "cases.npz")
    areas, blobs = [], []
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        for a, b in zip(z["areas"], z["csv_blobs"]):
            if str(a) != area:
                areas.append(str(a))
                blobs.append(str(b))
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=[
        "date", "dead", "in_icu", "in_ward", "hospitalized", "confirmed"])
    w.writeheader()
    for r in rows:
        w.writerow(r)
    areas.append(area)
    blobs.append(buf.getvalue())
    np.savez_compressed(path, areas=np.array(areas),
                        csv_blobs=np.array(blobs))
    _cases.cache_clear()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--area", required=True)
    ap.add_argument("--catchment-csv", required=True,
                    help="CSV with date,dead,in_icu,in_ward,hospitalized")
    ap.add_argument("--muni-weekly-json", required=True,
                    help='{"<week-start>": confirmed} for the municipality')
    ap.add_argument("--catchment-weekly-json", required=True)
    args = ap.parse_args()
    with open(args.catchment_csv) as f:
        rows = list(csv.DictReader(f))
    muni = json.load(open(args.muni_weekly_json))
    catch = json.load(open(args.catchment_weekly_json))
    out = downscale_catchment(rows, muni, catch)
    write_casefile(args.area, out)
    print(f"{args.area}: {len(out)} casefile rows written")


if __name__ == "__main__":
    main()
