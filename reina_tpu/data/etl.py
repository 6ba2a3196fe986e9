"""One-time data import: build the framework's compact datasets.

The reference ships raw upstream datasets (Statistics Finland
population CSV, POLYMOD contact matrices, THL case files, a
municipality→healthcare-district Excel sheet; see reference
calc/datasets.py). We import those sources once and store compact
``.npz`` archives under ``reina_tpu/data/files/``; runtime code never
touches the raw sources.

Run:  python -m reina_tpu.data.etl [--source DIR]
"""
from __future__ import annotations

import argparse
import csv
import io
import os

import numpy as np

from .xls import read_xls

FILES_DIR = os.path.join(os.path.dirname(__file__), "files")
DEFAULT_SOURCE = os.environ.get("REINA_SOURCE_DATA", "/root/reference/data")

MAX_AGE = 100
PLACES = ("home", "work", "school", "transport", "leisure", "other")


def import_population(source: str) -> None:
    """Population by municipality and 1-year age group.

    Source format (reference calc/datasets.py:19-37): Statistics Finland
    CSV, iso8859-1, two header junk lines, ';'-separated, columns for
    area, age, male/female/total counts. We keep (area, age) → male,female.
    """
    path = os.path.join(source, "005_11re_2019.csv")
    with open(path, "r", encoding="iso8859-1") as f:
        f.readline()
        f.readline()
        rows = list(csv.reader(f, delimiter=";", quotechar='"'))
    header = rows[0]
    col = {name: i for i, name in enumerate(header)}
    area_c = col["Alue"]
    age_c = col["Ikä"]
    male_c = next(i for n, i in col.items() if n.startswith("Miehet"))
    female_c = next(i for n, i in col.items() if n.startswith("Naiset"))

    table: dict = {}
    for r in rows[1:]:
        area, age = r[area_c], r[age_c]
        if area == "KOKO MAA" or age == "Yhteensä":
            continue
        age_i = int(age.replace("100 -", "100"))
        table.setdefault(area, np.zeros((MAX_AGE + 1, 2), dtype=np.int32))
        table[area][age_i, 0] += int(r[male_c])
        table[area][age_i, 1] += int(r[female_c])

    munis = sorted(table)
    pop = np.stack([table[m] for m in munis])

    # Healthcare-district membership (sheet read per reference
    # calc/datasets.py:41-45: sheet 'shp_jäsenkunnat_2020_lkm', header row 3)
    cells = read_xls(os.path.join(source, "shp_jasenkunnat_2020.xls"))
    sheet = next(v for k, v in cells.items() if "lkm" in k)
    hdr_row = 3
    hdr = {sheet.get((hdr_row, c)): c for c in range(10)}
    memb = []
    for row in sorted({r for (r, c) in sheet if r > hdr_row}):
        kunta = sheet.get((row, hdr["kunta"]))
        shp = sheet.get((row, hdr["sairaanhoitopiiri"]))
        erva = sheet.get((row, hdr["erva-alue"]))
        if kunta and shp and erva:
            memb.append((str(kunta), str(shp), str(erva)))

    np.savez_compressed(
        os.path.join(FILES_DIR, "population.npz"),
        munis=np.array(munis),
        pop=pop,
        district_muni=np.array([m[0] for m in memb]),
        district_name=np.array([m[1] for m in memb]),
        district_erva=np.array([m[2] for m in memb]),
    )


def import_contacts(source: str) -> None:
    """POLYMOD daily contact counts: (place, participant-band, contact-band).

    Source format (reference calc/datasets.py:64-79 + data/contact_matrix.csv):
    rows per (country, cnt_<place>, participant band), columns per contact
    band. We keep the FI slice as a dense (P, B, B) tensor plus band edges.
    """
    path = os.path.join(source, "contact_matrix.csv")
    with open(path, "r") as f:
        rows = list(csv.reader(f))
    header = rows[0]
    band_cols = header[3:]

    def parse_band(s: str):
        if s.endswith("+"):
            return (int(s[:-1]), MAX_AGE)
        lo, hi = s.split("-")
        return (int(lo), int(hi))

    bands = [parse_band(b) for b in band_cols]
    by_place: dict = {}
    pbands_seen = []
    for r in rows[1:]:
        if r[0] != "FI":
            continue
        place = r[1].replace("cnt_", "").replace("otherplace", "other")
        pband = parse_band(r[2])
        if pband not in pbands_seen:
            pbands_seen.append(pband)
        by_place.setdefault(place, {})[pband] = np.array([float(x) for x in r[3:]])

    assert set(by_place) == set(PLACES), sorted(by_place)
    assert pbands_seen == bands, (pbands_seen, bands)
    tensor = np.stack([
        np.stack([by_place[p][b] for b in bands]) for p in PLACES
    ])  # (P, B_participant, B_contact)

    np.savez_compressed(
        os.path.join(FILES_DIR, "contacts.npz"),
        values=tensor,
        places=np.array(PLACES),
        band_lo=np.array([b[0] for b in bands], dtype=np.int32),
        band_hi=np.array([b[1] for b in bands], dtype=np.int32),
    )


def import_cases(source: str) -> None:
    """Observed case/hospitalization series per area (validation data).

    Source format (reference calc/datasets.py:82-103): per-area CSV with
    date,dead,in_icu,in_ward,hospitalized,confirmed columns.
    """
    areas = {
        "HUS": "hosp_cases_hus.csv",
        "Varsinais-Suomi": "hosp_cases_varsinais-suomi.csv",
        "Turku": "hosp_cases_turku.csv",
    }
    names, blobs = [], []
    for area, fn in areas.items():
        path = os.path.join(source, fn)
        if not os.path.exists(path):
            continue
        with open(path, "r") as f:
            rows = list(csv.reader(f))
        header = rows[0]
        out = io.StringIO()
        w = csv.writer(out)
        w.writerow(header)
        for r in rows[1:]:
            if r:
                w.writerow(r)
        names.append(area)
        blobs.append(out.getvalue())
    np.savez_compressed(
        os.path.join(FILES_DIR, "cases.npz"),
        areas=np.array(names),
        csv_blobs=np.array(blobs),
    )


DERIVED_AREAS = ("HUS", "Varsinais-Suomi", "Turku")


def import_vaccinations_csv(path: str, areas=DERIVED_AREAS,
                            out_path: str = None) -> dict:
    """``fi_vaccinations.csv`` (area,date,<age-band> columns of weekly
    counts) → ``vaccinate`` intervention tuples, reference semantics
    (calc/datasets.py:251-275): NaN→0, drop the incomplete last week,
    one tuple per (week, age band)."""
    from .mobility import DERIVED_PATH, update_derived

    out_path = out_path or DERIVED_PATH
    with open(path, "r") as f:
        rows = list(csv.DictReader(f))

    update: dict = {}
    for area in areas:
        area_rows = sorted((r for r in rows if r.get("area") == area),
                           key=lambda r: r["date"])
        area_rows = area_rows[:-1]  # incomplete latest week
        band_cols = [c for c in (area_rows[0] if area_rows else {})
                     if c not in ("area", "date")]
        ivs = []
        for col in band_cols:
            if "-" in col:
                lo, hi = (int(x) for x in col.split("-"))
            elif col.endswith("+"):
                lo, hi = int(col[:-1]), None
            else:
                continue
            for r in area_rows:
                val = float(r.get(col) or 0)
                ivs.append(["vaccinate", r["date"], int(val), lo, hi])
        if area_rows:
            update[area] = ivs
    return update_derived({"vaccinations": update}, path=out_path)


def import_derived(source: str) -> None:
    """Produce data/files/derived_ivs.npz from whichever derived-data
    sources are present in the source dir: a Google Community Mobility
    report ZIP and/or the THL ``fi_vaccinations.csv``. The reference
    fetches both with an online ETL at deploy time (Dockerfile hooks);
    in an offline build they may be absent, in which case the archive
    simply isn't produced and the variable-defined intervention
    calendar stands alone."""
    import glob

    from ..data_import.mobility import import_zip

    zips = (glob.glob(os.path.join(source, "*Region_Mobility_Report*.zip"))
            + glob.glob(os.path.join(source, "Global_Mobility_Report.zip")))
    if zips:
        d = import_zip(zips[0], list(DERIVED_AREAS))
        for area, ivs in d.get("mobility", {}).items():
            print(f"derived mobility[{area}]: {len(ivs)} interventions")
    vacc = os.path.join(source, "fi_vaccinations.csv")
    if os.path.exists(vacc):
        d = import_vaccinations_csv(vacc)
        for area, ivs in d.get("vaccinations", {}).items():
            print(f"derived vaccinations[{area}]: {len(ivs)} interventions")
    if not zips and not os.path.exists(vacc):
        print("no derived-data sources found (mobility ZIP / "
              "fi_vaccinations.csv); skipping derived_ivs.npz")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", default=DEFAULT_SOURCE)
    args = ap.parse_args()
    os.makedirs(FILES_DIR, exist_ok=True)
    import_population(args.source)
    import_contacts(args.source)
    import_cases(args.source)
    import_derived(args.source)
    print("datasets written to", FILES_DIR)


if __name__ == "__main__":
    main()
