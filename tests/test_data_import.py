"""Offline data-import transforms on synthetic fixtures."""
import io
import json
import zipfile

import numpy as np

from reina_tpu.data_import.casefiles import downscale_catchment
from reina_tpu.data_import.jsonstat import parse
from reina_tpu.data_import.mobility import (mobility_interventions,
                                            read_region_series, weekly_means)
from reina_tpu.data_import.thl import (parse_weekly_cases,
                                       vaccination_interventions,
                                       week_label_to_date)


def test_jsonstat_parse():
    payload = {
        "dataset": {
            "dimension": {
                "id": ["area", "week"],
                "size": [2, 2],
                "area": {"category": {
                    "index": {"a1": 0, "a2": 1},
                    "label": {"a1": "Helsinki", "a2": "Turku"}}},
                "week": {"category": {
                    "index": {"w1": 0, "w2": 1},
                    "label": {"w1": "Vuosi 2020 Viikko 10",
                              "w2": "Vuosi 2020 Viikko 11"}}},
            },
            "value": {"0": 5, "1": 7, "3": 2},
        }
    }
    rows = parse(payload)
    assert len(rows) == 4
    assert rows[0] == {"area": "Helsinki", "week": "Vuosi 2020 Viikko 10",
                       "value": 5}
    assert rows[2]["value"] is None  # sparse value map


def test_week_labels_and_cases():
    assert week_label_to_date("Vuosi 2020 Viikko 10") == "2020-03-02"
    payload = {
        "dataset": {
            "dimension": {
                "id": ["hcdmunicipality2020", "dateweek20200101"],
                "size": [1, 2],
                "hcdmunicipality2020": {"category": {
                    "index": {"m1": 0}, "label": {"m1": "Turku"}}},
                "dateweek20200101": {"category": {
                    "index": {"w1": 0, "w2": 1},
                    "label": {"w1": "Vuosi 2020 Viikko 10",
                              "w2": "Vuosi 2020 Viikko 11"}}},
            },
            "value": [4, 9],
        }
    }
    cases = parse_weekly_cases(payload)
    assert cases == {"Turku": {"2020-03-02": 4.0, "2020-03-09": 9.0}}


def test_mobility_pipeline():
    header = ("country_region_code,country_region,sub_region_1,sub_region_2,"
              "metro_area,iso_3166_2_code,census_fips_code,place_id,date,"
              "retail_and_recreation_percent_change_from_baseline,"
              "grocery_and_pharmacy_percent_change_from_baseline,"
              "parks_percent_change_from_baseline,"
              "transit_stations_percent_change_from_baseline,"
              "workplaces_percent_change_from_baseline,"
              "residential_percent_change_from_baseline")
    rows = [header]
    import datetime
    d0 = datetime.date(2020, 3, 9)
    for i in range(28):
        d = d0 + datetime.timedelta(days=i)
        wave = -40 - (i // 7) * 10
        rows.append(f"FI,Finland,Uusimaa,,,,,,{d.isoformat()},"
                    f"{wave},0,0,{wave + 5},{wave + 10},5")
    csv_bytes = "\n".join(rows).encode()
    series = read_region_series(csv_bytes, "HUS")
    assert len(series) == 28
    weekly = weekly_means(series)
    ivs = mobility_interventions(weekly)
    assert ivs, "expected limit-mobility interventions"
    for iv in ivs:
        assert iv[0] == "limit-mobility"
        assert iv[2] > 0
        assert iv[5] in ("leisure", "work", "transport")
    # declining mobility should produce increasing reductions per place
    leisure = [iv[2] for iv in ivs if iv[5] == "leisure"]
    assert leisure == sorted(leisure)


def test_vaccination_interventions():
    rows = [
        dict(area="Turku", age="20-39", week="2021-01-04", vaccinations=700),
        dict(area="Turku", age="80+", week="2021-01-04", vaccinations=140),
        dict(area="HUS", age="80+", week="2021-01-04", vaccinations=999),
    ]
    ivs = vaccination_interventions(rows, "Turku")
    assert ["vaccinate", "2021-01-04", 700, 20, 39] in ivs
    assert ["vaccinate", "2021-01-04", 140, 80, None] in ivs
    assert all(iv[2] != 999 for iv in ivs)


def test_downscale_catchment():
    catchment = [
        dict(date="2020-03-10", dead=10, in_icu=4, in_ward=20, hospitalized=24),
    ]
    muni = {"2020-03-09": 25.0}
    catch = {"2020-03-09": 100.0}
    out = downscale_catchment(catchment, muni, catch)
    assert out == [dict(date="2020-03-10", dead=2, in_icu=1, in_ward=5,
                        hospitalized=6, confirmed=25)]


def test_derived_ivs_end_to_end(tmp_path, monkeypatch):
    """ETL → derived_ivs.npz → get_active_interventions folds the
    derived limit-mobility/vaccinate events in (reference
    calc/datasets.py:176-275, common/interventions.py:342-376)."""
    import csv as csvmod
    import io
    import zipfile

    import reina_tpu.data.mobility as dmob
    from reina_tpu.config.interventions import get_active_interventions
    from reina_tpu.config.variables import VariableStore
    from reina_tpu.data.etl import import_derived

    src = tmp_path / "src"
    src.mkdir()

    # tiny 2020 FI mobility report: deep drop from mid-March (Uusimaa
    # region rows map to the HUS area)
    cols = ["date", "sub_region_1", "sub_region_2",
            "retail_and_recreation_percent_change_from_baseline",
            "workplaces_percent_change_from_baseline",
            "transit_stations_percent_change_from_baseline"]
    buf = io.StringIO()
    w = csvmod.DictWriter(buf, fieldnames=cols)
    w.writeheader()
    from datetime import date, timedelta
    d = date(2020, 3, 1)
    while d < date(2020, 4, 26):
        drop = -40 if d >= date(2020, 3, 16) else -2
        w.writerow({"date": d.isoformat(), "sub_region_1": "Uusimaa",
                    "sub_region_2": "",
                    cols[3]: drop, cols[4]: drop, cols[5]: drop})
        d += timedelta(days=1)
    with zipfile.ZipFile(src / "Region_Mobility_Report_CSVs.zip", "w") as zf:
        zf.writestr("2020_FI_Region_Mobility_Report.csv", buf.getvalue())

    # weekly vaccination counts; the latest week must be dropped
    with open(src / "fi_vaccinations.csv", "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["area", "date", "20-39", "80+"])
        w.writerow(["HUS", "2021-01-04", "700", "140"])
        w.writerow(["HUS", "2021-01-11", "800", "150"])
        w.writerow(["HUS", "2021-01-18", "999", "999"])  # incomplete

    def iv_keys(ivs):
        return {(iv.type, iv.date,
                 tuple(sorted((k, getattr(v, "id", v))
                              for k, v in iv.values.items())))
                for iv in ivs}

    store = VariableStore()
    baseline = iv_keys(get_active_interventions(store.copy_all()))

    out_npz = tmp_path / "derived_ivs.npz"
    monkeypatch.setattr(dmob, "DERIVED_PATH", str(out_npz))
    dmob._derived.cache_clear()
    try:
        import_derived(str(src))
        assert out_npz.exists()

        extra = iv_keys(get_active_interventions(store.copy_all())) - baseline
        mob = [e for e in extra if e[0] == "limit-mobility"]
        vac = [e for e in extra if e[0] == "vaccinate"]
        assert mob, "derived limit-mobility events missing"
        assert {dict(e[2]).get("place") for e in mob} == {
            "leisure", "work", "transport"}
        assert vac, "derived vaccinate events missing"
        assert {e[1] for e in vac} == {"2021-01-04", "2021-01-11"}
        # the incomplete latest week was dropped
        assert not any(e[1] == "2021-01-18" for e in vac)
    finally:
        dmob._derived.cache_clear()
