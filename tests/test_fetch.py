"""The live-HTTP fetch layer (data_import/fetch.py) against a loopback
http.server: URL construction matches the reference's wire format
(data_import/thl.py:52-70), retries recover from transient 5xx,
conditional GETs (ETag -> 304) serve the incremental-refresh path, the
freshness window skips the network, and the mobility ZIP download
honors Last-Modified (google_covid_mobility.py:16-34). No egress —
everything talks to 127.0.0.1."""
import email.utils
import io
import json
import os
import threading
import time
import urllib.parse
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from reina_tpu.data_import import fetch as F


class _Handler(BaseHTTPRequestHandler):
    server_version = "test"
    state = None  # set per-server: dict with payloads / counters

    def log_message(self, *a):  # quiet
        pass

    def _serve(self, method):
        st = self.state
        st["requests"].append((method, self.path,
                               dict(self.headers.items())))
        path = urllib.parse.urlparse(self.path).path
        route = st["routes"].get(path)
        if route is None:
            self.send_error(404)
            return
        fails_left = st["fail_counts"].get(path, 0)
        if fails_left > 0:
            st["fail_counts"][path] = fails_left - 1
            self.send_error(503)
            return
        etag = route.get("etag")
        if etag and self.headers.get("If-None-Match") == etag:
            self.send_response(304)
            self.end_headers()
            return
        body = route["body"]
        self.send_response(200)
        if etag:
            self.send_header("ETag", etag)
        if route.get("last_modified"):
            self.send_header("Last-Modified", route["last_modified"])
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if method == "GET":
            self.wfile.write(body)

    def do_GET(self):
        self._serve("GET")

    def do_HEAD(self):
        self._serve("HEAD")


@pytest.fixture()
def server():
    state = {"routes": {}, "fail_counts": {}, "requests": []}

    class H(_Handler):
        pass

    H.state = state
    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, state
    srv.shutdown()
    srv.server_close()


def test_thl_pivot_url_wire_format():
    url = F.thl_pivot_url(
        F.THL_CASE_PATH, rows="hcdmunicipality2020-445222",
        columns=["dateweek20200101-509030"],
        filters="measure-444833")
    parsed = urllib.parse.urlparse(url)
    assert parsed.path.endswith(
        "epirapo/covid19case/fact_epirapo_covid19case.json")
    q = urllib.parse.parse_qs(parsed.query)
    assert q["row"] == ["hcdmunicipality2020-445222"]
    assert q["column"] == ["dateweek20200101-509030"]
    assert q["filter"] == ["measure-444833"]
    # multi-value params comma-join like the reference's ','.join
    url2 = F.thl_pivot_url("p", rows=["a", "b"], columns="c")
    assert "row=" + urllib.parse.quote("a,b") in url2
    assert F.thl_dimensions_url("p").endswith("p.dimensions.json")


def test_fetch_retries_transient_5xx(server):
    base, state = server
    state["routes"]["/data"] = {"body": b"payload"}
    state["fail_counts"]["/data"] = 2
    out = F.fetch(base + "/data", retries=3, _sleep=lambda s: None)
    assert out == b"payload"
    # curl UA rides every request (THL rejects python UAs)
    assert all(h.get("User-Agent") == F.USER_AGENT
               for _, _, h in state["requests"])


def test_fetch_gives_up_and_raises(server):
    base, state = server
    state["routes"]["/data"] = {"body": b"x"}
    state["fail_counts"]["/data"] = 99
    with pytest.raises(F.FetchError, match="failed after 3 attempts"):
        F.fetch(base + "/data", retries=2, _sleep=lambda s: None)


def test_fetch_404_raises_immediately(server):
    base, state = server
    with pytest.raises(F.FetchError, match="HTTP 404"):
        F.fetch(base + "/missing", retries=5, _sleep=lambda s: None)
    assert len(state["requests"]) == 1  # no retries on a hard 4xx


def test_incremental_cache_304_and_freshness(server, tmp_path):
    base, state = server
    state["routes"]["/cube"] = {"body": b"v1", "etag": '"tag1"'}
    cache = str(tmp_path / "cache")

    assert F.fetch(base + "/cube", cache_dir=cache) == b"v1"
    n0 = len(state["requests"])

    # within max_age: served from disk, no request at all
    assert F.fetch(base + "/cube", cache_dir=cache, max_age=3600) == b"v1"
    assert len(state["requests"]) == n0

    # past max_age: conditional GET -> 304 -> cached payload survives
    assert F.fetch(base + "/cube", cache_dir=cache, max_age=0) == b"v1"
    assert len(state["requests"]) == n0 + 1
    assert state["requests"][-1][2].get("If-None-Match") == '"tag1"'

    # content change under the same URL: 200 replaces the cache
    state["routes"]["/cube"] = {"body": b"v2", "etag": '"tag2"'}
    assert F.fetch(base + "/cube", cache_dir=cache, max_age=0) == b"v2"
    assert F.fetch(base + "/cube", cache_dir=cache, max_age=3600) == b"v2"


def test_stale_ok_serves_cache_when_origin_dies(server, tmp_path):
    base, state = server
    state["routes"]["/d"] = {"body": b"good"}
    cache = str(tmp_path / "c")
    assert F.fetch(base + "/d", cache_dir=cache) == b"good"
    state["fail_counts"]["/d"] = 99
    assert F.fetch(base + "/d", cache_dir=cache, max_age=0, retries=1,
                   stale_ok=True, _sleep=lambda s: None) == b"good"
    with pytest.raises(F.FetchError):
        F.fetch(base + "/d", cache_dir=cache, max_age=0, retries=1,
                stale_ok=False, _sleep=lambda s: None)


def _mobility_zip_bytes():
    buf = io.BytesIO()
    rows = ["country_region_code,sub_region_1,sub_region_2,date,"
            "retail_and_recreation_percent_change_from_baseline,"
            "grocery_and_pharmacy_percent_change_from_baseline,"
            "parks_percent_change_from_baseline,"
            "transit_stations_percent_change_from_baseline,"
            "workplaces_percent_change_from_baseline,"
            "residential_percent_change_from_baseline"]
    for i, day in enumerate("2020-03-%02d" % d for d in range(1, 29)):
        rows.append(f"FI,Uusimaa,,{day},-{10 + i},-5,-1,-{20 + i},-{15 + i},4")
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("2020_FI_Region_Mobility_Report.csv",
                    "\n".join(rows))
    return buf.getvalue()


def test_mobility_zip_last_modified_skip(server, tmp_path):
    base, state = server
    body = _mobility_zip_bytes()
    lm = email.utils.formatdate(time.time() - 86400, usegmt=True)
    state["routes"]["/mob.zip"] = {"body": body, "last_modified": lm}

    dest = str(tmp_path / "mob.zip")
    out = F.download_mobility_zip(dest, url=base + "/mob.zip")
    assert out == dest and open(dest, "rb").read() == body
    n0 = len(state["requests"])

    # local file newer than origin: HEAD only, no re-download
    F.download_mobility_zip(dest, url=base + "/mob.zip")
    assert len(state["requests"]) == n0 + 1
    assert state["requests"][-1][0] == "HEAD"


def test_refresh_all_end_to_end(server, tmp_path):
    """The docker-entrypoint step against loopback endpoints: THL cube
    JSON-stat payload -> parsed weekly cases; HS hospital JSON filtered
    to the area; mobility ZIP -> derived interventions file."""
    base, state = server

    cube = {"dataset": {
        "dimension": {
            "id": ["hcdmunicipality2020", "dateweek20200101"],
            "size": [1, 2],
            "hcdmunicipality2020": {"category": {
                "index": {"HUS": 0},
                "label": {"HUS": "Helsingin ja Uudenmaan SHP"}}},
            "dateweek20200101": {"category": {
                "index": {"w1": 0, "w2": 1},
                "label": {"w1": "Vuosi 2020 Viikko 10",
                          "w2": "Vuosi 2020 Viikko 11"}}},
        },
        "value": {"0": 12, "1": 30},
    }}
    state["routes"][
        "/epirapo/covid19case/fact_epirapo_covid19case.json"] = {
        "body": json.dumps(cube).encode()}
    hosp = {"hospitalised": [
        {"date": "2020-03-20", "area": "HUS", "dead": 1, "inIcu": 4,
         "inWard": 10, "totalHospitalised": 14},
        {"date": "2020-03-20", "area": "KYS", "dead": 0, "inIcu": 1,
         "inWard": 2, "totalHospitalised": 3},
    ]}
    state["routes"]["/hosp"] = {"body": json.dumps(hosp).encode()}
    lm = email.utils.formatdate(time.time() - 3600, usegmt=True)
    state["routes"]["/mob.zip"] = {"body": _mobility_zip_bytes(),
                                   "last_modified": lm}

    cache = str(tmp_path / "cache")
    out = str(tmp_path / "out")
    written = F.refresh_all(
        cache, area="HUS", out_dir=out, base_url=base + "/",
        hs_hospital_url=base + "/hosp", mobility_url=base + "/mob.zip")

    cases = json.load(open(written["thl_cases"]))
    assert any("Uudenmaan" in k for k in cases)
    series = next(iter(cases.values()))
    assert sorted(series.values()) == [12.0, 30.0]

    hosp_rows = json.load(open(written["hs_hospital"]))
    assert [r["area"] for r in hosp_rows] == ["HUS"]

    import numpy as np
    z = np.load(written["mobility"], allow_pickle=False)
    mob = json.loads(str(z["json_blob"]))
    assert "mobility" in mob and "HUS" in mob["mobility"]
    ivs = mob["mobility"]["HUS"]
    assert ivs and all(iv[0] == "limit-mobility" for iv in ivs)
