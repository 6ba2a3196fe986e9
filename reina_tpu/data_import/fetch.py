"""Live-HTTP fetch layer for the data importers.

The reference pulls its observed datasets over HTTP at deploy time:
THL pivot cubes (``data_import/thl.py:10-75`` — URL construction with
row/column/filter params and a curl User-Agent, the pivot API rejects
default python UAs), the HS open-data hospitalization/death endpoints
(``data_import/hs.py:7-54``) and the Google COVID mobility ZIP with an
mtime-vs-Last-Modified freshness check (
``data_import/google_covid_mobility.py:11-35``), wired into the
container start by ``docker/docker-entrypoint.sh:5-6``.

This module is the rebuild's equivalent, stdlib-only (urllib):

  * URL builders that reproduce the reference's wire format exactly
    (``thl_pivot_url``: ``<base>/<path>.json?row=..&column=..&filter=..``).
  * ``fetch``: GET with bounded retry + exponential backoff (5xx and
    transport errors retry; other 4xx raise immediately).
  * Incremental refresh: a local cache directory with conditional GETs
    (``If-None-Match`` / ``If-Modified-Since`` → 304 keeps the cached
    payload) and a ``max_age`` freshness window that skips the network
    entirely — generalizing the reference's Last-Modified zip check to
    every dataset.
  * ``refresh_all``: the docker-entrypoint step — pull every dataset
    and hand each payload to the local parsers (thl/mobility/casefiles).

This environment has no network egress, so CI exercises the layer
against a loopback ``http.server`` (tests/test_fetch.py); against the
real endpoints the code path is identical.
"""
from __future__ import annotations

import email.utils
import hashlib
import json
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Dict, List, Optional, Sequence, Union

# Reference endpoints (data_import/thl.py:11-14, hs.py:9,45,
# google_covid_mobility.py:12)
THL_BASE_URL = "https://sampo.thl.fi/pivot/prod/fi/"
THL_CASE_PATH = "epirapo/covid19case/fact_epirapo_covid19case"
THL_VACC_PATH = "vaccreg/cov19cov/fact_cov19cov"
HS_CORONA_URL = ("https://w3qa5ydb4l.execute-api.eu-west-1.amazonaws.com"
                 "/prod/finnishCoronaData/v2")
HS_HOSPITAL_URL = ("https://w3qa5ydb4l.execute-api.eu-west-1.amazonaws.com"
                   "/prod/finnishCoronaHospitalData")
MOBILITY_ZIP_URL = ("https://www.gstatic.com/covid19/mobility/"
                    "Region_Mobility_Report_CSVs.zip")

# THL's pivot API serves a 403 to default python User-Agents; the
# reference spoofs curl (data_import/thl.py:17-19)
USER_AGENT = "curl/7.63.0"

_RETRYABLE_STATUS = {429, 500, 502, 503, 504}


class FetchError(RuntimeError):
    """A fetch failed after exhausting its retries."""


# THL cubes label areas by their long hcd name; map the framework's
# short area ids onto the labels to filter by (config/defaults.json)
AREA_LABELS = {
    "HUS": ("Helsingin ja Uudenmaan",),
    "Turku": ("Varsinais-Suomen",),
}


def thl_pivot_url(path: str,
                  rows: Union[str, Sequence[str]],
                  columns: Union[str, Sequence[str]],
                  filters: Union[str, Sequence[str], None] = None,
                  base_url: str = THL_BASE_URL) -> str:
    """Reproduce the reference's pivot-cube request URL
    (data_import/thl.py:52-70): ``<base><path>.json`` with comma-joined
    ``row``/``column`` (and optional ``filter``) query params."""
    if isinstance(rows, str):
        rows = [rows]
    if isinstance(columns, str):
        columns = [columns]
    params = [("row", ",".join(rows)), ("column", ",".join(columns))]
    if filters:
        if isinstance(filters, str):
            filters = [filters]
        params.append(("filter", ",".join(filters)))
    return base_url + path + ".json?" + urllib.parse.urlencode(params)


def thl_dimensions_url(path: str, base_url: str = THL_BASE_URL) -> str:
    """The cube's dimension-tree endpoint (data_import/thl.py:16,34-37)."""
    return base_url + path + ".dimensions.json"


def _cache_paths(cache_dir: str, url: str):
    key = hashlib.sha1(url.encode()).hexdigest()[:20]
    return (os.path.join(cache_dir, key + ".bin"),
            os.path.join(cache_dir, key + ".json"))


def _read_meta(meta_path: str) -> Optional[dict]:
    try:
        with open(meta_path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def fetch(url: str,
          cache_dir: Optional[str] = None,
          max_age: float = 6 * 3600.0,
          retries: int = 4,
          backoff: float = 0.5,
          timeout: float = 30.0,
          stale_ok: bool = False,
          headers: Optional[Dict[str, str]] = None,
          _sleep=time.sleep) -> bytes:
    """GET ``url`` with retry/backoff and optional incremental caching.

    With ``cache_dir`` set: a cached payload younger than ``max_age``
    seconds is returned without touching the network; otherwise the
    request carries ``If-None-Match``/``If-Modified-Since`` and a 304
    refreshes the cache's clock instead of re-downloading. With
    ``stale_ok``, an exhausted retry loop falls back to whatever cached
    payload exists (deploy resilience) instead of raising.

    Retries cover transport errors and {429, 5xx}; any other HTTP error
    raises immediately (a 403/404 won't fix itself)."""
    bin_path = meta_path = meta = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        bin_path, meta_path = _cache_paths(cache_dir, url)
        meta = _read_meta(meta_path)
        if (meta is not None and os.path.exists(bin_path)
                and time.time() - meta.get("fetched_at", 0) < max_age):
            with open(bin_path, "rb") as f:
                return f.read()

    req_headers = {"User-Agent": USER_AGENT}
    if headers:
        req_headers.update(headers)
    if meta is not None and os.path.exists(bin_path):
        if meta.get("etag"):
            req_headers["If-None-Match"] = meta["etag"]
        if meta.get("last_modified"):
            req_headers["If-Modified-Since"] = meta["last_modified"]

    last_err: Optional[Exception] = None
    for attempt in range(retries + 1):
        if attempt:
            _sleep(backoff * (2 ** (attempt - 1)))
        try:
            req = urllib.request.Request(url, headers=req_headers)
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                payload = resp.read()
                resp_headers = dict(resp.headers)
        except urllib.error.HTTPError as e:
            if e.code == 304 and meta is not None:
                meta["fetched_at"] = time.time()
                with open(meta_path, "w") as f:
                    json.dump(meta, f)
                with open(bin_path, "rb") as f:
                    return f.read()
            if e.code not in _RETRYABLE_STATUS:
                raise FetchError(f"GET {url} -> HTTP {e.code}") from e
            last_err = e
            continue
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            last_err = e
            continue
        if cache_dir:
            with open(bin_path, "wb") as f:
                f.write(payload)
            with open(meta_path, "w") as f:
                json.dump({
                    "url": url,
                    "fetched_at": time.time(),
                    "etag": resp_headers.get("ETag"),
                    "last_modified": resp_headers.get("Last-Modified"),
                }, f)
        return payload

    if stale_ok and bin_path and os.path.exists(bin_path):
        return open(bin_path, "rb").read()
    raise FetchError(
        f"GET {url} failed after {retries + 1} attempts: {last_err}")


def head_last_modified(url: str, timeout: float = 30.0) -> Optional[float]:
    """HEAD the URL and return its Last-Modified as a POSIX timestamp —
    the reference's freshness probe for the mobility ZIP
    (google_covid_mobility.py:17-26)."""
    req = urllib.request.Request(
        url, method="HEAD", headers={"User-Agent": USER_AGENT})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        lm = resp.headers.get("Last-Modified")
    if not lm:
        return None
    dt = email.utils.parsedate_to_datetime(lm)
    return dt.timestamp()


def download_mobility_zip(dest_path: str, url: str = MOBILITY_ZIP_URL,
                          timeout: float = 120.0, retries: int = 4,
                          _sleep=time.sleep) -> str:
    """Download the Google mobility ZIP iff the server copy is newer
    than the local file — the reference's mtime check verbatim
    (google_covid_mobility.py:16-34). Returns ``dest_path``."""
    try:
        remote_ts = head_last_modified(url, timeout=timeout)
    except (urllib.error.URLError, OSError) as e:
        raise FetchError(f"HEAD {url} failed: {e}") from e
    if remote_ts is not None and os.path.exists(dest_path):
        if remote_ts <= os.path.getmtime(dest_path):
            return dest_path
    payload = fetch(url, timeout=timeout, retries=retries, _sleep=_sleep)
    with open(dest_path, "wb") as f:
        f.write(payload)
    return dest_path


def refresh_all(cache_dir: str, area: str = "HUS",
                out_dir: Optional[str] = None,
                base_url: str = THL_BASE_URL,
                hs_hospital_url: str = HS_HOSPITAL_URL,
                mobility_url: str = MOBILITY_ZIP_URL,
                max_age: float = 6 * 3600.0) -> Dict[str, str]:
    """The docker-entrypoint refresh step (docker-entrypoint.sh:5-6):
    pull every observed dataset and run the local transformation over
    each payload. Returns {dataset: written path or 'cached'}.

    Fetches ride the incremental cache, so a crontab'd refresh only
    re-downloads what actually changed."""
    from . import mobility as mobility_mod
    from . import thl as thl_mod

    out_dir = out_dir or cache_dir
    os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}

    # THL weekly confirmed cases per hcd municipality (thl.py:123-127)
    cases_url = thl_pivot_url(
        THL_CASE_PATH, rows="hcdmunicipality2020-445222",
        columns="dateweek20200101-509030", base_url=base_url)
    cases_payload = fetch(cases_url, cache_dir=cache_dir, max_age=max_age)
    weekly = thl_mod.parse_weekly_cases(cases_payload)
    cases_out = os.path.join(out_dir, f"thl_cases_{area}.json")
    needles = [area.lower()] + [s.lower()
                                for s in AREA_LABELS.get(area, ())]
    with open(cases_out, "w") as f:
        json.dump({a: s for a, s in weekly.items()
                   if any(n in a.lower() for n in needles)}, f)
    written["thl_cases"] = cases_out

    # HS hospitalization series (hs.py:45-54)
    hosp_payload = fetch(hs_hospital_url, cache_dir=cache_dir,
                         max_age=max_age)
    hosp_out = os.path.join(out_dir, f"hs_hospital_{area}.json")
    rows = [r for r in json.loads(hosp_payload).get("hospitalised", [])
            if r.get("area") in (area, "Finland")]
    with open(hosp_out, "w") as f:
        json.dump(rows, f)
    written["hs_hospital"] = hosp_out

    # Google mobility ZIP -> weekly limit-mobility interventions,
    # merged into the derived npz archive (data/mobility.update_derived)
    zip_path = os.path.join(cache_dir, "Region_Mobility_Report_CSVs.zip")
    download_mobility_zip(zip_path, url=mobility_url)
    mob_out = os.path.join(out_dir, f"mobility_{area}.npz")
    mobility_mod.import_zip(zip_path, areas=[area], out_path=mob_out)
    written["mobility"] = mob_out
    return written


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Fetch observed datasets over HTTP (reference "
                    "docker-entrypoint refresh step)")
    ap.add_argument("--cache", default=".reina_fetch_cache")
    ap.add_argument("--out", default=None)
    ap.add_argument("--area", default="HUS")
    ap.add_argument("--max-age", type=float, default=6 * 3600.0)
    args = ap.parse_args(argv)
    written = refresh_all(args.cache, area=args.area, out_dir=args.out,
                          max_age=args.max_age)
    for k, v in written.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
