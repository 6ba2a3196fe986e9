"""Offline data-import ETL (reference: data_import/).

The reference pulls THL (cases, vaccinations), HS open data
(hospitalizations/deaths) and the Google COVID mobility ZIP at deploy
time. This environment has no network egress, so each importer exposes
its *transformation* as a pure function over a local payload (file path
or bytes) plus a CLI that writes the framework's compact datasets:

  python -m reina_tpu.data_import.mobility --zip <Region_Mobility.zip>
  python -m reina_tpu.data_import.thl --cases <pivot.json> --area HUS
"""
