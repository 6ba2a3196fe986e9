"""Tiny i18n layer (reference: common/locale.py + locale/ PO files).

The reference uses flask-babel with Finnish translations. We keep the
same gettext-shaped API with an in-package translation table so label
lookups work without Flask. English is the source language; Finnish
translations cover the strings surfaced by the APIs.
"""
from __future__ import annotations

import threading

DEFAULT_LOCALE = "en"
_local = threading.local()

# Finnish translations for user-facing strings (subset mirroring locale/fi).
_FI = {
    "Home": "Koti",
    "Work": "Työpaikka",
    "School": "Koulu",
    "Transport": "Liikenne",
    "Leisure": "Vapaa-aika",
    "Other": "Muu",
    "years": "vuotta",
    "persons/week": "henkilöä/viikko",
    "infections": "tartuntaa",
    "infections/week": "tartuntaa/viikko",
    "beds": "vuodepaikkaa",
    "ICU units": "tehohoitopaikkaa",
    "residents": "asukasta",
    "cases": "tapausta",
    "cases (cum.)": "tapausta (kum.)",
    "beds in use": "vuodepaikkaa käytössä",
    "ICU units in use": "tehohoitopaikkaa käytössä",
    "deaths (cum.)": "kuolemaa (kum.)",
    "Test all patients with symptoms": "Testataan kaikki oireiset",
    "Test people only with severe symptoms": "Testataan vain vakavasti oireilevat",
    "Test all with symptoms and perform contact tracing":
        "Testataan kaikki oireiset ja jäljitetään kontaktit",
    "Limit population mobility": "Rajoitetaan väestön liikkuvuutta",
    "People wear masks": "Käytetään kasvomaskeja",
    "Vaccinate people against disease": "Rokotetaan väestöä",
    "Import infections from outside the area": "Tartuntoja alueen ulkopuolelta",
    "Import infections from outside the area every week":
        "Tartuntoja alueen ulkopuolelta viikoittain",
    "Build new hospital beds": "Rakennetaan uusia sairaalapaikkoja",
    "Build new ICU units": "Rakennetaan uusia tehohoitopaikkoja",
    "Susceptible": "Alttiit",
    "Vaccinated": "Rokotetut",
    "Active infections": "Aktiiviset tartunnat",
    "Total infections (cum.)": "Tartunnat yhteensä (kum.)",
    "New daily infections (14 day avg.)": "Uudet tartunnat päivässä (14 pv ka.)",
    "Detected cases (14 day avg.)": "Havaitut tapaukset (14 pv ka.)",
    "Detected cases": "Havaitut tapaukset",
    "In hospital ward": "Vuodeosastolla",
    "In ICU": "Tehohoidossa",
    "Dead": "Kuolleet",
    "Recovered": "Parantuneet",
    "Available hospital beds": "Vapaat sairaalapaikat",
    "Available ICU units": "Vapaat tehohoitopaikat",
    "Reproductive number (Rₜ)": "Tartuttavuusluku (Rₜ)",
    "Infection fatality ratio (IFR)": "Tartuntakuolleisuus (IFR)",
    "Case fatality ratio (CFR)": "Tapauskuolleisuus (CFR)",
}

TRANSLATIONS = {"fi": _FI, "en": {}}


def set_active_locale(locale: str) -> None:
    _local.locale = locale


def get_active_locale() -> str:
    return getattr(_local, "locale", DEFAULT_LOCALE)


def gettext(msg: str) -> str:
    table = TRANSLATIONS.get(get_active_locale(), {})
    return table.get(msg, msg)


_ = gettext
