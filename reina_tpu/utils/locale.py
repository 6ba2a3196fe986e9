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
    # full coverage of the reference's fi catalogue
    # (locale/fi/LC_MESSAGES/messages.po) for strings our APIs surface
    "Region Name": "Alueen nimi",
    "Region Population": "Alueen väkiluku",
    "Date": "Päivämäärä",
    "Event": "Tapahtuma",
    "Value": "Arvo",
    "Add a new event: ": "Lisää uusi tapahtuma: ",
    "value": "arvo",
    "Add": "Lisää",
    "Restore default events": "Palauta oletustapahtumat",
    "Settings": "Asetukset",
    "Disease Parameters": "Taudin parametrit",
    "Region Details": "Alueen tiedot",
    "Timeframe": "Simuloitava aika",
    "Run simulation": "Suorita simulaatio",
    "Outcome": "Tulos",
    "Scenario": "Skenaario",
    "Preset": "Valmiit asetukset",
    "Percentage of mild cases that are detected":
        "Osuus miedoista tautitapauksista, jotka havaitaan",
    "Percentage of infectors that are caught through contact tracing":
        "Tartuntaketjun osuus, joka saadaan jäljityksellä kiinni",
    "Reduction in contacts": "Vähennys kontakteissa",
    "Minimum age for limitation": "Pienin ikä, jota rajoitus koskee",
    "Maximum age for limitation": "Suurin ikä, jota rajoitus koskee",
    "Place where the contacts happen": "Paikka jossa kontaktit tapahtuvat",
    "Portion of daily contacts where masks are in use":
        "Osuus päivittäisistä lähikontakteissa jossa maskia käytetään",
    "Minimum age for intervention": "Pienin ikä, johon interventio vaikuttaa",
    "Maximum age for intervention": "Suurin ikä, johon interventio vaikuttaa",
    "Place where intervention happens": "Interventio tapahtumapaikka",
    "Number of people vaccinated weekly": "Rokotusten määrä viikottain",
    "Amount of new infections": "Uusien infektioiden lukumäärä",
    "Variant of the disease": "Taudin variantti",
    "Amount of new weekly infections":
        "Uusien infektioiden lukumäärä viikossa",
    "Number of new beds built": "Uusien sairaansijojen lukumäärä",
    "Number of new ICU units built": "Uusien tehohoitoyksiköiden lukumäärä",
    "Change in mobility compared to baseline":
        "Muutos liikkuvuudessa vertailuajanjaksoon suhteutettuna",
    "Retail and recreation": "Ostokset ja vapaa-aika",
    "Grocery and pharmacy": "Ruokakaupat ja apteekit",
    "Parks": "Puistot",
    "Transit stations": "Joukkoliikennepysäkit",
    "Workplaces": "Työpaikat",
    "Residential": "Asuinrakennukset",
    "Asymptomatic": "Oireeton",
    "Mild": "Lievä",
    "Severe": "Vakava",
    "Critical": "Kriittinen",
    "Fatal": "Fataali",
    "Incubation period": "Itämisaika",
    "Illness period": "Oireiluaika",
    "Duration of regular hospital treatment": "Osastohoitojakson kesto",
    "Duration of ICU treatment": "Tehohoitojakson kesto",
    "days": "päivää",
    "Symptom severity": "Oireiden vakavuus",
    "Contacts per day": "Lähikontaktia päivässä",
    "number of contacts": "kontaktien lukumäärä",
    "Infectiousness over time": "Tarttuvuus ajan kuluessa",
    "Day of illness": "Sairauspäivä",
    "Ratio of all infected people who remain asymptomatic":
        "Osuus tartunnan saaneista, jotka jäävät oireettomiksi",
    "Relative infectiousness of asymptomatic cases":
        "Oireettomien tapausten suhteellinen tarttuvuus",
    "Probability of dying if severe symptoms and no hospital beds are available":
        "Todennäköisyys kuolla, jos potilaalla on vakavat oireet eikä "
        "sairaalahoitoa ole vapaana",
    "Probability of dying if no ICU units are available":
        "Tehohoitoa tarvitsevien osuus, joka kuolee jos tehohoitopaikkaa "
        "ei ole vapaana",
    "Mean incubation period length": "Keskimääräinen inkubaatioaika",
    "Mean duration from symptom onset to recovery":
        "Keskimääräinen aika oireiden alkamisesta toipumiseen",
    "Mean duration from symptom onset to death":
        "Keskimääräinen aika oireiden alkamisesta kuolemaan",
    "Ratio of time before hospitalization":
        "Osuus sairastamisajasta ennen osastohoitoa",
    "Ratio of time in ward before ICU care":
        "Osuus sairastamisajasta osastohoidossa ennen tehohoitoa",
    "People who are a- or presymptomatic at simulation start":
        "Oireettomat tai esioireiset henkilöt simulaation alussa",
    "People who are ill with symptoms at simulation start":
        "Oireilevat henkilöt simulaation alussa",
    "People who have recovered from infection at simulation start":
        "Infektiosta toipuneet henkilöt simulaation alussa",
    "Description": "Kuvaus",
    "Restore defaults": "Palauta oletukset",
    "Distributions": "Jakaumat",
    "Distributions based on model parameters":
        "Mallin oletusten mukaiset jakaumat",
    "Age of person": "Henkilön ikä",
    "Hospitalized": "Sairaalassa",
    "(cum.)": "(kum.)",
    "(simulated)": "(simuloitu)",
    "(real)": "(todellinen)",
    "Validation": "Vertailu toteumaan",
    "Testing": "Testaus",
    "Limit mass gatherings": "Rajoitetaan kokoontumisia",
    "Import infections": "Alueelle tulee infektioita",
    "Population": "Väestö",
    "Hospital beds": "Vuodepaikat",
    "Free capacity in the healthcare system":
        "Sairaanhoitojärjestelmän vapaa kapasiteetti",
    "Infection fatality ratio (IFR, %)": "Infektiokuolleisuus (IFR, %)",
    "Case fatality ratio (CFR, %)": "Tapauskuolleisuus (CFR, %)",
    "Epidemic parameters": "Epidemian parametrit",
    "Simulation result data": "Simulaatioajon tulosdata",
    "Restriction Day Index": "Rajoituspäiväluku",
    "Days ICU Capacity Exceeded": "Tehohoitokapasiteetin ylitys päivinä",
    "Fatalities": "Kuolleet",
    "Total number of deaths at the end of simulation.":
        "Kuolleiden lukumäärä simulaation päättyessä.",
    "Events (%(num)s)": "Tapahtumat (%(num)s)",
    "%(days)d days": "%(days)d päivää",
    "Forecast of the COVID-19 epidemic: %(name)s":
        "COVID-19-epidemian kehittyminen: %(name)s",
    "The cumulative sum of daily percentages of mobility restrictions. "
    "The index can be used as a rough indicator of harmful psychological, "
    "social and economic effects. A higher index means more severe effects.":
        "Kumulatiivinen rajoitusprosenteista laskettu indikaattori, jolla "
        "voidaan hyvin karkeasti kuvata eristymisestä aiheutuvia "
        "psykologisia, sosiaalisia ja talousvaikutuksia. Korkeammalla "
        "rajoituspäiväluvulla vaikutukset ovat merkittävämmät.",
    "Number of days that ICU units had less than 10%% of capacity left.":
        "Kuinka monena päivänä tehohoitokapasiteettia oli alle 10%% "
        "jäljellä.",
    # remaining reference msgids (locale/fi/LC_MESSAGES/messages.po):
    # scenario/UI description tail imported verbatim
    "Add a new event": "Lisää uusi tapahtuma",
    "Case fatality ratio (CFR, %": "Tapauskuolleisuus (CFR, %)",
    "Corona epidemic simulator": "Koronaepidemiasimulaattori",
    "Dead (cum.)": "Kuolleet (kum.)",
    "Dead (real)": "Kuolleet (tod.)",
    "Detected cases (cum.)": "Tunnistetut tapaukset (kum.)",
    "Detected cases (real)": "Havaitut tapaukset (tod.)",
    "Detected cases (sim.)": "Havaitut tapaukset (sim.)",
    "Disease parameters": "Taudin parametrit",
    "Distributions based on model parameters for a %(age)d-year-old person":
        "Mallin oletusten mukaiset jakaumat %(age)d-vuotiaalle henkilölle",
    "Distributions for a %(age)d-year-old person":
        "Jakaumat %(age)d-vuotiaalle henkilölle",
    "Duration of hospital treatment": "Sairaalahoitojakson kesto",
    "Exploration of the effects of interventions to the progression of the epidemic.":
        "Tutkitaan kuinka erilaiset interventiot vaikuttavat koronavirusepidemian etenemiseen.",
    "Hospitalized (real)": "Sairaalassa (tod.)",
    "ICU Capacity Exceeded": "Tehohoidon kapasiteetti ylitetty",
    "Import new infections daily":
        "Alueelle tulee päivittäin uusia infektioita",
    "In ICU (real)": "Tehohoidossa (tod.)",
    "Infection fatality ratio (IFR, %": "Infektiokuolleisuus (IFR, %)",
    "Mean number of days in regular hospital care before ICU":
        "Sairaalahoitojakson keskimääräinen kesto päivinä ennen tehohoitojaksoa",
    "Mean number of days of being hospitalized":
        "Sairaalahoitojakson keskimääräinen kesto päivinä",
    "Mean number of days of being ill":
        "Sairausjakson keskimääräinen kesto päivinä",
    "Mean number of days of being in ICU care":
        "Tehohoitojakson keskimääräinen kesto päivinä",
    "Parameters": "Parametrit",
    "Preset scenario": "Esivalittu skenaario",
    "Probability of becoming infected after being exposed":
        "Todennäköisyys, että taudille altistunut saa tartunnan",
    "Probability of dying after regular hospital treatment":
        "Sairaalahoitoa tarvitsevista osuus, joka kuolee sairaalahoidon päätteeksi",
    "Probability of dying during ICU care":
        "Tehohoitoa tarvitsevien osuus, joka kuolee tehohoitojakson päätteeksi",
    "Probability of dying if no hospital beds are available":
        "Sairaalahoitoa tarvitsevien osuus, joka kuolee jos sairaalapaikkaa ei ole vapaana",
    "Probability of requiring ICU care after having severe symptoms":
        "Osuus vakavasti oirehtivista, jotka tarvitsevat tehohoitoa",
    "Recovered (cum.)": "Toipuneet (kum.)",
    "Reproductive number (R)": "R-luku",
    "infections/day": "infektiota/pv",
    "max. contacts": "kontaktia (max.)",
    "units": "kpl",
}

TRANSLATIONS = {"fi": _FI, "en": {}}

# The reference catalog's exact msgid set (139 unique non-header
# msgids parsed from /root/reference/locale/fi/LC_MESSAGES/
# messages.po) — kept as an independent record so the coverage test
# (tests/test_parallel.py::test_fi_catalog_covers_reference_msgids)
# is not circular with the _FI table above.
REFERENCE_MSGIDS = (
    '%(days)d days',
    '(cum.)',
    '(real)',
    '(simulated)',
    'Active infections',
    'Add',
    'Add a new event: ',
    'Age of person',
    'Amount of new infections',
    'Amount of new weekly infections',
    'Asymptomatic',
    'Available ICU units',
    'Available hospital beds',
    'Build new ICU units',
    'Build new hospital beds',
    'Case fatality ratio (CFR)',
    'Case fatality ratio (CFR, %)',
    'Change in mobility compared to baseline',
    'Contacts per day',
    'Critical',
    'Date',
    'Day of illness',
    'Days ICU Capacity Exceeded',
    'Dead',
    'Description',
    'Detected cases',
    'Detected cases (14 day avg.)',
    'Disease Parameters',
    'Distributions',
    'Distributions based on model parameters',
    'Duration of ICU treatment',
    'Duration of regular hospital treatment',
    'Epidemic parameters',
    'Event',
    'Events (%(num)s)',
    'Fatal',
    'Fatalities',
    'Forecast of the COVID-19 epidemic: %(name)s',
    'Free capacity in the healthcare system',
    'Grocery and pharmacy',
    'Home',
    'Hospital beds',
    'Hospitalized',
    'ICU units',
    'ICU units in use',
    'Illness period',
    'Import infections',
    'Import infections from outside the area',
    'Import infections from outside the area every week',
    'In ICU',
    'In hospital ward',
    'Incubation period',
    'Infection fatality ratio (IFR)',
    'Infection fatality ratio (IFR, %)',
    'Infectiousness over time',
    'Leisure',
    'Limit mass gatherings',
    'Limit population mobility',
    'Maximum age for intervention',
    'Maximum age for limitation',
    'Mean duration from symptom onset to death',
    'Mean duration from symptom onset to recovery',
    'Mean incubation period length',
    'Mild',
    'Minimum age for intervention',
    'Minimum age for limitation',
    'New daily infections (14 day avg.)',
    'Number of days that ICU units had less than 10%% of capacity left.',
    'Number of new ICU units built',
    'Number of new beds built',
    'Number of people vaccinated weekly',
    'Other',
    'Outcome',
    'Parks',
    'People wear masks',
    'People who are a- or presymptomatic at simulation start',
    'People who are ill with symptoms at simulation start',
    'People who have recovered from infection at simulation start',
    'Percentage of infectors that are caught through contact tracing',
    'Percentage of mild cases that are detected',
    'Place where intervention happens',
    'Place where the contacts happen',
    'Population',
    'Portion of daily contacts where masks are in use',
    'Preset',
    'Probability of dying if no ICU units are available',
    'Probability of dying if severe symptoms and no hospital beds'
    ' are available',
    'Ratio of all infected people who remain asymptomatic',
    'Ratio of time before hospitalization',
    'Ratio of time in ward before ICU care',
    'Recovered',
    'Reduction in contacts',
    'Region Details',
    'Region Name',
    'Region Population',
    'Reproductive number (Rₜ)',
    'Residential',
    'Restore default events',
    'Restore defaults',
    'Restriction Day Index',
    'Retail and recreation',
    'Run simulation',
    'Scenario',
    'School',
    'Settings',
    'Severe',
    'Simulation result data',
    'Susceptible',
    'Symptom severity',
    'Test all patients with symptoms',
    'Test all with symptoms and perform contact tracing',
    'Test people only with severe symptoms',
    'Testing',
    'The cumulative sum of daily percentages of mobility restrict'
    'ions. The index can be used as a rough indicator of harmful '
    'psychological, social and economic effects. A higher index m'
    'eans more severe effects.',
    'Timeframe',
    'Total infections (cum.)',
    'Total number of deaths at the end of simulation.',
    'Transit stations',
    'Transport',
    'Vaccinate people against disease',
    'Vaccinated',
    'Validation',
    'Value',
    'Variant of the disease',
    'Work',
    'Workplaces',
    'beds',
    'beds in use',
    'cases',
    'cases (cum.)',
    'days',
    'deaths (cum.)',
    'infections',
    'infections/week',
    'number of contacts',
    'persons/week',
    'residents',
    'value',
    'years',
)


def set_active_locale(locale: str) -> None:
    _local.locale = locale


def get_active_locale() -> str:
    return getattr(_local, "locale", DEFAULT_LOCALE)


def gettext(msg: str) -> str:
    table = TRANSLATIONS.get(get_active_locale(), {})
    return table.get(msg, msg)


_ = gettext
