"""Scenario presets (reference: scenarios.py).

Five built-in what-if scenarios with fi/en translations. ``apply()``
resets the active variable store and layers the scenario's
interventions/variables on top. (The reference's ``preset_scenario``
variable was missing from its defaults, making ``apply()`` assert —
fixed here by shipping the key in defaults.json.)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

from .variables import get_variable, reset_variables, set_variable
from ..utils.locale import get_active_locale

DEFAULT_LOCALE = "en"


@dataclass
class ScenarioTranslation:
    name: str
    description: str


class Scenario:
    id: str = ""
    translations: Dict[str, ScenarioTranslation] = {}
    interventions: List[list] = []
    variables: Dict = {}

    def get_translated(self, attr: str) -> str:
        locale = get_active_locale() or DEFAULT_LOCALE
        tr = self.translations.get(locale) or self.translations[DEFAULT_LOCALE]
        return getattr(tr, attr).strip()

    def get_name(self) -> str:
        return self.get_translated("name")

    def get_description(self) -> str:
        return self.get_translated("description")

    def apply(self) -> None:
        reset_variables()
        if self.interventions:
            ivs = get_variable("interventions") + [list(x) for x in self.interventions]
            set_variable("interventions", ivs)
        for key, val in self.variables.items():
            set_variable(key, val)
        set_variable("preset_scenario", self.id)


class DefaultScenario(Scenario):
    id = "default"
    translations = {
        "fi": ScenarioTranslation("Nykyiset rajoitukset",
                                  "Säilytetään nykyiset rajoitukset ja testauskäytäntö."),
        "en": ScenarioTranslation("Present interventions",
                                  "Current mobility restrictions and testing policy remain."),
    }
    interventions: List[list] = []


class MitigationScenario(Scenario):
    id = "mitigation"
    translations = {
        "fi": ScenarioTranslation(
            "Tehohoidon varmistaminen",
            "Varmistetaan sairaanhoidon kapasiteetti liikkuvuusrajoituksilla "
            "ja rakennetaan lisää tehohoitokapasiteettia."),
        "en": ScenarioTranslation(
            "Mitigation only",
            "Ensure that healthcare capacity remains sufficient through "
            "restricting population mobility and rapidly building more ICU units."),
    }
    interventions = [
        ["build-new-icu-units", "2020-06-30", 150],
        ["build-new-hospital-beds", "2020-06-30", 300],
        ["build-new-icu-units", "2020-07-15", 150],
        ["build-new-hospital-beds", "2020-07-15", 300],
        ["build-new-icu-units", "2020-07-30", 150],
        ["build-new-hospital-beds", "2020-07-30", 300],
        ["build-new-icu-units", "2020-08-15", 150],
        ["build-new-hospital-beds", "2020-08-15", 300],
        ["build-new-icu-units", "2020-08-30", 150],
        ["build-new-hospital-beds", "2020-08-30", 300],
        ["limit-mobility", "2020-06-01", 30],
        ["limit-mobility", "2020-07-01", 40],
        ["limit-mobility", "2020-08-01", 30],
        ["limit-mobility", "2020-09-15", 40],
        ["limit-mobility", "2020-10-15", 30],
        ["limit-mobility", "2020-12-15", 20],
        ["limit-mobility", "2021-01-15", 5],
        ["limit-mobility", "2021-02-15", 0],
    ]


class SummerEasingScenario(Scenario):
    id = "summer-boogie"
    translations = {
        "fi": ScenarioTranslation(
            "Kesähöllennys",
            "Höllennetään nykyisiä rajoituksia hieman toukokuun puolivälistä "
            "lähtien. Rajoitukset pudotetaan 50%:ista 30%:iin."),
        "en": ScenarioTranslation(
            "Summer easing",
            "Ease current mobility restrictions somewhat starting from mid-May. "
            "Restrictions will be eased from 50% to 30%."),
    }
    interventions = [
        ["limit-mobility", "2020-05-15", 30],
    ]


class HammerDanceScenario(Scenario):
    id = "hammer-and-dance"
    translations = {
        "fi": ScenarioTranslation(
            "Hybridimalli",
            "Laajennetaan testausta, tehdään kontaktien jäljitystä ja "
            "tasapainotellaan rajoitusten kanssa."),
        "en": ScenarioTranslation(
            "Hybrid model",
            "Test all people with even mild symptoms, perform contact tracing, "
            "and start a balancing act with mobility restrictions."),
    }
    interventions = [
        ["test-with-contact-tracing", "2020-05-01", 30],
        ["test-with-contact-tracing", "2020-06-01", 40],
        ["test-with-contact-tracing", "2020-07-01", 50],
        ["test-with-contact-tracing", "2020-08-01", 60],
        ["limit-mobility", "2020-05-01", 30],
        ["limit-mobility", "2020-06-24", 25],
        ["limit-mobility", "2020-08-15", 10],
        ["limit-mobility", "2020-12-06", 15],
    ]


class RetrospectiveEasingScenario(Scenario):
    id = "looser-restrictions-to-start-with"
    translations = {
        "fi": ScenarioTranslation(
            "Ruotsin malli",
            "Mitä jos alusta lähtien oltaisiinkin otettu puolet vähemmän "
            "liikkuvuuden rajoituksia käyttöön?"),
        "en": ScenarioTranslation(
            "Swedish model",
            "What if we had taken half of the mobility restriction measures "
            "to start with?"),
    }

    def apply(self) -> None:
        super().apply()
        out = []
        for iv in get_variable("interventions"):
            iv = list(iv)
            if iv[0] == "limit-mobility":
                iv[2] = iv[2] // 2
            out.append(iv)
        set_variable("interventions", out)


SCENARIOS = [
    DefaultScenario(),
    SummerEasingScenario(),
    MitigationScenario(),
    HammerDanceScenario(),
    RetrospectiveEasingScenario(),
]


def get_scenario(scenario_id: str) -> Scenario:
    for s in SCENARIOS:
        if s.id == scenario_id:
            return s
    raise KeyError(f"scenario not found: {scenario_id}")
