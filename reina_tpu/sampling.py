"""Parameter-distribution sampling (reference: main.pyx:2047-2101 +
calc/simulation.py:301-346): 10k draws from the model's stochastic
primitives for the parameter-explorer UI."""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from .core import constants as C
from .core.params import compile_disease, create_disease_params
from .core.state import np_severity_draw
from .data import loaders

SAMPLE_SIZE = 10000

SUPPORTED = {
    "infectiousness", "contacts_per_day", "symptom_severity",
    "incubation_period", "illness_period", "hospitalization_period",
    "icu_period", "onset_to_removed_period",
}


def _gamma(rng, mu, cv, size):
    sigma = cv * mu
    theta = sigma ** 2 / mu
    kappa = mu / theta
    return rng.gamma(kappa, theta, size=size)


def sample_distribution(what: str, age: int, severity: Optional[str],
                        variables: Dict):
    if what not in SUPPORTED:
        raise ValueError(
            "unknown sample type. supported: %s" % ", ".join(sorted(SUPPORTED)))
    nr_ages = variables["max_age"] + 1
    disease, _names = compile_disease(create_disease_params(variables), nr_ages)
    sev = C.STR_TO_SEVERITY[severity] if severity else C.MILD
    rng = np.random.default_rng(variables.get("random_seed", 0))

    if what == "infectiousness":
        days = np.arange(-C.IOT_OFFSET, C.IOT_OFFSET + 1)
        s = pd.Series(index=days, data=np.array(C.INFECTIOUSNESS_OVER_TIME))
        return s[s != 0].sort_index()

    if what == "contacts_per_day":
        contacts = loaders.get_contact_tensor()
        base = contacts.per_year_participant(variables["max_age"])  # (A,P,B)
        factor = 1.0
        limit_mob = variables.get("sample_limit_mobility", 0)
        mob = (100 - limit_mob) / 100.0
        mean_contacts = base[age].sum() * mob
        f = np.exp(rng.normal(0, C.CONTACT_LOGNORMAL_SIGMA, SAMPLE_SIZE)) \
            * mean_contacts * factor
        f = np.maximum(f, 1.0)
        out = np.clip(f.astype(np.int64) - 1, 0, C.DEFAULT_CONTACT_LIMIT)
    elif what == "symptom_severity":
        out = np.array([
            np_severity_draw(rng, disease, 0, age)[0]
            for _ in range(SAMPLE_SIZE)
        ])
    elif what == "incubation_period":
        out = np.floor(_gamma(rng, disease.mu_incub[0], C.INCUBATION_CV,
                              SAMPLE_SIZE) + 0.5).astype(np.int64)
    else:
        mu = (disease.mu_death[0] if sev == C.FATAL else disease.mu_recov[0])
        o2r = _gamma(rng, mu, C.ONSET_TO_REMOVED_CV, SAMPLE_SIZE)
        rb = float(disease.ratio_before_hosp[0])
        rw = float(disease.ratio_in_ward[0])
        if what == "onset_to_removed_period":
            out = np.floor(o2r + 0.5).astype(np.int64)
        elif what == "illness_period":
            ratio = rb if sev >= C.SEVERE else 1.0
            out = np.floor(o2r * ratio + 0.5).astype(np.int64)
        elif what == "hospitalization_period":
            ratio = (1 - rb) if sev == C.SEVERE else (rw if sev >= C.CRITICAL else 0.0)
            out = np.floor(o2r * ratio + 0.5).astype(np.int64)
        elif what == "icu_period":
            ratio = (1 - rw - rb) if sev >= C.CRITICAL else 0.0
            out = np.floor(o2r * ratio + 0.5).astype(np.int64)

    s = pd.Series(out)
    c = s.value_counts().sort_index()
    if what == "symptom_severity":
        c.index = c.index.map(C.SEVERITY_TO_STR)
    return c
