"""Sequential mini-ABM oracle.

An independent, literal implementation of the reference's per-agent
semantics (cythonsim/main.pyx) in plain Python/NumPy, used to validate
the vectorized engine *in distribution*: same disease math, same
contact model, same capacity rules — executed agent-by-agent in sweep
order like the reference. Small populations only (O(N·days·contacts)
Python loop).
"""
from __future__ import annotations

import numpy as np

from reina_tpu.core import constants as C
from reina_tpu.core.params import DiseaseArrays
from reina_tpu.core.state import np_gamma, np_severity_draw


class OraclePerson:
    __slots__ = ("age", "state", "severity", "outside", "days_left",
                 "day_of_illness", "day_of_infection", "o2r", "variant",
                 "infector", "n_infected", "detected", "immune", "queued")

    def __init__(self, age):
        self.age = age
        self.state = C.SUSCEPTIBLE
        self.severity = C.ASYMPTOMATIC
        self.outside = False
        self.days_left = 0
        self.day_of_illness = 0
        self.day_of_infection = -1
        self.o2r = 0.0
        self.variant = 0
        self.infector = -1
        self.n_infected = 0
        self.detected = False
        self.immune = False
        self.queued = False

    @property
    def infected(self):
        return self.state in (C.INCUBATION, C.ILLNESS, C.HOSPITALIZED,
                              C.IN_ICU)


class Oracle:
    """Wild-type only, no testing/tracing/vaccination (those phases have
    dedicated unit tests); exposure + progression + capacity are the
    stochastically-coupled core worth cross-validating."""

    def __init__(self, age_counts, dis: DiseaseArrays, contact_base,
                 band_of_age, beds, icu, seed, daily_imports=0,
                 import_days=None):
        self.rng = np.random.default_rng(seed)
        self.dis = dis
        ages = np.repeat(np.arange(len(age_counts)), age_counts)
        self.rng.shuffle(ages)
        self.people = [OraclePerson(int(a)) for a in ages]
        self.n = len(self.people)
        self.beds_avail = beds
        self.icu_avail = icu
        self.day = 0
        self.daily_imports = daily_imports
        self.import_days = import_days

        # contact model: mean contacts and (place,band) categorical per age
        self.band_of_age = band_of_age
        q = contact_base  # (A, P, B), no mobility scaling
        self.nc_a = q.sum(axis=(1, 2))
        flat = q.reshape(q.shape[0], -1)
        cat_p = flat / np.maximum(flat.sum(axis=1, keepdims=True), 1e-12)
        self.cat_cum = np.cumsum(cat_p, axis=1)
        self.nbands = q.shape[2]
        # uniform pick within band: member lists
        self.band_members = [
            [i for i, p in enumerate(self.people)
             if band_of_age[p.age] == b] for b in range(self.nbands)]
        self.history = []

    # --- disease math (mirrors main.pyx) -------------------------------
    def infectiousness(self, p):
        if p.state == C.INCUBATION:
            day = -p.days_left
        elif p.state == C.ILLNESS:
            day = p.day_of_illness
        else:
            return 0.0
        idx = day + C.IOT_OFFSET
        if 0 <= idx < C.IOT_LEN:
            val = C.INFECTIOUSNESS_OVER_TIME[idx]
            if p.severity == C.ASYMPTOMATIC:
                val *= float(self.dis.asymp_mult[0])
            return val
        return 0.0

    def infect(self, p, infector=None):
        p.state = C.INCUBATION
        sev, outside = np_severity_draw(self.rng, self.dis, 0, p.age)
        p.severity, p.outside = sev, outside
        p.days_left = int(np_gamma(self.rng, float(self.dis.mu_incub[0]),
                                   C.INCUBATION_CV) + 0.5)
        mu = (float(self.dis.mu_death[0]) if sev == C.FATAL
              else float(self.dis.mu_recov[0]))
        p.o2r = np_gamma(self.rng, mu, C.ONSET_TO_REMOVED_CV)
        p.day_of_infection = self.day
        if infector is not None:
            p.infector = infector
            self.people[infector].n_infected += 1

    def expose_others(self, p, idx):
        inf = self.infectiousness(p)
        if inf == 0 or p.detected:
            return
        sympt_ill = p.state == C.ILLNESS and p.severity != C.ASYMPTOMATIC
        factor = C.SYMPTOMATIC_CONTACT_FACTOR if sympt_ill else 1.0
        limit = (C.SYMPTOMATIC_CONTACT_LIMIT if sympt_ill
                 else C.DEFAULT_CONTACT_LIMIT)
        f = np.exp(self.rng.normal(0, C.CONTACT_LOGNORMAL_SIGMA)) \
            * self.nc_a[p.age] * factor
        k = min(max(int(max(f, 1.0)) - 1, 0), limit)
        for _ in range(k):
            cat = int(np.searchsorted(self.cat_cum[p.age], self.rng.random()))
            band = cat % self.nbands
            members = self.band_members[band]
            if not members:
                continue
            t = self.people[members[self.rng.integers(len(members))]]
            if t.infected or t.immune:
                continue
            prob = (inf * float(self.dis.p_susc[0, t.age])
                    * float(self.dis.inf_mult[0]))
            if self.rng.random() < prob:
                self.infect(t, infector=idx)

    def advance(self, p, idx):
        d = self.dis
        if p.state == C.INCUBATION:
            if p.day_of_infection == self.day:
                return
            self.expose_others(p, idx)
            if p.days_left > 0:
                p.days_left -= 1
            if p.days_left == 0:
                p.state = C.ILLNESS
                ratio = (float(d.ratio_before_hosp[0])
                         if p.severity >= C.SEVERE else 1.0)
                p.days_left = int(p.o2r * ratio + 0.5)
        elif p.state == C.ILLNESS:
            self.expose_others(p, idx)
            p.day_of_illness += 1
            if p.days_left > 0:
                p.days_left -= 1
            if p.days_left == 0:
                if p.severity == C.FATAL and p.outside:
                    self.die(p)
                elif p.severity >= C.SEVERE:
                    self.hospitalize(p)
                else:
                    self.recover(p)
        elif p.state == C.HOSPITALIZED:
            if p.days_left > 0:
                p.days_left -= 1
            if p.days_left == 0:
                if p.severity >= C.CRITICAL:
                    self.to_icu(p)
                else:
                    self.beds_avail += 1
                    self.recover(p)
        elif p.state == C.IN_ICU:
            if p.days_left > 0:
                p.days_left -= 1
            if p.days_left == 0:
                self.icu_avail += 1
                if p.severity == C.FATAL:
                    self.die(p)
                else:
                    self.recover(p)

    def hospitalize(self, p):
        d = self.dis
        p.detected = True
        if self.beds_avail == 0:
            chance = (1.0 if p.severity == C.FATAL
                      else float(d.p_icu_death_no_beds[0])
                      if p.severity == C.CRITICAL
                      else float(d.p_hosp_death_no_beds[0]))
            if self.rng.random() < chance:
                self.die(p)
            else:
                self.recover(p)
            return
        self.beds_avail -= 1
        p.state = C.HOSPITALIZED
        ratio = ((1 - float(d.ratio_before_hosp[0]))
                 if p.severity == C.SEVERE else float(d.ratio_in_ward[0]))
        p.days_left = int(p.o2r * ratio + 0.5)

    def to_icu(self, p):
        d = self.dis
        self.beds_avail += 1
        claimed = True
        if self.icu_avail == 0:
            claimed = False
            chance = (1.0 if p.severity == C.FATAL
                      else float(d.p_icu_death_no_beds[0]))
            if self.rng.random() < chance:
                self.die(p)
                return
        else:
            self.icu_avail -= 1
        p.state = C.IN_ICU
        rest = 1 - float(d.ratio_in_ward[0]) - float(d.ratio_before_hosp[0])
        p.days_left = int(p.o2r * rest + 0.5)
        if not claimed:
            # reference quirk: denied survivors occupy ICU without a unit
            pass

    def die(self, p):
        p.state = C.DEAD
        p.immune = True

    def recover(self, p):
        p.state = C.RECOVERED
        p.immune = True

    def snapshot(self):
        s = dict(infected=0, all_infected=0, dead=0, in_ward=0, in_icu=0,
                 recovered=0)
        for p in self.people:
            if p.infected:
                s["infected"] += 1
            if p.day_of_infection >= 0:
                s["all_infected"] += 1
            if p.state == C.DEAD:
                s["dead"] += 1
            elif p.state == C.HOSPITALIZED:
                s["in_ward"] += 1
            elif p.state == C.IN_ICU:
                s["in_icu"] += 1
            elif p.state == C.RECOVERED:
                s["recovered"] += 1
        return s

    def import_infections(self, count):
        for _ in range(count):
            for _attempt in range(10):
                p = self.people[self.rng.integers(self.n)]
                if p.state == C.SUSCEPTIBLE and not p.immune:
                    self.infect(p, infector=None)
                    break

    def run(self, days):
        for _ in range(days):
            self.history.append(self.snapshot())
            if self.import_days is None or self.day in self.import_days:
                self.import_infections(self.daily_imports)
            start = self.rng.integers(self.n)
            for i in range(self.n):
                idx = (start + i) % self.n
                p = self.people[idx]
                if p.infected:
                    self.advance(p, idx)
            self.day += 1
        self.history.append(self.snapshot())
        return self.history
