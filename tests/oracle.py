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
                 "infector", "n_infected", "detected", "immune", "queued",
                 "infectees", "dov")

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
        self.infectees = None   # list only while CT mode tracks this agent
        self.dov = -1           # day of vaccination

    @property
    def infected(self):
        return self.state in (C.INCUBATION, C.ILLNESS, C.HOSPITALIZED,
                              C.IN_ICU)


class Oracle:
    """Sequential spec covering the full exposure math — variants,
    masks, mobility-scaled contacts, weekly imports with per-variant
    shares — plus the policy layer: testing modes, 2-level contact
    tracing, oldest-first vaccination and capacity rationing, mirroring
    the reference HealthcareSystem (main.pyx:441-660), person state
    machine (main.pyx:209-440), Disease.did_infect incl. the mask
    p(A∪B) save (main.pyx:908-934), ContactMatrix mobility rescaling
    (main.pyx:1184-1248, 1250-1266) and Population.infect_people_daily
    (main.pyx:1667-1685).

    ``events`` is a list of (day, kind, params) applied at day start
    like the reference's dated interventions:
      ("testing-mode", (mode, p))   mode in (None, "severe", "all",
                                    "all_ct"); p = mild-detection /
                                    tracing-efficiency probability
      ("vaccinate", (daily, min_age, max_age))
      ("masks", (share, min_age, max_age, place))
                                    place = index into the contact
                                    tensor's place axis, or None = all
                                    (set_mask_probability, main.pyx:1268)
      ("mobility", (factor, min_age, max_age, place))
                                    (set_mobility_factor, main.pyx:1250)
      ("import-weekly", (amount, shares))
                                    shares = (V,) per-variant fractions
                                    (infect_weekly, main.pyx:1667-1669)
    """

    def __init__(self, age_counts, dis: DiseaseArrays, contact_base,
                 band_of_age, beds, icu, seed, daily_imports=0,
                 import_days=None, events=()):
        self.rng = np.random.default_rng(seed)
        self.dis = dis
        self.nv = dis.p_susc.shape[0]
        ages = np.repeat(np.arange(len(age_counts)), age_counts)
        self.rng.shuffle(ages)
        self.people = [OraclePerson(int(a)) for a in ages]
        self.n = len(self.people)
        self.beds_avail = beds
        self.icu_avail = icu
        self.day = 0
        self.daily_imports = daily_imports
        self.import_days = import_days

        # contact model: (A, P, B) tensor scaled by mobility factors;
        # mean contacts and the (place, band) categorical are re-derived
        # whenever a factor changes (generate_contact_probabilities)
        self.band_of_age = band_of_age
        self.contact_base = np.asarray(contact_base, dtype=float)
        self.nbands = self.contact_base.shape[2]
        self.nplaces = self.contact_base.shape[1]
        self.mask_p = np.zeros((self.contact_base.shape[0], self.nplaces))
        self.mobility = {}   # (place|None, min_age, max_age) -> factor
        self._rebuild_contacts()

        # weekly imports: fractional per-variant carry
        # (infect_people_daily, main.pyx:1671-1685)
        self.weekly_amount = 0.0
        self.weekly_shares = np.zeros(self.nv)
        self.weekly_shares[0] = 1.0
        self.weekly_leftover = np.zeros(self.nv)
        # uniform pick within band: member lists
        self.band_members = [
            [i for i, p in enumerate(self.people)
             if band_of_age[p.age] == b] for b in range(self.nbands)]
        self.history = []

        # healthcare system (reference main.pyx:451-660)
        self.events = sorted(events)
        self.testing_mode = None
        self.p_detected_anyway = 0.0
        self.p_successful_tracing = 1.0
        self.testing_queue = []
        self.vaccinations = []   # [{nr_daily, min_age, max_age}]
        self.ct_cases = 0
        self.all_detected = 0
        # oldest-first vaccination order (people_sorted_by_age)
        self.by_age_order = sorted(range(self.n),
                                   key=lambda i: self.people[i].age)

    def _rebuild_contacts(self):
        """Mobility-scaled contact tables (the analog of
        generate_contact_probabilities, main.pyx:1184-1248): factors
        multiply the filtered (participant-age, place) cells, then the
        per-age mean contact count and the cumulative (place, band)
        categorical are re-derived from the scaled tensor."""
        q = self.contact_base.copy()
        for (place, mn, mx), f in self.mobility.items():
            if f == 1.0:
                continue
            cols = slice(None) if place is None else [place]
            q[mn:mx + 1, cols] *= f
        self.nc_a = q.sum(axis=(1, 2))
        flat = q.reshape(q.shape[0], -1)   # flat index = place*B + band
        cat_p = flat / np.maximum(flat.sum(axis=1, keepdims=True), 1e-12)
        self.cat_cum = np.cumsum(cat_p, axis=1)

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
            val = float(self.dis.iot[p.variant, idx])
            if p.severity == C.ASYMPTOMATIC:
                val *= float(self.dis.asymp_mult[p.variant])
            return val
        return 0.0

    def infect(self, p, infector=None, idx=None, variant=0):
        if infector is not None:
            variant = self.people[infector].variant
        p.variant = variant
        p.state = C.INCUBATION
        vdays = self.day - p.dov if p.dov >= 0 else -1
        sev, outside = np_severity_draw(self.rng, self.dis, variant, p.age,
                                        vaccinated_days=vdays)
        p.severity, p.outside = sev, outside
        p.days_left = int(np_gamma(self.rng,
                                   float(self.dis.mu_incub[variant]),
                                   C.INCUBATION_CV) + 0.5)
        mu = (float(self.dis.mu_death[variant]) if sev == C.FATAL
              else float(self.dis.mu_recov[variant]))
        p.o2r = np_gamma(self.rng, mu, C.ONSET_TO_REMOVED_CV)
        p.day_of_infection = self.day
        if infector is not None:
            p.infector = infector
            src = self.people[infector]
            src.n_infected += 1
            if src.infectees is not None and idx is not None:
                src.infectees.append(idx)
        # under contact tracing, newly infected agents track their own
        # infectees (main.pyx:227-234: buffer malloc'ed at infection
        # only while CT mode is active)
        if self.testing_mode == "all_ct":
            p.infectees = []

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
        v = p.variant
        for _ in range(k):
            cat = int(np.searchsorted(self.cat_cum[p.age], self.rng.random()))
            place, band = cat // self.nbands, cat % self.nbands
            members = self.band_members[band]
            if not members:
                continue
            t_idx = members[self.rng.integers(len(members))]
            t = self.people[t_idx]
            if t.infected or t.immune:
                continue
            prob = (inf * float(self.dis.p_susc[v, t.age])
                    * float(self.dis.inf_mult[v]))
            if self.rng.random() < prob:
                # masks may save the day: p(A∪B) = a + b − ab, with the
                # mask share taken from the SOURCE's (participant age,
                # place) cell (did_infect, main.pyx:926-933)
                m = float(self.mask_p[p.age, place])
                if m:
                    a = m * float(self.dis.mask_po[v])
                    b = m * float(self.dis.mask_pw[v])
                    if self.rng.random() < a + b - a * b:
                        continue
                self.infect(t, infector=idx, idx=t_idx)

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
                ratio = (float(d.ratio_before_hosp[p.variant])
                         if p.severity >= C.SEVERE else 1.0)
                p.days_left = int(p.o2r * ratio + 0.5)
                # symptomatic people seek testing at onset
                # (person_become_ill, main.pyx:284-292)
                if p.severity != C.ASYMPTOMATIC and not p.detected:
                    self.seek_testing(idx, p)
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
        if not p.detected:
            p.detected = True
            self.all_detected += 1
        if self.beds_avail == 0:
            chance = (1.0 if p.severity == C.FATAL
                      else float(d.p_icu_death_no_beds[p.variant])
                      if p.severity == C.CRITICAL
                      else float(d.p_hosp_death_no_beds[p.variant]))
            if self.rng.random() < chance:
                self.die(p)
            else:
                self.recover(p)
            return
        self.beds_avail -= 1
        p.state = C.HOSPITALIZED
        ratio = ((1 - float(d.ratio_before_hosp[p.variant]))
                 if p.severity == C.SEVERE
                 else float(d.ratio_in_ward[p.variant]))
        p.days_left = int(p.o2r * ratio + 0.5)

    def to_icu(self, p):
        d = self.dis
        self.beds_avail += 1
        claimed = True
        if self.icu_avail == 0:
            claimed = False
            chance = (1.0 if p.severity == C.FATAL
                      else float(d.p_icu_death_no_beds[p.variant]))
            if self.rng.random() < chance:
                self.die(p)
                return
        else:
            self.icu_avail -= 1
        p.state = C.IN_ICU
        rest = (1 - float(d.ratio_in_ward[p.variant])
                - float(d.ratio_before_hosp[p.variant]))
        p.days_left = int(p.o2r * rest + 0.5)
        if not claimed:
            # reference quirk: denied survivors occupy ICU without a unit
            pass

    def die(self, p):
        p.state = C.DEAD
        p.immune = True
        p.infectees = None   # freed on removal (main.pyx:301-307)

    def recover(self, p):
        p.state = C.RECOVERED
        p.immune = True
        p.infectees = None   # freed on removal (main.pyx:301-307)

    # --- healthcare system (main.pyx:441-660) --------------------------
    def seek_testing(self, idx, p):
        if self.testing_mode in ("all", "all_ct"):
            self.queue_for_testing(idx, 1.0)
        elif self.testing_mode == "severe":
            if (p.severity >= C.SEVERE
                    or self.rng.random() < self.p_detected_anyway):
                self.queue_for_testing(idx, 1.0)

    def queue_for_testing(self, idx, p_success):
        p = self.people[idx]
        if p.state == C.DEAD or p.detected or p.queued:
            return False
        if self.rng.random() >= p_success:
            return False
        p.queued = True
        self.testing_queue.append(idx)
        return True

    def contact_trace(self, idx, level):
        """2-level BFS over infector + infectee links
        (perform_contact_tracing, main.pyx:495-512)."""
        if level > 1:
            return
        p = self.people[idx]
        if p.infector >= 0:
            if self.queue_for_testing(p.infector, self.p_successful_tracing):
                self.contact_trace(p.infector, level + 1)
        if p.infectees is not None:
            for t in list(p.infectees):
                if self.queue_for_testing(t, self.p_successful_tracing):
                    self.contact_trace(t, level + 1)

    def hc_iterate(self):
        """Morning drain: run queued tests (detection is unconditional in
        the production build, main.pyx:514-545), contact-trace under CT
        mode, then vaccinate oldest-first (main.pyx:560-584)."""
        queue, self.testing_queue = self.testing_queue, []
        self.ct_cases = len(queue)
        for idx in queue:
            p = self.people[idx]
            p.queued = False
            if not p.detected:
                p.detected = True
                self.all_detected += 1
            if self.testing_mode == "all_ct":
                self.contact_trace(idx, 0)
        for v in self.vaccinations:
            nr = int(v["nr_daily"])
            mn = v["min_age"] if v["min_age"] is not None else 0
            mx = v["max_age"] if v["max_age"] is not None else 200
            done = 0
            for i in reversed(self.by_age_order):
                if done >= nr:
                    break
                p = self.people[i]
                if not (mn <= p.age <= mx):
                    continue
                if p.state == C.DEAD or p.dov >= 0 or p.detected:
                    continue
                p.dov = self.day
                done += 1

    def apply_events(self):
        for day, kind, params in self.events:
            if day != self.day:
                continue
            if kind == "testing-mode":
                mode, p = params
                self.testing_mode = mode
                if mode == "all_ct":
                    self.p_successful_tracing = p
                elif mode == "severe":
                    self.p_detected_anyway = p
            elif kind == "vaccinate":
                daily, mn, mx = params
                for v in self.vaccinations:
                    if v["min_age"] == mn and v["max_age"] == mx:
                        v["nr_daily"] = daily
                        break
                else:
                    self.vaccinations.append(
                        dict(nr_daily=daily, min_age=mn, max_age=mx))
            elif kind == "masks":
                share, mn, mx, place = params
                mn = 0 if mn is None else mn
                mx = self.mask_p.shape[0] - 1 if mx is None else mx
                cols = slice(None) if place is None else [place]
                self.mask_p[mn:mx + 1, cols] = share
            elif kind == "mobility":
                factor, mn, mx, place = params
                mn = 0 if mn is None else mn
                mx = self.contact_base.shape[0] - 1 if mx is None else mx
                self.mobility[(place, mn, mx)] = factor
                self._rebuild_contacts()
            elif kind == "import-weekly":
                amount, shares = params
                self.weekly_amount = float(amount)
                self.weekly_shares = np.asarray(shares, dtype=float)
            else:
                raise ValueError(kind)

    def snapshot(self):
        s = dict(infected=0, all_infected=0, dead=0, in_ward=0, in_icu=0,
                 recovered=0, vaccinated=0, non_hospital_dead=0,
                 all_detected=self.all_detected, ct_cases=self.ct_cases,
                 by_variant=np.zeros(self.nv, dtype=int))
        for p in self.people:
            if p.infected:
                s["infected"] += 1
            if p.day_of_infection >= 0:
                s["all_infected"] += 1
                s["by_variant"][p.variant] += 1
            if p.dov >= 0:
                s["vaccinated"] += 1
            if p.state == C.DEAD:
                s["dead"] += 1
                if p.outside:
                    s["non_hospital_dead"] += 1
            elif p.state == C.HOSPITALIZED:
                s["in_ward"] += 1
            elif p.state == C.IN_ICU:
                s["in_icu"] += 1
            elif p.state == C.RECOVERED:
                s["recovered"] += 1
        return s

    def import_infections(self, count, variant=0):
        for _ in range(count):
            for _attempt in range(10):
                p = self.people[self.rng.integers(self.n)]
                if p.state == C.SUSCEPTIBLE and not p.immune:
                    self.infect(p, infector=None, variant=variant)
                    break

    def weekly_imports(self):
        """Per-variant fractional-carry weekly imports
        (infect_people_daily, main.pyx:1671-1685): each day accrues
        amount/7 × share[v]; the integer part imports today, the
        fraction carries over."""
        for v in range(self.nv):
            leftover = (self.weekly_leftover[v]
                        + self.weekly_amount / 7.0 * self.weekly_shares[v])
            today = int(leftover)
            if today:
                self.import_infections(today, variant=v)
                leftover -= today
            self.weekly_leftover[v] = leftover

    def run(self, days):
        """Day order mirrors the reference _iterate (main.pyx:1994-2009):
        dated interventions → imports → hc.iterate (tests, tracing,
        vaccinations) → person sweep."""
        for _ in range(days):
            self.history.append(self.snapshot())
            self.apply_events()
            # weekly (pop.init_day) precedes one-shot imports in the
            # reference _iterate (main.pyx:1995-1996)
            self.weekly_imports()
            if self.import_days is None or self.day in self.import_days:
                self.import_infections(self.daily_imports)
            self.hc_iterate()
            start = self.rng.integers(self.n)
            for i in range(self.n):
                idx = (start + i) % self.n
                p = self.people[idx]
                if p.infected:
                    self.advance(p, idx)
            self.day += 1
        self.history.append(self.snapshot())
        return self.history
