"""Hand-computed severity-chain fixture — breaks the oracle's shared
fate.

``tests/oracle.py`` imports the engine's own ``np_severity_draw``
(core/state.py), so the distributional-parity suite cross-validates two
in-repo implementations authored from one reading of the reference's
``get_symptom_severity`` (main.pyx:1041-1091) — a shared misreading
would pass every suite (round-4 verdict, weak #5). This module pins the
chain to a LITERAL expected table computed by hand from the reference
lines, asserting BOTH the numpy chain (core/state.np_severity_draw) and
the jax chain the engine runs (core/step.severity_from_uniform) against
it. Deliberately breaking any conditional-probability term in either
implementation turns these red without touching tests/oracle.py.

Reference chain (main.pyx:1041-1091), for one uniform draw ``val``:

    if val >= syc_raw:                       -> ASYMPTOMATIC
    syc = syc_raw * vmod                     (vaccine efficacy modifier)
    if dohc and val < dohc*syc:              -> FATAL, death outside
    if dohc: val = (val - dohc) / (1 - dohc)
    if val < fc*cc*sc*syc:                   -> FATAL, death outside
    (duplicated fatal branch: same condition again -> dead code; the
     in-hospital FATAL branch can never fire)
    if val < cc*sc*syc:                      -> CRITICAL
    if val < sc*syc:                         -> SEVERE
    else                                     -> MILD

Solved for interval boundaries on the ORIGINAL val (dohc > 0 case —
``val < X`` after the renormalization  <=>  val < dohc + X*(1-dohc)):

    [0,            dohc*syc)                  FATAL outside
    [dohc*syc,     dohc + fc*cc*sc*syc*(1-dohc))  FATAL outside (chain)
    [...,          dohc + cc*sc*syc*(1-dohc))     CRITICAL
    [...,          dohc + sc*syc*(1-dohc))        SEVERE
    [...,          syc_raw)                       MILD
    [syc_raw, 1)                                  ASYMPTOMATIC
"""
import numpy as np
import pytest

from reina_tpu.core import constants as C

# (severity-name, death_outside)
ASY = (C.ASYMPTOMATIC, False)
MIL = (C.MILD, False)
SEV = (C.SEVERE, False)
CRI = (C.CRITICAL, False)
FAT = (C.FATAL, True)   # every reachable FATAL dies outside (quirk)


# Parameter set A: syc_raw=0.5, dohc=0.2, sc=0.4, cc=0.5, fc=0.25.
# Unvaccinated (vmod=1, syc=0.5) boundaries, computed by hand:
#   dohc*syc                        = 0.2*0.5              = 0.10
#   dohc + fc*cc*sc*syc*(1-dohc)    = 0.2 + 0.025*0.8      = 0.22
#   dohc + cc*sc*syc*(1-dohc)       = 0.2 + 0.10*0.8       = 0.28
#   dohc + sc*syc*(1-dohc)          = 0.2 + 0.20*0.8       = 0.36
#   syc_raw                                                = 0.50
A = dict(syc=0.5, dohc=0.2, sc=0.4, cc=0.5, fc=0.25)
A_UNVAX = [
    (0.05, FAT),   # < 0.10: death-outside-hospital branch
    (0.15, FAT),   # in [0.10, 0.22): renormalized val is NEGATIVE
    #                ((0.15-0.2)/0.8 < 0) -> chain-fatal; pins the
    #                reference's negative-renormalization quirk
    (0.2199, FAT),
    (0.2201, CRI), (0.27, CRI),
    (0.2801, SEV), (0.35, SEV),
    (0.3601, MIL), (0.49, MIL),
    (0.50, ASY), (0.99, ASY),
]
# Vaccinated > delay (vmod=0.1, syc=0.05) boundaries:
#   dohc*syc                        = 0.2*0.05             = 0.010
#   dohc + fc*cc*sc*syc*(1-dohc)    = 0.2 + 0.0025*0.8     = 0.202
#   dohc + cc*sc*syc*(1-dohc)       = 0.2 + 0.010*0.8      = 0.208
#   dohc + sc*syc*(1-dohc)          = 0.2 + 0.020*0.8      = 0.216
#   syc_raw (vaccine does NOT change the asymptomatic split) = 0.50
A_VAX = [
    (0.005, FAT),
    (0.05, FAT), (0.1999, FAT), (0.2015, FAT),
    (0.2025, CRI), (0.2075, CRI),
    (0.2085, SEV), (0.2155, SEV),
    (0.2165, MIL), (0.49, MIL),
    (0.50, ASY), (0.99, ASY),
]

# Parameter set B: dohc=0 (no renormalization), syc_raw=0.8,
# sc=0.25, cc=0.4, fc=0.5; vmod=1:
#   fc*cc*sc*syc = 0.5*0.4*0.25*0.8 = 0.04
#   cc*sc*syc    = 0.4*0.25*0.8     = 0.08
#   sc*syc       = 0.25*0.8         = 0.20
#   syc_raw                         = 0.80
B = dict(syc=0.8, dohc=0.0, sc=0.25, cc=0.4, fc=0.5)
B_UNVAX = [
    (0.039, FAT), (0.041, CRI), (0.079, CRI),
    (0.081, SEV), (0.199, SEV),
    (0.201, MIL), (0.799, MIL),
    (0.80, ASY),
]

CASES = ([(A, 1.0, v, e) for v, e in A_UNVAX]
         + [(A, 0.1, v, e) for v, e in A_VAX]
         + [(B, 1.0, v, e) for v, e in B_UNVAX])


@pytest.mark.parametrize("p,vmod,val,expected", CASES)
def test_jax_chain_matches_fixture(p, vmod, val, expected):
    import jax.numpy as jnp

    from reina_tpu.core.step import severity_from_uniform

    sev, outside = severity_from_uniform(
        jnp.float32(val), jnp.float32(p["syc"]), jnp.float32(p["dohc"]),
        jnp.float32(p["sc"]), jnp.float32(p["cc"]), jnp.float32(p["fc"]),
        jnp.float32(vmod))
    assert (int(sev), bool(outside)) == expected, (p, vmod, val)


class _FixedRng:
    """np.random.Generator stand-in returning one chosen uniform."""

    def __init__(self, val):
        self._val = val

    def random(self):
        return self._val


class _Tables:
    """DiseaseArrays stand-in: every (variant, age) cell holds the
    fixture's probability terms."""

    def __init__(self, p, n_ages=3):
        full = np.full((1, n_ages), 0.0, np.float64)
        self.p_sympt = full + p["syc"]
        self.p_doh = full + p["dohc"]
        self.p_severe_c = full + p["sc"]
        self.p_critical_c = full + p["cc"]
        self.p_fatal_c = full + p["fc"]


@pytest.mark.parametrize("p,vmod,val,expected", CASES)
def test_numpy_chain_matches_fixture(p, vmod, val, expected):
    from reina_tpu.core.state import np_severity_draw

    # vmod=0.1 <=> vaccinated more than VACCINE_DELAY_DAYS ago
    vdays = C.VACCINE_DELAY_DAYS + 10 if vmod != 1.0 else -1
    sev, outside = np_severity_draw(
        _FixedRng(val), _Tables(p), variant=0, age=1,
        vaccinated_days=vdays)
    assert (int(sev), bool(outside)) == expected, (p, vmod, val)


def test_vaccine_modifier_delay_edge():
    """Efficacy engages strictly AFTER the 14-day delay
    (main.pyx:1050-1056: ``days > 14``), in both implementations."""
    import jax.numpy as jnp

    from reina_tpu.core.step import vaccine_modifier

    dov = jnp.asarray([-1, 0, 0, 0], jnp.int16)
    day = jnp.int32(14)
    # day - dov: n/a, 14, and with day=15: 15
    assert vaccine_modifier(dov[:2], jnp.int32(14)).tolist() == [1.0, 1.0]
    got = vaccine_modifier(dov[:2], jnp.int32(15)).tolist()
    assert got[0] == 1.0 and abs(got[1] - (1.0 - C.VACCINE_EFFICACY)) < 1e-7

    # numpy twin: np_severity_draw consults vaccinated_days the same way
    from reina_tpu.core.state import np_severity_draw
    p = dict(syc=0.5, dohc=0.0, sc=0.4, cc=0.5, fc=0.25)
    # val=0.19: unmodified sc*syc=0.2 -> SEVERE; with efficacy
    # sc*syc*0.1=0.02 -> MILD
    sev_at, _ = np_severity_draw(_FixedRng(0.19), _Tables(p), 0, 1,
                                 vaccinated_days=14)
    sev_after, _ = np_severity_draw(_FixedRng(0.19), _Tables(p), 0, 1,
                                    vaccinated_days=15)
    assert sev_at == C.SEVERE and sev_after == C.MILD
