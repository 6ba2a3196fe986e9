"""Clamped-counter prefix scan: exact sequential scarce-resource semantics
with parallel prefix primitives.

The reference engine hands out hospital beds / ICU units first-come-
first-served while sweeping agents in cyclic order from a random start
offset (main.pyx:617-648, 1982-1992): at each position a *release*
returns a unit (counter += 1) and a *request* is granted iff the
counter is positive (counter -= 1, floored at 0).

The sequential automaton is b_i = max(b_{i-1} + a_i, m_i) — a
composition of max-plus affine maps f(x) = max(x + a, m). Composing
f_0 … f_{i-1} onto the initial balance has the closed form

    arriving_i = S⁻_i + max(init, max_{j<i}(m_j − S_j))

with S the inclusive prefix sum of a and S⁻ its exclusive version —
i.e. one ``cumsum`` plus one ``cummax``. Those are XLA fast-path
cumulative ops; a generic-monoid ``lax.associative_scan`` (the previous
implementation) de-optimizes the entire surrounding program on this
TPU toolchain (tools/profile_morph.py: 0.06 ms → 1475 ms).

The cyclic sweep order is handled without any rotation: positions are
split into the segments [offset, N) and [0, offset); events outside a
segment become identities (a=0, m=−∞), which are also the identities of
cumsum/cummax, so each segment is a masked prefix over the *original*
order and the second segment starts from the first segment's final
balance.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_NEG = jnp.int32(-(1 << 30))


def _masked_prefix(a, m, init):
    """arriving_i (before position i's own event) and the final balance
    for one masked segment, given per-position (a, m) with identities
    (0, −∞) outside the segment. Arrays are (N,) or (N, L) — the
    trailing axis batches independent ledgers into one scan pass."""
    s_incl = jnp.cumsum(a, axis=0)
    s_excl = s_incl - a
    key = m - s_incl
    run_max = lax.cummax(key, axis=0)
    # exclusive shift: positions see the max of keys strictly before them
    pad = jnp.full((1,) + a.shape[1:], _NEG, jnp.int32)
    run_max_excl = jnp.concatenate([pad, run_max[:-1]], axis=0)
    arriving = s_excl + jnp.maximum(init, run_max_excl)
    final = s_incl[-1] + jnp.maximum(init, run_max[-1]) \
        if a.shape[0] else init
    return arriving, final


def clamped_counter_grants(releases, requests, init, offset):
    """Grant/deny requests against a clamped counter in cyclic sweep order.

    Args:
      releases: (N,) int32 — units returned at each position (>= 0).
      requests: (N,) bool — whether the agent requests one unit.
      init: scalar int32 — counter value at sweep start.
      offset: scalar int32 — sweep starts at position ``offset`` and
        wraps (the reference's random start index, main.pyx:1988).

    Arrays may carry a trailing ledger axis L — (N, L) releases/requests
    with (L,) init — to run several independent counters (hospital beds,
    ICU units) in ONE pair of cumulative passes; the sweep offset is
    shared.

    Returns:
      granted: (N,) or (N, L) bool — request approved (counter was > 0
        on arrival, counting the position's own release first).
      final: scalar or (L,) int32 — counter value after the full sweep.
    """
    n = releases.shape[0]
    releases = releases.astype(jnp.int32)
    init = jnp.asarray(init, jnp.int32)

    a = releases - requests.astype(jnp.int32)
    m = jnp.where(requests, 0, _NEG)

    idx = jnp.arange(n, dtype=jnp.int32)
    if a.ndim == 2:
        idx = idx[:, None]
    in_a = idx >= offset

    a_seg_a = jnp.where(in_a, a, 0)
    m_seg_a = jnp.where(in_a, m, _NEG)
    arriving_a, final_a = _masked_prefix(a_seg_a, m_seg_a, init)

    a_seg_b = jnp.where(in_a, 0, a)
    m_seg_b = jnp.where(in_a, _NEG, m)
    arriving_b, final_b = _masked_prefix(a_seg_b, m_seg_b, final_a)

    arriving = jnp.where(in_a, arriving_a, arriving_b)
    granted = requests & ((arriving + releases) > 0)
    return granted, final_b
