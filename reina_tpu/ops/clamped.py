"""Clamped-counter prefix scan: exact sequential scarce-resource semantics
as a parallel associative scan.

The reference engine hands out hospital beds / ICU units first-come-
first-served while sweeping agents in cyclic order from a random start
offset (main.pyx:617-648, 1982-1992): at each position a *release*
returns a unit (counter += 1) and a *request* is granted iff the
counter is positive (counter -= 1, floored at 0).

That sequential automaton is a composition of functions of the form
``f(x) = max(x + a, m)``, which are closed under composition::

    (g ∘ f)(x) = max(x + a_f + a_g, max(m_f + a_g, m_g))

so the whole sweep is one ``lax.associative_scan`` — O(N) work,
O(log N) depth, exact sequential semantics on a parallel machine.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.int32(-(1 << 30))


def _compose(f, g):
    """Apply f first, then g; both elementwise (a, m) pairs."""
    a_f, m_f = f
    a_g, m_g = g
    return a_f + a_g, jnp.maximum(m_f + a_g, m_g)


def clamped_counter_grants(releases, requests, init, offset):
    """Grant/deny requests against a clamped counter in cyclic sweep order.

    Args:
      releases: (N,) int32 — units returned at each position (>= 0).
      requests: (N,) bool — whether the agent requests one unit.
      init: scalar int32 — counter value at sweep start.
      offset: scalar int32 — sweep starts at position ``offset`` and
        wraps (the reference's random start index, main.pyx:1988).

    Returns:
      granted: (N,) bool — request approved (counter was > 0 on arrival).
      final: scalar int32 — counter value after the full sweep.

    A position with both a release and a request applies the release
    first (the reference's to-ICU path frees the ward bed before
    claiming the ICU unit, but those hit *different* counters; within
    one counter an agent only ever has one event).
    """
    n = releases.shape[0]
    releases = releases.astype(jnp.int32)

    # Per-position transfer function. Release: x -> x + r. Request:
    # x -> max(x - 1, 0). Combined (release then request):
    # x -> max(x + r - 1, 0) when requesting.
    a = releases - requests.astype(jnp.int32)
    m = jnp.where(requests, 0, _NEG)

    # Rotate into sweep order.
    a_r = jnp.roll(a, -offset)
    m_r = jnp.roll(m, -offset)
    rel_r = jnp.roll(releases, -offset)
    req_r = jnp.roll(requests, -offset)

    a_in, m_in = jax.lax.associative_scan(_compose, (a_r, m_r))
    # Inclusive scan → value after position i: max(init + a_in, m_in).
    after = jnp.maximum(init + a_in, m_in)
    # Value arriving at position i (before its own event) is the value
    # after position i-1; init for position 0.
    arriving = jnp.concatenate([jnp.full((1,), init, jnp.int32), after[:-1]])
    granted_r = req_r & ((arriving + rel_r) > 0)
    final = after[-1]

    granted = jnp.roll(granted_r, offset)
    return granted, final
