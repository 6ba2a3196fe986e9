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

    Both wrap segments ([offset, N) then [0, offset)) ride the same
    cumsum/cummax pass as extra lanes: the only cross-segment coupling
    is segment b's initial balance (segment a's final), and the init
    enters the closed form elementwise AFTER the cumulative passes —
    so one (N, 2·L) pass pair replaces two sequential (N, L) pairs.

    Returns:
      granted: (N,) or (N, L) bool — request approved (counter was > 0
        on arrival, counting the position's own release first).
      final: scalar or (L,) int32 — counter value after the full sweep.
    """
    n = releases.shape[0]
    releases = releases.astype(jnp.int32)
    init = jnp.asarray(init, jnp.int32)
    squeeze = releases.ndim == 1
    if squeeze:
        releases = releases[:, None]
        requests = requests[:, None]
        init = init.reshape(init.shape or (1,)) if init.ndim == 0 \
            else init[..., None]
    L = releases.shape[1]

    a = releases - requests.astype(jnp.int32)
    m = jnp.where(requests, 0, _NEG)

    idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    in_a = idx >= offset

    # lanes [0:L] = segment a (positions >= offset), [L:2L] = segment b
    a2 = jnp.concatenate([jnp.where(in_a, a, 0), jnp.where(in_a, 0, a)],
                         axis=1)
    m2 = jnp.concatenate([jnp.where(in_a, m, _NEG),
                          jnp.where(in_a, _NEG, m)], axis=1)

    s_incl = jnp.cumsum(a2, axis=0)
    s_excl = s_incl - a2
    key = m2 - s_incl
    run_max = lax.cummax(key, axis=0)
    pad = jnp.full((1, 2 * L), _NEG, jnp.int32)
    run_max_excl = jnp.concatenate([pad, run_max[:-1]], axis=0)

    final_a = s_incl[-1, :L] + jnp.maximum(init, run_max[-1, :L])
    arriving_a = s_excl[:, :L] + jnp.maximum(init, run_max_excl[:, :L])
    arriving_b = s_excl[:, L:] + jnp.maximum(final_a, run_max_excl[:, L:])
    final_b = s_incl[-1, L:] + jnp.maximum(final_a, run_max[-1, L:])

    arriving = jnp.where(in_a, arriving_a, arriving_b)
    granted = requests & ((arriving + releases) > 0)
    if squeeze:
        return granted[:, 0], final_b[0]
    return granted, final_b
