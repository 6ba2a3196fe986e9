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

_NEG = -(1 << 30)  # python int: a module-scope jnp scalar would force
#                   jax backend init at import (hangs when the TPU
#                   tunnel is down before the server can even bind)


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
    ICU units); each ledger runs 1-D cumulative passes (XLA's fast
    reduce-window path; an (N, 2L)-lane pass relayouts to [2L, N/128,
    128] tiles and measures ~2-3x slower on TPU — the device trace had
    the lane-stacked pair at 3.8 ms/day vs ~0.3 ms per 1-D pass).

    The cyclic wrap ([offset, N) then [0, offset)) needs NO masked
    cumsum lanes: segment-local prefix *sums* fall out of the one
    unmasked cumsum by subtracting the scalar prefix at ``offset``
    (max(x+c, y+c) = max(x, y)+c moves the correction outside the
    cummax), and for positions i < offset the unmasked running max
    already equals segment b's (every j < i is in segment b). Only
    segment a needs its own masked cummax — 1 cumsum + 2 cummax 1-D
    passes per ledger.

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

    idx = jnp.arange(n, dtype=jnp.int32)
    in_a = idx >= offset
    pad1 = jnp.full((1,), _NEG, jnp.int32)

    granted_cols = []
    finals = []
    for led in range(L):
        rel = releases[:, led]
        req = requests[:, led]
        a = rel - req.astype(jnp.int32)
        m = jnp.where(req, 0, _NEG)

        s_incl = jnp.cumsum(a)
        s_excl = s_incl - a
        c_off = s_excl[offset]            # prefix sum entering segment a

        key = m - s_incl                  # segment-b keys (unmasked)
        key_a = jnp.where(in_a, key, _NEG)
        rm_a = lax.cummax(key_a)
        rm_f = lax.cummax(key)
        rm_a_excl = jnp.concatenate([pad1, rm_a[:-1]])
        rm_f_excl = jnp.concatenate([pad1, rm_f[:-1]])

        base_a = init[led] - c_off
        final_a = s_incl[-1] + jnp.maximum(base_a, rm_a[-1])
        arriving_a = s_excl + jnp.maximum(base_a, rm_a_excl)
        arriving_b = s_excl + jnp.maximum(final_a, rm_f_excl)
        # segment b's closing balance: its total is c_off, its running
        # max is the unmasked prefix max just before ``offset``
        final_b = c_off + jnp.maximum(final_a, rm_f_excl[offset])

        arriving = jnp.where(in_a, arriving_a, arriving_b)
        granted_cols.append(req & ((arriving + rel) > 0))
        finals.append(final_b)

    if squeeze:
        return granted_cols[0], finals[0]
    return jnp.stack(granted_cols, axis=1), jnp.stack(finals)
