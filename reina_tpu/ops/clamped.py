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

import jax
import jax.numpy as jnp
from jax import lax

from .fusedmap import (LANE, _hs_prefix_block, _is_tpu, _largest_block,
                       shard_active, shard_ctx)

_NEG = -(1 << 30)  # python int: a module-scope jnp scalar would force
#                   jax backend init at import (hangs when the TPU
#                   tunnel is down before the server can even bind)


def _hs_max_block(x):
    """Inclusive prefix MAX of a (rows, LANE) block in flat row-major
    order (Hillis-Steele shift-maxes, the max-monoid twin of
    fusedmap._hs_prefix_block). Integer inputs — exact under any
    association, so kernel and fallback agree bit-for-bit."""
    rows, lanes = x.shape
    k = 1
    while k < lanes:
        pad = jnp.full((rows, k), _NEG, x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[:, :lanes - k]], axis=1))
        k *= 2
    # lane-broadcast the row-totals column (offset-0 layout; a lane-127
    # slice cannot be concatenated on dim 0 in Mosaic — see fusedmap)
    t = jnp.broadcast_to(x[:, lanes - 1:], (rows, lanes))
    # exclusive row-prefix max of the totals: scan the down-shifted rows
    r = jnp.concatenate([jnp.full((1, lanes), _NEG, x.dtype),
                         t[:rows - 1]], axis=0)
    k = 1
    while k < rows:
        pad = jnp.full((k, lanes), _NEG, x.dtype)
        r = jnp.maximum(r, jnp.concatenate([pad, r[:rows - k]], axis=0))
        k *= 2
    return jnp.maximum(x, r)


def _shift1(x, fill):
    """Shift a (rows, LANE) block one element later in flat row-major
    order; position 0 receives ``fill``."""
    rows, lanes = x.shape
    last = jnp.broadcast_to(x[:, lanes - 1:], (rows, lanes))
    prev = jnp.concatenate([jnp.full((1, lanes), fill, x.dtype),
                            last[:rows - 1]], axis=0)
    return jnp.concatenate([prev[:, :1], x[:, :lanes - 1]], axis=1)


def _ledger_kernel(releases, requests, offset, base, interpret=False,
                   emit_carry=False):
    """The streaming-scan launch behind :func:`_grants_streaming`:
    per-ledger U/rm streams for L release/request column lists (each a
    flat (n,) stream — the per-column layout avoids the (n, L)
    interleave relayouts an axis-1 stack costs, ~0.3 ms/day at HUS
    scale), plus — with ``emit_carry`` — the kernel's final (L, 3) SMEM
    carries (running sum of a, running max of key_a, running max of
    key) so a mesh shard can hand its successor the exact sequential
    state (scalar stores must target SMEM, not a VMEM block). ``base``
    is the global position of this slab's first element (0 unsharded;
    shard_index·n_local on a mesh) — the cyclic-sweep mask ``in_a`` is
    a function of GLOBAL position."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, L = releases[0].shape[0], len(releases)
    # force="pallas" on an ineligible size would give blk ∤ R: G = R//blk
    # truncates and the tail rows are never written by any grid step —
    # fail loudly instead of returning uninitialized grants
    assert n % (8 * LANE) == 0, (
        f"_ledger_kernel needs n % {8 * LANE} == 0, got n={n}")
    R = n // LANE
    blk = _largest_block(R, 512, 8)
    G = R // blk

    def kernel(*refs):
        off_ref = refs[0]
        rel_refs = refs[1:1 + L]
        req_refs = refs[1 + L:1 + 2 * L]
        u_refs = refs[1 + 2 * L:1 + 3 * L]
        rm_refs = refs[1 + 3 * L:1 + 4 * L]
        carr_ref = refs[1 + 4 * L] if emit_carry else None
        acc_ref = refs[-1]                      # SMEM (L, 3) carries
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            for led in range(L):
                acc_ref[led, 0] = 0             # running sum of a
                acc_ref[led, 1] = _NEG          # running max of key_a
                acc_ref[led, 2] = _NEG          # running max of key

        pos = (off_ref[0, 1] + g * blk * LANE
               + lax.broadcasted_iota(jnp.int32, (blk, LANE), 0) * LANE
               + lax.broadcasted_iota(jnp.int32, (blk, LANE), 1))
        in_a = pos >= off_ref[0, 0]

        for led in range(L):
            rel = rel_refs[led][...].astype(jnp.int32)
            req = req_refs[led][...].astype(jnp.int32)
            a = rel - req
            s0 = acc_ref[led, 0]
            s_incl = _hs_prefix_block(a) + s0
            s_excl = s_incl - a
            key = jnp.where(req == 1, 0, _NEG) - s_incl
            key_a = jnp.where(in_a, key, _NEG)
            rma_x = jnp.maximum(_shift1(_hs_max_block(key_a), _NEG),
                                acc_ref[led, 1])
            rmf_x = jnp.maximum(_shift1(_hs_max_block(key), _NEG),
                                acc_ref[led, 2])
            u_refs[led][...] = s_excl + rel
            rm_refs[led][...] = jnp.where(in_a, rma_x, rmf_x)
            acc_ref[led, 0] = s0 + jnp.sum(a)
            acc_ref[led, 1] = jnp.maximum(acc_ref[led, 1], jnp.max(key_a))
            acc_ref[led, 2] = jnp.maximum(acc_ref[led, 2], jnp.max(key))

        if emit_carry:
            @pl.when(g == G - 1)
            def _emit():
                for led in range(L):
                    for j in range(3):
                        carr_ref[led, j] = acc_ref[led, j]

    bs = pl.BlockSpec((blk, LANE), lambda g: (g, 0))
    off2 = jnp.stack([jnp.asarray(offset, jnp.int32),
                      jnp.asarray(base, jnp.int32)]).reshape(1, 2)
    carry_out = ([jax.ShapeDtypeStruct((L, 3), jnp.int32)]
                 if emit_carry else [])
    carry_spec = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  if emit_carry else [])
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=[jax.ShapeDtypeStruct((R, LANE), jnp.int32)
                   for _ in range(2 * L)] + carry_out,
        in_specs=[pl.BlockSpec((1, 2), lambda g: (0, 0))]
        + [bs] * (2 * L),
        out_specs=[bs] * (2 * L) + carry_spec,
        scratch_shapes=[pltpu.SMEM((L, 3), jnp.int32)],
        interpret=interpret,
    )(off2, *(r.reshape(R, LANE) for r in releases),
      *(q.reshape(R, LANE) for q in requests))
    U = [o.reshape(n) for o in outs[:L]]
    rm = [o.reshape(n) for o in outs[L:2 * L]]
    return U, rm, (outs[2 * L] if emit_carry else None)


def _grants_streaming(releases, requests, init, offset, interpret=False):
    """Single-pass streaming formulation of the ledger scans: ONE Pallas
    kernel reads each release/request byte once and emits, per ledger,

      U[i]  = s_excl[i] + rel[i]                     (i32)
      rm[i] = rm_a_excl[i]  if i >= offset           (i32)
              rm_f_excl[i]  otherwise

    (the only running-max each position consults). The device trace had
    the XLA path's 6 separate 1-D reduce-window scans at ~3 ms/day at
    HUS scale; the streaming kernel carries (sum, masked-max, max) per
    ledger in SMEM and pays one read + two writes of HBM traffic.

    Bit-identity caveat: only the RETURNED (granted, final) pair is
    bit-identical to the reduce-window path. The intermediate rm stream
    saturates at _NEG for all-sentinel prefixes (keys at non-request
    positions are _NEG − s_incl, which drops below _NEG when s_incl > 0,
    and the Hillis-Steele pads / _shift1 / SMEM-carry fills clamp the
    running max up to _NEG where lax.cummax would carry the true
    sub-_NEG value). Every consumer here maxes rm against a real balance
    that dwarfs _NEG, so the grant math is unaffected — but rm/U must
    only ever be consumed via max() against real balances.

    Every boundary scalar the closed form needs comes back out of U/rm
    with single-element gathers (no scalar outputs):
      s_tot    = U[N-1] - req[N-1]          (s_incl = U - req)
      rm_a_end = max(rm[N-1], key[N-1])
      c_off    = U[offset] - rel[offset]
      rm_f_excl[offset] = max(rm[offset-1], key[offset-1])  (NEG if 0)

    All-integer arithmetic — bit-identical to the reduce-window path by
    exactness, verified by tests/test_clamped.py against both."""
    U, rm, _carr = _ledger_kernel(releases, requests, offset,
                                  jnp.int32(0), interpret)
    return _grants_from_streams(U, rm, releases, requests, init, offset)


def _grants_from_streams(U, rm, releases, requests, init, offset):
    """The closed-form consumption of the kernel's U/rm streams: every
    boundary scalar comes back out with single-element gathers, then the
    grant decision is one elementwise pass per ledger column (see
    _grants_streaming). All per-ledger inputs/outputs are LISTS of (n,)
    streams."""
    n = releases[0].shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    in_a_v = idx >= offset
    om1 = jnp.clip(offset - 1, 0, n - 1)
    granted, finals = [], []
    for led in range(len(releases)):
        relv = releases[led].astype(jnp.int32)
        reqv = requests[led].astype(jnp.int32)
        Ul, rml = U[led], rm[led]
        key_at = lambda i: (jnp.where(reqv[i] == 1, 0, _NEG)
                            - (Ul[i] - reqv[i]))
        s_tot = Ul[n - 1] - reqv[n - 1]
        rm_a_end = jnp.maximum(rml[n - 1], key_at(n - 1))
        c_off = Ul[offset] - relv[offset]
        rmb_end = jnp.where(offset > 0,
                            jnp.maximum(rml[om1], key_at(om1)), _NEG)

        base_a = init[led].astype(jnp.int32) - c_off
        final_a = s_tot + jnp.maximum(base_a, rm_a_end)
        final_b = c_off + jnp.maximum(final_a, rmb_end)
        arriving_p = Ul + jnp.where(in_a_v,
                                    jnp.maximum(base_a, rml),
                                    jnp.maximum(final_a, rml))
        granted.append(requests[led] & (arriving_p > 0))
        finals.append(final_b)
    return granted, jnp.stack(finals)


def _grants_sharded(releases, requests, init, offset, ctx):
    """Mesh-sharded twin of :func:`_grants_streaming`: every shard runs
    the streaming kernel on its agent slab (global cyclic-sweep mask via
    its base position), then the per-shard SMEM carries — running sum
    and the two running key maxes, all exact int32 — are all-gathered
    and folded so each shard applies its predecessors' exact sequential
    state: U += excl-sum, rm = max(rm − excl-sum, carry-max). The
    (granted, final) pair is bit-identical to the unsharded kernel (max
    commutes with the constant shift; the only discrepancy is the _NEG
    saturation floor's exact value, which every consumer maxes against a
    real balance that dwarfs it — see the kernel docstring)."""
    import jax
    from jax.sharding import PartitionSpec as P

    mesh, ax, interp = ctx
    n, L = releases[0].shape[0], len(releases)
    nloc = n // mesh.shape[ax]
    k = mesh.shape[ax]

    def _local(off, *cols):
        rel, req = list(cols[:L]), list(cols[L:])
        i = jax.lax.axis_index(ax).astype(jnp.int32)
        base = i * nloc
        U_loc, rm_loc, carr = _ledger_kernel(rel, req, off, base, interp,
                                             emit_carry=True)
        allc = jax.lax.all_gather(carr, ax)             # (k, L, 3)
        sums = allc[:, :, 0]
        s_excl = jnp.cumsum(sums, axis=0) - sums        # (k, L)
        s0 = s_excl[i]                                  # (L,)
        adj_a = allc[:, :, 1] - s_excl   # per-shard maxes, global-keyed
        adj_f = allc[:, :, 2] - s_excl
        before = jnp.arange(k)[:, None] < i
        m_a0 = jnp.max(jnp.where(before, adj_a, _NEG), axis=0)
        m_f0 = jnp.max(jnp.where(before, adj_f, _NEG), axis=0)
        pos = base + jnp.arange(nloc, dtype=jnp.int32)
        in_a = pos >= off
        U = [u + s0[led] for led, u in enumerate(U_loc)]
        rm = [jnp.maximum(r - s0[led],
                          jnp.where(in_a, m_a0[led], m_f0[led]))
              for led, r in enumerate(rm_loc)]
        return tuple(U) + tuple(rm)

    outs = jax.shard_map(
        _local, mesh=mesh, in_specs=(P(),) + (P(ax),) * (2 * L),
        out_specs=(P(ax),) * (2 * L), check_vma=False)(
        jnp.asarray(offset, jnp.int32), *releases, *requests)
    U, rm = list(outs[:L]), list(outs[L:])
    return _grants_from_streams(U, rm, releases, requests, init, offset)


def clamped_counter_grants(releases, requests, init, offset,
                           force=None):
    """Grant/deny requests against a clamped counter in cyclic sweep order.

    Args:
      releases: (N,) int32 — units returned at each position (>= 0).
      requests: (N,) bool — whether the agent requests one unit.
      init: scalar int32 — counter value at sweep start.
      offset: scalar int32 — sweep starts at position ``offset`` and
        wraps (the reference's random start index, main.pyx:1988).

    Several independent counters (hospital beds, ICU units) run as a
    LIST (or tuple) of L (N,) release/request columns with (L,) init —
    each ledger runs 1-D cumulative passes (XLA's fast reduce-window
    path; an (N, 2L)-lane pass relayouts to [2L, N/128, 128] tiles and
    measures ~2-3x slower on TPU, and even BUILDING an (N, L) operand
    from per-stream columns costs ~0.3 ms/day of interleave relayouts —
    day-200 trace 2026-08-21 — so columns stay flat end-to-end). An
    (N, L) array is also accepted and split into columns.

    The cyclic wrap ([offset, N) then [0, offset)) needs NO masked
    cumsum lanes: segment-local prefix *sums* fall out of the one
    unmasked cumsum by subtracting the scalar prefix at ``offset``
    (max(x+c, y+c) = max(x, y)+c moves the correction outside the
    cummax), and for positions i < offset the unmasked running max
    already equals segment b's (every j < i is in segment b). Only
    segment a needs its own masked cummax — 1 cumsum + 2 cummax 1-D
    passes per ledger.

    Returns:
      granted: (N,) bool — or a TUPLE of L (N,) bools for multi-ledger
        input — request approved (counter was > 0 on arrival, counting
        the position's own release first).
      final: scalar or (L,) int32 — counter value after the full sweep.
    """
    init = jnp.asarray(init, jnp.int32)
    if isinstance(releases, (list, tuple)):
        rel_cols = [r.astype(jnp.int32) for r in releases]
        req_cols = list(requests)
        squeeze = False
    else:
        releases = releases.astype(jnp.int32)
        squeeze = releases.ndim == 1
        if squeeze:
            rel_cols, req_cols = [releases], [requests]
            init = init.reshape(init.shape or (1,)) if init.ndim == 0 \
                else init[..., None]
        else:
            rel_cols = [releases[:, j] for j in range(releases.shape[1])]
            req_cols = [requests[:, j] for j in range(requests.shape[1])]
    n = rel_cols[0].shape[0]
    L = len(rel_cols)

    def _out(granted, final):
        if squeeze:
            return granted[0], final[0]
        if isinstance(releases, (list, tuple)):
            return tuple(granted), final
        return jnp.stack(granted, axis=1), final

    if force is None and shard_active():
        ctx = shard_ctx(n, 8 * LANE)
        if ctx is not None:
            return _out(*_grants_sharded(rel_cols, req_cols, init,
                                         offset, ctx))
        force = "xla"   # sharded but island-ineligible: GSPMD fallback

    use_pallas = force in ("pallas", "interpret") or (
        force is None and _is_tpu() and n % (8 * LANE) == 0)
    if use_pallas:
        return _out(*_grants_streaming(
            rel_cols, req_cols, init, offset,
            interpret=force == "interpret"))

    idx = jnp.arange(n, dtype=jnp.int32)
    in_a = idx >= offset
    pad1 = jnp.full((1,), _NEG, jnp.int32)

    granted_cols = []
    finals = []
    for led in range(L):
        rel = rel_cols[led]
        req = req_cols[led]
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

    return _out(granted_cols, jnp.stack(finals))
