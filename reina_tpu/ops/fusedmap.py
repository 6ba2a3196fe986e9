"""Single-launch fused elementwise passes over the agent axis.

XLA splits a large elementwise phase into several fusion clusters, each
paying this toolchain's per-op floor and re-reading shared inputs
(measured: a 5-in/5-out N-pass costs 1.9 ms as XLA fusions vs 0.91 ms
as ONE Pallas kernel — docs/performance.md). ``fused_map`` runs a pure
per-agent function as a single Pallas kernel with a 1-D block grid.

Design rules that keep it safe:
  * The SAME jnp function body runs in both paths — the Pallas kernel
    and the plain-XLA fallback are bit-identical by construction.
  * No RNG and no cross-agent communication inside the body; uniforms
    are drawn outside and passed as (N,) inputs.
  * Traced scalars and small per-variant tables ride as ``smalls``
    (replicated whole into every block); python constants may close
    over ``fn`` freely.
  * The Pallas path engages only on TPU with N divisible by 1024;
    meshes/CPU/odd paddings take the identical fallback, so sharded
    multi-chip runs keep XLA's auto-partitioning.
"""
from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

LANE = 128

# ---------------------------------------------------------------------------
# Agent-axis shard_map islands
#
# GSPMD cannot partition a pallas_call, so mesh-sharded runs used to force
# every fused op onto its (2× slower) XLA fallback. Instead, when a shard
# context is active each op wraps its OWN kernel in a `jax.shard_map` island
# over the mesh's agent axis: every chip runs the single-launch kernel on its
# local shard and the cross-shard values travel as explicit collectives —
# psum for the (K, n_b) histogram partials, an all-gather of per-shard carry
# scalars for the sequential scans. Bit-identity with the unsharded program
# is preserved op-by-op: elementwise kernels shard trivially, the histogram
# partials are exact-integer f32 sums (associative), and the scan carries are
# exact integers combined in a deterministic fold. The one float-associative
# op (fused_concat_prefix over real-valued weights) declines the island and
# keeps the GSPMD-partitioned fallback (`exact_int` gates it).
# ---------------------------------------------------------------------------

# (mesh, axis_name, interpret) | None — a ContextVar so concurrent or
# reentrant run_days calls (e.g. a threaded ensemble driver mixing mesh
# and non-mesh runs) can't cross-contaminate which ops trace as islands.
_SHARD_VAR: "contextvars.ContextVar[tuple | None]" = contextvars.ContextVar(
    "reina_shard_pallas", default=None)


def _shard_get() -> tuple | None:
    return _SHARD_VAR.get()


@contextlib.contextmanager
def shard_pallas(mesh, axis: str = "agent"):
    """Activate shard_map islands for fused kernels traced inside the
    context. ``REINA_SHARD_INTERPRET=1`` runs the island kernels through
    the Pallas interpreter (CPU CI for the island/collective logic)."""
    interp = os.environ.get("REINA_SHARD_INTERPRET", "0") == "1"
    token = _SHARD_VAR.set((mesh, axis, interp))
    try:
        yield
    finally:
        _SHARD_VAR.reset(token)


def shard_active() -> bool:
    """True while a shard_pallas context is open (ops must then choose
    the island or the GSPMD-partitionable fallback — never bare Pallas)."""
    return _shard_get() is not None


def shard_ctx(n: int, mult: int):
    """The active shard context, if ``n`` splits into per-shard lengths
    compatible with the kernels' ``mult`` alignment — else None."""
    shard = _shard_get()
    if shard is None:
        return None
    mesh, ax, interp = shard
    k = mesh.shape[ax]
    if n % (k * mult) != 0:
        return None
    if not (interp or _is_tpu()):
        return None
    return mesh, ax, interp


def _is_tpu() -> bool:
    # REINA_PALLAS=0 is the operational escape hatch: every fused op
    # falls back to its bit-identical XLA formulation (bench.py retries
    # a failed first compile with it set)
    if os.environ.get("REINA_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _as_2d(x):
    x = jnp.asarray(x)
    return x.reshape(1, -1) if x.ndim <= 1 else x


def fused_map(fn: Callable, n_out: int, arrays: Sequence[jnp.ndarray],
              smalls: Sequence[Any] = (), max_block_rows: int = 512,
              force: str | None = None):
    """Apply ``fn(*array_blocks, *smalls_2d) -> tuple[n_out arrays]``
    elementwise over (N,) arrays as one Pallas kernel.

    Args:
      fn: pure elementwise function. The (N,) inputs arrive shaped
        (rows, 128); each ``smalls`` entry arrives as its 2-D form
        (scalars as (1, 1), (V,) tables as (1, V)) — index them
        explicitly (e.g. ``day = day_s[0, 0]``).
      n_out: number of outputs (dtypes from an abstract eval of fn).
      arrays: (N,) device arrays, all the same length.
      smalls: traced scalars / small tables, replicated to every block.
      force: "pallas" | "xla" | "interpret" | None (auto); "interpret"
        runs the kernel logic through the Pallas interpreter (CPU CI).

    Returns: tuple of n_out (N,) arrays.
    """
    N = arrays[0].shape[0]
    for a in arrays:
        assert a.shape == (N,), (a.shape, N)
    smalls2 = [_as_2d(s) for s in smalls]
    n_arr = len(arrays)

    if force is None and _shard_get() is not None:
        ctx = shard_ctx(N, 8 * LANE)
        if ctx is not None:
            mesh, ax, interp = ctx
            frc = "interpret" if interp else "pallas"

            def _local(*ins):
                return fused_map(fn, n_out, ins[:n_arr], ins[n_arr:],
                                 max_block_rows, force=frc)

            return jax.shard_map(
                _local, mesh=mesh,
                in_specs=(P(ax),) * n_arr + (P(),) * len(smalls2),
                out_specs=(P(ax),) * n_out, check_vma=False,
            )(*arrays, *smalls2)
        force = "xla"   # sharded but island-ineligible: GSPMD fallback

    interpret = force == "interpret"
    use_pallas = interpret or force == "pallas" or (
        force is None and _is_tpu() and N % (8 * LANE) == 0)
    if not use_pallas:
        out = fn(*arrays, *smalls2)
        return out if isinstance(out, tuple) else (out,)

    from jax.experimental import pallas as pl

    R = N // LANE
    # largest row-block ≤ max_block_rows that divides R and keeps the
    # sublane constraint (multiples of 8)
    blk = 8
    for cand in range(min(max_block_rows, R) // 8 * 8, 7, -8):
        if R % cand == 0:
            blk = cand
            break
    grid = (R // blk,)

    out_aval = jax.eval_shape(lambda *a: fn(*a, *smalls2), *arrays)
    if not isinstance(out_aval, tuple):
        out_aval = (out_aval,)
    assert len(out_aval) == n_out, (len(out_aval), n_out)

    def kernel(*refs):
        in_refs = refs[:n_arr]
        small_refs = refs[n_arr:n_arr + len(smalls2)]
        out_refs = refs[n_arr + len(smalls2):]
        vals = fn(*(r[...] for r in in_refs),
                  *(r[...] for r in small_refs))
        if not isinstance(vals, tuple):
            vals = (vals,)
        for r, v in zip(out_refs, vals):
            r[...] = v

    bs = pl.BlockSpec((blk, LANE), lambda i: (i, 0))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[jax.ShapeDtypeStruct((R, LANE), o.dtype)
                   for o in out_aval],
        in_specs=[bs] * n_arr + [
            pl.BlockSpec(s.shape, lambda i, nd=s.ndim: (0,) * nd)
            for s in smalls2],
        out_specs=[bs] * n_out,
        interpret=interpret,
    )(*(a.reshape(R, LANE) for a in arrays), *smalls2)
    return tuple(o.reshape(N) for o in outs)


def _largest_block(n: int, want: int, mult: int) -> int:
    blk = mult
    for cand in range(min(want, n) // mult * mult, mult - 1, -mult):
        if n % cand == 0:
            return cand
    return blk


def _onehot_bf16(code, n_cat: int):
    """(m, n_cat) bf16 one-hot; out-of-range codes give a zero row.
    Built with broadcasted_iota + compare (works identically inside a
    Mosaic kernel block and in the XLA fallback)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (code.shape[0], n_cat), 1)
    return (code[:, None] == iota).astype(jnp.float32).astype(jnp.bfloat16)


def _row_dots(cols, oh):
    """ONE (K, m)×(m, n_b) dot sharing one one-hot rhs. Inside a Mosaic
    kernel every (m, 1) column pads to (m, 128) lanes, so concatenating
    K columns into an (m, K) lhs allocated K padded copies and blew the
    16 MB scoped-vmem budget; the TRANSPOSED (K, m) stack pads only K
    rows to the sublane multiple (~free) and needs no layout transpose
    for the standard A(K×m)·B(m×n_b) contraction — one MXU pass where
    K separate (1, m) row dots each wasted 127/128 of the systolic
    array's M rows. Exact-integer f32 accumulation, so the batched dot
    is bit-identical to the per-row dots."""
    lhs = jnp.concatenate(
        [c.astype(jnp.float32).reshape(1, -1) for c in cols],
        axis=0).astype(jnp.bfloat16)                      # (K, m)
    return jax.lax.dot_general(lhs, oh, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _lhs_rows(cols):
    """(K, m) bf16 row-stack of K (m,) mask/int columns — the XLA
    fallbacks' dot lhs. Row-major: each row is a contiguous N-copy
    (free-ish) and the dot contracts ((1,), (0,)), the natural
    (M,K)×(K,N) orientation. The previous (m, K) column build paid
    ~0.6 ms/day of lane-interleave concat + K pred[m,1] bitcast copies
    at HUS scale (day-200 trace 2026-08-21). Exact-integer bf16 values,
    f32 accumulation — bit-identical counts either way."""
    return jnp.stack(
        [c.astype(jnp.float32).astype(jnp.bfloat16) for c in cols],
        axis=0)


def fused_onehot_sum(parts, code_b, n_b: int,
                     max_block: int = 32768, force: str | None = None):
    """out[k, b] = sum_i parts[k][i] * [code_b[i] == b] as blockwise
    MXU dots, WITHOUT materializing the (N, K) mask stack or the
    (N, n_b) one-hot in HBM (each cost an N-pass of write+read per
    use in the XLA formulation — device trace: concatenate.628 +
    dot at ~0.95 ms/day for the 13-mask group counts).

    parts: K same-length (N,) arrays — bool masks or small ints,
      anything exact in bfloat16. code_b: (N,) int32; out-of-range
      codes contribute nothing. Returns (K, n_b) float32 — exact for
      integer-valued parts with column totals < 2^24 (f32 sums of
      exact integers are associative), so the Pallas kernel and the
      fallback agree bit-for-bit.
    """
    # max_block 32768 measured best of {8k, 16k, 32k, 64k} for the
    # histogram family on the bench TPU (64k regresses fused_bihistogram
    # 2x — VMEM pressure); fewer grid steps amortize the per-block
    # reshape/concat chains.
    K = len(parts)
    N = parts[0].shape[0]
    code_b = code_b.astype(jnp.int32)

    if force is None and _shard_get() is not None:
        ctx = shard_ctx(N, 1024)
        if ctx is not None:
            mesh, ax, interp = ctx
            frc = "interpret" if interp else "pallas"

            def _local(cb, *ps):
                # per-shard partial counts are exact-integer f32, so the
                # psum is associative-exact: bit-identical to unsharded
                return jax.lax.psum(
                    fused_onehot_sum(ps, cb, n_b, max_block, force=frc), ax)

            return jax.shard_map(
                _local, mesh=mesh, in_specs=(P(ax),) * (1 + K),
                out_specs=P(), check_vma=False)(code_b, *parts)
        force = "xla"

    interpret = force == "interpret"
    use_pallas = interpret or force == "pallas" or (
        force is None and _is_tpu() and N % 1024 == 0)
    if not use_pallas:
        return jax.lax.dot_general(
            _lhs_rows(parts), _onehot_bf16(code_b, n_b),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (K, n_b)

    from jax.experimental import pallas as pl

    bs = _largest_block(N, max_block, 1024)

    def kernel(code_ref, *refs):
        part_refs, o_ref = refs[:K], refs[K]
        acc = _row_dots([r[...] for r in part_refs],
                        _onehot_bf16(code_ref[...], n_b))

        @pl.when(pl.program_id(0) == 0)
        def _init():
            o_ref[...] = acc

        @pl.when(pl.program_id(0) > 0)
        def _acc():
            o_ref[...] += acc

    vec = pl.BlockSpec((bs,), lambda i: (i,))
    return pl.pallas_call(
        kernel,
        grid=(N // bs,),
        out_shape=jax.ShapeDtypeStruct((K, n_b), jnp.float32),
        in_specs=[vec] * (1 + K),
        out_specs=pl.BlockSpec((K, n_b), lambda i: (0, 0)),
        interpret=interpret,
    )(code_b, *parts)


def fused_fn_onehot_sum(fields, mask_fn, n_masks: int, code_b, n_b: int,
                        max_block: int = 32768, force: str | None = None):
    """out[k, b] = sum_i mask_fn(*fields)[k][i] * [code_b[i] == b] with
    the K masks computed INSIDE the kernel from the raw field streams.

    Materializing the masks in HBM (fused_onehot_sum's contract) costs
    K bool N-writes plus K reads; the underlying fields are usually far
    fewer/narrower streams (phase 7's 13 output masks derive from 9
    fields). mask_fn must be pure elementwise; it receives same-shape
    blocks (cast 16-bit fields to i32 before arithmetic — Mosaic has no
    16-bit vector arithmetic). Counts are exact integer f32 sums, so
    kernel and fallback agree bit-for-bit. Returns (K, n_b) float32.
    """
    N = fields[0].shape[0]
    code_b = code_b.astype(jnp.int32)
    n_f = len(fields)

    if force is None and _shard_get() is not None:
        ctx = shard_ctx(N, 1024)
        if ctx is not None:
            mesh, ax, interp = ctx
            frc = "interpret" if interp else "pallas"

            def _local(cb, *fs):
                return jax.lax.psum(
                    fused_fn_onehot_sum(fs, mask_fn, n_masks, cb, n_b,
                                        max_block, force=frc), ax)

            return jax.shard_map(
                _local, mesh=mesh, in_specs=(P(ax),) * (1 + n_f),
                out_specs=P(), check_vma=False)(code_b, *fields)
        force = "xla"

    interpret = force == "interpret"
    use_pallas = interpret or force == "pallas" or (
        force is None and _is_tpu() and N % 1024 == 0)
    if not use_pallas:
        masks = mask_fn(*fields)
        assert len(masks) == n_masks
        return jax.lax.dot_general(
            _lhs_rows(masks), _onehot_bf16(code_b, n_b),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (K, n_b)

    from jax.experimental import pallas as pl

    bs = _largest_block(N, max_block, 1024)
    n_f = len(fields)

    def kernel(code_ref, *refs):
        f_refs, o_ref = refs[:n_f], refs[n_f]
        masks = mask_fn(*(r[...] for r in f_refs))
        acc = _row_dots(masks, _onehot_bf16(code_ref[...], n_b))

        @pl.when(pl.program_id(0) == 0)
        def _init():
            o_ref[...] = acc

        @pl.when(pl.program_id(0) > 0)
        def _acc():
            o_ref[...] += acc

    vec = pl.BlockSpec((bs,), lambda i: (i,))
    return pl.pallas_call(
        kernel,
        grid=(N // bs,),
        out_shape=jax.ShapeDtypeStruct((n_masks, n_b), jnp.float32),
        in_specs=[vec] * (1 + n_f),
        out_specs=pl.BlockSpec((n_masks, n_b), lambda i: (0, 0)),
        interpret=interpret,
    )(code_b, *fields)


def _hs_prefix_block(x):
    """Inclusive prefix sum of a (rows, LANE) block in flat row-major
    order via Hillis-Steele shift-adds — an explicit, fixed float
    association, so the Pallas kernel and the XLA fallback perform the
    EXACT same additions in the same order (bit-identical outputs, the
    module's design rule). log2(LANE) lane steps + log2(rows) row steps."""
    rows, lanes = x.shape
    k = 1
    while k < lanes:
        pad = jnp.zeros((rows, k), x.dtype)
        x = x + jnp.concatenate([pad, x[:, :lanes - k]], axis=1)
        k *= 2
    # lane-broadcast the (rows, 1) row-totals column before the row
    # scan: the slice at lane 127 carries a lane-offset layout Mosaic
    # cannot concatenate on dim 0 ("result/input offset mismatch on
    # non-concat dimension"); the replicated array is offset-0. Every
    # lane performs the identical adds, so outputs are bit-identical
    # to the column formulation.
    t = jnp.broadcast_to(x[:, lanes - 1:], (rows, lanes))
    r = t
    k = 1
    while k < rows:
        pad = jnp.zeros((k, lanes), x.dtype)
        r = r + jnp.concatenate([pad, r[:rows - k, :]], axis=0)
        k *= 2
    return x + (r - t)                         # exclusive row prefix


def fused_concat_prefix(weights, codes, n_seg: int,
                        max_block_rows: int = 2048,
                        force: str | None = None,
                        exact_int: bool = False):
    """Inclusive prefix sum over the virtual concatenation
    ``[where(codes == s, weights, 0) for s in range(n_seg)]`` — i.e.
    ``cumsum`` of an (n_seg*N,) array — WITHOUT materializing the
    concatenation, as ONE streaming HBM pass (device trace: the XLA
    reduce-window pair for phase 6's cum_newly + cum_cat cost
    3.8 ms/day at HUS scale; reduce-window re-reads each level of its
    scan tree, a sequential-carry kernel reads each input byte once).

    The Pallas kernel walks n_seg*G blocks in grid order with the
    running total carried in VMEM scratch; segment s re-reads the same
    N inputs masked to its code. The fallback executes the IDENTICAL
    per-block shift-add body (same block size, same add order) in a
    python loop, so both paths agree bit-for-bit even for float
    weights where summation order matters.

    codes=None (with n_seg=1) skips the mask: a plain fused cumsum.
    Returns (n_seg*N,) in ``weights``' dtype (cast float32/int32 first).

    ``exact_int`` declares every weight an exact integer (counts): the
    prefix is then associative-exact, which lets a mesh-sharded run keep
    the streaming kernel per shard and stitch shards with an all-gather
    of per-(shard, segment) totals — bit-identical to the sequential
    kernel. Real-float weights (cum_cat) must leave it False: their
    association is fixed by the sequential carry chain, so sharded runs
    keep the GSPMD-partitioned fallback.
    """
    N = weights.shape[0]
    dt = weights.dtype
    if codes is None:
        assert n_seg == 1
    else:
        codes = codes.astype(jnp.int32)

    if force is None and _shard_get() is not None:
        ctx = shard_ctx(N, 8 * LANE) if exact_int else None
        if ctx is not None:
            mesh, ax, interp = ctx
            frc = "interpret" if interp else "pallas"
            nloc = N // mesh.shape[ax]

            def _local(w, *mc):
                c = mc[0] if mc else None
                loc = fused_concat_prefix(w, c, n_seg, max_block_rows,
                                          force=frc).reshape(n_seg, nloc)
                # the local kernel chains segments, so loc[s] includes
                # this shard's segments < s — strip that local base and
                # substitute the global one (all exact-integer adds)
                incl = loc[:, -1]               # cum through local seg s
                local_base = jnp.concatenate(
                    [jnp.zeros(1, incl.dtype), incl[:-1]])
                tots = incl - local_base        # per-segment local totals
                allt = jax.lax.all_gather(tots, ax)          # (k, n_seg)
                seg_tot = jnp.sum(allt, axis=0)
                seg_base = jnp.cumsum(seg_tot) - seg_tot     # excl. segs
                shard_excl = jnp.cumsum(allt, axis=0) - allt  # excl. shards
                off = (seg_base + shard_excl[jax.lax.axis_index(ax)]
                       - local_base)
                return loc + off[:, None].astype(dt)

            args = (weights,) + (() if codes is None else (codes,))
            out = jax.shard_map(
                _local, mesh=mesh, in_specs=(P(ax),) * len(args),
                out_specs=P(None, ax), check_vma=False)(*args)
            return out.reshape(n_seg * N)
        force = "xla"

    def masked(w, c, s):
        return w if c is None else jnp.where(c == s, w, jnp.zeros((), dt))

    R = N // LANE
    if N % (8 * LANE) != 0:   # engine pads to 1024 — tiny/odd N only
        if codes is None:
            return jnp.cumsum(weights)
        return jnp.cumsum(jnp.concatenate(
            [masked(weights, codes, s) for s in range(n_seg)]))

    blk = _largest_block(R, max_block_rows, 8)
    G = R // blk

    interpret = force == "interpret"   # CPU-test the kernel logic
    use_pallas = interpret or force == "pallas" or (
        force is None and _is_tpu())
    if not use_pallas:
        w2 = weights.reshape(G, blk, LANE)
        c2 = None if codes is None else codes.reshape(G, blk, LANE)
        outs = []
        carry = jnp.zeros((), dt)
        for s in range(n_seg):
            for j in range(G):
                x = masked(w2[j], None if c2 is None else c2[j], s)
                p = _hs_prefix_block(x) + carry
                outs.append(p)
                carry = p[-1, -1]
        return jnp.stack(outs).reshape(n_seg * N)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        if codes is None:
            w_ref, o_ref, acc_ref = refs
            c_ref = None
        else:
            w_ref, c_ref, o_ref, acc_ref = refs
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            acc_ref[...] = jnp.zeros((1, 1), dt)

        x = masked(w_ref[...], None if c_ref is None else c_ref[...],
                   g // G)
        p = _hs_prefix_block(x) + acc_ref[0, 0]
        o_ref[...] = p
        acc_ref[...] = p[-1:, -1:]

    bs = pl.BlockSpec((blk, LANE), lambda g: (g % G, 0))
    ins = [weights.reshape(R, LANE)]
    if codes is not None:
        ins.append(codes.reshape(R, LANE))
    out = pl.pallas_call(
        kernel,
        grid=(n_seg * G,),
        out_shape=jax.ShapeDtypeStruct((n_seg * R, LANE), dt),
        in_specs=[bs] * len(ins),
        out_specs=pl.BlockSpec((blk, LANE), lambda g: (g, 0)),
        scratch_shapes=[pltpu.VMEM((1, 1), dt)],
        interpret=interpret,
    )(*ins)
    return out.reshape(n_seg * N)


def fused_bihistogram(code_a, n_a: int, weights, code_b, n_b: int,
                      max_block: int = 32768, force: str | None = None):
    """out[a, b] = sum_i weights[i] * [code_a[i] == a] * [code_b[i] == b]
    as blockwise MXU dots without materializing either (N, n_cat)
    one-hot in HBM (the XLA path for the (vts, age) dart aggregation
    materialized a (N, 84) bf16 operand — ~0.8 ms/day of HBM traffic).

    Out-of-range codes (< 0 or >= n_cat) contribute nothing. weights
    must be exact in bfloat16 (the engine's contact counts are ints
    <= 128). Returns (n_a, n_b) float32, bit-identical between the
    Pallas kernel and the fallback (f32 sums of exact products).
    """
    N = code_a.shape[0]
    code_a = code_a.astype(jnp.int32)
    code_b = code_b.astype(jnp.int32)
    weights = weights.astype(jnp.float32)

    if force is None and _shard_get() is not None:
        ctx = shard_ctx(N, 1024)
        if ctx is not None:
            mesh, ax, interp = ctx
            frc = "interpret" if interp else "pallas"

            def _local(ca, w, cb):
                return jax.lax.psum(
                    fused_bihistogram(ca, n_a, w, cb, n_b, max_block,
                                      force=frc), ax)

            return jax.shard_map(
                _local, mesh=mesh, in_specs=(P(ax),) * 3,
                out_specs=P(), check_vma=False)(code_a, weights, code_b)
        force = "xla"

    def block_dot(ca, w, cb, dt=jnp.bfloat16):
        # the weight multiply folds INTO the one-hot select (one fewer
        # f32 pass than onehot-then-multiply); compute stays f32 with a
        # cast at the end — Mosaic has no 16-bit vector arithmetic
        # (module docstring) — and values are exact either way
        # (ints <= 128). The lhs is built DIRECTLY in (n_a, m) layout:
        # contracting dim 0 of an (m, n_a) operand made Mosaic insert a
        # vreg transpose before the MXU pass (measured 1.19 → 1.02 ms
        # per call at HUS scale with the pre-transposed build).
        # ``dt``: bf16 feeds the MXU on TPU; off-TPU (fallback and
        # interpret CI) uses f32 — XLA:CPU's DotThunk has no
        # BF16×BF16→F32 kernel for this layout, and f32 is
        # bit-identical anyway (exact integers throughout).
        iota = jax.lax.broadcasted_iota(jnp.int32, (n_a, ca.shape[0]), 0)
        lhs = jnp.where(ca[None, :] == iota, w[None, :],
                        jnp.zeros((), jnp.float32)).astype(dt)
        return jax.lax.dot_general(
            lhs, _onehot_bf16(cb, n_b).astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (n_a, n_b)

    interpret = force == "interpret"
    use_pallas = interpret or force == "pallas" or (
        force is None and _is_tpu() and N % 1024 == 0)
    dt = jnp.float32 if (interpret or not _is_tpu()) else jnp.bfloat16
    if not use_pallas:
        return block_dot(code_a, weights, code_b, dt)

    from jax.experimental import pallas as pl

    bs = _largest_block(N, max_block, 1024)

    def kernel(ca_ref, w_ref, cb_ref, o_ref):
        acc = block_dot(ca_ref[...], w_ref[...], cb_ref[...], dt)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            o_ref[...] = acc

        @pl.when(pl.program_id(0) > 0)
        def _acc():
            o_ref[...] += acc

    vec = pl.BlockSpec((bs,), lambda i: (i,))
    return pl.pallas_call(
        kernel,
        grid=(N // bs,),
        out_shape=jax.ShapeDtypeStruct((n_a, n_b), jnp.float32),
        in_specs=[vec, vec, vec],
        out_specs=pl.BlockSpec((n_a, n_b), lambda i: (0, 0)),
        interpret=interpret,
    )(code_a, weights, code_b)
