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

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

LANE = 128


def _is_tpu() -> bool:
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
      force: "pallas" | "xla" | None (auto).

    Returns: tuple of n_out (N,) arrays.
    """
    N = arrays[0].shape[0]
    for a in arrays:
        assert a.shape == (N,), (a.shape, N)
    smalls2 = [_as_2d(s) for s in smalls]

    use_pallas = force == "pallas" or (
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

    n_arr = len(arrays)

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
    )(*(a.reshape(R, LANE) for a in arrays), *smalls2)
    return tuple(o.reshape(N) for o in outs)
