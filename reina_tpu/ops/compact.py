"""Stream compaction without N-sized scatters.

Packing the set positions of an (N,) mask into a fixed-capacity buffer
is the classic XLA pattern ``zeros(K+1).at[slot].set(iota(N))`` — a
scatter with an N-sized update stream, which on TPU runs through the
scalar pipeline at ~12-14 ms per op at N≈1.7M (tools/profile_ops_sync.py).
The equivalent here costs one cumsum plus log2(N) rounds of K-sized
gathers (~20× cheaper): the s-th set position is the first index where
the inclusive cumsum of the mask reaches s+1, found by bisection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .fusedmap import fused_concat_prefix
from .random import searchsorted_compact

I32 = jnp.int32


def compact_indices(mask, capacity: int, head: int = 1 << 9,
                    force: str | None = None):
    """Pack the indices of set positions of ``mask`` into a buffer.

    Args:
      mask: (N,) bool.
      capacity: static buffer size K.
      head: always-computed tier size; slots beyond it are filled under
        ``lax.cond`` only when the set count exceeds ``head`` — each
        bisection round costs ~7 ns per query on this TPU, so the
        common small-count day pays only for the head.

    Returns:
      buf: (K,) int32 — the first K set indices in ascending order;
        unused slots hold N (a safe out-of-range sentinel for
        ``mode="drop"`` scatters and clipped gathers).
      count: scalar int32 — total set positions (may exceed K; callers
        flag overflow when count > K).
    """
    n = mask.shape[0]
    # inclusive prefix count as ONE streaming kernel pass (exact: f32
    # integers < 2^24; the XLA reduce-window pair cost ~0.3 ms/day at
    # HUS scale in the device trace). Bisection over the same values is
    # identical whichever dtype carries them.
    cum = fused_concat_prefix(mask.astype(jnp.float32), None, 1,
                              force=force, exact_int=True)
    count = cum[-1].astype(I32)

    def part(lo_slot: int, n_slots: int):
        slots = lo_slot + jnp.arange(n_slots, dtype=I32)
        # two-level bisect: a ≤104-entry strided subsample of cum gathers
        # as vectorized selects, cutting the gathered rounds from
        # log2(N) to log2(block) (ops/random.py:searchsorted_compact)
        buf = searchsorted_compact(cum, (slots + 1).astype(jnp.float32),
                                   side="left")
        used = slots < jnp.minimum(count, capacity)
        return jnp.where(used, buf, n)

    kh = min(head, capacity)
    parts = [part(0, kh)]
    lo = kh
    while lo < capacity:
        seg = min(lo * 3, capacity) - lo   # tiers: head, 3·head, 9·head, …
        parts.append(jax.lax.cond(
            count > lo, lambda _, lo=lo, seg=seg: part(lo, seg),
            lambda _: jnp.full(seg, n, I32), 0))
        lo += seg
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts), count
