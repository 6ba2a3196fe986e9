"""Mid-run checkpoint/resume.

The reference has no engine-level checkpointing — a run always restarts
at day 0 (SURVEY §5.4); its only resume-equivalent is the memoization
cache. Here the full simulation state (agent arrays + scalar ledgers)
snapshots to a single npz, so long ensemble/calibration runs survive
preemption and a run can be forked from any day. Determinism holds:
resuming at day d reproduces the uninterrupted run exactly, because the
RNG is counter-based — keys derive from (seed, day), not from a stream
position.
"""
from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import jax
import numpy as np

from .state import AgentState, DayCarry

FORMAT_VERSION = 6   # v6: DayCarry gained the deferred bucket-append
#                      stream (app_pos/app_val/app_n), persisted; v5:
#                      the infectee edge table became per-source
#                      buckets, EXCLUDED from the file (pure function
#                      of per-agent state — rebuild_buckets); v4:
#                      DayCarry gained the cached mobility/nc_ag pair;
#                      v3: AgentState gained ``traceable``; v2:
#                      DayCarry gained the edge table

# derived at load time instead of stored (432 MB at HUS scale)
_REBUILT_CARRY_FIELDS = ("bkt_dst", "bkt_fill")


def rebuild_buckets(state: AgentState, capb: int):
    """Reconstruct the per-source infectee buckets from per-agent
    state — bucket content is a pure function of (infector, traceable,
    day_of_infection): source s's bucket holds its recorded infectees
    in (day_of_infection, agent id) order, exactly the engine's append
    order (appends happen day by day; within a day the slot buffer is
    ascending agent ids and the append sort is stable), truncated to
    ``capb``; fill counts every recorded append (uncapped, matching
    the engine's overflow bookkeeping)."""
    n = len(np.asarray(state.age))
    inf = np.asarray(state.infector).astype(np.int64)
    doi = np.asarray(state.day_of_infection).astype(np.int64)
    traceable = np.asarray(state.traceable)
    t = np.flatnonzero(inf >= 0)
    t = t[traceable[inf[t]]]
    bkt = np.full((n, capb), n, np.int32)
    fill = np.zeros(n, np.int32)
    if len(t):
        order = np.lexsort((t, doi[t], inf[t]))
        t = t[order]
        s = inf[t]
        idx = np.arange(len(s))
        first = np.r_[True, s[1:] != s[:-1]]
        start = np.maximum.accumulate(np.where(first, idx, 0))
        rank = idx - start
        keep = rank < capb
        bkt[s[keep], rank[keep]] = t[keep]
        np.add.at(fill, s, 1)
    return bkt, fill


def save_checkpoint(path: str, state: AgentState, carry: DayCarry,
                    outputs=None) -> None:
    """``outputs`` (optional): the stacked DayOutputs rows emitted so
    far, so a resumed run returns the complete output table."""
    arrays = {}
    for name, val in zip(AgentState._fields, state):
        arrays["state__" + name] = np.asarray(val)
    for name, val in zip(DayCarry._fields, carry):
        if name in _REBUILT_CARRY_FIELDS:
            continue
        arrays["carry__" + name] = np.asarray(val)
    n_agents = np.asarray(state.age).shape[0]
    arrays["bucket_capacity"] = np.int32(
        np.asarray(carry.bkt_dst).shape[0] // n_agents)
    if outputs is not None:
        for name, val in zip(type(outputs)._fields, outputs):
            arrays["out__" + name] = np.asarray(val)
    arrays["format_version"] = np.int32(FORMAT_VERSION)
    # atomic write: tmp file + rename
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str):
    from .step import DayOutputs

    z = np.load(path, allow_pickle=False)
    if int(z["format_version"]) != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version in {path}")
    state = AgentState(*(z["state__" + n] for n in AgentState._fields))
    bkt, fill = rebuild_buckets(state, int(z["bucket_capacity"]))
    carry = DayCarry(*(
        {"bkt_dst": bkt.reshape(-1), "bkt_fill": fill}[n]
        if n in _REBUILT_CARRY_FIELDS else z["carry__" + n]
        for n in DayCarry._fields))
    outputs = None
    if "out__by_group" in z.files:
        outputs = DayOutputs(*(z["out__" + n] for n in DayOutputs._fields))
    return (jax.tree.map(np.asarray, state), jax.tree.map(np.asarray, carry),
            outputs)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir)
             if f.startswith("day_") and f.endswith(".npz")]
    if not cands:
        return None
    best = max(cands, key=lambda f: int(f[4:-4]))
    return os.path.join(ckpt_dir, best)


def checkpoint_path(ckpt_dir: str, day: int) -> str:
    return os.path.join(ckpt_dir, f"day_{day:05d}.npz")
