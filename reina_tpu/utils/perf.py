"""Nestable nanosecond-resolution performance counters
(reference: utils/perf.py)."""
from __future__ import annotations

import threading
import time

_local = threading.local()


class PerfCounter:
    def __init__(self, tag: str | None = None, show_time_to_last: bool = False):
        self.start = time.perf_counter_ns()
        self.last_value = self.start
        self.tag = tag
        self.show_time_to_last = show_time_to_last
        if not hasattr(_local, "depth"):
            _local.depth = 0
        _local.depth += 1
        self.depth = _local.depth

    def __del__(self):
        if getattr(_local, "depth", None):
            _local.depth -= 1

    def measure(self) -> float:
        """Milliseconds since the previous measure() (or construction)."""
        now = time.perf_counter_ns()
        cur_ms = (now - self.last_value) / 1_000_000
        self.last_value = now
        return cur_ms

    def display(self, name: str | None = None, show_time_to_last: bool = False) -> None:
        now = time.perf_counter_ns()
        if name or self.show_time_to_last or show_time_to_last:
            diff = ", %.3f ms" % ((now - self.last_value) / 1_000_000)
        else:
            diff = ""
        total = (now - self.start) / 1_000_000
        tag = f"{self.tag}: " if self.tag else ""
        indent = "  " * (self.depth - 1)
        print(f"{indent}{tag}{name or ''} {total:.3f} ms{diff}")
        self.last_value = now
