"""Hierarchical stage time profiler (vvenc TimeProfiler analog).

Reference: vvenc CommonLib/TimeProfiler.h:124 (ENABLE_TIME_PROFILING) —
compile-gated stage timers with a report table.  Here: an env-gated
(`VVENC_TPU_PROFILE=1`) thread-safe accumulator with `section(name)`
context managers; zero overhead when disabled (the null profiler's
section() returns a shared no-op context).

Usage:
    from vvenc_tpu.utils.profiler import PROF
    with PROF.section("encode.ctu_search"):
        ...
    PROF.report()   # prints the table when enabled
"""

from __future__ import annotations

import os
import threading
import time


class _NullSection:
    __slots__ = ()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


_NULL = _NullSection()


class Profiler:
    def __init__(self, enabled: bool):
        self.enabled = enabled
        self._lock = threading.Lock()
        self._acc = {}     # name -> [total_seconds, calls]
        self._t0 = time.time()

    class _Section:
        __slots__ = ("prof", "name", "t0")

        def __init__(self, prof, name):
            self.prof = prof
            self.name = name

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *a):
            dt = time.perf_counter() - self.t0
            with self.prof._lock:
                ent = self.prof._acc.setdefault(self.name, [0.0, 0])
                ent[0] += dt
                ent[1] += 1
            return False

    def section(self, name: str):
        if not self.enabled:
            return _NULL
        return Profiler._Section(self, name)

    def add(self, name: str, seconds: float, calls: int = 1) -> None:
        if not self.enabled:
            return
        with self._lock:
            ent = self._acc.setdefault(name, [0.0, 0])
            ent[0] += seconds
            ent[1] += calls

    def report(self, out=None) -> str:
        if not self.enabled or not self._acc:
            return ""
        wall = time.time() - self._t0
        lines = ["== vvenc_tpu time profile (wall %.2fs) ==" % wall,
                 "%-36s %10s %8s %7s" % ("stage", "total[s]", "calls",
                                         "%wall")]
        for name, (tot, calls) in sorted(self._acc.items(),
                                         key=lambda kv: -kv[1][0]):
            lines.append("%-36s %10.3f %8d %6.1f%%"
                         % (name, tot, calls, 100.0 * tot / max(wall, 1e-9)))
        text = "\n".join(lines)
        print(text, file=out)
        return text


PROF = Profiler(os.environ.get("VVENC_TPU_PROFILE", "0") == "1")
