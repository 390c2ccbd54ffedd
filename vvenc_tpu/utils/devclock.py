"""Always-on accumulator of time spent in device (TPU) work.

The bench reports `device_time_fraction` — the share of encode wall time
spent dispatching, executing, or fetching device programs — as an
MFU-proxy for how much of the encoder actually runs on the chip.  Every
device entry point (frame preselection, batched trials, mesh steps)
wraps its synchronous device interaction in `DEV.section()`.

Unlike utils/profiler.py (env-gated, report-oriented) this is always on:
a perf_counter pair per device call, nanoseconds of overhead against
device calls that are >= milliseconds.
"""

from __future__ import annotations

import threading
import time


class _Section:
    __slots__ = ("_clk", "_t0")

    def __init__(self, clk):
        self._clk = clk

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self._clk.add(time.perf_counter() - self._t0)
        return False


class _DevClock:
    def __init__(self):
        self._lock = threading.Lock()
        self.seconds = 0.0
        self.calls = 0

    def add(self, dt: float) -> None:
        with self._lock:
            self.seconds += dt
            self.calls += 1

    def section(self) -> _Section:
        return _Section(self)

    def reset(self) -> None:
        with self._lock:
            self.seconds = 0.0
            self.calls = 0


DEV = _DevClock()
