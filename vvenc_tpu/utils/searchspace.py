"""Search-space accounting (vvenc SearchSpaceCounter.h:48 analog).

Counts RD trials per tool family during encoding so trial mixes can be
compared against the reference encoder when debugging quality gaps
(the round-2 verdict's suggested instrument for the inter-path work).

Enable with VVENC_TPU_COUNT_TRIALS=1; counters print at process exit
(and are readable as COUNTERS).  Zero overhead when disabled: `bump`
is replaced by a no-op at import time.
"""

from __future__ import annotations

import atexit
import os
import sys
from collections import Counter

ENABLED = os.environ.get("VVENC_TPU_COUNT_TRIALS", "0") == "1"
COUNTERS: Counter = Counter()


def _bump(family: str, n: int = 1) -> None:
    COUNTERS[family] += n


def _noop(family: str, n: int = 1) -> None:
    pass


bump = _bump if ENABLED else _noop


def report(out=None) -> None:
    out = out or sys.stderr
    if not COUNTERS:
        return
    total = sum(COUNTERS.values())
    out.write("search-space counters (%d trials):\n" % total)
    for fam, n in COUNTERS.most_common():
        out.write("  %-24s %10d  (%5.1f%%)\n" % (fam, n, 100.0 * n / total))


if ENABLED:
    atexit.register(report)
