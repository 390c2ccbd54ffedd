"""GOP structure: dyadic hierarchical-B coding order, layers, QP cascade.

Analog of vvenc's GOPCfg (EncoderLib/GOPCfg.{h,cpp}: initGopList,
xCreateGopList, default RPLs) reduced to the programmatic dyadic hierarchy:
a GOP of size N codes its anchor first (temporal layer 0), then recursively
the midpoints of each interval at increasing temporal layers.  Reference
lists point at the nearest coded past/future pictures.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List


@dataclass
class GopEntry:
    poc_in_gop: int            # display offset within the GOP (1..gop_size)
    coding_order: int
    temporal_layer: int
    qp_offset: int
    refs_past: List[int] = field(default_factory=list)    # POCs (gop-relative)
    refs_future: List[int] = field(default_factory=list)

    @property
    def is_b(self) -> bool:
        return bool(self.refs_future)


def build_gop(gop_size: int, max_refs: int = 2,
              parallel: bool = False) -> List[GopEntry]:
    """Dyadic hierarchy in coding order for one GOP (anchors at 0 and N).

    parallel=True restricts each picture's references to its dyadic
    interval endpoints (strictly lower temporal layers), making all
    pictures of one temporal layer mutually independent — the structure
    the frame-parallel encoder dispatches as TL waves (the TPU answer to
    vvenc's ref-reconstructed gating, EncGOP::xGetProcessingLists)."""
    assert gop_size & (gop_size - 1) == 0, "GOP size must be a power of two"
    entries: List[GopEntry] = []
    order = [0]

    def qp_off(tl, is_anchor):
        if is_anchor:
            return 1
        return min(6, tl + 2)  # hierarchical cascade (vvenc-like magnitudes)

    # anchor
    entries.append(GopEntry(gop_size, 0, 0, qp_off(0, True)))
    coded = [0, gop_size]

    def recurse(lo, hi, tl):
        if hi - lo <= 1:
            return
        mid = (lo + hi) // 2
        if parallel:
            past = [lo]
            fut = [hi] + ([gop_size] if hi != gop_size else [])
        else:
            past = sorted([p for p in coded if p < mid],
                          key=lambda p: mid - p)
            fut = sorted([p for p in coded if p > mid],
                         key=lambda p: p - mid)
        entries.append(GopEntry(mid, len(entries), tl,
                                qp_off(tl, False),
                                refs_past=past[:max_refs],
                                refs_future=fut[:max_refs]))
        coded.append(mid)
        recurse(lo, mid, tl + 1)
        recurse(mid, hi, tl + 1)

    recurse(0, gop_size, 1)
    return entries
