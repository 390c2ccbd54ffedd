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
    # QPOffsetModel (vvenc GOPEntry m_QPOffsetModelOffset/Scale): an
    # extra 0..3 QP that grows with the base QP, applied at encode time
    qp_model_off: float = 0.0
    qp_model_scale: float = 0.0

    @property
    def is_b(self) -> bool:
        return bool(self.refs_future)

    def final_qp_offset(self, base_qp: int) -> int:
        """Total QP offset for this entry at a given base QP: the table
        offset plus the clipped QPOffsetModel term (the reference's
        EncSlice::xGetQPForPicture, EncSlice.cpp:434-441)."""
        qp = base_qp + self.qp_offset
        dq = qp * self.qp_model_scale + self.qp_model_off + 0.5
        import math
        return self.qp_offset + int(math.floor(min(3.0, max(0.0, dq))))


# per-temporal-layer (QPOffset, QPOffsetModelOffset, QPOffsetModelScale)
# from the reference's default GOP tables (vvencCfg.cpp:1630-1690: GOP16
# rows 0-15, GOP32 rows 0-31); GOP8 hierarchical has no reference table
# (the reference only supports GOP8 low-delay) — it reuses the GOP16
# layers with the top layer aligned
_QP_CASCADE = {
    16: {0: (1, 0.0, 0.0), 1: (1, -4.8848, 0.2061),
         2: (4, -5.7476, 0.2286), 3: (5, -5.90, 0.2333),
         4: (6, -7.1444, 0.3)},
    32: {0: (-1, 0.0, 0.0), 1: (0, -4.9309, 0.2265),
         2: (0, -3.0625, 0.1875), 3: (3, -5.4095, 0.2571),
         4: (5, -4.4895, 0.1947), 5: (6, -5.4429, 0.2429)},
}


def _cascade_entry(gop_size: int, tl: int):
    """(qp_offset, model_off, model_scale) for temporal layer tl."""
    tab = _QP_CASCADE.get(gop_size)
    if tab is None:
        # align the TOP layer of this GOP with the top of the GOP16
        # table so the highest layers keep the strongest cascade
        tab = _QP_CASCADE[16]
        if tl > 0:
            depth = max(1, gop_size.bit_length() - 1)
            tl = min(4, tl + (4 - depth))
    return tab[min(tl, max(tab))]


def _interval_chain(p: int, gop: int):
    """Dyadic intervals (lo, hi) containing p, innermost first."""
    chain = []
    lo, hi = 0, gop
    while hi - lo > 1:
        chain.append((lo, hi))
        mid = (lo + hi) // 2
        if p == mid:
            break
        lo, hi = (lo, mid) if p < mid else (mid, hi)
    return list(reversed(chain))


def ref_deltas(p: int, gop: int):
    """Default reference deltas for picture p of a dyadic GOP, following
    the structure of vvenc's default RA GOP tables (vvencCfg.cpp:1659+,
    GOPCfg.cpp xCreateGopList): deltas are p - ref_poc, so positive means
    a past reference.  Derived by rule rather than tables: L0 takes the
    lower endpoints of the enclosing dyadic intervals (nearest first), L1
    the upper endpoints; dyadic-power pictures additionally reference the
    previous GOP's mid picture, the anchor the two previous anchors; a
    short list is padded from the other direction (the generalized-B
    shape of the reference tables).  Reproduces the 2-active-reference
    choices of the vvenc GOP32 table for 30 of 32 entries.
    Returns (past_deltas, future_deltas)."""
    past: List[int] = []
    fut: List[int] = []
    for lo, hi in _interval_chain(p, gop):
        d = p - lo
        if d > 0 and d not in past:
            past.append(d)
        d = p - hi
        if d < 0 and d not in fut:
            fut.append(d)
    if p == gop:
        past = [gop, 2 * gop, gop + gop // 2]
    elif p in (2, 4, 8, 16, 32) and p <= gop // 2:
        past.append(p + gop // 2)
    for d in past:
        if len(fut) >= 2:
            break
        if d not in fut:
            fut.append(d)
    for d in fut:
        if len(past) >= 2:
            break
        if d not in past:
            past.append(d)
    return past, fut


def build_gop(gop_size: int, max_refs: int = 2,
              parallel: bool = False) -> List[GopEntry]:
    """Dyadic hierarchy in coding order for one GOP (anchors at 0 and N).

    Non-parallel entries carry the default-RPL reference structure of
    ref_deltas() as GOP-relative POCs (values below 0 reach into the
    previous GOP; the encoder clamps them against the IDR boundary and
    DPB contents).  refs_future may include past pictures (generalized-B
    padding); the anchor stays a P picture.

    parallel=True restricts each picture's references to its dyadic
    interval endpoints (strictly lower temporal layers), making all
    pictures of one temporal layer mutually independent — the structure
    the frame-parallel encoder dispatches as TL waves (the TPU answer to
    vvenc's ref-reconstructed gating, EncGOP::xGetProcessingLists)."""
    assert gop_size & (gop_size - 1) == 0, "GOP size must be a power of two"
    entries: List[GopEntry] = []

    # anchor (kept P: refs_future empty; L0 reaches back across GOPs)
    anchor_past, _ = ref_deltas(gop_size, gop_size)
    a_off, a_moff, a_mscale = _cascade_entry(gop_size, 0)
    entries.append(GopEntry(gop_size, 0, 0, a_off,
                            refs_past=[gop_size - d
                                       for d in anchor_past][:max_refs],
                            qp_model_off=a_moff, qp_model_scale=a_mscale))
    coded = [0, gop_size]

    def recurse(lo, hi, tl):
        if hi - lo <= 1:
            return
        mid = (lo + hi) // 2
        if parallel:
            past = [lo]
            fut = [hi] + ([gop_size] if hi != gop_size else [])
        else:
            dp, df = ref_deltas(mid, gop_size)
            past = [mid - d for d in dp]
            fut = [mid - d for d in df]
        off, moff, mscale = _cascade_entry(gop_size, tl)
        entries.append(GopEntry(mid, len(entries), tl, off,
                                refs_past=past[:max_refs],
                                refs_future=fut[:max_refs],
                                qp_model_off=moff, qp_model_scale=mscale))
        coded.append(mid)
        recurse(lo, mid, tl + 1)
        recurse(mid, hi, tl + 1)

    recurse(0, gop_size, 1)
    return entries


def derive_dpb_params(gop_size: int, max_refs: int = 2):
    """(max_dec_pic_buffering, num_reorder_pics) for the default GOP
    structure, by simulating two steady-state GOPs (vvenc GOPCfg
    getMaxDpbSize / xSetDefaultRPL analog, derived rather than tabled).

    Occupancy counts decoded pictures that are still referenced by a
    later picture in coding order or not yet bumped out in POC order.
    """
    if gop_size <= 1:
        return 2, 0
    entries = build_gop(gop_size, max_refs=max_refs)
    reorder = max(sum(1 for e2 in entries
                      if e2.coding_order < e.coding_order
                      and e2.poc_in_gop > e.poc_in_gop)
                  for e in entries)
    # absolute two-GOP schedule in coding order (POC 0 is the IDR)
    sched = [(0, [])]
    for g in (0, 1):
        base = g * gop_size
        for e in entries:
            refs = [base + r for r in list(e.refs_past)
                    + list(e.refs_future) if base + r >= 0]
            sched.append((base + e.poc_in_gop, refs))
    last_use = {}
    for step, (_, refs) in enumerate(sched):
        for r in refs:
            last_use[r] = step
    decoded = set()
    next_out = 0
    max_occ = 0
    for step, (poc, _) in enumerate(sched):
        decoded.add(poc)
        occ = sum(1 for p in decoded
                  if last_use.get(p, -1) > step or p >= next_out)
        max_occ = max(max_occ, occ)
        while next_out in decoded:
            next_out += 1
        decoded = {p for p in decoded
                   if last_use.get(p, -1) > step or p >= next_out}
    return max_occ, reorder
