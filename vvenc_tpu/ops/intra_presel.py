"""Frame-level batched intra mode preselection on device (TPU).

The TPU-first inversion of vvenc's per-block HAD pre-pass (IntraSearch::
xEstimateLumaRdModeList, IntraSearch.cpp): instead of sweeping 67 modes of
one CU at a time inside the tree recursion, ALL candidate blocks of a
partition size class are evaluated as ONE dense device program per frame:

  host:   block grid per (w, h) class (4-pel-aligned positions), reference
          rows/columns gathered from the SOURCE plane (edge-replicated)
  device: filtered refs, per-mode extended main references, 67 angular/
          planar/DC predictions incl. PDPC, SATD vs source -> costs [B, 67]

Using source samples as references decouples the preselection from the
reconstruction order (the encoder's only sequential dependency), which is
what makes frame-level batching legal: the full-RD stage re-predicts the
chosen candidates from the true reconstructed references, so the coded
bitstream stays exact; only the *ranking* is approximate (same trade
vvenc's save/load mode cache makes, EncModeCtrl.h saveLoadTag).

All static per-(w, h) control flow comes from ops/intra_vec._shape_tables —
the same tables the bit-exact host path gathers with, so device and host
agree on the prediction math; the kernel's SATD uses float32 matmuls on the
MXU (exact: all intermediates < 2^24).

Reference analog: the SIMD kernel surface IntraPredX86.h + RdCostX86.h
driven by the mode loop — here one XLA program per size class.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from . import intra as I
from .intra_vec import _shape_tables
from .rdcost import _hadamard

NUM_MODES = I.NUM_LUMA_MODE  # 67


def _filter_refs_jnp(tops, lefts, w, h):
    """[1 2 1]/4 reference smoothing on device (I.filter_reference)."""
    corner = (tops[:, 0] + tops[:, 1] + lefts[:, 0] + lefts[:, 1] + 2) >> 2
    n = 2 * w  # top pred size (arrays carry +3 padding)
    ft = tops
    ft = ft.at[:, 1:n].set((tops[:, :n - 1] + 2 * tops[:, 1:n]
                            + tops[:, 2:n + 1] + 2) >> 2)
    ft = ft.at[:, 0].set(corner)
    ft = ft.at[:, n:].set(tops[:, n:n + 1])
    m = 2 * h
    fl = lefts
    fl = fl.at[:, 1:m].set((lefts[:, :m - 1] + 2 * lefts[:, 1:m]
                            + lefts[:, 2:m + 1] + 2) >> 2)
    fl = fl.at[:, 0].set(corner)
    fl = fl.at[:, m:].set(lefts[:, m:m + 1])
    return ft, fl


def predict_all_modes(tops: jax.Array, lefts: jax.Array, w: int, h: int,
                      bit_depth: int = 10, B: int | None = None
                      ) -> jax.Array:
    """All 67 intra predictions for a batch of reference rows/columns ->
    [B, 67, h, w] int16 (the device prediction stage shared by the
    preselection SATD kernel and the sharded trial kernel)."""
    t = _shape_tables(w, h, True, 0)
    B = tops.shape[0] if B is None else B
    maxval = (1 << bit_depth) - 1
    LPAD = t.LPAD
    tops = tops[:, :LPAD]
    lefts = lefts[:, :LPAD]
    ftop, fleft = _filter_refs_jnp(tops, lefts, w, h)
    # int16 reference pool (samples <= 2^bit_depth-1): halves gather traffic
    flat = jnp.concatenate([tops, ftop, lefts, fleft],
                           axis=1).astype(jnp.int16)            # [B, 4*LPAD]
    # rm position -> flat position (static)
    rm_flat = t.rm_src.astype(np.int64) * LPAD + t.rm_idx       # [65, LR]

    group_preds = []
    group_modes = []
    for group, (tw, th) in ((True, (w, h)), (False, (h, w))):
        gsel = np.nonzero(t.is_ver == group)[0]
        if len(gsel) == 0:
            continue
        ng = len(gsel)
        rs = t.row_start[gsel][:, :th]                        # [ng, th]
        filt = jnp.asarray(t.filt[gsel][:, :th])              # [ng, th, 4]
        # window gather straight from flat refs: [B, ng, th, tw+3]
        widx = rm_flat[gsel][
            np.arange(ng)[:, None, None],
            rs[:, :, None] + np.arange(tw + 3, dtype=np.int32)[None, None]]
        win = flat[:, jnp.asarray(widx)]
        acc = None
        for k in range(4):
            term = filt[None, :, :, None, k] * \
                win[..., k:k + tw].astype(jnp.int32)
            acc = term if acc is None else acc + term
        pred = (acc + jnp.asarray(t.round[gsel])[None, :, None, None]) >> \
            jnp.asarray(t.shift[gsel])[None, :, None, None]
        pred = jnp.clip(pred, 0, maxval)  # identity except cubic (exact)
        # PDPC on its support slab (first <= 12 columns)
        pd = t.pdpc_on[gsel]
        if pd.any():
            pw = min(int(t.pdpc_wl[gsel].astype(bool).sum(axis=1).max()), tw)
            side_flat = (t.pdpc_side_src[gsel].astype(np.int64)[:, None, None]
                         * LPAD + t.pdpc_side_idx[gsel][:, :th, :pw])
            lval = flat[:, jnp.asarray(side_flat)].astype(jnp.int32)
            wl = jnp.asarray(t.pdpc_wl[gsel][:, :pw])[None, :, None, :]
            a0 = t.pdpc_ang0[gsel]
            p12 = pred[..., :pw]
            reg_m = jnp.asarray(pd & ~a0)[None, :, None, None]
            upd_reg = p12 + ((wl * (lval - p12) + 32) >> 6)
            p12 = jnp.where(reg_m, upd_reg, p12)
            if a0.any():
                tl_idx = rm_flat[gsel, t.B0]                  # [ng]
                tl = flat[:, jnp.asarray(tl_idx)].astype(jnp.int32)
                tl = tl[:, :, None, None]
                upd0 = jnp.clip(p12 + ((wl * (lval - tl) + 32) >> 6),
                                0, maxval)
                a0_m = jnp.asarray(pd & a0)[None, :, None, None] & (wl != 0)
                p12 = jnp.where(a0_m, upd0, p12)
            pred = jnp.concatenate([p12, pred[..., pw:]], axis=-1)
        pred = jnp.clip(pred, 0, maxval).astype(jnp.int16)
        if not group:
            pred = pred.swapaxes(2, 3)
        group_preds.append(pred)
        group_modes.append(gsel + 2)

    # planar (mirrors I._pred_planar + planar/DC PDPC)
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    pf = (w * h > 32)  # planar MDIS
    p_top, p_left = (ftop, fleft) if pf else (tops, lefts)
    top_row = p_top[:, 1:w + 2]
    left_col = p_left[:, 1:h + 2]
    br = left_col[:, h][:, None, None]
    tr = top_row[:, w][:, None, None]
    xg = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    yg = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    lc = left_col[:, :h, None]
    tr_row = top_row[:, None, :w]
    hor = (lc << log2w) + (xg + 1) * (tr - lc)
    ver = (tr_row << log2h) + (yg + 1) * (br - tr_row)
    planar = ((hor << log2h) + (ver << log2w) + (1 << (log2w + log2h))) \
        >> (1 + log2w + log2h)
    if w >= 4 and h >= 4:
        planar = _pdpc_planar_dc_jnp(planar, p_top, p_left, w, h)
    planar = jnp.clip(planar, 0, maxval).astype(jnp.int16)

    # DC (non-square: average of the longer side only)
    denom = (w << 1) if w == h else max(w, h)
    shift_dc = denom.bit_length() - 1
    s = jnp.zeros((B,), jnp.int32)
    if w >= h:
        s = s + jnp.sum(tops[:, 1:1 + w], axis=1)
    if w <= h:
        s = s + jnp.sum(lefts[:, 1:1 + h], axis=1)
    dc = (s + (denom >> 1)) >> shift_dc
    dcp = jnp.broadcast_to(dc[:, None, None], (B, h, w))
    if w >= 4 and h >= 4:
        dcp = _pdpc_planar_dc_jnp(dcp, tops, lefts, w, h)
    dcp = jnp.clip(dcp, 0, maxval).astype(jnp.int16)

    # assemble [B, 67, h, w] via concat + one static permutation (no scatter)
    order = np.concatenate([np.array([I.PLANAR_IDX, I.DC_IDX])]
                           + group_modes)
    pos = np.empty(NUM_MODES, dtype=np.int32)
    pos[order] = np.arange(NUM_MODES, dtype=np.int32)
    preds = jnp.concatenate(
        [planar[:, None], dcp[:, None]] + group_preds, axis=1)
    return jnp.take(preds, jnp.asarray(pos), axis=1)


def satd_batch(src_blocks: jax.Array, preds: jax.Array, w: int, h: int
               ) -> jax.Array:
    """vvenc-convention SATD of src [B, h, w] vs preds [B, M, h, w] ->
    [B, M] int32, via fp32 Hadamard matmuls on the MXU (exact: all
    intermediates < 2^24)."""
    B, M = preds.shape[0], preds.shape[1]
    tile = 8 if (w % 8 == 0 and h % 8 == 0) else 4
    hm = jnp.asarray(_hadamard(tile), dtype=jnp.float32)
    d = (src_blocks[:, None, :, :].astype(jnp.int16) - preds) \
        .astype(jnp.float32)
    t1 = hm @ d.reshape(-1, tile, w)
    t2 = t1.reshape(-1, tile, w // tile, tile) @ hm
    s = jnp.sum(jnp.abs(t2), axis=(1, 3)).astype(jnp.int32)   # [N, w/t]
    if tile == 8:
        s = (s + 2) >> 2
    else:
        dc_t = jnp.abs(t2[:, 0, :, 0]).astype(jnp.int32)
        s = ((s - dc_t + (dc_t >> 2)) + 1) >> 1
    return jnp.sum(s.reshape(B, M, -1), axis=2)               # [B, M]


@partial(jax.jit, static_argnames=("w", "h", "bit_depth"))
def presel_costs(src_blocks: jax.Array, tops: jax.Array, lefts: jax.Array,
                 w: int, h: int, bit_depth: int = 10) -> jax.Array:
    """SATD cost of all 67 intra modes for a batch of blocks.

    src_blocks: [B, h, w] int32; tops: [B, >=2w+3]; lefts: [B, >=2h+3]
    returns costs [B, 67] int32 (SATD only; mode-bit terms are added on
    host where the context-dependent MPM list is known).

    Layout notes (TPU): every gather uses STATIC index tables composed on
    host (reference layout x tap geometry), so XLA lowers them to plain
    gathers with constant start-index tensors; predictions are assembled
    with concatenate + one static permutation take (never scatter), and
    PDPC runs on a <=12-column slab (its support), not the full block.
    """
    preds = predict_all_modes(tops, lefts, w, h, bit_depth,
                              B=src_blocks.shape[0])
    return satd_batch(src_blocks, preds, w, h)


def _pdpc_planar_dc_jnp(pred, top, left, w, h):
    scale = (((w * h).bit_length() - 1) - 2) >> 2
    y = jnp.arange(h, dtype=jnp.int32)
    x = jnp.arange(w, dtype=jnp.int32)
    wt = (32 >> jnp.minimum(31, (y << 1) >> scale))[None, :, None]
    wl = (32 >> jnp.minimum(31, (x << 1) >> scale))[None, None, :]
    lc = left[:, 1:h + 1][:, :, None]
    tp = top[:, 1:w + 1][:, None, :]
    return pred + ((wl * (lc - pred) + wt * (tp - pred) + 32) >> 6)


# ---------------------------------------------------------------------------
# host orchestration: per-frame cost tables
# ---------------------------------------------------------------------------

def shapes_for_config(ctu_size: int, max_mtt_depth_i: int):
    """(shapes, mtt) — size classes the intra partitioner can visit (max
    TB 64; MTT adds the rectangular classes, aspect ratio capped at 8
    per VVC); mtt tells the grid whether sub-size-aligned positions are
    reachable."""
    sizes = [s for s in (4, 8, 16, 32, 64) if s <= min(ctu_size, 64)]
    shapes = [(s, s) for s in sizes]
    if max_mtt_depth_i > 0:
        for w in sizes:
            for h in sizes:
                if w != h and max(w, h) // min(w, h) <= 8:
                    shapes.append((w, h))
    return shapes, max_mtt_depth_i > 0


def _class_grid(W, H, w, h, mtt: bool = True):
    """Candidate block positions of one size class.

    mtt=True: 4-pel-aligned sub-grid (covers every position nested
    BT/TT can produce).  mtt=False (QT-only partitioning, the
    faster/firstpass presets): blocks of size (w, h) only ever occur at
    size-aligned positions — 16x fewer candidates per class."""
    ax = w if not mtt else max(4, w // 4)
    ay = h if not mtt else max(4, h // 4)
    xs = np.arange(0, W - w + 1, ax, dtype=np.int32)
    ys = np.arange(0, H - h + 1, ay, dtype=np.int32)
    return xs, ys, ax, ay


def _gather_refs(sp, pad, xs, ys, w, h):
    """tops [B, 2w+3] / lefts [B, 2h+3] from the edge-padded source sp."""
    gx, gy = np.meshgrid(xs, ys)            # [ny, nx]
    bx = gx.reshape(-1).astype(np.int32)
    by = gy.reshape(-1).astype(np.int32)
    jt = np.arange(2 * w + 3, dtype=np.int32)
    tops = sp[(by + pad - 1)[:, None], (bx + pad - 1)[:, None] + jt[None, :]]
    jl = np.arange(2 * h + 3, dtype=np.int32)
    lefts = sp[(by + pad - 1)[:, None] + jl[None, :], (bx + pad - 1)[:, None]]
    return bx, by, tops, lefts


def _class_chunk(w: int, h: int) -> int:
    """Fixed device batch per class: bounds the [B, 67, h, w] prediction
    intermediate to ~512 MB and gives ONE compiled program per class
    (short batches are zero-padded up to the chunk)."""
    return max(64, (1 << 29) // (NUM_MODES * 4 * w * h))


# optional device mesh: when set (jax.sharding.Mesh), FramePresel runs every
# class through parallel.mesh.sharded_presel_costs — same results for any
# mesh shape (chip-count invariance; tests/test_mesh.py asserts bitstream
# equality 1-device vs 8-device)
MESH = None


class FramePresel:
    """Per-frame device-computed intra preselection cost tables.

    All classes are dispatched before any result is fetched (JAX async
    dispatch overlaps the device work with the host-side grid prep and
    the transfers of later classes).

    lookup(x, y, w, h) -> int32 costs[67] or None (position not in the
    class grid — caller falls back to the exact host sweep)."""

    def __init__(self, src_y: np.ndarray, bit_depth: int, shapes):
        from ..utils.devclock import DEV
        with DEV.section():
            self._build(src_y, bit_depth, shapes)

    def _build(self, src_y: np.ndarray, bit_depth: int, shapes):
        H, W = src_y.shape
        if isinstance(shapes, tuple):
            shapes, mtt = shapes
        else:
            mtt = True
        self.tables = {}
        pad = 80
        sp = np.pad(src_y, pad, mode="edge").astype(np.int32)
        pending = []
        for (w, h) in shapes:
            if w > W or h > H:
                continue
            xs, ys, ax, ay = _class_grid(W, H, w, h, mtt)
            bx, by, tops, lefts = _gather_refs(sp, pad, xs, ys, w, h)
            B = len(bx)
            win = np.lib.stride_tricks.sliding_window_view(src_y, (h, w))
            blocks = np.ascontiguousarray(win[by, bx]).astype(np.int32)
            if MESH is not None:
                from ..parallel.mesh import sharded_presel_costs
                costs_d, _tot = sharded_presel_costs(
                    MESH, jnp.asarray(blocks), jnp.asarray(tops),
                    jnp.asarray(lefts), w=w, h=h, bit_depth=bit_depth)
                pending.append(((w, h), xs, ys, ax, ay, B,
                                [(0, B, costs_d)]))
                continue
            chunk = min(_class_chunk(w, h), -(-B // 512) * 512)
            outs = []
            for c0 in range(0, B, chunk):
                c1 = min(c0 + chunk, B)
                if c1 - c0 < chunk:  # pad to the class's one static shape
                    pb = np.zeros((chunk, h, w), np.int32)
                    pt = np.zeros((chunk, tops.shape[1]), np.int32)
                    pl = np.zeros((chunk, lefts.shape[1]), np.int32)
                    pb[:c1 - c0] = blocks[c0:c1]
                    pt[:c1 - c0] = tops[c0:c1]
                    pl[:c1 - c0] = lefts[c0:c1]
                    out = presel_costs(jnp.asarray(pb), jnp.asarray(pt),
                                       jnp.asarray(pl), w, h, bit_depth)
                else:
                    out = presel_costs(jnp.asarray(blocks[c0:c1]),
                                       jnp.asarray(tops[c0:c1]),
                                       jnp.asarray(lefts[c0:c1]),
                                       w, h, bit_depth)
                outs.append((c0, c1, out))
            pending.append(((w, h), xs, ys, ax, ay, B, outs))
        for (w, h), xs, ys, ax, ay, B, outs in pending:
            costs = np.empty((B, NUM_MODES), np.int32)
            for c0, c1, out in outs:
                costs[c0:c1] = np.asarray(out)[:c1 - c0]
            self.tables[(w, h)] = (xs, ys, ax, ay, len(xs), costs)

    def lookup(self, x, y, w, h):
        ent = self.tables.get((w, h))
        if ent is None:
            return None
        xs, ys, ax, ay, nx, costs = ent
        if x % ax or y % ay:
            return None
        ix, iy = x // ax, y // ay
        if ix >= nx or iy >= len(ys):
            return None
        return costs[iy * nx + ix]
