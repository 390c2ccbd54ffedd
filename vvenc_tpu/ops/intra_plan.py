"""Device-batched intra RD planning: the TPU decides the coding tree.

This is the SURVEY §7 "batch everything" inversion of the sequential
EncCu recursion (reference anchor: EncCu.cpp:717 xCompressCU +
IntraSearch.cpp estIntraPredLumaQT): for every partition size class, ONE
device program evaluates ALL candidate CUs of the frame —

  predict (67 modes, shared with ops/intra_presel) -> SATD -> top-K mode
  selection -> full trial of the K survivors (forward transform with the
  implicit-MTS type, scalar quantization, dequant, inverse, clipped
  reconstruction, SSE) -> rate proxy -> RD cost per (block, mode)

The host then runs the (tiny) quadtree dynamic program over the per-class
leaf costs to pick the split tree, and hands the native CTU driver a
*plan*: forced split decisions + a 2-mode shortlist per leaf.  The native
driver (entropy.cpp vte_search_ctu) codes the planned tree with exact
reconstruction references, exact RDOQ and exact CABAC estimation, so the
bitstream stays fully conformant and closed-loop; only the tree/mode
*selection* uses device-approximate costs (same trade vvenc's
EncModeCtrl save/load heuristics make, EncModeCtrl.h:268).

Prediction references come from SOURCE samples (see ops/intra_presel.py
for why that is what makes frame-level batching legal).

Rate proxy: bits(TU) ~ c0 + c1*nnz + c2*sum(log2(1+|level|)), fitted
against the exact estimator path (tools/calibrate_plan.py); good enough
to rank split decisions — mode ranking is dominated by SATD/SSE.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import intra as I
from .intra_presel import (NUM_MODES, _class_grid, _gather_refs,
                           predict_all_modes, satd_batch)
from .transforms import (COEFF_MAX, COEFF_MIN, DCT2, DST7, QUANT_SCALES,
                         INV_QUANT_SCALES, needs_sqrt2, transform_shift,
                         tr_matrix)

# rate-proxy coefficients (frac bits): fitted by tools/calibrate_plan.py
# (env-overridable for calibration sweeps)
import os as _os

RATE_C0 = float(_os.environ.get("VVENC_TPU_PLAN_C0", "3.0"))
RATE_C1 = float(_os.environ.get("VVENC_TPU_PLAN_C1", "1.0"))
RATE_C2 = float(_os.environ.get("VVENC_TPU_PLAN_C2", "1.4"))
SPLIT_BITS = float(_os.environ.get("VVENC_TPU_PLAN_SPLIT", "6.0"))
PLAN_K = int(_os.environ.get("VVENC_TPU_PLAN_K", "2"))
# exact-retrial margin: the native driver re-trials the 2nd shortlist
# mode only when its device cost is within MARGIN of the best (vvenc
# numIntraModesFullRD=1 analog, vvencCfg.cpp:2689 — most blocks get one
# exact trial)
PLAN_MARGIN = float(_os.environ.get("VVENC_TPU_PLAN_MARGIN", "1.06"))

# approximate luma mode-signalling bits used for top-K selection
# (MPM list is context-dependent and unknown on device: planar is almost
# always MPM[0]; angular/DC average between MPM hits and the 6-bit
# truncated-binary escape)
_MODE_BITS = np.full(NUM_MODES, 5.5, np.float32)
_MODE_BITS[I.PLANAR_IDX] = 1.5
_MODE_BITS[I.DC_IDX] = 4.5


def _tr_jnp(n: int, tt: int):
    return jnp.asarray(tr_matrix(n, tt), dtype=jnp.int32)


def _fwd_tr(resi, w, h, trh, trv, bit_depth):
    """Forward transform with per-axis type (DCT2/DST7) [B, h, w]."""
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    shift1 = log2w + bit_depth + 6 - 15
    shift2 = log2h + 6
    tw = _tr_jnp(w, trh)
    th = _tr_jnp(h, trv)
    tmp = jax.lax.dot_general(resi, tw.T, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    tmp = jnp.clip((tmp + (1 << (shift1 - 1))) >> shift1, COEFF_MIN,
                   COEFF_MAX)
    out = jnp.einsum("ij,bjk->bik", th, tmp,
                     preferred_element_type=jnp.int32)
    out = jnp.clip((out + (1 << (shift2 - 1))) >> shift2, COEFF_MIN,
                   COEFF_MAX)
    if w > 32 or h > 32:
        yy, xx = jnp.mgrid[0:h, 0:w]
        out = jnp.where((xx < 32) & (yy < 32), out, 0)
    return out


def _inv_tr(coeff, w, h, trh, trv, bit_depth):
    shift1, shift2 = 7, 20 - bit_depth
    tw = _tr_jnp(w, trh)
    th = _tr_jnp(h, trv)
    tmp = jnp.einsum("ji,bjk->bik", th, coeff,
                     preferred_element_type=jnp.int32)
    tmp = jnp.clip((tmp + (1 << (shift1 - 1))) >> shift1, COEFF_MIN,
                   COEFF_MAX)
    out = jax.lax.dot_general(tmp, tw, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return jnp.clip((out + (1 << (shift2 - 1))) >> shift2, COEFF_MIN,
                    COEFF_MAX)


def _plan_class_core(src_blocks: jax.Array, tops: jax.Array,
                     lefts: jax.Array, lmbda: jax.Array,
                     lmbda_sad: jax.Array, w: int, h: int, qp: int,
                     bit_depth: int = 10, implicit_mts: bool = True,
                     k: int = 2):
    """One size class: modes [B, k] int32 + RD costs [B, k] float32.

    lmbda / lmbda_sad: per-block float32 [B] (frames with different
    lambdas batch together).  The returned cost includes the approximate
    mode-signalling bits, so min over k is directly the leaf cost for
    the tree DP."""
    B = src_blocks.shape[0]
    preds = predict_all_modes(tops, lefts, w, h, bit_depth, B=B)
    satd = satd_batch(src_blocks, preds, w, h)               # [B, 67]
    bias = jnp.asarray(_MODE_BITS)[None, :] * lmbda_sad[:, None]
    scores = satd.astype(jnp.float32) + bias
    _, top_idx = jax.lax.top_k(-scores, k)                   # [B, k]

    trh = DST7 if (implicit_mts and 4 <= w <= 16) else DCT2
    trv = DST7 if (implicit_mts and 4 <= h <= 16) else DCT2
    sqrt2 = needs_sqrt2(w, h)
    tshift = transform_shift(w, h, bit_depth) + (-1 if sqrt2 else 0)
    qbits = 14 + qp // 6 + tshift
    qscale = int(QUANT_SCALES[1 if sqrt2 else 0][qp % 6])
    qadd = 171 << (qbits - 9)
    dshift = 6 - (tshift + qp // 6)
    dscale = int(INV_QUANT_SCALES[1 if sqrt2 else 0][qp % 6])
    maxval = (1 << bit_depth) - 1

    costs = []
    for i in range(k):
        pred = jnp.take_along_axis(
            preds, top_idx[:, i][:, None, None, None], axis=1
        )[:, 0].astype(jnp.int32)                            # [B, h, w]
        resi = src_blocks - pred
        coeff = _fwd_tr(resi, w, h, trh, trv, bit_depth)
        a = jnp.abs(coeff)
        mag = (a * qscale + qadd) >> qbits
        q = jnp.sign(coeff) * mag
        qc = jnp.clip(q, -(1 << 15), (1 << 15) - 1)
        if dshift > 0:
            d = (qc * dscale + (1 << (dshift - 1))) >> dshift
        else:
            d = (qc * dscale) << (-dshift)
        d = jnp.clip(d, COEFF_MIN, COEFF_MAX)
        r = _inv_tr(d, w, h, trh, trv, bit_depth)
        rec = jnp.clip(pred + r, 0, maxval)
        err = (src_blocks - rec).astype(jnp.float32)
        sse = jnp.sum(err * err, axis=(1, 2))                # [B]
        nnz = jnp.sum((q != 0).astype(jnp.float32), axis=(1, 2))
        slog = jnp.sum(jnp.log2(1.0 + mag.astype(jnp.float32)),
                       axis=(1, 2))
        bits = jnp.where(nnz > 0,
                         RATE_C0 + RATE_C1 * nnz + RATE_C2 * slog, 1.0)
        mode_bits = jnp.take(jnp.asarray(_MODE_BITS), top_idx[:, i])
        costs.append(sse + lmbda * (bits + mode_bits))
    return top_idx.astype(jnp.int32), jnp.stack(costs, axis=1)


plan_class = jax.jit(_plan_class_core,
                     static_argnames=("w", "h", "qp", "bit_depth",
                                      "implicit_mts", "k"))

PAD = 80  # edge padding of the plane fed to _plan_batch_core


@partial(jax.jit,
         static_argnames=("sizes", "W", "H", "qp", "bit_depth",
                          "implicit_mts", "k"))
def _plan_batch_core(planes: jax.Array, lmbda: jax.Array,
                     lmbda_sad: jax.Array, sizes, W: int, H: int, qp: int,
                     bit_depth: int = 10, implicit_mts: bool = True,
                     k: int = 2):
    """All size classes of a batch of frames in ONE device program.

    planes: [F, H+2*PAD, W+2*PAD] int16 edge-padded source planes (the
    only h2d transfer); block tiling is a reshape (QT-only grids are
    non-overlapping), reference rows/columns are iota-built gathers.
    Returns (modes [N, k] int32, costs [N, k] float32) flat over
    (class, frame, block) in `sizes` order — two small d2h fetches per
    batch instead of two per class per frame."""
    F = planes.shape[0]
    Wp = planes.shape[2]
    out_modes, out_costs = [], []
    for s in sizes:
        nx, ny = W // s, H // s
        core = planes[:, PAD:PAD + ny * s, PAD:PAD + nx * s]
        blocks = core.reshape(F, ny, s, nx, s).transpose(0, 1, 3, 2, 4) \
                     .reshape(F * ny * nx, s, s).astype(jnp.int32)
        # reference rows/columns: flat gather indices built from iota
        by = (jnp.arange(ny, dtype=jnp.int32) * s)[:, None]
        bx = (jnp.arange(nx, dtype=jnp.int32) * s)[None, :]
        base = ((by + PAD - 1) * Wp + bx + PAD - 1).reshape(-1)  # [ny*nx]
        jt = jnp.arange(2 * s + 3, dtype=jnp.int32)
        tidx = base[:, None] + jt[None, :]
        lidx = base[:, None] + jt[None, :] * Wp
        flatp = planes.reshape(F, -1)
        tops = flatp[:, tidx].reshape(F * ny * nx, 2 * s + 3) \
            .astype(jnp.int32)
        lefts = flatp[:, lidx].reshape(F * ny * nx, 2 * s + 3) \
            .astype(jnp.int32)
        lmb = jnp.repeat(lmbda, ny * nx)
        lms = jnp.repeat(lmbda_sad, ny * nx)
        m, c = _plan_class_core(blocks, tops, lefts, lmb, lms, s, s, qp,
                                bit_depth, implicit_mts, k)
        out_modes.append(m)
        out_costs.append(c)
    return jnp.concatenate(out_modes), jnp.concatenate(out_costs)


# ---------------------------------------------------------------------------
# host orchestration: frame-batched plan tables + quadtree DP
# ---------------------------------------------------------------------------

def _plan_sizes(W, H, ctu_size, min_qt):
    unit = min(64, ctu_size)
    return [s for s in (4, 8, 16, 32, 64)
            if min_qt <= s <= unit and s <= min(W, H)]


def _dp_tables(sizes, grids, leaf_modes, leaf_cost, lmbda):
    """Quadtree DP bottom-up: cost(s) = min(leaf + split0_bits,
    sum(children) + split1_bits).  Grids are size-aligned (QT-only) so
    child (i, j) of node (y, x) at size s is at (2y+i, 2x+j) in the s/2
    grid; children outside the frame (grid) cost 0 (the searcher skips
    them — out-of-picture parts of implicit splits)."""
    split_bit = lmbda * SPLIT_BITS
    best, split = {}, {}
    prev = None
    for s in sizes:                       # ascending
        lc = leaf_cost[s]
        ny, nx = lc.shape
        if prev is None:
            best[s] = lc
            split[s] = np.zeros((ny, nx), np.int32)
        else:
            pc = best[prev]
            csum = np.zeros((ny, nx))
            for i in (0, 1):
                for j in (0, 1):
                    sub = pc[i::2, j::2][:ny, :nx]
                    csum[:sub.shape[0], :sub.shape[1]] += sub
            sc = csum + split_bit
            leaf = lc + split_bit
            split[s] = (sc < leaf).astype(np.int32)
            best[s] = np.minimum(leaf, sc)
        prev = s

    tables = {}
    for s in sizes:
        xs, ys, ax, ay = grids[s]
        ny, nx = len(ys), len(xs)
        plan = np.empty((ny * nx, 3), np.int32)
        lm2 = leaf_modes[s].reshape(ny * nx, -1)
        plan[:, 0] = lm2[:, 0]
        plan[:, 1] = lm2[:, 1] if lm2.shape[1] > 1 else lm2[:, 0]
        plan[:, 2] = split[s].reshape(-1)
        tables[(s, s)] = (xs, ys, ax, ay, nx, plan)
    return tables


class FramePlan:
    """Per-frame device-planned coding tree for the QT-only intra path.

    tables[(w, h)] = (xs, ys, ax, ay, nx, plan) with plan [ny*nx, 3] int32
    rows {mode0, mode1, split} — the layout the native driver's
    plan_lookup reads (split: 0 = NO_SPLIT leaf, 1 = QT split; node sizes
    below min_qt always 0)."""

    def __init__(self, src_y: np.ndarray, bit_depth: int, ctu_size: int,
                 min_qt: int, qp: int, lmbda: float, lmbda_sad: float,
                 implicit_mts: bool = True, k: int | None = None):
        self.tables = build_plans(
            [src_y], bit_depth, ctu_size, min_qt, qp, [lmbda],
            [lmbda_sad], implicit_mts, k)[0].tables

    def lookup(self, x, y, w, h):
        ent = self.tables.get((w, h))
        if ent is None:
            return None
        xs, ys, ax, ay, nx, plan = ent
        if x % ax or y % ay:
            return None
        ix, iy = x // ax, y // ay
        if ix >= nx or iy >= len(ys):
            return None
        return plan[iy * nx + ix]


class _PlanView(FramePlan):
    def __init__(self, tables):                 # noqa: super-init
        self.tables = tables


# optional device mesh (jax.sharding.Mesh): when set, build_plans runs
# every class through parallel.mesh.sharded_plan_class — the e2e encode's
# device planning sharded over (gops x tiles); results are bit-identical
# for any mesh shape (chip-count-invariant bitstreams)
MESH = None


def _build_sharded(srcs, sizes, W, H, qp, bit_depth, lmbdas, lmbda_sads,
                   implicit_mts, k):
    """Mesh path of build_plans: per-class host gather + sharded kernel
    (same (class, frame, block) output order as _plan_batch_core)."""
    from ..parallel.mesh import sharded_plan_class
    F = len(srcs)
    sps = [np.pad(s, PAD, mode="edge").astype(np.int32) for s in srcs]
    all_modes, all_costs = [], []
    for s in sizes:
        xs, ys, ax, ay = _class_grid(W, H, s, s, mtt=False)
        blocks_l, tops_l, lefts_l = [], [], []
        for f in range(F):
            bx, by, tops, lefts = _gather_refs(sps[f], PAD, xs, ys, s, s)
            win = np.lib.stride_tricks.sliding_window_view(srcs[f], (s, s))
            blocks_l.append(
                np.ascontiguousarray(win[by, bx]).astype(np.int32))
            tops_l.append(tops)
            lefts_l.append(lefts)
        B1 = len(blocks_l[0])
        lmb = np.repeat(np.asarray(lmbdas, np.float32), B1)
        lms = np.repeat(np.asarray(lmbda_sads, np.float32), B1)
        m, c = sharded_plan_class(
            MESH, jnp.asarray(np.concatenate(blocks_l)),
            jnp.asarray(np.concatenate(tops_l)),
            jnp.asarray(np.concatenate(lefts_l)),
            jnp.asarray(lmb), jnp.asarray(lms), w=s, h=s, qp=qp,
            bit_depth=bit_depth, implicit_mts=implicit_mts, k=k)
        all_modes.append(np.asarray(m))
        all_costs.append(np.asarray(c))
    return np.concatenate(all_modes), np.concatenate(all_costs)


def build_plans(srcs, bit_depth: int, ctu_size: int, min_qt: int, qp: int,
                lmbdas, lmbda_sads, implicit_mts: bool = True,
                k: int | None = None):
    """Device RD plans for a BATCH of frames in one device call set.

    The d2h tunnel has ~20 ms fixed latency per fetch: per-frame
    dispatch is latency-bound, so all frames' candidate blocks of a size
    class are stacked into ONE program invocation and the (tiny)
    mode/cost results come back in one fetch per class.  Frames may have
    different lambdas (traced per-block input — no recompilation).

    Returns [FramePlan] per frame."""
    from ..utils.devclock import DEV
    if k is None:
        k = PLAN_K
    F = len(srcs)
    H, W = srcs[0].shape
    sizes = tuple(_plan_sizes(W, H, ctu_size, min_qt))
    with DEV.section():
        if MESH is not None:
            modes, costs = _build_sharded(srcs, sizes, W, H, qp,
                                          bit_depth, lmbdas, lmbda_sads,
                                          implicit_mts, k)
        else:
            planes = np.stack([np.pad(s, PAD, mode="edge")
                               for s in srcs]).astype(np.int16)
            modes_d, costs_d = _plan_batch_core(
                jnp.asarray(planes), jnp.asarray(lmbdas, np.float32),
                jnp.asarray(lmbda_sads, np.float32), sizes, W, H, qp,
                bit_depth, implicit_mts, k)
            modes = np.asarray(modes_d)
            costs = np.asarray(costs_d)
    grids = {s: _class_grid(W, H, s, s, mtt=False) for s in sizes}
    per_frame_tabs = [({}, {}) for _ in range(F)]
    off = 0
    for s in sizes:
        xs, ys, ax, ay = grids[s]
        nx, ny = len(xs), len(ys)
        B1 = nx * ny
        for f in range(F):
            m = modes[off + f * B1:off + (f + 1) * B1].copy()
            c = costs[off + f * B1:off + (f + 1) * B1]
            if m.shape[1] > 1:
                # decisive margin -> single exact trial (m1 := m0)
                drop = c[:, 1] > c[:, 0] * PLAN_MARGIN
                m[drop, 1] = m[drop, 0]
            leaf_modes, leaf_cost = per_frame_tabs[f]
            leaf_modes[s] = m.reshape(ny, nx, -1)
            leaf_cost[s] = c.min(axis=1).reshape(ny, nx)
        off += F * B1
    return [_PlanView(_dp_tables(sizes, grids, per_frame_tabs[f][0],
                                 per_frame_tabs[f][1], float(lmbdas[f])))
            for f in range(F)]
