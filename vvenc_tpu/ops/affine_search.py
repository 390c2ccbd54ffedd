"""Affine motion estimation: gradient-based CPMV refinement.

TPU-style reimplementation of the reference gradient search
(AffineGradientSearch.cpp:84-190 Sobel + normal-equation accumulation,
InterSearch::xAffineMotionEstimation:5356 iteration loop): the Sobel
derivatives and the 4/6-parameter least-squares accumulation are dense
elementwise/matmul work (vectorized numpy here; maps directly onto the
VPU/MXU), the tiny 4x4/6x6 solve runs on host.
"""

from __future__ import annotations

import math

import numpy as np


def _sobel(pred: np.ndarray):
    """Horizontal/vertical Sobel with edge replication of the interior
    result (xHorizontal/VerticalSobelFilter semantics)."""
    p = pred.astype(np.int64)
    gx = np.zeros_like(p)
    gy = np.zeros_like(p)
    gx[1:-1, 1:-1] = (p[:-2, 2:] - p[:-2, :-2]
                      + 2 * (p[1:-1, 2:] - p[1:-1, :-2])
                      + p[2:, 2:] - p[2:, :-2])
    gy[1:-1, 1:-1] = (p[2:, :-2] - p[:-2, :-2]
                      + 2 * (p[2:, 1:-1] - p[:-2, 1:-1])
                      + p[2:, 2:] - p[:-2, 2:])
    for g in (gx, gy):
        g[:, 0] = g[:, 1]
        g[:, -1] = g[:, -2]
        g[0, :] = g[1, :]
        g[-1, :] = g[-2, :]
    return gx, gy


def _solve_params(err: np.ndarray, gx: np.ndarray, gy: np.ndarray,
                  six_param: bool):
    """Accumulate and solve the affine normal equations
    (xEqualCoeffComputer): returns the parameter vector or None."""
    h, w = err.shape
    # sub-block centers: cx = ((k>>2)<<2)+2, cy likewise
    cx = (((np.arange(w) >> 2) << 2) + 2).astype(np.int64)
    cy = (((np.arange(h) >> 2) << 2) + 2).astype(np.int64)
    cxg = np.broadcast_to(cx, (h, w))
    cyg = np.broadcast_to(cy[:, None], (h, w))
    if six_param:
        c = [gx, cxg * gx, gy, cxg * gy, cyg * gx, cyg * gy]
    else:
        c = [gx, cxg * gx + cyg * gy, gy, cyg * gx - cxg * gy]
    n = len(c)
    A = [[0.0] * n for _ in range(n)]
    b = [0.0] * n
    e8 = err.astype(np.int64) << 3
    for i in range(n):
        for j in range(i, n):
            A[i][j] = A[j][i] = float((c[i] * c[j]).sum())
        b[i] = float((c[i] * e8).sum())
    return _gauss_solve(A, b, n)


def _gauss_solve(A, b, n):
    """Partial-pivot Gaussian elimination, float64 — an EXPLICIT solver
    (not LAPACK) so the native C++ searcher replays the identical
    floating-point operation sequence bit for bit."""
    for k in range(n):
        p = k
        for i in range(k + 1, n):
            if abs(A[i][k]) > abs(A[p][k]):
                p = i
        if A[p][k] == 0.0:
            return None
        if p != k:
            A[k], A[p] = A[p], A[k]
            b[k], b[p] = b[p], b[k]
        inv = 1.0 / A[k][k]
        for i in range(k + 1, n):
            f = A[i][k] * inv
            for j in range(k + 1, n):
                A[i][j] -= f * A[k][j]
            b[i] -= f * b[k]
    x = [0.0] * n
    for k in range(n - 1, -1, -1):
        s = b[k]
        for j in range(k + 1, n):
            s -= A[k][j] * x[j]
        x[k] = s / A[k][k]
        if not math.isfinite(x[k]):
            return None
    return x


def _round_q(v: float, mult: int, shift: int) -> int:
    """int(v*mult + sign*0.5) << shift (xAffineMotionEstimation)."""
    r = int(v * mult + (0.5 if v >= 0 else -0.5))
    return r << shift


def delta_cpmvs(err, gx, gy, w, h, six_param: bool, imv: int = 0):
    """One gradient step: solve for the CPMV deltas (internal 1/16 units,
    rounded to the AMVR precision)."""
    x = _solve_params(err, gx, gy, six_param)
    if x is None:
        return None
    d0x, d0y = x[0], x[2]
    if six_param:
        d1x = x[1] * w + x[0]
        d1y = x[3] * w + x[2]
        d2x = x[4] * h + x[0]
        d2y = x[5] * h + x[2]
    else:
        d1x = x[1] * w + x[0]
        d1y = -x[3] * w + x[2]
        d2x = d2y = 0.0
    mult = (4, 16, 4)[imv]          # quarter / sixteenth / quarter
    shift = (2, 0, 2)[imv]          # -> internal 1/16 units
    out = [(_round_q(d0x, mult, shift), _round_q(d0y, mult, shift)),
           (_round_q(d1x, mult, shift), _round_q(d1y, mult, shift)),
           (_round_q(d2x, mult, shift), _round_q(d2y, mult, shift))]
    return out


def affine_search(orig: np.ndarray, pred_fn, cpmv0, six_param: bool,
                  w: int, h: int, n_iter: int = 5, imv: int = 0,
                  cost_fn=None):
    """Iterative affine CPMV refinement.

    orig: [h, w] source block; pred_fn(cpmv) -> prediction for candidate
    CPMVs (tuple of 3 (x, y) internal-precision MVs); cpmv0: start.
    Returns (best_cpmv, best_cost)."""
    from . import rdcost as R

    def _cost(p, cp):
        if cost_fn is not None:
            return cost_fn(p, cp)
        return float(R.satd_np(orig, p))

    n_cp = 3 if six_param else 2
    cp = [tuple(m) for m in cpmv0[:3]]
    while len(cp) < 3:
        cp.append((0, 0))
    pred = pred_fn(tuple(cp))
    best = (_cost(pred, tuple(cp)), tuple(cp))
    for _ in range(n_iter):
        err = orig.astype(np.int64) - pred
        gx, gy = _sobel(pred)
        d = delta_cpmvs(err, gx, gy, w, h, six_param, imv)
        if d is None:
            break
        if all(d[i] == (0, 0) for i in range(n_cp)):
            break
        cp = [(cp[i][0] + d[i][0], cp[i][1] + d[i][1]) if i < n_cp
              else cp[i] for i in range(3)]
        # storage-range clip (spec CPMV range)
        cp = [(max(-(1 << 17), min((1 << 17) - 1, mx)),
               max(-(1 << 17), min((1 << 17) - 1, my))) for mx, my in cp]
        pred = pred_fn(tuple(cp))
        c = _cost(pred, tuple(cp))
        if c < best[0]:
            best = (c, tuple(cp))
    return best[1], best[0]
