"""Film grain analysis -> film_grain_characteristics (FGC) SEI.

Structural analog of vvenc EncoderLib/SEIFilmGrainAnalyzer.{h,cpp}
(FGAnalyzer :177, Canny :83, Morph :146): estimate the noise/grain level
of the source per intensity interval so a decoder-side grain synthesizer
can re-add it after the (grain-removing) encode.

Pipeline (vvenc doFGanalysis analog, simplified to the frequency-filtering
model the SEI carries):
1. edge mask via Sobel gradients + hysteresis-free threshold (the Canny
   stage; edges and textured areas must not be mistaken for grain);
2. per 8x8 flat block: grain energy = variance of the high-pass residual
   (orig - 3x3 box blur), accumulated per intensity bin;
3. intensity intervals with consistent energy -> comp model values
   (log2-scale-factor fixed-point, model_id 0 = frequency filtering).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..bitstream.bitwriter import BitWriter, BitReader

SEI_FILM_GRAIN = 19  # H.274 payloadType


@dataclass
class FilmGrainModel:
    """One component's grain model: list of (lower, upper, [values])."""
    intervals: List[Tuple[int, int, List[int]]] = field(default_factory=list)


@dataclass
class SeiFilmGrain:
    cancel: int = 0
    model_id: int = 0             # 0: frequency filtering
    blending_mode: int = 0        # 0: additive
    log2_scale_factor: int = 4
    comp_models: List[Optional[FilmGrainModel]] = field(
        default_factory=lambda: [None, None, None])
    persistence: int = 1

    def payload(self) -> bytes:
        bw = BitWriter()
        bw.write_flag(self.cancel)
        if not self.cancel:
            bw.write(self.model_id, 2)
            bw.write_flag(0)  # separate_colour_description_present
            bw.write(self.blending_mode, 2)
            bw.write(self.log2_scale_factor, 4)
            for c in range(3):
                bw.write_flag(1 if self.comp_models[c] else 0)
            for c in range(3):
                m = self.comp_models[c]
                if not m:
                    continue
                bw.write(len(m.intervals) - 1, 8)
                nv = len(m.intervals[0][2])
                bw.write(nv - 1, 3)
                for lo, hi, vals in m.intervals:
                    bw.write(lo, 8)
                    bw.write(hi, 8)
                    for v in vals:
                        bw.write_svlc(v)
            bw.write_flag(self.persistence)
        bw.write_rbsp_trailing_bits()
        return bw.get_bytes()

    @classmethod
    def parse(cls, data: bytes) -> "SeiFilmGrain":
        br = BitReader(data)
        out = cls()
        out.cancel = br.read_flag()
        if out.cancel:
            return out
        out.model_id = br.read(2)
        assert br.read_flag() == 0
        out.blending_mode = br.read(2)
        out.log2_scale_factor = br.read(4)
        present = [br.read_flag() for _ in range(3)]
        for c in range(3):
            if not present[c]:
                continue
            n_int = br.read(8) + 1
            n_val = br.read(3) + 1
            m = FilmGrainModel()
            for _ in range(n_int):
                lo = br.read(8)
                hi = br.read(8)
                vals = [br.read_svlc() for _ in range(n_val)]
                m.intervals.append((lo, hi, vals))
            out.comp_models[c] = m
        out.persistence = br.read_flag()
        return out


# ---------------------------------------------------------------------------
# analysis
# ---------------------------------------------------------------------------

def _sobel_mag(y: np.ndarray) -> np.ndarray:
    """|Sobel| gradient magnitude, 0 on the border (the Canny stage's
    gradient; vvenc FGAnalyzer uses the same 3x3 kernels)."""
    s = y.astype(np.int64)
    gx = np.zeros_like(s)
    gy = np.zeros_like(s)
    c = np.s_[1:-1, 1:-1]
    gx[c] = (s[:-2, 2:] + 2 * s[1:-1, 2:] + s[2:, 2:]
             - s[:-2, :-2] - 2 * s[1:-1, :-2] - s[2:, :-2])
    gy[c] = (s[2:, :-2] + 2 * s[2:, 1:-1] + s[2:, 2:]
             - s[:-2, :-2] - 2 * s[:-2, 1:-1] - s[:-2, 2:])
    return np.abs(gx) + np.abs(gy)


def _box3(y: np.ndarray) -> np.ndarray:
    """3x3 box blur (edge-replicated)."""
    p = np.pad(y.astype(np.int64), 1, mode="edge")
    out = np.zeros_like(y, dtype=np.int64)
    for dy in range(3):
        for dx in range(3):
            out += p[dy:dy + y.shape[0], dx:dx + y.shape[1]]
    return out // 9


def analyze_grain(y: np.ndarray, bit_depth: int = 8, block: int = 8,
                  edge_thresh: int = 80, n_bins: int = 8):
    """Per-intensity-bin grain energy of one luma plane.

    Returns (bin_means, bin_sigmas) where sigma is the std-dev of the
    high-pass residual over flat (non-edge) blocks, indexed by intensity
    bin; NaN sigma marks bins with no flat blocks."""
    shift = bit_depth - 8
    y8 = (y >> shift).astype(np.int32) if shift else y.astype(np.int32)
    h, w = y8.shape
    hb, wb = h // block, w // block
    if hb == 0 or wb == 0:
        return np.zeros(n_bins), np.full(n_bins, np.nan)
    edges = _sobel_mag(y8) > edge_thresh * 4
    hp = y8 - _box3(y8)

    def blocks(a):
        return a[:hb * block, :wb * block].reshape(
            hb, block, wb, block).transpose(0, 2, 1, 3).reshape(
            hb * wb, block * block)
    eb = blocks(edges).mean(axis=1)
    vb = blocks(hp).astype(np.float64)
    mb = blocks(y8).mean(axis=1)
    flat = eb < 0.05                       # blocks with (almost) no edges
    sig = np.sqrt((vb ** 2).mean(axis=1))
    sums = np.zeros(n_bins)
    cnts = np.zeros(n_bins)
    means = np.zeros(n_bins)
    for b in range(n_bins):
        lo, hi = 256 * b // n_bins, 256 * (b + 1) // n_bins
        m = flat & (mb >= lo) & (mb < hi)
        cnts[b] = m.sum()
        if cnts[b]:
            sums[b] = sig[m].mean()
        means[b] = (lo + hi) / 2
    sigmas = np.where(cnts > 0, sums, np.nan)
    return means, sigmas


def derive_fgc_sei(frames_y, bit_depth: int = 8,
                   min_sigma: float = 0.8) -> Optional[SeiFilmGrain]:
    """Analyze a few luma planes -> FGC SEI (None when grain is below the
    synthesis-worthy threshold everywhere)."""
    n_bins = 8
    acc = np.zeros(n_bins)
    cnt = np.zeros(n_bins)
    for y in frames_y[:8]:
        _, sig = analyze_grain(y, bit_depth, n_bins=n_bins)
        ok = ~np.isnan(sig)
        acc[ok] += sig[ok]
        cnt[ok] += 1
    sig = np.where(cnt > 0, acc / np.maximum(cnt, 1), 0.0)
    if float(np.nanmax(sig)) < min_sigma:
        return None
    sei = SeiFilmGrain()
    scale = 1 << sei.log2_scale_factor
    m = FilmGrainModel()
    for b in range(n_bins):
        if sig[b] < min_sigma:
            continue
        lo = 256 * b // n_bins
        hi = 256 * (b + 1) // n_bins - 1
        # model value: grain sigma in log2_scale_factor fixed point
        m.intervals.append((lo, hi, [int(round(sig[b] * scale))]))
    if not m.intervals:
        return None
    sei.comp_models[0] = m
    return sei
