"""Per-frame / sequence PSNR + rate statistics.

Analog of vvenc's Analyze (EncoderLib/Analyze.h:66) + apputils/Stats.
"""

from __future__ import annotations

import numpy as np


def psnr(plane_rec: np.ndarray, plane_src: np.ndarray, bit_depth: int) -> float:
    maxval = (1 << bit_depth) - 1
    mse = np.mean((plane_rec.astype(np.int64) -
                   plane_src.astype(np.int64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(maxval * maxval / mse))


class SequenceStats:
    def __init__(self, fps: float):
        self.fps = fps
        self.frames = []

    def add_frame(self, poc: int, bits: int, psnr_yuv) -> None:
        self.frames.append((poc, bits, psnr_yuv))

    @property
    def total_bits(self) -> int:
        return sum(b for _, b, _ in self.frames)

    @property
    def bitrate_kbps(self) -> float:
        n = max(1, len(self.frames))
        return self.total_bits * self.fps / n / 1000.0

    def mean_psnr(self):
        if not self.frames:
            return (0.0, 0.0, 0.0)
        arr = np.array([p for _, _, p in self.frames])
        return tuple(arr.mean(axis=0))

    def summary(self) -> str:
        y, u, v = self.mean_psnr()
        return (f"{len(self.frames)} frames | {self.bitrate_kbps:9.2f} kbps | "
                f"Y {y:7.4f} dB  U {u:7.4f} dB  V {v:7.4f} dB")
