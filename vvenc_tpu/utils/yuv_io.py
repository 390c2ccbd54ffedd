"""Planar YUV 4:2:0 file I/O (8/10-bit) and minimal Y4M header parsing.

Reference analog: vvenc apputils/YuvFileIO.{h,cpp} (read/write with MSB
extension); re-implemented over numpy memory-mapped reads.
"""

from __future__ import annotations

import numpy as np


def frame_size_bytes(w: int, h: int, bit_depth: int) -> int:
    samples = w * h + 2 * (w // 2) * (h // 2)
    return samples * (2 if bit_depth > 8 else 1)


def read_yuv(path: str, w: int, h: int, bit_depth: int = 8,
             num_frames: int | None = None, start: int = 0):
    """Yield (Y, U, V) numpy arrays per frame (dtype uint8 or uint16)."""
    dtype = np.uint16 if bit_depth > 8 else np.uint8
    ysz = w * h
    csz = (w // 2) * (h // 2)
    fsz = ysz + 2 * csz
    data = np.fromfile(path, dtype=dtype)
    total = len(data) // fsz
    end = total if num_frames is None else min(total, start + num_frames)
    for i in range(start, end):
        f = data[i * fsz:(i + 1) * fsz]
        yield (f[:ysz].reshape(h, w),
               f[ysz:ysz + csz].reshape(h // 2, w // 2),
               f[ysz + csz:].reshape(h // 2, w // 2))


def write_yuv(path: str, frames, bit_depth: int = 10, append: bool = False):
    """Write frames ((Y, U, V) arrays) as planar YUV at bit_depth."""
    dtype = np.uint16 if bit_depth > 8 else np.uint8
    mode = "ab" if append else "wb"
    with open(path, mode) as f:
        for y, u, v in frames:
            for plane in (y, u, v):
                f.write(np.ascontiguousarray(plane, dtype=dtype).tobytes())


def read_y4m_header(f):
    """Parse a Y4M stream header -> dict(width, height, fps_num, fps_den)."""
    line = b""
    while not line.endswith(b"\n"):
        c = f.read(1)
        if not c:
            raise EOFError("truncated y4m header")
        line += c
    parts = line.decode().strip().split(" ")
    assert parts[0] == "YUV4MPEG2", "not a y4m stream"
    info = {"fps_num": 25, "fps_den": 1}
    for p in parts[1:]:
        if p.startswith("W"):
            info["width"] = int(p[1:])
        elif p.startswith("H"):
            info["height"] = int(p[1:])
        elif p.startswith("F"):
            num, den = p[1:].split(":")
            info["fps_num"], info["fps_den"] = int(num), int(den)
        elif p.startswith("C") and not p[1:].startswith("420"):
            raise NotImplementedError(f"y4m chroma format {p}")
    return info
