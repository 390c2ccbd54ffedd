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


def _unpack10(raw: np.ndarray, w: int, h: int) -> np.ndarray:
    """Packed 10-bit plane: 4 samples in 5 bytes, little-endian at bit
    offsets 0/10/20/30 (apputils FileIOHelper readYuvPlane packed
    path)."""
    g = raw.reshape(h, w // 4, 5).astype(np.int64)
    v = (g[..., 0] | (g[..., 1] << 8) | (g[..., 2] << 16)
         | (g[..., 3] << 24) | (g[..., 4] << 32))
    out = np.empty((h, w), np.uint16)
    for k in range(4):
        out[:, k::4] = ((v >> (10 * k)) & 0x3FF).astype(np.uint16)
    return out


def _pack10(plane: np.ndarray) -> bytes:
    """Inverse of _unpack10 (writeYuvPlane packed path)."""
    h, w = plane.shape
    p = plane.astype(np.int64) & 0x3FF
    v = (p[:, 0::4] | (p[:, 1::4] << 10) | (p[:, 2::4] << 20)
         | (p[:, 3::4] << 30))
    out = np.empty((h, w // 4, 5), np.uint8)
    for b in range(5):
        out[..., b] = ((v >> (8 * b)) & 0xFF).astype(np.uint8)
    return out.tobytes()


def read_yuv_packed10(path: str, w: int, h: int,
                      num_frames: int | None = None, start: int = 0):
    """Packed 10-bit planar 4:2:0 reader (YuvFileIO m_packedYUVMode;
    file bit depth must be 10, width must satisfy (w/2) % 4 == 0)."""
    if (w >> 1) % 4:
        raise ValueError("unsupported file width for packed input")
    ystride = w * 5 // 4
    cstride = (w // 2) * 5 // 4
    fsz = ystride * h + 2 * cstride * (h // 2)
    data = np.fromfile(path, dtype=np.uint8)
    total = len(data) // fsz
    end = total if num_frames is None else min(total, start + num_frames)
    for i in range(start, end):
        f = data[i * fsz:(i + 1) * fsz]
        yy = _unpack10(f[:ystride * h], w, h)
        cb = _unpack10(f[ystride * h:ystride * h + cstride * (h // 2)],
                       w // 2, h // 2)
        cr = _unpack10(f[ystride * h + cstride * (h // 2):],
                       w // 2, h // 2)
        yield (yy, cb, cr)


def write_yuv_packed10(path: str, frames, append: bool = False):
    """Packed 10-bit planar writer (YuvFileIO packed output)."""
    mode = "ab" if append else "wb"
    with open(path, mode) as f:
        for planes in frames:
            for p in planes:
                f.write(_pack10(np.asarray(p)))


def msb_extend(plane: np.ndarray, in_bits: int, out_bits: int,
               clip_rec709: bool = False) -> np.ndarray:
    """MSB-extension bit-depth scaling (YuvFileIO m_MSBExtendedBitDepth
    / FileIOHelper scaleYuvPlane): shift up when out > in; when scaling
    DOWN, optional ITU-R BT.709-compliant clipping keeps values inside
    [1 << (out-8), (0xff << (out-8)) - 1]."""
    shift = out_bits - in_bits
    p = plane.astype(np.int32)
    if shift >= 0:
        out = p << shift
    else:
        out = (p + (1 << (-shift - 1))) >> -shift
        if clip_rec709 and out_bits >= 8:
            out = np.clip(out, 1 << (out_bits - 8),
                          (0xFF << (out_bits - 8)) - 1)
    dt = np.uint16 if out_bits > 8 else np.uint8
    return np.clip(out, 0, (1 << out_bits) - 1).astype(dt)


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
