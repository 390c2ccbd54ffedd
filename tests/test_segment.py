"""Segment mode (vvenc m_SegmentMode + lead/trail frames,
vvencCfg.h:460,758-759): a long sequence encoded as independently
restartable FIRST/LAST chunks — in separate processes via the CLI —
concatenates to the byte-identical one-shot bitstream, because the MCTF
lead/trail context frames span the segment join."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _write_clip(path, w, h, n):
    rng = np.random.RandomState(11)
    base = rng.randint(30, 220, (h + 2 * n, w + 2 * n)).astype(np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            y = base[i:i + h, 2 * i:2 * i + w]
            u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
            v = (128 - y[::2, ::2] // 3).astype(np.uint8)
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def _encode(args, out):
    r = subprocess.run(
        [sys.executable, "-m", "vvenc_tpu"] + args + ["-o", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    return out.read_bytes()


def test_segment_concatenation_matches_one_shot(tmp_path):
    w, h, n = 64, 64, 16
    ip = 8                       # segment boundary = intra period
    clip = tmp_path / "clip.yuv"
    _write_clip(clip, w, h, n)
    base = ["-i", str(clip), "-s", f"{w}x{h}", "-q", "35",
            "--gop-size", "4", "--intra-period", str(ip),
            "--set", "mctf=2", "--set", "alf=0", "--set", "bim=0",
            "--set", "max_parallel_frames=1",
            "--set", "num_parallel_gops=1"]
    one = _encode(base + ["-f", str(n)], tmp_path / "one.266")
    # FIRST: frames 0..7 coded, 4 trail context frames read beyond
    first = _encode(base + ["-f", str(ip), "--segment", "first"],
                    tmp_path / "first.266")
    # LAST: frames 8..15 coded, 4 lead context frames read before
    last = _encode(base + ["-f", str(n - ip), "--segment", "last",
                           "--skip", str(ip)],
                   tmp_path / "last.266")
    assert len(one) > 0
    assert first + last == one, (
        f"segments concat {len(first)}+{len(last)} != one-shot {len(one)}")
    from vvenc_tpu.decoder.decoder import decode_stream
    frames = decode_stream(first + last)
    assert len(frames) == n


def test_segment_config_validation():
    import pytest as _pytest
    from vvenc_tpu.config.config import (VvencTpuConfig, apply_derived,
                                         check_config)
    cfg = VvencTpuConfig(width=64, height=64, qp=32, gop_size=4,
                         segment_mode="mid", mctf=2)
    apply_derived(cfg)
    assert cfg.lead_frames == 4 and cfg.trail_frames == 4
    cfg2 = VvencTpuConfig(width=64, height=64, qp=32,
                          segment_mode="first", target_bitrate=100000)
    with _pytest.raises(ValueError):
        check_config(cfg2)
