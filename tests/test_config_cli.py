"""Config/preset system, YUV I/O, and CLI smoke tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from vvenc_tpu.config import VvencTpuConfig, Preset, init_preset, check_config
from vvenc_tpu.config.config import set_param, _PRESET_MATRIX
from vvenc_tpu.utils.yuv_io import read_yuv, write_yuv, frame_size_bytes


def test_presets_apply_and_clamp():
    for preset in Preset:
        cfg = VvencTpuConfig(width=416, height=240, qp=32, intra_period=1,
                             gop_size=1)
        init_preset(cfg, preset)
        check_config(cfg)  # clamped config must validate
        # every preset deblocks (vvencCfg.cpp never disables the loop
        # filter) and the partitioning matches SURVEY.md §7.1
        assert cfg.deblocking == 1
    cfg = VvencTpuConfig(width=416, height=240, qp=32, intra_period=1,
                         gop_size=1)
    init_preset(cfg, Preset.MEDIUM)
    assert cfg.ctu_size == 128 and cfg.max_mtt_depth_i == 2
    init_preset(cfg, Preset.FASTER)
    assert cfg.ctu_size == 64 and cfg.max_mtt_depth_i == 0


def test_preset_target_matrix_unclamped():
    cfg = VvencTpuConfig(width=416, height=240)
    init_preset(cfg, Preset.MEDIUM, clamp_to_implemented=False)
    assert cfg.ctu_size == 128 and cfg.alf == 1 and cfg.dep_quant == 1
    # the full medium tool matrix now validates unclamped
    check_config(cfg)


def test_check_config_rejects_bad():
    cfg = VvencTpuConfig(width=0, height=240)
    with pytest.raises(ValueError):
        check_config(cfg)
    cfg = VvencTpuConfig(width=416, height=240, qp=99)
    with pytest.raises(ValueError):
        check_config(cfg)


def test_set_param_string_api():
    cfg = VvencTpuConfig()
    set_param(cfg, "QP", 27)
    set_param(cfg, "intra-period", 1)
    assert cfg.qp == 27 and cfg.intra_period == 1
    with pytest.raises(KeyError):
        set_param(cfg, "NotAThing", 1)


def test_yuv_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    w, h = 32, 16
    frames = [(rng.randint(0, 255, (h, w)).astype(np.uint8),
               rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8),
               rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8))
              for _ in range(3)]
    p = str(tmp_path / "t.yuv")
    write_yuv(p, frames, 8)
    assert os.path.getsize(p) == 3 * frame_size_bytes(w, h, 8)
    back = list(read_yuv(p, w, h, 8))
    assert len(back) == 3
    for a, b in zip(frames, back):
        for c in range(3):
            assert np.array_equal(a[c], b[c])


def test_cli_smoke(tmp_path):
    w, h = 64, 32
    rng = np.random.RandomState(1)
    src = str(tmp_path / "in.yuv")
    with open(src, "wb") as f:
        y = np.clip(40 + np.arange(w)[None].repeat(h, 0) * 2 +
                    rng.randn(h, w) * 3, 0, 255).astype(np.uint8)
        f.write(y.tobytes())
        f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
        f.write(np.full((h // 2, w // 2), 100, np.uint8).tobytes())
    out = str(tmp_path / "out.266")
    r = subprocess.run(
        [sys.executable, "-m", "vvenc_tpu", "-i", src, "-o", out,
         "-s", f"{w}x{h}", "-q", "37", "--verify"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "verify decode: OK" in r.stdout
    assert os.path.getsize(out) > 0


def test_ffapp_cfg_file(tmp_path):
    """Expert app: VTM-style cfg file drives the encoder (vvencFFapp
    analog) and the result verifies."""
    import numpy as np
    clip = tmp_path / "in.yuv"
    W, H, N = 64, 32, 2
    rng = np.random.RandomState(1)
    with open(clip, "wb") as f:
        for t in range(N):
            y = rng.randint(0, 255, (H, W), dtype=np.uint8)
            u = rng.randint(0, 255, (H // 2, W // 2), dtype=np.uint8)
            v = rng.randint(0, 255, (H // 2, W // 2), dtype=np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    cfg = tmp_path / "enc.cfg"
    cfg.write_text(
        f"InputFile : {clip}\n"
        f"BitstreamFile : {tmp_path / 'out.266'}\n"
        "Size : 64x32\nQP : 40\nFramesToBeEncoded : 2\n"
        "IntraPeriod : 1\nSAO : 1\nWPP : 1\n")
    from vvenc_tpu.ffapp import main as ffmain
    assert ffmain(["-c", str(cfg), "--verify"]) == 0
    assert (tmp_path / "out.266").stat().st_size > 0


def test_aux_subsystems_units():
    """MsgLog callback + TimeProfiler accumulation + DTrace rules."""
    from vvenc_tpu.utils.msglog import MsgLog, INFO, ERROR
    got = []
    log = MsgLog()
    log.set_callback(lambda lv, txt: got.append((lv, txt)))
    log.info("hello %d", 7)
    log.error("bad")
    log.set_level(0)
    log.info("suppressed")
    assert got == [(INFO, "hello 7"), (ERROR, "bad")]

    from vvenc_tpu.utils.profiler import Profiler
    prof = Profiler(enabled=True)
    with prof.section("a"):
        pass
    with prof.section("a"):
        pass
    rep = prof.report(out=open(os.devnull, "w"))
    assert "a" in rep and prof._acc["a"][1] == 2

    from vvenc_tpu.utils.dtrace import DTrace
    dt = DTrace()
    dt.configure("D_SYNTAX:poc>=2,final==1")
    dt.update_ctx(poc=1, final=1)
    assert not dt._match("D_SYNTAX")
    dt.update_ctx(poc=3)
    assert dt._match("D_SYNTAX") and not dt._match("D_CABAC")


def test_apply_derived_mt_profile_and_refresh_sec():
    """mtProfile auto-boost (vvencCfg.cpp:2307-2342 analog), auto thread
    count (vvencCfg.h:435) and intra-period-in-seconds derivation."""
    from vvenc_tpu.config.config import (VvencTpuConfig, apply_derived,
                                         default_thread_count)
    # auto thread count scales with resolution (capped to cores)
    lo = VvencTpuConfig(width=640, height=360)
    hi = VvencTpuConfig(width=3840, height=2160)
    assert default_thread_count(lo) <= default_thread_count(hi)

    cfg = VvencTpuConfig(width=640, height=360, threads=-1)
    apply_derived(cfg)
    assert cfg.threads >= 1

    # boost ladder: 1x default -> WPP, 1.5x -> IFP, 2x -> tiles
    cfg = VvencTpuConfig(width=640, height=360, threads=4, mt_profile=1)
    apply_derived(cfg)
    assert cfg.wpp == 1 and cfg.ifp == 0 and cfg.num_tile_cols == 1
    cfg = VvencTpuConfig(width=640, height=360, threads=6, mt_profile=1)
    apply_derived(cfg)
    assert cfg.wpp == 1 and cfg.ifp == 1 and cfg.num_tile_cols == 1
    cfg = VvencTpuConfig(width=640, height=360, threads=8, mt_profile=1)
    apply_derived(cfg)
    assert cfg.wpp == 1 and cfg.ifp == 1 and cfg.num_tile_cols == 2
    assert cfg.max_parallel_frames > 0
    # explicit user settings are never reduced
    cfg = VvencTpuConfig(width=640, height=360, threads=2, mt_profile=1,
                         num_tile_cols=3)
    apply_derived(cfg)
    assert cfg.num_tile_cols == 3

    # refresh_sec -> intra period in frames, rounded up to a GOP multiple
    cfg = VvencTpuConfig(width=64, height=64, fps_num=30, fps_den=1,
                         gop_size=16, refresh_sec=1.0)
    apply_derived(cfg)
    assert cfg.intra_period == 32          # 30 frames -> next GOP multiple
    cfg = VvencTpuConfig(width=64, height=64, fps_num=32, fps_den=1,
                         gop_size=16, refresh_sec=1.0)
    apply_derived(cfg)
    assert cfg.intra_period == 32
    # explicit intra_period wins over refresh_sec
    cfg = VvencTpuConfig(width=64, height=64, fps_num=30, fps_den=1,
                         gop_size=16, refresh_sec=1.0, intra_period=64)
    apply_derived(cfg)
    assert cfg.intra_period == 64
