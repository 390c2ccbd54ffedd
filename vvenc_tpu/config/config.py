"""Flat encoder configuration + preset matrices + validation.

Field semantics follow the reference encoder's config system
(include/vvenc/vvencCfg.h:424-797); preset tool matrices follow
vvenc_init_preset (vvencCfg.cpp:2577+, summarized in SURVEY.md §7.1).
Tools not yet implemented are carried as config fields (set by presets)
and rejected by check_config with an explicit NotImplemented message so
the surface is complete while the gaps stay loud.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from enum import IntEnum
from typing import Optional


class Preset(IntEnum):
    FIRSTPASS = -1
    FASTER = 0
    FAST = 1
    MEDIUM = 2
    SLOW = 3
    SLOWER = 4
    TOOLTEST = 255


@dataclass
class VvencTpuConfig:
    # -- basic I/O ---------------------------------------------------------
    width: int = 0
    height: int = 0
    fps_num: int = 60
    fps_den: int = 1
    input_bit_depth: int = 8
    internal_bit_depth: int = 10
    # -- rate / quality ----------------------------------------------------
    qp: int = 32
    intra_qp_offset: int = -3
    target_bitrate: int = 0          # 0: fixed QP
    rc_stats_out: str = ""           # 2-pass: stats file to write (pass 0)
    rc_stats_in: str = ""            # 2-pass: stats file to read (pass 1)
    max_bitrate: int = 0             # VBR rate cap (vvenc m_RCMaxBitrate)
    rc_passes: int = 1
    perceptual_qpa: int = 0
    # -- structure ---------------------------------------------------------
    gop_size: int = 32
    intra_period: int = 0            # 0: single IDR then inter (frames)
    refresh_sec: float = 0.0         # intra period in seconds (vvenc
                                     # m_IntraPeriodSec / --refreshsec)
    decoding_refresh_type: str = "idr"
    drap_period: int = 0             # dependent-RAP SEI period
                                     # (vvenc m_drapPeriod)
    # -- partitioning ------------------------------------------------------
    ctu_size: int = 32               # round 1: 32 (max TB 32); target 128
    min_qt_size: int = 8
    max_mtt_depth: int = 0           # P/B slices
    max_mtt_depth_i: int = 0
    dual_i_tree: int = 0
    # -- tools (0 = off; values follow vvenc conventions) ------------------
    mctf: int = 0
    bim: int = 0
    alf: int = 0
    alf_nonlinear: int = 0           # clipped-filter derivation (slower)
    ccalf: int = 0
    sao: int = 0
    deblocking: int = 0
    dep_quant: int = 0
    sign_data_hiding: int = 0
    rdoq: int = 1
    lfnst: int = 0
    mts: int = 0
    mts_implicit: int = 0
    mip: int = 0
    isp: int = 0
    mrl: int = 0
    lm_chroma: int = 0
    joint_cbcr: int = 0
    affine: int = 0
    dmvr: int = 0
    bdof: int = 0
    mmvd: int = 0
    smvd: int = 0
    geo: int = 0
    ciip: int = 0
    sbt: int = 0
    bcw: int = 0
    sbtmvp: int = 0
    amvr: int = 0
    prof: int = 0
    transform_skip: int = 0
    bdpcm: int = 0
    ibc: int = 0
    lmcs: int = 0                    # LMCS (deprecated upstream, supported)
    lmcs_update_ctrl: int = 0        # 0 RA, 1 AI, 2 LDB/LDP
    lmcs_offset: int = 6             # chroma residual scaling offset
    tmvp: int = 1                    # on in all vvenc presets
    picture_hash: int = 0            # decoded-picture-hash SEI method
    hrd_timing_sei: int = 0
    # -- parallelization (device mesh shape) --------------------------------
    num_tile_cols: int = 1
    num_tile_rows: int = 1
    max_parallel_frames: int = 0
    num_parallel_gops: int = 0
    segment_mode: str = "off"        # segment concatenation position
                                     # (vvenc m_SegmentMode: off/first/
                                     # mid/last); lead/trail frames are
                                     # derived in apply_derived
    lead_frames: int = 0             # MCTF context before POC 0 (derived)
    trail_frames: int = 0            # MCTF context after the last frame
    ifp: int = 0                     # inter-frame parallel (CTU-line sync)
    ifp_lines: int = 2
    look_ahead: int = 1              # RC lookahead pre-analysis (1-pass)
    threads: int = 0                 # worker budget (-1 = auto from size)
    mt_profile: int = 0              # auto-boost WPP/IFP/tiles from threads
    wpp: int = 0                     # entropy_coding_sync + entry points
    # -- misc --------------------------------------------------------------
    search_range: int = 64           # ME search range (vvenc m_SearchRange)
    # integer-ME coarse engine: "device" = frame-batched TPU full search
    # (ops/me.py frame_me), "host" = numpy grids, "auto" = device on an
    # accelerator backend
    me_mode: str = "auto"
    num_refs: int = 2                # active refs per list (numRefPicsActive)
    num_full_rd_modes: int = 3
    # chroma modes taken to full RD after SATD preselection (0 = all;
    # vvenc ReduceIntraChromaModesFullRD analog, IntraSearch.cpp
    # estIntraPredChromaQT)
    num_chroma_rd_modes: int = 0
    # intra preselection engine: "exact" = per-CU 67-mode sweep on the true
    # reconstructed references (bit-exact legacy path); "source" = frame-
    # level batched device kernel on source-sample references
    # (ops/intra_presel.py); "auto" = "source" on an accelerator backend,
    # "exact" on CPU (keeps the CPU test suite fast)
    intra_presel: str = "auto"
    # device RD planning: the batched device trial kernel decides the
    # luma coding tree + mode shortlists, the native driver codes the
    # plan exactly (ops/intra_plan.py); "auto" = on on an accelerator
    device_rd: str = "auto"


# tool values per preset, mirroring SURVEY.md §7.1 (subset of knobs that
# exist in this framework today; remaining knobs join as tools land)
_PRESET_MATRIX = {
    Preset.FIRSTPASS: dict(ctu_size=64, max_mtt_depth_i=0, mctf=2, bim=1,
                           sao=1, deblocking=1, lm_chroma=1, mts_implicit=1,
                           num_full_rd_modes=1, num_chroma_rd_modes=1),
    Preset.FASTER: dict(ctu_size=64, max_mtt_depth_i=0, mctf=2, bim=1,
                        sao=1, deblocking=1, lm_chroma=1, mts_implicit=1,
                        alf=1, ccalf=1, dmvr=1, num_full_rd_modes=2,
                        num_chroma_rd_modes=2),
    Preset.FAST: dict(sao=1, deblocking=1, ctu_size=64, max_mtt_depth_i=1,
                      mctf=2, bim=1,
                      alf=1, ccalf=1, dmvr=1, bdof=1, dep_quant=1, lfnst=1,
                      affine=5, amvr=5, mmvd=3, mrl=1, prof=1, sbtmvp=1,
                      joint_cbcr=1, lm_chroma=1, mts_implicit=1,
                      num_full_rd_modes=3,
                      num_chroma_rd_modes=3),
    Preset.MEDIUM: dict(sao=1, deblocking=1, ctu_size=128, max_mtt_depth=1,
                        max_mtt_depth_i=2,
                        mctf=2, bim=1, alf=1, ccalf=1, dmvr=1, bdof=1,
                        dep_quant=1, lfnst=1, affine=4, amvr=5, mmvd=3,
                        mrl=1, prof=1, sbtmvp=1, joint_cbcr=1, lm_chroma=1,
                        mts_implicit=1, mip=1, isp=3, smvd=3, geo=4,
                        num_full_rd_modes=3, num_chroma_rd_modes=4),
    Preset.SLOW: dict(sao=1, deblocking=1, ctu_size=128, max_mtt_depth=2,
                      max_mtt_depth_i=3,
                      mctf=2, alf=1, ccalf=1, dmvr=1, bdof=1, dep_quant=1,
                      lfnst=1, affine=3, amvr=1, mmvd=1, mrl=1, prof=1,
                      sbtmvp=1, joint_cbcr=1, lm_chroma=1, mts_implicit=1,
                      mip=1, isp=3, smvd=3, geo=2, ciip=1, sbt=1, bcw=2,
                      num_full_rd_modes=4),
    Preset.SLOWER: dict(sao=1, deblocking=1, ctu_size=128, max_mtt_depth=3,
                        max_mtt_depth_i=3, alf_nonlinear=1,
                        mctf=2, alf=1, ccalf=1, dmvr=1, bdof=1, dep_quant=1,
                        lfnst=1, affine=1, amvr=1, mmvd=1, mrl=1, prof=1,
                        sbtmvp=1, joint_cbcr=1, lm_chroma=1, mts=1, mip=1,
                        isp=1, smvd=1, geo=1, ciip=1, sbt=1, bcw=2,
                        num_full_rd_modes=6),
    Preset.TOOLTEST: dict(ctu_size=128, max_mtt_depth=1, max_mtt_depth_i=2,
                          mctf=1, alf=1, ccalf=1, dmvr=1, bdof=1, dep_quant=1,
                          lfnst=1, affine=1, amvr=1, mmvd=1, mrl=1, prof=1,
                          sbtmvp=1, joint_cbcr=1, mts=1, mip=1, isp=1, smvd=1,
                          geo=1, ciip=1, sbt=1, bcw=1, sao=1, deblocking=1,
                          transform_skip=1,
                          bdpcm=1, ibc=1, num_full_rd_modes=3),
}

# tool levels the current build implements END-TO-END in the encoder
# (the subset decoder additionally decodes: ISP, SBT, GEO, CIIP, affine,
# PROF, SbTMVP, BDOF, DMVR, AMVR, MMVD, SMVD, BCW, JCCR, TS, BDPCM, IBC,
# SDH, CC-ALF — encoder-side search for those lands tool by tool)
_IMPLEMENTED = {"mctf": 2, "bim": 1, "alf": 1, "ccalf": 1, "sao": 1,
                "deblocking": 1, "dep_quant": 1, "sign_data_hiding": 1,
                "lfnst": 1, "mts": 1, "mts_implicit": 1, "mip": 1, "isp": 3,
                "mrl": 1, "lm_chroma": 1, "joint_cbcr": 1, "affine": 5,
                "dmvr": 1, "bdof": 1, "mmvd": 3, "smvd": 3, "geo": 4,
                "ciip": 1, "sbt": 1, "bcw": 2, "sbtmvp": 1, "amvr": 5,
                "prof": 1, "transform_skip": 2, "bdpcm": 2, "ibc": 2,
                "tmvp": 1, "dual_i_tree": 1}


def init_preset(cfg: VvencTpuConfig, preset: Preset,
                clamp_to_implemented: bool = True) -> VvencTpuConfig:
    """Apply a preset's tool matrix (vvenc_init_preset analog).

    clamp_to_implemented: reduce not-yet-implemented tools to their
    implemented level instead of failing validation (the growing-framework
    default); pass False to see the full target matrix.
    """
    # baseline applied to every preset before the matrix
    # (vvencCfg.cpp:2588-2653: RDOQ=1, SAO=1, TMVP=1, SCC tools auto;
    # every preset sets m_dualITree = 1, vvencCfg.cpp:2668..3025)
    cfg.rdoq = 1
    cfg.tmvp = 1
    cfg.transform_skip = 2
    cfg.bdpcm = 2
    cfg.ibc = 2
    cfg.dual_i_tree = 1
    for k, v in _PRESET_MATRIX[preset].items():
        setattr(cfg, k, v)
    if clamp_to_implemented:
        for k, max_v in _IMPLEMENTED.items():
            if getattr(cfg, k) > max_v:
                setattr(cfg, k, max_v)
    return cfg


def default_thread_count(cfg: VvencTpuConfig) -> int:
    """Size-scaled default worker-thread count (vvencCfg.h:435: 4 below
    720p, 8 below 2880p, 12 otherwise, capped to available cores)."""
    import os
    base = 4 if cfg.height < 720 else (8 if cfg.height < 2880 else 12)
    return max(1, min(base, os.cpu_count() or 1))


def apply_derived(cfg: VvencTpuConfig) -> None:
    """Derive auto settings before validation (vvenc_init_config analog).

    - threads == -1 resolves to the size-scaled default
      (vvencCfg.h:435).
    - mt_profile auto-boost (vvencCfg.cpp:2307-2342): as the thread
      budget crosses 1x / 1.5x / 2x of the size default, enable WPP,
      then IFP, then a second tile column; frame parallelism takes the
      remaining budget.
    - refresh_sec converts an intra period given in seconds to frames,
      rounded up to a GOP multiple (vvencCfg.cpp m_IntraPeriodSec
      derivation).
    """
    if cfg.threads < 0:
        cfg.threads = default_thread_count(cfg)
    if cfg.mt_profile and cfg.threads > 1:
        base = 4 if cfg.height < 720 else (8 if cfg.height < 2880 else 12)
        t = cfg.threads
        if t >= base:
            cfg.wpp = max(cfg.wpp, 1)
        if 2 * t >= 3 * base:
            cfg.ifp = max(cfg.ifp, 1)
        if t >= 2 * base:
            cfg.num_tile_cols = max(cfg.num_tile_cols, 2)
        if cfg.max_parallel_frames == 0:
            cfg.max_parallel_frames = min(t, 4)
    if cfg.segment_mode != "off":
        # lead/trail frame derivation (vvencCfg.cpp:1460-1480): MCTF
        # needs +-RANGE context frames across segment joins so a
        # concatenated encode is identical to the one-shot encode
        mctf_frames = 4 if cfg.mctf else 0   # encoder/mctf.py RANGE
        cfg.lead_frames = 0 if cfg.segment_mode == "first" else mctf_frames
        cfg.trail_frames = 0 if cfg.segment_mode == "last" else mctf_frames
    if cfg.refresh_sec > 0 and cfg.intra_period == 0:
        fps = cfg.fps_num / max(1, cfg.fps_den)
        frames = max(1, int(round(cfg.refresh_sec * fps)))
        gop = max(1, cfg.gop_size)
        cfg.intra_period = max(gop, -(-frames // gop) * gop)


def check_config(cfg: VvencTpuConfig) -> None:
    """Validate + reject unimplemented combinations loudly
    (vvenc_init_config_parameter analog)."""
    if cfg.width <= 0 or cfg.height <= 0:
        raise ValueError("width/height must be set")
    if cfg.width % 2 or cfg.height % 2:
        raise ValueError("4:2:0 requires even dimensions")
    if not (0 <= cfg.qp <= 63):
        raise ValueError("QP out of range [0, 63]")
    if cfg.ctu_size not in (32, 64, 128):
        raise ValueError("CTU size must be 32, 64 or 128")
    if cfg.internal_bit_depth not in (8, 10):
        raise NotImplementedError("internal bit depth must be 8 or 10")
    if cfg.gop_size > 1 and (cfg.gop_size & (cfg.gop_size - 1)):
        raise ValueError("GOP size must be a power of two")
    if cfg.target_bitrate < 0:
        raise ValueError("negative target bitrate")
    if cfg.rc_passes not in (1, 2):
        raise ValueError("rc_passes must be 1 or 2")
    if cfg.segment_mode not in ("off", "first", "mid", "last"):
        raise ValueError("segment_mode must be off/first/mid/last")
    if cfg.segment_mode != "off" and cfg.target_bitrate > 0:
        raise ValueError(
            "segment concatenation not available with rate control "
            "(vvencCfg.cpp:1457)")
    if cfg.drap_period:
        # the DRAP implementation anchors on POC 0 as the associated
        # IRAP: only one IRAP is allowed (intra_period <= 0) and the
        # period must land on GOP boundaries
        if cfg.drap_period < 0 or cfg.gop_size < 1 \
                or cfg.drap_period % max(1, cfg.gop_size):
            raise ValueError(
                "drap_period must be a positive multiple of gop_size")
        if cfg.intra_period > 0 or cfg.refresh_sec > 0:
            raise ValueError(
                "drap_period requires a single IRAP "
                "(intra_period <= 0, refresh_sec = 0)")
    for k, max_v in _IMPLEMENTED.items():
        if getattr(cfg, k) > max_v:
            raise NotImplementedError(f"tool '{k}' not implemented yet")


def set_param(cfg: VvencTpuConfig, name: str, value) -> None:
    """String-keyed parameter API (vvenc_set_param analog)."""
    key = name.lower()
    for f in fields(cfg):
        if f.name.replace("_", "") == key.replace("_", "").replace("-", ""):
            setattr(cfg, f.name, type(getattr(cfg, f.name))(value))
            return
    raise KeyError(f"unknown parameter: {name}")
