"""Native CTU search driver (entropy.cpp vte_search_ctu): bit-exactness
vs the Python golden searcher, across the driver's v1 scope (the
faster/firstpass intra path: QT-only luma, dual-tree, CCLM, implicit
MTS, RDOQ+SDH)."""

import os

import numpy as np
import pytest

from vvenc_tpu import native
from vvenc_tpu.decoder.decoder import decode_stream
from vvenc_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _frame(w, h, seed):
    import scipy.ndimage as ndi
    rng = np.random.RandomState(seed)
    base = ndi.gaussian_filter(
        rng.randint(0, 255, (h + 8, w + 8)).astype(np.float32), 1.5)
    y = ((base - base.min()) / (base.max() - base.min()) * 230
         + 10)[:h, :w].astype(np.uint8)
    u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
    v = (128 - y[::2, ::2] // 3).astype(np.uint8)
    return y, u, v


def _run(cfg_kw, seed=11):
    """Encode one frame with the check-mode dispatcher: the native tree
    is asserted equal to the Python searcher's tree at every CTU."""
    w, h = cfg_kw.pop("width"), cfg_kw.pop("height")
    frame = _frame(w, h, seed)
    old = os.environ.get("VVENC_TPU_NATIVE_SEARCH")
    os.environ["VVENC_TPU_NATIVE_SEARCH"] = "check"
    try:
        enc = IntraEncoder(EncoderConfig(
            width=w, height=h, intra_period=1, gop_size=1, mctf=False,
            intra_presel="exact", **cfg_kw))
        au = enc.encode_frame(frame)
    finally:
        if old is None:
            del os.environ["VVENC_TPU_NATIVE_SEARCH"]
        else:
            os.environ["VVENC_TPU_NATIVE_SEARCH"] = old
    dec = decode_stream(au)
    assert len(dec) == 1
    for c in range(3):
        assert np.array_equal(dec[0].planes[c], enc.last_rec.rec[c])
    return au


def test_single_tree_basic():
    _run(dict(width=128, height=64, qp=30, ctu_size=64, deblocking=False))


def test_dual_tree_full_faster_toolset():
    """The BASELINE config-1 tool set: dual-tree intra, CCLM, implicit
    MTS, SDH, deblocking, boundary CTUs (416x240)."""
    _run(dict(width=416, height=240, qp=37, ctu_size=64, deblocking=True,
              dual_tree=True, cclm=True, mts_implicit=True,
              sign_data_hiding=True, num_full_rd_modes=2,
              num_chroma_rd_modes=2))


def test_qp_sweep_small():
    for qp in (22, 32, 42):
        _run(dict(width=96, height=48, qp=qp, ctu_size=32,
                  deblocking=True, cclm=True), seed=qp)


def test_native_eligibility_gates():
    """Tools outside the driver's scope must fall back to Python."""
    from vvenc_tpu.encoder.intra_encoder import _CtuSearcher

    enc = IntraEncoder(EncoderConfig(
        width=64, height=64, qp=30, ctu_size=64, intra_period=1,
        gop_size=1, mctf=False, transform_skip=True))
    frame = _frame(64, 64, 3)
    calls = {"n": 0}
    orig = native.search_ctu

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    native.search_ctu = spy
    try:
        enc.encode_frame(frame)
    finally:
        native.search_ctu = orig
    assert calls["n"] == 0, \
        "native search must not run with transform-skip on"


def test_mtt_partitioning_matches_python():
    """BT/TT partitioning to MTT depth 3 (incl. the C++ twin of the
    EncModeCtrl save/load mode cache, whose reuse ordering is decision-
    visible on area revisits) is bit-exact vs the Python searcher."""
    for mtt, ctu, qp in ((1, 64, 30), (2, 64, 24), (3, 64, 30),
                         (2, 128, 34)):
        _run(dict(width=128, height=96, qp=qp, ctu_size=ctu,
                  deblocking=True, cclm=True, max_mtt_depth=mtt,
                  dual_tree=True), seed=mtt * 7 + qp)


def test_dep_quant_matches_python():
    """Dependent quantization (native trellis) inside the CTU search,
    with and without MTT, is bit-exact vs the Python searcher."""
    for mtt, qp in ((0, 24), (0, 34), (2, 30)):
        _run(dict(width=128, height=96, qp=qp, ctu_size=64,
                  deblocking=True, cclm=True, max_mtt_depth=mtt,
                  dual_tree=True, dep_quant=True,
                  sign_data_hiding=False), seed=mtt + qp)


def test_mip_mrl_lfnst_match_python():
    """MIP (matrix intra), MRL (multi-reference-line), and LFNST
    (secondary transform incl. the chroma-retract fallback) in the
    native searcher are bit-exact vs the Python golden, alone and
    stacked with MTT + dependent quantization."""
    for kw, qp in ((dict(mip=True), 24), (dict(mrl=True), 30),
                   (dict(lfnst=True), 24),
                   (dict(mip=True, mrl=True, lfnst=True), 34),
                   (dict(mip=True, mrl=True, lfnst=True, max_mtt_depth=2,
                         dep_quant=True, sign_data_hiding=False), 30)):
        _run(dict(width=128, height=96, qp=qp, ctu_size=64,
                  deblocking=True, cclm=True, dual_tree=True, **kw),
             seed=qp + len(kw))


def test_isp_jccr_medium_toolset_matches_python():
    """ISP (sequential sub-partition trials incl. the 4-wide prediction
    regions) and JCCR (joint Cb-Cr trials on the chroma winner), alone
    and as the full medium-preset intra tool stack (CTU 128, MTT 2,
    dep_quant, MIP/MRL/LFNST/implicit-MTS), bit-exact vs the Python
    searcher."""
    for kw, qp in ((dict(isp=True), 30),
                   (dict(jccr=True), 24),
                   (dict(isp=True, jccr=True, lfnst=True, mip=True,
                         mrl=True, mts_implicit=True, max_mtt_depth=2,
                         dep_quant=True, sign_data_hiding=False,
                         ctu_size=128), 34)):
        kw.setdefault("ctu_size", 64)
        _run(dict(width=128, height=96, qp=qp, deblocking=True,
                  cclm=True, dual_tree=True, **kw), seed=qp)


def test_qpa_dqp_matches_python():
    """Per-CTU QP (QPA -> cu_qp_delta) through the native searcher:
    bit-exact vs the Python golden at CTU 64 and 128 (the 128 dual-tree
    case pins the CTU-root quantization-group fix)."""
    for ctu, mtt in ((64, 0), (128, 1)):
        _run(dict(width=256, height=128, qp=37, ctu_size=ctu,
                  deblocking=True, cclm=True, dual_tree=True, qpa=True,
                  max_mtt_depth=mtt, dep_quant=True,
                  sign_data_hiding=False), seed=ctu)


def _moving_frames(w, h, n, seed=5):
    import scipy.ndimage as ndi
    rng = np.random.RandomState(seed)
    base = ndi.gaussian_filter(
        rng.randint(0, 255, (h + 64, w + 64)).astype(np.float32), 1.2)
    base = (base - base.min()) / (base.max() - base.min() + 1e-9) * 230 + 10
    frames = []
    for i in range(n):
        dx, dy = int(2.5 * i), int(1.7 * i)
        y = base[dy:dy + h, dx:dx + w].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
        v = (128 - y[::2, ::2] // 3).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _run_seq(cfg_kw, n=5, seed=5):
    """Random-access sequence through the check-mode dispatcher: the
    native inter-slice CTU search is asserted tree-equal to the Python
    golden searcher at every CTU of every B/P slice."""
    w, h = cfg_kw.pop("width"), cfg_kw.pop("height")
    frames = _moving_frames(w, h, n, seed)
    old = os.environ.get("VVENC_TPU_NATIVE_SEARCH")
    os.environ["VVENC_TPU_NATIVE_SEARCH"] = "check"
    try:
        enc = IntraEncoder(EncoderConfig(
            width=w, height=h, intra_period=0, max_parallel_frames=1,
            intra_presel="exact", me_mode="host", **cfg_kw))
        stream = enc.encode_sequence(frames)
    finally:
        if old is None:
            del os.environ["VVENC_TPU_NATIVE_SEARCH"]
        else:
            os.environ["VVENC_TPU_NATIVE_SEARCH"] = old
    dec = decode_stream(stream)
    assert len(dec) == n
    return stream


def test_inter_faster_toolset_matches_python():
    """The native inter (B/P) slice search — merge/skip + AMVP uni/bi +
    DMVR + TMVP + intra fallback + BIM DQP (BASELINE config-2 toolset at
    preset faster) — bit-exact vs the Python golden searcher
    (inter_search.py); reference scope EncCu.cpp:717 at preset faster."""
    _run_seq(dict(width=192, height=96, qp=33, ctu_size=64, gop_size=4,
                  deblocking=True, sao=True, cclm=True, dual_tree=True,
                  mts_implicit=True, mctf=True, bim=True, dmvr=True,
                  tmvp=True, alf=True, ccalf=True), n=5)


def test_inter_qp_sweep_matches_python():
    """QP sweep over the inter search (estimator near-ties move the
    trial ordering; the native searcher must fork identically)."""
    for qp in (24, 38):
        _run_seq(dict(width=128, height=64, qp=qp, ctu_size=64,
                      gop_size=2, deblocking=True, dmvr=True, tmvp=True,
                      mctf=True, bim=True), n=3, seed=qp)


def test_inter_medium_toolset_matches_python():
    """The FULL medium-preset inter toolset through the native searcher:
    MTT, CTU 128 (>maxTB tiling), BDOF, MMVD, SMVD, AMVR, GEO, affine
    merge/AMVP + SbTMVP + PROF, dep-quant, LFNST/MIP gates, QPA DQP —
    bit-exact vs the Python golden searcher (the BASELINE config-3
    operating point)."""
    _run_seq(dict(width=192, height=96, qp=32, gop_size=2, qpa=True,
                  ctu_size=128, max_mtt_depth=1,
                  mctf=True, bim=True, alf=True, ccalf=True, dmvr=True,
                  bdof=True, dep_quant=True, lfnst=True, affine=4, amvr=5,
                  mmvd=3, mrl=True, prof=True, sbtmvp=True, jccr=True,
                  cclm=True, mts_implicit=True, mip=True, isp=3,
                  smvd=3, geo=4, sao=True, deblocking=True, tmvp=True,
                  dual_tree=True, num_full_rd_modes=3,
                  num_chroma_rd_modes=4), n=4)


def test_inter_tool_families_match_python():
    """Per-family coverage on top of faster: BDOF+MMVD+GEO and
    affine+SbTMVP+PROF+AMVR+SMVD, at a low QP (residual-heavy paths)."""
    base = dict(width=160, height=96, qp=25, ctu_size=64, gop_size=4,
                deblocking=True, dmvr=True, tmvp=True, mctf=True, bim=True)
    _run_seq(dict(bdof=True, mmvd=3, geo=4, **base), n=4, seed=9)
    _run_seq(dict(affine=4, sbtmvp=True, prof=True, amvr=5, smvd=3,
                  bdof=True, **base), n=4, seed=10)


def test_ifp_native_matches_python():
    """Native CTU search under the IFP motion window must produce the
    exact tree the Python golden searcher produces with the same
    ifp_bottom (check mode asserts per-CTU equality)."""
    import os
    import numpy as np
    from vvenc_tpu.encoder import IntraEncoder, EncoderConfig
    from vvenc_tpu.decoder import decode_stream

    rng = np.random.RandomState(5)
    w, h, n = 192, 192, 9
    frames = []
    for t in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = np.clip(90 + 60 * np.sin((xx + 3.1 * t) / 7.0)
                    * np.cos((yy - 2.2 * t) / 6.0)
                    + rng.randn(h, w) * 5, 0, 255).astype(np.uint8)
        u = np.clip(120 + 10 * np.sin(xx / 9.0 + t / 3.0),
                    0, 255)[::2, ::2].astype(np.uint8)
        v = np.clip(130 + 12 * np.cos(yy / 11.0 - t / 4.0),
                    0, 255)[::2, ::2].astype(np.uint8)
        frames.append((y, u, v))
    os.environ["VVENC_TPU_NATIVE_SEARCH"] = "check"
    try:
        enc = IntraEncoder(EncoderConfig(
            width=w, height=h, ifp=True, max_parallel_frames=3, qp=37,
            gop_size=8, intra_period=16, qpa=1, mctf=True, bim=True,
            amvr=True, smvd=True, mmvd=True, geo=True, affine=True,
            sbtmvp=True, dmvr=True, bdof=True, dep_quant=True, lfnst=True,
            max_mtt_depth=1, mip=True, mrl=True, isp=True, jccr=True,
            cclm=True, mts_implicit=True, sao=True, deblocking=True,
            alf=True, ccalf=True))
        stream = enc.encode_sequence(frames)
    finally:
        os.environ.pop("VVENC_TPU_NATIVE_SEARCH", None)
    decs = decode_stream(stream)
    assert len(decs) == n
