"""Native C++ entropy kernels vs the Python reference — bit-exact.

Mirror of the reference's SIMD-vs-scalar equivalence strategy
(vvenc test/vvenc_unit_test: randomized inputs, exact compare)."""

import numpy as np
import pytest

from vvenc_tpu import native
from vvenc_tpu.bitstream.cabac import CtxModels, BitEstimator
from vvenc_tpu.bitstream.residual import encode_residual
from vvenc_tpu.bitstream import ctx_tables as ct

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (4, 16), (32, 8), (2, 8),
         (16, 4), (64, 64), (8, 2)]


def _rand_coeff(w, h, rng, scale, sparsity):
    c = (rng.randn(h, w) * scale).astype(np.int32)
    mask = rng.rand(h, w) < sparsity
    c *= mask
    return c


def _rand_ctx(rng):
    ctx = CtxModels()
    ctx.init(int(rng.randint(0, 64)), int(rng.randint(0, 3)))
    # random walk some states so we're not only at init values
    for _ in range(200):
        i = int(rng.randint(0, len(ctx.state0)))
        ctx.update(i, int(rng.randint(0, 2)))
    return ctx


class _PyBitEstimator(BitEstimator):
    """Subclass with a different __name__ so encode_residual takes the
    pure-Python path (the golden reference) instead of dispatching to the
    native kernel under test."""


@pytest.mark.parametrize("w,h", SIZES)
def test_est_residual_bit_exact(w, h):
    rng = np.random.RandomState(w * 100 + h)
    for trial in range(8):
        for dep_quant, sign_hiding in ((False, False), (True, False),
                                       (False, True)):
            c = _rand_coeff(w, h, rng, scale=rng.choice([1, 3, 40, 900]),
                            sparsity=rng.choice([0.05, 0.3, 0.9]))
            if w > 32 or h > 32:
                c[32:, :] = 0
                c[:, 32:] = 0
            if not np.any(c):
                c[0, 0] = 1
            ctx = _rand_ctx(rng)
            ctx_n = CtxModels(ctx)
            est = _PyBitEstimator(CtxModels(ctx))
            encode_residual(est, c, is_luma=bool(trial % 2),
                            dep_quant=dep_quant, sign_hiding=sign_hiding)
            bits_native = native.est_residual(c, bool(trial % 2), dep_quant,
                                              ctx_n, sign_hiding)
            assert bits_native == est.frac_bits, (w, h, trial, dep_quant,
                                                  sign_hiding)
            assert np.array_equal(ctx_n.state0, est.ctx.state0)
            assert np.array_equal(ctx_n.state1, est.ctx.state1)


@pytest.mark.parametrize("w,h", SIZES)
def test_write_residual_bit_exact(w, h):
    from vvenc_tpu.bitstream.bitwriter import BitWriter
    from vvenc_tpu.bitstream.cabac import CabacEncoder

    class _PyCabacEncoder(CabacEncoder):
        """Different __name__ -> encode_residual takes the Python path."""

    rng = np.random.RandomState(w * 7 + h + 5)
    for trial in range(6):
        for dep_quant, sign_hiding in ((False, False), (True, False),
                                       (False, True)):
            c = _rand_coeff(w, h, rng, scale=rng.choice([1, 3, 40, 900]),
                            sparsity=rng.choice([0.05, 0.3, 0.9]))
            if w > 32 or h > 32:
                c[32:, :] = 0
                c[:, 32:] = 0
            if not np.any(c):
                c[0, 0] = 1
            ctx = _rand_ctx(rng)
            enc_py = _PyCabacEncoder(BitWriter(), CtxModels(ctx))
            enc_nv = CabacEncoder(BitWriter(), CtxModels(ctx))
            # stir the engines identically so state isn't at start()
            for _ in range(int(rng.randint(0, 40))):
                b, cid = int(rng.randint(0, 2)), int(rng.randint(0, 300))
                enc_py.encode_bin(b, cid)
                ctx2 = enc_nv.ctx
                enc_nv.encode_bin(b, cid)
            is_luma = bool(trial % 2)
            encode_residual(enc_py, c, is_luma, dep_quant=dep_quant,
                            sign_hiding=sign_hiding)
            encode_residual(enc_nv, c, is_luma, dep_quant=dep_quant,
                            sign_hiding=sign_hiding)
            enc_py.finish()
            enc_nv.finish()
            assert enc_py.bw.num_bits == enc_nv.bw.num_bits
            enc_py.bw.align_zero()
            enc_nv.bw.align_zero()
            assert enc_py.bw.get_bytes() == enc_nv.bw.get_bytes(), \
                (w, h, trial, dep_quant, sign_hiding)
            assert np.array_equal(enc_py.ctx.state0, enc_nv.ctx.state0)
            assert np.array_equal(enc_py.ctx.state1, enc_nv.ctx.state1)


@pytest.mark.parametrize("w,h", SIZES)
def test_rdoq_bit_exact(w, h):
    from vvenc_tpu.ops.rdoq import _rdoq_py
    rng = np.random.RandomState(w * 31 + h)
    for trial in range(6):
        qp = int(rng.randint(10, 51))
        lm = 0.57 * 2.0 ** ((qp - 12) / 3.0) * 16
        c = _rand_coeff(w, h, rng, scale=rng.choice([20, 200, 4000]),
                        sparsity=rng.choice([0.1, 0.5, 1.0]))
        if w > 32 or h > 32:
            c[32:, :] = 0
            c[:, 32:] = 0
        ctx = _rand_ctx(rng)
        is_luma = bool(trial % 2)
        cbf = ct.CTX_SETS["QtCbfLuma"](0) if trial % 3 else None
        ref = _rdoq_py(c, qp, 10, is_luma, lm, ctx, cbf)
        got = native.rdoq(c, qp, 10, is_luma, lm, ctx, cbf)
        assert np.array_equal(ref, got), (w, h, trial, qp)


def test_native_predict_intra_matches_python_golden():
    """Native intra predictor == Python golden model, all mode classes
    (planar/DC/angular x MDIS/PDPC/MRL/ISP/chroma)."""
    import numpy as np
    from vvenc_tpu import native
    from vvenc_tpu.ops import intra as I
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(5)
    trials = 0
    for _ in range(600):
        w = int(rng.choice([4, 8, 16, 32, 64]))
        h = int(rng.choice([4, 8, 16, 32, 64]))
        is_luma = bool(rng.randint(2))
        if not is_luma:
            w, h = max(2, w // 2), max(2, h // 2)
        ref_idx = int(rng.choice([0, 0, 0, 1, 2])) if is_luma else 0
        mode = int(rng.randint(0, 67))
        if ref_idx and mode == 0:
            mode = 1
        lt, ll = 2 * w + ref_idx + 5, 2 * h + ref_idx + 5
        top = rng.randint(0, 1 << 10, lt).astype(np.int32)
        left = rng.randint(0, 1 << 10, ll).astype(np.int32)
        left[0] = top[0]
        isp, cd = False, None
        if rng.randint(4) == 0 and ref_idx == 0 and is_luma:
            isp, cd = True, (w * int(rng.choice([1, 2])), h)
        try:
            ref = I._predict_intra_py(top, left, mode, w, h, 10, is_luma,
                                      ref_idx=ref_idx, cu_dims=cd, isp=isp)
        except (AssertionError, IndexError, ValueError):
            continue
        got = native.predict_intra(top, left, mode, w, h, 10, is_luma,
                                   ref_idx, cd, isp)
        assert np.array_equal(ref, got), (w, h, mode, is_luma, ref_idx)
        trials += 1
    assert trials > 300


def test_native_depquant_matches_python():
    """Dependent-quantization trellis: the native port must be bit-exact
    vs ops/depquant.py on randomized TUs (sizes, QPs, components,
    sparsity, live context states)."""
    import numpy as np
    from vvenc_tpu import native
    from vvenc_tpu.ops.depquant import depquant_np
    from vvenc_tpu.bitstream.cabac import CtxModels
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(23)
    for _ in range(60):
        w = int(rng.choice([4, 8, 16, 32]))
        h = int(rng.choice([4, 8, 16, 32]))
        qp = int(rng.randint(18, 51)) + 12
        is_luma = bool(rng.randint(2))
        mag = int(rng.choice([60, 500, 15000]))
        coeff = rng.randint(-mag, mag + 1, (h, w)).astype(np.int64)
        if rng.randint(2):
            coeff = coeff * (rng.rand(h, w) < 0.2)
        ctx = CtxModels()
        ctx.init(int(rng.randint(0, 51)), int(rng.randint(3)))
        lm = 0.57 * 2.0 ** ((qp - 24) / 3)
        cbf = 80 if rng.randint(2) else None
        ref = depquant_np(coeff, qp, 10, is_luma, lm, ctx, cbf_ctx_id=cbf)
        got = native.depquant(coeff, qp, 10, is_luma, lm, ctx,
                              cbf_ctx_id=cbf)
        assert np.array_equal(ref, got)


def test_native_mip_matches_python():
    """Native MIP kernel (vte_predict_mip/_all) is bit-exact vs the
    numpy golden model across all size classes, modes and transposes."""
    import numpy as np
    from vvenc_tpu import native
    from vvenc_tpu.ops import mip
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(11)
    for w, h in [(4, 4), (4, 8), (8, 4), (8, 8), (4, 16), (16, 4),
                 (16, 16), (32, 8), (32, 32), (64, 64)]:
        n = mip.num_mip_modes(w, h)
        top = rng.randint(0, 1024, size=w).astype(np.int32)
        left = rng.randint(0, 1024, size=h).astype(np.int32)
        allp = native.predict_mip_all(top, left, w, h, 10, n)
        for m in range(n):
            for t in (0, 1):
                ref = mip._predict_mip_py(top, left, w, h, m, bool(t), 10)
                assert np.array_equal(
                    ref, native.predict_mip(top, left, w, h, m, t, 10)), \
                    (w, h, m, t)
                assert np.array_equal(ref, allp[m, t]), (w, h, m, t)


def test_native_dequant_dq_matches_python():
    """DQ dequant (vte_dequant_dq) bit-exact vs the pure-python state
    machine across sizes / QPs / sparsity (ADVICE r3: the numpy body was
    dead code once the native path loaded — keep a direct fuzz check)."""
    from vvenc_tpu.ops.transforms import _dequant_dq_py
    rng = np.random.RandomState(31)
    for _ in range(80):
        w = int(rng.choice([4, 8, 16, 32, 64]))
        h = int(rng.choice([4, 8, 16, 32, 64]))
        qp = int(rng.randint(1, 62))
        mag = int(rng.choice([3, 40, 4000]))
        qc = rng.randint(-mag, mag + 1, (h, w)).astype(np.int32)
        if rng.randint(2):
            qc = (qc * (rng.rand(h, w) < 0.15)).astype(np.int32)
        ref = _dequant_dq_py(qc, qp, 10)
        got = native.dequant_dq(qc, qp, 10)
        assert np.array_equal(ref, got), (w, h, qp)


def _alf_py(monkeypatch, fn, *args, **kw):
    """Run an ALF entry point with the native dispatch disabled."""
    monkeypatch.setattr(native, "available", lambda: False)
    try:
        return fn(*args, **kw)
    finally:
        monkeypatch.undo()


def test_native_alf_kernels_match_python(monkeypatch):
    """The four native ALF kernels (classify, 7x7 luma, 5x5 chroma,
    CC-ALF) are bit-exact vs the numpy spec models on randomized planes,
    including off-multiple-of-4 plane sizes and virtual-boundary rows
    (ADVICE r3: these replaced the numpy path with only indirect
    conformance coverage)."""
    from vvenc_tpu.codec import alf as A
    rng = np.random.RandomState(77)
    for trial in range(6):
        ctu = int(rng.choice([32, 64, 128]))
        h = int(rng.choice([64, 96, 68, 132]))
        w = int(rng.choice([64, 96, 72, 140]))
        bd = 10
        rec = rng.randint(0, 1 << bd, (h, w)).astype(np.int32)

        # classification (native works on the full plane; the numpy model
        # requires h, w multiples of 4 which all callers guarantee)
        h4, w4 = h & ~3, w & ~3
        cls_n, trn_n = A.classify_luma(rec[:h4, :w4], bd, ctu)
        cls_p, trn_p = _alf_py(monkeypatch, A.classify_luma,
                               rec[:h4, :w4], bd, ctu)
        assert np.array_equal(cls_n, cls_p) and np.array_equal(trn_n, trn_p)

        # luma 7x7 clipped filter over a sub-region
        cvals = A.clipping_values(bd)
        coeff = rng.randint(-128, 128, (25, 13)).astype(np.int32)
        clipv = cvals[rng.randint(0, 4, (25, 13))].astype(np.int32)
        x0 = int(rng.randint(0, 8)) * 4
        y0 = int(rng.randint(0, 8)) * 4
        w0 = int(rng.choice([16, 32, 64, 128]))
        h0 = int(rng.choice([16, 32, 64, 128]))
        dst_n = rec.copy()
        A.filter_luma_region(rec[:h4, :w4], dst_n[:h4, :w4], x0, y0, w0,
                             h0, cls_n, trn_n, coeff, clipv, bd, ctu)
        dst_p = rec.copy()
        _alf_py(monkeypatch, A.filter_luma_region, rec[:h4, :w4],
                dst_p[:h4, :w4], x0, y0, w0, h0, cls_p, trn_p, coeff,
                clipv, bd, ctu)
        assert np.array_equal(dst_n, dst_p), ("luma", trial)

        # chroma 5x5 (chroma plane: any size, incl. odd remainders)
        hc, wc = h // 2, w // 2
        cplane = rng.randint(0, 1 << bd, (hc, wc)).astype(np.int32)
        ccoef = rng.randint(-128, 128, 7).astype(np.int32)
        cclip = cvals[rng.randint(0, 4, 7)].astype(np.int32)
        dst_n = cplane.copy()
        A.filter_chroma_region(cplane, dst_n, 0, 0, wc, hc, ccoef, cclip,
                               bd, ctu // 2)
        dst_p = cplane.copy()
        _alf_py(monkeypatch, A.filter_chroma_region, cplane, dst_p, 0, 0,
                wc, hc, ccoef, cclip, bd, ctu // 2)
        assert np.array_equal(dst_n, dst_p), ("chroma", trial)

        # CC-ALF (3x4 diamond on co-located luma; coeff[7])
        cc = rng.randint(-32, 33, 7).astype(np.int32)
        dst_n = cplane.copy()
        A.filter_ccalf_region(rec, dst_n, 0, 0, wc, hc, cc, bd, ctu)
        dst_p = cplane.copy()
        _alf_py(monkeypatch, A.filter_ccalf_region, rec, dst_p, 0, 0, wc,
                hc, cc, bd, ctu)
        assert np.array_equal(dst_n, dst_p), ("ccalf", trial)


def test_native_mc_block_matches_python():
    """Native MC interpolation (vte_mc_block) bit-exact vs the python
    golden across phases / block sizes / border clamps / intermediate /
    alt-hpel / taps-override."""
    from vvenc_tpu.ops import interp as IP
    rng = np.random.RandomState(17)
    ref = rng.randint(0, 1024, (96, 128)).astype(np.int32)
    for trial in range(300):
        is_luma = bool(rng.randint(2))
        w = int(rng.choice([4, 8, 16, 32, 64]))
        h = int(rng.choice([4, 8, 16, 32]))
        x = int(rng.randint(-8, 128))
        y = int(rng.randint(-8, 96))
        fb = 4 if is_luma else 5
        mv_x = int(rng.randint(-40 << fb, 40 << fb))
        mv_y = int(rng.randint(-40 << fb, 40 << fb))
        inter = bool(rng.randint(2))
        alt = bool(rng.randint(4) == 0) and is_luma
        tov = None
        if is_luma and rng.randint(5) == 0:
            from vvenc_tpu.codec.affine import AFFINE_LUMA_FILTER
            tov = AFFINE_LUMA_FILTER
        refp = IP._mc_block_py(ref, x, y, w, h, mv_x, mv_y, 10, is_luma,
                               inter, alt, tov)
        got = native.mc_block(ref, x, y, w, h, mv_x, mv_y, 10, is_luma,
                              inter, alt, tov)
        assert np.array_equal(refp, got), \
            (trial, w, h, x, y, mv_x, mv_y, is_luma, inter, alt)


def test_native_alf_stats_matches_python():
    """vte_alf_stats (clipped-Wiener Gram accumulation) integer-exact vs
    the numpy fallback construction, luma (25 classes, transpose-mapped)
    and chroma, linear (n_clip=1) and clipped (n_clip=4) statistics."""
    import vvenc_tpu.encoder.alf_enc as ae
    from vvenc_tpu.codec.alf import classify_luma
    rng = np.random.RandomState(3)
    for trial, (h, w, bd) in enumerate([(64, 96, 8), (36, 52, 10)]):
        mx = (1 << bd) - 1
        rec = rng.randint(0, mx + 1, (h, w)).astype(np.int32)
        orig = np.clip(rec + rng.randint(-9, 10, (h, w)), 0,
                       mx).astype(np.int32)
        cls, trn = classify_luma(rec, bd, 64)
        cmap = np.repeat(np.repeat(cls, 4, 0), 4, 1)[:h, :w].reshape(-1)
        inv_tr = np.empty((4, 12), np.int8)
        for t in range(4):
            for g in range(12):
                inv_tr[t][ae._TR7[t][g]] = g
        tmap = np.repeat(np.repeat(trn, 4, 0), 4, 1)[:h, :w]
        rows = np.moveaxis(inv_tr[tmap], 2, 0)
        yy, xx = np.mgrid[0:h, 0:w]
        err = (orig.astype(np.int64) - rec.astype(np.int64)
               ).reshape(-1).astype(np.float64)
        for n_clip in (1, 4):
            GN, BN = native.alf_stats(rec, orig, bd, 64, cls, trn, n_clip)
            u = ae._tap_planes(rec, ae._LUMA_TAPS, 64, False,
                               halves=(n_clip == 4))
            parts = [u[rows, yy[None], xx[None]]]
            if n_clip == 4:
                parts.append(u[12 + rows, yy[None], xx[None]])
            flat = np.concatenate(parts, 0).reshape(
                12 * (2 if n_clip == 4 else 1), -1).astype(np.float64)
            for c in range(25):
                m = cmap == c
                if not m.any():
                    assert not GN[c].any() and not BN[c].any()
                    continue
                if n_clip == 1:
                    fc = flat[:, m]
                    G2, B2 = fc @ fc.T, fc @ err[m]
                else:
                    G2, B2 = ae._clipped_gram_numpy(flat[:, m], err[m],
                                                    12, bd)
                assert np.array_equal(GN[c], G2), (trial, n_clip, c)
                assert np.array_equal(BN[c], B2), (trial, n_clip, c)
        for n_clip in (1, 4):
            GN, BN = native.alf_stats(rec, orig, bd, 32, n_clip=n_clip)
            u = ae._tap_planes(rec, ae._CHROMA_TAPS, 32, True,
                               halves=(n_clip == 4))
            nch = 12 if n_clip == 4 else 6
            flat = u.reshape(nch, -1).astype(np.float64)
            if n_clip == 1:
                G2, B2 = flat @ flat.T, flat @ err
            else:
                G2, B2 = ae._clipped_gram_numpy(flat, err, 6, bd)
            assert np.array_equal(GN[0], G2), ("chroma", trial, n_clip)
            assert np.array_equal(BN[0], B2), ("chroma", trial, n_clip)


def test_native_sao_stats_matches_python():
    """vte_sao_stats (per-CTU EO/BO statistics) matches the numpy
    _picture_stats construction (EO categories 1..4; category 0 is
    border-handling noise in both and unused downstream)."""
    import vvenc_tpu.encoder.sao_enc as se
    rng = np.random.RandomState(5)
    for trial, (h, w, bd, cs) in enumerate(
            [(120, 208, 8, 64), (68, 100, 10, 32)]):
        mx = (1 << bd) - 1
        n_cols = (w + cs - 1) // cs
        n_rows = (h + cs - 1) // cs
        y = rng.randint(0, mx + 1, (h, w)).astype(np.int32)
        rec = {0: y, 1: y[:h // 2, :w // 2], 2: y[h // 2:, :w // 2]}
        src = {c: np.clip(p + rng.randint(-5, 6, p.shape), 0,
                          mx).astype(np.int32) for c, p in rec.items()}
        av = native.available
        try:
            native.available = lambda: False
            eo_py, bo_py = se._picture_stats(src, rec, bd, cs, n_cols,
                                             n_rows)
        finally:
            native.available = av
        eo_nt, bo_nt = se._picture_stats(src, rec, bd, cs, n_cols, n_rows)
        for comp in range(3):
            for ec in range(4):
                for i in range(2):
                    assert np.array_equal(eo_py[comp][ec][i][:, 1:5],
                                          eo_nt[comp][ec][i][:, 1:5]), \
                        (trial, comp, ec, i)
            for i in range(2):
                assert np.array_equal(bo_py[comp][i], bo_nt[comp][i]), \
                    (trial, comp, i)


def test_native_mctf_kernels_match_python():
    """vte_mctf_interp (whole-plane fractional interpolation) and
    vte_mctf_block_me (per-block integer full search incl. tie-break
    and edge clamping) bit-exact vs the numpy golden."""
    import vvenc_tpu.encoder.mctf as M
    rng = np.random.RandomState(4)
    for trial in range(4):
        h, w = [(64, 96), (48, 52)][trial % 2]
        pl = rng.randint(0, 1024, (h, w)).astype(np.int32)
        fx, fy = int(rng.randint(16)), int(rng.randint(16))
        taps8 = bool(trial % 2)
        av = native.available
        try:
            native.available = lambda: False
            want = M._interp_plane_mctf(pl, fx, fy, taps8, 10)
        finally:
            native.available = av
        got = M._interp_plane_mctf(pl, fx, fy, taps8, 10)
        assert np.array_equal(want, got), (trial, fx, fy, taps8)
        cur = rng.randint(0, 1024, (h, w)).astype(np.int32)
        ref = np.clip(cur + rng.randint(-20, 21, (h, w)), 0,
                      1023).astype(np.int32)
        bs, rg = [(16, 4), (8, 3)][trial % 2]
        nby, nbx = (h + bs - 1) // bs, (w + bs - 1) // bs
        iv = rng.randint(-3, 4, (nby, nbx, 2)).astype(np.int32)
        try:
            native.available = lambda: False
            mv0, e0 = M._block_me(cur, ref, bs, rg, iv)
        finally:
            native.available = av
        mv1, e1 = M._block_me(cur, ref, bs, rg, iv)
        assert np.array_equal(mv0, mv1) and np.array_equal(e0, e1), trial


def test_native_dmvr_padded_mc_matches_python():
    """vte_dmvr_padded_mc (window prefetch + replicate pad + MC core)
    bit-exact vs ops/dmvr.py padded_window_mc."""
    import vvenc_tpu.ops.dmvr as D
    rng = np.random.RandomState(11)
    ref = rng.randint(0, 1024, (128, 160)).astype(np.int32)
    for trial in range(120):
        cs = int(rng.randint(2))
        w = int(rng.choice([8, 16])) >> cs
        h = int(rng.choice([8, 16])) >> cs
        x = int(rng.randint(-4, 156))
        y = int(rng.randint(-4, 124))
        mmv = (int(rng.randint(-600, 600)), int(rng.randint(-600, 600)))
        d = (int(rng.randint(-32, 33)), int(rng.randint(-32, 33)))
        rmv = (mmv[0] + d[0], mmv[1] + d[1])
        im = bool(rng.randint(2))
        ah = bool(rng.randint(3) == 0) and cs == 0
        av = native.available
        try:
            native.available = lambda: False
            want = D.padded_window_mc(ref, x, y, w, h, mmv, rmv, cs, 10,
                                      320, 256, 64, intermediate=im,
                                      alt_hpel=ah)
        finally:
            native.available = av
        got = D.padded_window_mc(ref, x, y, w, h, mmv, rmv, cs, 10,
                                 320, 256, 64, intermediate=im,
                                 alt_hpel=ah)
        assert np.array_equal(want, got), trial


def test_native_mctf_block_kernels_match_python():
    """vte_mctf_block_ssd / vte_mctf_mc_plane (per-block fractional
    fetch on the virtual interp plane) bit-exact vs the plane-cache
    numpy golden."""
    import vvenc_tpu.encoder.mctf as M
    rng = np.random.RandomState(6)
    for trial in range(3):
        h, w = [(64, 96), (80, 52)][trial % 2]
        ref = rng.randint(0, 1024, (h, w)).astype(np.int32)
        bs = 16
        nby, nbx = (h + bs - 1) // bs, (w + bs - 1) // bs
        n = nby * nbx
        bxy = np.array([(bx * bs, by * bs) for by in range(nby)
                        for bx in range(nbx)], np.int32)
        mvq = rng.randint(-100, 100, (n, 2)).astype(np.int32)
        cur = rng.randint(0, 1024, (n, bs, bs)).astype(np.int64)
        av = native.available
        try:
            native.available = lambda: False
            want = M._ssd_blocks(cur, M._InterpCache(ref, True, 10),
                                 bxy, mvq, bs)
        finally:
            native.available = av
        got = M._ssd_blocks(cur, M._InterpCache(ref, True, 10), bxy,
                            mvq, bs)
        assert np.array_equal(want, got), trial
        mvg = rng.randint(-100, 100, (nby, nbx, 2)).astype(np.int32)
        for scale, t8 in ((0, True), (1, False), (1, True)):
            rr = ref[: h >> scale, : w >> scale].copy()
            try:
                native.available = lambda: False
                want = M._mc_plane_subpel(rr, mvg, bs, scale, t8, 10)
            finally:
                native.available = av
            got = M._mc_plane_subpel(rr, mvg, bs, scale, t8, 10)
            assert np.array_equal(want, got), (trial, scale, t8)


def test_native_dmvr_bi_subpu_matches_python():
    """vte_dmvr_bi_subpu (padded/plain MC for both lists + 14-bit bi
    average) bit-exact vs the python dmvr_predict non-BDOF path."""
    from vvenc_tpu.ops.dmvr import padded_window_mc, clip_mv
    from vvenc_tpu.ops.interp import mc_block_np, bi_average_np
    MV_MAX = (1 << 17) - 1
    MV_MIN = -(1 << 17)
    rng = np.random.RandomState(13)
    ref0 = rng.randint(0, 1024, (144, 176)).astype(np.int32)
    ref1 = rng.randint(0, 1024, (144, 176)).astype(np.int32)
    for trial in range(100):
        sc = int(rng.randint(2))
        bw = 16 >> sc
        bh = 16 >> sc
        bx = int(rng.randint(0, 150 >> sc))
        by = int(rng.randint(0, 120 >> sc))
        mv0 = (int(rng.randint(-500, 500)), int(rng.randint(-500, 500)))
        mv1 = (int(rng.randint(-500, 500)), int(rng.randint(-500, 500)))
        delta = (int(rng.randint(-32, 33)), int(rng.randint(-32, 33)))
        ah = bool(rng.randint(4) == 0) and sc == 0
        sh = 4 + sc
        preds = []
        for li, sign, mv, ref in ((0, 1, mv0, ref0), (1, -1, mv1, ref1)):
            rmv = (max(MV_MIN, min(MV_MAX, mv[0] + sign * delta[0])),
                   max(MV_MIN, min(MV_MAX, mv[1] + sign * delta[1])))
            d_ix = (rmv[0] >> sh) - (mv[0] >> sh)
            d_iy = (rmv[1] >> sh) - (mv[1] >> sh)
            if d_ix or d_iy:
                av = native.available
                try:
                    native.available = lambda: False
                    p = padded_window_mc(ref, bx, by, bw, bh, mv, rmv,
                                         sc, 10, 352, 288, 64,
                                         intermediate=True, alt_hpel=ah)
                finally:
                    native.available = av
            else:
                cmv = clip_mv(rmv, bx << sc, by << sc, 352, 288, 64)
                p = mc_block_np(ref, bx, by, bw, bh, cmv[0], cmv[1], 10,
                                is_luma=(sc == 0), intermediate=True,
                                alt_hpel=ah)
            preds.append(p)
        want = bi_average_np(preds[0], preds[1], 10)
        got = native.dmvr_bi_subpu(ref0, ref1, bx, by, bw, bh, mv0, mv1,
                                   delta, sc, 10, 352, 288, 64,
                                   alt_hpel=ah)
        assert np.array_equal(want, got), trial
