// Native host-side entropy kernels for vvenc_tpu.
//
// The reference encoder's entropy/quantization hot loops are C++
// (vvenc EncoderLib/BinEncoder.cpp estimator, CommonLib/QuantRDOQ.cpp
// xRateDistOptQuant, CABACWriter residual_coding); this module provides the
// same role for our framework: bit-exact ports of the Python reference
// implementations in vvenc_tpu/bitstream/{cabac,residual}.py and
// vvenc_tpu/ops/rdoq.py, driven through a C ABI (ctypes).
//
// Contract: outputs are REQUIRED to be bit-identical to the Python paths
// (tests/test_native.py enforces it on randomized TUs), so the Python and
// native paths are interchangeable per call.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <array>
#include <chrono>
#include <cstring>
#include <cmath>
#include <map>
#include <vector>
#include <algorithm>
#include <mutex>

namespace {

constexpr int PROB_BITS = 15;
constexpr uint32_t MASK_0 = ((1u << 10) - 1) << (PROB_BITS - 10);  // 0x7FE0
constexpr uint32_t MASK_1 = ((1u << 14) - 1) << (PROB_BITS - 14);  // 0x7FFE
constexpr int SCALE_BITS = 15;
constexpr int64_t EP_BIT = 1 << SCALE_BITS;

constexpr int COEF_REMAIN_BIN_REDUCTION = 5;
constexpr int MAX_LOG2_TR_DYNAMIC_RANGE = 15;
constexpr int CTX_BIN_SAMPLE_RATIO = 28;
constexpr int32_t COEFF_MIN = -(1 << MAX_LOG2_TR_DYNAMIC_RANGE);
constexpr int32_t COEFF_MAX = (1 << MAX_LOG2_TR_DYNAMIC_RANGE) - 1;
constexpr int64_t MAX_LEVEL = (1 << 15) - 1;

// dependent-quantization state transition (residual.py STATE_TRANS)
constexpr uint32_t STATE_TRANS = 32040;
inline int next_state(int state, int64_t level) {
  return (STATE_TRANS >> ((state << 2) + ((int(level) & 1) << 1))) & 3;
}

const int MIN_IN_GROUP[14] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96};
const int GROUP_IDX_TAB[64] = {
    0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7,
    8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9, 9,
    10,10,10,10,10,10,10,10,10,10,10,10,10,10,10,10,
    11,11,11,11,11,11,11,11,11,11,11,11,11,11,11,11};
const int GO_RICE_PARS[32] = {
    0,0,0,0,0,0,0, 1,1,1,1,1,1,1, 2,2,2,2,2,2,2,2,2,2,2,2,2,2, 3,3,3,3};
const int LAST_PREFIX_CTX[7] = {0, 0, 0, 3, 6, 10, 15};

// quant scales (ops/transforms.py QUANT_SCALES)
const int64_t QUANT_SCALES[2][6] = {
    {26214, 23302, 20560, 18396, 16384, 14564},
    {18396, 16384, 14564, 13107, 11651, 10280}};

// ---------------------------------------------------------------------------
// context bases + frac-bits table, installed from Python at init
// ---------------------------------------------------------------------------
struct CtxBases {
  // sig_flag sets in residual.py order: [luma0, chroma0, luma1, chroma1,
  // luma2, chroma2]
  int sig[6];
  int par[2];        // [luma, chroma]
  int gtx[4];        // [gt2 luma, gt2 chroma, gt1 luma, gt1 chroma]
  int last_x[2];
  int last_y[2];
  int sig_group[2];
};
CtxBases g_bases;
uint32_t g_frac[256][2];
bool g_init = false;

inline int state8(const uint16_t* s0, const uint16_t* s1, int ctx) {
  return (int(s0[ctx]) + int(s1[ctx])) >> 8;
}
inline int64_t frac_bits(const uint16_t* s0, const uint16_t* s1, int ctx,
                         int binval) {
  return g_frac[state8(s0, s1, ctx)][binval];
}
inline void ctx_update(uint16_t* s0, uint16_t* s1, const uint8_t* r0,
                       const uint8_t* r1, int ctx, int binval) {
  int a = s0[ctx], b = s1[ctx];
  a -= (a >> r0[ctx]) & int(MASK_0);
  b -= (b >> r1[ctx]) & int(MASK_1);
  if (binval) {
    a += (0x7FFF >> r0[ctx]) & int(MASK_0);
    b += (0x7FFF >> r1[ctx]) & int(MASK_1);
  }
  s0[ctx] = uint16_t(a);
  s1[ctx] = uint16_t(b);
}

// ---------------------------------------------------------------------------
// scan tables (residual.py scan_info port), cached per (log2w, log2h)
// ---------------------------------------------------------------------------
struct ScanInfo {
  std::vector<int> sx, sy, blkpos, cg_pos;
  int lcw, lch;
};

void log2_sbb(int lw, int lh, int& lcw, int& lch) {
  if (lw == 0)      { lcw = 0; lch = std::min(lh, 4); }
  else if (lh == 0) { lcw = std::min(lw, 4); lch = 0; }
  else if (lw == 1) { if (lh == 1 || lh == 2) { lcw = 1; lch = 1; } else { lcw = 1; lch = 3; } }
  else if (lh == 1) { if (lw == 1 || lw == 2) { lcw = 1; lch = 1; } else { lcw = 3; lch = 1; } }
  else              { lcw = 2; lch = 2; }
}

void diag_scan(int w, int h, std::vector<int>& xs, std::vector<int>& ys) {
  int x = 0, y = 0;
  for (int i = 0; i < w * h; ++i) {
    xs.push_back(x); ys.push_back(y);
    if (x == w - 1 || y == 0) {
      int ny = y + x + 1;
      x = 0;
      if (ny >= h) { x = ny - (h - 1); ny = h - 1; }
      y = ny;
    } else { ++x; --y; }
  }
}

ScanInfo g_scan_cache[7][7];
bool g_scan_ready[7][7] = {};
std::mutex g_scan_mutex;

const ScanInfo& scan_info(int log2w, int log2h) {
  if (!g_scan_ready[log2w][log2h]) {
    std::lock_guard<std::mutex> lock(g_scan_mutex);
    if (!g_scan_ready[log2w][log2h]) {
      ScanInfo si;
      int w = 1 << log2w, h = 1 << log2h;
      int zw = std::min(32, w), zh = std::min(32, h);
      log2_sbb(log2w, log2h, si.lcw, si.lch);
      int cgw = 1 << si.lcw, cgh = 1 << si.lch;
      std::vector<int> cgx, cgy, px, py;
      diag_scan(zw >> si.lcw, zh >> si.lch, cgx, cgy);
      diag_scan(cgw, cgh, px, py);
      for (size_t g = 0; g < cgx.size(); ++g) {
        for (size_t k = 0; k < px.size(); ++k) {
          int x = (cgx[g] << si.lcw) + px[k];
          int y = (cgy[g] << si.lch) + py[k];
          si.sx.push_back(x);
          si.sy.push_back(y);
          si.blkpos.push_back(y * w + x);
        }
        si.cg_pos.push_back(cgy[g] * (zw >> si.lcw) + cgx[g]);
      }
      g_scan_cache[log2w][log2h] = std::move(si);
      g_scan_ready[log2w][log2h] = true;
    }
  }
  return g_scan_cache[log2w][log2h];
}

// ---------------------------------------------------------------------------
// per-TU coefficient-coding context (residual.py _Cctx port)
// ---------------------------------------------------------------------------
struct Cctx {
  int w, h, log2w, log2h, ch;
  const ScanInfo* si;
  int log2_cg, n_coded, w_in_groups, h_in_groups;
  int tmpl_diag = -1, tmpl_sum1 = -1;
  int last_off_x, last_off_y, last_shift_x, last_shift_y;
  int max_last_x, max_last_y;

  Cctx(int w_, int h_, bool is_luma) : w(w_), h(h_) {
    log2w = 31 - __builtin_clz(w);
    log2h = 31 - __builtin_clz(h);
    ch = is_luma ? 0 : 1;
    si = &scan_info(log2w, log2h);
    log2_cg = si->lcw + si->lch;
    n_coded = int(si->sx.size());
    w_in_groups = std::max(1, std::min(32, w) >> si->lcw);
    h_in_groups = std::max(1, std::min(32, h) >> si->lch);
    if (ch == 0) {
      last_off_x = LAST_PREFIX_CTX[log2w];
      last_off_y = LAST_PREFIX_CTX[log2h];
      last_shift_x = (log2w + 1) >> 2;
      last_shift_y = (log2h + 1) >> 2;
    } else {
      last_off_x = last_off_y = 0;
      last_shift_x = std::min(std::max(0, w >> 3), 2);
      last_shift_y = std::min(std::max(0, h >> 3), 2);
    }
    max_last_x = GROUP_IDX_TAB[std::min(32, w) - 1];
    max_last_y = GROUP_IDX_TAB[std::min(32, h) - 1];
  }

  // sig_coeff_flag ctx id; coeff_cap: int32 [h*w] capped first-pass levels
  int sig_ctx_id(int sp, const int32_t* coeff_cap, int state) {
    int x = si->sx[sp], y = si->sy[sp];
    int diag = x + y;
    int s = 0, npos = 0;
    static const int DX[5] = {1, 2, 1, 0, 0};
    static const int DY[5] = {0, 0, 1, 1, 2};
    for (int k = 0; k < 5; ++k) {
      int nx = x + DX[k], ny = y + DY[k];
      if (nx < w && ny < h) {
        int v = coeff_cap[ny * w + nx];
        s += v;
        if (v) ++npos;
      }
    }
    int ctx_ofs = std::min((s + 1) >> 1, 3) + (diag < 2 ? 4 : 0);
    if (ch == 0) ctx_ofs += (diag < 5 ? 4 : 0);
    tmpl_diag = diag;
    tmpl_sum1 = s - npos;
    int set = std::max(0, state - 1);
    // sig set order [luma0, chroma0, luma1, chroma1, luma2, chroma2]
    return g_bases.sig[ch + 2 * set] + ctx_ofs;
  }

  int ctx_offset_abs() const {
    if (tmpl_diag == -1) return 0;
    int off = std::min(tmpl_sum1, 4) + 1;
    int d = tmpl_diag;
    if (ch == 0)
      off += (d == 0) ? 15 : (d < 3 ? 10 : (d < 10 ? 5 : 0));
    else
      off += (d == 0) ? 5 : 0;
    return off;
  }

  // abs_coeff: int64 [h*w]
  int template_abs_sum(int sp, const int64_t* abs_coeff, int base) const {
    int x = si->sx[sp], y = si->sy[sp];
    static const int DX[5] = {1, 2, 1, 0, 0};
    static const int DY[5] = {0, 0, 1, 1, 2};
    int64_t s = 0;
    for (int k = 0; k < 5; ++k) {
      int nx = x + DX[k], ny = y + DY[k];
      if (nx < w && ny < h) s += abs_coeff[ny * w + nx];
    }
    return int(std::max<int64_t>(std::min<int64_t>(s - 5 * base, 31), 0));
  }

  int sig_group_ctx(int cg, const uint8_t* sig_groups) const {
    int cg_pos = si->cg_pos[cg];
    int cgy = cg_pos / w_in_groups, cgx = cg_pos % w_in_groups;
    int right = (cgx + 1 < w_in_groups) ? sig_groups[cg_pos + 1] : 0;
    int lower = (cgy + 1 < h_in_groups) ? sig_groups[cg_pos + w_in_groups] : 0;
    return g_bases.sig_group[ch] + (right | lower);
  }

  int last_ctx_id(int ctx_last, bool is_x) const {
    int off = is_x ? last_off_x : last_off_y;
    int shift = is_x ? last_shift_x : last_shift_y;
    int base = is_x ? g_bases.last_x[ch] : g_bases.last_y[ch];
    return base + off + (ctx_last >> shift);
  }
};

inline int min4_parity(int64_t a) {
  return int(std::min<int64_t>(4 + (a & 1), a));
}

// ---------------------------------------------------------------------------
// binary arithmetic encoder (cabac.py CabacEncoder port, H.266 9.3.4.4)
// ---------------------------------------------------------------------------
const int RENORM_TABLE_32[32] = {6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2,
                                 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1,
                                 1, 1, 1, 1, 1, 1, 1, 1};

struct Engine {
  uint64_t low;
  int range, buffered_byte, num_buffered_bytes, bits_left;
  uint16_t* s0;
  uint16_t* s1;
  const uint8_t* r0;
  const uint8_t* r1;
  uint8_t* out;
  int n_out = 0;

  void write_out() {
    uint32_t lead_byte = uint32_t(low >> (24 - bits_left));
    bits_left += 8;
    low &= 0xFFFFFFFFull >> bits_left;
    if (lead_byte == 0xFF) {
      ++num_buffered_bytes;
    } else if (num_buffered_bytes > 0) {
      uint32_t carry = lead_byte >> 8;
      out[n_out++] = uint8_t((buffered_byte + carry) & 0xFF);
      buffered_byte = lead_byte & 0xFF;
      uint8_t fill = uint8_t((0xFF + carry) & 0xFF);
      while (num_buffered_bytes > 1) {
        out[n_out++] = fill;
        --num_buffered_bytes;
      }
    } else {
      num_buffered_bytes = 1;
      buffered_byte = lead_byte & 0xFF;
    }
  }

  void encode_bin(int binval, int ctx) {
    int st8 = state8(s0, s1, ctx);
    int q = st8;
    if (q & 0x80) q ^= 0xFF;
    int lps = (((q >> 2) * (range >> 5)) >> 1) + 4;
    range -= lps;
    if (binval != (st8 >> 7)) {
      int num_bits = RENORM_TABLE_32[lps >> 3];
      bits_left -= num_bits;
      low = (low + uint64_t(range)) << num_bits;
      range = lps << num_bits;
      if (bits_left < 12) write_out();
    } else if (range < 256) {
      --bits_left;
      low <<= 1;
      range <<= 1;
      if (bits_left < 12) write_out();
    }
    ctx_update(s0, s1, r0, r1, ctx, binval);
  }

  void encode_bin_ep(int binval) {
    low <<= 1;
    if (binval) low += uint64_t(range);
    --bits_left;
    if (bits_left < 12) write_out();
  }

  void encode_bins_ep(uint64_t bins, int num_bins) {
    if (range == 256) {  // aligned mode
      int rem = num_bins;
      while (rem > 0) {
        int take = std::min(rem, 8);
        uint64_t mask = (uint64_t(1) << take) - 1;
        uint64_t nb = (bins >> (rem - take)) & mask;
        low = (low << take) + (nb << 8);
        rem -= take;
        bits_left -= take;
        if (bits_left < 12) write_out();
      }
      return;
    }
    while (num_bins > 8) {
      num_bins -= 8;
      uint64_t pattern = bins >> num_bins;
      low = (low << 8) + uint64_t(range) * pattern;
      bins -= pattern << num_bins;
      bits_left -= 8;
      if (bits_left < 12) write_out();
    }
    low = (low << num_bins) + uint64_t(range) * bins;
    bits_left -= num_bins;
    if (bits_left < 12) write_out();
  }

  void encode_remabs_ep(int64_t value, int rice, int cutoff, int max_log2) {
    int64_t threshold = int64_t(cutoff) << rice;
    if (value < threshold) {
      int length = int(value >> rice) + 1;
      encode_bins_ep((uint64_t(1) << length) - 2, length);
      if (rice) encode_bins_ep(uint64_t(value) & ((1u << rice) - 1), rice);
    } else {
      int max_prefix_len = 32 - cutoff - max_log2;
      int prefix_len = 0, suffix_len;
      int64_t code_value = (value >> rice) - cutoff;
      if (code_value >= (int64_t(1) << max_prefix_len) - 1) {
        prefix_len = max_prefix_len;
        suffix_len = max_log2;
      } else {
        while (code_value > (int64_t(2) << prefix_len) - 2) ++prefix_len;
        suffix_len = prefix_len + rice + 1;
      }
      int total_prefix_len = prefix_len + cutoff;
      uint64_t prefix = (uint64_t(1) << total_prefix_len) - 1;
      uint64_t suffix =
          (uint64_t(code_value - ((int64_t(1) << prefix_len) - 1)) << rice) |
          (uint64_t(value) & ((uint64_t(1) << rice) - 1));
      encode_bins_ep(prefix, total_prefix_len);
      encode_bins_ep(suffix, suffix_len);
    }
  }
};

// EP-bin count of remabs binarization (cabac.py BitEstimator.encode_remabs_ep)
int remabs_ep_bins(int64_t value, int rice, int cutoff, int max_log2) {
  int64_t threshold = int64_t(cutoff) << rice;
  if (value < threshold) return int((value >> rice) + 1 + rice);
  int max_prefix_len = 32 - cutoff - max_log2;
  int prefix_len = 0, suffix_len;
  int64_t code_value = (value >> rice) - cutoff;
  if (code_value >= (int64_t(1) << max_prefix_len) - 1) {
    prefix_len = max_prefix_len;
    suffix_len = max_log2;
  } else {
    while (code_value > (int64_t(2) << prefix_len) - 2) ++prefix_len;
    suffix_len = prefix_len + rice + 1;
  }
  return cutoff + prefix_len + suffix_len;
}

}  // namespace

extern "C" {

// one-time install of context-set base offsets + the frac-bits table
void vte_init(const int32_t* bases, const uint32_t* frac_table) {
  int i = 0;
  for (int k = 0; k < 6; ++k) g_bases.sig[k] = bases[i++];
  for (int k = 0; k < 2; ++k) g_bases.par[k] = bases[i++];
  for (int k = 0; k < 4; ++k) g_bases.gtx[k] = bases[i++];
  for (int k = 0; k < 2; ++k) g_bases.last_x[k] = bases[i++];
  for (int k = 0; k < 2; ++k) g_bases.last_y[k] = bases[i++];
  for (int k = 0; k < 2; ++k) g_bases.sig_group[k] = bases[i++];
  std::memcpy(g_frac, frac_table, sizeof(g_frac));
  g_init = true;
}

// ---------------------------------------------------------------------------
// estimator-path residual coding (residual.py encode_residual on a
// BitEstimator): updates ctx state arrays in place, returns frac-bit delta
// ---------------------------------------------------------------------------
int64_t vte_est_residual(const int32_t* coeff, int w, int h, int is_luma,
                         int dep_quant, int sign_hiding, uint16_t* s0,
                         uint16_t* s1, const uint8_t* r0, const uint8_t* r1) {
  Cctx cctx(w, h, is_luma != 0);
  int64_t bits = 0;
  auto enc_bin = [&](int binval, int ctx) {
    bits += g_frac[state8(s0, s1, ctx)][binval];
    ctx_update(s0, s1, r0, r1, ctx, binval);
  };
  const int n = cctx.n_coded;
  const int par_base = g_bases.par[cctx.ch];
  const int gt1_base = g_bases.gtx[cctx.ch + 2];
  const int gt2_base = g_bases.gtx[cctx.ch];

  // last significant scan position
  int scan_pos_last = -1;
  for (int sp = n - 1; sp >= 0; --sp)
    if (coeff[cctx.si->blkpos[sp]]) { scan_pos_last = sp; break; }
  if (scan_pos_last < 0) return 0;  // caller guarantees nonzero

  int num_cgs = (scan_pos_last >> cctx.log2_cg) + 1;
  std::vector<uint8_t> cg_has(num_cgs, 0);
  for (int cg = 0; cg < num_cgs; ++cg) {
    int p0 = cg << cctx.log2_cg;
    int p1 = std::min(p0 + (1 << cctx.log2_cg), n);
    for (int sp = p0; sp < p1; ++sp)
      if (coeff[cctx.si->blkpos[sp]]) { cg_has[cg] = 1; break; }
  }

  // last position coding
  int blk_last = cctx.si->blkpos[scan_pos_last];
  int pos_y = blk_last / w, pos_x = blk_last % w;
  int gx = GROUP_IDX_TAB[pos_x], gy = GROUP_IDX_TAB[pos_y];
  for (int i = 0; i < gx; ++i) enc_bin(1, cctx.last_ctx_id(i, true));
  if (gx < cctx.max_last_x) enc_bin(0, cctx.last_ctx_id(gx, true));
  for (int i = 0; i < gy; ++i) enc_bin(1, cctx.last_ctx_id(i, false));
  if (gy < cctx.max_last_y) enc_bin(0, cctx.last_ctx_id(gy, false));
  if (gx > 3) bits += int64_t((gx - 2) >> 1) * EP_BIT;
  if (gy > 3) bits += int64_t((gy - 2) >> 1) * EP_BIT;

  // subblock coding
  int state = 0;
  int rem_reg_bins = (n * CTX_BIN_SAMPLE_RATIO) >> 4;
  std::vector<int32_t> coeff_cap(size_t(w) * h, 0);
  std::vector<int64_t> abs_coeff(size_t(w) * h);
  for (int i = 0; i < w * h; ++i)
    abs_coeff[i] = std::abs(int64_t(coeff[i]));
  std::vector<uint8_t> sig_groups(size_t(cctx.w_in_groups) *
                                  cctx.h_in_groups, 0);
  int last_cg = scan_pos_last >> cctx.log2_cg;
  for (int cg = last_cg; cg >= 0; --cg) {
    bool is_last_cg = cg == last_cg;
    bool is_not_first = cg != 0;
    int min_sub = cg << cctx.log2_cg;
    int max_sub = min_sub + (1 << cctx.log2_cg) - 1;
    if (!is_last_cg && is_not_first) {
      int ctx = cctx.sig_group_ctx(cg, sig_groups.data());
      if (cg_has[cg]) enc_bin(1, ctx);
      else { enc_bin(0, ctx); continue; }
    }
    if (cg_has[cg]) sig_groups[cctx.si->cg_pos[cg]] = 1;
    int first_sig = is_last_cg ? scan_pos_last : max_sub;
    int infer_sig_pos = (first_sig == scan_pos_last)
                            ? first_sig
                            : (is_not_first ? min_sub : -1);
    int num_nonzero = 0;
    int num_signs = 0;
    int first_sign_sp = -1, last_sign_sp = -1;  // SDH span tracking
    int next_pos = first_sig;
    for (; next_pos >= min_sub && rem_reg_bins >= 4; --next_pos) {
      int blk = cctx.si->blkpos[next_pos];
      int c = coeff[blk];
      int64_t a = std::abs(int64_t(c));
      int sig = c ? 1 : 0;
      if (num_nonzero || next_pos != infer_sig_pos) {
        int sig_ctx = cctx.sig_ctx_id(next_pos, coeff_cap.data(), state);
        enc_bin(sig, sig_ctx);
        --rem_reg_bins;
      } else if (next_pos != scan_pos_last) {
        cctx.sig_ctx_id(next_pos, coeff_cap.data(), state);
      }
      if (sig) {
        int ctx_off = cctx.ctx_offset_abs();
        ++num_nonzero;
        ++num_signs;
        if (first_sign_sp < 0) first_sign_sp = next_pos;
        last_sign_sp = next_pos;
        int64_t rem = a - 1;
        int gt1 = rem ? 1 : 0;
        enc_bin(gt1, gt1_base + ctx_off);
        --rem_reg_bins;
        if (gt1) {
          --rem;
          enc_bin(int(rem & 1), par_base + ctx_off);
          rem >>= 1;
          --rem_reg_bins;
          int gt2 = rem ? 1 : 0;
          enc_bin(gt2, gt2_base + ctx_off);
          --rem_reg_bins;
        }
        coeff_cap[blk] = min4_parity(a);
      }
      if (dep_quant) state = next_state(state, a);
    }
    int first_pos_mode2 = next_pos;
    // second pass: go-rice remainders for levels >= 4
    for (int sp = first_sig; sp > first_pos_mode2; --sp) {
      int blk = cctx.si->blkpos[sp];
      int64_t a = abs_coeff[blk];
      if (a >= 4) {
        int sum_all = cctx.template_abs_sum(sp, abs_coeff.data(), 4);
        int rice = GO_RICE_PARS[sum_all];
        bits += int64_t(remabs_ep_bins((a - 4) >> 1, rice,
                                       COEF_REMAIN_BIN_REDUCTION,
                                       MAX_LOG2_TR_DYNAMIC_RANGE)) * EP_BIT;
      }
    }
    // bypass pass
    for (int sp = first_pos_mode2; sp >= min_sub; --sp) {
      int blk = cctx.si->blkpos[sp];
      int c = coeff[blk];
      int64_t a = std::abs(int64_t(c));
      int sum_all = cctx.template_abs_sum(sp, abs_coeff.data(), 0);
      int rice = GO_RICE_PARS[sum_all];
      int64_t pos0 = int64_t(state < 2 ? 1 : 2) << rice;
      int64_t rem = (a == 0) ? pos0 : (a <= pos0 ? a - 1 : a);
      bits += int64_t(remabs_ep_bins(rem, rice, COEF_REMAIN_BIN_REDUCTION,
                                     MAX_LOG2_TR_DYNAMIC_RANGE)) * EP_BIT;
      if (dep_quant) state = next_state(state, a);
      if (a) {
        ++num_nonzero;
        ++num_signs;
        if (first_sign_sp < 0) first_sign_sp = sp;
        last_sign_sp = sp;
      }
    }
    // sign-data hiding: the lowest-scan-pos sign of a qualifying CG is
    // inferred from the abs-sum parity, so it costs no bits
    if (sign_hiding && num_signs &&
        first_sign_sp - last_sign_sp >= 4 /* SBH_THRESHOLD */)
      --num_signs;
    bits += int64_t(num_signs) * EP_BIT;
  }
  return bits;
}

// ---------------------------------------------------------------------------
// writer-path residual coding (residual.py encode_residual on a real
// CabacEncoder): encodes actual bins through the arithmetic engine,
// appending produced bytes to `out`.  engine_state io layout:
// [low, range, buffered_byte, num_buffered_bytes, bits_left]
// ---------------------------------------------------------------------------
int vte_write_residual(const int32_t* coeff, int w, int h, int is_luma,
                       int dep_quant, int sign_hiding, uint16_t* s0,
                       uint16_t* s1, const uint8_t* r0, const uint8_t* r1,
                       int64_t* engine_state, uint8_t* out) {
  Cctx cctx(w, h, is_luma != 0);
  Engine e;
  e.low = uint64_t(engine_state[0]);
  e.range = int(engine_state[1]);
  e.buffered_byte = int(engine_state[2]);
  e.num_buffered_bytes = int(engine_state[3]);
  e.bits_left = int(engine_state[4]);
  e.s0 = s0; e.s1 = s1; e.r0 = r0; e.r1 = r1;
  e.out = out;

  const int n = cctx.n_coded;
  const int par_base = g_bases.par[cctx.ch];
  const int gt1_base = g_bases.gtx[cctx.ch + 2];
  const int gt2_base = g_bases.gtx[cctx.ch];

  int scan_pos_last = -1;
  for (int sp = n - 1; sp >= 0; --sp)
    if (coeff[cctx.si->blkpos[sp]]) { scan_pos_last = sp; break; }
  if (scan_pos_last < 0) return 0;  // caller guarantees nonzero

  int num_cgs = (scan_pos_last >> cctx.log2_cg) + 1;
  std::vector<uint8_t> cg_has(num_cgs, 0);
  for (int cg = 0; cg < num_cgs; ++cg) {
    int p0 = cg << cctx.log2_cg;
    int p1 = std::min(p0 + (1 << cctx.log2_cg), n);
    for (int sp = p0; sp < p1; ++sp)
      if (coeff[cctx.si->blkpos[sp]]) { cg_has[cg] = 1; break; }
  }

  // last position coding
  int blk_last = cctx.si->blkpos[scan_pos_last];
  int pos_y = blk_last / w, pos_x = blk_last % w;
  int gx = GROUP_IDX_TAB[pos_x], gy = GROUP_IDX_TAB[pos_y];
  for (int i = 0; i < gx; ++i) e.encode_bin(1, cctx.last_ctx_id(i, true));
  if (gx < cctx.max_last_x) e.encode_bin(0, cctx.last_ctx_id(gx, true));
  for (int i = 0; i < gy; ++i) e.encode_bin(1, cctx.last_ctx_id(i, false));
  if (gy < cctx.max_last_y) e.encode_bin(0, cctx.last_ctx_id(gy, false));
  if (gx > 3) {
    int v = pos_x - MIN_IN_GROUP[gx];
    for (int i = ((gx - 2) >> 1) - 1; i >= 0; --i)
      e.encode_bin_ep((v >> i) & 1);
  }
  if (gy > 3) {
    int v = pos_y - MIN_IN_GROUP[gy];
    for (int i = ((gy - 2) >> 1) - 1; i >= 0; --i)
      e.encode_bin_ep((v >> i) & 1);
  }

  // subblock coding
  int state = 0;
  int rem_reg_bins = (n * CTX_BIN_SAMPLE_RATIO) >> 4;
  std::vector<int32_t> coeff_cap(size_t(w) * h, 0);
  std::vector<int64_t> abs_coeff(size_t(w) * h);
  for (int i = 0; i < w * h; ++i)
    abs_coeff[i] = std::abs(int64_t(coeff[i]));
  std::vector<uint8_t> sig_groups(size_t(cctx.w_in_groups) *
                                  cctx.h_in_groups, 0);
  int last_cg = scan_pos_last >> cctx.log2_cg;
  for (int cg = last_cg; cg >= 0; --cg) {
    bool is_last_cg = cg == last_cg;
    bool is_not_first = cg != 0;
    int min_sub = cg << cctx.log2_cg;
    int max_sub = min_sub + (1 << cctx.log2_cg) - 1;
    if (!is_last_cg && is_not_first) {
      int ctx = cctx.sig_group_ctx(cg, sig_groups.data());
      if (cg_has[cg]) e.encode_bin(1, ctx);
      else { e.encode_bin(0, ctx); continue; }
    }
    if (cg_has[cg]) sig_groups[cctx.si->cg_pos[cg]] = 1;
    int first_sig = is_last_cg ? scan_pos_last : max_sub;
    int infer_sig_pos = (first_sig == scan_pos_last)
                            ? first_sig
                            : (is_not_first ? min_sub : -1);
    int num_nonzero = 0;
    std::vector<int> sign_pattern, sign_pos;
    int next_pos = first_sig;
    for (; next_pos >= min_sub && rem_reg_bins >= 4; --next_pos) {
      int blk = cctx.si->blkpos[next_pos];
      int c = coeff[blk];
      int64_t a = std::abs(int64_t(c));
      int sig = c ? 1 : 0;
      if (num_nonzero || next_pos != infer_sig_pos) {
        int sig_ctx = cctx.sig_ctx_id(next_pos, coeff_cap.data(), state);
        e.encode_bin(sig, sig_ctx);
        --rem_reg_bins;
      } else if (next_pos != scan_pos_last) {
        cctx.sig_ctx_id(next_pos, coeff_cap.data(), state);
      }
      if (sig) {
        int ctx_off = cctx.ctx_offset_abs();
        ++num_nonzero;
        int64_t rem = a - 1;
        sign_pattern.push_back(c < 0 ? 1 : 0);
        sign_pos.push_back(next_pos);
        int gt1 = rem ? 1 : 0;
        e.encode_bin(gt1, gt1_base + ctx_off);
        --rem_reg_bins;
        if (gt1) {
          --rem;
          e.encode_bin(int(rem & 1), par_base + ctx_off);
          rem >>= 1;
          --rem_reg_bins;
          int gt2 = rem ? 1 : 0;
          e.encode_bin(gt2, gt2_base + ctx_off);
          --rem_reg_bins;
        }
        coeff_cap[blk] = min4_parity(a);
      }
      if (dep_quant) state = next_state(state, a);
    }
    int first_pos_mode2 = next_pos;
    // second pass: go-rice remainders for levels >= 4
    for (int sp = first_sig; sp > first_pos_mode2; --sp) {
      int blk = cctx.si->blkpos[sp];
      int64_t a = abs_coeff[blk];
      if (a >= 4) {
        int sum_all = cctx.template_abs_sum(sp, abs_coeff.data(), 4);
        int rice = GO_RICE_PARS[sum_all];
        e.encode_remabs_ep((a - 4) >> 1, rice, COEF_REMAIN_BIN_REDUCTION,
                           MAX_LOG2_TR_DYNAMIC_RANGE);
      }
    }
    // bypass pass
    for (int sp = first_pos_mode2; sp >= min_sub; --sp) {
      int blk = cctx.si->blkpos[sp];
      int c = coeff[blk];
      int64_t a = std::abs(int64_t(c));
      int sum_all = cctx.template_abs_sum(sp, abs_coeff.data(), 0);
      int rice = GO_RICE_PARS[sum_all];
      int64_t pos0 = int64_t(state < 2 ? 1 : 2) << rice;
      int64_t rem = (a == 0) ? pos0 : (a <= pos0 ? a - 1 : a);
      e.encode_remabs_ep(rem, rice, COEF_REMAIN_BIN_REDUCTION,
                         MAX_LOG2_TR_DYNAMIC_RANGE);
      if (dep_quant) state = next_state(state, a);
      if (a) {
        ++num_nonzero;
        sign_pattern.push_back(c < 0 ? 1 : 0);
        sign_pos.push_back(sp);
      }
    }
    // signs (SDH: lowest-scan-pos sign inferred from abs-sum parity)
    int n_signs = int(sign_pattern.size());
    if (sign_hiding && n_signs &&
        sign_pos.front() - sign_pos.back() >= 4 /* SBH_THRESHOLD */)
      --n_signs;
    uint64_t bits = 0;
    for (int i = 0; i < n_signs; ++i)
      bits = (bits << 1) | uint64_t(sign_pattern[i]);
    e.encode_bins_ep(bits, n_signs);
  }

  engine_state[0] = int64_t(e.low);
  engine_state[1] = e.range;
  engine_state[2] = e.buffered_byte;
  engine_state[3] = e.num_buffered_bytes;
  engine_state[4] = e.bits_left;
  return e.n_out;
}

// ---------------------------------------------------------------------------
// RDOQ (ops/rdoq.py rdoq_np port) — ctx arrays are read-only here
// ---------------------------------------------------------------------------
static inline int64_t golomb_bins(int64_t symbol, int rice) {
  int threshold = COEF_REMAIN_BIN_REDUCTION;
  if (symbol < (int64_t(threshold) << rice)) return (symbol >> rice) + 1 + rice;
  int length = rice;
  symbol -= int64_t(threshold) << rice;
  while (symbol >= (int64_t(1) << length)) {
    symbol -= int64_t(1) << length;
    ++length;
  }
  return threshold + length + 1 - rice + length;
}

struct FB2 { int64_t b0, b1; };

static inline int64_t ic_rate(int64_t level, FB2 par, FB2 gt1, FB2 gt2,
                              int rem_reg_bins, int64_t go_rice_zero,
                              int rice) {
  if (rem_reg_bins < 4) {
    int64_t symbol = (level == 0) ? go_rice_zero
                     : (level <= go_rice_zero ? level - 1 : level);
    return EP_BIT + golomb_bins(symbol, rice) * EP_BIT;
  }
  if (level == 0) return 0;
  int64_t rate = EP_BIT;  // sign
  if (level >= 4) {
    rate += golomb_bins((level - 4) >> 1, rice) * EP_BIT;
    rate += gt1.b1 + (((level - 2) & 1) ? par.b1 : par.b0) + gt2.b1;
  } else if (level == 1) {
    rate += gt1.b0;
  } else if (level == 2) {
    rate += gt1.b1 + par.b0 + gt2.b0;
  } else {
    rate += gt1.b1 + par.b1 + gt2.b0;
  }
  return rate;
}

void vte_rdoq(const int32_t* coeff, int w, int h, int qp, int bit_depth,
              int is_luma, double lmbda, int cbf_ctx_id /* -1 = none */,
              const uint16_t* s0, const uint16_t* s1, int32_t* out) {
  Cctx cctx(w, h, is_luma != 0);
  const int n = cctx.n_coded;
  const int par_base = g_bases.par[cctx.ch];
  const int gt1_base = g_bases.gtx[cctx.ch + 2];
  const int gt2_base = g_bases.gtx[cctx.ch];
  auto fb = [&](int ctx, int binval) -> int64_t {
    return g_frac[state8(s0, s1, ctx)][binval];
  };

  int lw = cctx.log2w, lh = cctx.log2h;
  bool sqrt2 = (((63 - __builtin_clzll(uint64_t(w) * h)) & 1) == 1);
  int tshift = MAX_LOG2_TR_DYNAMIC_RANGE - bit_depth - ((lw + lh) >> 1);
  int qbits = 14 + qp / 6 + tshift + (sqrt2 ? -1 : 0);
  int64_t scale = QUANT_SCALES[sqrt2 ? 1 : 0][qp % 6];
  double tshift_eff = tshift - (sqrt2 ? 0.5 : 0.0);
  double err_scale = std::pow(2.0, -2.0 * tshift_eff) /
                     double(scale * scale);
  double lam = lmbda / double(EP_BIT);

  std::memset(out, 0, sizeof(int32_t) * size_t(w) * h);

  std::vector<int64_t> level_double(n), max_abs(n);
  std::vector<double> cost_uncoded(n);
  double block_uncoded_cost = 0.0;
  int last_scan_pos = -1;
  for (int sp = 0; sp < n; ++sp) {
    int64_t ld = std::abs(int64_t(coeff[cctx.si->blkpos[sp]])) * scale;
    level_double[sp] = ld;
    int64_t ma = std::min((ld + (int64_t(1) << (qbits - 1))) >> qbits,
                          MAX_LEVEL);
    max_abs[sp] = ma;
    double cu = double(ld) * double(ld) * err_scale;
    cost_uncoded[sp] = cu;
    block_uncoded_cost += cu;
    if (ma) last_scan_pos = sp;
  }
  if (last_scan_pos < 0) return;

  int cg_size = 1 << cctx.log2_cg;
  int cg_m1 = cg_size - 1;
  int n_cg = n >> cctx.log2_cg;
  int cg_last = last_scan_pos >> cctx.log2_cg;

  std::vector<int64_t> dst_abs(size_t(w) * h, 0);
  std::vector<int32_t> dst_cap(size_t(w) * h, 0);
  std::vector<double> cost_coeff(n, 0.0), cost_sig(n, 0.0);
  std::vector<double> cost_cg_sig(std::max(n_cg, 1), 0.0);
  std::vector<uint8_t> sig_groups(size_t(cctx.w_in_groups) *
                                  cctx.h_in_groups, 0);

  double base_cost = 0.0;
  for (int sp = (cg_last + 1) * cg_size; sp < n; ++sp) {
    base_cost += cost_uncoded[sp];
    cost_coeff[sp] = cost_uncoded[sp];
  }

  int rem_reg_bins = (n * CTX_BIN_SAMPLE_RATIO) >> 4;
  int go_rice = 0;

  for (int cg = cg_last; cg >= 0; --cg) {
    int rem_reg_bins_cg = rem_reg_bins;
    int min_sub = cg << cctx.log2_cg;
    bool cg_sig = false;
    double st_sig_cost = 0.0, st_sig_cost_0 = 0.0;
    double st_coded_dist = 0.0, st_uncoded_dist = 0.0;
    int st_nnz_before_pos0 = 0;
    for (int pos_in_cg = cg_m1; pos_in_cg >= 0; --pos_in_cg) {
      int sp = min_sub + pos_in_cg;
      int blk = cctx.si->blkpos[sp];
      if (sp > last_scan_pos) {
        base_cost += cost_uncoded[sp];
        cost_coeff[sp] = cost_uncoded[sp];
        continue;
      }
      bool is_last = sp == last_scan_pos;
      FB2 fb_sig{0, 0};
      if (!is_last) {
        int sig_ctx = cctx.sig_ctx_id(sp, dst_cap.data(), 0);
        fb_sig = {fb(sig_ctx, 0), fb(sig_ctx, 1)};
      }
      int ctx_off = cctx.ctx_offset_abs();
      FB2 fb_par{fb(par_base + ctx_off, 0), fb(par_base + ctx_off, 1)};
      FB2 fb_gt1{fb(gt1_base + ctx_off, 0), fb(gt1_base + ctx_off, 1)};
      FB2 fb_gt2{fb(gt2_base + ctx_off, 0), fb(gt2_base + ctx_off, 1)};
      int64_t go_rice_zero = 0;
      if (rem_reg_bins < 4) {
        int sum_abs = cctx.template_abs_sum(sp, dst_abs.data(), 0);
        go_rice = GO_RICE_PARS[sum_abs];
        go_rice_zero = int64_t(1) << go_rice;
      }
      // ---- _coded_level inline ----
      int64_t ld = level_double[sp];
      int64_t ma = max_abs[sp];
      double cost0 = double(ld) * double(ld) * err_scale;
      double best_sig = 0.0, best_cost;
      int64_t best_level = 0;
      bool early0 = false;
      if (!is_last && ma < 3) {
        best_sig = lam * double(fb_sig.b0);
        best_cost = cost0 + best_sig;
        if (ma == 0) early0 = true;
      } else {
        best_cost = 1e300;
      }
      if (!early0) {
        double sig1 = is_last ? 0.0 : lam * double(fb_sig.b1);
        int64_t lo = ma > 1 ? ma - 1 : 1;
        for (int64_t level = ma; level >= lo; --level) {
          double err = double(ld - (level << qbits));
          double cost = err * err * err_scale +
                        lam * double(ic_rate(level, fb_par, fb_gt1, fb_gt2,
                                             rem_reg_bins, go_rice_zero,
                                             go_rice)) +
                        sig1;
          if (cost < best_cost) {
            best_cost = cost;
            best_level = level;
            best_sig = sig1;
          }
        }
      }
      int64_t level = best_level;
      double c_coeff = best_cost, c_sig = best_sig;
      // ---- end _coded_level ----
      cost_coeff[sp] = c_coeff;
      cost_sig[sp] = c_sig;
      dst_abs[blk] = level;
      dst_cap[blk] = min4_parity(level);
      base_cost += c_coeff;
      if ((sp & cg_m1) == 0 && sp > 0) {
        go_rice = 0;
      } else if (rem_reg_bins >= 4) {
        int sum_all = cctx.template_abs_sum(sp, dst_abs.data(), 4);
        go_rice = GO_RICE_PARS[sum_all];
        rem_reg_bins -= int(level < 2 ? level : 3) + (is_last ? 0 : 1);
      }
      st_sig_cost += c_sig;
      if (pos_in_cg == 0) st_sig_cost_0 = c_sig;
      if (level) {
        cg_sig = true;
        st_coded_dist += c_coeff - c_sig;
        st_uncoded_dist += cost_uncoded[sp];
        if (pos_in_cg != 0) ++st_nnz_before_pos0;
      }
    }
    if (cg == 0) {
      sig_groups[cctx.si->cg_pos[0]] = 1;
      continue;
    }
    if (!cg_sig) {
      int gctx = cctx.sig_group_ctx(cg, sig_groups.data());
      double r0v = lam * double(fb(gctx, 0));
      base_cost += r0v - st_sig_cost;
      cost_cg_sig[cg] = r0v;
      continue;
    }
    sig_groups[cctx.si->cg_pos[cg]] = 1;
    if (cg >= cg_last) continue;
    if (st_nnz_before_pos0 == 0) {
      base_cost -= st_sig_cost_0;
      st_sig_cost -= st_sig_cost_0;
    }
    int gctx = cctx.sig_group_ctx(cg, sig_groups.data());
    double cost_zero_cg = base_cost + lam * double(fb(gctx, 0));
    base_cost += lam * double(fb(gctx, 1));
    cost_cg_sig[cg] = lam * double(fb(gctx, 1));
    cost_zero_cg += st_uncoded_dist - st_coded_dist - st_sig_cost;
    if (cost_zero_cg < base_cost) {
      sig_groups[cctx.si->cg_pos[cg]] = 0;
      base_cost = cost_zero_cg;
      rem_reg_bins = rem_reg_bins_cg;
      cost_cg_sig[cg] = lam * double(fb(gctx, 0));
      for (int pos_in_cg = cg_m1; pos_in_cg >= 0; --pos_in_cg) {
        int sp = min_sub + pos_in_cg;
        int blk = cctx.si->blkpos[sp];
        if (dst_abs[blk]) {
          dst_abs[blk] = 0;
          dst_cap[blk] = 0;
          cost_coeff[sp] = cost_uncoded[sp];
          cost_sig[sp] = 0.0;
        }
      }
    }
  }

  // last-position sweep
  double best_cost;
  if (cbf_ctx_id >= 0) {
    best_cost = block_uncoded_cost + lam * double(fb(cbf_ctx_id, 0));
    base_cost += lam * double(fb(cbf_ctx_id, 1));
  } else {
    best_cost = block_uncoded_cost;
  }
  int best_last_p1 = 0;
  int dimx = std::min(32, w), dimy = std::min(32, h);
  std::vector<int64_t> last_bits_x(GROUP_IDX_TAB[dimx - 1] + 1, 0);
  std::vector<int64_t> last_bits_y(GROUP_IDX_TAB[dimy - 1] + 1, 0);
  {
    int64_t bits = 0;
    for (int ci = 0; ci < GROUP_IDX_TAB[dimx - 1]; ++ci) {
      int cid = cctx.last_ctx_id(ci, true);
      last_bits_x[ci] = bits + fb(cid, 0);
      bits += fb(cid, 1);
    }
    last_bits_x[GROUP_IDX_TAB[dimx - 1]] = bits;
    bits = 0;
    for (int ci = 0; ci < GROUP_IDX_TAB[dimy - 1]; ++ci) {
      int cid = cctx.last_ctx_id(ci, false);
      last_bits_y[ci] = bits + fb(cid, 0);
      bits += fb(cid, 1);
    }
    last_bits_y[GROUP_IDX_TAB[dimy - 1]] = bits;
  }

  bool found_last = false;
  for (int cg = cg_last; cg >= 0 && !found_last; --cg) {
    base_cost -= cost_cg_sig[cg];
    if (!sig_groups[cctx.si->cg_pos[cg]]) continue;
    for (int pos_in_cg = cg_m1; pos_in_cg >= 0; --pos_in_cg) {
      int sp = (cg << cctx.log2_cg) + pos_in_cg;
      if (sp > last_scan_pos) continue;
      int blk = cctx.si->blkpos[sp];
      int yy = blk / w, xx = blk % w;
      if (dst_abs[blk]) {
        int gx = GROUP_IDX_TAB[xx], gy = GROUP_IDX_TAB[yy];
        double cost_last = lam * double(last_bits_x[gx] + last_bits_y[gy]);
        if (gx > 3) cost_last += lam * double(EP_BIT) * ((gx - 2) >> 1);
        if (gy > 3) cost_last += lam * double(EP_BIT) * ((gy - 2) >> 1);
        double total = base_cost + cost_last - cost_sig[sp];
        if (total < best_cost) {
          best_last_p1 = sp + 1;
          best_cost = total;
        }
        if (dst_abs[blk] > 1) {
          found_last = true;
          break;
        }
        base_cost += cost_uncoded[sp] - cost_coeff[sp];
      } else {
        base_cost -= cost_sig[sp];
      }
    }
  }

  for (int sp = 0; sp < best_last_p1; ++sp) {
    int blk = cctx.si->blkpos[sp];
    int64_t lv = dst_abs[blk];
    if (lv) {
      int64_t v = coeff[blk] < 0 ? -lv : lv;
      out[blk] = int32_t(std::max<int64_t>(COEFF_MIN,
                                           std::min<int64_t>(COEFF_MAX, v)));
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused transform/quant/recon RD trial (encoder inner-loop hot path).
//
// One native call replaces the Python sequence
//   fwd_transform_np -> rdoq_np -> [sdh_adjust] -> dequant_np ->
//   inv_transform_np -> clip(pred + r) -> sse_np
// (ops/transforms.py, ops/rdoq.py); each stage is a bit-exact port of the
// corresponding Python golden model.  Behavioral reference: vvenc
// TrQuant::transformNxN + Quant + xIT + RdCost (TrQuant.cpp:551, Quant.cpp,
// RdCost.cpp) — there the same fusion exists implicitly because all stages
// are C++ SIMD kernels called from one loop.
// ---------------------------------------------------------------------------

extern "C" {

// transform matrices, registered from Python ROM (ops/transforms.py
// tr_matrix) so the table stays single-sourced: [tr_type][log2n]
static std::vector<int32_t> g_trmat[3][7];

void vte_set_trmat(int tr_type, int n, const int32_t* m) {
  int l = 31 - __builtin_clz(unsigned(n));
  g_trmat[tr_type][l].assign(m, m + size_t(n) * n);
}

}  // extern "C"

static inline int32_t clip_coeff(int64_t v) {
  return int32_t(std::max<int64_t>(COEFF_MIN,
                                   std::min<int64_t>(COEFF_MAX, v)));
}

// fwd_transform_np port (2-D case; callers guarantee w, h >= 4).
// int32 accumulation is exact: |resi| < 2^bit_depth and |T| <= 91, so
// stage-1 sums stay < 2^23; stage-1 outputs clip to +-2^15, so stage-2
// sums stay < 2^29 — and the contiguous int32 inner loops vectorize.
// Columns >= zw are never read by stage 2 (they are zeroed in the
// output), so stage 1 skips them.
static void tq_fwd(const int32_t* resi, int w, int h, int trh, int trv,
                   int bit_depth, int32_t* out) {
  int lw = 31 - __builtin_clz(unsigned(w));
  int lh = 31 - __builtin_clz(unsigned(h));
  const int32_t* Tw = g_trmat[trh][lw].data();
  const int32_t* Th = g_trmat[trv][lh].data();
  int shift1 = lw + bit_depth + 6 - MAX_LOG2_TR_DYNAMIC_RANGE;
  int shift2 = lh + 6;
  int32_t rnd1 = int32_t(1) << (shift1 - 1);
  int32_t rnd2 = int32_t(1) << (shift2 - 1);
  int zw = (trh != 0 && w == 32) ? 16 : 32;
  int zh = (trv != 0 && h == 32) ? 16 : 32;
  int kw = std::min(w, zw), kh = std::min(h, zh);
  std::vector<int32_t> tmp(size_t(h) * kw);
  for (int i = 0; i < h; ++i) {
    const int32_t* rrow = resi + size_t(i) * w;
    int32_t* orow = tmp.data() + size_t(i) * kw;
    for (int k = 0; k < kw; ++k) {
      const int32_t* trow = Tw + size_t(k) * w;
      int32_t acc = 0;
      for (int j = 0; j < w; ++j) acc += rrow[j] * trow[j];
      orow[k] = clip_coeff((acc + rnd1) >> shift1);
    }
  }
  for (int r = 0; r < h; ++r) {
    int32_t* orow = out + size_t(r) * w;
    if (r >= kh) {
      std::memset(orow, 0, sizeof(int32_t) * w);
      continue;
    }
    const int32_t* trow = Th + size_t(r) * h;
    int32_t acc[32] = {};
    for (int i = 0; i < h; ++i) {
      int32_t c = trow[i];
      if (!c) continue;
      const int32_t* ti = tmp.data() + size_t(i) * kw;
      for (int k = 0; k < kw; ++k) acc[k] += c * ti[k];
    }
    for (int k = 0; k < kw; ++k)
      orow[k] = clip_coeff((acc[k] + rnd2) >> shift2);
    if (kw < w) std::memset(orow + kw, 0, sizeof(int32_t) * (w - kw));
  }
}

// dequant_np + inv_transform_np + clip(pred + r) + SSE (one pass)
static void tq_inv_rec(const int32_t* qc, const int32_t* pred,
                       const int32_t* src, int w, int h, int trh, int trv,
                       int qp, int bit_depth, int32_t* rec, int64_t* dist) {
  static const int64_t INV_QUANT_SCALES[2][6] = {
      {40, 45, 51, 57, 64, 72}, {57, 64, 72, 80, 90, 102}};
  int lw = 31 - __builtin_clz(unsigned(w));
  int lh = 31 - __builtin_clz(unsigned(h));
  bool sqrt2 = ((lw + lh) & 1) == 1;
  int tshift = MAX_LOG2_TR_DYNAMIC_RANGE - bit_depth - ((lw + lh) >> 1) +
               (sqrt2 ? -1 : 0);
  int right_shift = 6 - (tshift + qp / 6);
  int64_t scale = INV_QUANT_SCALES[sqrt2 ? 1 : 0][qp % 6];
  std::vector<int32_t> d(size_t(h) * w);
  for (size_t i = 0; i < size_t(h) * w; ++i) {
    int64_t q = std::max<int64_t>(-(1 << 15),
                                  std::min<int64_t>((1 << 15) - 1, qc[i]));
    int64_t v;
    if (right_shift > 0)
      v = (q * scale + (int64_t(1) << (right_shift - 1))) >> right_shift;
    else
      v = (q * scale) << (-right_shift);
    d[i] = clip_coeff(v);
  }
  const int32_t* Tw = g_trmat[trh][lw].data();
  const int32_t* Th = g_trmat[trv][lh].data();
  int shift2 = 20 - bit_depth;
  int32_t rnd2 = int32_t(1) << (shift2 - 1);
  // int32 accumulation is exact (|d|, |tmp| <= 2^15, |T| <= 91, <= 64
  // terms: sums < 2^29); row-major accumulation vectorizes, and all-zero
  // input rows / zero multipliers are skipped (value-preserving).
  std::vector<int32_t> tmp(size_t(h) * w);
  for (int i = 0; i < h; ++i) {
    int32_t acc[64] = {};
    for (int r = 0; r < h; ++r) {
      int32_t c = Th[size_t(r) * h + i];
      if (!c) continue;
      const int32_t* drow = d.data() + size_t(r) * w;
      for (int j = 0; j < w; ++j) acc[j] += c * drow[j];
    }
    int32_t* trow = tmp.data() + size_t(i) * w;
    for (int j = 0; j < w; ++j)
      trow[j] = clip_coeff((acc[j] + 64) >> 7);
  }
  int32_t maxpix = (1 << bit_depth) - 1;
  int64_t sse = 0;
  for (int i = 0; i < h; ++i) {
    int32_t* rrow = rec + size_t(i) * w;
    const int32_t* prow = pred + size_t(i) * w;
    const int32_t* srow = src + size_t(i) * w;
    const int32_t* trow = tmp.data() + size_t(i) * w;
    int32_t acc[64] = {};
    for (int k = 0; k < w; ++k) {
      int32_t c = trow[k];
      if (!c) continue;
      const int32_t* twrow = Tw + size_t(k) * w;
      for (int j = 0; j < w; ++j) acc[j] += c * twrow[j];
    }
    for (int j = 0; j < w; ++j) {
      int32_t r = clip_coeff((acc[j] + rnd2) >> shift2);
      int32_t px = prow[j] + r;
      px = px < 0 ? 0 : (px > maxpix ? maxpix : px);
      rrow[j] = px;
      int64_t e = int64_t(srow[j]) - px;
      sse += e * e;
    }
  }
  *dist = sse;
}

// sdh_adjust port (ops/transforms.py): sign-data-hiding parity fixup
static void tq_sdh(int32_t* qflat, const int32_t* tflat, int w, int h,
                   int qp, int bit_depth, int is_luma) {
  Cctx cctx(w, h, is_luma != 0);
  int n = cctx.n_coded;
  int cg_size = 1 << cctx.log2_cg;
  int lw = cctx.log2w, lh = cctx.log2h;
  bool sqrt2 = ((lw + lh) & 1) == 1;
  int tshift = MAX_LOG2_TR_DYNAMIC_RANGE - bit_depth - ((lw + lh) >> 1) +
               (sqrt2 ? -1 : 0);
  int qbits = 14 + qp / 6 + tshift;
  int64_t scale = QUANT_SCALES[sqrt2 ? 1 : 0][qp % 6];
  for (int cg0 = 0; cg0 < n; cg0 += cg_size) {
    int first_nz = -1, last_nz = -1;
    int64_t abs_sum = 0;
    for (int sp = cg0; sp < cg0 + cg_size; ++sp) {
      int32_t q = qflat[cctx.si->blkpos[sp]];
      if (q) {
        if (first_nz < 0) first_nz = sp;
        last_nz = sp;
        abs_sum += std::abs(int64_t(q));
      }
    }
    if (first_nz < 0 || last_nz - first_nz < 4 /* SBH_THRESHOLD */)
      continue;
    int parity = int(abs_sum & 1);
    int want = qflat[cctx.si->blkpos[first_nz]] < 0 ? 1 : 0;
    if (parity == want) continue;
    bool have_best = false;
    int64_t best_inc = 0;
    int best_blk = 0;
    int32_t best_nq = 0;
    for (int sp = cg0; sp < cg0 + cg_size; ++sp) {
      int blk = cctx.si->blkpos[sp];
      int32_t q = qflat[blk];
      int64_t ld = std::abs(int64_t(tflat[blk])) * scale;
      for (int pass = 0; pass < 2; ++pass) {
        int dq = pass == 0 ? +1 : -1;
        int32_t nq;
        if (q == 0) {
          if (dq < 0 || !(first_nz < sp && sp < last_nz)) continue;
          nq = tflat[blk] >= 0 ? 1 : -1;
        } else if (dq < 0) {
          if (std::abs(q) == 1 && (sp == first_nz || sp == last_nz))
            continue;
          nq = q > 0 ? q - 1 : q + 1;
        } else {
          nq = q > 0 ? q + 1 : q - 1;
        }
        int64_t err0 = std::abs(ld - (std::abs(int64_t(q)) << qbits));
        int64_t err1 = std::abs(ld - (std::abs(int64_t(nq)) << qbits));
        int64_t inc = err1 - err0;
        if (!have_best || inc < best_inc) {
          have_best = true;
          best_inc = inc;
          best_blk = blk;
          best_nq = nq;
        }
      }
    }
    if (have_best)
      qflat[best_blk] = int32_t(std::max<int64_t>(
          COEFF_MIN, std::min<int64_t>(COEFF_MAX, best_nq)));
  }
}

extern "C" {

// returns cbf (1 if any nonzero level).  out_rec/out_dist always filled
// (rec = pred when cbf == 0).  ctx state arrays are read-only (RDOQ rate
// lookups), matching the Python _q() contract.
int vte_depquant(const int32_t* coeff, int w, int h, int qp, int bit_depth,
                 int is_luma, double lmbda, int cbf_ctx_id, int thr_val,
                 const uint16_t* s0, const uint16_t* s1, int32_t* out);
void vte_dequant_dq(const int32_t* qc, int w, int h, int qp, int bit_depth,
                    int is_luma, int32_t* out);
void vte_inv_transform(const int32_t* d, int w, int h, int trh, int trv,
                       int bit_depth, int32_t* out);

double g_tq_seconds = 0;  // quant-path profiling (VTE_PROF_TQ)
struct TqScope {
  std::chrono::steady_clock::time_point t0;
  TqScope() : t0(std::chrono::steady_clock::now()) {}
  ~TqScope() {
    g_tq_seconds += std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
  }
};
void vte_tq_prof_get(double* out) { *out = g_tq_seconds; }

int vte_tq_trial(const int32_t* resi, const int32_t* pred,
                 const int32_t* src, int w, int h, int trh, int trv,
                 int qp, int bit_depth, int is_luma, double lmbda,
                 int cbf_ctx_id, int sdh, const uint16_t* s0,
                 const uint16_t* s1, int32_t* out_coeff, int32_t* out_rec,
                 int64_t* out_dist, int dq) {
  TqScope _tq;
  std::vector<int32_t> tc(size_t(h) * w);
  tq_fwd(resi, w, h, trh, trv, bit_depth, tc.data());
  int cbf = 0;
  if (dq) {
    cbf = vte_depquant(tc.data(), w, h, qp, bit_depth, is_luma, lmbda,
                       cbf_ctx_id, 8, s0, s1, out_coeff);
  } else {
    vte_rdoq(tc.data(), w, h, qp, bit_depth, is_luma, lmbda, cbf_ctx_id,
             s0, s1, out_coeff);
    for (size_t i = 0; i < size_t(h) * w; ++i)
      if (out_coeff[i]) { cbf = 1; break; }
    if (cbf && sdh) {
      tq_sdh(out_coeff, tc.data(), w, h, qp, bit_depth, is_luma);
      cbf = 0;
      for (size_t i = 0; i < size_t(h) * w; ++i)
        if (out_coeff[i]) { cbf = 1; break; }
    }
  }
  if (cbf && dq) {
    // dequant-dq -> inverse -> recon + SSE
    std::vector<int32_t> d(size_t(h) * w), r(size_t(h) * w);
    vte_dequant_dq(out_coeff, w, h, qp, bit_depth, is_luma, d.data());
    vte_inv_transform(d.data(), w, h, trh, trv, bit_depth, r.data());
    int maxval = (1 << bit_depth) - 1;
    int64_t sse = 0;
    for (size_t i = 0; i < size_t(h) * w; ++i) {
      int64_t v = int64_t(pred[i]) + r[i];
      v = v < 0 ? 0 : (v > maxval ? maxval : v);
      out_rec[i] = int32_t(v);
      int64_t e = int64_t(src[i]) - v;
      sse += e * e;
    }
    *out_dist = sse;
  } else if (cbf) {
    tq_inv_rec(out_coeff, pred, src, w, h, trh, trv, qp, bit_depth,
               out_rec, out_dist);
  } else {
    int64_t sse = 0;
    for (size_t i = 0; i < size_t(h) * w; ++i) {
      out_rec[i] = pred[i];
      int64_t e = int64_t(src[i]) - pred[i];
      sse += e * e;
    }
    *out_dist = sse;
  }
  return cbf;
}

}  // extern "C"

extern "C" {

// fwd transform + RDOQ (+SDH) only — for call sites that reconstruct
// elsewhere (inter residuals, ISP partitions).  Returns cbf.
int vte_depquant(const int32_t* coeff, int w, int h, int qp, int bit_depth,
                 int is_luma, double lmbda, int cbf_ctx_id, int thr_val,
                 const uint16_t* s0, const uint16_t* s1, int32_t* out);

int vte_tq_quant(const int32_t* resi, int w, int h, int trh, int trv,
                 int qp, int bit_depth, int is_luma, double lmbda,
                 int cbf_ctx_id, int sdh, const uint16_t* s0,
                 const uint16_t* s1, int32_t* out_coeff, int dq) {
  TqScope _tq;
  std::vector<int32_t> tc(size_t(h) * w);
  tq_fwd(resi, w, h, trh, trv, bit_depth, tc.data());
  if (dq)
    return vte_depquant(tc.data(), w, h, qp, bit_depth, is_luma, lmbda,
                        cbf_ctx_id, 8, s0, s1, out_coeff);
  vte_rdoq(tc.data(), w, h, qp, bit_depth, is_luma, lmbda, cbf_ctx_id,
           s0, s1, out_coeff);
  int cbf = 0;
  for (size_t i = 0; i < size_t(h) * w; ++i)
    if (out_coeff[i]) { cbf = 1; break; }
  if (cbf && sdh) {
    tq_sdh(out_coeff, tc.data(), w, h, qp, bit_depth, is_luma);
    cbf = 0;
    for (size_t i = 0; i < size_t(h) * w; ++i)
      if (out_coeff[i]) { cbf = 1; break; }
  }
  return cbf;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Intra prediction (ops/intra.py port — H.266 8.4.5.2; behavioral
// reference vvenc IntraPrediction.cpp xPredIntraPlanar_Core:79,
// xGetPredValDc:302, initPredIntraParams:409, xPredIntraAng:518,
// xFilterReferenceSamples:994, PDPC :137-189).  Bit-exact vs the Python
// golden model (tests/test_native.py fuzz + the 67 decoder-conformance
// streams once the shared decode model dispatches here).
// ---------------------------------------------------------------------------

namespace intra {

constexpr int PLANAR_IDX = 0, DC_IDX = 1, HOR_IDX = 18, DIA_IDX = 34,
              VER_IDX = 50, VDIA_IDX = 66, NUM_LUMA_MODE = 67;

static const int32_t ANG_TABLE[32] = {
    0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32, 35,
    39, 45, 51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512, 1024};
static const int32_t INV_ANG_TABLE[32] = {
    0, 16384, 8192, 5461, 4096, 2731, 2048, 1638, 1365, 1170, 1024, 910,
    819, 712, 630, 565, 512, 468, 420, 364, 321, 287, 256, 224, 191, 161,
    128, 96, 64, 48, 32, 16};
static const int MDIS_THRESH[8] = {24, 24, 24, 14, 2, 0, 0, 0};
static const int32_t CHROMA_FILTER[33][4] = {
    {0, 64, 0, 0},   {-1, 63, 2, 0},  {-2, 62, 4, 0},  {-2, 60, 7, -1},
    {-2, 58, 10, -2}, {-3, 57, 12, -2}, {-4, 56, 14, -2}, {-4, 55, 15, -2},
    {-4, 54, 16, -2}, {-5, 53, 18, -2}, {-6, 52, 20, -2}, {-6, 49, 24, -3},
    {-6, 46, 28, -4}, {-5, 44, 29, -4}, {-4, 42, 30, -4}, {-4, 39, 33, -4},
    {-4, 36, 36, -4}, {-4, 33, 39, -4}, {-4, 30, 42, -4}, {-4, 29, 44, -5},
    {-4, 28, 46, -6}, {-3, 24, 49, -6}, {-2, 20, 52, -6}, {-2, 18, 53, -5},
    {-2, 16, 54, -4}, {-2, 15, 55, -4}, {-2, 14, 56, -4}, {-2, 12, 57, -3},
    {-2, 10, 58, -2}, {-1, 7, 60, -2}, {0, 4, 62, -2},  {0, 2, 63, -1},
    {0, 0, 64, 0}};

static inline int log2i(int n) { return 31 - __builtin_clz(unsigned(n)); }

static int wide_angle_map(int w, int h, int mode) {
  if (mode > DC_IDX && mode <= VDIA_IDX) {
    static const int mode_shift[6] = {0, 6, 10, 12, 14, 15};
    int delta = std::abs(log2i(w) - log2i(h));
    if (w > h && mode < 2 + mode_shift[delta])
      mode += VDIA_IDX - 1;
    else if (h > w && mode > VDIA_IDX - mode_shift[delta])
      mode -= VDIA_IDX - 1;
  }
  return mode;
}

struct Params {
  bool is_ver, ref_filter, interp, apply_pdpc;
  int angle, abs_inv_angle, angular_scale, pred_mode;
};

static Params params(int w, int h, int mode, bool is_luma, int ref_idx,
                     int cuw, int cuh, bool isp) {
  Params p{};
  int ww = cuw > 0 ? cuw : w, wh = cuh > 0 ? cuh : h;
  p.pred_mode = wide_angle_map(ww, wh, mode);
  p.is_ver = p.pred_mode >= DIA_IDX;
  p.ref_filter = false;
  p.interp = false;
  p.apply_pdpc = w >= 4 && h >= 4 && ref_idx == 0;
  p.angle = 0;
  p.abs_inv_angle = 0;
  p.angular_scale = 0;
  int angle_mode = p.is_ver ? (p.pred_mode - VER_IDX)
                            : -(p.pred_mode - HOR_IDX);
  int abs_ang = 0;
  if (mode > DC_IDX && mode < NUM_LUMA_MODE) {
    abs_ang = ANG_TABLE[std::abs(angle_mode)];
    p.abs_inv_angle = INV_ANG_TABLE[std::abs(angle_mode)];
    p.angle = angle_mode >= 0 ? abs_ang : -abs_ang;
    if (angle_mode < 0) {
      p.apply_pdpc = false;
    } else if (angle_mode > 0) {
      int side = p.is_ver ? h : w;
      p.angular_scale = std::min(
          2, log2i(side) - (log2i(3 * p.abs_inv_angle - 2) - 8));
      p.apply_pdpc = p.apply_pdpc && p.angular_scale >= 0;
    }
  }
  if (!is_luma || mode == DC_IDX || ref_idx != 0 || isp) {
    // no smoothing / interp switch
  } else if (mode == PLANAR_IDX) {
    p.ref_filter = w * h > 32;
  } else {
    int diff = std::min(std::abs(p.pred_mode - HOR_IDX),
                        std::abs(p.pred_mode - VER_IDX));
    int log2_size = (log2i(w) + log2i(h)) >> 1;
    if (diff > MDIS_THRESH[log2_size]) {
      if ((abs_ang & 31) == 0)
        p.ref_filter = true;
      else
        p.interp = true;
    }
  }
  return p;
}

// [1 2 1]/4 smoothing; last sample of each side stays unfiltered
static void filter_ref(const int32_t* top, int tl, const int32_t* left,
                       int ll, int32_t* ft, int32_t* fl) {
  int corner = (top[0] + top[1] + left[0] + left[1] + 2) >> 2;
  int n = tl - 3;
  ft[0] = corner;
  for (int i = 1; i < n; ++i)
    ft[i] = (top[i - 1] + 2 * top[i] + top[i + 1] + 2) >> 2;
  for (int i = n; i < tl; ++i) ft[i] = top[n];
  int m = ll - 3;
  fl[0] = corner;
  for (int i = 1; i < m; ++i)
    fl[i] = (left[i - 1] + 2 * left[i] + left[i + 1] + 2) >> 2;
  for (int i = m; i < ll; ++i) fl[i] = left[m];
}

static void pred_planar(const int32_t* top, const int32_t* left, int w,
                        int h, int32_t* out) {
  int log2w = log2i(w), log2h = log2i(h);
  int bl = left[1 + h], tr = top[1 + w];
  int64_t offset = int64_t(1) << (log2w + log2h);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int64_t hor = (int64_t(left[1 + y]) << log2w) +
                    int64_t(x + 1) * (tr - left[1 + y]);
      int64_t ver = (int64_t(top[1 + x]) << log2h) +
                    int64_t(y + 1) * (bl - top[1 + x]);
      out[y * w + x] =
          int32_t(((hor << log2h) + (ver << log2w) + offset) >>
                  (1 + log2w + log2h));
    }
}

static void pred_dc(const int32_t* top, const int32_t* left, int w, int h,
                    int ref_idx, int32_t* out) {
  int denom = (w == h) ? (w << 1) : std::max(w, h);
  int shift = log2i(denom);
  int off = ref_idx + 1;
  int64_t s = 0;
  if (w >= h)
    for (int i = 0; i < w; ++i) s += top[off + i];
  if (w <= h)
    for (int i = 0; i < h; ++i) s += left[off + i];
  int32_t dc = int32_t((s + (denom >> 1)) >> shift);
  for (int i = 0; i < w * h; ++i) out[i] = dc;
}

static void pdpc_planar_dc(int32_t* pred, const int32_t* top,
                           const int32_t* left, int w, int h) {
  int scale = (log2i(w * h) - 2) >> 2;
  for (int y = 0; y < h; ++y) {
    int wt = 32 >> std::min(31, (y << 1) >> scale);
    for (int x = 0; x < w; ++x) {
      int wl = 32 >> std::min(31, (x << 1) >> scale);
      int32_t p = pred[y * w + x];
      pred[y * w + x] =
          p + ((wl * (left[1 + y] - p) + wt * (top[1 + x] - p) + 32) >> 6);
    }
  }
}

// main prediction entry; out [h*w]
static void predict(const int32_t* top_in, int top_len,
                    const int32_t* left_in, int left_len, int mode, int w,
                    int h, int bit_depth, bool is_luma, int ref_idx,
                    int cuw, int cuh, bool isp, int override_pdpc,
                    int32_t* out) {
  int maxval = (1 << bit_depth) - 1;
  Params p = params(w, h, mode, is_luma, ref_idx, cuw, cuh, isp);
  if (override_pdpc >= 0) p.apply_pdpc = override_pdpc != 0;
  std::vector<int32_t> ftop, fleft;
  const int32_t* top = top_in;
  const int32_t* left = left_in;
  if (p.ref_filter) {
    ftop.resize(top_len);
    fleft.resize(left_len);
    filter_ref(top_in, top_len, left_in, left_len, ftop.data(),
               fleft.data());
    top = ftop.data();
    left = fleft.data();
  }
  if (mode == PLANAR_IDX || mode == DC_IDX) {
    if (mode == PLANAR_IDX)
      pred_planar(top, left, w, h, out);
    else
      pred_dc(top, left, w, h, ref_idx, out);
    if (p.apply_pdpc) pdpc_planar_dc(out, top, left, w, h);
    for (int i = 0; i < w * h; ++i)
      out[i] = std::min(std::max(out[i], 0), maxval);
    return;
  }
  // angular: work in vertical orientation, transpose for horizontal
  int m = ref_idx;
  int tw = p.is_ver ? w : h, th = p.is_ver ? h : w;
  const int32_t* main_src = p.is_ver ? top : left;
  int main_src_len = p.is_ver ? top_len : left_len;
  const int32_t* side_src = p.is_ver ? left : top;
  int side_src_len = p.is_ver ? left_len : top_len;
  int isp_main_len = -1;
  if (isp && cuw > 0)
    isp_main_len = p.is_ver ? (cuw + w) : (cuh + h);

  std::vector<int32_t> ref_main_v;
  int base;
  if (p.angle < 0) {
    int side = p.is_ver ? h : w;
    int main_len = (p.is_ver ? w : h) + 2 + m;
    ref_main_v.assign(size_t(side) + main_len + 4, 0);
    int base_pre = side;
    for (int i = 0; i < main_len && i < main_src_len; ++i)
      ref_main_v[base_pre + i] = main_src[i];
    for (int k = -side; k < 0; ++k) {
      int idx = std::min((-k * p.abs_inv_angle + 256) >> 9, side);
      if (idx >= side_src_len) idx = side_src_len - 1;
      ref_main_v[base_pre + k] = side_src[idx];
    }
    base = base_pre + m;
  } else {
    int ref_len = isp_main_len > 0 ? isp_main_len
                                   : 2 * (p.is_ver ? w : h);
    int log2_ratio = log2i(w) - log2i(h);
    int s = std::max(0, p.is_ver ? log2_ratio : -log2_ratio);
    int max_index = (m << s) + 2;
    int rows = th;
    int need = m + ((rows * std::max(p.angle, 0)) >> 5) +
               (p.is_ver ? w : h) + 8;
    int alloc = std::max(ref_len + m + max_index + 8, need);
    ref_main_v.assign(size_t(alloc), 0);
    int n = std::min(main_src_len, ref_len + m + 1);
    for (int i = 0; i < n; ++i) ref_main_v[i] = main_src[i];
    for (int i = n; i < alloc; ++i) ref_main_v[i] = main_src[n - 1];
    base = m;
  }
  const int32_t* ref_main = ref_main_v.data();
  // ref_side[k] == side_src[m + k]
  std::vector<int32_t> pred(size_t(th) * tw);
  if (p.angle == 0) {
    for (int y = 0; y < th; ++y)
      for (int x = 0; x < tw; ++x)
        pred[y * tw + x] = ref_main[base + 1 + x];
    if (p.apply_pdpc) {
      int scale = (log2i(tw * th) - 2) >> 2;
      int top_left = ref_main[base];
      for (int y = 0; y < th; ++y) {
        int sidx = m + 1 + y;
        int lval = side_src[std::min(sidx, side_src_len - 1)];
        int xmax = std::min(3 << scale, tw);
        for (int x = 0; x < xmax; ++x) {
          int wl = 32 >> ((2 * x) >> scale);
          int v = pred[y * tw + x] + ((wl * (lval - top_left) + 32) >> 6);
          pred[y * tw + x] = std::min(std::max(v, 0), maxval);
        }
      }
    }
  } else {
    bool integer_slope = (std::abs(p.angle) & 31) == 0;
    int64_t delta_pos = int64_t(p.angle) * (1 + m);
    for (int y = 0; y < th; ++y) {
      int delta_int = int(delta_pos >> 5);
      int frac = int(delta_pos & 31);
      int32_t* row = pred.data() + size_t(y) * tw;
      if (integer_slope) {
        for (int x = 0; x < tw; ++x)
          row[x] = ref_main[base + delta_int + 1 + x];
      } else if (is_luma) {
        int32_t f[4];
        if (!p.interp) {
          f[0] = CHROMA_FILTER[frac][0];
          f[1] = CHROMA_FILTER[frac][1];
          f[2] = CHROMA_FILTER[frac][2];
          f[3] = CHROMA_FILTER[frac][3];
        } else {
          f[0] = 16 - (frac >> 1);
          f[1] = 32 - (frac >> 1);
          f[2] = 16 + (frac >> 1);
          f[3] = frac >> 1;
        }
        for (int x = 0; x < tw; ++x) {
          int i0 = base + delta_int + x;
          int v = (f[0] * ref_main[i0] + f[1] * ref_main[i0 + 1] +
                   f[2] * ref_main[i0 + 2] + f[3] * ref_main[i0 + 3] + 32)
                  >> 6;
          if (!p.interp) v = std::min(std::max(v, 0), maxval);
          row[x] = v;
        }
      } else {
        for (int x = 0; x < tw; ++x) {
          int i0 = base + delta_int + 1 + x;
          row[x] = ((32 - frac) * ref_main[i0] + frac * ref_main[i0 + 1] +
                    16) >> 5;
        }
      }
      delta_pos += p.angle;
    }
    if (p.apply_pdpc) {
      int scale = p.angular_scale;
      for (int y = 0; y < th; ++y) {
        int inv_sum = 256;
        int xmax = std::min(3 << scale, tw);
        for (int x = 0; x < xmax; ++x) {
          inv_sum += p.abs_inv_angle;
          int wl = 32 >> ((2 * x) >> scale);
          int sidx = m + y + (inv_sum >> 9) + 1;
          int lval = side_src[std::min(sidx, side_src_len - 1)];
          int32_t pv = pred[y * tw + x];
          pred[y * tw + x] = pv + ((wl * (lval - pv) + 32) >> 6);
        }
      }
    }
  }
  if (p.is_ver) {
    for (int i = 0; i < th * tw; ++i)
      out[i] = std::min(std::max(pred[i], 0), maxval);
  } else {
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        int32_t v = pred[size_t(x) * tw + y];
        out[y * w + x] = std::min(std::max(v, 0), maxval);
      }
  }
}

}  // namespace intra

extern "C" {

void vte_predict_intra(const int32_t* top, int top_len, const int32_t* left,
                       int left_len, int mode, int w, int h, int bit_depth,
                       int is_luma, int ref_idx, int cuw, int cuh, int isp,
                       int override_pdpc, int32_t* out) {
  intra::predict(top, top_len, left, left_len, mode, w, h, bit_depth,
                 is_luma != 0, ref_idx, cuw, cuh, isp != 0, override_pdpc,
                 out);
}

// batch entry: n modes over the SAME references -> out [n, h, w]
void vte_predict_modes(const int32_t* top, int top_len, const int32_t* left,
                       int left_len, const int32_t* modes, int n, int w,
                       int h, int bit_depth, int is_luma, int ref_idx,
                       int override_pdpc, int32_t* out) {
  for (int i = 0; i < n; ++i)
    intra::predict(top, top_len, left, left_len, modes[i], w, h, bit_depth,
                   is_luma != 0, ref_idx, -1, -1, false, override_pdpc,
                   out + size_t(i) * w * h);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// SATD + fused intra preselection + reference-sample builder
// (ops/rdcost.py satd / ops/intra_vec.py satd_modes /
//  ops/intra.py build_reference_samples ports; vvenc RdCostX86.h xGetHADs
//  and IntraPrediction xFillReferenceSamples:755 analogs)
// ---------------------------------------------------------------------------

namespace satd {

// vvenc-convention Hadamard SATD of one ts x ts tile of differences.
// Fast Walsh-Hadamard butterflies: the integer +- sums are exactly the
// direct H @ d @ H products (a butterfly stage ordering only permutes
// the output coefficients, and sum(|m|) is permutation-invariant; the
// 4x4 DC term is the plain tile sum, computed directly).
static inline void hbfly8(int32_t v[8]) {
  int32_t a0 = v[0] + v[4], a1 = v[1] + v[5], a2 = v[2] + v[6],
          a3 = v[3] + v[7];
  int32_t a4 = v[0] - v[4], a5 = v[1] - v[5], a6 = v[2] - v[6],
          a7 = v[3] - v[7];
  int32_t b0 = a0 + a2, b1 = a1 + a3, b2 = a0 - a2, b3 = a1 - a3;
  int32_t b4 = a4 + a6, b5 = a5 + a7, b6 = a4 - a6, b7 = a5 - a7;
  v[0] = b0 + b1;
  v[1] = b0 - b1;
  v[2] = b2 + b3;
  v[3] = b2 - b3;
  v[4] = b4 + b5;
  v[5] = b4 - b5;
  v[6] = b6 + b7;
  v[7] = b6 - b7;
}
static inline void hbfly4(int32_t v[4]) {
  int32_t a0 = v[0] + v[2], a1 = v[1] + v[3];
  int32_t a2 = v[0] - v[2], a3 = v[1] - v[3];
  v[0] = a0 + a1;
  v[1] = a0 - a1;
  v[2] = a2 + a3;
  v[3] = a2 - a3;
}
static int64_t tile8(const int32_t* s, const int32_t* p, int stride) {
  int32_t m[8][8];
  for (int i = 0; i < 8; ++i) {
    const int32_t* sr = s + size_t(i) * stride;
    const int32_t* pr = p + size_t(i) * stride;
    for (int j = 0; j < 8; ++j) m[i][j] = sr[j] - pr[j];
    hbfly8(m[i]);
  }
  for (int j = 0; j < 8; ++j) {
    int32_t c[8];
    for (int i = 0; i < 8; ++i) c[i] = m[i][j];
    hbfly8(c);
    for (int i = 0; i < 8; ++i) m[i][j] = c[i];
  }
  int64_t sum = 0;
  for (int i = 0; i < 8; ++i)
    for (int j = 0; j < 8; ++j) sum += std::abs(m[i][j]);
  return (sum + 2) >> 2;
}
static int64_t tile4(const int32_t* s, const int32_t* p, int stride) {
  int32_t m[4][4];
  int32_t dc = 0;
  for (int i = 0; i < 4; ++i) {
    const int32_t* sr = s + size_t(i) * stride;
    const int32_t* pr = p + size_t(i) * stride;
    for (int j = 0; j < 4; ++j) {
      m[i][j] = sr[j] - pr[j];
      dc += m[i][j];
    }
    hbfly4(m[i]);
  }
  for (int j = 0; j < 4; ++j) {
    int32_t c[4] = {m[0][j], m[1][j], m[2][j], m[3][j]};
    hbfly4(c);
    m[0][j] = c[0];
    m[1][j] = c[1];
    m[2][j] = c[2];
    m[3][j] = c[3];
  }
  int64_t sum = 0;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) sum += std::abs(m[i][j]);
  int64_t adc = std::abs(int64_t(dc));
  return ((sum - adc + (adc >> 2)) + 1) >> 1;
}

static int64_t block(const int32_t* src, const int32_t* pred, int w,
                     int h) {
  int ts = (h % 8 == 0 && w % 8 == 0) ? 8 : 4;
  int64_t s = 0;
  if (ts == 8) {
    for (int by = 0; by < h; by += 8)
      for (int bx = 0; bx < w; bx += 8)
        s += tile8(src + size_t(by) * w + bx, pred + size_t(by) * w + bx,
                   w);
  } else {
    for (int by = 0; by < h; by += 4)
      for (int bx = 0; bx < w; bx += 4)
        s += tile4(src + size_t(by) * w + bx, pred + size_t(by) * w + bx,
                   w);
  }
  return s;
}

}  // namespace satd

extern "C" {

// SATD of src vs M stacked predictions -> out[M]
void vte_satd_modes(const int32_t* src, const int32_t* preds, int n, int w,
                    int h, int64_t* out) {
  for (int i = 0; i < n; ++i)
    out[i] = satd::block(src, preds + size_t(i) * w * h, w, h);
}

// fused preselection: predict each mode over the shared references and
// return its SATD vs src, never materializing predictions to Python
void vte_presel_satd(const int32_t* top, int top_len, const int32_t* left,
                     int left_len, const int32_t* src, const int32_t* modes,
                     int n, int w, int h, int bit_depth, int is_luma,
                     int ref_idx, int64_t* out) {
  std::vector<int32_t> pred(size_t(h) * w);
  for (int i = 0; i < n; ++i) {
    intra::predict(top, top_len, left, left_len, modes[i], w, h, bit_depth,
                   is_luma != 0, ref_idx, -1, -1, false, -1, pred.data());
    out[i] = satd::block(src, pred.data(), w, h);
  }
}

// reference-sample builder (coded-mask availability path of
// ops/intra.py build_reference_samples; vvenc xFillReferenceSamples:755)
void vte_build_refs(const int32_t* rec, int ph, int pw, int x, int y,
                    int w, int h, const uint8_t* coded, int cuh, int cuw,
                    int unit, int bit_depth, int ref_idx, int pred_size_in,
                    int pred_hsize_in, int32_t* top, int32_t* left) {
  int m = ref_idx;
  int pred_size = (pred_size_in > 0 ? pred_size_in : 2 * w) + m;
  int pred_hsize = (pred_hsize_in > 0 ? pred_hsize_in : 2 * h) + m;
  int32_t dc_val = 1 << (bit_depth - 1);
  int x0 = x - 1 - m, y0 = y - 1 - m;
  int tl = pred_size + 3, ll = pred_hsize + 3;
  for (int i = 0; i < tl; ++i) top[i] = dc_val;
  for (int i = 0; i < ll; ++i) left[i] = dc_val;
  std::vector<uint8_t> ft(pred_size + 1, 0), fl(pred_hsize + 1, 0);
  bool any = false;
  if (y0 >= 0) {
    for (int j = 0; j <= pred_size; ++j) {
      int jx = x0 + j;
      if (jx < 0 || jx >= pw) continue;
      if (coded[(y0 / unit) * cuw + jx / unit]) {
        top[j] = rec[size_t(y0) * pw + jx];
        ft[j] = 1;
        any = true;
      }
    }
  }
  if (x0 >= 0) {
    for (int i = 0; i <= pred_hsize; ++i) {
      int iy = y0 + i;
      if (iy < 0 || iy >= ph) continue;
      if (coded[(iy / unit) * cuw + x0 / unit]) {
        left[i] = rec[size_t(iy) * pw + x0];
        fl[i] = 1;
        any = true;
      }
    }
  }
  if (any) {
    // substitution scan: bottom-left upwards, corner, then along the top
    int total = pred_hsize + 1 + pred_size;
    std::vector<int32_t> vals(total);
    std::vector<uint8_t> filled(total);
    for (int i = 0; i < pred_hsize; ++i) {
      vals[i] = left[pred_hsize - i];
      filled[i] = fl[pred_hsize - i];
    }
    vals[pred_hsize] = left[0];
    filled[pred_hsize] = fl[0];
    for (int j = 0; j < pred_size; ++j) {
      vals[pred_hsize + 1 + j] = top[1 + j];
      filled[pred_hsize + 1 + j] = ft[1 + j];
    }
    int first = 0;
    while (first < total && !filled[first]) ++first;
    int32_t cur = vals[first];
    for (int i = 0; i < total; ++i) {
      if (filled[i])
        cur = vals[i];
      else
        vals[i] = cur;
      if (i < first) vals[i] = vals[first];
    }
    // NB: positions before `first` take vals[first]; handled above since
    // cur starts at vals[first]
    for (int i = 0; i < pred_hsize; ++i) left[pred_hsize - i] = vals[i];
    left[0] = vals[pred_hsize];
    top[0] = vals[pred_hsize];
    for (int j = 0; j < pred_size; ++j) top[1 + j] = vals[pred_hsize + 1 + j];
  }
  for (int i = pred_size + 1; i < tl; ++i) top[i] = top[pred_size];
  for (int i = pred_hsize + 1; i < ll; ++i) left[i] = left[pred_hsize];
}

}  // extern "C"

extern "C" {

// standalone transform/quant stage entries (ops/transforms.py ports) so
// the shared decode model's reconstruction paths (ctu_syntax
// reconstruct_cu and friends) run native without restructuring call
// sites.  2-D blocks only; the 1-D ISP cases stay on the Python model.

void vte_fwd_transform(const int32_t* resi, int w, int h, int trh, int trv,
                       int bit_depth, int32_t* out) {
  tq_fwd(resi, w, h, trh, trv, bit_depth, out);
}

void vte_dequant(const int32_t* qc, int w, int h, int qp, int bit_depth,
                 int32_t* out) {
  static const int64_t INV_QUANT_SCALES[2][6] = {
      {40, 45, 51, 57, 64, 72}, {57, 64, 72, 80, 90, 102}};
  int lw = 31 - __builtin_clz(unsigned(w));
  int lh = 31 - __builtin_clz(unsigned(h));
  bool sqrt2 = ((lw + lh) & 1) == 1;
  int tshift = MAX_LOG2_TR_DYNAMIC_RANGE - bit_depth - ((lw + lh) >> 1) +
               (sqrt2 ? -1 : 0);
  int right_shift = 6 - (tshift + qp / 6);
  int64_t scale = INV_QUANT_SCALES[sqrt2 ? 1 : 0][qp % 6];
  for (size_t i = 0; i < size_t(h) * w; ++i) {
    int64_t q = std::max<int64_t>(-(1 << 15),
                                  std::min<int64_t>((1 << 15) - 1, qc[i]));
    int64_t v;
    if (right_shift > 0)
      v = (q * scale + (int64_t(1) << (right_shift - 1))) >> right_shift;
    else
      v = (q * scale) << (-right_shift);
    out[i] = clip_coeff(v);
  }
}

void vte_inv_transform(const int32_t* d, int w, int h, int trh, int trv,
                       int bit_depth, int32_t* out) {
  const int32_t* Tw = g_trmat[trh][31 - __builtin_clz(unsigned(w))].data();
  const int32_t* Th = g_trmat[trv][31 - __builtin_clz(unsigned(h))].data();
  int shift2 = 20 - bit_depth;
  int32_t rnd2 = int32_t(1) << (shift2 - 1);
  // same int32/row-major scheme as tq_inv_rec (sums < 2^29, exact)
  std::vector<int32_t> tmp(size_t(h) * w);
  for (int i = 0; i < h; ++i) {
    int32_t acc[64] = {};
    for (int r = 0; r < h; ++r) {
      int32_t c = Th[size_t(r) * h + i];
      if (!c) continue;
      const int32_t* drow = d + size_t(r) * w;
      for (int j = 0; j < w; ++j) acc[j] += c * drow[j];
    }
    int32_t* trow = tmp.data() + size_t(i) * w;
    for (int j = 0; j < w; ++j)
      trow[j] = clip_coeff((acc[j] + 64) >> 7);
  }
  for (int i = 0; i < h; ++i) {
    const int32_t* trow = tmp.data() + size_t(i) * w;
    int32_t* orow = out + size_t(i) * w;
    int32_t acc[64] = {};
    for (int k = 0; k < w; ++k) {
      int32_t c = trow[k];
      if (!c) continue;
      const int32_t* twrow = Tw + size_t(k) * w;
      for (int j = 0; j < w; ++j) acc[j] += c * twrow[j];
    }
    for (int j = 0; j < w; ++j)
      orow[j] = clip_coeff((acc[j] + rnd2) >> shift2);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CCLM (codec/cclm.py port — H.266 8.4.5.2.13/14; vvenc
// IntraPrediction::loadLMLumaRecPels:1165, xGetLMParameters:1408,
// predIntraChromaLM:385).  Shared availability walk + downsamples across
// all (mode, component) pairs, mirroring cclm_predict_many.
// ---------------------------------------------------------------------------

namespace cclm {

constexpr int LM = 81, MDLM_L = 82, MDLM_T = 83;
static const int DIV_SIG[16] = {0, 7, 6, 5, 5, 4, 4, 3,
                                3, 2, 2, 1, 1, 1, 1, 0};

static int count_avail(const uint8_t* coded, int uw, int uh, int ux,
                       int uy, int n, int dx, int dy) {
  int cnt = 0;
  for (int k = 0; k < n; ++k) {
    int x = ux + k * dx, y = uy + k * dy;
    if (x < 0 || y < 0 || x >= uw || y >= uh || !coded[y * uw + x]) break;
    ++cnt;
  }
  return cnt;
}

}  // namespace cclm

extern "C" {

// preds layout: [n_modes][2][ch*cw] (component order Cb, Cr)
void vte_cclm_predict(const int32_t* luma, const int32_t* cb,
                      const int32_t* cr, int ph, int pw, int cph, int cpw,
                      const uint8_t* coded, int uh, int uw, int cux,
                      int cuy, int cuw, int cuh, int ctu_size,
                      int bit_depth, const int32_t* modes, int n_modes,
                      int32_t* preds) {
  using namespace cclm;
  // geo[] below is a fixed stack array; clamp against oversized mode
  // lists from the wrapper (call sites pass at most 3 CCLM modes)
  if (n_modes > 8) n_modes = 8;
  int cx = cux >> 1, cy = cuy >> 1;
  int cw = cuw >> 1, ch = cuh >> 1;
  int x0 = cux, y0 = cuy;
  int above_units = cw >> 1, left_units = ch >> 1;
  bool above_avail =
      cy > 0 && count_avail(coded, uw, uh, cx >> 1, (cy - 1) >> 1,
                            above_units, 1, 0) == above_units;
  bool left_avail =
      cx > 0 && count_avail(coded, uw, uh, (cx - 1) >> 1, cy >> 1,
                            left_units, 0, 1) == left_units;
  int ar_units = 0, bl_units = 0;
  if (above_avail)
    ar_units = count_avail(coded, uw, uh, (cx + cw) >> 1, (cy - 1) >> 1,
                           above_units, 1, 0);
  if (left_avail)
    bl_units = count_avail(coded, uw, uh, (cx - 1) >> 1, (cy + ch) >> 1,
                           left_units, 0, 1);
  bool first_ctu_row = (y0 & (ctu_size - 1)) == 0;

  // 6-tap interior downsample -> ds[ch][cw]
  std::vector<int32_t> ds(size_t(ch) * cw);
  for (int i = 0; i < ch; ++i) {
    int yy = y0 + 2 * i;
    for (int j = 0; j < cw; ++j) {
      int xx = x0 + 2 * j;
      int xm1 = (j == 0 && !left_avail) ? xx : xx - 1;
      int s = 4 + 2 * luma[size_t(yy) * pw + xx] +
              luma[size_t(yy) * pw + xx + 1] + luma[size_t(yy) * pw + xm1] +
              2 * luma[size_t(yy + 1) * pw + xx] +
              luma[size_t(yy + 1) * pw + xx + 1] +
              luma[size_t(yy + 1) * pw + xm1];
      ds[size_t(i) * cw + j] = s >> 3;
    }
  }
  // per-mode geometry + shared boundary downsamples at max lengths
  int top_max = 0, left_max = 0;
  struct Geo { bool ua, ul; int tn, ln; } geo[8];
  for (int mi = 0; mi < n_modes; ++mi) {
    int mode = modes[mi];
    bool ua = above_avail, ul = left_avail;
    int tn = 0, ln = 0;
    if (mode == MDLM_T) {
      ul = false;
      tn = above_avail
               ? 2 * ((cw >> 1) + std::min(ar_units, ch >> 1)) : 0;
    } else if (mode == MDLM_L) {
      ua = false;
      ln = left_avail
               ? 2 * ((ch >> 1) + std::min(bl_units, cw >> 1)) : 0;
    } else {
      tn = above_avail ? cw : 0;
      ln = left_avail ? ch : 0;
    }
    geo[mi] = {ua, ul, tn, ln};
    if (ua) top_max = std::max(top_max, tn);
    if (ul) left_max = std::max(left_max, ln);
  }
  std::vector<int32_t> ds_above(std::max(top_max, 1));
  std::vector<int32_t> ds_left(std::max(left_max, 1));
  for (int j = 0; j < top_max; ++j) {
    int xx = x0 + 2 * j;
    int xm1 = (j == 0 && !left_avail) ? xx : xx - 1;
    if (first_ctu_row) {
      int ly = y0 - 1;
      int s = 2 + 2 * luma[size_t(ly) * pw + xx] +
              luma[size_t(ly) * pw + xm1] + luma[size_t(ly) * pw + xx + 1];
      ds_above[j] = s >> 2;
    } else {
      int ly = y0 - 2;
      int s = 4 + 2 * luma[size_t(ly) * pw + xx] +
              luma[size_t(ly) * pw + xx + 1] + luma[size_t(ly) * pw + xm1] +
              2 * luma[size_t(ly + 1) * pw + xx] +
              luma[size_t(ly + 1) * pw + xx + 1] +
              luma[size_t(ly + 1) * pw + xm1];
      ds_above[j] = s >> 3;
    }
  }
  for (int i = 0; i < left_max; ++i) {
    int yy = y0 + 2 * i;
    int lx = x0 - 2;
    int s = 4 + 2 * luma[size_t(yy) * pw + lx] +
            luma[size_t(yy) * pw + lx + 1] + luma[size_t(yy) * pw + lx - 1] +
            2 * luma[size_t(yy + 1) * pw + lx] +
            luma[size_t(yy + 1) * pw + lx + 1] +
            luma[size_t(yy + 1) * pw + lx - 1];
    ds_left[i] = s >> 3;
  }

  int maxval = (1 << bit_depth) - 1;
  for (int mi = 0; mi < n_modes; ++mi) {
    bool ua = geo[mi].ua, ul = geo[mi].ul;
    int tn = geo[mi].tn, ln = geo[mi].ln;
    int above_is4 = ul ? 0 : 1;
    int left_is4 = ua ? 0 : 1;
    int pos_t[4], pos_l[4];
    int cnt_t = 0, cnt_l = 0;
    if (ua) {
      cnt_t = std::min(tn, (1 + above_is4) << 1);
      int start = tn >> (2 + above_is4);
      int step = std::max(1, tn >> (1 + above_is4));
      for (int k = 0; k < cnt_t; ++k) pos_t[k] = start + k * step;
    }
    if (ul) {
      cnt_l = std::min(ln, (1 + left_is4) << 1);
      int start = ln >> (2 + left_is4);
      int step = std::max(1, ln >> (1 + left_is4));
      for (int k = 0; k < cnt_l; ++k) pos_l[k] = start + k * step;
    }
    for (int comp = 0; comp < 2; ++comp) {
      const int32_t* chroma = comp == 0 ? cb : cr;
      int64_t sel_l[4] = {0, 0, 0, 0}, sel_c[4] = {0, 0, 0, 0};
      for (int k = 0; k < cnt_t; ++k) {
        sel_l[k] = ds_above[pos_t[k]];
        sel_c[k] = chroma[size_t(cy - 1) * cpw + cx + pos_t[k]];
      }
      for (int k = 0; k < cnt_l; ++k) {
        sel_l[cnt_t + k] = ds_left[pos_l[k]];
        sel_c[cnt_t + k] = chroma[size_t(cy + pos_l[k]) * cpw + cx - 1];
      }
      int cnt = cnt_t + cnt_l;
      if (cnt == 2) {
        sel_l[3] = sel_l[0]; sel_c[3] = sel_c[0];
        sel_l[2] = sel_l[1]; sel_c[2] = sel_c[1];
        sel_l[0] = sel_l[1]; sel_c[0] = sel_c[1];
        sel_l[1] = sel_l[3]; sel_c[1] = sel_c[3];
      }
      int64_t a = 0, b = 1 << (bit_depth - 1);
      int shift = 0;
      if (ua || ul) {
        int mn[2] = {0, 2}, mx[2] = {1, 3};
        if (sel_l[mn[0]] > sel_l[mn[1]]) std::swap(mn[0], mn[1]);
        if (sel_l[mx[0]] > sel_l[mx[1]]) std::swap(mx[0], mx[1]);
        if (sel_l[mn[0]] > sel_l[mx[1]]) {
          std::swap(mn[0], mx[0]);
          std::swap(mn[1], mx[1]);
        }
        if (sel_l[mn[1]] > sel_l[mx[0]]) std::swap(mn[1], mx[0]);
        int64_t min_l = (sel_l[mn[0]] + sel_l[mn[1]] + 1) >> 1;
        int64_t min_c = (sel_c[mn[0]] + sel_c[mn[1]] + 1) >> 1;
        int64_t max_l = (sel_l[mx[0]] + sel_l[mx[1]] + 1) >> 1;
        int64_t max_c = (sel_c[mx[0]] + sel_c[mx[1]] + 1) >> 1;
        int64_t diff = max_l - min_l;
        if (diff > 0) {
          int64_t diff_c = max_c - min_c;
          int x = 63 - __builtin_clzll(uint64_t(diff));
          int norm_diff = int(((diff << 4) >> x) & 15);
          int64_t v = DIV_SIG[norm_diff] | 8;
          x += int(norm_diff != 0);
          int y = 0;
          if (diff_c != 0) {
            uint64_t ad = uint64_t(diff_c < 0 ? -diff_c : diff_c);
            y = 64 - __builtin_clzll(ad);
          }
          int64_t add = (int64_t(1) << y) >> 1;
          a = (diff_c * v + add) >> y;
          shift = 3 + x - y;
          if (shift < 1) {
            shift = 1;
            a = a == 0 ? 0 : (a < 0 ? -15 : 15);
          }
          b = min_c - ((a * min_l) >> shift);
        } else {
          a = 0;
          b = min_c;
          shift = 0;
        }
      }
      int32_t* out = preds + (size_t(mi) * 2 + comp) * ch * cw;
      for (size_t i = 0; i < size_t(ch) * cw; ++i) {
        int64_t v = ((a * ds[i]) >> shift) + b;
        out[i] = int32_t(std::min<int64_t>(maxval, std::max<int64_t>(0, v)));
      }
    }
  }
}

}  // extern "C"

// ===========================================================================
// Native CTU search driver (EncCu::xCompressCtu analog, EncCu.cpp:520):
// the full intra-slice QT(/MTT) RD search of one CTU runs as ONE native
// call — tree recursion, 67-mode preselection, full-RD trials (fused
// transform/RDOQ/recon/SSE), chroma mode RD incl. CCLM, dual-tree intra,
// and exact CABAC bit estimation — a bit-exact port of the Python
// searcher (encoder/intra_encoder.py _CtuSearcher) so the bitstream is
// byte-identical while eliminating the per-CU Python orchestration.
// Scope (the caller verifies and falls back to Python otherwise):
// intra slices, RDOQ (no trellis), no MIP/MRL/ISP/LFNST/explicit-MTS/
// TS/BDPCM/IBC/JCCR, no LMCS, no per-CU DQP, no tiles.
// ===========================================================================

extern "C" {
void vte_predict_mip(const int32_t* top, const int32_t* left, int w, int h,
                     int mode, int transposed, int bit_depth, int32_t* out);
void vte_predict_mip_all(const int32_t* top, const int32_t* left, int w,
                         int h, int bit_depth, int32_t* out);
void vte_build_refs_isp(const int32_t* rec, int ph, int pw, int x, int y,
                        int w, int h, const uint8_t* coded, int cuh,
                        int cuw, int unit, int bit_depth,
                        int pred_size_in, int pred_hsize_in, int cu_x,
                        int cu_y, int cu_w, int cu_h, int isp_mode,
                        int32_t* top, int32_t* left);
}

// ---------------------------------------------------------------------------
// LFNST kernels (ops/lfnst.py port; matrices registered from the npz ROM)
// ---------------------------------------------------------------------------
namespace lfnstk {

constexpr int VDIA = 66, NUM_LUMA = 67, NUM_EXT = 28, DIA = 34;
static int32_t FWD8[4][2][16][48];
static int32_t FWD4[4][2][16][16];
static int32_t LUT[95];
static bool ready = false;
static const int MODE_SHIFT[6] = {0, 6, 10, 12, 14, 15};

static inline int ilog2(int v) {
  int n = 0;
  while (v > 1) { ++n; v >>= 1; }
  return n;
}

// wide-angle extended mode for set selection (xGetLFNSTIntraMode)
static int ext_mode(int w, int h, int dir) {
  if (dir < 2) return dir;
  int lw = ilog2(w), lh = ilog2(h);
  if (w > h && dir < 2 + MODE_SHIFT[lw - lh])
    return dir + (VDIA - 1) + (NUM_EXT >> 1);
  if (h > w && dir > VDIA - MODE_SHIFT[lh - lw])
    return dir - (VDIA + 1) + (NUM_EXT >> 1) + NUM_LUMA;
  return dir;
}

static bool transpose_flag(int ext) {
  return (ext >= NUM_LUMA && ext >= NUM_LUMA + (NUM_EXT >> 1)) ||
         (ext < NUM_LUMA && ext > DIA);
}

// LFNST sample-vector positions in vector order (ops/lfnst.py
// _region_coords)
static int region_coords(int sb, bool tr, int* ys, int* xs) {
  int n = 0;
  if (!tr) {
    for (int y = 0; y < sb; ++y) {
      int stride = y < 4 ? sb : 4;
      for (int x = 0; x < stride; ++x) { ys[n] = y; xs[n] = x; ++n; }
    }
  } else if (sb == 4) {
    for (int x = 0; x < 4; ++x)
      for (int y = 0; y < 4; ++y) { ys[n] = y; xs[n] = x; ++n; }
  } else {
    for (int x = 0; x < 4; ++x)
      for (int y = 0; y < 8; ++y) { ys[n] = y; xs[n] = x; ++n; }
    for (int x = 4; x < 8; ++x)
      for (int y = 0; y < 4; ++y) { ys[n] = y; xs[n] = x; ++n; }
  }
  return n;
}

struct Par {
  bool tr;
  int sb, nonzero, cols;
  const int32_t* mat;  // [16][cols]
};

static Par params(int w, int h, int mode, int idx, int mw, int mh) {
  Par p;
  int ext = ext_mode(mw, mh, mode);
  int tset = LUT[ext];
  p.tr = transpose_flag(ext);
  p.sb = (w >= 8 && h >= 8) ? 8 : 4;
  p.nonzero = ((w == 4 && h == 4) || (w == 8 && h == 8)) ? 8 : 16;
  p.cols = p.sb == 8 ? 48 : 16;
  p.mat = p.sb == 8 ? &FWD8[tset][idx - 1][0][0] : &FWD4[tset][idx - 1][0][0];
  return p;
}

// forward LFNST in place (caller guarantees zeros outside the region)
static void fwd(int32_t* c, int w, int h, int mode, int idx,
                const std::vector<int>& sx, const std::vector<int>& sy) {
  Par p = params(w, h, mode, idx, w, h);
  int ys[48], xs[48];
  int n = region_coords(p.sb, p.tr, ys, xs);
  int64_t src[48], out_v[16];
  for (int i = 0; i < n; ++i) src[i] = c[ys[i] * w + xs[i]];
  for (int i = 0; i < 16; ++i) {
    int64_t acc = 0;
    for (int j = 0; j < n; ++j) acc += int64_t(p.mat[i * p.cols + j]) * src[j];
    out_v[i] = (acc + 64) >> 7;
  }
  int zn = region_coords(p.sb, false, ys, xs);
  for (int i = 0; i < zn; ++i) c[ys[i] * w + xs[i]] = 0;
  int nz = p.nonzero < 16 ? p.nonzero : 16;
  for (int i = 0; i < nz; ++i) c[sy[i] * w + sx[i]] = int32_t(out_v[i]);
}

// inverse LFNST in place
static void inv(int32_t* c, int w, int h, int mode, int idx, int mw, int mh,
                const std::vector<int>& sx, const std::vector<int>& sy) {
  Par p = params(w, h, mode, idx, mw, mh);
  int ys[48], xs[48];
  int64_t src[16], out_v[48];
  for (int i = 0; i < p.nonzero; ++i) src[i] = c[sy[i] * w + sx[i]];
  int n = region_coords(p.sb, p.tr, ys, xs);
  for (int j = 0; j < n; ++j) {
    int64_t acc = 0;
    for (int i = 0; i < p.nonzero; ++i)
      acc += int64_t(p.mat[i * p.cols + j]) * src[i];
    acc = (acc + 64) >> 7;
    if (acc < -(int64_t(1) << 15)) acc = -(int64_t(1) << 15);
    if (acc > (int64_t(1) << 15) - 1) acc = (int64_t(1) << 15) - 1;
    out_v[j] = acc;
  }
  int zn = region_coords(p.sb, false, ys, xs);
  for (int i = 0; i < zn; ++i) c[ys[i] * w + xs[i]] = 0;
  region_coords(p.sb, p.tr, ys, xs);
  for (int i = 0; i < n; ++i) c[ys[i] * w + xs[i]] = int32_t(out_v[i]);
}

}  // namespace lfnstk

extern "C" void vte_lfnst_init(const int32_t* fwd8, const int32_t* fwd4,
                               const int32_t* lut) {
  std::memcpy(lfnstk::FWD8, fwd8, sizeof(lfnstk::FWD8));
  std::memcpy(lfnstk::FWD4, fwd4, sizeof(lfnstk::FWD4));
  std::memcpy(lfnstk::LUT, lut, sizeof(lfnstk::LUT));
  lfnstk::ready = true;
}

namespace ctusearch {

// lightweight internal profile (vte_search_prof_get): wall seconds in
// the luma trial loop, the chroma RD, and everything else
static double g_prof_luma = 0, g_prof_chroma = 0, g_prof_total = 0;
static double g_prof_isp = 0, g_prof_lpresel = 0;
static double g_prof_cpred = 0, g_prof_cclm = 0, g_prof_csatd = 0,
              g_prof_ctrial = 0;
struct ProfScope {
  double* acc;
  std::chrono::steady_clock::time_point t0;
  explicit ProfScope(double* a)
      : acc(a), t0(std::chrono::steady_clock::now()) {}
  ~ProfScope() {
    *acc += std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
  }
};

constexpr int NUM_CTX_ALL = 512;  // upper bound; actual size passed at init
constexpr int NO_SPLIT = 0, QT_SPLIT = 1, BT_H = 2, BT_V = 3, TT_H = 4,
              TT_V = 5;
constexpr int MODE_ALL = 0, MODE_INTER = 1, MODE_INTRA = 2;
constexpr int TREE_D = 0, TREE_L = 1, TREE_C = 2, CHROMA_TREE = 3;
constexpr int LDT_INHERIT = 0, LDT_INFER = 1, LDT_SIGNAL = 2;
constexpr int PLANAR = 0, DC = 1, HOR = 18, VER = 50, VDIA = 66;
constexpr int N_MODES = 67;
constexpr int DM_CHROMA = 67;
constexpr int LM_CHROMA = 81, MDLM_L = 82, MDLM_T = 83;
constexpr int MAX_TB = 64;
constexpr int TR_DCT2 = 0, TR_DST7 = 2;

// context-set offsets, installed from Python (vte_search_init)
struct SOffs {
  int split, qt, hv, h12, mpm_flag, planar_flag, chroma_mode, cclm_flag,
      cclm_idx, cbf_y, cbf_cb, cbf_cr, mip_flag, mrl_idx, lfnst, jccr,
      isp;
  int num_ctx;
  // inter syntax (0 until vte_search_init_inter installs them)
  int skip_flag = 0, pred_mode = 0, merge_flag = 0, merge_idx = 0,
      inter_dir = 0, ref_pic = 0, mvd = 0, mvp_idx = 0, root_cbf = 0,
      sub_merge = 0, reg_merge = 0, mmvd_flag = 0, mmvd_merge = 0,
      mmvd_step = 0, ciip_flag = 0, smvd_flag = 0, aff_flag = 0,
      aff_type = 0, imv_flag = 0, bcw_idx = 0, delta_qp = 0,
      aff_mrg_idx = 0;
};
SOffs g_soffs;

// ---- bit estimator (bitstream/cabac.py BitEstimator port) ----------------
struct Est {
  std::vector<uint16_t> s0, s1;
  std::vector<uint8_t> r0, r1;
  int64_t frac = 0;
  void init(const uint16_t* ls0, const uint16_t* ls1, const uint8_t* lr0,
            const uint8_t* lr1, int n) {
    s0.assign(ls0, ls0 + n);
    s1.assign(ls1, ls1 + n);
    r0.assign(lr0, lr0 + n);
    r1.assign(lr1, lr1 + n);
    frac = 0;
  }
  inline void bin(int b, int ctx) {
    frac += g_frac[state8(s0.data(), s1.data(), ctx)][b];
    ctx_update(s0.data(), s1.data(), r0.data(), r1.data(), ctx, b);
  }
  inline void ep(int nbins) { frac += int64_t(nbins) << SCALE_BITS; }
};
struct EstSnap {
  std::vector<uint16_t> s0, s1;
  int64_t frac;
};
static void est_save(const Est& e, EstSnap& s) {
  s.s0 = e.s0;
  s.s1 = e.s1;
  s.frac = e.frac;
}
static void est_load(Est& e, const EstSnap& s) {
  e.s0 = s.s0;
  e.s1 = s.s1;
  e.frac = s.frac;
}

// ---- parameters ----------------------------------------------------------
struct Params {
  int pic_w, pic_h, bit_depth, ctu_size;
  int min_qt[3], max_mtt[3], max_bt[3], max_tt[3], min_cb_log2;
  int qp_y, qp_cb, qp_cr, slice_qp_y;
  double lmbda, lmbda_sad;
  int n_full_rd, n_chroma_rd;
  bool sdh, dual_tree, cclm_en, implicit_mts, dq, mip_en, mrl_en,
      lfnst_en, jccr_en, isp_en;
  int jccr_sign, qp_jc;
  // chroma distortion weights (EncCu::setUpLambda: w = 2^((qpY-qpC)/3),
  // + the dep-quant chroma boost); chroma RDOQ runs at lmbda/w and
  // chroma SSE enters RD costs multiplied by w
  double cw_cb = 1.0, cw_cr = 1.0;
  int tree_idx;  // 0 for intra-slice luma syntax constraints
};

struct PreselClass {
  int w, h, ax, ay, nx, ny;
  const int32_t* costs;  // [ny*nx][67]
};

// ---- picture state (codec/picture.py PictureState port: live pointers) ---
struct Pic {
  int W, H, uw, uh, cw2, ch2;  // luma-unit + chroma-unit grid dims
  int32_t* rec[3];
  const int32_t* src[3];
  uint8_t *coded_luma, *is_intra, *is_mip;
  int32_t *intra_mode, *cu_w, *cu_h, *qt_depth, *qp_map;
  uint8_t* coded_chroma;
  int32_t *ccu_w, *ccu_h, *cqt_depth;

  struct CuInfo {
    int w, h, qtd, mode;
    bool is_intra, is_mip;
  };
  bool cu_at(int x, int y, CuInfo& out) const {
    if (x < 0 || y < 0 || x >= W || y >= H) return false;
    int u = (y >> 2) * uw + (x >> 2);
    if (!coded_luma[u]) return false;
    out = {int(cu_w[u]), int(cu_h[u]), int(qt_depth[u]), int(intra_mode[u]),
           is_intra[u] != 0, is_mip[u] != 0};
    return true;
  }
  bool chroma_cu_at(int x, int y, int* w, int* h, int* qtd) const {
    if (x < 0 || y < 0 || x >= W || y >= H) return false;
    int u = ((y >> 1) >> 1) * cw2 + ((x >> 1) >> 1);
    if (!coded_chroma[u]) return false;
    *w = ccu_w[u];
    *h = ccu_h[u];
    *qtd = cqt_depth[u];
    return true;
  }
  void mark_cu(int x, int y, int w, int h, int qtd, int mode, bool intra_f,
               bool mip_f, bool with_chroma, int qp) {
    int ux0 = x >> 2, uy0 = y >> 2, ux1 = (x + w) >> 2, uy1 = (y + h) >> 2;
    for (int uy = uy0; uy < uy1 && uy < uh; ++uy)
      for (int ux = ux0; ux < ux1 && ux < uw; ++ux) {
        int u = uy * uw + ux;
        coded_luma[u] = 1;
        intra_mode[u] = mode;
        is_intra[u] = intra_f;
        is_mip[u] = mip_f;
        cu_w[u] = w;
        cu_h[u] = h;
        qt_depth[u] = qtd;
        qp_map[u] = qp;
      }
    if (with_chroma) mark_chroma(x, y, w, h, qtd);
  }
  void mark_chroma(int x, int y, int w, int h, int qtd) {
    int cx0 = (x >> 1) >> 1, cy0 = (y >> 1) >> 1;
    int cx1 = ((x + w) >> 1) >> 1, cy1 = ((y + h) >> 1) >> 1;
    for (int cy = cy0; cy < cy1 && cy < ch2; ++cy)
      for (int cx = cx0; cx < cx1 && cx < cw2; ++cx) {
        int u = cy * cw2 + cx;
        coded_chroma[u] = 1;
        ccu_w[u] = w;
        ccu_h[u] = h;
        cqt_depth[u] = qtd;
      }
  }
};

// region snapshot (picture.py save_region/restore_region port)
struct RegionSnap {
  int x, y, x1, y1;
  std::vector<int32_t> rec0, rec1, rec2;
  std::vector<uint8_t> cl, cc, ii, im;
  std::vector<int32_t> imode, cuw, cuh, qtd, qpm, ccw, cch, cqt;
};
template <typename T>
static void copy_rect_out(const T* a, int stride, int rx0, int ry0, int rx1,
                          int ry1, std::vector<T>& out) {
  out.resize(size_t(ry1 - ry0) * (rx1 - rx0));
  for (int yy = ry0; yy < ry1; ++yy)
    std::memcpy(out.data() + size_t(yy - ry0) * (rx1 - rx0),
                a + size_t(yy) * stride + rx0, sizeof(T) * (rx1 - rx0));
}
template <typename T>
static void copy_rect_in(T* a, int stride, int rx0, int ry0, int rx1,
                         int ry1, const std::vector<T>& in) {
  for (int yy = ry0; yy < ry1; ++yy)
    std::memcpy(a + size_t(yy) * stride + rx0,
                in.data() + size_t(yy - ry0) * (rx1 - rx0),
                sizeof(T) * (rx1 - rx0));
}
static void region_save(const Pic& p, int x, int y, int size, RegionSnap& s) {
  s.x = x;
  s.y = y;
  s.x1 = std::min(x + size, p.W);
  s.y1 = std::min(y + size, p.H);
  int cx = x >> 1, cy = y >> 1, cx1 = (s.x1 + 1) >> 1, cy1 = (s.y1 + 1) >> 1;
  int ux = x >> 2, uy = y >> 2, ux1 = (s.x1 + 3) >> 2, uy1 = (s.y1 + 3) >> 2;
  int hx = cx >> 1, hy = cy >> 1, hx1 = (cx1 + 1) >> 1, hy1 = (cy1 + 1) >> 1;
  copy_rect_out(p.rec[0], p.W, x, y, s.x1, s.y1, s.rec0);
  copy_rect_out(p.rec[1], p.W >> 1, cx, cy, cx1, cy1, s.rec1);
  copy_rect_out(p.rec[2], p.W >> 1, cx, cy, cx1, cy1, s.rec2);
  copy_rect_out(p.coded_luma, p.uw, ux, uy, ux1, uy1, s.cl);
  copy_rect_out(p.coded_chroma, p.cw2, hx, hy, hx1, hy1, s.cc);
  copy_rect_out(p.intra_mode, p.uw, ux, uy, ux1, uy1, s.imode);
  copy_rect_out(p.is_intra, p.uw, ux, uy, ux1, uy1, s.ii);
  copy_rect_out(p.is_mip, p.uw, ux, uy, ux1, uy1, s.im);
  copy_rect_out(p.cu_w, p.uw, ux, uy, ux1, uy1, s.cuw);
  copy_rect_out(p.cu_h, p.uw, ux, uy, ux1, uy1, s.cuh);
  copy_rect_out(p.qt_depth, p.uw, ux, uy, ux1, uy1, s.qtd);
  copy_rect_out(p.qp_map, p.uw, ux, uy, ux1, uy1, s.qpm);
  copy_rect_out(p.ccu_w, p.cw2, hx, hy, hx1, hy1, s.ccw);
  copy_rect_out(p.ccu_h, p.cw2, hx, hy, hx1, hy1, s.cch);
  copy_rect_out(p.cqt_depth, p.cw2, hx, hy, hx1, hy1, s.cqt);
}
// restore only the attribute maps (not the rec planes): commit mode
// keeps the chosen tree's reconstruction but must leave the maps to the
// replay, which marks them progressively — the writer's neighbor
// availability (MPM lists, ctx derivation) may not see CUs that are
// coded later in the slice scan.
static void region_restore_maps(Pic& p, const RegionSnap& s) {
  int x = s.x, y = s.y;
  int cx = x >> 1, cy = y >> 1, cx1 = (s.x1 + 1) >> 1, cy1 = (s.y1 + 1) >> 1;
  int ux = x >> 2, uy = y >> 2, ux1 = (s.x1 + 3) >> 2, uy1 = (s.y1 + 3) >> 2;
  int hx = cx >> 1, hy = cy >> 1, hx1 = (cx1 + 1) >> 1, hy1 = (cy1 + 1) >> 1;
  (void)cy1;
  copy_rect_in(p.coded_luma, p.uw, ux, uy, ux1, uy1, s.cl);
  copy_rect_in(p.coded_chroma, p.cw2, hx, hy, hx1, hy1, s.cc);
  copy_rect_in(p.intra_mode, p.uw, ux, uy, ux1, uy1, s.imode);
  copy_rect_in(p.is_intra, p.uw, ux, uy, ux1, uy1, s.ii);
  copy_rect_in(p.is_mip, p.uw, ux, uy, ux1, uy1, s.im);
  copy_rect_in(p.cu_w, p.uw, ux, uy, ux1, uy1, s.cuw);
  copy_rect_in(p.cu_h, p.uw, ux, uy, ux1, uy1, s.cuh);
  copy_rect_in(p.qt_depth, p.uw, ux, uy, ux1, uy1, s.qtd);
  copy_rect_in(p.qp_map, p.uw, ux, uy, ux1, uy1, s.qpm);
  copy_rect_in(p.ccu_w, p.cw2, hx, hy, hx1, hy1, s.ccw);
  copy_rect_in(p.ccu_h, p.cw2, hx, hy, hx1, hy1, s.cch);
  copy_rect_in(p.cqt_depth, p.cw2, hx, hy, hx1, hy1, s.cqt);
}

static void region_restore(Pic& p, const RegionSnap& s) {
  int x = s.x, y = s.y;
  int cx = x >> 1, cy = y >> 1, cx1 = (s.x1 + 1) >> 1, cy1 = (s.y1 + 1) >> 1;
  int ux = x >> 2, uy = y >> 2, ux1 = (s.x1 + 3) >> 2, uy1 = (s.y1 + 3) >> 2;
  int hx = cx >> 1, hy = cy >> 1, hx1 = (cx1 + 1) >> 1, hy1 = (cy1 + 1) >> 1;
  copy_rect_in(p.rec[0], p.W, x, y, s.x1, s.y1, s.rec0);
  copy_rect_in(p.rec[1], p.W >> 1, cx, cy, cx1, cy1, s.rec1);
  copy_rect_in(p.rec[2], p.W >> 1, cx, cy, cx1, cy1, s.rec2);
  copy_rect_in(p.coded_luma, p.uw, ux, uy, ux1, uy1, s.cl);
  copy_rect_in(p.coded_chroma, p.cw2, hx, hy, hx1, hy1, s.cc);
  copy_rect_in(p.intra_mode, p.uw, ux, uy, ux1, uy1, s.imode);
  copy_rect_in(p.is_intra, p.uw, ux, uy, ux1, uy1, s.ii);
  copy_rect_in(p.is_mip, p.uw, ux, uy, ux1, uy1, s.im);
  copy_rect_in(p.cu_w, p.uw, ux, uy, ux1, uy1, s.cuw);
  copy_rect_in(p.cu_h, p.uw, ux, uy, ux1, uy1, s.cuh);
  copy_rect_in(p.qt_depth, p.uw, ux, uy, ux1, uy1, s.qtd);
  copy_rect_in(p.qp_map, p.uw, ux, uy, ux1, uy1, s.qpm);
  copy_rect_in(p.ccu_w, p.cw2, hx, hy, hx1, hy1, s.ccw);
  copy_rect_in(p.ccu_h, p.cw2, hx, hy, hx1, hy1, s.cch);
  copy_rect_in(p.cqt_depth, p.cw2, hx, hy, hx1, hy1, s.cqt);
}

// ---- partitioner state (ctu_syntax.py PartInfo port) ---------------------
struct PartInfo {
  int qt_depth = 0, mtt_depth = 0, bt_depth = 0, impl_bt_depth = 0;
  int last_split = -1, part_idx = 0;
  int mode_type = MODE_ALL, tree_type = TREE_D;
  int split_path0 = NO_SPLIT, split_path1 = NO_SPLIT, path_len = 0;
  PartInfo child(int split, int idx, bool implicit) const {
    PartInfo p = *this;
    p.last_split = split;
    p.part_idx = idx;
    if (p.path_len == 0)
      p.split_path0 = split;
    else if (p.path_len == 1)
      p.split_path1 = split;
    p.path_len++;
    if (split == QT_SPLIT) {
      p.qt_depth++;
      p.mtt_depth = 0;
      p.bt_depth = 0;
    } else {
      p.mtt_depth++;
      p.bt_depth += 1 + ((split == TT_H || split == TT_V) ? 1 : 0);
      if (implicit) p.impl_bt_depth++;
    }
    return p;
  }
};

static void split_geometry(int split, int x, int y, int w, int h,
                           int out[4][4], int* n) {
  if (split == QT_SPLIT) {
    int hw = w >> 1, hh = h >> 1;
    int g[4][4] = {{x, y, hw, hh},
                   {x + hw, y, hw, hh},
                   {x, y + hh, hw, hh},
                   {x + hw, y + hh, hw, hh}};
    std::memcpy(out, g, sizeof(g));
    *n = 4;
  } else if (split == BT_H) {
    int hh = h >> 1;
    int g[2][4] = {{x, y, w, hh}, {x, y + hh, w, hh}};
    std::memcpy(out, g, sizeof(g));
    *n = 2;
  } else if (split == BT_V) {
    int hw = w >> 1;
    int g[2][4] = {{x, y, hw, h}, {x + hw, y, hw, h}};
    std::memcpy(out, g, sizeof(g));
    *n = 2;
  } else if (split == TT_H) {
    int q = h >> 2;
    int g[3][4] = {{x, y, w, q}, {x, y + q, w, h >> 1},
                   {x, y + 3 * q, w, q}};
    std::memcpy(out, g, sizeof(g));
    *n = 3;
  } else {
    int q = w >> 2;
    int g[3][4] = {{x, y, q, h}, {x + q, y, w >> 1, h},
                   {x + 3 * q, y, q, h}};
    std::memcpy(out, g, sizeof(g));
    *n = 3;
  }
}

static int signal_mode_cons(int w, int h, int split, int mode_type_parent,
                            bool is_intra_slice) {
  if (mode_type_parent != MODE_ALL) return LDT_INHERIT;
  int min_luma_area =
      (w * h) >> ((split == QT_SPLIT || split == TT_H || split == TT_V) ? 2
                                                                        : 1);
  int min_chroma_block = min_luma_area >> 2;
  bool is_2xn =
      ((w >> 1) == 4 && split == BT_V) || ((w >> 1) == 8 && split == TT_V);
  if (min_chroma_block >= 16 && !is_2xn) return LDT_INHERIT;
  return (min_luma_area < 32 || is_intra_slice) ? LDT_INFER : LDT_SIGNAL;
}

static int implicit_split_of(const Pic& ps, const Params& pp, int x, int y,
                             int w, int h, const PartInfo& part, int tidx) {
  bool bl_in = (x < ps.W) && (y + h <= ps.H);
  bool tr_in = (x + w <= ps.W) && (y < ps.H);
  if (bl_in && tr_in) return NO_SPLIT;
  int max_btd = pp.max_mtt[tidx] + part.impl_bt_depth;
  bool bt_ok = (w <= pp.max_bt[tidx] && h <= pp.max_bt[tidx] &&
                part.mtt_depth < max_btd);
  bool qt_ok = w > pp.min_qt[tidx] && part.bt_depth == 0;
  if (!bl_in && !tr_in && qt_ok) return QT_SPLIT;
  if (!bl_in && bt_ok && w <= MAX_TB) return BT_H;
  if (!tr_in && bt_ok && h <= MAX_TB) return BT_V;
  return QT_SPLIT;
}

static void split_options_full(const Pic& ps, const Params& pp, int x, int y,
                               int w, int h, const PartInfo& part, int tidx,
                               bool can[6]) {
  int min_t = 1 << pp.min_cb_log2;
  int max_bt = pp.max_bt[tidx], max_tt = pp.max_tt[tidx];
  int max_btd = pp.max_mtt[tidx] + part.impl_bt_depth;
  bool can_no = true, can_qt = true, can_bh = true, can_bv = true,
       can_th = true, can_tv = true;
  bool can_btt = part.mtt_depth < max_btd;
  if (part.last_split != -1 && part.last_split != QT_SPLIT) can_qt = false;
  if (w <= pp.min_qt[tidx]) can_qt = false;
  bool ctree = part.tree_type == CHROMA_TREE;
  int wc = w >> 1, hc = h >> 1;
  if (ctree && wc <= 4) can_qt = false;
  int impl = implicit_split_of(ps, pp, x, y, w, h, part, tidx);
  if (impl != NO_SPLIT) {
    can_no = can_th = can_tv = false;
    can_bh = impl == BT_H;
    can_bv = impl == BT_V;
    if (ctree && wc == 4) can_bv = false;
    if (!can_bh && !can_bv && !can_qt) can_qt = true;
    can[0] = can_no; can[1] = can_qt; can[2] = can_bh;
    can[3] = can_bv; can[4] = can_th; can[5] = can_tv;
    return;
  }
  if ((part.last_split == TT_H || part.last_split == TT_V) &&
      part.part_idx == 1) {
    if (part.last_split == TT_H)
      can_bh = false;
    else
      can_bv = false;
  }
  if (can_btt && (w <= min_t && h <= min_t)) can_btt = false;
  if (can_btt && (w > max_bt || h > max_bt) && (w > max_tt || h > max_tt))
    can_btt = false;
  if (!can_btt) {
    can[0] = can_no; can[1] = can_qt;
    can[2] = can[3] = can[4] = can[5] = false;
    return;
  }
  if (w > max_bt || h > max_bt) can_bh = can_bv = false;
  if (h <= min_t) can_bh = false;
  if (w > MAX_TB && h <= MAX_TB) can_bh = false;
  if (ctree && wc * hc <= 16) can_bh = false;
  if (w <= min_t) can_bv = false;
  if (w <= MAX_TB && h > MAX_TB) can_bv = false;
  if (ctree && (wc * hc <= 16 || wc == 4)) can_bv = false;
  if (h <= 2 * min_t || h > max_tt || w > max_tt) can_th = false;
  if (w > MAX_TB || h > MAX_TB) can_th = false;
  if (ctree && wc * hc <= 32) can_th = false;
  if (w <= 2 * min_t || w > max_tt || h > max_tt) can_tv = false;
  if (w > MAX_TB || h > MAX_TB) can_tv = false;
  if (ctree && (wc * hc <= 32 || wc == 8)) can_tv = false;
  if (part.mode_type == MODE_INTER && w * h == 32) can_bh = can_bv = false;
  if (part.mode_type == MODE_INTER && w * h == 64) can_th = can_tv = false;
  can[0] = can_no; can[1] = can_qt; can[2] = can_bh;
  can[3] = can_bv; can[4] = can_th; can[5] = can_tv;
}

static void split_ctx_ids(const Pic& ps, int x, int y, int w, int h,
                          const PartInfo& part, const bool can[6], int* c_split,
                          int* c_qt, int* c_hv, int* c_h12, int* c_v12) {
  int lw = 0, lh = 0, lq = 0, aw = 0, ah = 0, aq = 0;
  bool has_l = false, has_a = false;
  if (part.tree_type == CHROMA_TREE) {
    int qd;
    has_l = ps.chroma_cu_at(x - 1, y, &lw, &lh, &qd), lq = qd;
    has_a = ps.chroma_cu_at(x, y - 1, &aw, &ah, &qd), aq = qd;
  } else {
    Pic::CuInfo ci;
    if (ps.cu_at(x - 1, y, ci)) {
      has_l = true; lw = ci.w; lh = ci.h; lq = ci.qtd;
    }
    if (ps.cu_at(x, y - 1, ci)) {
      has_a = true; aw = ci.w; ah = ci.h; aq = ci.qtd;
    }
  }
  int cs = 0;
  if (has_l) cs += lh < h ? 1 : 0;
  if (has_a) cs += aw < w ? 1 : 0;
  int num_split = (can[1] ? 2 : 0) + (can[2] ? 1 : 0) + (can[3] ? 1 : 0) +
                  (can[4] ? 1 : 0) + (can[5] ? 1 : 0);
  if (num_split > 0) num_split -= 1;
  cs += 3 * (num_split >> 1);
  int cq = 0;
  if (has_l && lq > part.qt_depth) cq += 1;
  if (has_a && aq > part.qt_depth) cq += 1;
  cq += part.qt_depth < 2 ? 0 : 3;
  int num_hor = (can[2] ? 1 : 0) + (can[4] ? 1 : 0);
  int num_ver = (can[3] ? 1 : 0) + (can[5] ? 1 : 0);
  int chv;
  if (num_ver == num_hor) {
    int w_above = has_a ? aw : 1;
    int h_left = has_l ? lh : 1;
    int dep_above = w / w_above;
    int dep_left = h / h_left;
    if (dep_above == dep_left || !has_l || !has_a)
      chv = 0;
    else if (dep_above < dep_left)
      chv = 1;
    else
      chv = 2;
  } else if (num_ver < num_hor) {
    chv = 3;
  } else {
    chv = 4;
  }
  *c_split = cs;
  *c_qt = cq;
  *c_hv = chv;
  *c_h12 = part.mtt_depth <= 1 ? 1 : 0;
  *c_v12 = part.mtt_depth <= 1 ? 3 : 2;
}

static void write_split_mode(Est& est, const Pic& ps, const Params& pp,
                             int x, int y, int w, int h, const PartInfo& part,
                             int split, int tidx) {
  bool can[6];
  split_options_full(ps, pp, x, y, w, h, part, tidx, can);
  int cs, cq, chv, ch12, cv12;
  split_ctx_ids(ps, x, y, w, h, part, can, &cs, &cq, &chv, &ch12, &cv12);
  bool can_no = can[0];
  bool can_any = can[1] || can[2] || can[3] || can[4] || can[5];
  bool is_no = split == NO_SPLIT;
  if (can_no && can_any) est.bin(is_no ? 0 : 1, g_soffs.split + cs);
  if (is_no) return;
  bool can_btt = can[2] || can[3] || can[4] || can[5];
  bool is_qt = split == QT_SPLIT;
  if (can[1] && can_btt) est.bin(is_qt ? 1 : 0, g_soffs.qt + cq);
  if (is_qt) return;
  bool can_hor = can[2] || can[4];
  bool can_ver = can[3] || can[5];
  bool is_ver = split == BT_V || split == TT_V;
  if (can_ver && can_hor) est.bin(is_ver ? 1 : 0, g_soffs.hv + chv);
  bool can14 = is_ver ? can[5] : can[4];
  bool can12 = is_ver ? can[3] : can[2];
  bool is12 = split == (is_ver ? BT_V : BT_H);
  if (can12 && can14)
    est.bin(is12 ? 1 : 0, g_soffs.h12 + (is_ver ? cv12 : ch12));
}

// ---- MPM list (ctu_syntax.py get_intra_mpms port) ------------------------
static void get_mpms(const Pic& ps, int x, int y, int w, int h, int ctu_size,
                     int mpm[6]) {
  int left_dir = PLANAR, above_dir = PLANAR;
  Pic::CuInfo ci;
  if (ps.cu_at(x - 1, y + h - 1, ci) && ci.is_intra && !ci.is_mip)
    left_dir = ci.mode;
  if ((y % ctu_size) != 0 && ps.cu_at(x + w - 1, y - 1, ci) && ci.is_intra &&
      !ci.is_mip)
    above_dir = ci.mode;
  const int offset = N_MODES - 6;  // 61
  const int mod = offset + 3;      // 64
  int m[6] = {PLANAR, DC, VER, HOR, VER - 4, VER + 4};
  auto wrap = [&](int v) { return ((v % mod) + mod) % mod; };
  if (left_dir == above_dir) {
    if (left_dir > DC) {
      m[0] = PLANAR;
      m[1] = left_dir;
      m[2] = wrap(left_dir + offset) + 2;
      m[3] = wrap(left_dir - 1) + 2;
      m[4] = wrap(left_dir + offset - 1) + 2;
      m[5] = wrap(left_dir) + 2;
    }
  } else {
    if (left_dir > DC && above_dir > DC) {
      m[0] = PLANAR;
      m[1] = left_dir;
      m[2] = above_dir;
      int mx = std::max(left_dir, above_dir);
      int mn = std::min(left_dir, above_dir);
      if (mx - mn == 1) {
        m[3] = wrap(mn + offset) + 2;
        m[4] = wrap(mx - 1) + 2;
        m[5] = wrap(mn + offset - 1) + 2;
      } else if (mx - mn >= 62) {
        m[3] = wrap(mn - 1) + 2;
        m[4] = wrap(mx + offset) + 2;
        m[5] = wrap(mn) + 2;
      } else if (mx - mn == 2) {
        m[3] = wrap(mn - 1) + 2;
        m[4] = wrap(mn + offset) + 2;
        m[5] = wrap(mx - 1) + 2;
      } else {
        m[3] = wrap(mn + offset) + 2;
        m[4] = wrap(mn - 1) + 2;
        m[5] = wrap(mx + offset) + 2;
      }
    } else if (left_dir + above_dir >= 2) {
      int md = std::max(left_dir, above_dir);
      m[0] = PLANAR;
      m[1] = md;
      m[2] = wrap(md + offset) + 2;
      m[3] = wrap(md - 1) + 2;
      m[4] = wrap(md + offset - 1) + 2;
      m[5] = wrap(md) + 2;
    }
  }
  std::memcpy(mpm, m, sizeof(m));
}

// ---- motion info (codec/motion.py MotionInfo analog) ---------------------
struct MI {
  int32_t mv[2][2] = {{0, 0}, {0, 0}};  // [list][x, y], 1/16 pel
  int8_t ref[2] = {-1, -1};
  int8_t bcw = 2;
  uint8_t alt = 0;
  int dir() const { return (ref[0] >= 0 ? 1 : 0) | (ref[1] >= 0 ? 2 : 0); }
};

// motion equality for pruning (MotionInfo.h:115: refIdx + mv only)
static bool same_mi(const MI& a, const MI& b) {
  for (int li = 0; li < 2; ++li) {
    if (a.ref[li] != b.ref[li]) return false;
    if (a.ref[li] >= 0 &&
        (a.mv[li][0] != b.mv[li][0] || a.mv[li][1] != b.mv[li][1]))
      return false;
  }
  return true;
}

// ---- CU record for serialization -----------------------------------------
struct CuRec {
  int x, y, w, h;
  int luma_mode = PLANAR;
  int chroma_dir = DM_CHROMA;
  bool luma_only = false, chroma_only = false;
  bool cclm_allowed = true;
  bool mip_flag = false, mip_t = false;  // matrix intra prediction
  int ref_line = 0;                       // multi-reference-line index
  int lfnst_idx = 0;                      // secondary transform index
  int joint_cbcr = 0;                     // JCCR mode mask (0 = separate)
  int isp_mode = 0;                       // intra sub-partitions (1=H,2=V)
  std::vector<std::vector<int32_t>> isp_coeffs;  // per-part (empty=no cbf)
  std::vector<int32_t> coeff_y, coeff_cb, coeff_cr;  // empty = no cbf
  // inter fields (codec/ctu_syntax.py CuData inter subset)
  bool is_inter = false, skip = false, merge = false, smvd = false;
  bool mmvd = false, alt_hpel = false, root_cbf = true, ciip = false;
  int merge_idx = 0, mmvd_base = 0, mmvd_step = 0, mmvd_pos = 0;
  int mv[2][2] = {{0, 0}, {0, 0}};
  int ref_idx[2] = {-1, -1};
  int mvd[2] = {0, 0}, mvd1[2] = {0, 0};
  int mvp_idx = 0, mvp_idx1 = 0;
  int bcw = 2, imv = 0;
  // DMVR refinement per 16x16 sub-PU: rows {sy, sx, dx, dy, bdof}
  std::vector<std::array<int, 5>> dmvr;
  bool dmvr_set = false;
  // implicit max-TB TU tiling (>64 inter CUs): per-TU coeffs, raster
  // order; empty vectors = no cbf (joint/ts outside native scope)
  struct MtbTu {
    int tx, ty, tw, th;
    std::vector<int32_t> cy, cb, cr;
  };
  std::vector<MtbTu> mtb;
  bool has_mtb = false;   // root_cbf && >maxTB (mtb_tus is not None)
  // affine / SbTMVP / GEO
  bool affine = false, sbtmvp = false;
  int affine_type = 0;
  int cpmv[2][3][2] = {};
  int aff_mvds[2][3][2] = {};
  bool geo = false;
  int geo_split_dir = 0, geo_idx0 = 0, geo_idx1 = 0;
  MI geo_mi[2];
  // affine runtime state (derive_affine_grids analog)
  std::vector<MI> sub_mi;            // per-4x4 spanning motion
  std::vector<MI> sb_grid;           // SbTMVP 8x8 sub-block grid
  int sb_pw = 8, sb_ph = 8;
  std::vector<int32_t> aff_grid[2];  // per-4x4 sub-block MVs per list
  int64_t aff_dhv[2][4] = {};
  bool aff_spread[2] = {false, false};
};

// one full-RD trial entry (intra_encoder.py full_modes tuples)
struct TrialMode {
  int mode = PLANAR;
  bool mip = false, mip_t = false;
  int ref_line = 0;
  bool operator==(const TrialMode& o) const {
    return mode == o.mode && mip == o.mip && mip_t == o.mip_t &&
           ref_line == o.ref_line;
  }
};

// MIP size classes (ops/mip.py mip_size_id / num_mip_modes)
static inline int mip_size_id(int w, int h) {
  if (w == 4 && h == 4) return 0;
  if (w == 4 || h == 4 || (w == 8 && h == 8)) return 1;
  return 2;
}
static inline int num_mip_modes(int w, int h) {
  static const int N[3] = {16, 8, 6};
  return N[mip_size_id(w, h)];
}
static inline int bit_length(int v) {
  int n = 0;
  while (v) { ++n; v >>= 1; }
  return n;
}
struct Node {
  int x, y, w, h, split_mode = NO_SPLIT;
  std::vector<Node> children;
  CuRec cu;
  bool has_cu = false;
};

// ---- inter state (codec/motion.py + SyntaxCoder inter subset) ------------
// forward declarations of kernels defined later in this TU
}  // namespace ctusearch
extern "C" {
void vte_mc_block(const int32_t* ref, int ph, int pw, int x, int y, int w,
                  int h, int mv_x, int mv_y, int bit_depth, int is_luma,
                  int intermediate, int alt_hpel,
                  const int32_t* taps_override, int32_t* out);
void vte_dmvr_refine(const int32_t* bl0, const int32_t* bl1, int w, int h,
                     int pad, int32_t* out);
void vte_dmvr_bi_subpu(const int32_t* ref0, const int32_t* ref1, int ph,
                       int pw, int bx, int by, int bw, int bh, int mv0x,
                       int mv0y, int mv1x, int mv1y, int dx, int dy,
                       int comp_scale, int bit_depth, int pic_w, int pic_h,
                       int ctu_size, int alt_hpel, int32_t* out);
}
namespace ctusearch {

static const int MV_CLIP_MAX = (1 << 17) - 1;
static const int MV_CLIP_MIN = -(1 << 17);


// AMVR rounding (motion.py round_mv_amvr; Mv.h:222)
static const int AMVR_SHIFTS[4] = {2, 4, 6, 3};
static inline int round_amvr1(int v, int sh) {
  int off = 1 << (sh - 1);
  v = v >= 0 ? ((v + off - 1) >> sh) : ((v + off) >> sh);
  return v << sh;
}
static inline void round_mv_amvr_c(int mv[2], int imv) {
  int sh = AMVR_SHIFTS[imv];
  mv[0] = round_amvr1(mv[0], sh);
  mv[1] = round_amvr1(mv[1], sh);
}
static inline int round_pairwise_c(int v) {
  return (v + 1 - (v >= 0 ? 1 : 0)) >> 1;
}

// temporal-storage MV float round-trip (motion.py _round_mv_storage)
static int round_mv_storage(int val) {
  const int MAN_BITS = 6;
  const int MAN_UPPER = (1 << (MAN_BITS - 1)) - 1;
  const int MAN_LIMIT = 1 << (MAN_BITS - 1);
  int sign = val < 0 ? -1 : 0;
  int scale = bit_length((val ^ sign) | MAN_UPPER) - 1 - (MAN_BITS - 1);
  int exponent, mantissa;
  if (scale >= 0) {
    int rnd = (1 << scale) >> 1;
    int n = (val + rnd) >> scale;
    exponent = scale + ((n ^ sign) >> (MAN_BITS - 1));
    mantissa = (n & MAN_UPPER) | (sign * MAN_LIMIT);
  } else {
    exponent = 0;
    mantissa = val;
  }
  if (exponent == 0) return mantissa;
  return (mantissa ^ MAN_LIMIT) * (1 << (exponent - 1));
}

static int dist_scale_factor(int cur_poc, int cur_ref_poc, int col_poc,
                             int col_ref_poc) {
  int diff_d = col_poc - col_ref_poc;
  int diff_b = cur_poc - cur_ref_poc;
  if (diff_d == diff_b) return 4096;
  int tdb = std::max(-128, std::min(127, diff_b));
  int tdd = std::max(-128, std::min(127, diff_d));
  int num = 0x4000 + (std::abs(tdd) >> 1);
  int x = tdd > 0 ? num / tdd : -(num / -tdd);
  int v = (tdb * x + 32) >> 6;
  return std::max(-4096, std::min(4095, v));
}

static inline void scale_mv_c(const int in[2], int scale, int out[2]) {
  for (int k = 0; k < 2; ++k) {
    int64_t p = int64_t(scale) * in[k];
    int64_t v = (p + 128 - (p >= 0 ? 1 : 0)) >> 8;
    out[k] = int(std::max<int64_t>(MV_CLIP_MIN,
                                   std::min<int64_t>(MV_CLIP_MAX, v)));
  }
}

// trunc-binary bin count (ctu_syntax.py write_trunc_bin on BitEstimator)
static inline int tb_thresh(int max_symbol) {
  int t = 0;
  while ((2 << t) <= max_symbol) ++t;
  return t;
}
static inline int trunc_bin_bins(int symbol, int max_symbol) {
  int thresh = tb_thresh(max_symbol);
  int val = 1 << thresh;
  int b = max_symbol - val;
  return symbol < val - b ? thresh : thresh + 1;
}

// per-picture inter context (handle from vte_inter_new)
struct InterCtx {
  int n_ref[2] = {0, 0};
  const int32_t* ref_plane[2][8][3] = {};
  int ref_poc[2][8] = {};
  int cur_poc = 0;
  bool is_b = false;
  int max_merge = 6;
  // collocated picture (TMVP); col_valid null = TMVP off
  const uint8_t* col_valid = nullptr;
  const int32_t* col_mv = nullptr;
  const int8_t* col_ref = nullptr;
  int col_poc = 0, col_from_l0 = 1;
  int col_ref_poc[2][8] = {};
  bool check_ldc = false;
  bool mvd_l1_zero = false;
  bool dmvr_on = false, bdof_on = false;
  int search_range = 64;
  // medium-toolset flags (vte_inter_set_tools)
  bool mmvd = false, fpel_mmvd = false;
  bool geo_en = false;
  int max_geo = 0;
  bool smvd_en = false, bi_dir_pred = false;
  int sym_ref[2] = {-1, -1};
  bool amvr = false;
  bool affine_en = false, affine_type_en = false, affine_amvr_en = false;
  bool prof_en = false, sbtmvp_active = false;
  int max_aff_merge = 0;
  bool ciip_en = false, bcw_en = false;
  // affine neighbor-inheritance mirror (MotionField aff arrays)
  uint8_t* mf_aff_valid = nullptr;
  int32_t* mf_aff_data = nullptr;   // [uh*uw][21]: x y w h type cpmv(12)
                                    // dir ref0 ref1 bcw
  int pic_w = 0, pic_h = 0, ctu_size = 64, bit_depth = 10;
  // live current-picture motion field (numpy MotionField storage)
  uint8_t* mf_valid = nullptr;
  int32_t* mf_mv = nullptr;
  int8_t* mf_ref = nullptr;
  int8_t* mf_bcw = nullptr;
  uint8_t* mf_alt = nullptr;
  uint8_t* mf_skip = nullptr;
  uint8_t* mf_isaff = nullptr;
  int uw = 0, uh = 0;
  // device pre-ME tables (ops/me.py FrameMe), full-pel best per 16x16
  const int32_t* me_tab[2][8] = {};
  int me_nbx[2][8] = {}, me_nby[2][8] = {};
  int me_bs = 16;
  bool use_dev_me = false;
  // host coarse-ME 1/4-res reference cache (lazy per (list, ref))
  std::vector<int32_t> ds_ref[2][8];
  std::mutex ds_mtx;   // wavefront: concurrent per-CTU searches share this ctx
  int ds_w[2][8] = {}, ds_h[2][8] = {};
  // 1/4-res source blocks are built per CU on the fly

  bool mi_at(int x, int y, MI& out) const {
    if (x < 0 || y < 0 || x >= uw * 4 || y >= uh * 4) return false;
    size_t u = size_t(y >> 2) * uw + (x >> 2);
    if (!mf_valid[u]) return false;
    const int32_t* m = mf_mv + u * 4;
    out.mv[0][0] = m[0];
    out.mv[0][1] = m[1];
    out.mv[1][0] = m[2];
    out.mv[1][1] = m[3];
    out.ref[0] = mf_ref[u * 2];
    out.ref[1] = mf_ref[u * 2 + 1];
    out.bcw = mf_bcw[u];
    out.alt = mf_alt[u];
    return true;
  }
  bool skip_at(int x, int y) const {
    if (x < 0 || y < 0 || x >= uw * 4 || y >= uh * 4) return false;
    return mf_skip[size_t(y >> 2) * uw + (x >> 2)] != 0;
  }
  void set_cu_mf(int x, int y, int w, int h, const MI* mi, bool skip) {
    for (int uy = y >> 2; uy < (y + h) >> 2 && uy < uh; ++uy)
      for (int ux = x >> 2; ux < (x + w) >> 2 && ux < uw; ++ux) {
        size_t u = size_t(uy) * uw + ux;
        if (mi == nullptr) {
          mf_valid[u] = 0;
        } else {
          mf_valid[u] = 1;
          int32_t* m = mf_mv + u * 4;
          m[0] = mi->mv[0][0];
          m[1] = mi->mv[0][1];
          m[2] = mi->mv[1][0];
          m[3] = mi->mv[1][1];
          mf_ref[u * 2] = mi->ref[0];
          mf_ref[u * 2 + 1] = mi->ref[1];
          mf_bcw[u] = mi->bcw;
          mf_alt[u] = mi->alt;
        }
        mf_skip[u] = skip ? 1 : 0;
        mf_isaff[u] = 0;
      }
  }

  // collocated MV probe (motion.py get_colocated_mvp, regular variant)
  bool colocated_mvp(int list_idx, int px, int py, int ref_idx,
                     int out[2]) const {
    px &= ~7;
    py &= ~7;
    if (px < 0 || py < 0 || px >= uw * 4 || py >= uh * 4) return false;
    size_t u = size_t(py >> 2) * uw + (px >> 2);
    if (!col_valid[u]) return false;
    int col_list = check_ldc ? list_idx : col_from_l0;
    int col_ref = col_ref_at(u, col_list);
    if (col_ref < 0) {
      col_list = 1 - col_list;
      col_ref = col_ref_at(u, col_list);
      if (col_ref < 0) return false;
    }
    const int32_t* m = col_mv + u * 4 + col_list * 2;
    int mv[2] = {round_mv_storage(m[0]), round_mv_storage(m[1])};
    int col_rp = col_ref_poc[col_list][col_ref];
    int cur_rp = ref_poc[list_idx][ref_idx];
    int scale = dist_scale_factor(cur_poc, cur_rp, col_poc, col_rp);
    if (scale == 4096) {
      out[0] = mv[0];
      out[1] = mv[1];
      return true;
    }
    scale_mv_c(mv, scale, out);
    return true;
  }
  int col_ref_at(size_t u, int list_idx) const {
    return col_ref[u * 2 + list_idx];
  }
  // C0/C1 probes (motion.py tmvp_candidate)
  bool tmvp_cand(int x, int y, int w, int h, int list_idx, int ref_idx,
                 int out[2]) const {
    if (!col_valid) return false;
    int rbx = x + w - 4, rby = y + h - 4;
    if (rbx + 4 < pic_w && rby + 4 < pic_h &&
        (rby & (ctu_size - 1)) + 4 < ctu_size) {
      if (colocated_mvp(list_idx, rbx + 4, rby + 4, ref_idx, out))
        return true;
    }
    return colocated_mvp(list_idx, x + (w >> 1), y + (h >> 1), ref_idx,
                         out);
  }
};

// ---- GEO ROM (codec/geo.py _build_tables; Rom.cpp initGeoTemplate) -------
namespace geok {
static const int MASK_N = 112;  // GEO_MASK
static const int A2M[32] = {0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1, 4, 3, 2,
                            1, -1, 0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1,
                            4, 3, 2, 1, -1};
static const int DIS[32] = {8, 8, 8, 8, 4, 4, 2, 1, 0, -1, -2, -4, -4, -8,
                            -8, -8, -8, -8, -8, -8, -4, -4, -2, -1, 0, 1,
                            2, 4, 4, 8, 8, 8};
static const int MIR[32] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                            2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 2, 2,
                            2, 2};
static int g_params[64][2];
static int16_t g_weights[6][MASK_N][MASK_N];
static int g_offs[4][4][64][2];
static bool g_ready = false;
static std::once_flag g_geo_once;
static void init_tables_impl();
static void init_tables() { std::call_once(g_geo_once, init_tables_impl); }
static void init_tables_impl() {
  if (g_ready) return;
  int n = 0;
  for (int a = 0; a < 32; ++a)
    for (int d = 0; d < 4; ++d) {
      if ((d == 0 && a >= 16) ||
          ((d == 0 || d == 2) && (A2M[a] == 0 || A2M[a] == 5)) ||
          A2M[a] == -1)
        continue;
      g_params[n][0] = a;
      g_params[n][1] = d;
      ++n;
    }
  for (int a = 0; a <= 8; ++a) {
    if (A2M[a] == -1) continue;
    int dx = a, dy = (a + 8) % 32;
    int rho = DIS[dx] * 128 + DIS[dy] * 128;
    int moff = (128 - MASK_N) >> 1;
    for (int i = 0; i < MASK_N; ++i)
      for (int j = 0; j < MASK_N; ++j) {
        int yv = (((i + moff) << 1) + 1) * DIS[dy];
        int xv = (((j + moff) << 1) + 1) * DIS[dx];
        int widx = xv + yv - rho;
        int v = (widx + 32 + 4) >> 3;
        g_weights[A2M[a]][i][j] =
            int16_t(std::max(0, std::min(8, v)));
      }
  }
  for (int hidx = 0; hidx < 4; ++hidx) {
    int h = 1 << (hidx + 3);
    for (int widx = 0; widx < 4; ++widx) {
      int w = 1 << (widx + 3);
      for (int sd = 0; sd < 64; ++sd) {
        int ang = g_params[sd][0], dist = g_params[sd][1];
        int ox = (MASK_N - w) >> 1, oy = (MASK_N - h) >> 1;
        if (dist > 0) {
          if (ang % 16 == 8 || (ang % 16 != 0 && h >= w))
            oy += ang < 16 ? (dist * h) >> 3 : -((dist * h) >> 3);
          else
            ox += ang < 16 ? (dist * w) >> 3 : -((dist * w) >> 3);
        }
        g_offs[hidx][widx][sd][0] = ox;
        g_offs[hidx][widx][sd][1] = oy;
      }
    }
  }
  g_ready = true;
}
}  // namespace geok

// motion-field region snapshot (MotionField.save_region analog)
struct MfSnap {
  int ux0 = 0, uy0 = 0, ux1 = 0, uy1 = 0;
  std::vector<uint8_t> valid, alt, skipf, isaff, affv;
  std::vector<int32_t> mv, affd;
  std::vector<int8_t> ref, bcw;
};
static void mf_save(const InterCtx& ic, int x, int y, int size, MfSnap& s) {
  s.ux0 = x >> 2;
  s.uy0 = y >> 2;
  s.ux1 = std::min(ic.uw, (x + size) >> 2);
  s.uy1 = std::min(ic.uh, (y + size) >> 2);
  int w = s.ux1 - s.ux0, h = s.uy1 - s.uy0;
  s.valid.resize(size_t(w) * h);
  s.alt.resize(size_t(w) * h);
  s.skipf.resize(size_t(w) * h);
  s.isaff.resize(size_t(w) * h);
  s.mv.resize(size_t(w) * h * 4);
  s.ref.resize(size_t(w) * h * 2);
  s.bcw.resize(size_t(w) * h);
  bool aff = ic.mf_aff_valid != nullptr;
  if (aff) {
    s.affv.resize(size_t(w) * h);
    s.affd.resize(size_t(w) * h * 21);
  }
  for (int i = 0; i < h; ++i) {
    size_t u = size_t(s.uy0 + i) * ic.uw + s.ux0;
    std::memcpy(&s.valid[size_t(i) * w], ic.mf_valid + u, w);
    std::memcpy(&s.alt[size_t(i) * w], ic.mf_alt + u, w);
    std::memcpy(&s.skipf[size_t(i) * w], ic.mf_skip + u, w);
    std::memcpy(&s.isaff[size_t(i) * w], ic.mf_isaff + u, w);
    std::memcpy(&s.mv[size_t(i) * w * 4], ic.mf_mv + u * 4, size_t(w) * 16);
    std::memcpy(&s.ref[size_t(i) * w * 2], ic.mf_ref + u * 2, size_t(w) * 2);
    std::memcpy(&s.bcw[size_t(i) * w], ic.mf_bcw + u, w);
    if (aff) {
      std::memcpy(&s.affv[size_t(i) * w], ic.mf_aff_valid + u, w);
      std::memcpy(&s.affd[size_t(i) * w * 21], ic.mf_aff_data + u * 21,
                  size_t(w) * 84);
    }
  }
}
static void mf_restore(InterCtx& ic, const MfSnap& s) {
  int w = s.ux1 - s.ux0, h = s.uy1 - s.uy0;
  bool aff = ic.mf_aff_valid != nullptr && !s.affv.empty();
  for (int i = 0; i < h; ++i) {
    size_t u = size_t(s.uy0 + i) * ic.uw + s.ux0;
    std::memcpy(ic.mf_valid + u, &s.valid[size_t(i) * w], w);
    std::memcpy(ic.mf_alt + u, &s.alt[size_t(i) * w], w);
    std::memcpy(ic.mf_skip + u, &s.skipf[size_t(i) * w], w);
    std::memcpy(ic.mf_isaff + u, &s.isaff[size_t(i) * w], w);
    std::memcpy(ic.mf_mv + u * 4, &s.mv[size_t(i) * w * 4], size_t(w) * 16);
    std::memcpy(ic.mf_ref + u * 2, &s.ref[size_t(i) * w * 2], size_t(w) * 2);
    std::memcpy(ic.mf_bcw + u, &s.bcw[size_t(i) * w], w);
    if (aff) {
      std::memcpy(ic.mf_aff_valid + u, &s.affv[size_t(i) * w], w);
      std::memcpy(ic.mf_aff_data + u * 21, &s.affd[size_t(i) * w * 21],
                  size_t(w) * 84);
    }
  }
}

// ---- the searcher --------------------------------------------------------
struct Searcher {
  Pic ps;
  Params pp;
  Est est;
  std::vector<PreselClass> presel;
  // device RD plan (ops/intra_plan.py FramePlan): rows [ny*nx][3] =
  // {mode0, mode1, split} per size class — forced split decisions + a
  // 2-mode shortlist per leaf, decided by the batched device trials
  std::vector<PreselClass> plan;
  // per-CTU dual-tree luma64 records: first-level split of each 64 unit
  struct L64 { int x, y, split; bool isp; };
  std::vector<L64> luma64;

  const int32_t* presel_lookup(int x, int y, int w, int h) const {
    for (const auto& c : presel) {
      if (c.w != w || c.h != h) continue;
      if (x % c.ax || y % c.ay) return nullptr;
      int ix = x / c.ax, iy = y / c.ay;
      if (ix >= c.nx || iy >= c.ny) return nullptr;
      return c.costs + size_t(iy * c.nx + ix) * N_MODES;
    }
    return nullptr;
  }

  const int32_t* plan_lookup(int x, int y, int w, int h) const {
    for (const auto& c : plan) {
      if (c.w != w || c.h != h) continue;
      if (x % c.ax || y % c.ay) return nullptr;
      int ix = x / c.ax, iy = y / c.ay;
      if (ix >= c.nx || iy >= c.ny) return nullptr;
      return c.costs + size_t(iy * c.nx + ix) * 3;
    }
    return nullptr;
  }

  // -- luma syntax estimation (intra_encoder.py _est_cu_luma_syntax,
  //    MIP/MRL off) --
  // last significant scan position (ctu_syntax.py scan_pos_last)
  static int scan_last(const std::vector<int32_t>& c, int w, int h) {
    if (c.empty()) return -1;
    const ScanInfo& si = scan_info(bit_length(w) - 1, bit_length(h) - 1);
    int last = -1;
    for (size_t i = 0; i < si.sx.size(); ++i)
      if (c[size_t(si.sy[i]) * w + si.sx[i]]) last = int(i);
    return last;
  }

  // LFNST index bins (ctu_syntax.py _code_lfnst_mts estimator path,
  // gated by _lfnst_allowed + _residual_tool_stats over the CU's TBs)
  void est_lfnst_bits(const CuRec& cu) {
    if (!pp.lfnst_en) return;
    if (cu.isp_mode) {
      // LFNST with ISP only if the partitions are >= 4x4
      int parts[4][4];
      isp_partitions_c(cu.w, cu.h, cu.isp_mode, parts);
      if (parts[0][2] < 4 || parts[0][3] < 4) return;
    }
    if (cu.mip_flag && !(cu.w >= 16 && cu.h >= 16)) return;
    if (cu.chroma_only && std::min(cu.w >> 1, cu.h >> 1) < 4) return;
    if (cu.w > 64 || cu.h > 64) return;
    bool viol = false, lf_last = false;
    auto acc = [&](const std::vector<int32_t>& c, int tw, int th) {
      if (c.empty()) return;
      int last = scan_last(c, tw, th);
      if (last < 0) return;
      if (tw >= 4 && th >= 4) {
        int maxpos = ((tw == 4 && th == 4) || (tw == 8 && th == 8)) ? 7
                                                                    : 15;
        if (last > maxpos) viol = true;
        if (last >= 1) lf_last = true;
      }
    };
    if (cu.isp_mode) {
      int parts[4][4];
      int n = isp_partitions_c(cu.w, cu.h, cu.isp_mode, parts);
      for (int k = 0; k < n; ++k)
        acc(cu.isp_coeffs[k], parts[k][2], parts[k][3]);
    } else if (!cu.chroma_only) {
      acc(cu.coeff_y, cu.w, cu.h);
    }
    if (!cu.luma_only) {
      acc(cu.coeff_cb, cu.w >> 1, cu.h >> 1);
      acc(cu.coeff_cr, cu.w >> 1, cu.h >> 1);
    }
    if (cu.isp_mode) lf_last = true;  // lfnstLastScanPos bypass for ISP
    if (!(lf_last && !viol)) return;
    int cctx = (cu.luma_only || cu.chroma_only) ? 1 : 0;
    est.bin(cu.lfnst_idx ? 1 : 0, g_soffs.lfnst + cctx);
    if (cu.lfnst_idx) est.bin(cu.lfnst_idx - 1, g_soffs.lfnst + 2);
  }

  // vvenc DeriveCtx::CtxMipFlag (ctu_syntax.py mip_flag_ctx)
  int mip_flag_ctx(int x, int y, int w, int h) const {
    if (w > 2 * h || h > 2 * w) return 3;
    int ctx = 0;
    Pic::CuInfo ci;
    if (ps.cu_at(x - 1, y, ci) && ci.is_mip) ctx += 1;
    if (ps.cu_at(x, y - 1, ci) && ci.is_mip) ctx += 1;
    return ctx;
  }

  void est_cu_luma_syntax(const CuRec& cu, const int mpm[6]) {
    if (pp.mip_en) {
      est.bin(cu.mip_flag ? 1 : 0,
              g_soffs.mip_flag + mip_flag_ctx(cu.x, cu.y, cu.w, cu.h));
      if (cu.mip_flag) {
        est.ep(1);  // transposed flag
        est.ep(bit_length(num_mip_modes(cu.w, cu.h)) - 1);  // truncbin
        return;
      }
    }
    if (pp.mrl_en && (cu.y % pp.ctu_size) != 0) {
      est.bin(cu.ref_line ? 1 : 0, g_soffs.mrl_idx);
      if (cu.ref_line)
        est.bin(cu.ref_line != 1 ? 1 : 0, g_soffs.mrl_idx + 1);
    }
    int mode = cu.luma_mode;
    int mpm_idx = 6;
    for (int i = 0; i < 6; ++i)
      if (mpm[i] == mode) { mpm_idx = i; break; }
    if (cu.ref_line == 0)
      est.bin(mpm_idx < 6 ? 1 : 0, g_soffs.mpm_flag);
    if (mpm_idx < 6) {
      if (cu.ref_line == 0)
        est.bin(mpm_idx > 0 ? 1 : 0, g_soffs.planar_flag + 1);
      for (int t = 1; t < 5; ++t)
        if (mpm_idx >= t) est.ep(1);
    } else {
      est.ep(6);  // truncated-binary payload approx (same as Python est)
    }
  }

  // -- chroma mode syntax (ctu_syntax.py _enc_intra_chroma_mode) --
  void enc_intra_chroma_mode(const CuRec& cu) {
    if (pp.cclm_en && cu.cclm_allowed) {
      bool is_lm = cu.chroma_dir >= LM_CHROMA && cu.chroma_dir <= MDLM_T;
      est.bin(is_lm ? 1 : 0, g_soffs.cclm_flag);
      if (is_lm) {
        int sym = cu.chroma_dir - LM_CHROMA;
        est.bin(sym == 0 ? 0 : 1, g_soffs.cclm_idx);
        if (sym > 0) est.ep(1);
        return;
      }
    }
    bool is_dm = cu.chroma_dir == DM_CHROMA;
    est.bin(is_dm ? 0 : 1, g_soffs.chroma_mode);
    if (!is_dm) est.ep(2);
  }

  static void chroma_cand_modes(int luma_mode, int out[4]) {
    int m[4] = {PLANAR, VER, HOR, DC};
    for (int i = 0; i < 4; ++i)
      if (m[i] == luma_mode) { m[i] = VDIA; break; }
    std::memcpy(out, m, sizeof(m));
  }

  int64_t est_residual_block(const int32_t* coeff, int w, int h,
                             bool is_luma) {
    return est_residual_block(coeff, w, h, is_luma, pp.sdh);
  }
  int64_t est_residual_block(const int32_t* coeff, int w, int h,
                             bool is_luma, bool sdh) {
    int64_t bits = vte_est_residual(coeff, w, h, is_luma ? 1 : 0,
                                    pp.dq ? 1 : 0, sdh ? 1 : 0,
                                    est.s0.data(), est.s1.data(),
                                    est.r0.data(), est.r1.data());
    est.frac += bits;  // vte_est_residual updates ctx only; the frac-bit
                       // delta is returned (native/__init__.py adds it
                       // the same way on the Python estimator)
    return bits;
  }

  // -- CCLM availability gate (ctu_syntax.py _cclm_allowed) --
  bool cclm_allowed_for(const CuRec& cu, const PartInfo& part) const {
    if (!pp.dual_tree || pp.ctu_size <= 32) return true;
    int p1 = part.path_len > 0 ? part.split_path0 : NO_SPLIT;
    int p2 = part.path_len > 1 ? part.split_path1 : NO_SPLIT;
    bool allow = (p1 == QT_SPLIT) || (p1 == BT_H && p2 == BT_V) ||
                 (p1 == NO_SPLIT) || (p1 == BT_H && p2 == NO_SPLIT);
    if (!allow) return false;
    int rx = cu.x & ~63, ry = cu.y & ~63;
    int rec_split = -1;
    bool rec_isp = false;
    for (const auto& r : luma64)
      if (r.x == rx && r.y == ry) {
        rec_split = r.split;
        rec_isp = r.isp;
        break;
      }
    int u = (cu.y >> 2) * ps.uw + (cu.x >> 2);
    int lw = ps.cu_w[u], lh = ps.cu_h[u];
    if (lw < 64 || lh < 64) {
      if (rec_split != QT_SPLIT) return false;
    } else if (rec_split != -1 && rec_isp) {
      return false;  // unsplit 64x64 luma CU using ISP
    }
    return true;
  }

  // inverse ICT (ctu_syntax.py _ict_derive): coded residual ->
  // (resCb, resCr); arithmetic >> floors like numpy
  static void ict_derive(const int64_t* coded, int n, int mask, int sign,
                         int64_t* rcb, int64_t* rcr) {
    static const int MODES[4] = {0, 3, 1, 2};
    int mode = MODES[mask] * (sign ? -1 : 1);
    int am = mode < 0 ? -mode : mode;
    for (int i = 0; i < n; ++i) {
      int64_t c = coded[i];
      int64_t neg = mode < 0 ? -c : c;
      if (am == 1) { rcb[i] = c; rcr[i] = neg >> 1; }
      else if (am == 2) { rcb[i] = c; rcr[i] = neg; }
      else { rcb[i] = neg >> 1; rcr[i] = c; }
    }
  }

  // -- chroma mode RD (intra_encoder.py _rd_chroma, incl. JCCR) --
  void rd_chroma(CuRec& cu, const PartInfo& part) {
    ProfScope _p(&g_prof_chroma);
    int x = cu.x, y = cu.y, w = cu.w, h = cu.h;
    int cx = x >> 1, cy = y >> 1, cw = w >> 1, ch = h >> 1;
    int cW = ps.W >> 1;
    int maxval = (1 << pp.bit_depth) - 1;
    // gather chroma sources
    std::vector<int32_t> src_cb(size_t(ch) * cw), src_cr(size_t(ch) * cw);
    for (int i = 0; i < ch; ++i)
      for (int j = 0; j < cw; ++j) {
        src_cb[size_t(i) * cw + j] = ps.src[1][size_t(cy + i) * cW + cx + j];
        src_cr[size_t(i) * cw + j] = ps.src[2][size_t(cy + i) * cW + cx + j];
      }
    int dm = cu.mip_flag ? PLANAR : cu.luma_mode;  // dm_luma_mode
    std::vector<int> cands = {DM_CHROMA};
    if (pp.cclm_en) {
      cands.push_back(LM_CHROMA);
      cands.push_back(MDLM_L);
      cands.push_back(MDLM_T);
      int cm[4];
      chroma_cand_modes(dm, cm);
      for (int i = 0; i < 4; ++i)
        if (cm[i] != dm) cands.push_back(cm[i]);
    }
    EstSnap snap;
    est_save(est, snap);

    // prediction cache: angular per (comp, mode); CCLM per (mode, comp)
    std::vector<int> ang;
    for (int c : cands)
      if (c < LM_CHROMA || c == DM_CHROMA) {
        int m = c == DM_CHROMA ? dm : c;
        bool seen = false;
        for (int a : ang) seen |= a == m;
        if (!seen) ang.push_back(m);
      }
    // angular preds from chroma references (unit 2, chroma coords)
    std::map<std::pair<int, int>, std::vector<int32_t>> pcache;
    { ProfScope _pp(&g_prof_cpred);
    for (int comp = 1; comp <= 2; ++comp) {
      std::vector<int32_t> top(2 * cw + 3), left(2 * ch + 3);
      vte_build_refs(ps.rec[comp], ps.H >> 1, cW, cx, cy, cw, ch,
                     ps.coded_chroma, ps.ch2, ps.cw2, 2, pp.bit_depth, 0,
                     -1, -1, top.data(), left.data());
      for (int m : ang) {
        std::vector<int32_t> pr(size_t(ch) * cw);
        intra::predict(top.data(), int(top.size()), left.data(),
                       int(left.size()), m, cw, ch, pp.bit_depth, false, 0,
                       -1, -1, false, -1, pr.data());
        pcache[{comp, m}] = std::move(pr);
      }
    }
    }
    std::vector<int> lm_modes;
    for (int c : cands)
      if (c >= LM_CHROMA && c <= MDLM_T) lm_modes.push_back(c);
    std::vector<int32_t> lm_preds;
    if (!lm_modes.empty()) {
      ProfScope _pp(&g_prof_cclm);
      lm_preds.resize(size_t(lm_modes.size()) * 2 * ch * cw);
      std::vector<int32_t> mm(lm_modes.begin(), lm_modes.end());
      vte_cclm_predict(ps.rec[0], ps.rec[1], ps.rec[2], ps.H, ps.W,
                       ps.H >> 1, cW, ps.coded_chroma, ps.ch2, ps.cw2, x, y,
                       w, h, pp.ctu_size, pp.bit_depth, mm.data(),
                       int(mm.size()), lm_preds.data());
    }
    auto pred_for = [&](int cdir, int comp) -> const int32_t* {
      if (cdir >= LM_CHROMA && cdir <= MDLM_T) {
        for (size_t i = 0; i < lm_modes.size(); ++i)
          if (lm_modes[i] == cdir)
            return lm_preds.data() + (i * 2 + (comp - 1)) * size_t(ch) * cw;
        return nullptr;
      }
      int m = cdir == DM_CHROMA ? dm : cdir;
      return pcache[{comp, m}].data();
    };

    // SATD/SAD preselection to the strongest n_chroma_rd (DM always kept)
    int n_ch = pp.n_chroma_rd;
    if (n_ch && int(cands.size()) > n_ch) {
      ProfScope _pp(&g_prof_csatd);
      bool use_satd = (cw % 4 == 0) && (ch % 4 == 0);
      std::vector<std::pair<int64_t, int>> scored;
      for (int c : cands) {
        int64_t tot = 0;
        for (int comp = 1; comp <= 2; ++comp) {
          const int32_t* pr = pred_for(c, comp);
          const int32_t* sc = comp == 1 ? src_cb.data() : src_cr.data();
          if (use_satd) {
            tot += satd::block(sc, pr, cw, ch);
          } else {
            for (size_t i = 0; i < size_t(ch) * cw; ++i)
              tot += std::abs(int64_t(sc[i]) - pr[i]);
          }
        }
        scored.push_back({tot, c});
      }
      std::sort(scored.begin(), scored.end());
      std::vector<int> kept;
      for (int i = 0; i < n_ch; ++i) kept.push_back(scored[i].second);
      bool has_dm = false;
      for (int k : kept) has_dm |= k == DM_CHROMA;
      if (!has_dm) kept.push_back(DM_CHROMA);
      cands = kept;
    }

    // chroma bits of one trial (estimator restored to snap first);
    // mask != 0 = JCCR: cbfs from the mask, one jointly-coded residual
    // (est WITHOUT sign hiding, python chroma_bits parity)
    auto chroma_bits = [&](const std::vector<int32_t>* ccb,
                           const std::vector<int32_t>* ccr,
                           int mask) -> double {
      est_load(est, snap);
      int64_t b0 = est.frac;
      enc_intra_chroma_mode(cu);
      bool cbf_cb = mask ? (mask & 2) != 0 : ccb != nullptr;
      bool cbf_cr = mask ? (mask & 1) != 0 : ccr != nullptr;
      est.bin(cbf_cb ? 1 : 0, g_soffs.cbf_cb);
      est.bin(cbf_cr ? 1 : 0, g_soffs.cbf_cr + (cbf_cb ? 1 : 0));
      int cm = (cbf_cb ? 2 : 0) + (cbf_cr ? 1 : 0);
      if (pp.jccr_en && cm)
        est.bin(mask ? 1 : 0, g_soffs.jccr + cm - 1);
      if (mask) {
        const std::vector<int32_t>* coded = (mask & 2) ? ccb : ccr;
        est_residual_block(coded->data(), cw, ch, false, false);
      } else {
        if (cbf_cb) est_residual_block(ccb->data(), cw, ch, false);
        if (cbf_cr) est_residual_block(ccr->data(), cw, ch, false);
      }
      return double(est.frac - b0) / double(1 << 15);
    };

    double best_cost = 0;
    int best_dir = -1;
    std::vector<int32_t> best_cb, best_cr, best_rec_cb, best_rec_cr;
    std::vector<int32_t> tcoeff(size_t(ch) * cw), trec(size_t(ch) * cw);
    ProfScope _pt(&g_prof_ctrial);
    for (int cdir : cands) {
      cu.chroma_dir = cdir;
      double dist = 0;
      std::vector<int32_t> ccb, ccr, rcb, rcr;
      for (int comp = 1; comp <= 2; ++comp) {
        const int32_t* pr = pred_for(cdir, comp);
        const int32_t* sc = comp == 1 ? src_cb.data() : src_cr.data();
        int qc = comp == 1 ? pp.qp_cb : pp.qp_cr;
        int cbf_ctx = comp == 1 ? g_soffs.cbf_cb
                                : g_soffs.cbf_cr + (!ccb.empty() ? 1 : 0);
        std::vector<int32_t> resi(size_t(ch) * cw);
        for (size_t i = 0; i < size_t(ch) * cw; ++i)
          resi[i] = sc[i] - pr[i];
        int64_t d = 0;
        double w_ = comp == 1 ? pp.cw_cb : pp.cw_cr;
        int cbf = vte_tq_trial(resi.data(), pr, sc, cw, ch, TR_DCT2,
                               TR_DCT2, qc, pp.bit_depth, 0,
                               pp.lmbda / w_, cbf_ctx, pp.sdh ? 1 : 0,
                               est.s0.data(), est.s1.data(),
                               tcoeff.data(), trec.data(), &d,
                               pp.dq ? 1 : 0);
        dist += w_ * double(d);
        if (comp == 1) {
          if (cbf) ccb = tcoeff;
          rcb = trec;
        } else {
          if (cbf) ccr = tcoeff;
          rcr = trec;
        }
      }
      double cost = dist + pp.lmbda * chroma_bits(
          ccb.empty() ? nullptr : &ccb, ccr.empty() ? nullptr : &ccr, 0);
      if (best_dir < 0 || cost < best_cost) {
        best_cost = cost;
        best_dir = cdir;
        best_cb = ccb;
        best_cr = ccr;
        best_rec_cb = rcb;
        best_rec_cr = rcr;
      }
    }
    // JCCR trials on the winning mode (python _rd_chroma jccr loop)
    int best_mask = 0;
    if (pp.jccr_en) {
      cu.chroma_dir = best_dir;
      const int s_ = pp.jccr_sign ? -1 : 1;
      const size_t n = size_t(ch) * cw;
      std::vector<int64_t> res1(n), res2(n), coded(n), rcbv(n), rcrv(n);
      for (int comp = 1; comp <= 2; ++comp) {
        const int32_t* pr = pred_for(best_dir, comp);
        const int32_t* sc = comp == 1 ? src_cb.data() : src_cr.data();
        std::vector<int64_t>& dst = comp == 1 ? res1 : res2;
        for (size_t i = 0; i < n; ++i) dst[i] = int64_t(sc[i]) - pr[i];
      }
      std::vector<int32_t> cres(n), jcoeff(n);
      auto floordiv5 = [](int64_t a) -> int64_t {
        return a >= 0 ? a / 5 : -((-a + 4) / 5);
      };
      for (int mask = 3; mask >= 1; --mask) {
        int qc;
        if (mask == 3) {
          for (size_t i = 0; i < n; ++i)
            cres[i] = int32_t((res1[i] + s_ * res2[i]) >> 1);
          qc = pp.qp_jc;
        } else if (mask == 2) {
          for (size_t i = 0; i < n; ++i)
            cres[i] = int32_t(floordiv5(4 * res1[i] + 2 * s_ * res2[i]));
          qc = pp.qp_cb;
        } else {
          for (size_t i = 0; i < n; ++i)
            cres[i] = int32_t(floordiv5(4 * res2[i] + 2 * s_ * res1[i]));
          qc = pp.qp_cr;
        }
        int cbf_ctx = (mask & 2) ? g_soffs.cbf_cb : g_soffs.cbf_cr;
        double wj = (mask & 2) ? pp.cw_cb : pp.cw_cr;
        int cbf = vte_tq_quant(cres.data(), cw, ch, TR_DCT2, TR_DCT2, qc,
                               pp.bit_depth, 0, pp.lmbda / wj, cbf_ctx,
                               (pp.sdh && !pp.dq) ? 1 : 0, est.s0.data(),
                               est.s1.data(), jcoeff.data(),
                               pp.dq ? 1 : 0);
        if (!cbf) continue;
        std::vector<int32_t> dqv(n), rinv(n);
        if (pp.dq)
          vte_dequant_dq(jcoeff.data(), cw, ch, qc, pp.bit_depth, 0,
                         dqv.data());
        else
          vte_dequant(jcoeff.data(), cw, ch, qc, pp.bit_depth,
                      dqv.data());
        vte_inv_transform(dqv.data(), cw, ch, TR_DCT2, TR_DCT2,
                          pp.bit_depth, rinv.data());
        for (size_t i = 0; i < n; ++i) coded[i] = rinv[i];
        ict_derive(coded.data(), int(n), mask, pp.jccr_sign, rcbv.data(),
                   rcrv.data());
        double dist = 0;
        std::vector<int32_t> trial_rcb(n), trial_rcr(n);
        int maxv = (1 << pp.bit_depth) - 1;
        for (int comp = 1; comp <= 2; ++comp) {
          const int32_t* pr = pred_for(best_dir, comp);
          const int32_t* sc = comp == 1 ? src_cb.data() : src_cr.data();
          const int64_t* rr = comp == 1 ? rcbv.data() : rcrv.data();
          int32_t* out = comp == 1 ? trial_rcb.data() : trial_rcr.data();
          double w_ = comp == 1 ? pp.cw_cb : pp.cw_cr;
          for (size_t i = 0; i < n; ++i) {
            int64_t r = int64_t(pr[i]) + rr[i];
            out[i] = int32_t(r < 0 ? 0 : (r > maxv ? maxv : r));
            int64_t e = int64_t(sc[i]) - out[i];
            dist += w_ * double(e * e);
          }
        }
        std::vector<int32_t> jc(jcoeff.begin(), jcoeff.end());
        double cost = dist + pp.lmbda * chroma_bits(
            (mask & 2) ? &jc : nullptr, (mask & 2) ? nullptr : &jc, mask);
        if (cost < best_cost) {
          best_cost = cost;
          best_mask = mask;
          best_cb.clear();
          best_cr.clear();
          if (mask & 2) best_cb = jc; else best_cr = jc;
          best_rec_cb = trial_rcb;
          best_rec_cr = trial_rcr;
        }
      }
    }
    est_load(est, snap);
    cu.chroma_dir = best_dir;
    cu.joint_cbcr = best_mask;
    cu.coeff_cb = std::move(best_cb);
    cu.coeff_cr = std::move(best_cr);
    // stage the winning chroma reconstruction (identical to what
    // reconstruct_cu recomputes: same pred + same inverse path)
    for (int i = 0; i < ch; ++i)
      for (int j = 0; j < cw; ++j) {
        ps.rec[1][size_t(cy + i) * cW + cx + j] =
            best_rec_cb[size_t(i) * cw + j];
        ps.rec[2][size_t(cy + i) * cW + cx + j] =
            best_rec_cr[size_t(i) * cw + j];
      }
    (void)maxval;
    (void)part;
  }

  // -- luma CU mode decision (intra_encoder.py _rd_cu_intra, v1 scope:
  //    67 angular/planar/DC, implicit MTS, RDOQ+SDH; no MIP/MRL/ISP/
  //    LFNST/explicit MTS/TS/IBC/BDPCM) --
  double rd_cu_intra(CuRec& cu, const PartInfo& part) {
    int x = cu.x, y = cu.y, w = cu.w, h = cu.h;
    bool lo = part.tree_type == TREE_L;  // dual-tree luma pass
    cu.luma_only = lo;
    int maxval = (1 << pp.bit_depth) - 1;
    // source block
    std::vector<int32_t> src_y(size_t(h) * w);
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j)
        src_y[size_t(i) * w + j] = ps.src[0][size_t(y + i) * ps.W + x + j];
    // reference samples from the current reconstruction
    std::vector<int32_t> top(2 * w + 3), left(2 * h + 3);
    vte_build_refs(ps.rec[0], ps.H, ps.W, x, y, w, h, ps.coded_luma, ps.uh,
                   ps.uw, 4, pp.bit_depth, 0, -1, -1, top.data(),
                   left.data());
    int mpm[6];
    get_mpms(ps, x, y, w, h, pp.ctu_size, mpm);

    // SATD preselection: device table when present, else the subset
    // sweep + refinement (mirror of the Python golden: every 2nd
    // angular mode, then the odd neighbors of the strongest candidates)
    auto mode_cost = [&](int m, int64_t satd) {
      double mode_bits = 7.0;
      for (int i = 0; i < 6; ++i)
        if (mpm[i] == m) { mode_bits = 1.5 + i; break; }
      return double(satd) + pp.lmbda_sad * mode_bits;
    };
    struct Cand { double cost; TrialMode tm; };
    std::vector<Cand> cand;
    // device RD plan: trial ONLY the shortlisted modes (the device
    // already ran predict+transform+quant+recon trials for all blocks
    // of this class; host work here is the exact closed-loop re-trial)
    if (lo || !pp.dual_tree) {
      const int32_t* prow = plan_lookup(x, y, w, h);
      if (prow) {
        std::vector<TrialMode> full_modes = {TrialMode{prow[0]}};
        if (prow[1] != prow[0]) full_modes.push_back(TrialMode{prow[1]});
        return rd_cu_intra_trials(cu, part, full_modes, src_y, top, left,
                                  mpm, lo);
      }
    }
    // EncModeCtrl save/load cache (intra_encoder.py mode_cache): a CU
    // area revisited under a different parent split order re-trials the
    // previous visit's winner list instead of re-running the SATD sweep
    std::array<int, 5> ck{x, y, w, h, int(part.tree_type)};
    auto cit = mode_cache.find(ck);
    if (cit != mode_cache.end())
      return rd_cu_intra_trials(cu, part, cit->second, src_y, top, left,
                                mpm, lo);
    const int32_t* tab = presel_lookup(x, y, w, h);
    if (tab) {
      cand.resize(N_MODES);
      for (int m = 0; m < N_MODES; ++m)
        cand[m] = {mode_cost(m, tab[m]), TrialMode{m}};
    } else {
      ProfScope _pp2(&g_prof_lpresel);
      // decimated sweep + two refinement passes (vvenc
      // xEstimateLumaRdModeList with IntraEstDecBit=2,
      // IntraSearch.cpp:230-300; mirrors intra_encoder.py exactly)
      bool seen[N_MODES] = {};
      auto sweep = [&](const std::vector<int32_t>& modes) {
        std::vector<int64_t> sat(modes.size());
        vte_presel_satd(top.data(), int(top.size()), left.data(),
                        int(left.size()), src_y.data(),
                        const_cast<int32_t*>(modes.data()),
                        int(modes.size()), w, h, pp.bit_depth, 1, 0,
                        sat.data());
        for (size_t i = 0; i < modes.size(); ++i) {
          cand.push_back({mode_cost(modes[i], sat[i]),
                          TrialMode{modes[i]}});
          seen[modes[i]] = true;
        }
      };
      std::vector<int32_t> s0 = {0, 1};
      for (int m = 4; m < N_MODES; m += 4) s0.push_back(m);
      sweep(s0);
      int top_k = pp.n_full_rd + 1;
      for (int step : {2, 1}) {
        std::vector<Cand> order0 = cand;
        std::stable_sort(order0.begin(), order0.end(),
                         [](const Cand& a, const Cand& b) {
                           return a.cost < b.cost;
                         });
        std::vector<int32_t> refine;
        int tk = std::min<int>(top_k, int(order0.size()));
        for (int i = 0; i < tk; ++i) {
          int m = order0[i].tm.mode;
          // VTM guard: no refinement around planar/DC/edge-angular
          if (m <= 2 || m >= N_MODES - 1) continue;
          for (int nb : {m - step, m + step}) {
            if (nb >= 2 && nb <= N_MODES - 1 && !seen[nb] &&
                std::find(refine.begin(), refine.end(), nb) ==
                    refine.end())
              refine.push_back(nb);
          }
        }
        if (!refine.empty()) sweep(refine);
      }
    }
    // MIP candidates (intra_encoder.py sps.mip block): all
    // (mode, transpose) pairs SATD-scored with a flat mode-bits term
    if (pp.mip_en) {
      int n_mip = num_mip_modes(w, h);
      double mip_bits = 2.0 + bit_length(n_mip) - 1;
      std::vector<int32_t> mp(size_t(n_mip) * 2 * h * w);
      vte_predict_mip_all(top.data() + 1, left.data() + 1, w, h,
                          pp.bit_depth, mp.data());
      for (int m = 0; m < n_mip; ++m)
        for (int t = 0; t < 2; ++t) {
          const int32_t* pr = mp.data() + (size_t(m) * 2 + t) * h * w;
          int64_t sat = satd::block(src_y.data(), pr, w, h);
          cand.push_back({double(sat) + pp.lmbda_sad * mip_bits,
                          TrialMode{m, true, t != 0, 0}});
        }
    }
    // MRL candidates: reference lines 1/2, MPM modes 1..5 except planar
    if (pp.mrl_en && (y % pp.ctu_size) != 0) {
      for (int line = 1; line <= 2; ++line) {
        std::vector<int32_t> t2(2 * w + line + 3), l2(2 * h + line + 3);
        vte_build_refs(ps.rec[0], ps.H, ps.W, x, y, w, h, ps.coded_luma,
                       ps.uh, ps.uw, 4, pp.bit_depth, line, -1, -1,
                       t2.data(), l2.data());
        std::vector<int32_t> pr(size_t(h) * w);
        for (int mi = 1; mi < 6; ++mi) {
          if (mpm[mi] == PLANAR) continue;
          intra::predict(t2.data(), int(t2.size()), l2.data(),
                         int(l2.size()), mpm[mi], w, h, pp.bit_depth,
                         true, line, -1, -1, false, -1, pr.data());
          int64_t sat = satd::block(src_y.data(), pr.data(), w, h);
          cand.push_back({double(sat) + pp.lmbda_sad * (2.5 + mi),
                          TrialMode{mpm[mi], false, false, line}});
        }
      }
    }
    std::stable_sort(cand.begin(), cand.end(),
                     [](const Cand& a, const Cand& b) {
                       return a.cost < b.cost;
                     });
    int n_full = std::min(pp.n_full_rd, int(cand.size()));
    std::vector<TrialMode> full_modes;
    for (int i = 0; i < n_full; ++i) full_modes.push_back(cand[i].tm);
    bool has_planar = false;
    for (const TrialMode& t : full_modes)
      has_planar |= t.mode == PLANAR && !t.mip && t.ref_line == 0;
    if (!has_planar) full_modes.push_back(TrialMode{PLANAR});
    double cu_cost = rd_cu_intra_trials(cu, part, full_modes, src_y, top,
                                        left, mpm, lo);
    // store winner + strongest runners-up (<= 3 entries, python parity)
    std::vector<TrialMode> ent = {
        TrialMode{cu.luma_mode, cu.mip_flag, cu.mip_t, cu.ref_line}};
    for (const TrialMode& t : full_modes) {
      bool seen = false;
      for (const TrialMode& e : ent) seen |= e == t;
      if (!seen) ent.push_back(t);
      if (int(ent.size()) >= 3) break;
    }
    mode_cache[ck] = std::move(ent);
    return cu_cost;
  }

  // exact closed-loop trials of a decided mode list + the CU tail
  // (chroma RD, estimator re-encode, marking, distortion)
  // ISP partition rectangles (ctu_syntax.py isp_partitions)
  static int isp_partitions_c(int w, int h, int isp_mode, int out[4][4]) {
    int split_dim = isp_mode == 1 ? h : w;
    int non_split = isp_mode == 1 ? w : h;
    int factor = non_split < 16 ? 16 / non_split : 1;
    int part = std::max(split_dim >> 2, factor);
    int n = split_dim / part;
    for (int k = 0; k < n; ++k) {
      if (isp_mode == 1) {
        out[k][0] = 0; out[k][1] = k * part; out[k][2] = w; out[k][3] = part;
      } else {
        out[k][0] = k * part; out[k][1] = 0; out[k][2] = part; out[k][3] = h;
      }
    }
    return n;
  }
  static bool isp_pred_reg_diff(int w, int h, int isp_mode) {
    return isp_mode == 2 && (w == 4 || (w == 8 && h > 4));
  }
  // ISP implicit transform selection (ops/transforms.py isp_tr_types)
  void isp_tr_types(int w, int h, int* trh, int* trv) const {
    if (!pp.implicit_mts) { *trh = *trv = TR_DCT2; return; }
    *trh = (4 <= w && w <= 16) ? TR_DST7 : TR_DCT2;
    *trv = (4 <= h && h <= 16) ? TR_DST7 : TR_DCT2;
  }
  // isp_mode signalling condition (ctu_syntax.py _isp_coded)
  bool isp_coded_ok(const CuRec& cu) const {
    if (cu.chroma_only || cu.mip_flag || cu.ref_line) return false;
    if (!pp.isp_en) return false;
    if (cu.w > 64 || cu.h > 64) return false;
    return (bit_length(cu.w) - 1) + (bit_length(cu.h) - 1) > 4;
  }

  // ISP transform-unit chain bits (ctu_syntax.py _code_isp_tus on the
  // estimator; use_dqp off in the native scope)
  void est_isp_tus(const CuRec& cu) {
    int parts[4][4];
    int n = isp_partitions_c(cu.w, cu.h, cu.isp_mode, parts);
    bool with_chroma = !cu.luma_only;
    bool cbfs[4];
    for (int k = 0; k < n; ++k) cbfs[k] = !cu.isp_coeffs[k].empty();
    for (int k = 0; k < n; ++k) {
      bool is_last = k == n - 1;
      bool cbf_cb = false, cbf_cr = false;
      if (is_last && with_chroma) {
        if (cu.joint_cbcr) {
          cbf_cb = (cu.joint_cbcr & 2) != 0;
          cbf_cr = (cu.joint_cbcr & 1) != 0;
        } else {
          cbf_cb = !cu.coeff_cb.empty();
          cbf_cr = !cu.coeff_cr.empty();
        }
        est.bin(cbf_cb ? 1 : 0, g_soffs.cbf_cb);
        est.bin(cbf_cr ? 1 : 0, g_soffs.cbf_cr + (cbf_cb ? 1 : 0));
      }
      bool any_prev = false;
      for (int j = 0; j < k; ++j) any_prev |= cbfs[j];
      bool inferred = is_last && !any_prev;
      bool prev = k ? cbfs[k - 1] : false;
      if (inferred)
        cbfs[k] = true;
      else
        est.bin(cbfs[k] ? 1 : 0, g_soffs.cbf_y + 2 + (prev ? 1 : 0));
      int jccr_mask = (cbf_cb ? 2 : 0) + (cbf_cr ? 1 : 0);
      if (is_last && with_chroma && pp.jccr_en && jccr_mask)
        est.bin(cu.joint_cbcr ? 1 : 0, g_soffs.jccr + jccr_mask - 1);
      if (cbfs[k])
        est_residual_block(cu.isp_coeffs[k].data(), parts[k][2],
                           parts[k][3], true, false);
      if (is_last && with_chroma) {
        if (cu.joint_cbcr) {
          const std::vector<int32_t>& coded =
              (cu.joint_cbcr & 2) ? cu.coeff_cb : cu.coeff_cr;
          est_residual_block(coded.data(), cu.w >> 1, cu.h >> 1, false);
        } else {
          if (cbf_cb)
            est_residual_block(cu.coeff_cb.data(), cu.w >> 1, cu.h >> 1,
                               false);
          if (cbf_cr)
            est_residual_block(cu.coeff_cr.data(), cu.w >> 1, cu.h >> 1,
                               false);
        }
      }
    }
  }

  // ISP trial for the winning luma mode (intra_encoder.py _rd_isp):
  // sequential per-part predict/transform/quant/reconstruct, chroma
  // decision on the staged luma, cost via the real ISP TU syntax.
  // Leaves the winning trial's state staged when it returns true.
  bool rd_isp(const CuRec& cu_in, const PartInfo& part, const int mpm[6],
              bool lo, const RegionSnap& entry_region,
              const EstSnap& entry_est, CuRec& out_cu, double& out_cost,
              double best_in = 1e300) {
    ProfScope _pisp(&g_prof_isp);
    int x = cu_in.x, y = cu_in.y, w = cu_in.w, h = cu_in.h;
    int mode = cu_in.luma_mode;
    int qy = pp.qp_y;
    int maxval = (1 << pp.bit_depth) - 1;
    bool have = false;
    RegionSnap best_state;
    EstSnap best_est_s;
    out_cost = 0;
    for (int m = 1; m <= 2; ++m) {
      region_restore(ps, entry_region);
      est_load(est, entry_est);
      int parts[4][4];
      int n = isp_partitions_c(w, h, m, parts);
      CuRec cu2;
      cu2.x = x; cu2.y = y; cu2.w = w; cu2.h = h;
      cu2.luma_mode = mode;
      cu2.isp_mode = m;
      cu2.luma_only = lo;
      cu2.isp_coeffs.assign(n, {});
      bool reg = isp_pred_reg_diff(w, h, m);
      std::vector<int32_t> reg_pred;
      int reg_px = -1, reg_w = 0;
      std::vector<int32_t> coeff_buf, dq_buf, inv_buf;
      bool any_cbf = false;
      // per-direction LOWER-BOUND abort (vvenc ISP sub-partition early
      // termination): accumulated luma distortion alone exceeding the
      // best total cost makes the direction unwinnable (bits >= 0) —
      // decision-identical pruning, mirrored in the Python golden
      double bound = std::min(best_in, have ? out_cost : 1e300);
      double dist_part = 0.0;
      bool dir_aborted = false;
      for (int k = 0; k < n; ++k) {
        int px = parts[k][0], py = parts[k][1];
        int pw = parts[k][2], phh = parts[k][3];
        int ax = x + px, ay = y + py;
        std::vector<int32_t> pred(size_t(phh) * pw);
        if (reg && (px % 4) != 0) {
          // reuse columns of the cached region prediction
          for (int i = 0; i < phh; ++i)
            for (int j = 0; j < pw; ++j)
              pred[size_t(i) * pw + j] =
                  reg_pred[size_t(i) * reg_w + (px - reg_px) + j];
        } else {
          int rw = reg ? std::max(4, pw) : pw;
          std::vector<int32_t> top(size_t(w) + rw + 3),
              left(size_t(h) + phh + 3);
          vte_build_refs_isp(ps.rec[0], ps.H, ps.W, ax, ay, rw, phh,
                             ps.coded_luma, ps.uh, ps.uw, 4,
                             pp.bit_depth, w + rw, h + phh, x, y, w, h,
                             m, top.data(), left.data());
          std::vector<int32_t> rpred(size_t(phh) * rw);
          intra::predict(top.data(), int(top.size()), left.data(),
                         int(left.size()), mode, rw, phh, pp.bit_depth,
                         true, 0, w, h, true, -1, rpred.data());
          if (reg) {
            reg_pred = rpred;
            reg_px = px;
            reg_w = rw;
            for (int i = 0; i < phh; ++i)
              for (int j = 0; j < pw; ++j)
                pred[size_t(i) * pw + j] = rpred[size_t(i) * rw + j];
          } else {
            pred = std::move(rpred);
          }
        }
        std::vector<int32_t> resi(size_t(phh) * pw);
        for (int i = 0; i < phh; ++i)
          for (int j = 0; j < pw; ++j)
            resi[size_t(i) * pw + j] =
                ps.src[0][size_t(ay + i) * ps.W + ax + j] -
                pred[size_t(i) * pw + j];
        int trh, trv;
        isp_tr_types(pw, phh, &trh, &trv);
        coeff_buf.assign(size_t(phh) * pw, 0);
        int cbf = vte_tq_quant(resi.data(), pw, phh, trh, trv, qy,
                               pp.bit_depth, 1, pp.lmbda, -1,
                               (pp.sdh && !pp.dq) ? 1 : 0,
                               est.s0.data(), est.s1.data(),
                               coeff_buf.data(), pp.dq ? 1 : 0);
        if (cbf) {
          any_cbf = true;
          cu2.isp_coeffs[k] = coeff_buf;
          dq_buf.assign(size_t(phh) * pw, 0);
          inv_buf.assign(size_t(phh) * pw, 0);
          if (pp.dq)
            vte_dequant_dq(coeff_buf.data(), pw, phh, qy, pp.bit_depth,
                           1, dq_buf.data());
          else
            vte_dequant(coeff_buf.data(), pw, phh, qy, pp.bit_depth,
                        dq_buf.data());
          vte_inv_transform(dq_buf.data(), pw, phh, trh, trv,
                            pp.bit_depth, inv_buf.data());
          for (int i = 0; i < phh; ++i)
            for (int j = 0; j < pw; ++j) {
              int64_t r = int64_t(pred[size_t(i) * pw + j]) +
                          inv_buf[size_t(i) * pw + j];
              ps.rec[0][size_t(ay + i) * ps.W + ax + j] =
                  int32_t(r < 0 ? 0 : (r > maxval ? maxval : r));
            }
        } else {
          for (int i = 0; i < phh; ++i)
            for (int j = 0; j < pw; ++j)
              ps.rec[0][size_t(ay + i) * ps.W + ax + j] =
                  pred[size_t(i) * pw + j];
        }
        for (int i = 0; i < phh; ++i)
          for (int j = 0; j < pw; ++j) {
            int64_t e = int64_t(ps.src[0][size_t(ay + i) * ps.W + ax + j]) -
                        ps.rec[0][size_t(ay + i) * ps.W + ax + j];
            dist_part += double(e * e);
          }
        if (dist_part > bound) {
          dir_aborted = true;
          break;
        }
      }
      if (dir_aborted) continue;
      // invalid when no partition codes coefficients (the inferred-1
      // last cbf would have none)
      if (!any_cbf) continue;
      if (!lo) rd_chroma(cu2, part);
      int64_t b0 = est.frac;
      est_cu_luma_syntax(cu2, mpm);
      est.bin(1, g_soffs.isp);
      est.bin(m - 1, g_soffs.isp + 1);
      if (!lo) enc_intra_chroma_mode(cu2);
      est_isp_tus(cu2);
      est_lfnst_bits(cu2);
      double bits = double(est.frac - b0) / double(1 << 15);
      ps.mark_cu(x, y, w, h, part.qt_depth, mode, true, false, !lo,
                 pp.slice_qp_y);
      double dist = 0;
      for (int i = 0; i < h; ++i)
        for (int j = 0; j < w; ++j) {
          int64_t e = int64_t(ps.src[0][size_t(y + i) * ps.W + x + j]) -
                      ps.rec[0][size_t(y + i) * ps.W + x + j];
          dist += double(e * e);
        }
      if (!lo) {
        int cx = x >> 1, cy = y >> 1, cw = w >> 1, ch = h >> 1;
        int cW = ps.W >> 1;
        for (int comp = 1; comp <= 2; ++comp) {
          double w_ = comp == 1 ? pp.cw_cb : pp.cw_cr;
          for (int i = 0; i < ch; ++i)
            for (int j = 0; j < cw; ++j) {
              int64_t e =
                  int64_t(ps.src[comp][size_t(cy + i) * cW + cx + j]) -
                  ps.rec[comp][size_t(cy + i) * cW + cx + j];
              dist += w_ * double(e * e);
            }
        }
      }
      double cost = dist + pp.lmbda * bits;
      if (!have || cost < out_cost) {
        have = true;
        out_cost = cost;
        out_cu = cu2;
        region_save(ps, x, y, std::max(w, h), best_state);
        est_save(est, best_est_s);
      }
    }
    if (!have) return false;
    region_restore(ps, best_state);
    est_load(est, best_est_s);
    return true;
  }

  double rd_cu_intra_trials(CuRec& cu, const PartInfo& part,
                            const std::vector<TrialMode>& full_modes,
                            const std::vector<int32_t>& src_y,
                            const std::vector<int32_t>& top,
                            const std::vector<int32_t>& left,
                            const int mpm[6], bool lo) {
    ProfScope _p(&g_prof_luma);
    int x = cu.x, y = cu.y, w = cu.w, h = cu.h;
    int maxval = (1 << pp.bit_depth) - 1;
    int qy = pp.qp_y;
    EstSnap est_snap;
    est_save(est, est_snap);
    RegionSnap entry_region;  // CU entry state (ISP trials restart here)
    if (pp.isp_en) region_save(ps, x, y, std::max(w, h), entry_region);
    // implicit MTS types (ops/transforms.py implicit_mts_types);
    // MIP blocks keep DCT2 (impl_on = implicit_mts and not mip_f)
    int th_i = TR_DCT2, tv_i = TR_DCT2;
    if (pp.implicit_mts) {
      if (4 <= w && w <= 16) th_i = TR_DST7;
      if (4 <= h && h <= 16) tv_i = TR_DST7;
    }

    double best_cost = 0;
    bool have_best = false;
    TrialMode best_tm;
    std::vector<int32_t> best_coeff, best_rec;
    std::vector<int32_t> pred(size_t(h) * w), resi(size_t(h) * w);
    std::vector<int32_t> tcoeff(size_t(h) * w), trec(size_t(h) * w);
    // lazily built multi-reference-line reference arrays (line -> refs)
    std::map<int, std::pair<std::vector<int32_t>, std::vector<int32_t>>>
        mrl_refs;
    int best_lfnst = 0;
    std::vector<int32_t> tq_buf(size_t(h) * w), dq_buf(size_t(h) * w);
    int cand_i = -1;
    for (const TrialMode& tm : full_modes) {
      ++cand_i;
      int mode = tm.mode;
      if (tm.mip) {
        vte_predict_mip(top.data() + 1, left.data() + 1, w, h, mode,
                        tm.mip_t ? 1 : 0, pp.bit_depth, pred.data());
      } else if (tm.ref_line) {
        auto it = mrl_refs.find(tm.ref_line);
        if (it == mrl_refs.end()) {
          int m = tm.ref_line;
          std::vector<int32_t> t2(2 * w + m + 3), l2(2 * h + m + 3);
          vte_build_refs(ps.rec[0], ps.H, ps.W, x, y, w, h, ps.coded_luma,
                         ps.uh, ps.uw, 4, pp.bit_depth, m, -1, -1,
                         t2.data(), l2.data());
          it = mrl_refs.emplace(m, std::make_pair(std::move(t2),
                                                  std::move(l2))).first;
        }
        const auto& rr = it->second;
        intra::predict(rr.first.data(), int(rr.first.size()),
                       rr.second.data(), int(rr.second.size()), mode, w, h,
                       pp.bit_depth, true, tm.ref_line, -1, -1, false, -1,
                       pred.data());
      } else {
        intra::predict(top.data(), int(top.size()), left.data(),
                       int(left.size()), mode, w, h, pp.bit_depth, true, 0,
                       -1, -1, false, -1, pred.data());
      }
      int th_v = tm.mip ? TR_DCT2 : th_i, tv_v = tm.mip ? TR_DCT2 : tv_i;
      for (size_t i = 0; i < size_t(h) * w; ++i)
        resi[i] = src_y[i] - pred[i];
      // transform variants: primary only, plus LFNST 1/2 for the
      // strongest SATD candidate (intra_encoder.py variants loop)
      std::vector<int> variants = {0};
      if (cand_i == 0 && pp.lfnst_en && lfnstk::ready && w >= 4 &&
          h >= 4 && !(tm.mip && !(w >= 16 && h >= 16))) {
        variants.push_back(1);
        variants.push_back(2);
      }
      for (int lfnst_i : variants) {
        int64_t d = 0;
        int cbf;
        int cu_lfnst = lfnst_i;
        if (lfnst_i == 0) {
          cbf = vte_tq_trial(resi.data(), pred.data(), src_y.data(), w, h,
                             th_v, tv_v, qy, pp.bit_depth, 1, pp.lmbda,
                             g_soffs.cbf_y, pp.sdh ? 1 : 0, est.s0.data(),
                             est.s1.data(), tcoeff.data(), trec.data(),
                             &d, pp.dq ? 1 : 0);
        } else {
          // pure-DCT2 primary, zero outside the top-left 8x8, forward
          // LFNST, quantize, signalability gates, reconstruct
          vte_fwd_transform(resi.data(), w, h, TR_DCT2, TR_DCT2,
                            pp.bit_depth, tq_buf.data());
          for (int i = 0; i < h; ++i)
            for (int j = 0; j < w; ++j)
              if (i >= 8 || j >= 8) tq_buf[size_t(i) * w + j] = 0;
          int lmode = tm.mip ? PLANAR : mode;
          const ScanInfo& si =
              scan_info(bit_length(w) - 1, bit_length(h) - 1);
          lfnstk::fwd(tq_buf.data(), w, h, lmode, lfnst_i, si.sx, si.sy);
          if (pp.dq) {
            cbf = vte_depquant(tq_buf.data(), w, h, qy, pp.bit_depth, 1,
                               pp.lmbda, g_soffs.cbf_y, 8, est.s0.data(),
                               est.s1.data(), tcoeff.data());
          } else {
            vte_rdoq(tq_buf.data(), w, h, qy, pp.bit_depth, 1, pp.lmbda,
                     g_soffs.cbf_y, est.s0.data(), est.s1.data(),
                     tcoeff.data());
            cbf = 0;
            for (size_t i = 0; i < size_t(h) * w; ++i)
              if (tcoeff[i]) { cbf = 1; break; }
            if (cbf && pp.sdh) {
              tq_sdh(tcoeff.data(), tq_buf.data(), w, h, qy,
                     pp.bit_depth, 1);
              cbf = 0;
              for (size_t i = 0; i < size_t(h) * w; ++i)
                if (tcoeff[i]) { cbf = 1; break; }
            }
          }
          if (!cbf) cu_lfnst = 0;
          if (cu_lfnst) {
            int last = -1;
            for (size_t i = 0; i < si.sx.size(); ++i)
              if (tcoeff[size_t(si.sy[i]) * w + si.sx[i]]) last = int(i);
            int maxpos =
                ((w == 4 && h == 4) || (w == 8 && h == 8)) ? 7 : 15;
            if (last > maxpos || last < 1) continue;  // not signalable
          }
          if (cbf) {
            if (pp.dq)
              vte_dequant_dq(tcoeff.data(), w, h, qy, pp.bit_depth, 1,
                             dq_buf.data());
            else
              vte_dequant(tcoeff.data(), w, h, qy, pp.bit_depth,
                          dq_buf.data());
            if (cu_lfnst)
              lfnstk::inv(dq_buf.data(), w, h, lmode, cu_lfnst, w, h,
                          si.sx, si.sy);
            vte_inv_transform(dq_buf.data(), w, h, TR_DCT2, TR_DCT2,
                              pp.bit_depth, tq_buf.data());
            for (size_t i = 0; i < size_t(h) * w; ++i) {
              int64_t r = int64_t(pred[i]) + tq_buf[i];
              trec[i] = int32_t(r < 0 ? 0 : (r > maxval ? maxval : r));
            }
          } else {
            std::copy(pred.begin(), pred.end(), trec.begin());
          }
          d = 0;
          for (size_t i = 0; i < size_t(h) * w; ++i) {
            int64_t e = int64_t(src_y[i]) - trec[i];
            d += e * e;
          }
        }
        // trial tail: estimate luma bits against the entry snapshot
        est_load(est, est_snap);
        int64_t b0 = est.frac;
        CuRec tmp = cu;
        tmp.luma_mode = mode;
        tmp.mip_flag = tm.mip;
        tmp.mip_t = tm.mip_t;
        tmp.ref_line = tm.ref_line;
        tmp.lfnst_idx = cu_lfnst;
        est_cu_luma_syntax(tmp, mpm);
        est.bin(cbf ? 1 : 0, g_soffs.cbf_y);
        if (cbf) {
          est_residual_block(tcoeff.data(), w, h, true);
          tmp.coeff_y.assign(tcoeff.begin(), tcoeff.end());
          est_lfnst_bits(tmp);
        }
        double bits = double(est.frac - b0) / double(1 << 15);
        double cost = double(d) + pp.lmbda * bits;
        if (!have_best || cost < best_cost) {
          have_best = true;
          best_cost = cost;
          best_tm = tm;
          best_lfnst = cu_lfnst;
          best_coeff.clear();
          if (cbf) best_coeff = tcoeff;
          best_rec = trec;
        }
      }
    }
    cu.luma_mode = best_tm.mode;
    cu.mip_flag = best_tm.mip;
    cu.mip_t = best_tm.mip_t;
    cu.ref_line = best_tm.ref_line;
    cu.lfnst_idx = best_lfnst;
    cu.coeff_y = std::move(best_coeff);

    // stage luma reconstruction (CCLM in the chroma RD reads it)
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j)
        ps.rec[0][size_t(y + i) * ps.W + x + j] =
            best_rec[size_t(i) * w + j];
    if (!lo) rd_chroma(cu, part);

    // chroma residuals can retract LFNST signalability (corner violation
    // / DC-only): fall back to the primary-only transform and redo the
    // chroma decision from the updated luma (intra_encoder.py retract)
    if (cu.lfnst_idx && !lo) {
      bool viol = false, lf_last = false;
      auto acc = [&](const std::vector<int32_t>& c, int tw, int th) {
        if (c.empty()) return;
        int last = scan_last(c, tw, th);
        if (last < 0) return;
        if (tw >= 4 && th >= 4) {
          int maxpos = ((tw == 4 && th == 4) || (tw == 8 && th == 8))
                           ? 7 : 15;
          if (last > maxpos) viol = true;
          if (last >= 1) lf_last = true;
        }
      };
      acc(cu.coeff_y, w, h);
      acc(cu.coeff_cb, w >> 1, h >> 1);
      acc(cu.coeff_cr, w >> 1, h >> 1);
      if (viol || !lf_last) {
        cu.lfnst_idx = 0;
        // re-derive the winning mode's prediction
        if (cu.mip_flag) {
          vte_predict_mip(top.data() + 1, left.data() + 1, w, h,
                          cu.luma_mode, cu.mip_t ? 1 : 0, pp.bit_depth,
                          pred.data());
        } else if (cu.ref_line) {
          int m = cu.ref_line;
          std::vector<int32_t> t2(2 * w + m + 3), l2(2 * h + m + 3);
          vte_build_refs(ps.rec[0], ps.H, ps.W, x, y, w, h,
                         ps.coded_luma, ps.uh, ps.uw, 4, pp.bit_depth, m,
                         -1, -1, t2.data(), l2.data());
          intra::predict(t2.data(), int(t2.size()), l2.data(),
                         int(l2.size()), cu.luma_mode, w, h,
                         pp.bit_depth, true, m, -1, -1, false, -1,
                         pred.data());
        } else {
          intra::predict(top.data(), int(top.size()), left.data(),
                         int(left.size()), cu.luma_mode, w, h,
                         pp.bit_depth, true, 0, -1, -1, false, -1,
                         pred.data());
        }
        int th0 = cu.mip_flag ? TR_DCT2 : th_i;
        int tv0 = cu.mip_flag ? TR_DCT2 : tv_i;
        for (size_t i = 0; i < size_t(h) * w; ++i)
          resi[i] = src_y[i] - pred[i];
        int64_t d2 = 0;
        int cbf2 = vte_tq_trial(
            resi.data(), pred.data(), src_y.data(), w, h, th0, tv0, qy,
            pp.bit_depth, 1, pp.lmbda, g_soffs.cbf_y, pp.sdh ? 1 : 0,
            est.s0.data(), est.s1.data(), tcoeff.data(), trec.data(),
            &d2, pp.dq ? 1 : 0);
        cu.coeff_y.clear();
        if (cbf2) cu.coeff_y.assign(tcoeff.begin(), tcoeff.end());
        for (int i = 0; i < h; ++i)
          for (int j = 0; j < w; ++j)
            ps.rec[0][size_t(y + i) * ps.W + x + j] =
                trec[size_t(i) * w + j];
        // the luma reconstruction changed: redo the chroma decision
        rd_chroma(cu, part);
      }
    }

    // re-encode the chosen CU syntax into the running estimator
    est_load(est, est_snap);
    int64_t b0 = est.frac;
    est_cu_luma_syntax(cu, mpm);
    if (!lo) {
      enc_intra_chroma_mode(cu);
      bool cbf_cb = cu.joint_cbcr ? (cu.joint_cbcr & 2) != 0
                                  : !cu.coeff_cb.empty();
      bool cbf_cr = cu.joint_cbcr ? (cu.joint_cbcr & 1) != 0
                                  : !cu.coeff_cr.empty();
      est.bin(cbf_cb ? 1 : 0, g_soffs.cbf_cb);
      est.bin(cbf_cr ? 1 : 0, g_soffs.cbf_cr + (cbf_cb ? 1 : 0));
      int cm = (cbf_cb ? 2 : 0) + (cbf_cr ? 1 : 0);
      if (pp.jccr_en && cm)
        est.bin(cu.joint_cbcr ? 1 : 0, g_soffs.jccr + cm - 1);
    }
    est.bin(cu.coeff_y.empty() ? 0 : 1, g_soffs.cbf_y);
    if (!cu.coeff_y.empty())
      est_residual_block(cu.coeff_y.data(), w, h, true);
    if (!lo) {
      if (cu.joint_cbcr) {
        const std::vector<int32_t>& coded =
            (cu.joint_cbcr & 2) ? cu.coeff_cb : cu.coeff_cr;
        est_residual_block(coded.data(), w >> 1, h >> 1, false, false);
      } else {
        if (!cu.coeff_cb.empty())
          est_residual_block(cu.coeff_cb.data(), w >> 1, h >> 1, false);
        if (!cu.coeff_cr.empty())
          est_residual_block(cu.coeff_cr.data(), w >> 1, h >> 1, false);
      }
    }
    est_lfnst_bits(cu);
    double total_bits = double(est.frac - b0) / double(1 << 15);

    // finish: maps marked (recon already staged; finish_cu recomputes the
    // identical samples in the Python path)
    ps.mark_cu(x, y, w, h, part.qt_depth,
               cu.mip_flag ? PLANAR : cu.luma_mode, true,
               cu.mip_flag, !lo, pp.slice_qp_y);
    if (const char* fp = getenv("VTE_DEBUG_EST")) {
      FILE* f = fopen(fp, "a");
      if (f) {
        fprintf(f, "cu %d %d %d %d mode %d frac %lld\n", x, y, w, h,
                cu.luma_mode, (long long)est.frac);
        fclose(f);
      }
    }
    double dist = 0;
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j) {
        int64_t e = int64_t(ps.src[0][size_t(y + i) * ps.W + x + j]) -
                    ps.rec[0][size_t(y + i) * ps.W + x + j];
        dist += double(e * e);
      }
    if (!lo) {
      int cx = x >> 1, cy = y >> 1, cw = w >> 1, ch = h >> 1, cW = ps.W >> 1;
      for (int comp = 1; comp <= 2; ++comp) {
        double dd = 0;
        for (int i = 0; i < ch; ++i)
          for (int j = 0; j < cw; ++j) {
            int64_t e =
                int64_t(ps.src[comp][size_t(cy + i) * cW + cx + j]) -
                ps.rec[comp][size_t(cy + i) * cW + cx + j];
            dd += double(e * e);
          }
        dist += (comp == 1 ? pp.cw_cb : pp.cw_cr) * dd;
      }
    }
    (void)maxval;
    double total_cost = dist + pp.lmbda * total_bits;

    // ISP competition on the winning mode (intra_encoder.py tail)
    if (pp.isp_en && isp_coded_ok(cu)) {
      RegionSnap cur_state;
      region_save(ps, x, y, std::max(w, h), cur_state);
      EstSnap cur_est;
      est_save(est, cur_est);
      CuRec isp_cu;
      double isp_cost;
      if (rd_isp(cu, part, mpm, lo, entry_region, est_snap, isp_cu,
                 isp_cost, total_cost) &&
          isp_cost < total_cost) {
        cu = std::move(isp_cu);  // state already staged
        total_cost = isp_cost;
      } else {
        region_restore(ps, cur_state);
        est_load(est, cur_est);
      }
    }
    return total_cost;
  }

  // -- CHROMA_TREE leaf (intra_encoder.py _rd_cu_chroma) --
  double rd_cu_chroma(CuRec& cu, const PartInfo& part) {
    cu.chroma_only = true;
    int x = cu.x, y = cu.y, w = cu.w, h = cu.h;
    // DM derives from the co-located CENTER luma mode
    cu.luma_mode =
        ps.intra_mode[((y + (h >> 1)) >> 2) * ps.uw + ((x + (w >> 1)) >> 2)];
    cu.cclm_allowed = cclm_allowed_for(cu, part);
    rd_chroma(cu, part);
    int64_t b0 = est.frac;
    // _enc_chroma_cu on the estimator: mode + cbfs + residuals, then the
    // reconstruction/marking side effect (finish_cu comps=(1,2))
    enc_intra_chroma_mode(cu);
    bool cbf_cb = cu.joint_cbcr ? (cu.joint_cbcr & 2) != 0
                                : !cu.coeff_cb.empty();
    bool cbf_cr = cu.joint_cbcr ? (cu.joint_cbcr & 1) != 0
                                : !cu.coeff_cr.empty();
    est.bin(cbf_cb ? 1 : 0, g_soffs.cbf_cb);
    est.bin(cbf_cr ? 1 : 0, g_soffs.cbf_cr + (cbf_cb ? 1 : 0));
    int cm_ = (cbf_cb ? 2 : 0) + (cbf_cr ? 1 : 0);
    if (pp.jccr_en && cm_)
      est.bin(cu.joint_cbcr ? 1 : 0, g_soffs.jccr + cm_ - 1);
    if (cu.joint_cbcr) {
      const std::vector<int32_t>& coded =
          (cu.joint_cbcr & 2) ? cu.coeff_cb : cu.coeff_cr;
      est_residual_block(coded.data(), w >> 1, h >> 1, false);
    } else {
      if (cbf_cb)
        est_residual_block(cu.coeff_cb.data(), w >> 1, h >> 1, false);
      if (cbf_cr)
        est_residual_block(cu.coeff_cr.data(), w >> 1, h >> 1, false);
    }
    est_lfnst_bits(cu);
    ps.mark_chroma(x, y, w, h, part.qt_depth);
    double bits = double(est.frac - b0) / double(1 << 15);
    // distortion vs the staged chroma reconstruction
    int cx = x >> 1, cy = y >> 1, cw = w >> 1, ch = h >> 1, cW = ps.W >> 1;
    double dist = 0;
    for (int comp = 1; comp <= 2; ++comp) {
      double w_ = comp == 1 ? pp.cw_cb : pp.cw_cr;
      for (int i = 0; i < ch; ++i)
        for (int j = 0; j < cw; ++j) {
          int64_t e = int64_t(ps.src[comp][size_t(cy + i) * cW + cx + j]) -
                      ps.rec[comp][size_t(cy + i) * cW + cx + j];
          dist += w_ * double(e * e);
        }
    }
    return dist + pp.lmbda * bits;
  }

  // =========================================================================
  // inter-slice CU search (encoder/inter_search.py InterSearchMixin port,
  // faster-preset scope: merge/skip + AMVP uni/bi + DMVR + TMVP + intra
  // fallback; reference anchors EncCu.cpp:717 mode loop,
  // InterSearch.h:411 predInterSearch)
  // =========================================================================
  InterCtx* ic = nullptr;            // null = intra slice
  std::vector<MI> hmvp;              // current CTU-row HMVP FIFO
  int ifp_bottom = -1;               // IFP motion window bottom (-1 = off)
  // ifp.py mv_access_ok analog: a trial is admissible only when its
  // motion-compensated reads stay above the IFP window bottom
  // (MC_MARGIN = 8 covers interpolation taps + the DMVR/BDOF extent)
  bool mv_ok_raw(int cy, int ch, int mx) const {
    return cy + ch + (mx >> 4) + 8 <= ifp_bottom;
  }
  bool mv_ok(int cy, int ch, const MI& mi) const {
    if (ifp_bottom < 0) return true;
    int mx = 0;
    for (int li = 0; li < 2; ++li)
      if (mi.ref[li] >= 0) mx = std::max(mx, int(mi.mv[li][1]));
    return mv_ok_raw(cy, ch, mx);
  }
  bool mv_ok_cu(const CuRec& cu) const {
    if (ifp_bottom < 0) return true;
    if (!cu.sub_mi.empty())
      return mv_ok_grid(cu.y, cu.h, cu.sub_mi, cu.ref_idx);
    if (cu.affine) return false;  // grid not derived yet: conservative
    int mx = 0;
    for (int li = 0; li < 2; ++li)
      if (cu.ref_idx[li] >= 0) mx = std::max(mx, cu.mv[li][1]);
    return mv_ok_raw(cu.y, cu.h, mx);
  }
  // grid variant (SbTMVP / affine sub-block motion): max vertical MV
  // over every sub-block of the active lists (CU-level ref gates, as
  // in ifp.py mv_access_ok)
  bool mv_ok_grid(int cy, int ch, const std::vector<MI>& grid,
                  const int ref_idx[2]) const {
    if (ifp_bottom < 0) return true;
    int mx = 0;
    for (const MI& mi : grid)
      for (int li = 0; li < 2; ++li)
        if (ref_idx[li] >= 0 || mi.ref[li] >= 0)
          mx = std::max(mx, int(mi.mv[li][1]));
    return mv_ok_raw(cy, ch, mx);
  }
  // cu_qp_delta estimator state (ctu_syntax.py _maybe_code_dqp on the
  // BitEstimator).  dqp_coded is LIVE coder state in Python — mutated by
  // trial evaluation and NOT restored between trials/nodes (the replay
  // resets it at the next CTU root); searcher trials carry qp == cur_qp,
  // so the coded delta is always 0 (one bin).
  bool use_dqp = false;
  bool dqp_coded = true;
  void maybe_est_dqp(const CuRec& cu, bool any_cbf) {
    if (!use_dqp || dqp_coded || cu.chroma_only) return;
    if (any_cbf || cu.w > 64 || cu.h > 64) {
      est.bin(0, g_soffs.delta_qp);  // abs_dqp == 0 unary prefix
      dqp_coded = true;
    }
  }

  bool is_coded_at(int x, int y) const {
    if (x < 0 || y < 0 || x >= ps.W || y >= ps.H) return false;
    return ps.coded_luma[size_t(y >> 2) * ps.uw + (x >> 2)] != 0;
  }
  bool avail_inter(int x, int y, MI& out) const {
    if (!is_coded_at(x, y)) return false;
    return ic->mi_at(x, y, out);
  }

  // paired picture+motion+hmvp snapshot (intra_encoder.py _save/_restore)
  struct SSnap {
    RegionSnap reg;
    MfSnap mf;
    std::vector<MI> hm;
  };
  void s_save(int x, int y, int size, SSnap& s) {
    TScope _st(&iprof().snap);
    region_save(ps, x, y, size, s.reg);
    if (ic) {
      mf_save(*ic, x, y, size, s.mf);
      s.hm = hmvp;
    }
  }
  void s_restore(const SSnap& s) {
    TScope _st(&iprof().snap);
    region_restore(ps, s.reg);
    if (ic) {
      mf_restore(*ic, s.mf);
      hmvp = s.hm;
    }
  }

  // per-4x4 sub-block spanning (MotionField.set_sub_cu analog);
  // aff_row: the 21-int AffineInfo mirror row or null
  void set_sub_cu_mf(const CuRec& cu, const std::vector<MI>& grid,
                     bool is_aff, const int32_t* aff_row) {
    int nbx = cu.w / 4;
    for (int uy = cu.y >> 2; uy < (cu.y + cu.h) >> 2 && uy < ic->uh; ++uy)
      for (int ux = cu.x >> 2; ux < (cu.x + cu.w) >> 2 && ux < ic->uw;
           ++ux) {
        const MI& mi = grid[size_t(uy - (cu.y >> 2)) * nbx +
                            (ux - (cu.x >> 2))];
        size_t u = size_t(uy) * ic->uw + ux;
        ic->mf_valid[u] = 1;
        int32_t* m = ic->mf_mv + u * 4;
        m[0] = mi.mv[0][0];
        m[1] = mi.mv[0][1];
        m[2] = mi.mv[1][0];
        m[3] = mi.mv[1][1];
        ic->mf_ref[u * 2] = mi.ref[0];
        ic->mf_ref[u * 2 + 1] = mi.ref[1];
        ic->mf_bcw[u] = mi.bcw;
        ic->mf_alt[u] = mi.alt;
        ic->mf_skip[u] = cu.skip ? 1 : 0;
        ic->mf_isaff[u] = is_aff ? 1 : 0;
        if (ic->mf_aff_valid) {
          if (aff_row) {
            ic->mf_aff_valid[u] = 1;
            std::memcpy(ic->mf_aff_data + u * 21, aff_row, 84);
          } else {
            ic->mf_aff_valid[u] = 0;
          }
        }
      }
  }

  void hmvp_add(const MI& mi) {
    int pruned = -1;
    for (size_t i = 0; i < hmvp.size(); ++i)
      if (same_mi(hmvp[i], mi)) { pruned = int(i); break; }
    if (pruned >= 0 || hmvp.size() == 5)
      hmvp.erase(hmvp.begin() + std::max(pruned, 0));
    hmvp.push_back(mi);
  }

  // -- merge candidate list (motion.py get_merge_candidates) --
  void merge_candidates(int x, int y, int w, int h, std::vector<MI>& out) {
    out.clear();
    int max_cands = ic->max_merge;
    bool is_b = ic->is_b;
    int rtx = x + w - 1, rty = y;
    int lbx = x, lby = y + h - 1;
    MI b1, a1, tmp;
    bool has_b1 = avail_inter(rtx, rty - 1, b1);
    bool has_a1 = avail_inter(lbx - 1, lby, a1);
    if (has_b1) out.push_back(b1);
    if (has_a1 && !(has_b1 && same_mi(a1, b1))) out.push_back(a1);
    if (int(out.size()) < max_cands && avail_inter(rtx + 1, rty - 1, tmp) &&
        !(has_b1 && same_mi(tmp, b1)))
      out.push_back(tmp);
    if (int(out.size()) < max_cands && avail_inter(lbx - 1, lby + 1, tmp) &&
        !(has_a1 && same_mi(tmp, a1)))
      out.push_back(tmp);
    if (int(out.size()) < max_cands && out.size() < 4 &&
        avail_inter(x - 1, y - 1, tmp) && !(has_a1 && same_mi(tmp, a1)) &&
        !(has_b1 && same_mi(tmp, b1)))
      out.push_back(tmp);
    // TMVP: ref 0 per list, C0 then C1, no pruning
    if (ic->col_valid && w + h > 12 && int(out.size()) < max_cands) {
      int mv0[2], mv1[2];
      bool h0 = ic->tmvp_cand(x, y, w, h, 0, 0, mv0);
      bool h1 = is_b && ic->tmvp_cand(x, y, w, h, 1, 0, mv1);
      if (h0 || h1) {
        MI mi;
        if (h0) {
          mi.mv[0][0] = mv0[0];
          mi.mv[0][1] = mv0[1];
          mi.ref[0] = 0;
        }
        if (h1) {
          mi.mv[1][0] = mv1[0];
          mi.mv[1][1] = mv1[1];
          mi.ref[1] = 0;
        }
        out.push_back(mi);
      }
    }
    // HMVP, newest first; first two pruned vs A1/B1
    if (int(out.size()) < max_cands - 1) {
      int n = int(hmvp.size());
      for (int mrg = 1; mrg <= n; ++mrg) {
        const MI& mi = hmvp[n - mrg];
        if (mrg > 2 || (!(has_a1 && same_mi(mi, a1)) &&
                        !(has_b1 && same_mi(mi, b1)))) {
          out.push_back(mi);
          if (int(out.size()) == max_cands - 1) break;
        }
      }
    }
    // pairwise average of the first two
    if (1 < int(out.size()) && int(out.size()) < max_cands) {
      MI pair;
      for (int li = 0; li < (is_b ? 2 : 1); ++li) {
        int ri = out[0].ref[li], rj = out[1].ref[li];
        if (ri < 0 && rj < 0) continue;
        if (ri >= 0 && rj >= 0) {
          pair.mv[li][0] =
              round_pairwise_c(out[0].mv[li][0] + out[1].mv[li][0]);
          pair.mv[li][1] =
              round_pairwise_c(out[0].mv[li][1] + out[1].mv[li][1]);
          pair.ref[li] = ri;
        } else if (ri >= 0) {
          pair.mv[li][0] = out[0].mv[li][0];
          pair.mv[li][1] = out[0].mv[li][1];
          pair.ref[li] = ri;
        } else {
          pair.mv[li][0] = out[1].mv[li][0];
          pair.mv[li][1] = out[1].mv[li][1];
          pair.ref[li] = rj;
        }
      }
      pair.alt = (out[0].alt == out[1].alt) ? out[0].alt : 0;
      if (pair.dir()) out.push_back(pair);
    }
    // zero candidates with increasing ref idx
    int ref_cnt = 0;
    int max_refs =
        is_b ? std::min(ic->n_ref[0], ic->n_ref[1]) : ic->n_ref[0];
    while (int(out.size()) < max_cands) {
      int r = ref_cnt < max_refs ? ref_cnt : 0;
      MI z;
      z.ref[0] = r;
      if (is_b) z.ref[1] = r;
      out.push_back(z);
      ++ref_cnt;
    }
    out.resize(max_cands);
  }

  // -- AMVP list (motion.py get_amvp_candidates) --
  bool mi_mv_for_ref(const MI& mi, int list_idx, int ref_poc,
                     int out[2]) const {
    for (int k = 0; k < 2; ++k) {
      int src = k == 0 ? list_idx : 1 - list_idx;
      int r = mi.ref[src];
      if (r >= 0 && r < ic->n_ref[src] && ic->ref_poc[src][r] == ref_poc) {
        out[0] = mi.mv[src][0];
        out[1] = mi.mv[src][1];
        return true;
      }
    }
    return false;
  }
  void amvp_candidates(int x, int y, int w, int h, int list_idx,
                       int ref_idx, int imv, int out[2][2]) {
    int ref_poc = ic->ref_poc[list_idx][ref_idx];
    int cands[2][2];
    int n = 0;
    MI mi;
    int mv[2];
    // left group: A0 then A1
    int lbx = x, lby = y + h - 1;
    for (int k = 0; k < 2 && n == 0; ++k) {
      int px = lbx - 1, py = k == 0 ? lby + 1 : lby;
      if (avail_inter(px, py, mi) &&
          mi_mv_for_ref(mi, list_idx, ref_poc, mv)) {
        cands[n][0] = mv[0];
        cands[n][1] = mv[1];
        ++n;
      }
    }
    // above group: B0, B1, B2
    int rtx = x + w - 1, rty = y;
    int bx[3] = {rtx + 1, rtx, x - 1};
    int by[3] = {rty - 1, rty - 1, y - 1};
    int n_above0 = n;
    for (int k = 0; k < 3 && n == n_above0; ++k) {
      if (avail_inter(bx[k], by[k], mi) &&
          mi_mv_for_ref(mi, list_idx, ref_poc, mv)) {
        cands[n][0] = mv[0];
        cands[n][1] = mv[1];
        ++n;
      }
    }
    for (int i = 0; i < n; ++i) round_mv_amvr_c(cands[i], imv);
    if (n == 2 && cands[0][0] == cands[1][0] && cands[0][1] == cands[1][1])
      n = 1;
    // TMVP
    if (ic->col_valid && w + h > 12 && n < 2) {
      if (ic->tmvp_cand(x, y, w, h, list_idx, ref_idx, mv)) {
        round_mv_amvr_c(mv, imv);
        cands[n][0] = mv[0];
        cands[n][1] = mv[1];
        ++n;
      }
    }
    // HMVP (oldest first, up to 4 entries)
    if (n < 2) {
      int lim = std::min<int>(4, int(hmvp.size()));
      for (int i = 0; i < lim && n < 2; ++i) {
        const MI& mh = hmvp[i];
        for (int k = 0; k < 2 && n < 2; ++k) {
          int src = k == 0 ? list_idx : 1 - list_idx;
          int r = mh.ref[src];
          if (r >= 0 && r < ic->n_ref[src] &&
              ic->ref_poc[src][r] == ref_poc) {
            int m2[2] = {mh.mv[src][0], mh.mv[src][1]};
            round_mv_amvr_c(m2, imv);
            cands[n][0] = m2[0];
            cands[n][1] = m2[1];
            ++n;
          }
        }
      }
    }
    while (n < 2) {
      cands[n][0] = cands[n][1] = 0;
      ++n;
    }
    std::memcpy(out, cands, sizeof(cands));
  }

  // -- motion compensation / prediction --------------------------------
  // uni/bi MC of one component (ctu_syntax.py inter_predict; bcw=2 path)
  void inter_pred_c(const CuRec& cu, int comp, std::vector<int32_t>& out) {
    int sc = comp == 0 ? 0 : 1;
    int x = cu.x >> sc, y = cu.y >> sc, w = cu.w >> sc, h = cu.h >> sc;
    out.resize(size_t(w) * h);
    int refw = ic->pic_w >> sc, refh = ic->pic_h >> sc;
    if (cu.ref_idx[0] >= 0 && cu.ref_idx[1] >= 0) {
      std::vector<int32_t> a(size_t(w) * h), b(size_t(w) * h);
      vte_mc_block(ic->ref_plane[0][cu.ref_idx[0]][comp], refh, refw, x, y,
                   w, h, cu.mv[0][0], cu.mv[0][1], pp.bit_depth,
                   comp == 0 ? 1 : 0, 1, cu.alt_hpel ? 1 : 0, nullptr,
                   a.data());
      vte_mc_block(ic->ref_plane[1][cu.ref_idx[1]][comp], refh, refw, x, y,
                   w, h, cu.mv[1][0], cu.mv[1][1], pp.bit_depth,
                   comp == 0 ? 1 : 0, 1, cu.alt_hpel ? 1 : 0, nullptr,
                   b.data());
      if (cu.bcw != 2)
        bcw_avg(a, b, cu.bcw, out);
      else
        bi_avg(a, b, out);
      return;
    }
    int li = cu.ref_idx[0] >= 0 ? 0 : 1;
    vte_mc_block(ic->ref_plane[li][cu.ref_idx[li]][comp], refh, refw, x, y,
                 w, h, cu.mv[li][0], cu.mv[li][1], pp.bit_depth,
                 comp == 0 ? 1 : 0, 0, cu.alt_hpel ? 1 : 0, nullptr,
                 out.data());
  }
  // BCW weighted bi average (ops/interp.py bcw_average_np)
  void bcw_avg(const std::vector<int32_t>& a, const std::vector<int32_t>& b,
               int bcw, std::vector<int32_t>& out) const {
    static const int BCW_W[5] = {-2, 3, 4, 5, 10};
    int w1 = BCW_W[bcw], w0 = 8 - w1;
    int shift = std::max(2, 14 - pp.bit_depth) + 3;
    int64_t offset = (1LL << (shift - 1)) + (int64_t(1) << 13 << 3);
    int maxval = (1 << pp.bit_depth) - 1;
    for (size_t i = 0; i < out.size(); ++i) {
      int64_t v = (int64_t(a[i]) * w0 + int64_t(b[i]) * w1 + offset) >> shift;
      out[i] = int32_t(std::max<int64_t>(0, std::min<int64_t>(maxval, v)));
    }
  }
  void bi_avg(const std::vector<int32_t>& a, const std::vector<int32_t>& b,
              std::vector<int32_t>& out) const {
    int shift = std::max(2, 14 - pp.bit_depth) + 1;
    int64_t offset = (1LL << (shift - 1)) + 2 * (1 << 13);
    int maxval = (1 << pp.bit_depth) - 1;
    for (size_t i = 0; i < out.size(); ++i) {
      int64_t v = (int64_t(a[i]) + b[i] + offset) >> shift;
      out[i] = int32_t(std::max<int64_t>(0, std::min<int64_t>(maxval, v)));
    }
  }

  // -- DMVR (ops/dmvr.py dmvr_refine + ctu_syntax.py dmvr_predict) -----
  bool dmvr_applies(const CuRec& cu) const {
    if (!ic->dmvr_on) return false;
    if (!cu.merge || cu.mmvd || cu.affine || cu.geo || cu.ciip)
      return false;
    if (cu.ref_idx[0] < 0 || cu.ref_idx[1] < 0 || cu.bcw != 2) return false;
    if (std::min(cu.w, cu.h) < 8 || cu.w * cu.h < 128) return false;
    int poc0 = ic->ref_poc[0][cu.ref_idx[0]];
    int poc1 = ic->ref_poc[1][cu.ref_idx[1]];
    return (ic->cur_poc - poc0) == (poc1 - ic->cur_poc);
  }
  static void clip_mv_c2(const int mv[2], int x, int y, int pic_w,
                         int pic_h, int ctu, int out[2]) {
    int off = 8;
    int hor_max = (pic_w + off - x - 1) << 4;
    int hor_min = (-ctu - off - x + 1) << 4;
    int ver_max = (pic_h + off - y - 1) << 4;
    int ver_min = (-ctu - off - y + 1) << 4;
    out[0] = std::min(hor_max, std::max(hor_min, mv[0]));
    out[1] = std::min(ver_max, std::max(ver_min, mv[1]));
  }
  // 10-bit bilinear prediction (ops/dmvr.py _bilinear_pred)
  void bilinear_pred(const int32_t* ref, int ph, int pw, int x, int y,
                     int w, int h, int mv_x, int mv_y,
                     std::vector<int32_t>& out) const {
    int int_x = x + (mv_x >> 4), frac_x = mv_x & 15;
    int int_y = y + (mv_y >> 4), frac_y = mv_y & 15;
    out.resize(size_t(w) * h);
    int sh1 = 4 - (10 - pp.bit_depth);
    std::vector<int> xs(w + 1), ys(h + 1);
    for (int i = 0; i <= w; ++i)
      xs[i] = std::min(std::max(int_x + i, 0), pw - 1);
    for (int i = 0; i <= h; ++i)
      ys[i] = std::min(std::max(int_y + i, 0), ph - 1);
    auto at = [&](int yy, int xx) -> int64_t {
      return ref[size_t(ys[yy]) * pw + xs[xx]];
    };
    if (frac_x == 0 && frac_y == 0) {
      int up = 10 - pp.bit_depth;
      for (int i = 0; i < h; ++i)
        for (int j = 0; j < w; ++j)
          out[size_t(i) * w + j] = int32_t(at(i, j) << up);
      return;
    }
    int cx0 = 16 - frac_x, cx1 = frac_x;
    int cy0 = 16 - frac_y, cy1 = frac_y;
    if (frac_y == 0) {
      for (int i = 0; i < h; ++i)
        for (int j = 0; j < w; ++j)
          out[size_t(i) * w + j] = int32_t(
              (at(i, j) * cx0 + at(i, j + 1) * cx1 + (1 << (sh1 - 1))) >>
              sh1);
      return;
    }
    if (frac_x == 0) {
      for (int i = 0; i < h; ++i)
        for (int j = 0; j < w; ++j)
          out[size_t(i) * w + j] = int32_t(
              (at(i, j) * cy0 + at(i + 1, j) * cy1 + (1 << (sh1 - 1))) >>
              sh1);
      return;
    }
    std::vector<int64_t> tmp(size_t(h + 1) * w);
    for (int i = 0; i <= h; ++i)
      for (int j = 0; j < w; ++j)
        tmp[size_t(i) * w + j] =
            (at(i, j) * cx0 + at(i, j + 1) * cx1 + (1 << (sh1 - 1))) >> sh1;
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j)
        out[size_t(i) * w + j] = int32_t(
            (tmp[size_t(i) * w + j] * cy0 + tmp[size_t(i + 1) * w + j] * cy1 +
             8) >> 4);
  }
  // full refine: returns rows {sy, sx, dx, dy, bdof_ok}
  void dmvr_refine_c(const CuRec& cu, std::vector<std::array<int, 5>>& out) {
    int x = cu.x, y = cu.y, w = cu.w, h = cu.h;
    int c0[2], c1[2];
    clip_mv_c2(cu.mv[0], x, y, ic->pic_w, ic->pic_h, ic->ctu_size, c0);
    clip_mv_c2(cu.mv[1], x, y, ic->pic_w, ic->pic_h, ic->ctu_size, c1);
    const int pad = 2;
    std::vector<int32_t> bl0, bl1;
    int refw = ic->pic_w, refh = ic->pic_h;
    bilinear_pred(ic->ref_plane[0][cu.ref_idx[0]][0], refh, refw, x - pad,
                  y - pad, w + 2 * pad, h + 2 * pad, c0[0], c0[1], bl0);
    bilinear_pred(ic->ref_plane[1][cu.ref_idx[1]][0], refh, refw, x - pad,
                  y - pad, w + 2 * pad, h + 2 * pad, c1[0], c1[1], bl1);
    int dy_ = std::min(h, 16), dx_ = std::min(w, 16);
    int nsub = ((h + dy_ - 1) / dy_) * ((w + dx_ - 1) / dx_);
    std::vector<int32_t> rows(size_t(nsub) * 3);
    vte_dmvr_refine(bl0.data(), bl1.data(), w, h, pad, rows.data());
    out.clear();
    int n = 0;
    for (int ys = 0; ys < h; ys += dy_)
      for (int xs = 0; xs < w; xs += dx_) {
        out.push_back({ys, xs, rows[n * 3], rows[n * 3 + 1],
                       rows[n * 3 + 2]});
        ++n;
      }
  }
  // prediction of one component of a DMVR CU (non-BDOF path)
  void dmvr_pred_c(const CuRec& cu, int comp, std::vector<int32_t>& out) {
    int sc = comp == 0 ? 0 : 1;
    int w = cu.w >> sc, h = cu.h >> sc;
    out.assign(size_t(w) * h, 0);
    int refw = ic->pic_w >> sc, refh = ic->pic_h >> sc;
    const int32_t* ref0 = ic->ref_plane[0][cu.ref_idx[0]][comp];
    const int32_t* ref1 = ic->ref_plane[1][cu.ref_idx[1]][comp];
    std::vector<int32_t> blk, pad0, pad1;
    for (const auto& row : cu.dmvr) {
      int sy = row[0], sx = row[1];
      int bw = std::min(16, cu.w) >> sc, bh = std::min(16, cu.h) >> sc;
      int bx = (cu.x + sx) >> sc, by = (cu.y + sy) >> sc;
      if (comp == 0 && row[4]) {
        // DMVR + BDOF sub-PU (padded-window sources)
        dmvr_bdof_subpu(cu, sy, sx, row[2], row[3],
                        bw, bh, blk, pad0, pad1);
      } else {
        blk.resize(size_t(bw) * bh);
        vte_dmvr_bi_subpu(ref0, ref1, refh, refw, bx, by, bw, bh,
                          cu.mv[0][0], cu.mv[0][1], cu.mv[1][0],
                          cu.mv[1][1], row[2], row[3], sc, pp.bit_depth,
                          ic->pic_w, ic->pic_h, ic->ctu_size,
                          cu.alt_hpel ? 1 : 0, blk.data());
      }
      for (int i = 0; i < bh; ++i)
        std::memcpy(out.data() + size_t((sy >> sc) + i) * w + (sx >> sc),
                    blk.data() + size_t(i) * bw, size_t(bw) * 4);
    }
  }
  // prepare_refinement analog with per-CU cache (finish_cu re-runs DMVR
  // per trial in Python; identical inputs -> identical outputs, cached)
  std::map<std::array<int, 6>, std::vector<std::array<int, 5>>> dmvr_cache;
  void prepare_refinement_c(CuRec& cu) {
    TScope _dt(&iprof().dmvrp);
    cu.dmvr.clear();
    cu.dmvr_set = false;
    if (!cu.is_inter || !dmvr_applies(cu)) return;
    std::array<int, 6> key{cu.mv[0][0], cu.mv[0][1], cu.mv[1][0],
                           cu.mv[1][1], cu.ref_idx[0], cu.ref_idx[1]};
    auto it = dmvr_cache.find(key);
    if (it == dmvr_cache.end()) {
      std::vector<std::array<int, 5>> rows;
      dmvr_refine_c(cu, rows);
      it = dmvr_cache.emplace(key, std::move(rows)).first;
    }
    cu.dmvr = it->second;
    if (!bdof_applies_c(cu))
      for (auto& r : cu.dmvr) r[4] = 0;
    cu.dmvr_set = true;
  }
  // -- BDOF (ops/bdof.py port; vvenc xFpBiDirOptFlowCore) --------------
  bool bdof_applies_c(const CuRec& cu) const {
    if (!ic->bdof_on) return false;
    if (cu.ref_idx[0] < 0 || cu.ref_idx[1] < 0 || cu.affine || cu.ciip)
      return false;
    if (cu.smvd || cu.bcw != 2) return false;
    if (std::min(cu.w, cu.h) < 8 || cu.w * cu.h < 128) return false;
    int poc0 = ic->ref_poc[0][cu.ref_idx[0]];
    int poc1 = ic->ref_poc[1][cu.ref_idx[1]];
    return (ic->cur_poc - poc0) == (poc1 - ic->cur_poc);
  }
  // (h+2, w+2) extended 14-bit intermediate: 8-tap MC inner block plus a
  // nearest-integer ring (ops/bdof.py _ext_pred); ref is a full plane or
  // a DMVR padded window with block-local coordinates
  void bdof_ext_pred(const int32_t* ref, int rh, int rw, int x, int y,
                     int w, int h, int mv_x, int mv_y, bool alt,
                     std::vector<int64_t>& ext) const {
    ext.assign(size_t(h + 2) * (w + 2), 0);
    std::vector<int32_t> inner(size_t(w) * h);
    vte_mc_block(ref, rh, rw, x, y, w, h, mv_x, mv_y, pp.bit_depth, 1, 1,
                 alt ? 1 : 0, nullptr, inner.data());
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j)
        ext[size_t(i + 1) * (w + 2) + j + 1] = inner[size_t(i) * w + j];
    int int_x = x + (mv_x >> 4), frac_x = mv_x & 15;
    int int_y = y + (mv_y >> 4), frac_y = mv_y & 15;
    int xoff = frac_x < 8 ? 1 : 0;
    int yoff = frac_y < 8 ? 1 : 0;
    int shift = std::max(2, 14 - pp.bit_depth);
    auto ring = [&](int ry, int rx) -> int64_t {
      int yy = std::min(std::max(int_y - yoff + ry, 0), rh - 1);
      int xx = std::min(std::max(int_x - xoff + rx, 0), rw - 1);
      return (int64_t(ref[size_t(yy) * rw + xx]) << shift) - (1 << 13);
    };
    for (int j = 0; j < w + 2; ++j) {
      ext[j] = ring(0, j);
      ext[size_t(h + 1) * (w + 2) + j] = ring(h + 1, j);
    }
    for (int i = 1; i <= h; ++i) {
      ext[size_t(i) * (w + 2)] = ring(i, 0);
      ext[size_t(i) * (w + 2) + w + 1] = ring(i, w + 1);
    }
  }
  static void bdof_gradients(const std::vector<int64_t>& ext, int w, int h,
                             std::vector<int64_t>& gx,
                             std::vector<int64_t>& gy) {
    int W2 = w + 2;
    gx.assign(ext.size(), 0);
    gy.assign(ext.size(), 0);
    auto sr6 = [](int64_t v) { return v >> 6; };
    for (int i = 1; i <= h; ++i)
      for (int j = 1; j <= w; ++j) {
        gx[size_t(i) * W2 + j] =
            sr6(ext[size_t(i) * W2 + j + 1]) - sr6(ext[size_t(i) * W2 + j - 1]);
        gy[size_t(i) * W2 + j] =
            sr6(ext[size_t(i + 1) * W2 + j]) - sr6(ext[size_t(i - 1) * W2 + j]);
      }
    for (auto* g : {&gx, &gy}) {
      auto& a = *g;
      for (int i = 1; i <= h; ++i) {
        a[size_t(i) * W2] = a[size_t(i) * W2 + 1];
        a[size_t(i) * W2 + w + 1] = a[size_t(i) * W2 + w];
      }
      for (int j = 0; j < W2; ++j) {
        a[j] = a[size_t(1) * W2 + j];
        a[size_t(h + 1) * W2 + j] = a[size_t(h) * W2 + j];
      }
    }
  }
  // BDOF with per-list source specs (plane, rh, rw, x, y, mv)
  struct BdofSrc {
    const int32_t* plane;
    int rh, rw, x, y, mvx, mvy;
  };
  void bdof_block_c(const BdofSrc& s0, const BdofSrc& s1, int w, int h,
                    bool alt, std::vector<int32_t>& out) const {
    std::vector<int64_t> e0, e1, gx0, gy0, gx1, gy1;
    bdof_ext_pred(s0.plane, s0.rh, s0.rw, s0.x, s0.y, w, h, s0.mvx, s0.mvy,
                  alt, e0);
    bdof_ext_pred(s1.plane, s1.rh, s1.rw, s1.x, s1.y, w, h, s1.mvx, s1.mvy,
                  alt, e1);
    bdof_gradients(e0, w, h, gx0, gy0);
    bdof_gradients(e1, w, h, gx1, gy1);
    int W2 = w + 2;
    for (auto* e : {&e0, &e1}) {
      auto& a = *e;
      for (int i = 1; i <= h; ++i) {
        a[size_t(i) * W2] = a[size_t(i) * W2 + 1];
        a[size_t(i) * W2 + w + 1] = a[size_t(i) * W2 + w];
      }
      for (int j = 0; j < W2; ++j) {
        a[j] = a[size_t(1) * W2 + j];
        a[size_t(h + 1) * W2 + j] = a[size_t(h) * W2 + j];
      }
    }
    int shift_num = 14 + 1 - pp.bit_depth;
    int64_t offset = (1LL << (shift_num - 1)) + 2 * (1 << 13);
    int maxval = (1 << pp.bit_depth) - 1;
    out.assign(size_t(w) * h, 0);
    const int LIM = 15;
    for (int yu = 0; yu < (h >> 2); ++yu)
      for (int xu = 0; xu < (w >> 2); ++xu) {
        int y0 = yu * 4, x0 = xu * 4;
        int64_t s_gx = 0, s_gy = 0, s_dix = 0, s_diy = 0, s_gygx = 0;
        for (int i = 0; i < 6; ++i)
          for (int j = 0; j < 6; ++j) {
            size_t p = size_t(y0 + i) * W2 + x0 + j;
            int64_t tgx = (gx0[p] + gx1[p]) >> 1;
            int64_t tgy = (gy0[p] + gy1[p]) >> 1;
            int64_t tdi = (e1[p] >> 4) - (e0[p] >> 4);
            int sx = tgx > 0 ? 1 : (tgx < 0 ? -1 : 0);
            int sy = tgy > 0 ? 1 : (tgy < 0 ? -1 : 0);
            s_gx += std::abs(tgx);
            s_gy += std::abs(tgy);
            s_dix += sx * tdi;
            s_diy += sy * tdi;
            s_gygx += sy * tgx;
          }
        int64_t vx = 0, vy = 0;
        if (s_gx != 0)
          vx = (4 * s_dix) >> (bit_length(int(s_gx)) - 1);
        vx = std::max<int64_t>(-LIM, std::min<int64_t>(LIM, vx));
        int64_t tmp = (s_gygx * vx) >> 1;
        if (s_gy != 0)
          vy = (4 * s_diy - tmp) >> (bit_length(int(s_gy)) - 1);
        vy = std::max<int64_t>(-LIM, std::min<int64_t>(LIM, vy));
        for (int i = 0; i < 4; ++i)
          for (int j = 0; j < 4; ++j) {
            size_t p = size_t(y0 + 1 + i) * W2 + x0 + 1 + j;
            int64_t b = vx * (gx0[p] - gx1[p]) + vy * (gy0[p] - gy1[p]);
            int64_t v = (e0[p] + e1[p] + b + offset) >> shift_num;
            out[size_t(y0 + i) * w + x0 + j] = int32_t(
                std::max<int64_t>(0, std::min<int64_t>(maxval, v)));
          }
      }
  }
  // non-DMVR BDOF luma prediction, <=16x16 sub-PUs (bdof_predict_luma)
  void bdof_pred_luma_c(const CuRec& cu, std::vector<int32_t>& out) const {
    out.assign(size_t(cu.w) * cu.h, 0);
    const int32_t* r0 = ic->ref_plane[0][cu.ref_idx[0]][0];
    const int32_t* r1 = ic->ref_plane[1][cu.ref_idx[1]][0];
    std::vector<int32_t> blk;
    for (int sy = 0; sy < cu.h; sy += 16)
      for (int sx = 0; sx < cu.w; sx += 16) {
        int bw = std::min(16, cu.w - sx), bh = std::min(16, cu.h - sy);
        BdofSrc a{r0, ic->pic_h, ic->pic_w, cu.x + sx, cu.y + sy,
                  cu.mv[0][0], cu.mv[0][1]};
        BdofSrc b{r1, ic->pic_h, ic->pic_w, cu.x + sx, cu.y + sy,
                  cu.mv[1][0], cu.mv[1][1]};
        bdof_block_c(a, b, bw, bh, cu.alt_hpel, blk);
        for (int i = 0; i < bh; ++i)
          std::memcpy(out.data() + size_t(sy + i) * cu.w + sx,
                      blk.data() + size_t(i) * bw, size_t(bw) * 4);
      }
  }
  // DMVR sub-PU with BDOF on top: padded-window spec construction
  // (ctu_syntax.py dmvr_predict BDOF branch)
  void dmvr_bdof_subpu(const CuRec& cu, int sy, int sx, int dx, int dy,
                       int bw, int bh, std::vector<int32_t>& blk,
                       std::vector<int32_t>& pad0,
                       std::vector<int32_t>& pad1) const {
    int bx = cu.x + sx, by = cu.y + sy;
    BdofSrc specs[2];
    std::vector<int32_t>* pads[2] = {&pad0, &pad1};
    for (int li = 0; li < 2; ++li) {
      int sign = li == 0 ? 1 : -1;
      const int32_t* ref = ic->ref_plane[li][cu.ref_idx[li]][0];
      int merge[2] = {cu.mv[li][0], cu.mv[li][1]};
      int rmv[2] = {
          std::max(MV_CLIP_MIN, std::min(MV_CLIP_MAX, merge[0] + sign * dx)),
          std::max(MV_CLIP_MIN, std::min(MV_CLIP_MAX, merge[1] + sign * dy))};
      int d_ix = (rmv[0] >> 4) - (merge[0] >> 4);
      int d_iy = (rmv[1] >> 4) - (merge[1] >> 4);
      if (d_ix == 0 && d_iy == 0) {
        int cmv[2];
        clip_mv_c2(rmv, bx, by, ic->pic_w, ic->pic_h, ic->ctu_size, cmv);
        specs[li] = {ref, ic->pic_h, ic->pic_w, bx, by, cmv[0], cmv[1]};
        continue;
      }
      // padded window (filt 8, ext 3, pad 2) with block-local coords
      const int filt = 8, ext = 3, pad = 2;
      int cmv0[2];
      clip_mv_c2(merge, bx, by, ic->pic_w, ic->pic_h, ic->ctu_size, cmv0);
      int x0 = bx + (cmv0[0] >> 4) - ext;
      int y0 = by + (cmv0[1] >> 4) - ext;
      int ww = bw + filt - 1, wh = bh + filt - 1;
      std::vector<int32_t>& padded = *pads[li];
      int pw2 = ww + 2 * pad, ph2 = wh + 2 * pad;
      padded.resize(size_t(ph2) * pw2);
      for (int i = 0; i < ph2; ++i) {
        int yy = std::min(std::max(y0 + std::min(std::max(i - pad, 0),
                                                 wh - 1), 0),
                          ic->pic_h - 1);
        for (int j = 0; j < pw2; ++j) {
          int xx = std::min(std::max(x0 + std::min(std::max(j - pad, 0),
                                                   ww - 1), 0),
                            ic->pic_w - 1);
          padded[size_t(i) * pw2 + j] = ref[size_t(yy) * ic->pic_w + xx];
        }
      }
      int rcl[2];
      clip_mv_c2(rmv, bx, by, ic->pic_w, ic->pic_h, ic->ctu_size, rcl);
      int fx = rcl[0] & 15, fy = rcl[1] & 15;
      specs[li] = {padded.data(), ph2, pw2, pad + ext + d_ix,
                   pad + ext + d_iy, fx, fy};
    }
    bdof_block_c(specs[0], specs[1], bw, bh, cu.alt_hpel, blk);
  }

  // -- GEO (codec/geo.py port) -----------------------------------------
  // uni-directional geo candidate list (getGeoMergeCandidates)
  void geo_merge_candidates_c(const std::vector<MI>& base,
                              std::vector<MI>& out) const {
    out.clear();
    for (size_t i = 0; i < base.size(); ++i) {
      int parity = int(i) & 1;
      for (int k = 0; k < 2; ++k) {
        int li = k == 0 ? parity : 1 - parity;
        if (base[i].ref[li] >= 0) {
          MI mi;
          mi.mv[li][0] = base[i].mv[li][0];
          mi.mv[li][1] = base[i].mv[li][1];
          mi.ref[li] = base[i].ref[li];
          out.push_back(mi);
          break;
        }
      }
      if (int(out.size()) == 6) break;
    }
  }
  // weighted blend of the two uni predictions (geo_blend + _weight_plane)
  void geo_pred_c(const CuRec& cu, int comp, std::vector<int32_t>& out) {
    geok::init_tables();
    int sc = comp == 0 ? 0 : 1;
    int w = cu.w >> sc, h = cu.h >> sc;
    int refw = ic->pic_w >> sc, refh = ic->pic_h >> sc;
    std::vector<int32_t> p0(size_t(w) * h), p1(size_t(w) * h);
    for (int k = 0; k < 2; ++k) {
      const MI& mi = cu.geo_mi[k];
      int li = mi.ref[0] >= 0 ? 0 : 1;
      vte_mc_block(ic->ref_plane[li][mi.ref[li]][comp], refh, refw,
                   cu.x >> sc, cu.y >> sc, w, h, mi.mv[li][0], mi.mv[li][1],
                   pp.bit_depth, comp == 0 ? 1 : 0, 1, 0,
                   nullptr, (k == 0 ? p0 : p1).data());
    }
    int ang = geok::g_params[cu.geo_split_dir][0];
    int widx = bit_length(cu.w) - 1 - 3, hidx = bit_length(cu.h) - 1 - 3;
    int ox = geok::g_offs[hidx][widx][cu.geo_split_dir][0];
    int oy = geok::g_offs[hidx][widx][cu.geo_split_dir][1];
    const int16_t(*mask)[geok::MASK_N] = geok::g_weights[geok::A2M[ang]];
    int mirror = geok::MIR[ang];
    int shift = std::max(2, 14 - pp.bit_depth) + 3;
    int64_t offset = (1LL << (shift - 1)) + (int64_t(1) << 13 << 3);
    int maxval = (1 << pp.bit_depth) - 1;
    out.resize(size_t(w) * h);
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j) {
        int yy = i << sc, xx = j << sc;
        int r, c;
        if (mirror == 2) {
          r = (geok::MASK_N - 1 - oy) - yy;
          c = ox + xx;
        } else if (mirror == 1) {
          r = oy + yy;
          c = (geok::MASK_N - 1 - ox) - xx;
        } else {
          r = oy + yy;
          c = ox + xx;
        }
        int64_t wv = mask[r][c];
        int64_t v = (wv * p0[size_t(i) * w + j] +
                     (8 - wv) * p1[size_t(i) * w + j] + offset) >> shift;
        out[size_t(i) * w + j] = int32_t(
            std::max<int64_t>(0, std::min<int64_t>(maxval, v)));
      }
  }
  // per-4x4 stored geo motion (geo_motion_grid) -> out[(h/4)*(w/4)] MIs
  void geo_motion_grid_c(const CuRec& cu, std::vector<MI>& out) const {
    geok::init_tables();
    const MI& mi0 = cu.geo_mi[0];
    const MI& mi1 = cu.geo_mi[1];
    int d0 = mi0.dir(), d1 = mi1.dir();
    MI bi;
    if (d0 == 1 && d1 == 2) {
      bi.mv[0][0] = mi0.mv[0][0];
      bi.mv[0][1] = mi0.mv[0][1];
      bi.mv[1][0] = mi1.mv[1][0];
      bi.mv[1][1] = mi1.mv[1][1];
      bi.ref[0] = mi0.ref[0];
      bi.ref[1] = mi1.ref[1];
    } else if (d0 == 2 && d1 == 1) {
      bi.mv[0][0] = mi1.mv[0][0];
      bi.mv[0][1] = mi1.mv[0][1];
      bi.mv[1][0] = mi0.mv[1][0];
      bi.mv[1][1] = mi0.mv[1][1];
      bi.ref[0] = mi1.ref[0];
      bi.ref[1] = mi0.ref[1];
    } else if (d0 == 1 && d1 == 1) {
      bi.mv[0][0] = mi1.mv[0][0];
      bi.mv[0][1] = mi1.mv[0][1];
      bi.ref[0] = mi1.ref[0];
    } else {
      bi.mv[1][0] = mi1.mv[1][0];
      bi.mv[1][1] = mi1.mv[1][1];
      bi.ref[1] = mi1.ref[1];
    }
    int ang = geok::g_params[cu.geo_split_dir][0];
    int dist = geok::g_params[cu.geo_split_dir][1];
    bool is_flip = 13 <= ang && ang <= 27;
    int dxa = ang, dya = (ang + 8) % 32;
    int ox = (-cu.w) >> 1, oy = (-cu.h) >> 1;
    if (dist > 0) {
      if (ang % 16 == 8 || (ang % 16 != 0 && cu.h >= cu.w))
        oy += ang < 16 ? (dist * cu.h) >> 3 : -((dist * cu.h) >> 3);
      else
        ox += ang < 16 ? (dist * cu.w) >> 3 : -((dist * cu.w) >> 3);
    }
    int nbx = cu.w / 4, nby = cu.h / 4;
    out.resize(size_t(nbx) * nby);
    for (int y2 = 0; y2 < nby; ++y2) {
      int luy = (2 * (4 * y2 + oy) + 5) * geok::DIS[dya];
      for (int x2 = 0; x2 < nbx; ++x2) {
        int midx = (2 * (4 * x2 + ox) + 5) * geok::DIS[dxa] + luy;
        int m = std::abs(midx) < 32
                    ? 2
                    : (midx <= 0 ? (1 - (is_flip ? 1 : 0))
                                 : (is_flip ? 1 : 0));
        out[size_t(y2) * nbx + x2] = m == 2 ? bi : (m == 0 ? mi0 : mi1);
      }
    }
  }
  // _apply_geo analog
  void apply_geo_c(CuRec& cu, const std::vector<MI>& merge_cands) {
    std::vector<MI> geo_cands;
    geo_merge_candidates_c(merge_cands, geo_cands);
    cu.geo_mi[0] = geo_cands[cu.geo_idx0];
    cu.geo_mi[1] = geo_cands[cu.geo_idx1];
  }

  // prediction of one component incl. DMVR/BDOF/GEO (pred_cu_inter
  // analog; LMCS outside the native scope)
  void pred_cu_inter_c(const CuRec& cu, int comp, std::vector<int32_t>& out) {
    if (cu.affine) {
      affine_pred_c(const_cast<CuRec&>(cu), comp, out);
      return;
    }
    if (cu.geo) {
      geo_pred_c(cu, comp, out);
      return;
    }
    if (cu.dmvr_set && !cu.dmvr.empty()) {
      dmvr_pred_c(cu, comp, out);
      return;
    }
    if (comp == 0 && cu.dmvr.empty() && bdof_applies_c(cu)) {
      bdof_pred_luma_c(cu, out);
      return;
    }
    inter_pred_c(cu, comp, out);
  }

  // =====================================================================
  // affine motion (codec/affine.py port): inheritance, merge/AMVP lists,
  // SbTMVP, sub-block MC + PROF, gradient CPMV search
  // =====================================================================
  struct AffInfo {
    int x, y, w, h, type;
    int cpmv[2][3][2];
    int dir;
    int ref[2];
    int bcw;
  };
  bool aff_at(int px, int py, AffInfo& out) const {
    if (px < 0 || py < 0 || px >= ic->uw * 4 || py >= ic->uh * 4)
      return false;
    size_t u = size_t(py >> 2) * ic->uw + (px >> 2);
    if (!ic->mf_aff_valid || !ic->mf_aff_valid[u]) return false;
    const int32_t* r = ic->mf_aff_data + u * 21;
    out.x = r[0];
    out.y = r[1];
    out.w = r[2];
    out.h = r[3];
    out.type = r[4];
    for (int li = 0; li < 2; ++li)
      for (int i = 0; i < 3; ++i) {
        out.cpmv[li][i][0] = r[5 + li * 6 + i * 2];
        out.cpmv[li][i][1] = r[5 + li * 6 + i * 2 + 1];
      }
    out.dir = r[17];
    out.ref[0] = r[18];
    out.ref[1] = r[19];
    out.bcw = r[20];
    return true;
  }
  static inline void round_affine_mv_c(int64_t vx, int64_t vy, int shift,
                                       int out[2]) {
    int64_t off = 1LL << (shift - 1);
    int64_t rx = (vx + off - (vx >= 0 ? 1 : 0)) >> shift;
    int64_t ry = (vy + off - (vy >= 0 ? 1 : 0)) >> shift;
    out[0] = int(rx);
    out[1] = int(ry);
  }
  static inline void clip_stor_c(int mv[2]) {
    mv[0] = std::max(MV_CLIP_MIN, std::min(MV_CLIP_MAX, mv[0]));
    mv[1] = std::max(MV_CLIP_MIN, std::min(MV_CLIP_MAX, mv[1]));
  }
  static inline void round_aff_amvr_c(int mv[2], int imv) {
    static const int SH[3] = {2, 0, 4};
    int sh = SH[imv];
    if (sh == 0) return;
    int off = 1 << (sh - 1);
    for (int k = 0; k < 2; ++k) {
      int v = mv[k];
      v = v >= 0 ? ((v + off - 1) >> sh) : ((v + off) >> sh);
      mv[k] = v << sh;
    }
  }
  // CU::xInheritedAffineMv (affine.py inherited_affine_mv)
  void inherited_affine_mv_c(const AffInfo& aff, int cx, int cy, int cw,
                             int ch, int li, bool cur_6p,
                             int out[3][2]) const {
    int nx = aff.x, ny = aff.y, nw = aff.w, nh = aff.h;
    int mv_lt[2] = {aff.cpmv[li][0][0], aff.cpmv[li][0][1]};
    int mv_rt[2] = {aff.cpmv[li][1][0], aff.cpmv[li][1][1]};
    int mv_lb[2] = {aff.cpmv[li][2][0], aff.cpmv[li][2][1]};
    bool top_ctu = false;
    if ((ny + nh) % ic->ctu_size == 0 && (ny + nh) == cy) {
      MI a, b;
      ic->mi_at(nx, ny + nh - 1, a);
      ic->mi_at(nx + nw - 1, ny + nh - 1, b);
      mv_lt[0] = a.mv[li][0];
      mv_lt[1] = a.mv[li][1];
      mv_rt[0] = b.mv[li][0];
      mv_rt[1] = b.mv[li][1];
      ny += nh;
      top_ctu = true;
    }
    const int shift = 7;  // MAX_CU_DEPTH
    int64_t dhx = int64_t(mv_rt[0] - mv_lt[0])
                  << (shift - (bit_length(nw) - 1));
    int64_t dhy = int64_t(mv_rt[1] - mv_lt[1])
                  << (shift - (bit_length(nw) - 1));
    int64_t dvx, dvy;
    if (aff.type == 1 && !top_ctu) {
      dvx = int64_t(mv_lb[0] - mv_lt[0]) << (shift - (bit_length(nh) - 1));
      dvy = int64_t(mv_lb[1] - mv_lt[1]) << (shift - (bit_length(nh) - 1));
    } else {
      dvx = -dhy;
      dvy = dhx;
    }
    int64_t base_x = int64_t(mv_lt[0]) << shift;
    int64_t base_y = int64_t(mv_lt[1]) << shift;
    auto at = [&](int px, int py, int o[2]) {
      int64_t hx = base_x + dhx * (px - nx) + dvx * (py - ny);
      int64_t vy = base_y + dhy * (px - nx) + dvy * (py - ny);
      round_affine_mv_c(hx, vy, shift, o);
      clip_stor_c(o);
    };
    at(cx, cy, out[0]);
    at(cx + cw, cy, out[1]);
    if (cur_6p)
      at(cx, cy + ch, out[2]);
    else {
      out[2][0] = out[2][1] = 0;
    }
  }
  // InterPredInterpolation::isSubblockVectorSpreadOverLimit
  static bool spread_over_limit(int64_t a, int64_t b, int64_t c, int64_t d,
                                int dir) {
    const int64_t s4 = 4 << 11;
    const int ft = 6;
    if (dir == 3) {
      int64_t rw = std::max<int64_t>(
                       {0, 4 * a + s4, 4 * c, 4 * a + 4 * c + s4}) -
                   std::min<int64_t>(
                       {0, 4 * a + s4, 4 * c, 4 * a + 4 * c + s4});
      int64_t rh = std::max<int64_t>(
                       {0, 4 * b, 4 * d + s4, 4 * b + 4 * d + s4}) -
                   std::min<int64_t>(
                       {0, 4 * b, 4 * d + s4, 4 * b + 4 * d + s4});
      rw = (rw >> 11) + ft + 3;
      rh = (rh >> 11) + ft + 3;
      return rw * rh > (ft + 9) * (ft + 9);
    }
    int64_t rw = std::max<int64_t>(0, 4 * a + s4) -
                 std::min<int64_t>(0, 4 * a + s4);
    int64_t rh = std::max<int64_t>(0, 4 * b) - std::min<int64_t>(0, 4 * b);
    if (((rw >> 11) + ft + 3) * ((rh >> 11) + ft + 3) >
        (ft + 9) * (ft + 5))
      return true;
    rw = std::max<int64_t>(0, 4 * c) - std::min<int64_t>(0, 4 * c);
    rh = std::max<int64_t>(0, 4 * d + s4) -
         std::min<int64_t>(0, 4 * d + s4);
    return ((rw >> 11) + ft + 3) * ((rh >> 11) + ft + 3) >
           (ft + 5) * (ft + 9);
  }
  // CU::setAllAffineMv sub-block MV grid (affine.py subblock_mv_grid)
  void subblock_mv_grid_c(const int cpmv[3][2], int x, int y, int w, int h,
                          int aff_type, int dir,
                          std::vector<int32_t>& grid, int64_t dhv[4],
                          bool* spread) const {
    (void)x;
    (void)y;
    const int shift = 7;
    int nbx = w / 4, nby = h / 4;
    grid.assign(size_t(nby) * nbx * 2, 0);
    bool same = cpmv[0][0] == cpmv[1][0] && cpmv[0][1] == cpmv[1][1] &&
                (aff_type == 0 || (cpmv[1][0] == cpmv[2][0] &&
                                   cpmv[1][1] == cpmv[2][1]));
    dhv[0] = dhv[1] = dhv[2] = dhv[3] = 0;
    *spread = false;
    if (same) {
      for (int i = 0; i < nby * nbx; ++i) {
        grid[size_t(i) * 2] = cpmv[0][0];
        grid[size_t(i) * 2 + 1] = cpmv[0][1];
      }
      return;
    }
    int64_t dhx = int64_t(cpmv[1][0] - cpmv[0][0])
                  << (shift - (bit_length(w) - 1));
    int64_t dhy = int64_t(cpmv[1][1] - cpmv[0][1])
                  << (shift - (bit_length(w) - 1));
    int64_t dvx, dvy;
    if (aff_type == 1) {
      dvx = int64_t(cpmv[2][0] - cpmv[0][0]) << (shift - (bit_length(h) - 1));
      dvy = int64_t(cpmv[2][1] - cpmv[0][1]) << (shift - (bit_length(h) - 1));
    } else {
      dvx = -dhy;
      dvy = dhx;
    }
    dhv[0] = dhx;
    dhv[1] = dhy;
    dhv[2] = dvx;
    dhv[3] = dvy;
    *spread = spread_over_limit(dhx, dhy, dvx, dvy, dir);
    int64_t base_x = int64_t(cpmv[0][0]) << shift;
    int64_t base_y = int64_t(cpmv[0][1]) << shift;
    for (int by = 0; by < nby; ++by)
      for (int bx = 0; bx < nbx; ++bx) {
        int64_t hx, vy;
        if (*spread) {
          hx = base_x + dhx * (w >> 1) + dvx * (h >> 1);
          vy = base_y + dhy * (w >> 1) + dvy * (h >> 1);
        } else {
          hx = base_x + dhx * (2 + bx * 4) + dvx * (2 + by * 4);
          vy = base_y + dhy * (2 + bx * 4) + dvy * (2 + by * 4);
        }
        int o[2];
        round_affine_mv_c(hx, vy, shift, o);
        clip_stor_c(o);
        grid[(size_t(by) * nbx + bx) * 2] = o[0];
        grid[(size_t(by) * nbx + bx) * 2 + 1] = o[1];
      }
  }
  // colocated probe with the SbTMVP strict-list variant
  bool colocated_sb(int list_idx, int px, int py, int out[2]) const {
    px &= ~7;
    py &= ~7;
    if (px < 0 || py < 0 || px >= ic->uw * 4 || py >= ic->uh * 4)
      return false;
    size_t u = size_t(py >> 2) * ic->uw + (px >> 2);
    if (!ic->col_valid[u]) return false;
    int col_list, col_ref;
    if (!ic->check_ldc) {
      col_list = list_idx;
      col_ref = ic->col_ref_at(u, col_list);
      if (col_ref < 0) return false;
    } else {
      col_list = list_idx;
      col_ref = ic->col_ref_at(u, col_list);
      if (col_ref < 0) {
        col_list = 1 - col_list;
        col_ref = ic->col_ref_at(u, col_list);
        if (col_ref < 0) return false;
      }
    }
    const int32_t* m = ic->col_mv + u * 4 + col_list * 2;
    int mv[2] = {round_mv_storage(m[0]), round_mv_storage(m[1])};
    int col_rp = ic->col_ref_poc[col_list][col_ref];
    int cur_rp = ic->ref_poc[list_idx][0];
    int scale = dist_scale_factor(ic->cur_poc, cur_rp, ic->col_poc, col_rp);
    if (scale == 4096) {
      out[0] = mv[0];
      out[1] = mv[1];
      return true;
    }
    scale_mv_c(mv, scale, out);
    return true;
  }
  static void clip_col_pos_c(int* px, int* py, int cux, int cuy, int ctu,
                             int pic_w, int pic_h) {
    int l2 = bit_length(ctu) - 1;
    int ctu_x = (cux >> l2) << l2, ctu_y = (cuy >> l2) << l2;
    int hor_max = std::min(pic_w - 1, ctu_x + ctu + 3);
    int ver_max = std::min(pic_h - 1, ctu_y + ctu - 1);
    *px = std::min(hor_max, std::max(ctu_x, *px));
    *py = std::min(ver_max, std::max(ctu_y, *py));
  }
  // CU::getInterMergeSbTMVPCand (affine.py sbtmvp_candidate).  Returns
  // false when unavailable; fills ctr + the 8x8 grid.
  bool sbtmvp_candidate_c(const CuRec& cu, const MI* first_mi, MI* ctr_out,
                          std::vector<MI>& grid, int* pw_out,
                          int* ph_out) const {
    if (!ic->col_valid) return false;
    int col_poc = ic->col_poc;
    int tmv[2] = {0, 0};
    if (first_mi != nullptr) {
      int r0 = first_mi->ref[0];
      if (r0 >= 0 && ic->ref_poc[0][r0] == col_poc) {
        tmv[0] = first_mi->mv[0][0];
        tmv[1] = first_mi->mv[0][1];
      } else if (ic->is_b) {
        int r1 = first_mi->ref[1];
        if (r1 >= 0 && ic->ref_poc[1][r1] == col_poc) {
          tmv[0] = first_mi->mv[1][0];
          tmv[1] = first_mi->mv[1][1];
        }
      }
    }
    int tix = (tmv[0] + (8 - (tmv[0] >= 0 ? 1 : 0))) >> 4;
    int tiy = (tmv[1] + (8 - (tmv[1] >= 0 ? 1 : 0))) >> 4;
    int n_lists = ic->is_b ? 2 : 1;
    int cx = cu.x + (cu.w >> 1) + tix;
    int cy = cu.y + (cu.h >> 1) + tiy;
    clip_col_pos_c(&cx, &cy, cu.x, cu.y, ic->ctu_size, ic->pic_w,
                   ic->pic_h);
    cx &= ~7;
    cy &= ~7;
    {
      size_t u = size_t(cy >> 2) * ic->uw + (cx >> 2);
      if (cx < 0 || cy < 0 || cx >= ic->uw * 4 || cy >= ic->uh * 4 ||
          !ic->col_valid[u])
        return false;
    }
    int ctr_mv[2][2];
    bool have_ctr[2] = {false, false};
    for (int li = 0; li < n_lists; ++li)
      have_ctr[li] = colocated_sb(li, cx, cy, ctr_mv[li]);
    if (!have_ctr[0] && !have_ctr[1]) return false;
    MI ctr;
    for (int li = 0; li < 2; ++li)
      if (li < n_lists && have_ctr[li]) {
        ctr.mv[li][0] = ctr_mv[li][0];
        ctr.mv[li][1] = ctr_mv[li][1];
        ctr.ref[li] = 0;
      }
    *ctr_out = ctr;
    int pw = cu.w > 8 ? 8 : cu.w;
    int ph = cu.h > 8 ? 8 : cu.h;
    int x_off = (pw >> 1) + tix;
    int y_off = (ph >> 1) + tiy;
    int nbx = std::max(1, cu.w / pw);
    int nby = std::max(1, cu.h / ph);
    grid.assign(size_t(nbx) * nby, MI());
    bool restricted = cu.w + cu.h == 12;
    for (int by = 0; by < nby; ++by)
      for (int bx = 0; bx < nbx; ++bx) {
        int px = cu.x + bx * pw + x_off;
        int py = cu.y + by * ph + y_off;
        clip_col_pos_c(&px, &py, cu.x, cu.y, ic->ctu_size, ic->pic_w,
                       ic->pic_h);
        px &= ~7;
        py &= ~7;
        int mv[2][2];
        bool have[2] = {false, false};
        size_t u = size_t(py >> 2) * ic->uw + (px >> 2);
        bool col_ok = px >= 0 && py >= 0 && px < ic->uw * 4 &&
                      py < ic->uh * 4 && ic->col_valid[u];
        if (col_ok)
          for (int li = 0; li < n_lists; ++li)
            have[li] = colocated_sb(li, px, py, mv[li]);
        MI mi;
        if (!have[0] && !have[1]) {
          mi = ctr;
        } else {
          for (int li = 0; li < 2; ++li)
            if (li < n_lists && have[li]) {
              mi.mv[li][0] = mv[li][0];
              mi.mv[li][1] = mv[li][1];
              mi.ref[li] = 0;
            }
        }
        if (restricted && mi.dir() == 3) {
          mi.ref[1] = -1;
          mi.mv[1][0] = mi.mv[1][1] = 0;
        }
        grid[size_t(by) * nbx + bx] = mi;
      }
    *pw_out = pw;
    *ph_out = ph;
    return true;
  }
  // affine merge candidate (affine.py AffineMergeCand)
  struct AffMergeCand {
    int dir = 0;
    int aff_type = 0;
    int cpmv[2][3][2] = {};
    int ref[2] = {-1, -1};
    int bcw = 2;
    bool is_sbtmvp = false;
    MI sb_ctr;  // unused
    std::vector<MI> sb_grid;
    int sb_pw = 8, sb_ph = 8;
  };
  // CU::getAffineControlPointCand (affine.py _ctrl_point_cand)
  void ctrl_point_cand_c(const CuRec& cu, const MI mi[4],
                         const bool avail[4], const int* ver_idx, int bcw,
                         int model_idx, int ver_num,
                         std::vector<AffMergeCand>& out) const {
    const int shift = 7;
    int shift_htow = shift + (bit_length(cu.w) - 1) - (bit_length(cu.h) - 1);
    int ref_idx[2] = {-1, -1};
    int direction = 0;
    for (int i = 0; i < ver_num; ++i)
      if (!avail[ver_idx[i]]) return;
    for (int li = 0; li < 2; ++li) {
      int r0 = mi[ver_idx[0]].ref[li];
      bool all_same = r0 >= 0;
      for (int i = 1; i < ver_num; ++i)
        all_same &= mi[ver_idx[i]].ref[li] == r0;
      if (all_same) {
        direction |= li + 1;
        ref_idx[li] = r0;
      }
    }
    if (direction == 0) return;
    int cmv[2][4][2] = {};
    for (int li = 0; li < 2; ++li) {
      if (!(direction & (li + 1))) continue;
      for (int i = 0; i < ver_num; ++i) {
        cmv[li][ver_idx[i]][0] = mi[ver_idx[i]].mv[li][0];
        cmv[li][ver_idx[i]][1] = mi[ver_idx[i]].mv[li][1];
      }
      int(*m)[2] = cmv[li];
      if (model_idx == 1) {
        m[2][0] = m[3][0] + m[0][0] - m[1][0];
        m[2][1] = m[3][1] + m[0][1] - m[1][1];
        clip_stor_c(m[2]);
      } else if (model_idx == 2) {
        m[1][0] = m[3][0] + m[0][0] - m[2][0];
        m[1][1] = m[3][1] + m[0][1] - m[2][1];
        clip_stor_c(m[1]);
      } else if (model_idx == 3) {
        m[0][0] = m[1][0] + m[2][0] - m[3][0];
        m[0][1] = m[1][1] + m[2][1] - m[3][1];
        clip_stor_c(m[0]);
      } else if (model_idx == 5) {
        int64_t vx = (int64_t(m[0][0]) << shift) +
                     (int64_t(m[2][1] - m[0][1]) << shift_htow);
        int64_t vy = (int64_t(m[0][1]) << shift) -
                     (int64_t(m[2][0] - m[0][0]) << shift_htow);
        round_affine_mv_c(vx, vy, shift, m[1]);
        clip_stor_c(m[1]);
      }
    }
    AffMergeCand cand;
    cand.dir = direction;
    cand.aff_type = (ver_num == 2) ? 0 : 1;
    for (int li = 0; li < 2; ++li)
      for (int i = 0; i < 3; ++i) {
        cand.cpmv[li][i][0] = cmv[li][i][0];
        cand.cpmv[li][i][1] = cmv[li][i][1];
      }
    cand.ref[0] = ref_idx[0];
    cand.ref[1] = ref_idx[1];
    cand.bcw = direction == 3 ? bcw : 2;
    out.push_back(cand);
  }
  // CU::getAffineMergeCand (affine.py affine_merge_list)
  void affine_merge_list_c(const CuRec& cu, int max_cands, int mrg_idx,
                           std::vector<AffMergeCand>& cands) const {
    cands.clear();
    int lbx = cu.x, lby = cu.y + cu.h - 1;
    int ltx = cu.x, lty = cu.y;
    int rtx = cu.x + cu.w - 1, rty = cu.y;
    auto done = [&]() {
      return int(cands.size()) >= max_cands ||
             (mrg_idx >= 0 && int(cands.size()) > mrg_idx);
    };
    if (ic->sbtmvp_active) {
      MI a1;
      bool has_a1 = avail_inter(lbx - 1, lby, a1);
      MI ctr;
      std::vector<MI> grid;
      int pw, ph;
      if (sbtmvp_candidate_c(cu, has_a1 ? &a1 : nullptr, &ctr, grid, &pw,
                             &ph)) {
        AffMergeCand c;
        c.dir = ctr.dir();
        c.aff_type = 2;
        for (int li = 0; li < 2; ++li)
          for (int i = 0; i < 3; ++i) {
            c.cpmv[li][i][0] = ctr.mv[li][0];
            c.cpmv[li][i][1] = ctr.mv[li][1];
          }
        c.ref[0] = ctr.ref[0];
        c.ref[1] = ctr.ref[1];
        c.is_sbtmvp = true;
        c.sb_grid = std::move(grid);
        c.sb_pw = pw;
        c.sb_ph = ph;
        cands.push_back(std::move(c));
        if (done()) return;
      }
    }
    if (ic->affine_en) {
      // inherited: one from the left group, one from the above group
      AffInfo nbs[2];
      int n_nbs = 0;
      {
        AffInfo aff;
        if (aff_at(lbx - 1, lby + 1, aff) && is_coded_at(lbx - 1, lby + 1))
          nbs[n_nbs++] = aff;
        else if (aff_at(lbx - 1, lby, aff) && is_coded_at(lbx - 1, lby))
          nbs[n_nbs++] = aff;
      }
      {
        AffInfo aff;
        if (aff_at(rtx + 1, rty - 1, aff) && is_coded_at(rtx + 1, rty - 1))
          nbs[n_nbs++] = aff;
        else if (aff_at(rtx, rty - 1, aff) && is_coded_at(rtx, rty - 1))
          nbs[n_nbs++] = aff;
        else if (aff_at(ltx - 1, lty - 1, aff) &&
                 is_coded_at(ltx - 1, lty - 1))
          nbs[n_nbs++] = aff;
      }
      for (int k = 0; k < n_nbs; ++k) {
        const AffInfo& aff = nbs[k];
        AffMergeCand c;
        c.dir = aff.dir;
        c.aff_type = aff.type;
        for (int li = 0; li < 2; ++li) {
          bool use = li == 0 ? (aff.dir != 2) : (ic->is_b && aff.dir != 1);
          if (use) {
            int out[3][2];
            inherited_affine_mv_c(aff, cu.x, cu.y, cu.w, cu.h, li,
                                  aff.type == 1, out);
            for (int i = 0; i < 3; ++i) {
              c.cpmv[li][i][0] = out[i][0];
              c.cpmv[li][i][1] = out[i][1];
            }
          }
        }
        c.ref[0] = aff.ref[0];
        c.ref[1] = aff.ref[1];
        c.bcw = aff.bcw;
        cands.push_back(c);
        if (done()) return;
      }
      // constructed candidates from corner motion
      MI mi[4];
      bool avail[4] = {false, false, false, false};
      int nb_bcw[2] = {2, 2};
      {
        MI m;
        if (avail_inter(ltx - 1, lty - 1, m) ||
            avail_inter(ltx, lty - 1, m) || avail_inter(ltx - 1, lty, m)) {
          avail[0] = true;
          mi[0] = m;
          nb_bcw[0] = m.bcw;
        }
      }
      {
        MI m;
        if (avail_inter(rtx, rty - 1, m) ||
            avail_inter(rtx + 1, rty - 1, m)) {
          avail[1] = true;
          mi[1] = m;
          nb_bcw[1] = m.bcw;
        }
      }
      {
        MI m;
        if (avail_inter(lbx - 1, lby, m) ||
            avail_inter(lbx - 1, lby + 1, m)) {
          avail[2] = true;
          mi[2] = m;
        }
      }
      if (ic->col_valid) {
        int rbx = cu.x + cu.w - 4, rby = cu.y + cu.h - 4;
        if (rbx + 4 < ic->pic_w && rby + 4 < ic->pic_h &&
            (rby & (ic->ctu_size - 1)) + 4 < ic->ctu_size) {
          int mv0[2], mv1[2];
          bool h0 = ic->colocated_mvp(0, rbx + 4, rby + 4, 0, mv0);
          bool h1 = ic->is_b && ic->colocated_mvp(1, rbx + 4, rby + 4, 0,
                                                  mv1);
          if (h0 || h1) {
            avail[3] = true;
            MI m;
            if (h0) {
              m.mv[0][0] = mv0[0];
              m.mv[0][1] = mv0[1];
              m.ref[0] = 0;
            }
            if (h1) {
              m.mv[1][0] = mv1[0];
              m.mv[1][1] = mv1[1];
              m.ref[1] = 0;
            }
            mi[3] = m;
          }
        }
      }
      static const int MODEL[6][3] = {{0, 1, 2}, {0, 1, 3}, {0, 2, 3},
                                      {1, 2, 3}, {0, 1, 0}, {0, 2, 0}};
      static const int VER_NUM[6] = {3, 3, 3, 3, 2, 2};
      int start = ic->affine_type_en ? 0 : 4;
      for (int m_idx = start; m_idx < 6; ++m_idx) {
        int vi[4] = {MODEL[m_idx][0], MODEL[m_idx][1], MODEL[m_idx][2], 0};
        ctrl_point_cand_c(cu, mi, avail, vi,
                          m_idx == 3 ? nb_bcw[1] : nb_bcw[0], m_idx,
                          VER_NUM[m_idx], cands);
        if (done()) return;
      }
    }
    // zero padding
    while (int(cands.size()) < max_cands) {
      AffMergeCand c;
      if (ic->is_b) {
        c.dir = 3;
        c.ref[0] = 0;
        c.ref[1] = 0;
      } else {
        c.dir = 1;
        c.ref[0] = 0;
      }
      cands.push_back(c);
      if (done()) break;
    }
  }
  // 6-tap affine luma filter (affine.py AFFINE_LUMA_FILTER, 8-wide)
  static const int32_t* affine_taps() {
    static const int32_t T[16][8] = {
        {0, 0, 0, 64, 0, 0, 0, 0},      {0, 1, -3, 63, 4, -2, 1, 0},
        {0, 1, -5, 62, 8, -3, 1, 0},    {0, 2, -8, 60, 13, -4, 1, 0},
        {0, 3, -10, 58, 17, -5, 1, 0},  {0, 3, -11, 52, 26, -8, 2, 0},
        {0, 2, -9, 47, 31, -10, 3, 0},  {0, 3, -11, 45, 34, -10, 3, 0},
        {0, 3, -11, 40, 40, -11, 3, 0}, {0, 3, -10, 34, 45, -11, 3, 0},
        {0, 3, -10, 31, 47, -9, 2, 0},  {0, 2, -8, 26, 52, -11, 3, 0},
        {0, 1, -5, 17, 58, -10, 3, 0},  {0, 1, -4, 13, 60, -8, 2, 0},
        {0, 1, -3, 8, 62, -5, 1, 0},    {0, 1, -2, 4, 63, -3, 1, 0}};
    return &T[0][0];
  }
  // affine MC of one list/component incl. PROF (affine_predict_list)
  void affine_pred_list_c(const CuRec& cu, int li, int comp,
                          bool intermediate, std::vector<int64_t>& out) {
    const int32_t* ref = ic->ref_plane[li][cu.ref_idx[li]][comp];
    int bd = pp.bit_depth;
    int sc = comp == 0 ? 0 : 1;
    const std::vector<int32_t>& grid = cu.aff_grid[li];
    const int64_t* dhv = cu.aff_dhv[li];
    bool spread = cu.aff_spread[li];
    int refw = ic->pic_w >> sc, refh = ic->pic_h >> sc;
    int hor_max = (ic->pic_w + 8 - cu.x - 1) << 4;
    int hor_min = (-ic->ctu_size - 8 - cu.x + 1) << 4;
    int ver_max = (ic->pic_h + 8 - cu.y - 1) << 4;
    int ver_min = (-ic->ctu_size - 8 - cu.y + 1) << 4;
    int cw = cu.w >> sc, ch = cu.h >> sc;
    int nbx = cu.w / 4;
    bool same_cp =
        cu.cpmv[li][0][0] == cu.cpmv[li][1][0] &&
        cu.cpmv[li][0][1] == cu.cpmv[li][1][1] &&
        (cu.affine_type == 0 || (cu.cpmv[li][0][0] == cu.cpmv[li][2][0] &&
                                 cu.cpmv[li][0][1] == cu.cpmv[li][2][1]));
    bool enable_prof = comp == 0 && ic->prof_en && !cu.sbtmvp && !same_cp &&
                       !spread;
    bool is_last = !intermediate && !enable_prof;
    out.assign(size_t(cw) * ch, 0);
    int shift_num = std::max(2, 14 - bd);
    int64_t prof_off = (1LL << (shift_num - 1)) + (1 << 13);
    int64_t di_lim = 1LL << std::max(bd + 1, 13);
    int maxval = (1 << bd) - 1;
    // PROF per-pixel dMv grid (shared by all 4x4 sub-blocks)
    int64_t dmx[16], dmy[16];
    if (enable_prof) {
      int64_t qhx = 4 * dhv[0], qhy = 4 * dhv[1];
      int64_t qvx = 4 * dhv[2], qvy = 4 * dhv[3];
      int64_t mx[16], my[16];
      mx[0] = ((dhv[0] + dhv[2]) * 2) - ((qhx + qvx) * 2);
      my[0] = ((dhv[1] + dhv[3]) * 2) - ((qhy + qvy) * 2);
      for (int j = 1; j < 4; ++j) {
        mx[j] = mx[j - 1] + qhx;
        my[j] = my[j - 1] + qhy;
      }
      for (int i = 1; i < 4; ++i)
        for (int j = 0; j < 4; ++j) {
          mx[i * 4 + j] = mx[(i - 1) * 4 + j] + qvx;
          my[i * 4 + j] = my[(i - 1) * 4 + j] + qvy;
        }
      for (int k = 0; k < 16; ++k) {
        int64_t vx = mx[k], vy = my[k];
        vx = (vx + 128 - (vx >= 0 ? 1 : 0)) >> 8;
        vy = (vy + 128 - (vy >= 0 ? 1 : 0)) >> 8;
        dmx[k] = std::max<int64_t>(-31, std::min<int64_t>(31, vx));
        dmy[k] = std::max<int64_t>(-31, std::min<int64_t>(31, vy));
      }
    }
    std::vector<int32_t> pred(16);
    for (int by = 0; by < ch; by += 4)
      for (int bx = 0; bx < cw; bx += 4) {
        int mvx, mvy;
        if (comp == 0) {
          mvx = grid[(size_t(by >> 2) * nbx + (bx >> 2)) * 2];
          mvy = grid[(size_t(by >> 2) * nbx + (bx >> 2)) * 2 + 1];
        } else {
          const int32_t* a = &grid[(size_t(by >> 1) * nbx + (bx >> 1)) * 2];
          const int32_t* b =
              &grid[(size_t((by >> 1) + 1) * nbx + (bx >> 1) + 1) * 2];
          int o[2];
          round_affine_mv_c(int64_t(a[0]) + b[0], int64_t(a[1]) + b[1], 1,
                            o);
          mvx = o[0];
          mvy = o[1];
        }
        mvx = std::max(hor_min, std::min(hor_max, mvx));
        mvy = std::max(ver_min, std::min(ver_max, mvy));
        int px = (cu.x >> sc) + bx, py = (cu.y >> sc) + by;
        vte_mc_block(ref, refh, refw, px, py, 4, 4, mvx, mvy, bd,
                     comp == 0 ? 1 : 0,
                     (intermediate || enable_prof) ? 1 : 0, 0,
                     comp == 0 ? affine_taps() : nullptr, pred.data());
        if (enable_prof) {
          int fx = mvx & 15, fy = mvy & 15;
          int xo = fx >> 3, yo = fy >> 3;
          int xi = px + (mvx >> 4), yi = py + (mvy >> 4);
          int sh = shift_num;
          auto iw = [&](int xx, int yy) -> int64_t {
            int cxx = std::min(std::max(xx, 0), refw - 1);
            int cyy = std::min(std::max(yy, 0), refh - 1);
            return (int64_t(ref[size_t(cyy) * refw + cxx]) << sh) -
                   (1 << 13);
          };
          // 6x6 ext: pred core + integer ring
          int64_t ext[6][6];
          for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j)
              ext[i + 1][j + 1] = pred[size_t(i) * 4 + j];
          for (int j = 0; j < 6; ++j) {
            ext[0][j] = iw(xi + xo - 1 + j, yi + yo - 1);
            ext[5][j] = iw(xi + xo - 1 + j, yi + yo + 4);
          }
          for (int i = 0; i < 4; ++i) {
            ext[i + 1][0] = iw(xi + xo - 1, yi + yo + i);
            ext[i + 1][5] = iw(xi + xo + 4, yi + yo + i);
          }
          for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j) {
              int64_t gx = (ext[i + 1][j + 2] >> 6) - (ext[i + 1][j] >> 6);
              int64_t gy = (ext[i + 2][j + 1] >> 6) - (ext[i][j + 1] >> 6);
              int64_t di = dmx[i * 4 + j] * gx + dmy[i * 4 + j] * gy;
              di = std::max(-di_lim, std::min(di_lim - 1, di));
              int64_t refined = pred[size_t(i) * 4 + j] + di;
              if (!intermediate)
                refined = std::max<int64_t>(
                    0, std::min<int64_t>(maxval,
                                         (refined + prof_off) >> shift_num));
              out[size_t(by + i) * cw + bx + j] = refined;
            }
        } else {
          for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j)
              out[size_t(by + i) * cw + bx + j] = pred[size_t(i) * 4 + j];
        }
      }
    (void)is_last;
  }
  // SbTMVP MC: per-8x8 translational prediction (sbtmvp_predict)
  void sbtmvp_pred_c(const CuRec& cu, int comp, std::vector<int32_t>& out) {
    int sc = comp == 0 ? 0 : 1;
    int w = cu.w >> sc, h = cu.h >> sc;
    out.assign(size_t(w) * h, 0);
    int pw = cu.sb_pw, ph = cu.sb_ph;
    int nbx = std::max(1, cu.w / pw);
    int refw = ic->pic_w >> sc, refh = ic->pic_h >> sc;
    std::vector<int32_t> blk, a, b;
    for (int by = 0; by * ph < cu.h; ++by)
      for (int bx = 0; bx * pw < cu.w; ++bx) {
        const MI& mi = cu.sb_grid[size_t(by) * nbx + bx];
        int x = (cu.x + bx * pw) >> sc, y = (cu.y + by * ph) >> sc;
        int bw = pw >> sc, bh = ph >> sc;
        blk.resize(size_t(bw) * bh);
        if (mi.ref[0] >= 0 && mi.ref[1] >= 0) {
          a.resize(size_t(bw) * bh);
          b.resize(size_t(bw) * bh);
          vte_mc_block(ic->ref_plane[0][mi.ref[0]][comp], refh, refw, x, y,
                       bw, bh, mi.mv[0][0], mi.mv[0][1], pp.bit_depth,
                       comp == 0 ? 1 : 0, 1, 0, nullptr, a.data());
          vte_mc_block(ic->ref_plane[1][mi.ref[1]][comp], refh, refw, x, y,
                       bw, bh, mi.mv[1][0], mi.mv[1][1], pp.bit_depth,
                       comp == 0 ? 1 : 0, 1, 0, nullptr, b.data());
          std::vector<int32_t> tmp(size_t(bw) * bh);
          bi_avg(a, b, tmp);
          blk = tmp;
        } else {
          int li = mi.ref[0] >= 0 ? 0 : 1;
          vte_mc_block(ic->ref_plane[li][mi.ref[li]][comp], refh, refw, x,
                       y, bw, bh, mi.mv[li][0], mi.mv[li][1], pp.bit_depth,
                       comp == 0 ? 1 : 0, 0, 0, nullptr, blk.data());
        }
        for (int i = 0; i < bh; ++i)
          std::memcpy(out.data() + size_t((by * ph >> sc) + i) * w +
                          (bx * pw >> sc),
                      blk.data() + size_t(i) * bw, size_t(bw) * 4);
      }
  }
  // full affine CU prediction (affine_predict): uni/bi + bi average
  void derive_affine_grids_c(CuRec& cu) {
    for (int li = 0; li < 2; ++li) {
      cu.aff_grid[li].clear();
      cu.aff_spread[li] = false;
      if (cu.ref_idx[li] < 0) continue;
      int cp[3][2];
      for (int i = 0; i < 3; ++i) {
        cp[i][0] = cu.cpmv[li][i][0];
        cp[i][1] = cu.cpmv[li][i][1];
      }
      int dir = (cu.ref_idx[0] >= 0 ? 1 : 0) | (cu.ref_idx[1] >= 0 ? 2 : 0);
      subblock_mv_grid_c(cp, cu.x, cu.y, cu.w, cu.h, cu.affine_type, dir,
                         cu.aff_grid[li], cu.aff_dhv[li],
                         &cu.aff_spread[li]);
    }
    // per-4x4 MotionInfo grid for the motion field
    int nbx = cu.w / 4, nby = cu.h / 4;
    cu.sub_mi.assign(size_t(nbx) * nby, MI());
    for (int by = 0; by < nby; ++by)
      for (int bx = 0; bx < nbx; ++bx) {
        MI mi;
        for (int li = 0; li < 2; ++li)
          if (!cu.aff_grid[li].empty()) {
            mi.mv[li][0] = cu.aff_grid[li][(size_t(by) * nbx + bx) * 2];
            mi.mv[li][1] = cu.aff_grid[li][(size_t(by) * nbx + bx) * 2 + 1];
          }
        mi.ref[0] = int8_t(cu.ref_idx[0]);
        mi.ref[1] = int8_t(cu.ref_idx[1]);
        mi.bcw = int8_t(cu.bcw);
        cu.sub_mi[size_t(by) * nbx + bx] = mi;
      }
  }
  void affine_pred_c(CuRec& cu, int comp, std::vector<int32_t>& out) {
    if (cu.sbtmvp) {
      sbtmvp_pred_c(cu, comp, out);
      return;
    }
    int sc = comp == 0 ? 0 : 1;
    int w = cu.w >> sc, h = cu.h >> sc;
    bool bi = cu.ref_idx[0] >= 0 && cu.ref_idx[1] >= 0;
    std::vector<int64_t> a64, b64;
    if (bi) {
      affine_pred_list_c(cu, 0, comp, true, a64);
      affine_pred_list_c(cu, 1, comp, true, b64);
      out.resize(size_t(w) * h);
      int shift = std::max(2, 14 - pp.bit_depth) + 1;
      int64_t offset = (1LL << (shift - 1)) + 2 * (1 << 13);
      int maxval = (1 << pp.bit_depth) - 1;
      for (size_t i = 0; i < out.size(); ++i) {
        int64_t v = (a64[i] + b64[i] + offset) >> shift;
        out[i] = int32_t(std::max<int64_t>(0, std::min<int64_t>(maxval, v)));
      }
      return;
    }
    int li = cu.ref_idx[0] >= 0 ? 0 : 1;
    affine_pred_list_c(cu, li, comp, false, a64);
    out.assign(a64.begin(), a64.end());
  }
  // _apply_affine_merge analog (derives cpmv/grids for merge_idx)
  void apply_affine_merge_c(CuRec& cu) {
    std::vector<AffMergeCand> cands;
    affine_merge_list_c(cu, ic->max_aff_merge, cu.merge_idx, cands);
    const AffMergeCand& cand = cands[cu.merge_idx];
    cu.ref_idx[0] = cand.ref[0];
    cu.ref_idx[1] = cand.ref[1];
    cu.bcw = cand.bcw;
    std::memcpy(cu.cpmv, cand.cpmv, sizeof(cu.cpmv));
    cu.affine_type = cand.is_sbtmvp ? 0 : cand.aff_type;
    if (cand.is_sbtmvp) {
      cu.sbtmvp = true;
      cu.sb_grid = cand.sb_grid;
      cu.sb_pw = cand.sb_pw;
      cu.sb_ph = cand.sb_ph;
      // per-4x4 spanning grid from the 8x8 SbTMVP sub-blocks
      int nbx4 = cu.w / 4, nby4 = cu.h / 4;
      int nbx8 = std::max(1, cu.w / cu.sb_pw);
      cu.sub_mi.assign(size_t(nbx4) * nby4, MI());
      for (int uy = 0; uy < nby4; ++uy)
        for (int ux = 0; ux < nbx4; ++ux)
          cu.sub_mi[size_t(uy) * nbx4 + ux] =
              cu.sb_grid[size_t(uy * 4 / cu.sb_ph) * nbx8 +
                         (ux * 4 / cu.sb_pw)];
    } else {
      derive_affine_grids_c(cu);
    }
  }

  // -- affine AMVP (fillAffineMvpCand) + gradient search ---------------
  bool mvp_cand_unscaled_c(int li, int ref_idx, int px, int py,
                           int out[2]) const {
    MI mi;
    if (!avail_inter(px, py, mi)) return false;
    int cur_poc = ic->ref_poc[li][ref_idx];
    for (int k = 0; k < 2; ++k) {
      int src = k == 0 ? li : 1 - li;
      int r = mi.ref[src];
      if (r >= 0 && r < ic->n_ref[src] && ic->ref_poc[src][r] == cur_poc) {
        out[0] = mi.mv[src][0];
        out[1] = mi.mv[src][1];
        return true;
      }
    }
    return false;
  }
  bool add_aff_amvp_unscaled(const CuRec& cu, int li, int ref_idx, int px,
                             int py, std::vector<std::array<int, 6>>& out)
      const {
    AffInfo aff;
    if (!is_coded_at(px, py) || !aff_at(px, py, aff)) return false;
    int cur_poc = ic->ref_poc[li][ref_idx];
    for (int k = 0; k < 2; ++k) {
      int src = k == 0 ? li : 1 - li;
      if (!(aff.dir & (src + 1))) continue;
      int r = aff.ref[src];
      if (r < 0 || r >= ic->n_ref[src] || ic->ref_poc[src][r] != cur_poc)
        continue;
      int mvs[3][2];
      inherited_affine_mv_c(aff, cu.x, cu.y, cu.w, cu.h, src,
                            cu.affine_type == 1, mvs);
      std::array<int, 6> row;
      for (int i = 0; i < 3; ++i) {
        int m[2] = {mvs[i][0], mvs[i][1]};
        round_aff_amvr_c(m, cu.imv);
        row[i * 2] = m[0];
        row[i * 2 + 1] = m[1];
      }
      out.push_back(row);
      return true;
    }
    return false;
  }
  // returns 2 CPMV triples as flat {x0,y0,x1,y1,x2,y2} rows
  void affine_amvp_list_c(const CuRec& cu, int li, int ref_idx,
                          std::vector<std::array<int, 6>>& cands) const {
    cands.clear();
    int ltx = cu.x, lty = cu.y;
    int rtx = cu.x + cu.w - 1, rty = cu.y;
    int lbx = cu.x, lby = cu.y + cu.h - 1;
    if (!add_aff_amvp_unscaled(cu, li, ref_idx, lbx - 1, lby + 1, cands))
      add_aff_amvp_unscaled(cu, li, ref_idx, lbx - 1, lby, cands);
    if (!add_aff_amvp_unscaled(cu, li, ref_idx, rtx + 1, rty - 1, cands))
      if (!add_aff_amvp_unscaled(cu, li, ref_idx, rtx, rty - 1, cands))
        add_aff_amvp_unscaled(cu, li, ref_idx, ltx - 1, lty - 1, cands);
    if (int(cands.size()) >= 2) {
      cands.resize(2);
      return;
    }
    // constructed from per-corner translational neighbors
    int v[3][2];
    bool have[3] = {false, false, false};
    {
      const int ps3[3][2] = {{ltx - 1, lty - 1}, {ltx, lty - 1},
                             {ltx - 1, lty}};
      for (int k = 0; k < 3 && !have[0]; ++k)
        have[0] = mvp_cand_unscaled_c(li, ref_idx, ps3[k][0], ps3[k][1],
                                      v[0]);
    }
    {
      const int ps2[2][2] = {{rtx, rty - 1}, {rtx + 1, rty - 1}};
      for (int k = 0; k < 2 && !have[1]; ++k)
        have[1] = mvp_cand_unscaled_c(li, ref_idx, ps2[k][0], ps2[k][1],
                                      v[1]);
    }
    {
      const int ps2[2][2] = {{lbx - 1, lby}, {lbx - 1, lby + 1}};
      for (int k = 0; k < 2 && !have[2]; ++k)
        have[2] = mvp_cand_unscaled_c(li, ref_idx, ps2[k][0], ps2[k][1],
                                      v[2]);
    }
    int pattern = (have[0] ? 1 : 0) | (have[1] ? 2 : 0) | (have[2] ? 4 : 0);
    int out3[3][2];
    for (int i = 0; i < 3; ++i) {
      if (have[i]) {
        out3[i][0] = v[i][0];
        out3[i][1] = v[i][1];
        round_aff_amvr_c(out3[i], cu.imv);
      } else {
        out3[i][0] = out3[i][1] = 0;
      }
    }
    if (pattern == 7 || (pattern == 3 && cu.affine_type == 0)) {
      std::array<int, 6> row{out3[0][0], out3[0][1], out3[1][0],
                             out3[1][1], out3[2][0], out3[2][1]};
      cands.push_back(row);
    }
    if (int(cands.size()) < 2) {
      for (int i = 2; i >= 0; --i) {
        if (int(cands.size()) >= 2) break;
        if (pattern & (1 << i)) {
          std::array<int, 6> row{out3[i][0], out3[i][1], out3[i][0],
                                 out3[i][1], out3[i][0], out3[i][1]};
          cands.push_back(row);
        }
      }
      if (int(cands.size()) < 2 && ic->col_valid) {
        int mv[2];
        if (ic->tmvp_cand(cu.x, cu.y, cu.w, cu.h, li, ref_idx, mv)) {
          round_aff_amvr_c(mv, cu.imv);
          std::array<int, 6> row{mv[0], mv[1], mv[0], mv[1], mv[0], mv[1]};
          cands.push_back(row);
        }
      }
      while (int(cands.size()) < 2)
        cands.push_back({0, 0, 0, 0, 0, 0});
    }
    cands.resize(2);
  }
  // cpmv from AMVP + differential MVDs (_derive_affine_amvp_mvs)
  void derive_affine_amvp_mvs_c(CuRec& cu) {
    static const int SH[3] = {2, 0, 4};
    int sh = SH[cu.imv];
    int n_cp = cu.affine_type ? 3 : 2;
    for (int li = 0; li < 2; ++li) {
      for (int i = 0; i < 3; ++i)
        cu.cpmv[li][i][0] = cu.cpmv[li][i][1] = 0;
      if (cu.ref_idx[li] < 0) continue;
      std::vector<std::array<int, 6>> mvps;
      affine_amvp_list_c(cu, li, cu.ref_idx[li], mvps);
      int mvp_i = li == 0 ? cu.mvp_idx : cu.mvp_idx1;
      const auto& pred = mvps[mvp_i];
      const int(*d)[2] = cu.aff_mvds[li];
      for (int i = 0; i < n_cp; ++i) {
        int dx = (d[i][0] << sh) + (i ? (d[0][0] << sh) : 0);
        int dy = (d[i][1] << sh) + (i ? (d[0][1] << sh) : 0);
        cu.cpmv[li][i][0] = pred[i * 2] + dx;
        cu.cpmv[li][i][1] = pred[i * 2 + 1] + dy;
        clip_stor_c(cu.cpmv[li][i]);
      }
    }
    derive_affine_grids_c(cu);
  }
  // Sobel gradients with edge replication (ops/affine_search.py _sobel)
  static void sobel_c(const std::vector<int64_t>& p, int w, int h,
                      std::vector<int64_t>& gx, std::vector<int64_t>& gy) {
    gx.assign(size_t(w) * h, 0);
    gy.assign(size_t(w) * h, 0);
    auto at = [&](int i, int j) { return p[size_t(i) * w + j]; };
    for (int i = 1; i < h - 1; ++i)
      for (int j = 1; j < w - 1; ++j) {
        gx[size_t(i) * w + j] = at(i - 1, j + 1) - at(i - 1, j - 1) +
                                2 * (at(i, j + 1) - at(i, j - 1)) +
                                at(i + 1, j + 1) - at(i + 1, j - 1);
        gy[size_t(i) * w + j] = at(i + 1, j - 1) - at(i - 1, j - 1) +
                                2 * (at(i + 1, j) - at(i - 1, j)) +
                                at(i + 1, j + 1) - at(i - 1, j + 1);
      }
    for (auto* g : {&gx, &gy}) {
      auto& a = *g;
      for (int i = 0; i < h; ++i) {
        a[size_t(i) * w] = a[size_t(i) * w + 1];
        a[size_t(i) * w + w - 1] = a[size_t(i) * w + w - 2];
      }
      for (int j = 0; j < w; ++j) {
        a[j] = a[size_t(1) * w + j];
        a[size_t(h - 1) * w + j] = a[size_t(h - 2) * w + j];
      }
    }
  }
  // partial-pivot Gaussian elimination (ops/affine_search.py _gauss_solve
  // — the Python side uses the same explicit solver, bit-identical)
  static bool gauss_solve_c(double A[6][6], double b[6], int n,
                            double x[6]) {
    for (int k = 0; k < n; ++k) {
      int p = k;
      for (int i = k + 1; i < n; ++i)
        if (std::abs(A[i][k]) > std::abs(A[p][k])) p = i;
      if (A[p][k] == 0.0) return false;
      if (p != k) {
        for (int j = 0; j < n; ++j) std::swap(A[k][j], A[p][j]);
        std::swap(b[k], b[p]);
      }
      double inv = 1.0 / A[k][k];
      for (int i = k + 1; i < n; ++i) {
        double f = A[i][k] * inv;
        for (int j = k + 1; j < n; ++j) A[i][j] -= f * A[k][j];
        b[i] -= f * b[k];
      }
    }
    for (int k = n - 1; k >= 0; --k) {
      double s = b[k];
      for (int j = k + 1; j < n; ++j) s -= A[k][j] * x[j];
      x[k] = s / A[k][k];
      if (!std::isfinite(x[k])) return false;
    }
    return true;
  }
  static int64_t round_q_c(double v, int mult, int shift) {
    int64_t r = int64_t(v * mult + (v >= 0 ? 0.5 : -0.5));
    return r << shift;
  }
  // one gradient step (delta_cpmvs): solve the normal equations
  bool delta_cpmvs_c(const std::vector<int64_t>& err,
                     const std::vector<int64_t>& gx,
                     const std::vector<int64_t>& gy, int w, int h,
                     bool six_param, int d[3][2]) const {
    int n = six_param ? 6 : 4;
    double A[6][6] = {}, b[6] = {}, x[6];
    // coefficient streams evaluated on the fly: cx=((j>>2)<<2)+2 etc.
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) A[i][j] = 0.0;
    for (int i = 0; i < n; ++i) b[i] = 0.0;
    {
      // accumulate in int64 then convert (matches the Python int sums)
      int64_t Ai[6][6] = {}, bi[6] = {};
      for (int yy = 0; yy < h; ++yy) {
        int64_t cy = ((yy >> 2) << 2) + 2;
        for (int xx = 0; xx < w; ++xx) {
          int64_t cx = ((xx >> 2) << 2) + 2;
          int64_t g1 = gx[size_t(yy) * w + xx];
          int64_t g2 = gy[size_t(yy) * w + xx];
          int64_t c[6];
          if (six_param) {
            c[0] = g1;
            c[1] = cx * g1;
            c[2] = g2;
            c[3] = cx * g2;
            c[4] = cy * g1;
            c[5] = cy * g2;
          } else {
            c[0] = g1;
            c[1] = cx * g1 + cy * g2;
            c[2] = g2;
            c[3] = cy * g1 - cx * g2;
          }
          int64_t e8 = err[size_t(yy) * w + xx] << 3;
          for (int a = 0; a < n; ++a) {
            for (int bcol = a; bcol < n; ++bcol)
              Ai[a][bcol] += c[a] * c[bcol];
            bi[a] += c[a] * e8;
          }
        }
      }
      for (int a = 0; a < n; ++a) {
        for (int bcol = a; bcol < n; ++bcol)
          A[a][bcol] = A[bcol][a] = double(Ai[a][bcol]);
        b[a] = double(bi[a]);
      }
    }
    if (!gauss_solve_c(A, b, n, x)) return false;
    double d0x = x[0], d0y = x[2], d1x, d1y, d2x = 0.0, d2y = 0.0;
    if (six_param) {
      d1x = x[1] * w + x[0];
      d1y = x[3] * w + x[2];
      d2x = x[4] * h + x[0];
      d2y = x[5] * h + x[2];
    } else {
      d1x = x[1] * w + x[0];
      d1y = -x[3] * w + x[2];
    }
    d[0][0] = int(round_q_c(d0x, 4, 2));
    d[0][1] = int(round_q_c(d0y, 4, 2));
    d[1][0] = int(round_q_c(d1x, 4, 2));
    d[1][1] = int(round_q_c(d1y, 4, 2));
    d[2][0] = int(round_q_c(d2x, 4, 2));
    d[2][1] = int(round_q_c(d2y, 4, 2));
    return true;
  }
  // iterative affine CPMV refinement (affine_search; SATD cost)
  void affine_search_c(const int32_t* src, CuRec& probe, int li,
                       const std::array<int, 6>& cpmv0, bool six_param,
                       int w, int h, int out_cp[3][2]) {
    int n_cp = six_param ? 3 : 2;
    int cp[3][2] = {{cpmv0[0], cpmv0[1]}, {cpmv0[2], cpmv0[3]},
                    {cpmv0[4], cpmv0[5]}};
    std::vector<int64_t> pred;
    auto predict = [&]() {
      for (int i = 0; i < 3; ++i) {
        probe.cpmv[li][i][0] = cp[i][0];
        probe.cpmv[li][i][1] = cp[i][1];
      }
      derive_affine_grids_c(probe);
      affine_pred_list_c(probe, li, 0, false, pred);
    };
    std::vector<int32_t> p32(size_t(w) * h);
    auto cost = [&]() {
      for (size_t i = 0; i < pred.size(); ++i) p32[i] = int32_t(pred[i]);
      return double(satd::block(src, p32.data(), w, h));
    };
    predict();
    double best_c = cost();
    int best_cp[3][2];
    std::memcpy(best_cp, cp, sizeof(cp));
    std::vector<int64_t> err(size_t(w) * h), gx, gy;
    for (int it = 0; it < 5; ++it) {
      for (size_t i = 0; i < err.size(); ++i)
        err[i] = int64_t(src[i]) - pred[i];
      sobel_c(pred, w, h, gx, gy);
      int d[3][2];
      if (!delta_cpmvs_c(err, gx, gy, w, h, six_param, d)) break;
      bool all_zero = true;
      for (int i = 0; i < n_cp; ++i)
        all_zero &= d[i][0] == 0 && d[i][1] == 0;
      if (all_zero) break;
      for (int i = 0; i < 3; ++i)
        if (i < n_cp) {
          cp[i][0] += d[i][0];
          cp[i][1] += d[i][1];
        }
      for (int i = 0; i < 3; ++i) clip_stor_c(cp[i]);
      predict();
      double c = cost();
      if (c < best_c) {
        best_c = c;
        std::memcpy(best_cp, cp, sizeof(cp));
      }
    }
    std::memcpy(out_cp, best_cp, sizeof(best_cp));
  }

  // -- inter syntax estimation (ctu_syntax.py _enc_cu inter branch on
  //    the BitEstimator; returns false on an invalid trial, mirroring
  //    the AssertionError skip in _finish_inter_trials._eval) --
  void est_mvd_c(const int mvd[2]) {
    int ha = std::abs(mvd[0]), va = std::abs(mvd[1]);
    est.bin(ha > 0 ? 1 : 0, g_soffs.mvd);
    est.bin(va > 0 ? 1 : 0, g_soffs.mvd);
    if (ha > 0) est.bin(ha > 1 ? 1 : 0, g_soffs.mvd + 1);
    if (va > 0) est.bin(va > 1 ? 1 : 0, g_soffs.mvd + 1);
    if (ha > 0) {
      if (ha > 1) est.ep(remabs_ep_bins(ha - 2, 1, 0, 17));
      est.ep(1);
    }
    if (va > 0) {
      if (va > 1) est.ep(remabs_ep_bins(va - 2, 1, 0, 17));
      est.ep(1);
    }
  }
  void est_ref_idx_c(int ref_idx, int num_ref) {
    est.bin(ref_idx > 0 ? 1 : 0, g_soffs.ref_pic);
    if (num_ref <= 2 || ref_idx == 0) return;
    est.bin(ref_idx > 1 ? 1 : 0, g_soffs.ref_pic + 1);
    if (num_ref <= 3 || ref_idx == 1) return;
    for (int idx = 3; idx < num_ref; ++idx) {
      est.ep(1);
      if (!(ref_idx > idx - 1)) break;
    }
  }
  void est_merge_idx_c(int idx) {
    int n1 = ic->max_merge - 1;
    if (n1 <= 0) return;
    est.bin(idx == 0 ? 0 : 1, g_soffs.merge_idx);
    if (idx > 0) est.ep(std::min(idx, n1 - 1));
  }
  // gates (codec/geo.py geo_available / ciip_available)
  bool geo_available_c(const CuRec& cu) const {
    int mn = std::min(cu.w, cu.h), mx = std::max(cu.w, cu.h);
    return ic->geo_en && ic->is_b && ic->max_geo > 1 && mn >= 8 &&
           mx <= 64 && mx < 8 * mn;
  }
  bool ciip_available_c(const CuRec& cu) const {
    return ic->ciip_en && !cu.skip && std::max(cu.w, cu.h) < 128 &&
           cu.w * cu.h >= 64;
  }
  int aff_ctx_c(int x, int y) const {
    int c = 0;
    if (is_coded_at(x - 1, y) &&
        ic->mf_isaff[size_t(y >> 2) * ic->uw + ((x - 1) >> 2)])
      ++c;
    if (is_coded_at(x, y - 1) &&
        ic->mf_isaff[size_t((y - 1) >> 2) * ic->uw + (x >> 2)])
      ++c;
    return c;
  }
  void est_aff_merge_idx_c(int idx) {
    int n = ic->max_aff_merge - 1;
    if (n <= 0) return;
    est.bin(idx == 0 ? 0 : 1, g_soffs.aff_mrg_idx);
    if (idx > 0) est.ep(std::min(idx, n - 1));
  }
  void est_mmvd_idx_c(const CuRec& cu) {
    if (ic->max_merge > 1)
      est.bin(cu.mmvd_base, g_soffs.mmvd_merge);
    if (cu.mmvd_step == 0) {
      est.bin(0, g_soffs.mmvd_step);
    } else {
      est.bin(1, g_soffs.mmvd_step);
      est.ep(std::min(cu.mmvd_step, 6));
    }
    est.ep(2);
  }
  void est_geo_idx_c(const CuRec& cu) {
    est.ep(trunc_bin_bins(cu.geo_split_dir, 64));
    int i0 = cu.geo_idx0, i1 = cu.geo_idx1;
    i1 -= i1 < i0 ? 0 : 1;
    int n2 = ic->max_geo - 2;
    est.bin(i0 == 0 ? 0 : 1, g_soffs.merge_idx);
    if (i0 > 0)   // unary_max_ep(v, vmax): v + (v < vmax) bins
      est.ep((i0 - 1) + (i0 - 1 < n2 ? 1 : 0));
    if (n2 > 0) {
      est.bin(i1 == 0 ? 0 : 1, g_soffs.merge_idx);
      if (i1 > 0)
        est.ep((i1 - 1) + (i1 - 1 < n2 - 1 ? 1 : 0));
    }
  }
  // full merge_data mirror (ctu_syntax.py _enc_merge_data)
  void est_merge_data_c(const CuRec& cu) {
    bool sub_coded = ic->max_aff_merge > 0 && cu.w >= 8 && cu.h >= 8;
    if (sub_coded)
      est.bin(cu.affine ? 1 : 0,
              g_soffs.sub_merge + aff_ctx_c(cu.x, cu.y));
    if (cu.affine) {
      est_aff_merge_idx_c(cu.merge_idx);
      return;
    }
    bool geo_av = geo_available_c(cu);
    bool ciip_av = ciip_available_c(cu);
    if (geo_av || ciip_av)
      est.bin((cu.geo || cu.ciip) ? 0 : 1,
              g_soffs.reg_merge + (cu.skip ? 0 : 1));
    if (!cu.geo && !cu.ciip) {
      if (ic->mmvd) est.bin(cu.mmvd ? 1 : 0, g_soffs.mmvd_flag);
      if (cu.mmvd)
        est_mmvd_idx_c(cu);
      else
        est_merge_idx_c(cu.merge_idx);
    } else {
      if (geo_av && ciip_av)
        est.bin(cu.ciip ? 1 : 0, g_soffs.ciip_flag);
      if (cu.geo)
        est_geo_idx_c(cu);
      else
        est_merge_idx_c(cu.merge_idx);
    }
  }
  // AMVR signalling (ctu_syntax.py _enc_imv)
  void est_imv_c(const CuRec& cu) {
    if (!ic->amvr) return;
    if (cu.mvd[0] == 0 && cu.mvd[1] == 0 && cu.mvd1[0] == 0 &&
        cu.mvd1[1] == 0)
      return;
    est.bin(cu.imv > 0 ? 1 : 0, g_soffs.imv_flag);
    if (cu.imv > 0) {
      est.bin(cu.imv < 3 ? 1 : 0, g_soffs.imv_flag + 4);
      if (cu.imv < 3) est.bin(cu.imv > 1 ? 1 : 0, g_soffs.imv_flag + 1);
    }
  }
  // MMVD motion derivation (ctu_syntax.py _apply_mmvd)
  void apply_mmvd_c(CuRec& cu, const std::vector<MI>& merge_cands) {
    const MI& base = merge_cands[cu.mmvd_base];
    int offset = 1 << (cu.mmvd_step + 2);
    if (ic->fpel_mmvd) offset <<= 2;
    const int table[4][2] = {
        {offset, 0}, {-offset, 0}, {0, offset}, {0, -offset}};
    int d0[2] = {table[cu.mmvd_pos][0], table[cu.mmvd_pos][1]};
    int r0 = base.ref[0], r1 = base.ref[1];
    int mv[2][2] = {{base.mv[0][0], base.mv[0][1]},
                    {base.mv[1][0], base.mv[1][1]}};
    if (r0 >= 0 && r1 >= 0) {
      int poc0 = ic->ref_poc[0][r0], poc1 = ic->ref_poc[1][r1];
      int cur = ic->cur_poc;
      int d1[2];
      if ((poc0 - cur) == (poc1 - cur)) {
        d1[0] = d0[0];
        d1[1] = d0[1];
      } else if (std::abs(poc1 - cur) > std::abs(poc0 - cur)) {
        d1[0] = d0[0];
        d1[1] = d0[1];
        int scale = dist_scale_factor(cur, poc0, cur, poc1);
        scale_mv_c(d1, scale, d0);
      } else {
        int scale = dist_scale_factor(cur, poc1, cur, poc0);
        int tmp[2] = {d0[0], d0[1]};
        scale_mv_c(tmp, scale, d1);
      }
      mv[0][0] += d0[0];
      mv[0][1] += d0[1];
      mv[1][0] += d1[0];
      mv[1][1] += d1[1];
    } else if (r0 >= 0) {
      mv[0][0] += d0[0];
      mv[0][1] += d0[1];
    } else if (r1 >= 0) {
      mv[1][0] += d0[0];
      mv[1][1] += d0[1];
    }
    for (int li = 0; li < 2; ++li)
      for (int k = 0; k < 2; ++k)
        cu.mv[li][k] = std::max(MV_CLIP_MIN,
                                std::min(MV_CLIP_MAX, mv[li][k]));
    cu.ref_idx[0] = r0;
    cu.ref_idx[1] = r1;
    cu.alt_hpel = base.alt != 0;
    cu.bcw = (r0 >= 0 && r1 >= 0) ? base.bcw : 2;
    if (cu.w + cu.h == 12 && r0 >= 0 && r1 >= 0) {
      cu.ref_idx[1] = -1;
      cu.mv[1][0] = cu.mv[1][1] = 0;
    }
  }
  int skip_ctx_c(int x, int y) const {
    int ctx = 0;
    if (is_coded_at(x - 1, y) && ic->skip_at(x - 1, y)) ++ctx;
    if (is_coded_at(x, y - 1) && ic->skip_at(x, y - 1)) ++ctx;
    return ctx;
  }
  int pred_mode_ctx_c(int x, int y) const {
    Pic::CuInfo ci;
    bool li = ps.cu_at(x - 1, y, ci) && ci.is_intra;
    bool ai = !li && ps.cu_at(x, y - 1, ci) && ci.is_intra;
    return (li || ai) ? 1 : 0;
  }
  // real intra luma mode writer (ctu_syntax.py _enc_intra_luma_mode on
  // the estimator; MIP/MRL/ISP gated off in the inter-slice fallback)
  void est_intra_luma_mode_real(const CuRec& cu, const int mpm[6]) {
    if (pp.mip_en) {
      est.bin(cu.mip_flag ? 1 : 0,
              g_soffs.mip_flag + mip_flag_ctx(cu.x, cu.y, cu.w, cu.h));
      if (cu.mip_flag) {
        est.ep(1);
        est.ep(trunc_bin_bins(cu.luma_mode, num_mip_modes(cu.w, cu.h)));
        return;
      }
    }
    if (pp.mrl_en && (cu.y % pp.ctu_size) != 0) {
      est.bin(cu.ref_line ? 1 : 0, g_soffs.mrl_idx);
      if (cu.ref_line)
        est.bin(cu.ref_line != 1 ? 1 : 0, g_soffs.mrl_idx + 1);
    }
    if (pp.isp_en && isp_coded_ok(cu)) {
      est.bin(cu.isp_mode ? 1 : 0, g_soffs.isp);
      if (cu.isp_mode) est.bin(cu.isp_mode - 1, g_soffs.isp + 1);
    }
    int mode = cu.luma_mode;
    int mpm_idx = 6;
    for (int i = 0; i < 6; ++i)
      if (mpm[i] == mode) { mpm_idx = i; break; }
    if (cu.ref_line == 0)
      est.bin(mpm_idx < 6 ? 1 : 0, g_soffs.mpm_flag);
    if (mpm_idx < 6) {
      if (cu.ref_line == 0)
        est.bin(mpm_idx > 0 ? 1 : 0,
                g_soffs.planar_flag + (cu.isp_mode ? 0 : 1));
      if (mpm_idx) est.ep(1);
      if (mpm_idx > 1) est.ep(1);
      if (mpm_idx > 2) est.ep(1);
      if (mpm_idx > 3) est.ep(1);
    } else {
      int srt[6];
      std::memcpy(srt, mpm, sizeof(srt));
      std::sort(srt, srt + 6);
      int m = mode;
      for (int i = 5; i >= 0; --i)
        if (m > srt[i]) --m;
      est.ep(trunc_bin_bins(m, N_MODES - 6));
    }
  }
  void est_intra_chroma_mode_real(const CuRec& cu) {
    if (pp.cclm_en && cu.cclm_allowed) {
      bool is_lm = cu.chroma_dir >= LM_CHROMA && cu.chroma_dir <= MDLM_T;
      est.bin(is_lm ? 1 : 0, g_soffs.cclm_flag);
      if (is_lm) {
        int sym = cu.chroma_dir - LM_CHROMA;
        est.bin(sym == 0 ? 0 : 1, g_soffs.cclm_idx);
        if (sym > 0) est.ep(1);
        return;
      }
    }
    bool is_dm = cu.chroma_dir == DM_CHROMA;
    est.bin(is_dm ? 0 : 1, g_soffs.chroma_mode);
    if (!is_dm) est.ep(2);
  }

  // finish_cu analog for inter-slice trial evaluation: reconstruct +
  // mark maps + motion-field/HMVP updates (ctu_syntax.py finish_cu)
  void finish_cu_inter(CuRec& cu, int qt_depth) {
    int maxval = (1 << pp.bit_depth) - 1;
    if (cu.is_inter) prepare_refinement_c(cu);
    if (cu.has_mtb) {
      // implicit max-TB tiling: whole-CU prediction, per-TU residuals
      for (int comp = 0; comp < 3; ++comp) {
        int sc = comp == 0 ? 0 : 1;
        int x = cu.x >> sc, y = cu.y >> sc, w = cu.w >> sc, h = cu.h >> sc;
        int stride = comp == 0 ? ps.W : (ps.W >> 1);
        int q = comp == 0 ? pp.qp_y : (comp == 1 ? pp.qp_cb : pp.qp_cr);
        std::vector<int32_t> pred;
        pred_cu_inter_c(cu, comp, pred);
        std::vector<int64_t> rec(pred.begin(), pred.end());
        for (const auto& tu : cu.mtb) {
          const std::vector<int32_t>& coeff =
              comp == 0 ? tu.cy : (comp == 1 ? tu.cb : tu.cr);
          if (coeff.empty()) continue;
          int tw = tu.tw >> sc, th = tu.th >> sc;
          int ox = tu.tx >> sc, oy = tu.ty >> sc;
          std::vector<int32_t> dq_buf(size_t(tw) * th),
              resi(size_t(tw) * th);
          if (pp.dq)
            vte_dequant_dq(coeff.data(), tw, th, q, pp.bit_depth, 1,
                           dq_buf.data());
          else
            vte_dequant(coeff.data(), tw, th, q, pp.bit_depth,
                        dq_buf.data());
          vte_inv_transform(dq_buf.data(), tw, th, TR_DCT2, TR_DCT2,
                            pp.bit_depth, resi.data());
          for (int i = 0; i < th; ++i)
            for (int j = 0; j < tw; ++j)
              rec[size_t(oy + i) * w + ox + j] +=
                  resi[size_t(i) * tw + j];
        }
        int32_t* dst = ps.rec[comp];
        for (int i = 0; i < h; ++i)
          for (int j = 0; j < w; ++j)
            dst[size_t(y + i) * stride + x + j] = int32_t(std::max<int64_t>(
                0, std::min<int64_t>(maxval, rec[size_t(i) * w + j])));
      }
      ps.mark_cu(cu.x, cu.y, cu.w, cu.h, qt_depth, DC, false, false, true,
                 pp.slice_qp_y);
      finish_cu_motion(cu);
      return;
    }
    for (int comp = 0; comp < 3; ++comp) {
      int sc = comp == 0 ? 0 : 1;
      int x = cu.x >> sc, y = cu.y >> sc, w = cu.w >> sc, h = cu.h >> sc;
      int stride = comp == 0 ? ps.W : (ps.W >> 1);
      const std::vector<int32_t>& coeff =
          comp == 0 ? cu.coeff_y : (comp == 1 ? cu.coeff_cb : cu.coeff_cr);
      std::vector<int32_t> pred;
      if (cu.is_inter) {
        pred_cu_inter_c(cu, comp, pred);
      } else {
        intra_pred_fallback(cu, comp, pred);
      }
      int32_t* rec = ps.rec[comp];
      if (!coeff.empty()) {
        int q = comp == 0 ? pp.qp_y : (comp == 1 ? pp.qp_cb : pp.qp_cr);
        int trh = TR_DCT2, trv = TR_DCT2;
        if (!cu.is_inter && comp == 0 && pp.implicit_mts) {
          trh = (4 <= w && w <= 16) ? TR_DST7 : TR_DCT2;
          trv = (4 <= h && h <= 16) ? TR_DST7 : TR_DCT2;
        }
        std::vector<int32_t> dq_buf(size_t(w) * h), resi(size_t(w) * h);
        if (pp.dq)
          vte_dequant_dq(coeff.data(), w, h, q, pp.bit_depth, 1,
                         dq_buf.data());
        else
          vte_dequant(coeff.data(), w, h, q, pp.bit_depth, dq_buf.data());
        vte_inv_transform(dq_buf.data(), w, h, trh, trv, pp.bit_depth,
                          resi.data());
        for (int i = 0; i < h; ++i)
          for (int j = 0; j < w; ++j) {
            int64_t v = int64_t(pred[size_t(i) * w + j]) +
                        resi[size_t(i) * w + j];
            rec[size_t(y + i) * stride + x + j] = int32_t(
                std::max<int64_t>(0, std::min<int64_t>(maxval, v)));
          }
      } else {
        for (int i = 0; i < h; ++i)
          std::memcpy(rec + size_t(y + i) * stride + x,
                      pred.data() + size_t(i) * w, size_t(w) * 4);
      }
    }
    ps.mark_cu(cu.x, cu.y, cu.w, cu.h, qt_depth,
               cu.is_inter ? DC : dm_mode_of(cu), !cu.is_inter,
               cu.mip_flag, true, pp.slice_qp_y);
    finish_cu_motion(cu);
  }
  // motion field + HMVP updates of finish_cu (ctu_syntax.py finish_cu)
  void finish_cu_motion(const CuRec& cu) {
    if (cu.is_inter && cu.geo) {
      // per-sub-block geo motion; geo CUs do not update HMVP
      std::vector<MI> grid;
      geo_motion_grid_c(cu, grid);
      set_sub_cu_mf(cu, grid, /*is_aff=*/false, nullptr);
      return;
    }
    if (cu.is_inter && cu.affine) {
      // per-sub-block spanning; affine CUs do not update HMVP;
      // real affine CUs store the AffineInfo inheritance row
      int32_t row[21];
      const int32_t* rp = nullptr;
      if (!cu.sbtmvp) {
        row[0] = cu.x;
        row[1] = cu.y;
        row[2] = cu.w;
        row[3] = cu.h;
        row[4] = cu.affine_type;
        for (int li = 0; li < 2; ++li)
          for (int i = 0; i < 3; ++i) {
            row[5 + li * 6 + i * 2] = cu.cpmv[li][i][0];
            row[5 + li * 6 + i * 2 + 1] = cu.cpmv[li][i][1];
          }
        row[17] = (cu.ref_idx[0] >= 0 ? 1 : 0) |
                  (cu.ref_idx[1] >= 0 ? 2 : 0);
        row[18] = cu.ref_idx[0];
        row[19] = cu.ref_idx[1];
        row[20] = cu.bcw;
        rp = row;
      }
      set_sub_cu_mf(cu, cu.sub_mi, /*is_aff=*/true, rp);
      return;
    }
    if (cu.is_inter) {
      MI mi;
      mi.mv[0][0] = cu.mv[0][0];
      mi.mv[0][1] = cu.mv[0][1];
      mi.mv[1][0] = cu.mv[1][0];
      mi.mv[1][1] = cu.mv[1][1];
      mi.ref[0] = int8_t(cu.ref_idx[0]);
      mi.ref[1] = int8_t(cu.ref_idx[1]);
      mi.bcw = int8_t(cu.bcw);
      mi.alt = cu.alt_hpel ? 1 : 0;
      ic->set_cu_mf(cu.x, cu.y, cu.w, cu.h, &mi, cu.skip);
      int xbr = cu.x + cu.w, ybr = cu.y + cu.h;
      if ((xbr >> 2) > (cu.x >> 2) && (ybr >> 2) > (cu.y >> 2))
        hmvp_add(mi);
    } else {
      ic->set_cu_mf(cu.x, cu.y, cu.w, cu.h, nullptr, false);
    }
  }
  static int dm_mode_of(const CuRec& cu) {
    return cu.mip_flag ? PLANAR : cu.luma_mode;
  }
  // plain intra prediction of the inter-slice fallback CU (no MIP/MRL/
  // ISP; chroma_dir DM)
  void intra_pred_fallback(const CuRec& cu, int comp,
                           std::vector<int32_t>& pred) {
    int sc = comp == 0 ? 0 : 1;
    int x = cu.x >> sc, y = cu.y >> sc, w = cu.w >> sc, h = cu.h >> sc;
    pred.resize(size_t(w) * h);
    std::vector<int32_t> top(2 * w + 3), left(2 * h + 3);
    if (comp == 0) {
      vte_build_refs(ps.rec[0], ps.H, ps.W, x, y, w, h, ps.coded_luma,
                     ps.uh, ps.uw, 4, pp.bit_depth, 0, -1, -1, top.data(),
                     left.data());
      intra::predict(top.data(), int(top.size()), left.data(),
                     int(left.size()), cu.luma_mode, w, h, pp.bit_depth,
                     true, 0, -1, -1, false, -1, pred.data());
    } else {
      vte_build_refs(ps.rec[comp], ps.H >> 1, ps.W >> 1, x, y, w, h,
                     ps.coded_chroma, ps.ch2, ps.cw2, 2, pp.bit_depth, 0,
                     -1, -1, top.data(), left.data());
      int mode = cu.chroma_dir == DM_CHROMA ? dm_mode_of(cu) : cu.chroma_dir;
      intra::predict(top.data(), int(top.size()), left.data(),
                     int(left.size()), mode, w, h, pp.bit_depth, false, 0,
                     -1, -1, false, -1, pred.data());
    }
  }

  // full estimator replay of one inter-slice trial CU; returns false on
  // an invalid (assertion) trial
  bool est_enc_cu_inter(CuRec& cu, const PartInfo& part) {
    int w = cu.w, h = cu.h;
    bool is_4x4 = w == 4 && h == 4;
    (void)part;
    if (!is_4x4) {
      est.bin(cu.skip ? 1 : 0,
              g_soffs.skip_flag + skip_ctx_c(cu.x, cu.y));
      if (cu.skip) {
        est_merge_data_c(cu);
        finish_cu_inter(cu, part.qt_depth);
        return true;
      }
    }
    if (is_4x4) {
      if (cu.is_inter) return false;  // assert: 4x4 must be intra
    } else {
      est.bin(cu.is_inter ? 0 : 1,
              g_soffs.pred_mode + pred_mode_ctx_c(cu.x, cu.y));
    }
    if (!cu.is_inter) {
      int mpm[6];
      get_mpms(ps, cu.x, cu.y, w, h, pp.ctu_size, mpm);
      est_intra_luma_mode_real(cu, mpm);
      est_intra_chroma_mode_real(cu);
    } else {
      est.bin(cu.merge ? 1 : 0, g_soffs.merge_flag);
      if (cu.merge) {
        est_merge_data_c(cu);
      } else {
        int dir = (cu.ref_idx[0] >= 0 ? 1 : 0) | (cu.ref_idx[1] >= 0 ? 2 : 0);
        if (ic->is_b) {
          if (w + h > 12) {
            int ctx = 7 - ((bit_length(w * h) - 1 + 1) >> 1);
            est.bin(dir == 3 ? 1 : 0, g_soffs.inter_dir + ctx);
          }
          if (dir != 3)
            est.bin(dir == 2 ? 1 : 0, g_soffs.inter_dir + 5);
        }
        if (ic->affine_en && w > 8 && h > 8) {
          est.bin(cu.affine ? 1 : 0,
                  g_soffs.aff_flag + aff_ctx_c(cu.x, cu.y));
          if (cu.affine && ic->affine_type_en)
            est.bin(cu.affine_type, g_soffs.aff_type);
        }
        if (dir == 3 && ic->bi_dir_pred && !cu.affine)
          est.bin(cu.smvd ? 1 : 0, g_soffs.smvd_flag);
        int n_cp = cu.affine ? (cu.affine_type ? 3 : 2) : 1;
        if (dir != 2) {
          if (!cu.smvd && ic->n_ref[0] > 1)
            est_ref_idx_c(cu.ref_idx[0], ic->n_ref[0]);
          if (cu.affine)
            for (int i = 0; i < n_cp; ++i) est_mvd_c(cu.aff_mvds[0][i]);
          else
            est_mvd_c(cu.mvd);
          est.bin(cu.mvp_idx, g_soffs.mvp_idx);
        }
        if (dir != 1) {
          if (!cu.smvd) {
            if (ic->n_ref[1] > 1)
              est_ref_idx_c(cu.ref_idx[1], ic->n_ref[1]);
            if (!(ic->mvd_l1_zero && dir == 3)) {
              if (cu.affine)
                for (int i = 0; i < n_cp; ++i)
                  est_mvd_c(cu.aff_mvds[1][i]);
              else
                est_mvd_c(cu.mvd1);
            }
          }
          est.bin(cu.mvp_idx1, g_soffs.mvp_idx);
        }
        if (!cu.affine) {
          est_imv_c(cu);
        } else if (ic->affine_amvr_en) {
          bool any_d = false;
          for (int li = 0; li < 2; ++li)
            for (int i = 0; i < 3; ++i)
              any_d |= cu.aff_mvds[li][i][0] || cu.aff_mvds[li][i][1];
          if (any_d) {
            est.bin(cu.imv > 0 ? 1 : 0, g_soffs.imv_flag + 2);
            if (cu.imv > 0)
              est.bin(cu.imv > 1 ? 1 : 0, g_soffs.imv_flag + 3);
          }
        }
        // BCW signalling outside scope (bcw_en off through medium)
      }
    }
    if (cu.is_inter && !cu.merge)
      est.bin(cu.root_cbf ? 1 : 0, g_soffs.root_cbf);
    if (cu.is_inter && cu.root_cbf && (w > 64 || h > 64)) {
      // implicit max-TB TU tiling (ctu_syntax.py _code_max_tb_tus)
      for (const auto& tu : cu.mtb) {
        bool cbf_cb = !tu.cb.empty();
        bool cbf_cr = !tu.cr.empty();
        bool cbf_y = !tu.cy.empty();
        est.bin(cbf_cb ? 1 : 0, g_soffs.cbf_cb);
        est.bin(cbf_cr ? 1 : 0, g_soffs.cbf_cr + (cbf_cb ? 1 : 0));
        est.bin(cbf_y ? 1 : 0, g_soffs.cbf_y);
        maybe_est_dqp(cu, cbf_y || cbf_cb || cbf_cr);
        int mask = (cbf_cb ? 2 : 0) + (cbf_cr ? 1 : 0);
        if (pp.jccr_en && mask == 3)
          est.bin(0, g_soffs.jccr + mask - 1);
        if (cbf_y) est_residual_block(tu.cy.data(), tu.tw, tu.th, true);
        if (cbf_cb)
          est_residual_block(tu.cb.data(), tu.tw >> 1, tu.th >> 1, false);
        if (cbf_cr)
          est_residual_block(tu.cr.data(), tu.tw >> 1, tu.th >> 1, false);
      }
      finish_cu_inter(cu, part.qt_depth);
      return true;
    }
    if (!cu.is_inter || cu.root_cbf) {
      bool cbf_cb = !cu.coeff_cb.empty();
      bool cbf_cr = !cu.coeff_cr.empty();
      bool cbf_y = !cu.coeff_y.empty();
      est.bin(cbf_cb ? 1 : 0, g_soffs.cbf_cb);
      est.bin(cbf_cr ? 1 : 0, g_soffs.cbf_cr + (cbf_cb ? 1 : 0));
      if (cu.is_inter && !cbf_cb && !cbf_cr) {
        if (!cbf_y) return false;  // assert: inter cbf inferred 1
      } else {
        est.bin(cbf_y ? 1 : 0, g_soffs.cbf_y);
      }
      maybe_est_dqp(cu, cbf_y || cbf_cb || cbf_cr);
      int mask = (cbf_cb ? 2 : 0) + (cbf_cr ? 1 : 0);
      if (pp.jccr_en && ((!cu.is_inter && mask) || mask == 3))
        est.bin(0, g_soffs.jccr + mask - 1);
      if (cbf_y) est_residual_block(cu.coeff_y.data(), w, h, true);
      if (cbf_cb)
        est_residual_block(cu.coeff_cb.data(), w >> 1, h >> 1, false);
      if (cbf_cr)
        est_residual_block(cu.coeff_cr.data(), w >> 1, h >> 1, false);
    }
    if (!cu.is_inter) est_lfnst_bits(cu);
    finish_cu_inter(cu, part.qt_depth);
    return true;
  }

  // -- motion search (inter_search.py _motion_search port) -------------
  // dense SSE grid (edge-clamped reads) — _sse_grid
  void sse_grid(const int32_t* src, int sw, int sh, const int32_t* ref,
                int rh, int rw, int cx0, int cy0, int rx, int ry,
                std::vector<int64_t>& costs) const {
    int gw = 2 * rx + 1, gh = 2 * ry + 1;
    costs.assign(size_t(gw) * gh, 0);
    int ww = gw - 1 + sw, wh = gh - 1 + sh;
    std::vector<int32_t> win(size_t(wh) * ww);
    for (int i = 0; i < wh; ++i) {
      int yy = std::min(std::max(cy0 - ry + i, 0), rh - 1);
      for (int j = 0; j < ww; ++j) {
        int xx = std::min(std::max(cx0 - rx + j, 0), rw - 1);
        win[size_t(i) * ww + j] = ref[size_t(yy) * rw + xx];
      }
    }
    for (int dy = 0; dy < gh; ++dy)
      for (int dx = 0; dx < gw; ++dx) {
        int64_t s = 0;
        for (int i = 0; i < sh; ++i) {
          const int32_t* a = src + size_t(i) * sw;
          const int32_t* b = win.data() + size_t(dy + i) * ww + dx;
          for (int j = 0; j < sw; ++j) {
            int64_t d = int64_t(a[j]) - b[j];
            s += d * d;
          }
        }
        costs[size_t(dy) * gw + dx] = s;
      }
  }
  static inline int floordiv4(int v) { return v >= 0 ? v / 4 : -((-v + 3) / 4); }
  double mc_cost(const int32_t* src, int x, int y, int w, int h,
                 const int mv[2], const int32_t* ref, int rh, int rw,
                 const int mvp[2]) const {
    std::vector<int32_t> pred(size_t(w) * h);
    vte_mc_block(ref, rh, rw, x, y, w, h, mv[0], mv[1], pp.bit_depth, 1, 0,
                 0, nullptr, pred.data());
    int64_t sse = 0;
    for (size_t i = 0; i < size_t(w) * h; ++i) {
      int64_t d = int64_t(src[i]) - pred[i];
      sse += d * d;
    }
    double bits =
        ((std::abs(mv[0] - mvp[0]) + std::abs(mv[1] - mvp[1])) >> 2) * 1.5 +
        2;
    return double(sse) + pp.lmbda * bits;
  }
  const std::vector<int32_t>& ds4_ref(int li, int ri, int* dsw, int* dsh) {
    std::lock_guard<std::mutex> _lk(ic->ds_mtx);
    if (ic->ds_ref[li][ri].empty()) {
      int rw = ic->pic_w, rh = ic->pic_h;
      int hh = (rh / 4) * 4, ww = (rw / 4) * 4;
      const int32_t* ref = ic->ref_plane[li][ri][0];
      std::vector<int32_t>& ds = ic->ds_ref[li][ri];
      ds.resize(size_t(hh / 4) * (ww / 4));
      for (int i = 0; i < hh / 4; ++i)
        for (int j = 0; j < ww / 4; ++j) {
          int64_t s = 0;
          for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b)
              s += ref[size_t(i * 4 + a) * rw + j * 4 + b];
          ds[size_t(i) * (ww / 4) + j] = int32_t(s >> 4);
        }
      ic->ds_w[li][ri] = ww / 4;
      ic->ds_h[li][ri] = hh / 4;
    }
    *dsw = ic->ds_w[li][ri];
    *dsh = ic->ds_h[li][ri];
    return ic->ds_ref[li][ri];
  }
  // returns mv (1/16) + mvp_idx
  void motion_search(const int32_t* src, int x, int y, int w, int h,
                     const int amvp[2][2], int li, int ri, int out_mv[2],
                     int* out_mvp_idx) {
    int R = ic->search_range;
    int rw = ic->pic_w, rh = ic->pic_h;
    const int32_t* ref = ic->ref_plane[li][ri][0];
    auto clampc = [&](int px, int py, int c[2]) {
      c[0] = std::min(std::max(px, -w), rw);
      c[1] = std::min(std::max(py, -h), rh);
      if (ifp_bottom >= 0)                 // IFP window (ifp.MC_MARGIN)
        c[1] = std::min(c[1], ifp_bottom - h - 8);
    };
    int centers[3][2];
    int n_centers = 0;
    int starts[3][2] = {{amvp[0][0], amvp[0][1]},
                        {amvp[1][0], amvp[1][1]},
                        {0, 0}};
    for (int k = 0; k < 3; ++k) {
      int c[2];
      clampc(x + (starts[k][0] >> 4), y + (starts[k][1] >> 4), c);
      bool dup = false;
      for (int i = 0; i < n_centers; ++i)
        dup |= centers[i][0] == c[0] && centers[i][1] == c[1];
      if (!dup) {
        centers[n_centers][0] = c[0];
        centers[n_centers][1] = c[1];
        ++n_centers;
      }
    }
    std::vector<std::array<int, 2>> fine;
    // under an IFP window both coarse stages are skipped: the ds4
    // plane cache would snapshot reference rows that are still
    // being produced (worker-timing dependent), so only the
    // bounded predictor-centered fine search runs
    if (ifp_bottom >= 0) {
    } else if (R > 8 && w >= 8 && h >= 8 && ic->use_dev_me) {
      // device pre-ME winner for the block containing this CU (a failed
      // table build falls through with no coarse stage, matching the
      // Python searcher)
      const int32_t* tab = ic->me_tab[li][ri];
      if (tab != nullptr) {
        int bs = ic->me_bs;
        int iy =
            std::min(std::max((y + h / 2) / bs, 0), ic->me_nby[li][ri] - 1);
        int ix =
            std::min(std::max((x + w / 2) / bs, 0), ic->me_nbx[li][ri] - 1);
        int dmx = tab[(size_t(iy) * ic->me_nbx[li][ri] + ix) * 2];
        int dmy = tab[(size_t(iy) * ic->me_nbx[li][ri] + ix) * 2 + 1];
        int c[2];
        clampc(x + dmx, y + dmy, c);
        fine.push_back({c[0], c[1]});
      }
    } else if (R > 8 && w >= 8 && h >= 8 && w % 4 == 0 && h % 4 == 0) {
      int dsw, dsh;
      const std::vector<int32_t>& ds = ds4_ref(li, ri, &dsw, &dsh);
      int sh4 = h / 4, sw4 = w / 4;
      std::vector<int32_t> src_ds(size_t(sh4) * sw4);
      for (int i = 0; i < sh4; ++i)
        for (int j = 0; j < sw4; ++j) {
          int64_t s = 0;
          for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b)
              s += src[size_t(i * 4 + a) * w + j * 4 + b];
          src_ds[size_t(i) * sw4 + j] = int32_t(s >> 4);
        }
      int rq = std::max(1, R / 4);
      std::vector<int64_t> costs;
      for (int k = 0; k < n_centers; ++k) {
        int cx4 = floordiv4(centers[k][0]), cy4 = floordiv4(centers[k][1]);
        sse_grid(src_ds.data(), sw4, sh4, ds.data(), dsh, dsw, cx4, cy4,
                 rq, rq, costs);
        int gw = 2 * rq + 1;
        int besti = 0;
        for (size_t i = 1; i < costs.size(); ++i)
          if (costs[i] < costs[besti]) besti = int(i);
        int dy = int(besti) / gw, dx = int(besti) % gw;
        int fx = (cx4 - rq + dx) * 4, fy = (cy4 - rq + dy) * 4;
        int c[2];
        clampc(fx, fy, c);
        fine.push_back({c[0], c[1]});
      }
    }
    for (int k = 0; k < n_centers; ++k)
      fine.push_back({centers[k][0], centers[k][1]});

    bool have_best = false;
    int64_t best_c = 0;
    int best_mv[2] = {0, 0};
    int rr = R > 8 ? 4 : R;
    std::vector<std::array<int, 2>> seen;
    std::vector<int64_t> costs;
    for (const auto& c : fine) {
      bool dup = false;
      for (const auto& s : seen) dup |= s == c;
      if (dup) continue;
      seen.push_back(c);
      sse_grid(src, w, h, ref, rh, rw, c[0], c[1], rr, rr, costs);
      for (int dy = -rr; dy <= rr; ++dy)
        for (int dx = -rr; dx <= rr; ++dx) {
          int sx = c[0] + dx, sy = c[1] + dy;
          if (sx < -w || sy < -h || sx > rw || sy > rh) continue;
          if (ifp_bottom >= 0 && sy + h + 8 > ifp_bottom) continue;
          int64_t cc = costs[size_t(dy + rr) * (2 * rr + 1) + dx + rr];
          if (!have_best || cc < best_c) {
            have_best = true;
            best_c = cc;
            best_mv[0] = (sx - x) << 4;
            best_mv[1] = (sy - y) << 4;
          }
        }
    }
    if (!have_best) {
      best_mv[0] = (centers[0][0] - x) << 4;
      best_mv[1] = (centers[0][1] - y) << 4;
    }
    // half then quarter refinement
    int mv[2] = {best_mv[0], best_mv[1]};
    for (int step = 8; step >= 4; step -= 4) {
      double cb = mc_cost(src, x, y, w, h, mv, ref, rh, rw, amvp[0]);
      int cbm[2] = {mv[0], mv[1]};
      for (int dy = -step; dy <= step; dy += step)
        for (int dx = -step; dx <= step; dx += step) {
          if (dx == 0 && dy == 0) continue;
          int m2[2] = {mv[0] + dx, mv[1] + dy};
          double cc = mc_cost(src, x, y, w, h, m2, ref, rh, rw, amvp[0]);
          if (cc < cb) {
            cb = cc;
            cbm[0] = m2[0];
            cbm[1] = m2[1];
          }
        }
      mv[0] = cbm[0];
      mv[1] = cbm[1];
    }
    auto mvd_bits = [&](const int mvp[2]) {
      return (std::abs(mv[0] - mvp[0]) + std::abs(mv[1] - mvp[1])) >> 2;
    };
    *out_mvp_idx = mvd_bits(amvp[0]) <= mvd_bits(amvp[1]) ? 0 : 1;
    out_mv[0] = mv[0];
    out_mv[1] = mv[1];
    if (getenv("VTE_DBG_ME"))
      std::fprintf(stderr,
                   "NATME (%d,%d %dx%d) li%d ri%d amvp(%d,%d)(%d,%d) "
                   "int(%d,%d) mv(%d,%d) bot %d\n",
                   x, y, w, h, li, ri, amvp[0][0], amvp[0][1], amvp[1][0],
                   amvp[1][1], best_mv[0], best_mv[1], mv[0], mv[1],
                   ifp_bottom);
  }

  // -- the inter CU decision (inter_search.py _rd_cu_inter +
  //    _finish_inter_trials) --
  struct IProf {
    double merge_pre = 0, mmvd = 0, sub = 0, geo = 0, me = 0, amvp_tq = 0,
           smvd = 0, affamvp = 0, evalt = 0, intra_t = 0, dmvrp = 0,
           mtrial = 0, tq = 0, snap = 0;
    long n_cu = 0;
    ~IProf() {
      if (getenv("VTE_PROF_INTER"))
        std::fprintf(stderr,
                     "VTEPROF n_cu=%ld merge_pre=%.2f mmvd=%.2f sub=%.2f "
                     "geo=%.2f me=%.2f amvp_tq=%.2f smvd=%.2f "
                     "affamvp=%.2f eval=%.2f intra=%.2f mtrial=%.2f "
                     "tq=%.2f dmvr=%.2f snap=%.2f\n",
                     n_cu, merge_pre, mmvd, sub, geo, me, amvp_tq, smvd,
                     affamvp, evalt, intra_t, mtrial, tq, dmvrp, snap);
    }
  };
  static IProf& iprof() {
    static IProf p;   // process-global; racy adds acceptable (profiling)
    return p;
  }
  struct TScope {
    double* acc;
    std::chrono::steady_clock::time_point t0;
    explicit TScope(double* a)
        : acc(a), t0(std::chrono::steady_clock::now()) {}
    ~TScope() {
      *acc += std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    }
  };
  double rd_cu_inter(CuRec& cu_out, const PartInfo& part) {
    int x = cu_out.x, y = cu_out.y, w = cu_out.w, h = cu_out.h;
    dmvr_cache.clear();
    // source blocks
    std::vector<int32_t> src_y(size_t(h) * w), src_cb, src_cr;
    for (int i = 0; i < h; ++i)
      std::memcpy(&src_y[size_t(i) * w], ps.src[0] + size_t(y + i) * ps.W + x,
                  size_t(w) * 4);
    int cx = x >> 1, cy2 = y >> 1, cw = w >> 1, chh = h >> 1;
    src_cb.resize(size_t(chh) * cw);
    src_cr.resize(size_t(chh) * cw);
    for (int i = 0; i < chh; ++i) {
      std::memcpy(&src_cb[size_t(i) * cw],
                  ps.src[1] + size_t(cy2 + i) * (ps.W >> 1) + cx,
                  size_t(cw) * 4);
      std::memcpy(&src_cr[size_t(i) * cw],
                  ps.src[2] + size_t(cy2 + i) * (ps.W >> 1) + cx,
                  size_t(cw) * 4);
    }

    std::vector<CuRec> trials;
    bool is_4x4 = w == 4 && h == 4;
    iprof().n_cu++;

    std::vector<MI> merge_cands;
    std::vector<std::pair<int64_t, int>> scored;  // (sse, cand idx)
    if (!is_4x4) {
      TScope _t(&iprof().merge_pre);
      merge_candidates(x, y, w, h, merge_cands);
      // luma-SSE preselection over unique (mv, ref) candidates
      std::vector<std::array<int32_t, 6>> seen;
      for (size_t idx = 0; idx < merge_cands.size(); ++idx) {
        const MI& mi = merge_cands[idx];
        std::array<int32_t, 6> key{mi.mv[0][0], mi.mv[0][1], mi.mv[1][0],
                                   mi.mv[1][1], mi.ref[0], mi.ref[1]};
        bool dup = false;
        for (const auto& s : seen) dup |= s == key;
        if (dup) continue;
        seen.push_back(key);
        if (!mv_ok(y, h, mi)) continue;  // IFP window
        CuRec probe;
        probe.x = x;
        probe.y = y;
        probe.w = w;
        probe.h = h;
        probe.is_inter = true;
        std::memcpy(probe.mv, mi.mv, sizeof(probe.mv));
        probe.ref_idx[0] = mi.ref[0];
        probe.ref_idx[1] = mi.ref[1];
        probe.bcw = 2;  // preselection ignores bcw/alt (inter_predict
        probe.alt_hpel = false;  // defaults in the Python preselect)
        std::vector<int32_t> py;
        inter_pred_c(probe, 0, py);
        int64_t sse = 0;
        for (size_t i = 0; i < py.size(); ++i) {
          int64_t d = int64_t(src_y[i]) - py[i];
          sse += d * d;
        }
        scored.push_back({sse, int(idx)});
      }
      std::stable_sort(scored.begin(), scored.end(),
                       [](const std::pair<int64_t, int>& a,
                          const std::pair<int64_t, int>& b) {
                         return a.first < b.first;
                       });
    }

    auto apply_merge = [&](CuRec& cu) {
      const MI& mi = merge_cands[cu.merge_idx];
      std::memcpy(cu.mv, mi.mv, sizeof(cu.mv));
      cu.ref_idx[0] = mi.ref[0];
      cu.ref_idx[1] = mi.ref[1];
      cu.alt_hpel = mi.alt != 0;
      cu.bcw = (mi.ref[0] >= 0 && mi.ref[1] >= 0) ? mi.bcw : 2;
      if (w + h == 12 && cu.ref_idx[0] >= 0 && cu.ref_idx[1] >= 0) {
        cu.ref_idx[1] = -1;
        cu.mv[1][0] = cu.mv[1][1] = 0;
      }
    };

    // fused tq of one trial's residuals (_quant_resid analog)
    auto quant_resid = [&](CuRec& cu, const std::vector<int32_t>& py,
                           const std::vector<int32_t>& pcb,
                           const std::vector<int32_t>& pcr) {
      TScope _qt(&iprof().tq);
      if (getenv("VTE_DBG_QR")) {
        int64_t scb = 0, spb = 0;
        for (size_t i = 0; i < size_t(chh) * cw; ++i) {
          scb += src_cb[i];
          spb += pcb[i];
        }
        std::fprintf(stderr,
                     "NATQR cu(%d,%d %dx%d) mv(%d,%d)(%d,%d) r(%d,%d) "
                     "srccb=%lld predcb=%lld qcb=%d lcb=%f cwcb=%f\n",
                     cu.x, cu.y, cu.w, cu.h, cu.mv[0][0], cu.mv[0][1],
                     cu.mv[1][0], cu.mv[1][1], cu.ref_idx[0], cu.ref_idx[1],
                     (long long)scb, (long long)spb, pp.qp_cb,
                     pp.lmbda / pp.cw_cb, pp.cw_cb);
      }
      std::vector<int32_t> resi(size_t(h) * w), coeff(size_t(h) * w);
      for (size_t i = 0; i < size_t(h) * w; ++i)
        resi[i] = src_y[i] - py[i];
      int cbf = vte_tq_quant(resi.data(), w, h, TR_DCT2, TR_DCT2, pp.qp_y,
                             pp.bit_depth, 1, pp.lmbda, g_soffs.root_cbf,
                             pp.sdh ? 1 : 0, est.s0.data(), est.s1.data(),
                             coeff.data(), pp.dq ? 1 : 0);
      if (cbf) cu.coeff_y.assign(coeff.begin(), coeff.begin() + h * w);
      std::vector<int32_t> cres(size_t(chh) * cw), cco(size_t(chh) * cw);
      for (size_t i = 0; i < size_t(chh) * cw; ++i)
        cres[i] = src_cb[i] - pcb[i];
      int cbf_cb = vte_tq_quant(cres.data(), cw, chh, TR_DCT2, TR_DCT2,
                                pp.qp_cb, pp.bit_depth, 0,
                                pp.lmbda / pp.cw_cb, g_soffs.cbf_cb,
                                pp.sdh ? 1 : 0, est.s0.data(),
                                est.s1.data(), cco.data(), pp.dq ? 1 : 0);
      if (cbf_cb)
        cu.coeff_cb.assign(cco.begin(), cco.begin() + chh * cw);
      for (size_t i = 0; i < size_t(chh) * cw; ++i)
        cres[i] = src_cr[i] - pcr[i];
      int cbf_cr = vte_tq_quant(cres.data(), cw, chh, TR_DCT2, TR_DCT2,
                                pp.qp_cr, pp.bit_depth, 0,
                                pp.lmbda / pp.cw_cr,
                                g_soffs.cbf_cr + (cbf_cb ? 1 : 0),
                                pp.sdh ? 1 : 0, est.s0.data(),
                                est.s1.data(), cco.data(), pp.dq ? 1 : 0);
      if (cbf_cr)
        cu.coeff_cr.assign(cco.begin(), cco.begin() + chh * cw);
      return cbf || cbf_cb || cbf_cr;
    };

    // >maxTB residual trial: implicit 64x64 TU tiling
    // (inter_search.py _quant_resid_mtb)
    auto quant_resid_mtb = [&](CuRec& cu, const std::vector<int32_t>& py,
                               const std::vector<int32_t>& pcb,
                               const std::vector<int32_t>& pcr) {
      int sw = std::min(w, 64), sh_ = std::min(h, 64);
      bool any_c = false;
      cu.mtb.clear();
      std::vector<int32_t> resi(size_t(sh_) * sw), coeff(size_t(sh_) * sw);
      std::vector<int32_t> cres(size_t(sh_ >> 1) * (sw >> 1)),
          cco(size_t(sh_ >> 1) * (sw >> 1));
      for (int ty = 0; ty < h; ty += sh_)
        for (int tx = 0; tx < w; tx += sw) {
          CuRec::MtbTu tu;
          tu.tx = tx;
          tu.ty = ty;
          tu.tw = sw;
          tu.th = sh_;
          for (int i = 0; i < sh_; ++i)
            for (int j = 0; j < sw; ++j)
              resi[size_t(i) * sw + j] =
                  src_y[size_t(ty + i) * w + tx + j] -
                  py[size_t(ty + i) * w + tx + j];
          if (vte_tq_quant(resi.data(), sw, sh_, TR_DCT2, TR_DCT2,
                           pp.qp_y, pp.bit_depth, 1, pp.lmbda, -1,
                           pp.sdh ? 1 : 0, est.s0.data(), est.s1.data(),
                           coeff.data(), pp.dq ? 1 : 0))
            tu.cy.assign(coeff.begin(), coeff.begin() + sh_ * sw);
          int cw2 = sw >> 1, ch2 = sh_ >> 1;
          int cx2 = tx >> 1, cy3 = ty >> 1;
          for (int comp = 1; comp <= 2; ++comp) {
            const std::vector<int32_t>& sc_ = comp == 1 ? src_cb : src_cr;
            const std::vector<int32_t>& pc_ = comp == 1 ? pcb : pcr;
            for (int i = 0; i < ch2; ++i)
              for (int j = 0; j < cw2; ++j)
                cres[size_t(i) * cw2 + j] =
                    sc_[size_t(cy3 + i) * cw + cx2 + j] -
                    pc_[size_t(cy3 + i) * cw + cx2 + j];
            double w_ = comp == 1 ? pp.cw_cb : pp.cw_cr;
            if (vte_tq_quant(cres.data(), cw2, ch2, TR_DCT2, TR_DCT2,
                             comp == 1 ? pp.qp_cb : pp.qp_cr,
                             pp.bit_depth, 0, pp.lmbda / w_, -1,
                             pp.sdh ? 1 : 0, est.s0.data(), est.s1.data(),
                             cco.data(), pp.dq ? 1 : 0)) {
              auto& dst = comp == 1 ? tu.cb : tu.cr;
              dst.assign(cco.begin(), cco.begin() + ch2 * cw2);
            }
          }
          if (!tu.cy.empty() || !tu.cb.empty() || !tu.cr.empty())
            any_c = true;
          cu.mtb.push_back(std::move(tu));
        }
      if (!any_c) cu.mtb.clear();
      cu.has_mtb = any_c;
      cu.root_cbf = any_c;
      return any_c;
    };

    // merge residual trial (add_resid_trial; SBT outside scope)
    auto add_resid_trial = [&](CuRec& cu) {
      prepare_refinement_c(cu);
      std::vector<int32_t> py, pcb, pcr;
      pred_cu_inter_c(cu, 0, py);
      pred_cu_inter_c(cu, 1, pcb);
      pred_cu_inter_c(cu, 2, pcr);
      if (w > 64 || h > 64) {
        bool added = quant_resid_mtb(cu, py, pcb, pcr);
        if (added) trials.push_back(cu);
        return added;
      }
      quant_resid(cu, py, pcb, pcr);
      if (!cu.coeff_y.empty()) {
        cu.root_cbf = true;
        trials.push_back(cu);
        return true;
      }
      return false;
    };

    if (!is_4x4) {
      TScope _t(&iprof().mtrial);
      for (size_t k = 0; k < scored.size() && k < 2; ++k) {
        int idx = scored[k].second;
        CuRec skip_cu;
        skip_cu.x = x;
        skip_cu.y = y;
        skip_cu.w = w;
        skip_cu.h = h;
        skip_cu.is_inter = true;
        skip_cu.skip = true;
        skip_cu.merge = true;
        skip_cu.merge_idx = idx;
        skip_cu.root_cbf = false;
        apply_merge(skip_cu);
        trials.push_back(skip_cu);
        CuRec cu = skip_cu;
        cu.skip = false;
        cu.root_cbf = true;
        add_resid_trial(cu);
      }
    }

    // FIM merge-perfect early out (EncCu.cpp:3119 analog)
    bool merge_perfect = !scored.empty();
    for (const auto& t : trials) merge_perfect &= !t.root_cbf;
    merge_perfect &= !trials.empty();

    if (!merge_perfect && !is_4x4) {
      // MMVD trials: luma-SSE preselection over (base, step, pos), full
      // trial for the winner (inter_search.py MMVD block)
      if (ic->mmvd && !scored.empty()) {
        TScope _t(&iprof().mmvd);
        bool have_m = false;
        int64_t best_mc = 0;
        CuRec best_mcu;
        int n_base = ic->max_merge > 1 ? 2 : 1;
        for (int base = 0; base < n_base; ++base)
          for (int step = 0; step < 3; ++step)
            for (int pos = 0; pos < 4; ++pos) {
              CuRec cu;
              cu.x = x;
              cu.y = y;
              cu.w = w;
              cu.h = h;
              cu.is_inter = true;
              cu.merge = true;
              cu.mmvd = true;
              cu.mmvd_base = base;
              cu.mmvd_step = step;
              cu.mmvd_pos = pos;
              apply_mmvd_c(cu, merge_cands);
              if (!mv_ok_cu(cu)) continue;  // IFP window
              std::vector<int32_t> py;
              inter_pred_c(cu, 0, py);
              int64_t sse = 0;
              for (size_t i = 0; i < py.size(); ++i) {
                int64_t d = int64_t(src_y[i]) - py[i];
                sse += d * d;
              }
              if (!have_m || sse < best_mc) {
                have_m = true;
                best_mc = sse;
                best_mcu = cu;
              }
            }
        if (have_m) {
          CuRec skip_cu = best_mcu;
          skip_cu.skip = true;
          skip_cu.root_cbf = false;
          trials.push_back(skip_cu);
          best_mcu.root_cbf = true;
          add_resid_trial(best_mcu);
        }
      }
      // subblock merge trials: SbTMVP (candidate 0 when active) +
      // affine merge candidates, luma-SSE preselected
      if (ic->max_aff_merge > 0 && w >= 8 && h >= 8) {
        TScope _t(&iprof().sub);
        int n_try = std::min(ic->max_aff_merge, ic->affine_en ? 3 : 1);
        bool have_a = false;
        int64_t best_ac = 0;
        int best_k = 0;
        for (int k = 0; k < n_try; ++k) {
          CuRec cu;
          cu.x = x;
          cu.y = y;
          cu.w = w;
          cu.h = h;
          cu.is_inter = true;
          cu.merge = true;
          cu.affine = true;
          cu.merge_idx = k;
          apply_affine_merge_c(cu);
          if (!mv_ok_cu(cu)) continue;  // IFP window
          std::vector<int32_t> py;
          pred_cu_inter_c(cu, 0, py);
          int64_t sse = 0;
          for (size_t i = 0; i < py.size(); ++i) {
            int64_t d = int64_t(src_y[i]) - py[i];
            sse += d * d;
          }
          if (!have_a || sse < best_ac) {
            have_a = true;
            best_ac = sse;
            best_k = k;
          }
        }
        if (have_a) {
          CuRec skip_cu;
          skip_cu.x = x;
          skip_cu.y = y;
          skip_cu.w = w;
          skip_cu.h = h;
          skip_cu.is_inter = true;
          skip_cu.skip = true;
          skip_cu.merge = true;
          skip_cu.affine = true;
          skip_cu.merge_idx = best_k;
          skip_cu.root_cbf = false;
          apply_affine_merge_c(skip_cu);
          trials.push_back(skip_cu);
          CuRec cu = skip_cu;
          cu.skip = false;
          cu.root_cbf = true;
          add_resid_trial(cu);
        }
      }
      // GEO trials: luma-SSE preselection over split directions x the
      // first uni candidate pairs, skip + residual of the winner
      if (ic->geo_en && ic->is_b) {
        TScope _t(&iprof().geo);
        CuRec probe;
        probe.x = x;
        probe.y = y;
        probe.w = w;
        probe.h = h;
        probe.is_inter = true;
        probe.merge = true;
        probe.geo = true;
        bool have_g = false;
        int64_t best_gc = 0;
        int best_sd = 0, best_i0 = 0, best_i1 = 1;
        if (geo_available_c(probe)) {
          int pairs[4][2] = {{0, 1}, {1, 0}, {0, 2}, {2, 0}};
          int n_pairs = ic->max_geo > 2 ? 4 : 2;
          for (int sd = 0; sd < 64; sd += 4)
            for (int pi = 0; pi < n_pairs; ++pi) {
              CuRec cu = probe;
              cu.geo_split_dir = sd;
              cu.geo_idx0 = pairs[pi][0];
              cu.geo_idx1 = pairs[pi][1];
              apply_geo_c(cu, merge_cands);
              if (ifp_bottom >= 0) {   // IFP window (grid-level check)
                std::vector<MI> grid;
                geo_motion_grid_c(cu, grid);
                if (!mv_ok_grid(cu.y, cu.h, grid, cu.ref_idx)) continue;
              }
              std::vector<int32_t> py;
              geo_pred_c(cu, 0, py);
              int64_t sse = 0;
              for (size_t i = 0; i < py.size(); ++i) {
                int64_t d = int64_t(src_y[i]) - py[i];
                sse += d * d;
              }
              if (getenv("VTE_DBG_GEO"))
                std::fprintf(stderr,
                             "NATGEO (%d,%d %dx%d) sd=%d p=(%d,%d) "
                             "sse=%lld mi0=(%d,%d r%d) mi1=(%d,%d r%d)\n",
                             x, y, w, h, sd, pairs[pi][0], pairs[pi][1],
                             (long long)sse, cu.geo_mi[0].mv[0][0],
                             cu.geo_mi[0].mv[1][0], cu.geo_mi[0].dir(),
                             cu.geo_mi[1].mv[0][0], cu.geo_mi[1].mv[1][0],
                             cu.geo_mi[1].dir());
              if (!have_g || sse < best_gc) {
                have_g = true;
                best_gc = sse;
                best_sd = sd;
                best_i0 = pairs[pi][0];
                best_i1 = pairs[pi][1];
              }
            }
        }
        if (have_g) {
          CuRec skip_cu = probe;
          skip_cu.skip = true;
          skip_cu.root_cbf = false;
          skip_cu.geo_split_dir = best_sd;
          skip_cu.geo_idx0 = best_i0;
          skip_cu.geo_idx1 = best_i1;
          apply_geo_c(skip_cu, merge_cands);
          trials.push_back(skip_cu);
          CuRec cu = skip_cu;
          cu.skip = false;
          cu.root_cbf = true;
          add_resid_trial(cu);
        }
      }
      // AMVP trials: uni per list + bi combination
      int uni_mv[2][2];
      int uni_mvp[2];
      int uni_mvd[2][2];
      bool have_uni[2] = {false, false};
      for (int li = 0; li < (ic->is_b ? 2 : 1); ++li) {
        if (ic->n_ref[li] == 0) continue;
        int amvp[2][2];
        amvp_candidates(x, y, w, h, li, 0, 0, amvp);
        int mv[2], mvp_idx;
        {
          TScope _t(&iprof().me);
          motion_search(src_y.data(), x, y, w, h, amvp, li, 0, mv,
                        &mvp_idx);
        }
        int mvd[2] = {(mv[0] - amvp[mvp_idx][0]) >> 2,
                      (mv[1] - amvp[mvp_idx][1]) >> 2};
        have_uni[li] = true;
        uni_mv[li][0] = mv[0];
        uni_mv[li][1] = mv[1];
        uni_mvp[li] = mvp_idx;
        uni_mvd[li][0] = mvd[0];
        uni_mvd[li][1] = mvd[1];
        CuRec cu;
        cu.x = x;
        cu.y = y;
        cu.w = w;
        cu.h = h;
        cu.is_inter = true;
        cu.merge = false;
        cu.ref_idx[li] = 0;
        cu.mv[li][0] = mv[0];
        cu.mv[li][1] = mv[1];
        std::vector<int32_t> py, pcb, pcr;
        inter_pred_c(cu, 0, py);
        inter_pred_c(cu, 1, pcb);
        inter_pred_c(cu, 2, pcr);
        if (w > 64 || h > 64) {
          quant_resid_mtb(cu, py, pcb, pcr);
        } else {
          bool any = quant_resid(cu, py, pcb, pcr);
          cu.root_cbf = any;
        }
        if (li == 0) {
          cu.mvd[0] = mvd[0];
          cu.mvd[1] = mvd[1];
          cu.mvp_idx = mvp_idx;
        } else {
          cu.mvd1[0] = mvd[0];
          cu.mvd1[1] = mvd[1];
          cu.mvp_idx1 = mvp_idx;
        }
        trials.push_back(cu);
      }
      // 4x8/8x4 cannot be bi-predicted (no bi bin coded): skip the trial
      if (ic->is_b && have_uni[0] && have_uni[1] && w + h > 12) {
        CuRec cu;
        cu.x = x;
        cu.y = y;
        cu.w = w;
        cu.h = h;
        cu.is_inter = true;
        cu.merge = false;
        cu.ref_idx[0] = 0;
        cu.ref_idx[1] = 0;
        std::memcpy(cu.mv[0], uni_mv[0], sizeof(cu.mv[0]));
        std::memcpy(cu.mv[1], uni_mv[1], sizeof(cu.mv[1]));
        cu.mvd[0] = uni_mvd[0][0];
        cu.mvd[1] = uni_mvd[0][1];
        cu.mvp_idx = uni_mvp[0];
        cu.mvd1[0] = uni_mvd[1][0];
        cu.mvd1[1] = uni_mvd[1][1];
        cu.mvp_idx1 = uni_mvp[1];
        cu.bcw = 2;
        // AMVP bi goes through the BDOF-aware prediction path
        std::vector<int32_t> py, pcb, pcr;
        pred_cu_inter_c(cu, 0, py);
        pred_cu_inter_c(cu, 1, pcb);
        pred_cu_inter_c(cu, 2, pcr);
        if (w > 64 || h > 64) {
          quant_resid_mtb(cu, py, pcb, pcr);
        } else {
          bool any = quant_resid(cu, py, pcb, pcr);
          cu.root_cbf = any;
        }
        trials.push_back(cu);
      }
      // SMVD trial: one coded MVD mirrored on the symmetric ref pair
      // (bi-pred, so it is also barred on 4x8/8x4)
      if (ic->is_b && ic->bi_dir_pred && w + h > 12) {
        TScope _t(&iprof().smvd);
        int sym0 = ic->sym_ref[0], sym1 = ic->sym_ref[1];
        CuRec probe;
        probe.x = x;
        probe.y = y;
        probe.w = w;
        probe.h = h;
        probe.is_inter = true;
        probe.smvd = true;
        probe.ref_idx[0] = sym0;
        probe.ref_idx[1] = sym1;
        int amvp0[2][2], amvp1[2][2];
        amvp_candidates(x, y, w, h, 0, sym0, 0, amvp0);
        amvp_candidates(x, y, w, h, 1, sym1, 0, amvp1);
        int mv0[2], mvp0;
        motion_search(src_y.data(), x, y, w, h, amvp0, 0, sym0, mv0,
                      &mvp0);
        int mvd[2] = {(mv0[0] - amvp0[mvp0][0]) >> 2,
                      (mv0[1] - amvp0[mvp0][1]) >> 2};
        if (mvd[0] != 0 || mvd[1] != 0) {
          CuRec cu = probe;
          cu.merge = false;
          cu.mv[0][0] = mv0[0];
          cu.mv[0][1] = mv0[1];
          cu.mv[1][0] = amvp1[0][0] - (mvd[0] << 2);
          cu.mv[1][1] = amvp1[0][1] - (mvd[1] << 2);
          cu.mvd[0] = mvd[0];
          cu.mvd[1] = mvd[1];
          cu.mvp_idx = mvp0;
          cu.mvd1[0] = -mvd[0];
          cu.mvd1[1] = -mvd[1];
          cu.mvp_idx1 = 0;
          if (!mv_ok_cu(cu)) goto smvd_done;  // IFP: mirrored L1 MV
          {
          std::vector<int32_t> py, pcb, pcr;
          pred_cu_inter_c(cu, 0, py);
          pred_cu_inter_c(cu, 1, pcb);
          pred_cu_inter_c(cu, 2, pcr);
          if (w > 64 || h > 64) {
            quant_resid_mtb(cu, py, pcb, pcr);
          } else {
            bool any = quant_resid(cu, py, pcb, pcr);
            cu.root_cbf = any;
          }
          trials.push_back(cu);
          }
        }
      smvd_done:;
      }
      // AMVR trial: integer-pel MVD on the uni-L0 winner
      if (ic->amvr && have_uni[0]) {
        int amvp_i[2][2];
        amvp_candidates(x, y, w, h, 0, 0, 1, amvp_i);
        int mv_int[2] = {((uni_mv[0][0] + 8) >> 4) << 4,
                         ((uni_mv[0][1] + 8) >> 4) << 4};
        int mvd_i[2] = {(mv_int[0] - amvp_i[0][0]) >> 4,
                        (mv_int[1] - amvp_i[0][1]) >> 4};
        if (mvd_i[0] != 0 || mvd_i[1] != 0) {
          CuRec cu;
          cu.x = x;
          cu.y = y;
          cu.w = w;
          cu.h = h;
          cu.is_inter = true;
          cu.merge = false;
          cu.imv = 1;
          cu.ref_idx[0] = 0;
          cu.mv[0][0] = amvp_i[0][0] + (mvd_i[0] << 4);
          cu.mv[0][1] = amvp_i[0][1] + (mvd_i[1] << 4);
          cu.mvd[0] = mvd_i[0];
          cu.mvd[1] = mvd_i[1];
          cu.mvp_idx = 0;
          if (!mv_ok_cu(cu)) goto amvr_done;  // IFP window
          {
          std::vector<int32_t> py, pcb, pcr;
          inter_pred_c(cu, 0, py);
          inter_pred_c(cu, 1, pcb);
          inter_pred_c(cu, 2, pcr);
          if (w > 64 || h > 64) {
            quant_resid_mtb(cu, py, pcb, pcr);
          } else {
            bool any = quant_resid(cu, py, pcb, pcr);
            cu.root_cbf = any;
          }
          trials.push_back(cu);
          }
        amvr_done:;
        }
      }
      // affine AMVP trials: gradient-based CPMV search per type/list
      // (InterSearch::xAffineMotionEstimation analog, uni prediction)
      if (ic->affine_en && w >= 16 && h >= 16 && ifp_bottom < 0) {
        TScope _t(&iprof().affamvp);
        int n_types = ic->affine_type_en ? 2 : 1;
        for (int aff_type = 0; aff_type < n_types; ++aff_type) {
          int n_cp = aff_type ? 3 : 2;
          for (int li = 0; li < (ic->is_b ? 2 : 1); ++li) {
            if (ic->n_ref[li] == 0) continue;
            CuRec probe;
            probe.x = x;
            probe.y = y;
            probe.w = w;
            probe.h = h;
            probe.is_inter = true;
            probe.merge = false;
            probe.affine = true;
            probe.affine_type = aff_type;
            probe.ref_idx[li] = 0;
            std::vector<std::array<int, 6>> mvps;
            affine_amvp_list_c(probe, li, 0, mvps);
            int cp[3][2];
            affine_search_c(src_y.data(), probe, li, mvps[0],
                            aff_type == 1, w, h, cp);
            const auto& pc = mvps[0];
            int d0[2] = {(cp[0][0] - pc[0]) >> 2, (cp[0][1] - pc[1]) >> 2};
            int mvds[3][2] = {{d0[0], d0[1]}, {0, 0}, {0, 0}};
            for (int i = 1; i < n_cp; ++i) {
              mvds[i][0] = ((cp[i][0] - pc[i * 2]) >> 2) - d0[0];
              mvds[i][1] = ((cp[i][1] - pc[i * 2 + 1]) >> 2) - d0[1];
            }
            bool all_zero = true;
            for (int i = 0; i < n_cp; ++i)
              all_zero &= mvds[i][0] == 0 && mvds[i][1] == 0;
            if (all_zero) continue;
            CuRec cu;
            cu.x = x;
            cu.y = y;
            cu.w = w;
            cu.h = h;
            cu.is_inter = true;
            cu.merge = false;
            cu.affine = true;
            cu.affine_type = aff_type;
            cu.ref_idx[li] = 0;
            for (int i = 0; i < 3; ++i) {
              cu.aff_mvds[li][i][0] = i < n_cp ? mvds[i][0] : 0;
              cu.aff_mvds[li][i][1] = i < n_cp ? mvds[i][1] : 0;
            }
            if (li == 0)
              cu.mvp_idx = 0;
            else
              cu.mvp_idx1 = 0;
            derive_affine_amvp_mvs_c(cu);
            std::vector<int32_t> py, pcb, pcr;
            pred_cu_inter_c(cu, 0, py);
            pred_cu_inter_c(cu, 1, pcb);
            pred_cu_inter_c(cu, 2, pcr);
            if (w > 64 || h > 64) {
              quant_resid_mtb(cu, py, pcb, pcr);
            } else {
              bool any = quant_resid(cu, py, pcb, pcr);
              cu.root_cbf = any;
            }
            if (cu.root_cbf) trials.push_back(cu);
          }
        }
      }
    }

    // -- trial evaluation (_finish_inter_trials) --
    if (getenv("VTE_DBG_TRIALS")) {
      std::string line;
      char buf[160];
      for (const CuRec& t : trials) {
        std::snprintf(buf, sizeof buf,
                      "%s%s%s%s%s%s%s mv((%d, %d), (%d, %d)) r(%d, %d)",
                      t.skip ? "S" : "", t.merge ? "M" : "",
                      t.mmvd ? "V" : "", t.geo ? "G" : "",
                      t.affine ? "A" : "", t.smvd ? "D" : "",
                      t.imv ? "I" : "", t.mv[0][0], t.mv[0][1],
                      t.mv[1][0], t.mv[1][1], t.ref_idx[0], t.ref_idx[1]);
        if (!line.empty()) line += " | ";
        line += buf;
      }
      std::fprintf(stderr, "NATTRIALS (%d,%d %dx%d) n=%zu %s\n", x, y, w,
                   h, trials.size(), line.c_str());
    }
    SSnap state0;
    s_save(x, y, std::max(w, h), state0);
    EstSnap est0;
    est_save(est, est0);

    bool have_best = false;
    double best_cost = 0;
    CuRec best_cu;
    SSnap best_state;
    EstSnap best_est;
    auto eval = [&](std::vector<CuRec>& cands) {
      for (CuRec& cu : cands) {
        s_restore(state0);
        est_load(est, est0);
        int64_t b0 = est.frac;
        if (!est_enc_cu_inter(cu, part)) continue;
        double bits = double(est.frac - b0) / double(1 << 15);
        int64_t dy_ = 0, dcb = 0, dcr = 0;
        for (int i = 0; i < h; ++i)
          for (int j = 0; j < w; ++j) {
            int64_t d = int64_t(src_y[size_t(i) * w + j]) -
                        ps.rec[0][size_t(y + i) * ps.W + x + j];
            dy_ += d * d;
          }
        for (int i = 0; i < chh; ++i)
          for (int j = 0; j < cw; ++j) {
            int64_t d = int64_t(src_cb[size_t(i) * cw + j]) -
                        ps.rec[1][size_t(cy2 + i) * (ps.W >> 1) + cx + j];
            dcb += d * d;
            int64_t d2 = int64_t(src_cr[size_t(i) * cw + j]) -
                         ps.rec[2][size_t(cy2 + i) * (ps.W >> 1) + cx + j];
            dcr += d2 * d2;
          }
        double dist =
            double(dy_) + pp.cw_cb * double(dcb) + pp.cw_cr * double(dcr);
        double cost = dist + pp.lmbda * bits;
        if (!have_best || cost < best_cost) {
          have_best = true;
          best_cost = cost;
          best_cu = cu;
          s_save(x, y, std::max(w, h), best_state);
          est_save(est, best_est);
        }
      }
    };
    {
      TScope _t(&iprof().evalt);
      eval(trials);
    }

    // intra competition, gated on the inter winner coding residual.
    // >maxTB CUs rely on the merge/AMVP trials alone; large CUs are
    // excluded per the reference's mode control (EncModeCtrl.cpp:997 —
    // complex intra is implausible in inter pictures)
    bool try_intra = (w <= 64 && h <= 64) && w * h <= 2048 &&
                     (!have_best || !best_cu.coeff_y.empty() ||
                      !best_cu.coeff_cb.empty() || !best_cu.coeff_cr.empty());
    if (try_intra) {
      std::vector<CuRec> intra_trials;
      std::vector<int32_t> top(2 * w + 3), left(2 * h + 3);
      vte_build_refs(ps.rec[0], ps.H, ps.W, x, y, w, h, ps.coded_luma,
                     ps.uh, ps.uw, 4, pp.bit_depth, 0, -1, -1, top.data(),
                     left.data());
      int mpm[6];
      get_mpms(ps, x, y, w, h, pp.ctu_size, mpm);
      auto keyf = [&](int m, int64_t s) {
        double mb = 7.0;
        for (int i = 0; i < 6; ++i)
          if (mpm[i] == m) { mb = 1.5 + i; break; }
        return double(s) + pp.lmbda_sad * mb;
      };
      // subset sweep: planar/DC + even angular, then odd neighbors of
      // the 3 strongest (mirrors the Python fallback)
      std::vector<int32_t> modes0 = {0, 1};
      for (int m = 2; m < N_MODES; m += 2) modes0.push_back(m);
      std::vector<int64_t> satds0(modes0.size());
      vte_presel_satd(top.data(), int(top.size()), left.data(),
                      int(left.size()), src_y.data(), modes0.data(),
                      int(modes0.size()), w, h, pp.bit_depth, 1, 0,
                      satds0.data());
      std::vector<std::pair<double, int>> keyed;
      for (size_t i = 0; i < modes0.size(); ++i)
        keyed.push_back({keyf(modes0[i], satds0[i]), modes0[i]});
      std::vector<std::pair<double, int>> r0 = keyed;
      std::stable_sort(r0.begin(), r0.end(),
                       [](const std::pair<double, int>& a,
                          const std::pair<double, int>& b) {
                         return a.first < b.first;
                       });
      std::vector<int32_t> odds;
      auto have_mode = [&](int m) {
        for (const auto& kv : keyed)
          if (kv.second == m) return true;
        for (int o : odds)
          if (o == m) return true;
        return false;
      };
      for (int i = 0; i < 3 && i < int(r0.size()); ++i) {
        int m = r0[i].second;
        for (int n : {m - 1, m + 1})
          if (2 <= n && n < N_MODES && !have_mode(n)) odds.push_back(n);
      }
      if (!odds.empty()) {
        std::vector<int64_t> satds1(odds.size());
        vte_presel_satd(top.data(), int(top.size()), left.data(),
                        int(left.size()), src_y.data(), odds.data(),
                        int(odds.size()), w, h, pp.bit_depth, 1, 0,
                        satds1.data());
        for (size_t i = 0; i < odds.size(); ++i)
          keyed.push_back({keyf(odds[i], satds1[i]), odds[i]});
      }
      std::vector<std::pair<double, int>> ranked = keyed;
      std::stable_sort(ranked.begin(), ranked.end(),
                       [](const std::pair<double, int>& a,
                          const std::pair<double, int>& b) {
                         return a.first < b.first;
                       });
      int n_try = std::max(1, std::min(2, pp.n_full_rd));
      std::vector<int> modes_try;
      for (int i = 0; i < n_try; ++i) modes_try.push_back(ranked[i].second);
      bool has_planar = false;
      for (int m : modes_try) has_planar |= m == PLANAR;
      if (!has_planar) modes_try.push_back(PLANAR);
      int th0 = TR_DCT2, tv0 = TR_DCT2;
      if (pp.implicit_mts) {
        th0 = (4 <= w && w <= 16) ? TR_DST7 : TR_DCT2;
        tv0 = (4 <= h && h <= 16) ? TR_DST7 : TR_DCT2;
      }
      for (int mode : modes_try) {
        CuRec cu;
        cu.x = x;
        cu.y = y;
        cu.w = w;
        cu.h = h;
        cu.is_inter = false;
        cu.luma_mode = mode;
        std::vector<int32_t> pred(size_t(h) * w);
        intra::predict(top.data(), int(top.size()), left.data(),
                       int(left.size()), mode, w, h, pp.bit_depth, true, 0,
                       -1, -1, false, -1, pred.data());
        std::vector<int32_t> resi(size_t(h) * w), coeff(size_t(h) * w);
        for (size_t i = 0; i < size_t(h) * w; ++i)
          resi[i] = src_y[i] - pred[i];
        int cbf = vte_tq_quant(resi.data(), w, h, th0, tv0, pp.qp_y,
                               pp.bit_depth, 1, pp.lmbda, g_soffs.cbf_y,
                               pp.sdh ? 1 : 0, est.s0.data(),
                               est.s1.data(), coeff.data(), pp.dq ? 1 : 0);
        if (cbf) cu.coeff_y.assign(coeff.begin(), coeff.begin() + h * w);
        // chroma (DM mode), predicted from the current rec state
        std::vector<int32_t> pc;
        for (int comp = 1; comp <= 2; ++comp) {
          intra_pred_fallback(cu, comp, pc);
          std::vector<int32_t> cres(size_t(chh) * cw), cco(size_t(chh) * cw);
          const std::vector<int32_t>& sc = comp == 1 ? src_cb : src_cr;
          for (size_t i = 0; i < size_t(chh) * cw; ++i)
            cres[i] = sc[i] - pc[i];
          double w_ = comp == 1 ? pp.cw_cb : pp.cw_cr;
          int cctx = comp == 1 ? g_soffs.cbf_cb
                               : g_soffs.cbf_cr +
                                     (!cu.coeff_cb.empty() ? 1 : 0);
          int cbf_c = vte_tq_quant(
              cres.data(), cw, chh, TR_DCT2, TR_DCT2,
              comp == 1 ? pp.qp_cb : pp.qp_cr, pp.bit_depth, 0,
              pp.lmbda / w_, cctx, pp.sdh ? 1 : 0, est.s0.data(),
              est.s1.data(), cco.data(), pp.dq ? 1 : 0);
          if (cbf_c) {
            if (comp == 1)
              cu.coeff_cb.assign(cco.begin(), cco.begin() + chh * cw);
            else
              cu.coeff_cr.assign(cco.begin(), cco.begin() + chh * cw);
          }
        }
        intra_trials.push_back(cu);
      }
      {
        TScope _t(&iprof().intra_t);
        eval(intra_trials);
      }
    }
    if (!have_best) return 1e300;  // no valid trial (should not happen)
    s_restore(best_state);
    est_load(est, best_est);
    cu_out = best_cu;
    return best_cost;
  }

  // -- recursive tree search (intra_encoder.py _rd_node) --
  struct NodeResult {
    Node node;
    double cost;
  };
  bool rd_node(int x, int y, int w, int h, const PartInfo& part,
               NodeResult& out, double parent_budget) {
    int tidx = part.tree_type == CHROMA_TREE ? 2 : pp.tree_idx;
    bool can[6];
    split_options_full(ps, pp, x, y, w, h, part, tidx, can);
    // SCIPU-free split filter (LDT_INHERIT only)
    std::vector<int> tries;
    for (int s = 0; s < 6; ++s) {
      if (!can[s]) continue;
      if (s == NO_SPLIT || signal_mode_cons(w, h, s, part.mode_type,
                                            ic == nullptr) == LDT_INHERIT)
        tries.push_back(s);
    }
    if (tries.empty()) return false;
    // device RD plan: force the planned split decision (luma tree only;
    // the chroma tree is still searched exactly)
    if (part.tree_type != CHROMA_TREE && tries.size() > 1) {
      const int32_t* prow = plan_lookup(x, y, w, h);
      if (prow) {
        int want = prow[2] ? QT_SPLIT : NO_SPLIT;
        for (int s : tries)
          if (s == want) { tries = {want}; break; }
      }
    }

    // single candidate (planned or forced): run in place, no snapshots
    const bool one_try = tries.size() == 1;
    SSnap state0;
    EstSnap est0;
    if (!one_try) {
      s_save(x, y, std::max(w, h), state0);
      est_save(est, est0);
    }

    bool have_best = false;
    double best_cost = 0;
    Node best_node;
    SSnap best_after;
    EstSnap best_est;
    bool early_skip = false;
    int impl = implicit_split_of(ps, pp, x, y, w, h, part, tidx);
    // EncModeCtrl split-cost bound (EncCu::xCheckModeSplit analog):
    // skip TT_X when same-direction BT_X was evaluated and lost
    bool bt_tried[2] = {false, false};     // [BT_H, BT_V]
    bool bt_improved[2] = {false, false};
    const bool tt_gate = ic == nullptr;    // intra slices only

    for (size_t ti = 0; ti < tries.size(); ++ti) {
      int split = tries[ti];
      if (tt_gate && split == TT_H && bt_tried[0] && !bt_improved[0])
        continue;
      if (tt_gate && split == TT_V && bt_tried[1] && !bt_improved[1])
        continue;
      if (ti > 0) {
        s_restore(state0);
        est_load(est, est0);
      }
      Node node;
      node.x = x;
      node.y = y;
      node.w = w;
      node.h = h;
      node.split_mode = split;
      int64_t b0 = est.frac;
      write_split_mode(est, ps, pp, x, y, w, h, part, split, tidx);
      double cost = pp.lmbda * double(est.frac - b0) / double(1 << 15);
      if (split == NO_SPLIT) {
        node.has_cu = true;
        node.cu.x = x;
        node.cu.y = y;
        node.cu.w = w;
        node.cu.h = h;
        double cu_cost;
        if (part.tree_type == CHROMA_TREE)
          cu_cost = rd_cu_chroma(node.cu, part);
        else if (ic)
          cu_cost = rd_cu_inter(node.cu, part);
        else
          cu_cost = rd_cu_intra(node.cu, part);
        cost += cu_cost;
        // EncModeCtrl earlySkip: a SKIP winner at this level makes
        // deeper partitions near-certain losers — don't descend
        if (ic && node.cu.skip && (!have_best || cost < best_cost))
          early_skip = true;
      } else {
        bool is_impl = split == impl;
        int geo[4][4], ng;
        split_geometry(split, x, y, w, h, geo, &ng);
        bool aborted = false;
        for (int idx = 0; idx < ng; ++idx) {
          int cx = geo[idx][0], cy = geo[idx][1];
          int cw = geo[idx][2], chh = geo[idx][3];
          if (cx >= ps.W || cy >= ps.H) continue;
          PartInfo cp = part.child(split, idx, is_impl);
          NodeResult cres;
          // recursive split-cost bound (EncCu::xCheckModeSplit analog):
          // the child search inherits the remaining budget and gives up
          // as soon as its own accumulation can no longer beat it
          double limit = have_best ? std::min(best_cost, parent_budget)
                                   : parent_budget;
          if (!rd_node(cx, cy, cw, chh, cp, cres, limit - cost))
            return false;
          node.children.push_back(std::move(cres.node));
          cost += cres.cost;
          if (cost >= limit) {
            aborted = true;
            break;
          }
        }
        if (aborted) {
          if (split == BT_H) bt_tried[0] = true;
          if (split == BT_V) bt_tried[1] = true;
          continue;
        }
      }
      if (split == BT_H || split == BT_V) {
        int bi = split == BT_V ? 1 : 0;
        bt_tried[bi] = true;
        bt_improved[bi] = !have_best || cost < best_cost;
      }
      if (!have_best || cost < best_cost) {
        have_best = true;
        best_cost = cost;
        best_node = std::move(node);
        if (!one_try) {
          s_save(x, y, std::max(w, h), best_after);
          est_save(est, best_est);
        }
      }
      if (early_skip) break;
    }
    if (!have_best) {
      // every candidate hit the inherited budget: report an infinite
      // cost (the parent aborts and discards this subtree; any state
      // this subtree mutated is rolled back by the ancestor that owns
      // the finite budget when it restores its own snapshot)
      if (!one_try) {
        s_restore(state0);
        est_load(est, est0);
      }
      out.node = Node();
      out.cost = 1e300;
      return true;
    }
    if (!one_try) {
      s_restore(best_after);
      est_load(est, best_est);
    }
    out.node = std::move(best_node);
    out.cost = best_cost;
    return true;
  }

  // -- CTU entry (intra_encoder.py search_ctu) --
  bool search(int ctu_x, int ctu_y, Node& out) {
    SSnap snap;
    s_save(ctu_x, ctu_y, pp.ctu_size, snap);
    luma64.clear();
    bool ok = true;
    if (pp.dual_tree) {
      out = Node();
      out.x = ctu_x;
      out.y = ctu_y;
      out.w = pp.ctu_size;
      out.h = pp.ctu_size;
      out.split_mode = -2;  // dual-tree container marker
      int unit = std::min(64, pp.ctu_size);
      int qtd = pp.ctu_size > 64 ? 1 : 0;
      for (int uy = ctu_y; uy < ctu_y + pp.ctu_size && ok; uy += unit)
        for (int ux = ctu_x; ux < ctu_x + pp.ctu_size && ok; ux += unit) {
          if (ux >= ps.W || uy >= ps.H) continue;
          PartInfo pl;
          pl.qt_depth = qtd;
          pl.mode_type = MODE_INTRA;
          pl.tree_type = TREE_L;
          NodeResult r;
          ok = rd_node(ux, uy, unit, unit, pl, r, 1e300);
          if (!ok) break;
          luma64.push_back(
              {ux, uy, r.node.split_mode,
               r.node.split_mode == NO_SPLIT && r.node.cu.isp_mode != 0});
          out.children.push_back(std::move(r.node));
          PartInfo pc;
          pc.qt_depth = qtd;
          pc.mode_type = MODE_INTRA;
          pc.tree_type = CHROMA_TREE;
          NodeResult rc;
          ok = rd_node(ux, uy, unit, unit, pc, rc, 1e300);
          if (!ok) break;
          out.children.push_back(std::move(rc.node));
        }
    } else {
      PartInfo p0;
      NodeResult r;
      ok = rd_node(ctu_x, ctu_y, pp.ctu_size, pp.ctu_size, p0, r, 1e300);
      if (ok) out = std::move(r.node);
    }
    // commit mode: leave the chosen tree's reconstruction samples in
    // the picture (the Python replay then skips finish_cu's
    // re-reconstruction; CuData.recon_done) but restore the attribute
    // maps — the replay marks those progressively, and the writer's
    // neighbor availability depends on that ordering.  The motion
    // field/HMVP parallel the maps: the replay re-derives them.
    if (commit_state) {
      if (!commit_keep) {
        region_restore_maps(ps, snap.reg);
        if (ic) {
          mf_restore(*ic, snap.mf);
          hmvp = snap.hm;
        }
      }
      // commit_keep (wavefront phase 1): the attribute maps / motion
      // field / HMVP keep the committed state so wavefront-dependent
      // CTUs search against it; the caller resets the picture arrays
      // wholesale before the serial replay pass.
    } else {
      s_restore(snap);
    }
    return ok;
  }
  bool commit_state = false;
  bool commit_keep = false;
  // EncModeCtrl save/load cache: (x, y, w, h, tree_type) -> trial list
  std::map<std::array<int, 5>, std::vector<TrialMode>> mode_cache;
};

// ---- serialization -------------------------------------------------------
struct Writer {
  int32_t* tree;
  int tree_cap, tree_n = 0;
  int32_t* coeff;
  int coeff_cap, coeff_n = 0;
  bool ok = true;
  void put(int32_t v) {
    if (tree_n >= tree_cap) { ok = false; return; }
    tree[tree_n++] = v;
  }
  void put_coeff(const std::vector<int32_t>& c) {
    if (coeff_n + int(c.size()) > coeff_cap) { ok = false; return; }
    std::memcpy(coeff + coeff_n, c.data(), c.size() * 4);
    coeff_n += int(c.size());
  }
};

static void serialize(const Node& n, Writer& w, bool chroma_tree,
                      bool inter_slice = false) {
  w.put(n.split_mode);
  if (!w.ok) return;
  if (n.split_mode != NO_SPLIT) {
    for (const auto& c : n.children) serialize(c, w, chroma_tree,
                                               inter_slice);
    return;
  }
  const CuRec& cu = n.cu;
  if (inter_slice) {
    w.put(cu.is_inter ? 1 : 0);
    if (cu.is_inter) {
      w.put(cu.skip ? 1 : 0);
      w.put(cu.merge ? 1 : 0);
      w.put(cu.merge_idx);
      w.put(cu.mmvd ? 1 : 0);
      w.put(cu.mmvd_base);
      w.put(cu.mmvd_step);
      w.put(cu.mmvd_pos);
      w.put(cu.geo ? 1 : 0);
      w.put(cu.geo_split_dir);
      w.put(cu.geo_idx0);
      w.put(cu.geo_idx1);
      w.put(cu.affine ? 1 : 0);
      w.put(cu.affine_type);
      w.put(cu.sbtmvp ? 1 : 0);
      if (cu.affine && !cu.merge)
        for (int li = 0; li < 2; ++li)
          for (int i = 0; i < 3; ++i) {
            w.put(cu.aff_mvds[li][i][0]);
            w.put(cu.aff_mvds[li][i][1]);
          }
      w.put(cu.mv[0][0]);
      w.put(cu.mv[0][1]);
      w.put(cu.mv[1][0]);
      w.put(cu.mv[1][1]);
      w.put(cu.ref_idx[0]);
      w.put(cu.ref_idx[1]);
      w.put(cu.mvd[0]);
      w.put(cu.mvd[1]);
      w.put(cu.mvp_idx);
      w.put(cu.mvd1[0]);
      w.put(cu.mvd1[1]);
      w.put(cu.mvp_idx1);
      w.put(cu.bcw);
      w.put(cu.alt_hpel ? 1 : 0);
      w.put(cu.imv);
      w.put(cu.smvd ? 1 : 0);
      w.put(cu.root_cbf ? 1 : 0);
      w.put(int(cu.dmvr.size()));
      for (const auto& r : cu.dmvr)
        for (int k = 0; k < 5; ++k) w.put(r[k]);
      w.put(cu.has_mtb ? 1 : 0);
      if (cu.has_mtb) {
        w.put(int(cu.mtb.size()));
        for (const auto& tu : cu.mtb) {
          w.put(tu.tx);
          w.put(tu.ty);
          w.put(tu.tw);
          w.put(tu.th);
          w.put(tu.cy.empty() ? 0 : 1);
          if (!tu.cy.empty()) w.put_coeff(tu.cy);
          w.put(tu.cb.empty() ? 0 : 1);
          w.put(tu.cr.empty() ? 0 : 1);
          if (!tu.cb.empty()) w.put_coeff(tu.cb);
          if (!tu.cr.empty()) w.put_coeff(tu.cr);
        }
        return;  // no regular coeff section for >maxTB CUs
      }
    } else {
      w.put(cu.luma_mode);
      w.put(cu.chroma_dir);
      w.put(cu.lfnst_idx);
      w.put(cu.joint_cbcr);
    }
    w.put(cu.coeff_y.empty() ? 0 : 1);
    if (!cu.coeff_y.empty()) w.put_coeff(cu.coeff_y);
    w.put(cu.coeff_cb.empty() ? 0 : 1);
    w.put(cu.coeff_cr.empty() ? 0 : 1);
    if (!cu.coeff_cb.empty()) w.put_coeff(cu.coeff_cb);
    if (!cu.coeff_cr.empty()) w.put_coeff(cu.coeff_cr);
    return;
  }
  if (chroma_tree) {
    w.put(cu.luma_mode);  // center co-located luma mode (DM source)
    w.put(cu.chroma_dir);
    w.put(cu.cclm_allowed ? 1 : 0);
    w.put(cu.lfnst_idx);
    w.put(cu.joint_cbcr);
    w.put(cu.coeff_cb.empty() ? 0 : 1);
    w.put(cu.coeff_cr.empty() ? 0 : 1);
    if (!cu.coeff_cb.empty()) w.put_coeff(cu.coeff_cb);
    if (!cu.coeff_cr.empty()) w.put_coeff(cu.coeff_cr);
    return;
  }
  w.put(cu.luma_mode);
  w.put(cu.mip_flag ? 1 : 0);
  w.put(cu.mip_t ? 1 : 0);
  w.put(cu.ref_line);
  w.put(cu.lfnst_idx);
  w.put(cu.joint_cbcr);
  w.put(cu.isp_mode);
  if (cu.isp_mode) {
    for (const auto& c : cu.isp_coeffs) {
      w.put(c.empty() ? 0 : 1);
      if (!c.empty()) w.put_coeff(c);
    }
  } else {
    w.put(cu.coeff_y.empty() ? 0 : 1);
    if (!cu.coeff_y.empty()) w.put_coeff(cu.coeff_y);
  }
  if (!cu.luma_only) {
    w.put(cu.chroma_dir);
    w.put(cu.coeff_cb.empty() ? 0 : 1);
    w.put(cu.coeff_cr.empty() ? 0 : 1);
    if (!cu.coeff_cb.empty()) w.put_coeff(cu.coeff_cb);
    if (!cu.coeff_cr.empty()) w.put_coeff(cu.coeff_cr);
  }
}

}  // namespace ctusearch

extern "C" {

void vte_search_prof_get(double* out3) {
  out3[0] = ctusearch::g_prof_luma;
  out3[7] = ctusearch::g_prof_isp;
  out3[8] = ctusearch::g_prof_lpresel;
  out3[1] = ctusearch::g_prof_chroma;
  out3[2] = ctusearch::g_prof_total;
  out3[3] = ctusearch::g_prof_cpred;
  out3[4] = ctusearch::g_prof_cclm;
  out3[5] = ctusearch::g_prof_csatd;
  out3[6] = ctusearch::g_prof_ctrial;
}

void vte_search_init(const int32_t* offs) {
  using namespace ctusearch;
  g_soffs.split = offs[0];
  g_soffs.qt = offs[1];
  g_soffs.hv = offs[2];
  g_soffs.h12 = offs[3];
  g_soffs.mpm_flag = offs[4];
  g_soffs.planar_flag = offs[5];
  g_soffs.chroma_mode = offs[6];
  g_soffs.cclm_flag = offs[7];
  g_soffs.cclm_idx = offs[8];
  g_soffs.cbf_y = offs[9];
  g_soffs.cbf_cb = offs[10];
  g_soffs.cbf_cr = offs[11];
  g_soffs.mip_flag = offs[12];
  g_soffs.mrl_idx = offs[13];
  g_soffs.lfnst = offs[14];
  g_soffs.jccr = offs[15];
  g_soffs.isp = offs[16];
  g_soffs.num_ctx = offs[17];
}

// inter syntax context-set bases (second init call; same offsets table
// convention as vte_search_init)
void vte_search_init_inter(const int32_t* offs) {
  using namespace ctusearch;
  g_soffs.skip_flag = offs[0];
  g_soffs.pred_mode = offs[1];
  g_soffs.merge_flag = offs[2];
  g_soffs.merge_idx = offs[3];
  g_soffs.inter_dir = offs[4];
  g_soffs.ref_pic = offs[5];
  g_soffs.mvd = offs[6];
  g_soffs.mvp_idx = offs[7];
  g_soffs.root_cbf = offs[8];
  g_soffs.sub_merge = offs[9];
  g_soffs.reg_merge = offs[10];
  g_soffs.mmvd_flag = offs[11];
  g_soffs.mmvd_merge = offs[12];
  g_soffs.mmvd_step = offs[13];
  g_soffs.ciip_flag = offs[14];
  g_soffs.smvd_flag = offs[15];
  g_soffs.aff_flag = offs[16];
  g_soffs.aff_type = offs[17];
  g_soffs.imv_flag = offs[18];
  g_soffs.bcw_idx = offs[19];
  g_soffs.delta_qp = offs[20];
  g_soffs.aff_mrg_idx = offs[21];
}

// per-picture inter state; returns an opaque handle for vte_search_ctu
void* vte_inter_new(
    int pic_w, int pic_h, int ctu_size, int bit_depth, int cur_poc,
    int is_b, int max_merge, int n_ref0, int n_ref1,
    const int64_t* ref_plane_ptrs /* [2][8][3] */,
    const int32_t* ref_pocs /* [2][8] */, int tmvp_en,
    const uint8_t* col_valid, const int32_t* col_mv, const int8_t* col_ref,
    int col_poc, int col_from_l0, const int32_t* col_ref_pocs /* [2][8] */,
    int col_nref0, int col_nref1, int check_ldc, int mvd_l1_zero,
    int dmvr_on, int bdof_on, int search_range, uint8_t* mf_valid,
    int32_t* mf_mv, int8_t* mf_ref, int8_t* mf_bcw, uint8_t* mf_alt,
    uint8_t* mf_skip, uint8_t* mf_isaff, int uw, int uh) {
  using namespace ctusearch;
  InterCtx* ic = new InterCtx();
  ic->pic_w = pic_w;
  ic->pic_h = pic_h;
  ic->ctu_size = ctu_size;
  ic->bit_depth = bit_depth;
  ic->cur_poc = cur_poc;
  ic->is_b = is_b != 0;
  ic->max_merge = max_merge;
  ic->n_ref[0] = n_ref0;
  ic->n_ref[1] = n_ref1;
  for (int li = 0; li < 2; ++li)
    for (int r = 0; r < 8; ++r) {
      for (int c = 0; c < 3; ++c)
        ic->ref_plane[li][r][c] = reinterpret_cast<const int32_t*>(
            ref_plane_ptrs[(li * 8 + r) * 3 + c]);
      ic->ref_poc[li][r] = ref_pocs[li * 8 + r];
      ic->col_ref_poc[li][r] = col_ref_pocs[li * 8 + r];
    }
  if (tmvp_en) {
    ic->col_valid = col_valid;
    ic->col_mv = col_mv;
    ic->col_ref = col_ref;
  }
  ic->col_poc = col_poc;
  ic->col_from_l0 = col_from_l0;
  (void)col_nref0;
  (void)col_nref1;
  ic->check_ldc = check_ldc != 0;
  ic->mvd_l1_zero = mvd_l1_zero != 0;
  ic->dmvr_on = dmvr_on != 0;
  ic->bdof_on = bdof_on != 0;
  ic->search_range = search_range;
  ic->mf_valid = mf_valid;
  ic->mf_mv = mf_mv;
  ic->mf_ref = mf_ref;
  ic->mf_bcw = mf_bcw;
  ic->mf_alt = mf_alt;
  ic->mf_skip = mf_skip;
  ic->mf_isaff = mf_isaff;
  ic->uw = uw;
  ic->uh = uh;
  return ic;
}

void vte_inter_free(void* h) {
  delete reinterpret_cast<ctusearch::InterCtx*>(h);
}

// medium-toolset flags + the affine motion-field mirror arrays
void vte_inter_set_tools(void* h, int mmvd, int fpel_mmvd, int geo_en,
                         int max_geo, int smvd_en, int bi_dir, int sym0,
                         int sym1, int amvr, int affine_en,
                         int affine_type_en, int affine_amvr_en,
                         int prof_en, int sbtmvp_active, int max_aff_merge,
                         int ciip_en, int bcw_en, uint8_t* aff_valid,
                         int32_t* aff_data) {
  auto* ic = reinterpret_cast<ctusearch::InterCtx*>(h);
  ic->mmvd = mmvd != 0;
  ic->fpel_mmvd = fpel_mmvd != 0;
  ic->geo_en = geo_en != 0;
  ic->max_geo = max_geo;
  ic->smvd_en = smvd_en != 0;
  ic->bi_dir_pred = bi_dir != 0;
  ic->sym_ref[0] = sym0;
  ic->sym_ref[1] = sym1;
  ic->amvr = amvr != 0;
  ic->affine_en = affine_en != 0;
  ic->affine_type_en = affine_type_en != 0;
  ic->affine_amvr_en = affine_amvr_en != 0;
  ic->prof_en = prof_en != 0;
  ic->sbtmvp_active = sbtmvp_active != 0;
  ic->max_aff_merge = max_aff_merge;
  ic->ciip_en = ciip_en != 0;
  ic->bcw_en = bcw_en != 0;
  ic->mf_aff_valid = aff_valid;
  ic->mf_aff_data = aff_data;
}

void vte_inter_set_me(void* h, int li, int ri, const int32_t* tab, int nbx,
                      int nby, int bs, int use_dev) {
  auto* ic = reinterpret_cast<ctusearch::InterCtx*>(h);
  ic->me_tab[li][ri] = tab;
  ic->me_nbx[li][ri] = nbx;
  ic->me_nby[li][ri] = nby;
  ic->me_bs = bs;
  ic->use_dev_me = use_dev != 0;
}

// test hook: BDOF block prediction (bdof_block_c) on full planes
void vte_test_bdof(const int32_t* ref0, const int32_t* ref1, int ph,
                   int pw, int x, int y, int w, int h, int mv0x, int mv0y,
                   int mv1x, int mv1y, int bit_depth, int alt,
                   int32_t* out) {
  using namespace ctusearch;
  Searcher s;
  s.pp.bit_depth = bit_depth;
  Searcher::BdofSrc a{ref0, ph, pw, x, y, mv0x, mv0y};
  Searcher::BdofSrc b{ref1, ph, pw, x, y, mv1x, mv1y};
  std::vector<int32_t> blk;
  s.bdof_block_c(a, b, w, h, alt != 0, blk);
  std::memcpy(out, blk.data(), blk.size() * 4);
}

// full intra CTU search; returns 0 on success, <0 on overflow/error
int vte_search_ctu(
    int pic_w, int pic_h, int bit_depth, int ctu_x, int ctu_y, int ctu_size,
    int32_t* rec_y, int32_t* rec_cb, int32_t* rec_cr, const int32_t* src_y,
    const int32_t* src_cb, const int32_t* src_cr, uint8_t* coded_luma,
    int32_t* intra_mode, uint8_t* is_intra, uint8_t* is_mip, int32_t* cu_w,
    int32_t* cu_h, int32_t* qt_depth, int32_t* qp_map, int uh, int uw,
    uint8_t* coded_chroma, int32_t* ccu_w, int32_t* ccu_h,
    int32_t* cqt_depth, int ch2, int cw2, const uint16_t* live_s0,
    const uint16_t* live_s1, const uint8_t* live_r0, const uint8_t* live_r1,
    const int32_t* min_qt, const int32_t* max_mtt, const int32_t* max_bt,
    const int32_t* max_tt, int min_cb_log2, int qp_y, int qp_cb, int qp_cr,
    int slice_qp_y, double lmbda, double lmbda_sad, int n_full_rd,
    int n_chroma_rd, int sdh, int dual_tree, int cclm_en, int implicit_mts,
    int tree_idx, int n_presel, const int32_t* presel_meta,
    const int64_t* presel_ptrs, int n_plan, const int32_t* plan_meta,
    const int64_t* plan_ptrs, int32_t* out_tree, int tree_cap,
    int32_t* out_coeff, int coeff_cap, int32_t* out_n, int commit,
    int dep_quant, int mip_en, int mrl_en, int lfnst_en, int jccr_en,
    int jccr_sign, int qp_jc, int isp_en, double cw_cb, double cw_cr,
    void* inter_ctx, const int32_t* hmvp_init, int hmvp_n, int use_dqp,
    int dqp_coded, int ifp_bottom) {
  using namespace ctusearch;
  ProfScope _p(&g_prof_total);
  Searcher s;
  s.commit_state = commit != 0;
  s.commit_keep = commit == 2;
  s.ic = reinterpret_cast<InterCtx*>(inter_ctx);
  s.use_dqp = use_dqp != 0;
  s.dqp_coded = dqp_coded != 0;
  s.ifp_bottom = ifp_bottom;
  for (int i = 0; i < hmvp_n; ++i) {
    // rows of 12 ints: mv00 mv01 mv10 mv11 ref0 ref1 bcw alt (4 spare)
    const int32_t* r = hmvp_init + i * 12;
    MI mi;
    mi.mv[0][0] = r[0];
    mi.mv[0][1] = r[1];
    mi.mv[1][0] = r[2];
    mi.mv[1][1] = r[3];
    mi.ref[0] = int8_t(r[4]);
    mi.ref[1] = int8_t(r[5]);
    mi.bcw = int8_t(r[6]);
    mi.alt = uint8_t(r[7]);
    s.hmvp.push_back(mi);
  }
  s.ps.W = pic_w;
  s.ps.H = pic_h;
  s.ps.uw = uw;
  s.ps.uh = uh;
  s.ps.cw2 = cw2;
  s.ps.ch2 = ch2;
  s.ps.rec[0] = rec_y;
  s.ps.rec[1] = rec_cb;
  s.ps.rec[2] = rec_cr;
  s.ps.src[0] = src_y;
  s.ps.src[1] = src_cb;
  s.ps.src[2] = src_cr;
  s.ps.coded_luma = coded_luma;
  s.ps.intra_mode = intra_mode;
  s.ps.is_intra = is_intra;
  s.ps.is_mip = is_mip;
  s.ps.cu_w = cu_w;
  s.ps.cu_h = cu_h;
  s.ps.qt_depth = qt_depth;
  s.ps.qp_map = qp_map;
  s.ps.coded_chroma = coded_chroma;
  s.ps.ccu_w = ccu_w;
  s.ps.ccu_h = ccu_h;
  s.ps.cqt_depth = cqt_depth;
  Params& p = s.pp;
  p.pic_w = pic_w;
  p.pic_h = pic_h;
  p.bit_depth = bit_depth;
  p.ctu_size = ctu_size;
  for (int i = 0; i < 3; ++i) {
    p.min_qt[i] = min_qt[i];
    p.max_mtt[i] = max_mtt[i];
    p.max_bt[i] = max_bt[i];
    p.max_tt[i] = max_tt[i];
  }
  p.min_cb_log2 = min_cb_log2;
  p.qp_y = qp_y;
  p.qp_cb = qp_cb;
  p.qp_cr = qp_cr;
  p.slice_qp_y = slice_qp_y;
  p.lmbda = lmbda;
  p.lmbda_sad = lmbda_sad;
  p.n_full_rd = n_full_rd;
  p.n_chroma_rd = n_chroma_rd;
  p.sdh = sdh != 0;
  p.dual_tree = dual_tree != 0;
  p.cclm_en = cclm_en != 0;
  p.implicit_mts = implicit_mts != 0;
  p.dq = dep_quant != 0;
  p.mip_en = mip_en != 0;
  p.mrl_en = mrl_en != 0;
  p.lfnst_en = lfnst_en != 0;
  p.jccr_en = jccr_en != 0;
  p.jccr_sign = jccr_sign;
  p.qp_jc = qp_jc;
  p.isp_en = isp_en != 0;
  p.cw_cb = cw_cb;
  p.cw_cr = cw_cr;
  p.tree_idx = tree_idx;
  s.est.init(live_s0, live_s1, live_r0, live_r1, g_soffs.num_ctx);
  for (int i = 0; i < n_presel; ++i) {
    PreselClass c;
    c.w = presel_meta[i * 6 + 0];
    c.h = presel_meta[i * 6 + 1];
    c.ax = presel_meta[i * 6 + 2];
    c.ay = presel_meta[i * 6 + 3];
    c.nx = presel_meta[i * 6 + 4];
    c.ny = presel_meta[i * 6 + 5];
    c.costs = reinterpret_cast<const int32_t*>(presel_ptrs[i]);
    s.presel.push_back(c);
  }
  for (int i = 0; i < n_plan; ++i) {
    PreselClass c;
    c.w = plan_meta[i * 6 + 0];
    c.h = plan_meta[i * 6 + 1];
    c.ax = plan_meta[i * 6 + 2];
    c.ay = plan_meta[i * 6 + 3];
    c.nx = plan_meta[i * 6 + 4];
    c.ny = plan_meta[i * 6 + 5];
    c.costs = reinterpret_cast<const int32_t*>(plan_ptrs[i]);
    s.plan.push_back(c);
  }
  Node root;
  if (!s.search(ctu_x, ctu_y, root)) return -1;
  Writer wtr;
  wtr.tree = out_tree;
  wtr.tree_cap = tree_cap;
  wtr.coeff = out_coeff;
  wtr.coeff_cap = coeff_cap;
  if (p.dual_tree) {
    // container: children alternate luma tree / chroma tree per 64 unit
    for (size_t i = 0; i < root.children.size(); ++i)
      serialize(root.children[i], wtr, (i & 1) != 0);
  } else {
    serialize(root, wtr, false, s.ic != nullptr);
  }
  if (!wtr.ok) return -2;
  out_n[0] = wtr.tree_n;
  out_n[1] = wtr.coeff_n;
  if (commit == 2) {
    // wavefront phase 1: hand the row-chained state back to the caller.
    // The estimator's context transitions are identical to the real
    // arithmetic coder's, so the post-search states equal the writer's
    // post-CTU states; HMVP and the dqp-coded flag chain the same way.
    int n = g_soffs.num_ctx;
    std::memcpy(const_cast<uint16_t*>(live_s0), s.est.s0.data(),
                sizeof(uint16_t) * n);
    std::memcpy(const_cast<uint16_t*>(live_s1), s.est.s1.data(),
                sizeof(uint16_t) * n);
    std::memcpy(const_cast<uint8_t*>(live_r0), s.est.r0.data(),
                sizeof(uint8_t) * n);
    std::memcpy(const_cast<uint8_t*>(live_r1), s.est.r1.data(),
                sizeof(uint8_t) * n);
    int hn = int(s.hmvp.size());
    int32_t* hout = const_cast<int32_t*>(hmvp_init);
    for (int i = 0; i < hn; ++i) {
      const MI& mi = s.hmvp[i];
      int32_t* r = hout + i * 12;
      r[0] = mi.mv[0][0];
      r[1] = mi.mv[0][1];
      r[2] = mi.mv[1][0];
      r[3] = mi.mv[1][1];
      r[4] = mi.ref[0];
      r[5] = mi.ref[1];
      r[6] = mi.bcw;
      r[7] = mi.alt;
      r[8] = r[9] = r[10] = r[11] = 0;
    }
    out_n[2] = hn;
    out_n[3] = s.dqp_coded ? 1 : 0;
  }
  return 0;
}

}  // extern "C"

// ===========================================================================
// ALF kernels (codec/alf.py ports): 4x4 classification, 7x7/5x5 clipped
// diamond filtering, CC-ALF — the AdaptiveLoopFilterX86.h analog.  Bit-exact
// vs the Python/numpy reference (tests/test_native.py alf cases).
// ===========================================================================

namespace alf {

const int TR7[4][13] = {{0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12},
                        {9, 4, 10, 8, 1, 5, 11, 7, 3, 0, 2, 6, 12},
                        {0, 3, 2, 1, 8, 7, 6, 5, 4, 9, 10, 11, 12},
                        {9, 8, 10, 4, 3, 7, 11, 5, 1, 0, 2, 6, 12}};
const int ACT_TH[16] = {0, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 4};
const int TRANSPOSE_TAB[8] = {0, 1, 0, 2, 2, 3, 1, 3};
constexpr int ALF_NUM_BITS = 8;
constexpr int CC_SCALE_BITS = 7;
const int LUMA_TAPS[12][2][2] = {
    {{3, 0}, {-3, 0}}, {{2, 1}, {-2, -1}}, {{2, 0}, {-2, 0}},
    {{2, -1}, {-2, 1}}, {{1, 2}, {-1, -2}}, {{1, 1}, {-1, -1}},
    {{1, 0}, {-1, 0}}, {{1, -1}, {-1, 1}}, {{1, -2}, {-1, 2}},
    {{0, 3}, {0, -3}}, {{0, 2}, {0, -2}}, {{0, 1}, {0, -1}}};
const int CHROMA_TAPS[6][2][2] = {
    {{2, 0}, {-2, 0}}, {{1, 1}, {-1, -1}}, {{1, 0}, {-1, 0}},
    {{1, -1}, {-1, 1}}, {{0, 2}, {0, -2}}, {{0, 1}, {0, -1}}};

// per-row vertical-boundary tap clamping (codec/alf.py _vb_taps)
static void vb_taps(int yvb, int vb_pos, bool is_chroma, int o[6],
                    bool* near) {
  o[0] = 1; o[1] = -1; o[2] = 2; o[3] = -2; o[4] = 3; o[5] = -3;
  int rng = is_chroma ? 2 : 4;
  if (yvb < vb_pos && yvb >= vb_pos - rng) {
    if (yvb == vb_pos - 1) { o[0] = 0; o[1] = 0; }
    if (yvb >= vb_pos - 2) { o[2] = o[0]; o[3] = o[1]; }
    if (yvb >= vb_pos - 3) { o[4] = o[2]; o[5] = o[3]; }
  } else if (yvb >= vb_pos && yvb <= vb_pos + rng - 1) {
    if (yvb == vb_pos) { o[0] = 0; o[1] = 0; }
    if (yvb <= vb_pos + 1) { o[2] = o[0]; o[3] = o[1]; }
    if (yvb <= vb_pos + 2) { o[4] = o[2]; o[5] = o[3]; }
  }
  *near = yvb == vb_pos - 1 || yvb == vb_pos;
}

static inline int off_of(const int o[6], int d) {
  switch (d) {
    case 1: return o[0];
    case -1: return o[1];
    case 2: return o[2];
    case -2: return o[3];
    case 3: return o[4];
    case -3: return o[5];
    default: return 0;
  }
}

static inline int64_t clip_alf(int64_t clip, int64_t curr, int64_t v0,
                               int64_t v1) {
  int64_t a = v0 - curr;
  a = a < -clip ? -clip : (a > clip ? clip : a);
  int64_t b = v1 - curr;
  b = b < -clip ? -clip : (b > clip ? clip : b);
  return a + b;
}

// edge-clamped sample access
static inline int64_t at(const int32_t* p, int h, int w, int y, int x) {
  y = y < 0 ? 0 : (y >= h ? h - 1 : y);
  x = x < 0 ? 0 : (x >= w ? w - 1 : x);
  return p[size_t(y) * w + x];
}

}  // namespace alf

extern "C" {

// 7x7 clipped luma ALF over region (x0, y0, w0, h0) of src -> dst
// (codec/alf.py filter_luma_region)
void vte_alf_luma(const int32_t* src, int32_t* dst, int h, int w, int x0,
                  int y0, int w0, int h0, const int32_t* cls,
                  const int32_t* trn, int cls_w, const int32_t* coeff,
                  const int32_t* clipv, int bit_depth, int ctu_size) {
  using namespace alf;
  int vb_pos = ctu_size - 4;
  int maxval = (1 << bit_depth) - 1;
  int shift = ALF_NUM_BITS - 1;
  int y1 = std::min(y0 + h0, h), x1 = std::min(x0 + w0, w);
  for (int y = y0; y < y1; ++y) {
    int o[6];
    bool near;
    vb_taps(y & (ctu_size - 1), vb_pos, false, o, &near);
    int row_shift = near ? shift + 3 : shift;
    int64_t row_off = int64_t(1) << (row_shift - 1);
    for (int x = x0; x < x1; ++x) {
      int c = cls[(y >> 2) * cls_w + (x >> 2)];
      int t = trn[(y >> 2) * cls_w + (x >> 2)];
      const int32_t* co = coeff + size_t(c) * 13;
      const int32_t* cl = clipv + size_t(c) * 13;
      int64_t curr = src[size_t(y) * w + x];
      int64_t acc = 0;
      for (int ci = 0; ci < 12; ++ci) {
        int g = TR7[t][ci];  // co[TR[t]] permutation (gather)
        int dy0 = LUMA_TAPS[ci][0][0], dx0 = LUMA_TAPS[ci][0][1];
        int dy1 = LUMA_TAPS[ci][1][0], dx1 = LUMA_TAPS[ci][1][1];
        int64_t v0 = at(src, h, w, y + off_of(o, dy0), x + dx0);
        int64_t v1 = at(src, h, w, y + off_of(o, dy1), x + dx1);
        acc += int64_t(co[g]) * clip_alf(cl[g], curr, v0, v1);
      }
      int64_t out = (acc + row_off) >> row_shift;
      int64_t r = curr + out;
      dst[size_t(y) * w + x] =
          int32_t(r < 0 ? 0 : (r > maxval ? maxval : r));
    }
  }
}

// 5x5 chroma ALF (codec/alf.py filter_chroma_region)
void vte_alf_chroma(const int32_t* src, int32_t* dst, int h, int w, int x0,
                    int y0, int w0, int h0, const int32_t* coeff,
                    const int32_t* clipv, int bit_depth, int ctu_size_c) {
  using namespace alf;
  int vb_pos = ctu_size_c - 2;
  int maxval = (1 << bit_depth) - 1;
  int shift = ALF_NUM_BITS - 1;
  int y1 = std::min(y0 + h0, h), x1 = std::min(x0 + w0, w);
  for (int y = y0; y < y1; ++y) {
    int o[6];
    bool near;
    vb_taps(y & (ctu_size_c - 1), vb_pos, true, o, &near);
    int row_shift = near ? shift + 3 : shift;
    int64_t row_off = int64_t(1) << (row_shift - 1);
    for (int x = x0; x < x1; ++x) {
      int64_t curr = src[size_t(y) * w + x];
      int64_t acc = 0;
      for (int ci = 0; ci < 6; ++ci) {
        int dy0 = CHROMA_TAPS[ci][0][0], dx0 = CHROMA_TAPS[ci][0][1];
        int dy1 = CHROMA_TAPS[ci][1][0], dx1 = CHROMA_TAPS[ci][1][1];
        int64_t v0 = at(src, h, w, y + off_of(o, dy0), x + dx0);
        int64_t v1 = at(src, h, w, y + off_of(o, dy1), x + dx1);
        acc += int64_t(coeff[ci]) * clip_alf(clipv[ci], curr, v0, v1);
      }
      int64_t out = (acc + row_off) >> row_shift;
      int64_t r = curr + out;
      dst[size_t(y) * w + x] =
          int32_t(r < 0 ? 0 : (r > maxval ? maxval : r));
    }
  }
}

// CC-ALF 3x4 diamond on co-located luma -> chroma correction
// (codec/alf.py filter_ccalf_region; 4:2:0)
void vte_alf_ccalf(const int32_t* luma, int32_t* chroma, int hc, int wc,
                   int h, int w, int x0c, int y0c, int w0c, int h0c,
                   const int32_t* coeff, int bit_depth, int ctu_size) {
  using namespace alf;
  int vb_pos = ctu_size - 4;
  int maxval = (1 << bit_depth) - 1;
  int half = (1 << bit_depth) >> 1;
  int y1 = std::min(y0c + h0c, hc), x1 = std::min(x0c + w0c, wc);
  for (int yy = y0c; yy < y1; ++yy) {
    int ly = yy << 1;
    int pos = ly & (ctu_size - 1);
    int off1 = 1, off2 = -1, off3 = 2;
    if (pos == vb_pos - 2 || pos == vb_pos + 1) {
      off3 = off1;
    } else if (pos == vb_pos - 1 || pos == vb_pos) {
      off1 = off2 = off3 = 0;
    }
    for (int xx = x0c; xx < x1; ++xx) {
      int lx = xx << 1;
      int64_t curr = at(luma, h, w, ly, lx);
      int64_t s = 0;
      s += int64_t(coeff[0]) * (at(luma, h, w, ly + off2, lx) - curr);
      s += int64_t(coeff[1]) * (at(luma, h, w, ly, lx - 1) - curr);
      s += int64_t(coeff[2]) * (at(luma, h, w, ly, lx + 1) - curr);
      s += int64_t(coeff[3]) * (at(luma, h, w, ly + off1, lx - 1) - curr);
      s += int64_t(coeff[4]) * (at(luma, h, w, ly + off1, lx) - curr);
      s += int64_t(coeff[5]) * (at(luma, h, w, ly + off1, lx + 1) - curr);
      s += int64_t(coeff[6]) * (at(luma, h, w, ly + off3, lx) - curr);
      s = (s + ((1 << CC_SCALE_BITS) >> 1)) >> CC_SCALE_BITS;
      int64_t v = s + half;
      v = v < 0 ? 0 : (v > maxval ? maxval : v);
      s = v - half;
      int64_t r = chroma[size_t(yy) * wc + xx] + s;
      chroma[size_t(yy) * wc + xx] =
          int32_t(r < 0 ? 0 : (r > maxval ? maxval : r));
    }
  }
}

// 4x4 classification (codec/alf.py classify_luma; deriveClassificationBlk)
void vte_alf_classify(const int32_t* rec, int h, int w, int bit_depth,
                      int ctu_size, int32_t* cls_out, int32_t* trn_out) {
  using namespace alf;
  int shift = bit_depth + 4;
  int vb_pos = ctu_size - 4;
  int n_by = h / 4, n_bx = w / 4;
  // laplacian grid: points (y_c, x_c) at even offsets starting -2;
  // value = lap(y_c, x_c) + lap(y_c+1, x_c+1) with the VB row rules
  int gh = (h + 4) / 2, gw = (w + 4) / 2;  // grid dims
  std::vector<int64_t> gv(size_t(gh) * gw), gho(size_t(gh) * gw),
      gd0(size_t(gh) * gw), gd1(size_t(gh) * gw);
  auto lap = [&](int y, int x, int64_t* v, int64_t* hh, int64_t* d0,
                 int64_t* d1) {
    // VB row substitution: above(y)=y iff y%ctu==vb_pos,
    // below(y)=y iff y%ctu==vb_pos-1 (only for y > 0)
    int ym = y - 1, yp = y + 1;
    if (y > 0 && (y & (ctu_size - 1)) == vb_pos) ym = y;
    if (y > 0 && (y & (ctu_size - 1)) == vb_pos - 1) yp = y;
    int64_t c2 = 2 * at(rec, h, w, y, x);
    *v = std::abs(c2 - at(rec, h, w, ym, x) - at(rec, h, w, yp, x));
    *hh = std::abs(c2 - at(rec, h, w, y, x - 1) - at(rec, h, w, y, x + 1));
    *d0 = std::abs(c2 - at(rec, h, w, ym, x - 1) - at(rec, h, w, yp, x + 1));
    *d1 = std::abs(c2 - at(rec, h, w, yp, x - 1) - at(rec, h, w, ym, x + 1));
  };
  for (int gy = 0; gy < gh; ++gy) {
    int y_c = -2 + 2 * gy;
    for (int gx = 0; gx < gw; ++gx) {
      int x_c = -2 + 2 * gx;
      int64_t v0, h0, d00, d10, v1, h1, d01, d11;
      lap(y_c, x_c, &v0, &h0, &d00, &d10);
      lap(y_c + 1, x_c + 1, &v1, &h1, &d01, &d11);
      gv[size_t(gy) * gw + gx] = v0 + v1;
      gho[size_t(gy) * gw + gx] = h0 + h1;
      gd0[size_t(gy) * gw + gx] = d00 + d01;
      gd1[size_t(gy) * gw + gx] = d10 + d11;
    }
  }
  for (int by = 0; by < n_by; ++by) {
    int blk_vb = (by * 4) & (ctu_size - 1);
    int r0 = 0, r1 = 4, mult = 64;
    if (blk_vb == vb_pos - 4) { r1 = 3; mult = 96; }
    else if (blk_vb == vb_pos) { r0 = 1; mult = 96; }
    for (int bx = 0; bx < n_bx; ++bx) {
      int64_t sv = 0, sh = 0, sd0 = 0, sd1 = 0;
      for (int r = r0; r < r1; ++r) {
        int gy = by * 2 + r;
        for (int cc = 0; cc < 4; ++cc) {
          int gx = bx * 2 + cc;
          sv += gv[size_t(gy) * gw + gx];
          sh += gho[size_t(gy) * gw + gx];
          sd0 += gd0[size_t(gy) * gw + gx];
          sd1 += gd1[size_t(gy) * gw + gx];
        }
      }
      int64_t act = ((sv + sh) * mult) >> shift;
      act = act < 0 ? 0 : (act > 15 ? 15 : act);
      int cls = ACT_TH[act];
      bool hv_swap = sv > sh;
      int64_t hv1 = hv_swap ? sv : sh, hv0 = hv_swap ? sh : sv;
      int dir_hv = hv_swap ? 1 : 3;
      bool d_swap = sd0 > sd1;
      int64_t dd1 = d_swap ? sd0 : sd1, dd0 = d_swap ? sd1 : sd0;
      int dir_d = d_swap ? 0 : 2;
      bool use_d = dd1 * hv0 > hv1 * dd0;
      int64_t hvd1 = use_d ? dd1 : hv1, hvd0 = use_d ? dd0 : hv0;
      int main_dir = use_d ? dir_d : dir_hv;
      int sec_dir = use_d ? dir_hv : dir_d;
      int strength = (hvd1 > 2 * hvd0 ? 1 : 0) + (hvd1 * 2 > 9 * hvd0 ? 1 : 0);
      if (strength > 0) cls += (((main_dir & 1) << 1) + strength) * 5;
      cls_out[size_t(by) * n_bx + bx] = cls;
      trn_out[size_t(by) * n_bx + bx] =
          TRANSPOSE_TAB[main_dir * 2 + (sec_dir >> 1)];
    }
  }
}

// DMVR final padded MC (ops/dmvr.py padded_window_mc: xCopyAndPad +
// xFinalPaddedMCForDMVR): prefetch the window at the clipped merge MV,
// replicate-pad it, and run the MC core at the refined MV's fraction
// with the integer delta as a block offset.  Declared here, defined
// after the MC core below via a forward call.
void vte_mc_block(const int32_t* ref, int ph, int pw, int x, int y, int w,
                  int h, int mv_x, int mv_y, int bit_depth, int is_luma,
                  int intermediate, int alt_hpel,
                  const int32_t* taps_override, int32_t* out);

static void clip_mv_c(int mvx, int mvy, int x, int y, int pic_w, int pic_h,
                      int ctu_size, int* ox, int* oy) {
  const int off = 8;
  int hor_max = (pic_w + off - x - 1) << 4;
  int hor_min = (-ctu_size - off - x + 1) << 4;
  int ver_max = (pic_h + off - y - 1) << 4;
  int ver_min = (-ctu_size - off - y + 1) << 4;
  *ox = std::min(hor_max, std::max(hor_min, mvx));
  *oy = std::min(ver_max, std::max(ver_min, mvy));
}

void vte_dmvr_padded_mc(const int32_t* ref, int ph, int pw, int x, int y,
                        int w, int h, int mmv_x, int mmv_y, int rmv_x,
                        int rmv_y, int comp_scale, int bit_depth,
                        int pic_w, int pic_h, int ctu_size,
                        int intermediate, int alt_hpel, int32_t* out) {
  const int is_luma = comp_scale == 0;
  const int filt = is_luma ? 8 : 4;
  const int sh = 4 + comp_scale;
  const int pad = 2 >> comp_scale;  // DMVR_ITER
  int cmx, cmy;
  clip_mv_c(mmv_x, mmv_y, x << comp_scale, y << comp_scale, pic_w, pic_h,
            ctu_size, &cmx, &cmy);
  const int ext = (filt >> 1) - 1;
  const int x0 = x + (cmx >> sh) - ext;
  const int y0 = y + (cmy >> sh) - ext;
  const int ww = w + filt - 1;
  const int wh = h + filt - 1;
  const int PW = ww + 2 * pad, PH = wh + 2 * pad;
  std::vector<int32_t> padded(size_t(PH) * PW);
  for (int i = 0; i < PH; ++i) {
    int wi = i - pad;                 // replicate the WINDOW edge first
    wi = wi < 0 ? 0 : (wi >= wh ? wh - 1 : wi);
    int sy = y0 + wi;
    sy = sy < 0 ? 0 : (sy >= ph ? ph - 1 : sy);
    for (int j = 0; j < PW; ++j) {
      int wj = j - pad;
      wj = wj < 0 ? 0 : (wj >= ww ? ww - 1 : wj);
      int sx = x0 + wj;
      sx = sx < 0 ? 0 : (sx >= pw ? pw - 1 : sx);
      padded[size_t(i) * PW + j] = ref[size_t(sy) * pw + sx];
    }
  }
  int rcx, rcy;
  clip_mv_c(rmv_x, rmv_y, x << comp_scale, y << comp_scale, pic_w, pic_h,
            ctu_size, &rcx, &rcy);
  const int d_ix = (rmv_x >> sh) - (mmv_x >> sh);
  const int d_iy = (rmv_y >> sh) - (mmv_y >> sh);
  const int fx = rcx & ((1 << sh) - 1);
  const int fy = rcy & ((1 << sh) - 1);
  vte_mc_block(padded.data(), PH, PW, pad + ext + d_ix, pad + ext + d_iy,
               w, h, fx, fy, bit_depth, is_luma, intermediate, alt_hpel,
               nullptr, out);
}

// one DMVR sub-PU's final bi-prediction (ctu_syntax.py dmvr_predict
// non-BDOF path): per list, either the padded-window MC (integer part
// of the refined MV moved) or a plain MC at the clipped MV, then the
// 14-bit bi average (interp.py bi_average_np)
void vte_dmvr_bi_subpu(const int32_t* ref0, const int32_t* ref1, int ph,
                       int pw, int bx, int by, int bw, int bh,
                       int m0x, int m0y, int m1x, int m1y, int dx, int dy,
                       int comp_scale, int bit_depth, int pic_w,
                       int pic_h, int ctu_size, int alt_hpel,
                       int32_t* out) {
  const int sh = 4 + comp_scale;
  const int is_luma = comp_scale == 0;
  const int MVMAX = (1 << 17) - 1, MVMIN = -(1 << 17);
  std::vector<int32_t> p0(size_t(bh) * bw), p1(size_t(bh) * bw);
  for (int li = 0; li < 2; ++li) {
    const int32_t* ref = li == 0 ? ref0 : ref1;
    int sign = li == 0 ? 1 : -1;
    int mx = li == 0 ? m0x : m1x, my = li == 0 ? m0y : m1y;
    int rx = std::max(MVMIN, std::min(MVMAX, mx + sign * dx));
    int ry = std::max(MVMIN, std::min(MVMAX, my + sign * dy));
    int d_ix = (rx >> sh) - (mx >> sh);
    int d_iy = (ry >> sh) - (my >> sh);
    int32_t* dst = li == 0 ? p0.data() : p1.data();
    if (d_ix || d_iy) {
      vte_dmvr_padded_mc(ref, ph, pw, bx, by, bw, bh, mx, my, rx, ry,
                         comp_scale, bit_depth, pic_w, pic_h, ctu_size,
                         1, alt_hpel, dst);
    } else {
      int cx, cy;
      clip_mv_c(rx, ry, bx << comp_scale, by << comp_scale, pic_w,
                pic_h, ctu_size, &cx, &cy);
      vte_mc_block(ref, ph, pw, bx, by, bw, bh, cx, cy, bit_depth,
                   is_luma, 1, alt_hpel, nullptr, dst);
    }
  }
  const int shift = std::max(2, 14 - bit_depth) + 1;
  const int64_t offset = (int64_t(1) << (shift - 1)) + 2 * (1 << 13);
  const int maxv = (1 << bit_depth) - 1;
  for (size_t i = 0; i < size_t(bh) * bw; ++i) {
    int64_t v = (int64_t(p0[i]) + p1[i] + offset) >> shift;
    out[i] = int32_t(v < 0 ? 0 : (v > maxv ? maxv : v));
  }
}

// MCTF kernels (encoder/mctf.py hot loops; the MCTFX86.h analog)
// ---------------------------------------------------------------------------

// whole-plane fractional interpolation at one phase: horizontal then
// vertical n-tap with (+32)>>6 rounding; output is edge-padded by `pad`
// on every side (mctf.py _interp_plane_mctf, incl. its extra 4-sample
// working margin)
void vte_mctf_interp(const int32_t* plane, int h, int w,
                     const int32_t* tapsh, const int32_t* tapsv,
                     int ntaps, int o0, int pad, int bit_depth,
                     int32_t* out) {
  const int m = pad + 4;                 // python working margin
  const int H = h + 2 * m, W = w + 2 * m;
  std::vector<int32_t> P(size_t(H) * W), T(size_t(H) * W);
  for (int y = 0; y < H; ++y) {
    int sy = y - m;
    sy = sy < 0 ? 0 : (sy >= h ? h - 1 : sy);
    for (int x = 0; x < W; ++x) {
      int sx = x - m;
      sx = sx < 0 ? 0 : (sx >= w ? w - 1 : sx);
      P[size_t(y) * W + x] = plane[size_t(sy) * w + sx];
    }
  }
  const int maxv = (1 << bit_depth) - 1;
  // horizontal (reads wrap-free: output trimmed below excludes the
  // outer ring python's np.roll wraps into)
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      int64_t acc = 0;
      for (int k = 0; k < ntaps; ++k) {
        int xx = x + o0 + k;
        if (xx < 0) xx += W;            // np.roll wrap semantics
        if (xx >= W) xx -= W;
        acc += int64_t(tapsh[k]) * P[size_t(y) * W + xx];
      }
      T[size_t(y) * W + x] = int32_t((acc + 32) >> 6);
    }
  const int OW = w + 2 * pad;
  for (int y = 0; y < h + 2 * pad; ++y)
    for (int x = 0; x < OW; ++x) {
      int64_t acc = 0;
      for (int k = 0; k < ntaps; ++k) {
        int yy = (y + 4) + o0 + k;
        if (yy < 0) yy += H;
        if (yy >= H) yy -= H;
        acc += int64_t(tapsv[k]) * T[size_t(yy) * W + (x + 4)];
      }
      int64_t v = (acc + 32) >> 6;
      out[size_t(y) * OW + x] =
          int32_t(v < 0 ? 0 : (v > maxv ? maxv : v));
    }
}

// one interpolated sample block of the virtual pad-64 interp plane
// (identical values to vte_mctf_interp's output window at [ys.., xs..])
static void mctf_fetch_block(const int32_t* plane, int h, int w, int ys,
                             int xs, int bh, int bw,
                             const int32_t* tapsh, const int32_t* tapsv,
                             int ntaps, int o0, int bit_depth,
                             int32_t* out /* bh x bw */) {
  const int m = 68;  // python working margin (pad 64 + 4)
  const int maxv = (1 << bit_depth) - 1;
  // T rows needed: (ys+4+o0) .. (ys+4+o0+ntaps-1 + bh-1); cols xs+4..
  int64_t T[24 + 8][24];  // bs <= 16 at full res; margin for taps
  for (int i = 0; i < bh + ntaps - 1; ++i) {
    int R = ys + 4 + o0 + i;
    int sy = R - m;
    sy = sy < 0 ? 0 : (sy >= h ? h - 1 : sy);
    for (int j = 0; j < bw; ++j) {
      int64_t acc = 0;
      for (int k = 0; k < ntaps; ++k) {
        int C = xs + 4 + o0 + k + j;
        int sx = C - m;
        sx = sx < 0 ? 0 : (sx >= w ? w - 1 : sx);
        acc += int64_t(tapsh[k]) * plane[size_t(sy) * w + sx];
      }
      T[i][j] = (acc + 32) >> 6;
    }
  }
  for (int i = 0; i < bh; ++i)
    for (int j = 0; j < bw; ++j) {
      int64_t acc = 0;
      for (int k = 0; k < ntaps; ++k)
        acc += int64_t(tapsv[k]) * T[i + k][j];
      int64_t v = (acc + 32) >> 6;
      out[size_t(i) * bw + j] =
          int32_t(v < 0 ? 0 : (v > maxv ? maxv : v));
    }
}

// MCTF filter tables (mctf.py MCTF_FILTER8/4), registered once
static int32_t g_mctf_f8[16][8];
static int32_t g_mctf_f4[16][4];
void vte_mctf_init(const int32_t* f8, const int32_t* f4) {
  std::memcpy(g_mctf_f8, f8, sizeof(g_mctf_f8));
  std::memcpy(g_mctf_f4, f4, sizeof(g_mctf_f4));
}

// batched per-block SSD at 1/16-pel MVs (mctf.py _ssd_blocks)
void vte_mctf_block_ssd(const int32_t* plane, int h, int w, int n,
                        const int32_t* bxy, const int32_t* mvq, int bs,
                        const int32_t* cur, int bit_depth,
                        int64_t* out_ssd) {
  int32_t blk[16 * 16];
  for (int b = 0; b < n; ++b) {
    int fx = mvq[b * 2 + 0] & 15, fy = mvq[b * 2 + 1] & 15;
    int ix = mvq[b * 2 + 0] >> 4, iy = mvq[b * 2 + 1] >> 4;
    int ys = bxy[b * 2 + 1] + iy + 64;
    int xs = bxy[b * 2 + 0] + ix + 64;
    int ymax = h + 128 - bs, xmax = w + 128 - bs;
    ys = ys < 0 ? 0 : (ys > ymax ? ymax : ys);
    xs = xs < 0 ? 0 : (xs > xmax ? xmax : xs);
    mctf_fetch_block(plane, h, w, ys, xs, bs, bs, g_mctf_f8[fx] + 1,
                     g_mctf_f8[fy] + 1, 6, -2, bit_depth, blk);
    const int32_t* c = cur + size_t(b) * bs * bs;
    int64_t ssd = 0;
    for (int i = 0; i < bs * bs; ++i) {
      int64_t e = int64_t(blk[i]) - c[i];
      ssd += e * e;
    }
    out_ssd[b] = ssd;
  }
}

// whole-plane per-block MC at 1/16-pel MVs (mctf.py _mc_block_plane)
void vte_mctf_mc_plane(const int32_t* ref, int h, int w,
                       const int32_t* mvq, int nby, int nbx, int bs,
                       int scale, int taps8, int bit_depth,
                       int32_t* out /* h x w */) {
  int32_t blk[16 * 16];
  int bsc = bs >> scale;
  for (int by = 0; by < nby; ++by)
    for (int bx = 0; bx < nbx; ++bx) {
      int y0 = by * bsc, x0 = bx * bsc;
      if (y0 >= h || x0 >= w) continue;
      int bh = std::min(bsc, h - y0), bw = std::min(bsc, w - x0);
      int dx = mvq[(size_t(by) * nbx + bx) * 2 + 0] >> scale;
      int dy = mvq[(size_t(by) * nbx + bx) * 2 + 1] >> scale;
      int fx = dx & 15, fy = dy & 15;
      int ys = 64 + y0 + (dy >> 4), xs = 64 + x0 + (dx >> 4);
      int ymax = h + 128 - bh, xmax = w + 128 - bw;
      ys = ys < 0 ? 0 : (ys > ymax ? ymax : ys);
      xs = xs < 0 ? 0 : (xs > xmax ? xmax : xs);
      const int32_t* th = taps8 ? g_mctf_f8[fx] + 1 : g_mctf_f4[fx];
      const int32_t* tv = taps8 ? g_mctf_f8[fy] + 1 : g_mctf_f4[fy];
      mctf_fetch_block(ref, h, w, ys, xs, bh, bw, th, tv,
                       taps8 ? 6 : 4, taps8 ? -2 : -1, bit_depth, blk);
      for (int i = 0; i < bh; ++i)
        std::memcpy(out + size_t(y0 + i) * w + x0, blk + i * bw,
                    size_t(bw) * 4);
    }
}

// per-block integer full search around per-block init MVs (mctf.py
// _block_me: same SSDs, same first-wins tie-break, same edge clamping)
void vte_mctf_block_me(const int32_t* cur, const int32_t* ref, int h,
                       int w, int bs, int rng, const int32_t* init_mv,
                       int32_t* out_mv, int64_t* out_err) {
  int nby = (h + bs - 1) / bs, nbx = (w + bs - 1) / bs;
  const int m = rng + bs;
  const int H = h + 2 * m, W = w + 2 * m;
  std::vector<int64_t> rp(size_t(H) * W);
  for (int y = 0; y < H; ++y) {
    int sy = y - m;
    sy = sy < 0 ? 0 : (sy >= h ? h - 1 : sy);
    for (int x = 0; x < W; ++x) {
      int sx = x - m;
      sx = sx < 0 ? 0 : (sx >= w ? w - 1 : sx);
      rp[size_t(y) * W + x] = ref[size_t(sy) * w + sx];
    }
  }
  for (int by = 0; by < nby; ++by)
    for (int bx = 0; bx < nbx; ++bx) {
      int y0 = by * bs, x0 = bx * bs;
      int bh = std::min(bs, h - y0), bw = std::min(bs, w - x0);
      int ix = init_mv[(size_t(by) * nbx + bx) * 2 + 0];
      int iy = init_mv[(size_t(by) * nbx + bx) * 2 + 1];
      int64_t best = -1;
      int bdx = 0, bdy = 0;
      for (int dy = -rng; dy <= rng; ++dy) {
        int sy = y0 + iy + dy + m;
        sy = sy < 0 ? 0 : (sy > H - bh ? H - bh : sy);
        for (int dx = -rng; dx <= rng; ++dx) {
          int sx = x0 + ix + dx + m;
          sx = sx < 0 ? 0 : (sx > W - bw ? W - bw : sx);
          int64_t ssd = 0;
          for (int i = 0; i < bh; ++i) {
            const int32_t* c = cur + size_t(y0 + i) * w + x0;
            const int64_t* r = rp.data() + size_t(sy + i) * W + sx;
            for (int j = 0; j < bw; ++j) {
              int64_t e = int64_t(c[j]) - r[j];
              ssd += e * e;
            }
          }
          if (best < 0 || ssd < best) {
            best = ssd;
            bdx = dx;
            bdy = dy;
          }
        }
      }
      out_mv[(size_t(by) * nbx + bx) * 2 + 0] = ix + bdx;
      out_mv[(size_t(by) * nbx + bx) * 2 + 1] = iy + bdy;
      out_err[size_t(by) * nbx + bx] = best;
    }
}

// SAO statistics for one component plane in one pass (encoder/sao_enc.py
// _picture_stats; the EncSampleAdaptiveOffset getBlkStats /
// SampleAdaptiveOffsetX86 analog): per-CTU (count, error-sum) for the 4
// EO classes x 5 categories and the 32 BO bands.  Border samples whose
// EO neighbours fall outside the picture are excluded per class (the
// apply_sao_picture valid window); outputs are accumulated (caller
// zero-initializes).
void vte_sao_stats(const int32_t* rec, const int32_t* org, int h, int w,
                   int cs, int n_cols, int bit_depth, int64_t* eo_cnt,
                   int64_t* eo_err, int64_t* bo_cnt, int64_t* bo_err) {
  static const int CAT[5] = {1, 2, 0, 3, 4};
  const int bshift = bit_depth - 5;
  const int n_ctus_stride = 5;
  const size_t n_ctus = size_t((h + cs - 1) / cs) * n_cols;
  auto sgn = [](int64_t v) { return v > 0 ? 1 : (v < 0 ? -1 : 0); };
  for (int y = 0; y < h; ++y) {
    const int32_t* r = rec + size_t(y) * w;
    const int32_t* rm = r - w;  // row above (valid when y >= 1)
    const int32_t* rp = r + w;  // row below (valid when y < h-1)
    const int32_t* o = org + size_t(y) * w;
    const int cy = y / cs;
    const bool y_in = y >= 1 && y < h - 1;
    for (int x = 0; x < w; ++x) {
      const size_t ctu = size_t(cy) * n_cols + x / cs;
      const int64_t c = r[x];
      const int64_t d = int64_t(o[x]) - c;
      bo_cnt[ctu * 32 + (c >> bshift)] += 1;
      bo_err[ctu * 32 + (c >> bshift)] += d;
      const bool x_in = x >= 1 && x < w - 1;
      if (x_in) {  // EO class 0: horizontal
        int cat = CAT[2 + sgn(c - r[x - 1]) + sgn(c - r[x + 1])];
        size_t base = (0 * n_ctus + ctu) * n_ctus_stride + cat;
        eo_cnt[base] += 1;
        eo_err[base] += d;
      }
      if (y_in) {  // EO class 1: vertical
        int cat = CAT[2 + sgn(c - rm[x]) + sgn(c - rp[x])];
        size_t base = (1 * n_ctus + ctu) * n_ctus_stride + cat;
        eo_cnt[base] += 1;
        eo_err[base] += d;
      }
      if (x_in && y_in) {  // EO classes 2 (135 deg) and 3 (45 deg)
        int cat = CAT[2 + sgn(c - rm[x - 1]) + sgn(c - rp[x + 1])];
        size_t base = (2 * n_ctus + ctu) * n_ctus_stride + cat;
        eo_cnt[base] += 1;
        eo_err[base] += d;
        cat = CAT[2 + sgn(c - rm[x + 1]) + sgn(c - rp[x - 1])];
        base = (3 * n_ctus + ctu) * n_ctus_stride + cat;
        eo_cnt[base] += 1;
        eo_err[base] += d;
      }
    }
  }
}

// ALF covariance statistics (encoder/alf_enc.py _tap_planes + per-class
// Gram accumulation; the EncAdaptiveLoopFilter getBlkStats /
// AdaptiveLoopFilterX86 accumulator analog).  Emits, per class, the
// Gram matrix A [dim, dim] and right-hand side b [dim] of the (clipped)
// Wiener normal equations, with clip-major row layout
// row = clip_idx * n_taps + coeff_idx (coeff_idx transpose-mapped for
// luma).  n_clip = 1 reproduces the linear statistics (clip value
// 1 << bit_depth never clips).  All accumulation is integer-exact
// (int64), matching the Python float64 BLAS results bit-for-bit.
void vte_alf_stats(const int32_t* rec, const int32_t* orig, int h, int w,
                   int bit_depth, int ctu_size, int is_chroma,
                   const int32_t* cls, const int32_t* trn, int cls_w,
                   int n_clip, double* out_A, double* out_b) {
  using namespace alf;
  const int n_taps = is_chroma ? 6 : 12;
  const int n_classes = is_chroma ? 1 : 25;
  const int dim = n_clip * n_taps;
  const int vb_pos = ctu_size - (is_chroma ? 2 : 4);
  int32_t cv[4];
  cv[0] = 1 << bit_depth;
  for (int i = 1; i < 4; ++i) cv[i] = 1 << (7 - 2 * i + bit_depth - 8);
  std::vector<int64_t> A(size_t(n_classes) * dim * dim, 0);
  std::vector<int64_t> B(size_t(n_classes) * dim, 0);
  std::vector<int64_t> E(dim);
  for (int y = 0; y < h; ++y) {
    int o[6];
    bool near;
    vb_taps(y & (ctu_size - 1), vb_pos, is_chroma, o, &near);
    // hoisted row base pointers per vertical offset (edge-clamped rows)
    const int32_t* rp[7];
    for (int d = -3; d <= 3; ++d) {
      int yy = y + off_of(o, d);
      yy = yy < 0 ? 0 : (yy >= h ? h - 1 : yy);
      rp[d + 3] = rec + size_t(yy) * w;
    }
    for (int x = 0; x < w; ++x) {
      int c = 0, t = 0;
      if (!is_chroma) {
        c = cls[(y >> 2) * cls_w + (x >> 2)];
        t = trn[(y >> 2) * cls_w + (x >> 2)];
      }
      int64_t curr = rec[size_t(y) * w + x];
      const bool interior = x >= 3 && x + 3 < w;
      if (n_clip == 1 && interior) {
        // hot path: the k=0 clip bound is 1<<bit_depth, which no
        // sample difference can exceed — E is the plain tap sums
        for (int g = 0; g < n_taps; ++g) {
          int dy0, dx0, dy1, dx1;
          if (is_chroma) {
            dy0 = CHROMA_TAPS[g][0][0]; dx0 = CHROMA_TAPS[g][0][1];
            dy1 = CHROMA_TAPS[g][1][0]; dx1 = CHROMA_TAPS[g][1][1];
          } else {
            dy0 = LUMA_TAPS[g][0][0]; dx0 = LUMA_TAPS[g][0][1];
            dy1 = LUMA_TAPS[g][1][0]; dx1 = LUMA_TAPS[g][1][1];
          }
          int ci = is_chroma ? g : TR7[t][g];
          E[ci] = (int64_t(rp[dy0 + 3][x + dx0]) - curr) +
                  (int64_t(rp[dy1 + 3][x + dx1]) - curr);
        }
      } else {
        for (int g = 0; g < n_taps; ++g) {
          int dy0, dx0, dy1, dx1;
          if (is_chroma) {
            dy0 = CHROMA_TAPS[g][0][0]; dx0 = CHROMA_TAPS[g][0][1];
            dy1 = CHROMA_TAPS[g][1][0]; dx1 = CHROMA_TAPS[g][1][1];
          } else {
            dy0 = LUMA_TAPS[g][0][0]; dx0 = LUMA_TAPS[g][0][1];
            dy1 = LUMA_TAPS[g][1][0]; dx1 = LUMA_TAPS[g][1][1];
          }
          int x0 = x + dx0, x1 = x + dx1;
          x0 = x0 < 0 ? 0 : (x0 >= w ? w - 1 : x0);
          x1 = x1 < 0 ? 0 : (x1 >= w ? w - 1 : x1);
          int64_t d0 = int64_t(rp[dy0 + 3][x0]) - curr;
          int64_t d1 = int64_t(rp[dy1 + 3][x1]) - curr;
          int ci = is_chroma ? g : TR7[t][g];
          for (int k = 0; k < n_clip; ++k) {
            int64_t lim = cv[k];
            int64_t a = d0 < -lim ? -lim : (d0 > lim ? lim : d0);
            int64_t b2 = d1 < -lim ? -lim : (d1 > lim ? lim : d1);
            E[size_t(k) * n_taps + ci] = a + b2;
          }
        }
      }
      int64_t err = int64_t(orig[size_t(y) * w + x]) - curr;
      int64_t* Ac = A.data() + size_t(c) * dim * dim;
      int64_t* Bc = B.data() + size_t(c) * dim;
      for (int i = 0; i < dim; ++i) {
        int64_t ei = E[i];
        const int64_t* Ej = E.data() + i;
        int64_t* row = Ac + size_t(i) * dim + i;
        for (int j = i; j < dim; ++j, ++row, ++Ej) *row += ei * *Ej;
        Bc[i] += err * ei;
      }
    }
  }
  for (int c = 0; c < n_classes; ++c) {
    int64_t* Ac = A.data() + size_t(c) * dim * dim;
    for (int i = 0; i < dim; ++i)
      for (int j = 0; j < i; ++j)
        Ac[size_t(i) * dim + j] = Ac[size_t(j) * dim + i];
    for (size_t i = 0; i < size_t(dim) * dim; ++i)
      out_A[size_t(c) * dim * dim + i] = double(Ac[i]);
    for (int i = 0; i < dim; ++i)
      out_b[size_t(c) * dim + i] = double(B[size_t(c) * dim + i]);
  }
}

}  // extern "C"

// ===========================================================================
// Dependent quantization: 4-state trellis (ops/depquant.py port — the
// DepQuant.cpp analog).  Bit-exact vs the Python golden model: float64
// costs with the same operation order, full per-state level maps.
// ===========================================================================

namespace dq {

constexpr double STATE_INF = 1.0e30;
constexpr double DEC_INF = 1.0e29;
constexpr int RICEMAX = 32;
constexpr int64_t EP = 1 << 15;
constexpr int ISCSBB = 0, SOCSBB = 1, EOCSBB = 2;

static int64_t GOLOMB_BITS[4][RICEMAX];
static bool g_golomb_init = false;
static std::once_flag g_golomb_once;
static void init_golomb_impl();
static void init_golomb() { std::call_once(g_golomb_once, init_golomb_impl); }
static void init_golomb_impl() {
  if (g_golomb_init) return;
  for (int p = 0; p < 4; ++p)
    for (int v = 0; v < RICEMAX; ++v) {
      int t = 5 << p;
      if (v < t) {
        GOLOMB_BITS[p][v] = int64_t((v >> p) + 1 + p) << SCALE_BITS;
      } else {
        int len = p, s = v - t;
        while (s >= (1 << len)) {
          s -= 1 << len;
          ++len;
        }
        GOLOMB_BITS[p][v] = int64_t(5 + len + 1 - p + len) << SCALE_BITS;
      }
    }
  g_golomb_init = true;
}

static const int TPL_DX[5] = {1, 2, 1, 0, 0};
static const int TPL_DY[5] = {0, 0, 1, 1, 2};

// Trellis state.  Levels live in two tiers (vvenc DepQuant.h CommonCtx
// analog, DepQuant.h:245-292): `cg` holds the current coding group's
// levels (local raster), while `full`/`sbbf` point into pooled chunks
// holding all FINISHED groups, committed once per group at the EOS
// transition.  The 5-position context template only ever reads the
// current group (from `cg`) or already-finished groups (from `full`),
// so the hybrid storage reproduces the flat-array reads bit-exactly
// while cutting the per-position copy from O(w*h) to O(|cg|).
struct DqState {
  double rd = STATE_INF;
  uint16_t* full = nullptr;     // [h*w] committed levels by blkpos
  uint8_t* sbbf = nullptr;      // [n_sbb] committed group sig flags
  int32_t cg[16] = {};          // current-group levels, (ly<<lcw)+lx
  int rem_reg_bins = 4;
  int num_sig = 0;
  int64_t sbb_bits0 = 0, sbb_bits1 = 0;
  int64_t sig0 = 0, sig1 = 0;
  const int64_t* cff_row = nullptr;  // [6]
  int rice_par = 0, rice_zero = 0;
};

struct TplSums {
  int raw, s1, num;
};
static TplSums tpl_sums(const int32_t* levels, int x, int y, int w, int h) {
  TplSums r{0, 0, 0};
  for (int k = 0; k < 5; ++k) {
    int nx = x + TPL_DX[k], ny = y + TPL_DY[k];
    if (nx < w && ny < h) {
      int t = levels[ny * w + nx];
      if (t) {
        r.raw += t;
        r.s1 += int(std::min<int64_t>(4 + (t & 1), t));
        r.num += 1;
      }
    }
  }
  return r;
}

static int64_t level_bits(int level, const int64_t* cff_row,
                          const int64_t* rice_tab) {
  if (level < 4) return cff_row[level];
  int val = (level - 4) >> 1;
  return cff_row[level - (val << 1)] +
         rice_tab[std::min(val, RICEMAX - 1)];
}

}  // namespace dq

extern "C" {

// trellis-quantize one TU (ops/depquant.py depquant_np); returns 1 when
// any level is nonzero
int vte_depquant(const int32_t* coeff, int w, int h, int qp, int bit_depth,
                 int is_luma, double lmbda, int cbf_ctx_id, int thr_val,
                 const uint16_t* s0, const uint16_t* s1, int32_t* out) {
  using namespace dq;
  init_golomb();
  Cctx cctx(w, h, is_luma != 0);
  const int n = cctx.n_coded;
  const int ch = cctx.ch;
  bool sqrt2 = ((31 - __builtin_clz(unsigned(w * h))) & 1) == 1;
  int tshift_i = MAX_LOG2_TR_DYNAMIC_RANGE - bit_depth -
                 ((cctx.log2w + cctx.log2h) >> 1);
  int tshift = tshift_i + (sqrt2 ? -1 : 0);
  int qp_dq = qp + 1;
  int q_shift = 14 - 1 + qp_dq / 6 + tshift;
  int64_t q_add = -((int64_t(3) << q_shift) >> 1);
  int64_t q_scale = QUANT_SCALES[sqrt2 ? 1 : 0][qp_dq % 6];
  const int max_qidx = (1 << 15) - 4;
  double tshift_eff = double(tshift_i) - (sqrt2 ? 0.5 : 0.0);
  double dist_fact = std::pow(2.0, -2.0 * tshift_eff + SCALE_BITS + q_shift)
                     / (double(q_scale) * double(q_scale) * lmbda);

  std::memset(out, 0, sizeof(int32_t) * size_t(w) * h);
  std::vector<int64_t> abs_scan(n);
  for (int sp = 0; sp < n; ++sp)
    abs_scan[sp] = std::llabs(int64_t(coeff[cctx.si->blkpos[sp]]));

  int64_t thres_last = q_shift > 0 ? (int64_t(thr_val) << (q_shift - 1))
                                   : int64_t(thr_val >> 1) << q_shift;
  int64_t default_th = thres_last / (q_scale << 2);
  int first_pos = n - 1;
  while (first_pos >= 0 && abs_scan[first_pos] <= default_th) --first_pos;
  if (first_pos < 0) return 0;

  auto fb = [&](int ctx, int b) -> int64_t {
    return g_frac[state8(s0, s1, ctx)][b];
  };

  // rate tables
  const int n_sig_ctx = ch == 0 ? 12 : 8;
  std::vector<int64_t> sig_tab(3 * n_sig_ctx * 2);
  for (int s = 0; s < 3; ++s)
    for (int c = 0; c < n_sig_ctx; ++c) {
      int id = g_bases.sig[ch + 2 * s] + c;
      sig_tab[(s * n_sig_ctx + c) * 2] = fb(id, 0);
      sig_tab[(s * n_sig_ctx + c) * 2 + 1] = fb(id, 1);
    }
  const int n_gtx_ctx = ch == 0 ? 21 : 11;
  std::vector<int64_t> gtx_tab(size_t(n_gtx_ctx) * 6);
  for (int c = 0; c < n_gtx_ctx; ++c) {
    int64_t p0 = EP + fb(g_bases.par[ch] + c, 0);
    int64_t p1 = EP + fb(g_bases.par[ch] + c, 1);
    int64_t g1_0 = fb(g_bases.gtx[ch + 2] + c, 0);
    int64_t g1_1 = fb(g_bases.gtx[ch + 2] + c, 1);
    int64_t g2_0 = fb(g_bases.gtx[ch] + c, 0);
    int64_t g2_1 = fb(g_bases.gtx[ch] + c, 1);
    int64_t* row = &gtx_tab[size_t(c) * 6];
    row[0] = 0;
    row[1] = g1_0 + EP;
    row[2] = g1_1 + p0 + g2_0;
    row[3] = g1_1 + p1 + g2_0;
    row[4] = g1_1 + p0 + g2_1;
    row[5] = g1_1 + p1 + g2_1;
  }
  int64_t sbb_tab[2][2];
  for (int c = 0; c < 2; ++c) {
    sbb_tab[c][0] = fb(g_bases.sig_group[ch] + c, 0);
    sbb_tab[c][1] = fb(g_bases.sig_group[ch] + c, 1);
  }
  int64_t cbf_delta = 0;
  if (cbf_ctx_id >= 0) cbf_delta = fb(cbf_ctx_id, 1) - fb(cbf_ctx_id, 0);
  // last-position rate per coordinate
  std::vector<int64_t> last_bits[2];
  for (int axis = 0; axis < 2; ++axis) {
    int size = std::min(32, axis ? h : w);
    int max_gi = GROUP_IDX_TAB[size - 1];
    int64_t bit_off = axis ? cbf_delta : 0;
    std::vector<int64_t> ctx_bits(max_gi + 1, 0);
    int64_t sum_fb = 0;
    for (int gi = 0; gi < max_gi; ++gi) {
      int cid = cctx.last_ctx_id(gi, axis == 0);
      ctx_bits[gi] = sum_fb + fb(cid, 0) +
                     (gi > 3 ? (int64_t((gi - 2) >> 1) << SCALE_BITS) : 0) +
                     bit_off;
      sum_fb += fb(cid, 1);
    }
    ctx_bits[max_gi] =
        sum_fb +
        (max_gi > 3 ? (int64_t((max_gi - 2) >> 1) << SCALE_BITS) : 0) +
        bit_off;
    last_bits[axis].resize(size);
    for (int p = 0; p < size; ++p)
      last_bits[axis][p] = ctx_bits[GROUP_IDX_TAB[p]];
  }

  const int log2_cg = cctx.log2_cg;
  const int cg_size = 1 << log2_cg;
  const int cg_mask = cg_size - 1;
  const int n_sbb = n >> log2_cg;
  const int w_in_g = cctx.w_in_groups;
  const int init_rrb = (n * CTX_BIN_SAMPLE_RATIO) >> 4;

  // pooled level/flag chunks: two generations of 4 (ping-ponged at each
  // group boundary) plus one shared always-zero chunk for fresh states
  const int lcw = cctx.si->lcw, lch = cctx.si->lch;
  const int cgw_l = 1 << lcw, cgh_l = 1 << lch;
  const int mwl = cgw_l - 1, mhl = cgh_l - 1;
  const size_t full_n = size_t(w) * h;
  const size_t sbb_n = size_t(std::max(1, n_sbb));
  const size_t chunk = (full_n * 2 + sbb_n + 7) & ~size_t(7);
  std::vector<uint8_t> pool(chunk * 9, 0);
  auto full_of = [&](int g, int t) {
    return reinterpret_cast<uint16_t*>(pool.data() + chunk * (g * 4 + t));
  };
  auto sbbf_of = [&](int g, int t) {
    return pool.data() + chunk * (g * 4 + t) + full_n * 2;
  };
  uint16_t* zero_full = reinterpret_cast<uint16_t*>(pool.data() + chunk * 8);
  uint8_t* zero_sbbf = pool.data() + chunk * 8 + full_n * 2;
  int gen = 0;

  // template sums over the hybrid storage — identical values to the
  // flat-array tpl_sums: in-group neighbors from cg, finished groups
  // from full (every template neighbor is at a later scan position, so
  // it is one or the other)
  auto tpl_hyb = [&](const DqState& st, int px, int py) -> TplSums {
    TplSums r{0, 0, 0};
    int cgx0 = px >> lcw, cgy0 = py >> lch;
    for (int k = 0; k < 5; ++k) {
      int nx = px + TPL_DX[k], ny = py + TPL_DY[k];
      if (nx < w && ny < h) {
        int t = ((nx >> lcw) == cgx0 && (ny >> lch) == cgy0)
                    ? st.cg[((ny & mhl) << lcw) + (nx & mwl)]
                    : int(st.full[size_t(ny) * w + nx]);
        if (t) {
          r.raw += t;
          r.s1 += int(std::min<int64_t>(4 + (t & 1), t));
          r.num += 1;
        }
      }
    }
    return r;
  };

  DqState states_a[4], states_b[4];
  DqState* states = states_a;
  DqState* nstates = states_b;
  for (int k = 0; k < 4; ++k) {
    states[k].full = zero_full;
    states[k].sbbf = zero_sbbf;
    states[k].cff_row = &gtx_tab[0];
    int set = std::max(0, k - 1);
    states[k].sig0 = sig_tab[(set * n_sig_ctx + 0) * 2];
    states[k].sig1 = sig_tab[(set * n_sig_ctx + 0) * 2 + 1];
  }
  struct Skip {
    bool valid = false;
    double rd = 0;
    const uint16_t* full = nullptr;  // stable until this group's EOS
    const uint8_t* sbbf = nullptr;
    int rem_reg_bins = 0;
    int64_t sbb_bits0 = 0;
  };
  Skip skip[4];

  // decisions per position
  std::vector<double> lane_rd(size_t(first_pos + 1) * 4);
  std::vector<int32_t> lane_lvl(size_t(first_pos + 1) * 4);
  std::vector<int32_t> lane_prev(size_t(first_pos + 1) * 4);
  std::map<int, std::pair<std::array<int32_t, 4>, std::array<int32_t, 4>>>
      lane1;  // EOS: (lvl[4], prev[4])

  for (int sp = first_pos; sp >= 0; --sp) {
    int x = cctx.si->sx[sp], y = cctx.si->sy[sp];
    int inside = sp & cg_mask;
    int spt = ISCSBB;
    if (inside == cg_mask && sp > cg_size && sp < n - 1)
      spt = SOCSBB;
    else if (inside == 0 && 0 < sp && sp < n - cg_size)
      spt = EOCSBB;

    double dec_rd[4] = {DEC_INF, DEC_INF, DEC_INF, DEC_INF};
    int dec_lvl[4] = {0, 0, 0, 0};
    int dec_prev[4] = {-2, -2, -2, -2};

    auto set_rice = [&](DqState& st, bool ge4) {
      if (st.rem_reg_bins < 4 || ge4) {
        int raw = tpl_hyb(st, x, y).raw;
        int sub = st.rem_reg_bins < 4 ? 0 : 20;
        st.rice_par = GO_RICE_PARS[std::max(std::min(31, raw - sub), 0)];
      }
    };

    int64_t last_off = last_bits[0][x] + last_bits[1][y];

    int64_t u = abs_scan[sp] * q_scale;
    int64_t qidx = (u + q_add) >> q_shift;
    auto dd = [&](int64_t qc) {
      return dist_fact * (double(qc) * double(qc) * double(int64_t(1) << q_shift)
                          - 2.0 * double(qc) * double(u));
    };

    auto check = [&](int st_id, int lvl_a, double dd_a, int lvl_b,
                     double dd_b, int idx_az, int idx_b) {
      DqState& st = states[st_id];
      const int64_t* rice_tab = GOLOMB_BITS[st.rice_par];
      double rd_a = st.rd + dd_a;
      double rd_b = st.rd + dd_b;
      double rd_z = st.rd;
      if (st.rem_reg_bins >= 4) {
        rd_a += double(level_bits(lvl_a, st.cff_row, rice_tab));
        rd_b += double(level_bits(lvl_b, st.cff_row, rice_tab));
        if (spt == ISCSBB) {
          rd_a += double(st.sig1);
          rd_b += double(st.sig1);
          rd_z += double(st.sig0);
        } else if (spt == SOCSBB) {
          rd_a += double(st.sbb_bits1 + st.sig1);
          rd_b += double(st.sbb_bits1 + st.sig1);
          rd_z += double(st.sbb_bits1 + st.sig0);
        } else if (st.num_sig) {
          rd_a += double(st.sig1);
          rd_b += double(st.sig1);
          rd_z += double(st.sig0);
        } else {
          rd_z = STATE_INF;
        }
      } else {
        int zp = st.rice_zero;
        rd_a += double(EP + rice_tab[lvl_a <= zp ? lvl_a - 1
                                     : std::min(lvl_a, RICEMAX - 1)]);
        rd_b += double(EP + rice_tab[lvl_b <= zp ? lvl_b - 1
                                     : std::min(lvl_b, RICEMAX - 1)]);
        rd_z += double(rice_tab[zp]);
      }
      if (rd_a < rd_z && rd_a < dec_rd[idx_az]) {
        dec_rd[idx_az] = rd_a;
        dec_lvl[idx_az] = lvl_a;
        dec_prev[idx_az] = st_id;
      } else if (rd_z < dec_rd[idx_az]) {
        dec_rd[idx_az] = rd_z;
        dec_lvl[idx_az] = 0;
        dec_prev[idx_az] = st_id;
      }
      if (rd_b < dec_rd[idx_b]) {
        dec_rd[idx_b] = rd_b;
        dec_lvl[idx_b] = lvl_b;
        dec_prev[idx_b] = st_id;
      }
    };

    auto check_odd1 = [&](int st_id, double dd1, int idx_a, int idx_z) {
      DqState& st = states[st_id];
      double rd_a = st.rd + dd1;
      double rd_z = st.rd;
      if (st.rem_reg_bins >= 4) {
        rd_a += double(st.cff_row[1]);
        if (spt == ISCSBB) {
          rd_a += double(st.sig1);
          rd_z += double(st.sig0);
        } else if (spt == SOCSBB) {
          rd_a += double(st.sbb_bits1 + st.sig1);
          rd_z += double(st.sbb_bits1 + st.sig0);
        } else if (st.num_sig) {
          rd_a += double(st.sig1);
          rd_z += double(st.sig0);
        } else {
          rd_z = STATE_INF;
        }
      } else {
        const int64_t* rice_tab = GOLOMB_BITS[st.rice_par];
        rd_a += double(EP + rice_tab[0]);
        rd_z += double(rice_tab[st.rice_zero]);
      }
      if (rd_a < dec_rd[idx_a]) {
        dec_rd[idx_a] = rd_a;
        dec_lvl[idx_a] = 1;
        dec_prev[idx_a] = st_id;
      }
      if (rd_z < dec_rd[idx_z]) {
        dec_rd[idx_z] = rd_z;
        dec_lvl[idx_z] = 0;
        dec_prev[idx_z] = st_id;
      }
    };

    auto check_start = [&](int lvl, double ddv, int idx) {
      double rd = ddv + double(last_off) +
                  double(level_bits(lvl, &gtx_tab[0], GOLOMB_BITS[0]));
      if (rd < dec_rd[idx]) {
        dec_rd[idx] = rd;
        dec_lvl[idx] = lvl;
        dec_prev[idx] = -1;
      }
    };

    if (qidx < 0) {
      double dd_a = dd(1);
      double dd_b = dd(2);
      set_rice(states[0], false);
      check_odd1(0, dd_b, 2, 0);
      set_rice(states[1], false);
      check_odd1(1, dd_b, 0, 2);
      set_rice(states[2], false);
      check_odd1(2, dd_a, 3, 1);
      set_rice(states[3], false);
      check_odd1(3, dd_a, 1, 3);
      check_start(1, dd_b, 2);
    } else {
      qidx = std::max<int64_t>(1, std::min<int64_t>(max_qidx, qidx));
      int pq_lvl[4];
      double pq_dd[4];
      for (int k = 0; k < 4; ++k) {
        int64_t qc = qidx + k;
        pq_lvl[qc & 3] = int((qc + 1) >> 1);
        pq_dd[qc & 3] = dd(qc);
      }
      bool ge4_02 = pq_lvl[0] >= 4;
      bool ge4_13 = pq_lvl[3] >= 4;
      set_rice(states[0], ge4_02);
      set_rice(states[1], ge4_02);
      set_rice(states[2], ge4_13);
      set_rice(states[3], ge4_13);
      check(0, pq_lvl[0], pq_dd[0], pq_lvl[2], pq_dd[2], 0, 2);
      check(1, pq_lvl[0], pq_dd[0], pq_lvl[2], pq_dd[2], 2, 0);
      check(2, pq_lvl[3], pq_dd[3], pq_lvl[1], pq_dd[1], 1, 3);
      check(3, pq_lvl[3], pq_dd[3], pq_lvl[1], pq_dd[1], 3, 1);
      check_start(pq_lvl[0], pq_dd[0], 0);
      check_start(pq_lvl[2], pq_dd[2], 2);
    }

    if (spt == EOCSBB) {
      for (int s = 0; s < 4; ++s) {
        if (skip[s].valid) {
          double rd = skip[s].rd + double(skip[s].sbb_bits0);
          if (rd < dec_rd[s]) {
            dec_rd[s] = rd;
            dec_lvl[s] = 0;
            dec_prev[s] = 4 | s;
          }
        }
      }
    }

    for (int t = 0; t < 4; ++t) {
      lane_rd[size_t(sp) * 4 + t] = dec_rd[t];
      lane_lvl[size_t(sp) * 4 + t] = dec_lvl[t];
      lane_prev[size_t(sp) * 4 + t] = dec_prev[t];
    }

    if (sp == 0) break;

    if (spt == SOCSBB) {
      // snapshot by pointer: the pooled chunks are only rewritten at the
      // EOS transition of this same group, after resurrection reads them
      for (int s = 0; s < 4; ++s) {
        skip[s].valid = true;
        skip[s].rd = states[s].rd;
        skip[s].full = states[s].full;
        skip[s].sbbf = states[s].sbbf;
        skip[s].rem_reg_bins = states[s].rem_reg_bins;
        skip[s].sbb_bits0 = states[s].sbb_bits0;
      }
    }

    // ----- state update -----
    int sp_next = sp - 1;
    int nx = cctx.si->sx[sp_next], ny = cctx.si->sy[sp_next];
    int dg = nx + ny;
    int sig_off, gtx_off;
    if (ch == 0) {
      sig_off = dg < 2 ? 8 : (dg < 5 ? 4 : 0);
      gtx_off = dg < 1 ? 16 : (dg < 3 ? 11 : (dg < 10 ? 6 : 1));
    } else {
      sig_off = dg < 2 ? 4 : 0;
      gtx_off = dg < 1 ? 6 : 1;
    }
    bool is_eos = inside == 0;
    const int ngen = gen ^ 1;
    // commit this state's current-group levels into a fresh chunk of the
    // next generation (sources — old-generation/zero chunks and the skip
    // snapshots — stay intact until the whole transition is done)
    auto migrate = [&](DqState& st, int t) {
      uint16_t* nf = full_of(ngen, t);
      uint8_t* nsb = sbbf_of(ngen, t);
      std::memcpy(nf, st.full, full_n * 2);
      std::memcpy(nsb, st.sbbf, sbb_n);
      int bx0 = (x >> lcw) << lcw, by0 = (y >> lch) << lch;
      for (int ly = 0; ly < cgh_l; ++ly)
        for (int lx = 0; lx < cgw_l; ++lx)
          nf[size_t(by0 + ly) * w + bx0 + lx] =
              uint16_t(st.cg[(ly << lcw) + lx]);
      std::memset(st.cg, 0, sizeof(st.cg));
      st.full = nf;
      st.sbbf = nsb;
    };
    for (int t = 0; t < 4; ++t) {
      DqState& st = nstates[t];
      st.rd = dec_rd[t];
      st.cff_row = &gtx_tab[0];
      st.sig0 = st.sig1 = 0;
      st.rice_par = st.rice_zero = 0;
      int pid = dec_prev[t];
      int lvl = dec_lvl[t];
      if (pid == -2) {
        // lane not reached (rd stays DEC_INF): carry the old state's
        // storage; sig/rice stay at defaults as in the golden model
        st.full = states[t].full;
        st.sbbf = states[t].sbbf;
        std::memcpy(st.cg, states[t].cg, sizeof(st.cg));
        st.rem_reg_bins = states[t].rem_reg_bins;
        st.num_sig = states[t].num_sig;
        st.sbb_bits0 = states[t].sbb_bits0;
        st.sbb_bits1 = states[t].sbb_bits1;
        if (is_eos) migrate(st, t);
        continue;
      }
      if (pid >= 4) {
        const Skip& sk = skip[pid - 4];
        st.full = const_cast<uint16_t*>(sk.full);
        st.sbbf = const_cast<uint8_t*>(sk.sbbf);
        std::memset(st.cg, 0, sizeof(st.cg));
        st.rem_reg_bins = sk.rem_reg_bins;
        st.num_sig = 0;
      } else if (pid >= 0) {
        const DqState& p = states[pid];
        st.full = p.full;
        st.sbbf = p.sbbf;
        std::memcpy(st.cg, p.cg, sizeof(st.cg));
        st.num_sig = p.num_sig + (lvl ? 1 : 0);
        st.rem_reg_bins = p.rem_reg_bins - 1;
        if (st.rem_reg_bins >= 4)
          st.rem_reg_bins -= lvl < 2 ? lvl : 3;
      } else {
        st.full = zero_full;
        st.sbbf = zero_sbbf;
        std::memset(st.cg, 0, sizeof(st.cg));
        st.num_sig = 1;
        st.rem_reg_bins = init_rrb - (lvl < 2 ? lvl : 3);
      }
      st.sbb_bits0 = (pid >= 0 && pid < 4) ? states[pid].sbb_bits0 : 0;
      st.sbb_bits1 = (pid >= 0 && pid < 4) ? states[pid].sbb_bits1 : 0;
      if (lvl) st.cg[((y & mhl) << lcw) + (x & mwl)] = lvl;
      if (is_eos) {
        migrate(st, t);
        int cur_sbb = cctx.si->cg_pos[sp >> log2_cg];
        st.sbbf[cur_sbb] = st.num_sig ? 1 : 0;
        st.num_sig = 0;
        int nxt_sbb = cctx.si->cg_pos[sp_next >> log2_cg];
        int sy = nxt_sbb / w_in_g, sx = nxt_sbb % w_in_g;
        int right = sx + 1 < w_in_g ? st.sbbf[nxt_sbb + 1] : 0;
        int below =
            sy + 1 < cctx.h_in_groups ? st.sbbf[nxt_sbb + w_in_g] : 0;
        st.sbb_bits0 = sbb_tab[(right || below) ? 1 : 0][0];
        st.sbb_bits1 = sbb_tab[(right || below) ? 1 : 0][1];
      }
      if (st.rem_reg_bins >= 4) {
        TplSums ts = tpl_hyb(st, nx, ny);
        int set = std::max(0, t - 1);
        int c = sig_off + std::min((ts.s1 + 1) >> 1, 3);
        st.sig0 = sig_tab[(set * n_sig_ctx + c) * 2];
        st.sig1 = sig_tab[(set * n_sig_ctx + c) * 2 + 1];
        st.cff_row = &gtx_tab[size_t(gtx_off + std::min(ts.s1 - ts.num, 4))
                              * 6];
      } else {
        int raw = tpl_hyb(st, nx, ny).raw;
        st.rice_par = GO_RICE_PARS[std::max(std::min(31, raw), 0)];
        st.rice_zero = (t < 2 ? 1 : 2) << st.rice_par;
      }
    }
    std::swap(states, nstates);
    if (is_eos) gen = ngen;
    if (is_eos) {
      std::array<int32_t, 4> lv, pv;
      for (int t = 0; t < 4; ++t) {
        lv[t] = lane_lvl[size_t(sp) * 4 + t];
        pv[t] = lane_prev[size_t(sp) * 4 + t];
      }
      lane1[sp] = {lv, pv};
    }
  }

  // best path + backtrack
  int best_id = -1;
  double best_cost = 0.0;
  for (int s = 0; s < 4; ++s) {
    if (lane_rd[s] < best_cost) {
      best_cost = lane_rd[s];
      best_id = s;
    }
  }
  if (best_id < 0) return 0;
  int sp = 0, pid = best_id;
  int any = 0;
  while (pid >= 0) {
    int lvl, nxt;
    if (pid >= 4) {
      auto it = lane1.find(sp);
      if (it == lane1.end()) {
        lvl = 0;
        nxt = pid;  // stay in the skip lane
      } else {
        lvl = it->second.first[pid & 3];
        nxt = it->second.second[pid & 3];
      }
    } else {
      lvl = lane_lvl[size_t(sp) * 4 + pid];
      nxt = lane_prev[size_t(sp) * 4 + pid];
    }
    if (lvl) {
      int blk = cctx.si->blkpos[sp];
      int64_t v = coeff[blk] < 0 ? -int64_t(lvl) : int64_t(lvl);
      out[blk] = int32_t(std::max<int64_t>(COEFF_MIN,
                                           std::min<int64_t>(COEFF_MAX, v)));
      any = 1;
    }
    pid = nxt;
    ++sp;
  }
  return any;
}

}  // extern "C"

extern "C" {

// reference-sample builder with the ISP partition availability rule
// (ops/intra.py build_reference_samples avail_fn path; ctu_syntax.py
// predict_isp_partition: inside the CU, rows above / columns left of
// the current partition are available, outside the coded mask decides)
void vte_build_refs_isp(const int32_t* rec, int ph, int pw, int x, int y,
                        int w, int h, const uint8_t* coded, int cuh,
                        int cuw, int unit, int bit_depth,
                        int pred_size_in, int pred_hsize_in, int cu_x,
                        int cu_y, int cu_w, int cu_h, int isp_mode,
                        int32_t* top, int32_t* left) {
  int pred_size = pred_size_in > 0 ? pred_size_in : 2 * w;
  int pred_hsize = pred_hsize_in > 0 ? pred_hsize_in : 2 * h;
  int32_t dc_val = 1 << (bit_depth - 1);
  int x0 = x - 1, y0 = y - 1;
  int tl = pred_size + 3, ll = pred_hsize + 3;
  for (int i = 0; i < tl; ++i) top[i] = dc_val;
  for (int i = 0; i < ll; ++i) left[i] = dc_val;
  auto avail = [&](int qx, int qy) -> bool {
    if (qx < 0 || qy < 0 || qx >= pw || qy >= ph) return false;
    if (cu_x <= qx && qx < cu_x + cu_w && cu_y <= qy && qy < cu_y + cu_h)
      return isp_mode == 1 ? (qy < y) : (qx < x);
    return coded[(qy / unit) * cuw + qx / unit] != 0;
  };
  std::vector<uint8_t> ft(pred_size + 1, 0), fl(pred_hsize + 1, 0);
  bool any = false;
  if (y0 >= 0) {
    for (int j = 0; j <= pred_size; ++j) {
      int jx = x0 + j;
      if (jx < 0 || jx >= pw) continue;
      if (avail(jx, y0)) {
        top[j] = rec[size_t(y0) * pw + jx];
        ft[j] = 1;
        any = true;
      }
    }
  }
  if (x0 >= 0) {
    for (int i = 0; i <= pred_hsize; ++i) {
      int iy = y0 + i;
      if (iy < 0 || iy >= ph) continue;
      if (avail(x0, iy)) {
        left[i] = rec[size_t(iy) * pw + x0];
        fl[i] = 1;
        any = true;
      }
    }
  }
  if (any) {
    int total = pred_hsize + 1 + pred_size;
    std::vector<int32_t> vals(total);
    std::vector<uint8_t> filled(total);
    for (int i = 0; i < pred_hsize; ++i) {
      vals[i] = left[pred_hsize - i];
      filled[i] = fl[pred_hsize - i];
    }
    vals[pred_hsize] = left[0];
    filled[pred_hsize] = fl[0];
    for (int j = 0; j < pred_size; ++j) {
      vals[pred_hsize + 1 + j] = top[1 + j];
      filled[pred_hsize + 1 + j] = ft[1 + j];
    }
    int first = 0;
    while (first < total && !filled[first]) ++first;
    int32_t cur = vals[first];
    for (int i = 0; i < total; ++i) {
      if (filled[i])
        cur = vals[i];
      else
        vals[i] = cur;
      if (i < first) vals[i] = vals[first];
    }
    for (int i = 0; i < pred_hsize; ++i) left[pred_hsize - i] = vals[i];
    left[0] = vals[pred_hsize];
    top[0] = vals[pred_hsize];
    for (int j = 0; j < pred_size; ++j) top[1 + j] = vals[pred_hsize + 1 + j];
  }
  for (int i = pred_size + 1; i < tl; ++i) top[i] = top[pred_size];
  for (int i = pred_hsize + 1; i < ll; ++i) left[i] = left[pred_hsize];
}

// dependent-quantization dequant (ops/transforms.py dequant_dq_np): the
// decoder's 2-quantizer state machine over the scan
void vte_dequant_dq(const int32_t* qc, int w, int h, int qp, int bit_depth,
                    int is_luma, int32_t* out) {
  Cctx cctx(w, h, is_luma != 0);
  bool sqrt2 = ((31 - __builtin_clz(unsigned(w * h))) & 1) == 1;
  int tshift = MAX_LOG2_TR_DYNAMIC_RANGE - bit_depth -
               ((cctx.log2w + cctx.log2h) >> 1) + (sqrt2 ? -1 : 0);
  int qp_dq = qp + 1;
  // invQuantScales (Quant.cpp g_invQuantScales), doubled grid shift -1
  static const int64_t INV_SCALES[2][6] = {
      {40, 45, 51, 57, 64, 72}, {57, 64, 72, 80, 90, 102}};
  int64_t scale = INV_SCALES[sqrt2 ? 1 : 0][qp_dq % 6];
  int shift = 6 - (tshift + qp_dq / 6) + 1;
  int n = cctx.n_coded;
  std::memset(out, 0, sizeof(int32_t) * size_t(w) * h);
  int state = 0;
  for (int sp = n - 1; sp >= 0; --sp) {
    int blk = cctx.si->blkpos[sp];
    int64_t lvl = qc[blk];
    if (lvl) {
      int64_t qcoef = 2 * lvl - (lvl > 0 ? 1 : -1) * (state >> 1);
      int64_t v;
      if (shift >= 0)
        v = (qcoef * scale + ((int64_t(1) << shift) >> 1)) >> shift;
      else
        v = (qcoef * scale) << (-shift);
      out[blk] = int32_t(std::max<int64_t>(COEFF_MIN,
                                           std::min<int64_t>(COEFF_MAX, v)));
    }
    state = next_state(state, std::llabs(lvl));
  }
}

}  // extern "C"

// ===========================================================================
// Matrix-based intra prediction (MIP), H.266 8.4.5.2.2/8.4.5.2.3.
// Bit-exact port of vvenc_tpu/ops/mip.py predict_mip (behavioral reference:
// vvenc CommonLib/MatrixIntraPrediction.cpp prepareInputForPred:87,
// predBlock:131, boundaryDownsampling1D:233, predictionUpsampling1D*:263).
// The normative weight matrices are loaded once from Python (the same
// mip_weights.npz arrays) via vte_mip_init.
// ===========================================================================

namespace mipk {

static const int MIP_SHIFT = 6;   // MIP_SHIFT_MATRIX
static const int MIP_OFF = 32;    // MIP_OFFSET_MATRIX

// flattened weights per size class: [mode][out_row][in]
static std::vector<int32_t> W[3];
static const int W_MODES[3] = {16, 8, 6};
static const int W_IN[3]    = {4, 8, 8};
static const int W_ROWS[3]  = {16, 16, 64};   // red_size^2

static inline int size_id(int w, int h) {
  if (w == 4 && h == 4) return 0;
  if (w == 4 || h == 4 || (w == 8 && h == 8)) return 1;
  return 2;
}

static inline void downsample(const int32_t* full, int src_len, int dst_len,
                              int32_t* dst) {
  if (dst_len >= src_len) {
    for (int i = 0; i < dst_len; i++) dst[i] = full[i];
    return;
  }
  int f = src_len / dst_len;
  int lg = 31 - __builtin_clz(f);
  for (int i = 0; i < dst_len; i++) {
    int64_t s = 0;
    for (int j = 0; j < f; j++) s += full[i * f + j];
    dst[i] = (int32_t)((s + (1 << (lg - 1))) >> lg);
  }
}

// linear upsampling along the row axis: src is (n, m), before[i] is the
// boundary sample conceptually at column -1 of row i; dst is (n, m*factor)
static inline void upsample_rows(const int32_t* src, int n, int m,
                                 const int32_t* before, int factor,
                                 int32_t* dst) {
  int lg = 31 - __builtin_clz(factor);
  int64_t rnd = (int64_t)1 << (lg - 1);
  for (int i = 0; i < n; i++) {
    int32_t prev = before[i];
    for (int j = 0; j < m; j++) {
      int64_t d = (int64_t)src[i * m + j] - prev;
      int64_t base = ((int64_t)prev << lg) + rnd;
      for (int pos = 1; pos <= factor; pos++)
        dst[i * m * factor + j * factor + (pos - 1)] =
            (int32_t)((base + d * pos) >> lg);
      prev = src[i * m + j];
    }
  }
}

// top/left: the w (resp. h) substituted neighbour samples directly
// above/left of the block (build_reference_samples top[1:w+1]/left[1:h+1])
static void predict(const int32_t* top, const int32_t* left, int w, int h,
                    int mode, int transposed, int bit_depth, int32_t* out) {
  int sid = size_id(w, h);
  int bdry = sid == 0 ? 2 : 4;
  int red = sid < 2 ? 4 : 8;
  int up_hor = w / red, up_ver = h / red;

  int32_t rt[4], rl[4], p[8];
  downsample(top, w, bdry, rt);
  downsample(left, h, bdry, rl);
  const int32_t* first = transposed ? rl : rt;
  const int32_t* second = transposed ? rt : rl;
  int32_t input_offset = first[0];
  int in_len = 2 * bdry;
  for (int i = 0; i < bdry; i++) {
    p[i] = first[i] - input_offset;
    p[bdry + i] = second[i] - input_offset;
  }
  p[0] = sid < 2 ? (1 << (bit_depth - 1)) - input_offset : 0;

  int64_t s = 0;
  for (int i = 0; i < in_len; i++) s += p[i];
  int64_t offset = (int64_t)(1 << (MIP_SHIFT - 1)) - MIP_OFF * s +
                   ((int64_t)input_offset << MIP_SHIFT);
  int32_t maxval = (1 << bit_depth) - 1;

  const int32_t* wm = W[sid].data() + (size_t)mode * W_ROWS[sid] * W_IN[sid];
  int32_t redbuf[64], redT[64];
  for (int r = 0; r < red * red; r++) {
    int64_t acc = 0;
    for (int i = 0; i < in_len; i++)
      acc += (int64_t)wm[r * in_len + i] * p[i];
    int64_t v = (acc + offset) >> MIP_SHIFT;
    redbuf[r] = (int32_t)(v < 0 ? 0 : (v > maxval ? maxval : v));
  }
  if (transposed) {
    for (int y = 0; y < red; y++)
      for (int x = 0; x < red; x++) redT[y * red + x] = redbuf[x * red + y];
    for (int r = 0; r < red * red; r++) redbuf[r] = redT[r];
  }

  if (up_hor == 1 && up_ver == 1) {
    for (int r = 0; r < red * red; r++) out[r] = redbuf[r];
    return;
  }

  int32_t before[64], hbuf[8 * 64], tbuf[64 * 64], ubuf[64 * 64];
  const int32_t* cur = redbuf;
  int cur_w = red;
  if (up_hor > 1) {
    for (int r = 0; r < red; r++)
      before[r] = up_ver > 1 ? left[r * up_ver + up_ver - 1] : left[r];
    upsample_rows(cur, red, red, before, up_hor, hbuf);
    cur = hbuf;
    cur_w = w;
  }
  if (up_ver > 1) {
    // transpose (red, cur_w) -> (cur_w, red), upsample rows by up_ver
    // against the top boundary, transpose back to (h, cur_w)
    for (int x = 0; x < cur_w; x++)
      for (int r = 0; r < red; r++) tbuf[x * red + r] = cur[r * cur_w + x];
    for (int x = 0; x < cur_w; x++) before[x] = top[x];
    upsample_rows(tbuf, cur_w, red, before, up_ver, ubuf);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < cur_w; x++) out[y * cur_w + x] = ubuf[x * h + y];
  } else {
    for (int r = 0; r < red * cur_w; r++) out[r] = cur[r];
  }
}

}  // namespace mipk

extern "C" {

void vte_mip_init(const int32_t* s0, const int32_t* s1, const int32_t* s2) {
  const int32_t* src[3] = {s0, s1, s2};
  for (int k = 0; k < 3; k++) {
    size_t n = (size_t)mipk::W_MODES[k] * mipk::W_ROWS[k] * mipk::W_IN[k];
    mipk::W[k].assign(src[k], src[k] + n);
  }
}

void vte_predict_mip(const int32_t* top, const int32_t* left, int w, int h,
                     int mode, int transposed, int bit_depth, int32_t* out) {
  mipk::predict(top, left, w, h, mode, transposed, bit_depth, out);
}

// all (mode, transpose) pairs: out is (num_modes, 2, h, w)
void vte_predict_mip_all(const int32_t* top, const int32_t* left, int w,
                         int h, int bit_depth, int32_t* out) {
  int sid = mipk::size_id(w, h);
  int n = mipk::W_MODES[sid];
  for (int m = 0; m < n; m++)
    for (int t = 0; t < 2; t++)
      mipk::predict(top, left, w, h, m, t, bit_depth,
                    out + ((size_t)m * 2 + t) * w * h);
}

}  // extern "C"

// ===========================================================================
// Motion-compensation interpolation (ops/interp.py mc_block_np port): 8-tap
// luma / 4-tap chroma separable filters, H.266 8.5.6.3 shift conventions —
// the InterpolationFilterX86.h analog for the host RD loop.
// ===========================================================================

namespace mck {

constexpr int IF_PREC = 14;        // IF_INTERNAL_PREC
constexpr int IF_FILT = 6;         // IF_FILTER_PREC
constexpr int IF_OFFS = 1 << (IF_PREC - 1);

const int LUMA_FILTER[16][8] = {
    {0, 0, 0, 64, 0, 0, 0, 0},      {0, 1, -3, 63, 4, -2, 1, 0},
    {-1, 2, -5, 62, 8, -3, 1, 0},   {-1, 3, -8, 60, 13, -4, 1, 0},
    {-1, 4, -10, 58, 17, -5, 1, 0}, {-1, 4, -11, 52, 26, -8, 3, -1},
    {-1, 3, -9, 47, 31, -10, 4, -1}, {-1, 4, -11, 45, 34, -10, 4, -1},
    {-1, 4, -11, 40, 40, -11, 4, -1}, {-1, 4, -10, 34, 45, -11, 4, -1},
    {-1, 4, -10, 31, 47, -9, 3, -1}, {-1, 3, -8, 26, 52, -11, 4, -1},
    {0, 1, -5, 17, 58, -10, 4, -1}, {0, 1, -4, 13, 60, -8, 3, -1},
    {0, 1, -3, 8, 62, -5, 2, -1},   {0, 1, -2, 4, 63, -3, 1, 0}};
const int ALT_HPEL[8] = {0, 3, 9, 20, 20, 9, 3, 0};
// 32-phase 4-tap chroma filter (H.266 Table 35; ops/intra.py CHROMA_FILTER)
static int32_t CHROMA_FILTER[32][4];
static bool chroma_set = false;

}  // namespace mck

extern "C" {

void vte_mc_init(const int32_t* chroma_taps /* [32*4] */) {
  for (int p = 0; p < 32; ++p)
    for (int k = 0; k < 4; ++k)
      mck::CHROMA_FILTER[p][k] = chroma_taps[p * 4 + k];
  mck::chroma_set = true;
}

// Motion-compensated prediction of one block.  mv in 1/16 (luma) or 1/32
// (chroma) pel; out [h, w] int32.  intermediate=1 -> 14-bit biased
// intermediate (isLast=false); taps_override: 8 ints or null.
void vte_mc_block(const int32_t* ref, int ph, int pw, int x, int y, int w,
                  int h, int mv_x, int mv_y, int bit_depth, int is_luma,
                  int intermediate, int alt_hpel,
                  const int32_t* taps_override, int32_t* out) {
  using namespace mck;
  const int frac_bits = is_luma ? 4 : 5;
  const int ntaps = is_luma ? 8 : 4;
  const int half = ntaps / 2 - 1;
  const int head_room = IF_PREC - bit_depth;
  const int maxval = (1 << bit_depth) - 1;
  const int int_x = x + (mv_x >> frac_bits);
  const int frac_x = mv_x & ((1 << frac_bits) - 1);
  const int int_y = y + (mv_y >> frac_bits);
  const int frac_y = mv_y & ((1 << frac_bits) - 1);

  // gather clamped window [h + ntaps - 1, w + ntaps - 1]
  const int wh = h + ntaps - 1, ww = w + ntaps - 1;
  std::vector<int32_t> win(size_t(wh) * ww);
  std::vector<int> xs(ww), ys(wh);
  for (int i = 0; i < ww; ++i)
    xs[i] = std::min(std::max(int_x - half + i, 0), pw - 1);
  for (int i = 0; i < wh; ++i)
    ys[i] = std::min(std::max(int_y - half + i, 0), ph - 1);
  for (int i = 0; i < wh; ++i) {
    const int32_t* row = ref + size_t(ys[i]) * pw;
    int32_t* dst = win.data() + size_t(i) * ww;
    for (int j = 0; j < ww; ++j) dst[j] = row[xs[j]];
  }

  // NOTE: each call gets its OWN buffer (the x and y stages of the
  // two-stage path hold taps simultaneously); taps_override is a full
  // PER-PHASE table [16][8] (e.g. the 6-tap affine luma filter)
  auto taps_for = [&](int frac, int* buf) -> const int* {
    if (taps_override) {
      for (int k = 0; k < 8; ++k) buf[k] = taps_override[frac * 8 + k];
      return buf;
    }
    if (is_luma && alt_hpel && frac == 8) return ALT_HPEL;
    if (is_luma) return LUMA_FILTER[frac];
    for (int k = 0; k < 4; ++k) buf[k] = CHROMA_FILTER[frac][k];
    return buf;
  };

  const bool last = !intermediate;
  if (frac_x == 0 && frac_y == 0) {
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j) {
        int32_t v = win[size_t(i + half) * ww + j + half];
        out[size_t(i) * w + j] =
            intermediate ? ((v << head_room) - IF_OFFS) : v;
      }
    return;
  }

  // horizontal stage params
  auto stage_params = [&](bool is_first, bool is_last, int* shift,
                          int64_t* offset) {
    *shift = IF_FILT;
    if (is_last) {
      *shift += is_first ? 0 : head_room;
      *offset = int64_t(1) << (*shift - 1);
      if (!is_first) *offset += int64_t(IF_OFFS) << IF_FILT;
    } else {
      *shift -= is_first ? head_room : 0;
      *offset = is_first ? -(int64_t(IF_OFFS) << *shift) : 0;
    }
  };

  int tb0[8], tb1[8];
  if (frac_y == 0) {
    const int* tp = taps_for(frac_x, tb0);
    int shift; int64_t offset;
    stage_params(true, last, &shift, &offset);
    for (int i = 0; i < h; ++i) {
      const int32_t* row = win.data() + size_t(i + half) * ww;
      for (int j = 0; j < w; ++j) {
        int64_t acc = 0;
        for (int k = 0; k < ntaps; ++k) acc += int64_t(tp[k]) * row[j + k];
        int64_t v = (acc + offset) >> shift;
        if (last) v = std::min<int64_t>(std::max<int64_t>(v, 0), maxval);
        out[size_t(i) * w + j] = int32_t(v);
      }
    }
    return;
  }
  if (frac_x == 0) {
    const int* tp = taps_for(frac_y, tb0);
    int shift; int64_t offset;
    stage_params(true, last, &shift, &offset);
    for (int i = 0; i < h; ++i)
      for (int j = 0; j < w; ++j) {
        int64_t acc = 0;
        for (int k = 0; k < ntaps; ++k)
          acc += int64_t(tp[k]) * win[size_t(i + k) * ww + j + half];
        int64_t v = (acc + offset) >> shift;
        if (last) v = std::min<int64_t>(std::max<int64_t>(v, 0), maxval);
        out[size_t(i) * w + j] = int32_t(v);
      }
    return;
  }
  // two-stage: horizontal (is_first, not last) then vertical
  const int* tpx = taps_for(frac_x, tb0);
  const int* tpy = taps_for(frac_y, tb1);
  int shift1; int64_t off1;
  stage_params(true, false, &shift1, &off1);
  std::vector<int32_t> tmp(size_t(wh) * w);
  for (int i = 0; i < wh; ++i) {
    const int32_t* row = win.data() + size_t(i) * ww;
    for (int j = 0; j < w; ++j) {
      int64_t acc = 0;
      for (int k = 0; k < ntaps; ++k) acc += int64_t(tpx[k]) * row[j + k];
      tmp[size_t(i) * w + j] = int32_t((acc + off1) >> shift1);
    }
  }
  int shift2; int64_t off2;
  stage_params(false, last, &shift2, &off2);
  for (int i = 0; i < h; ++i)
    for (int j = 0; j < w; ++j) {
      int64_t acc = 0;
      for (int k = 0; k < ntaps; ++k)
        acc += int64_t(tpy[k]) * tmp[size_t(i + k) * w + j];
      int64_t v = (acc + off2) >> shift2;
      if (last) v = std::min<int64_t>(std::max<int64_t>(v, 0), maxval);
      out[size_t(i) * w + j] = int32_t(v);
    }
}

}  // extern "C"

// ===========================================================================
// DMVR refinement core (ops/dmvr.py dmvr_refine port): per 16x16 sub-PU
// 25-point even-row SAD search + parametric sub-pel surface.
// ===========================================================================

namespace dmvrk {

static int64_t sad_rows(const int32_t* a, const int32_t* b, int stride,
                        int h, int w) {
  int64_t s = 0;
  for (int i = 0; i < h; i += 2) {
    const int32_t* ra = a + size_t(i) * stride;
    const int32_t* rb = b + size_t(i) * stride;
    for (int j = 0; j < w; ++j) s += std::abs(int64_t(ra[j]) - rb[j]);
  }
  return s;
}

static int div_q7(int64_t n, int64_t d) {
  bool sign = n < 0;
  if (sign) n = -n;
  int q = 0;
  int64_t d8 = d << 3;
  if (n >= d8) { n -= d8; q += 1; }
  q <<= 1;
  int64_t d4 = d8 >> 1;
  if (n >= d4) { n -= d4; q += 1; }
  q <<= 1;
  if (n >= (d4 >> 1)) q += 1;
  return sign ? -q : q;
}

}  // namespace dmvrk

extern "C" {

// bl0/bl1: [h + 2*pad, w + 2*pad] bilinear predictions; out per sub-PU
// (row-major over the ceil(h/16) x ceil(w/16) grid): [n][3] = {dx, dy,
// bdof_ok} in 1/16 units.
void vte_dmvr_refine(const int32_t* bl0, const int32_t* bl1, int w, int h,
                     int pad, int32_t* out) {
  using namespace dmvrk;
  const int stride = w + 2 * pad;
  const int dy_ = std::min(h, 16), dx_ = std::min(w, 16);
  int n = 0;
  for (int ys = 0; ys < h; ys += dy_)
    for (int xs = 0; xs < w; xs += dx_, ++n) {
      const int32_t* a0 = bl0 + size_t(pad + ys) * stride + pad + xs;
      const int32_t* a1 = bl1 + size_t(pad + ys) * stride + pad + xs;
      int64_t min_cost = sad_rows(a0, a1, stride, dy_, dx_);
      min_cost -= min_cost >> 2;
      if (min_cost < int64_t(dx_) * dy_) {
        out[n * 3 + 0] = 0;
        out[n * 3 + 1] = 0;
        out[n * 3 + 2] = 0;
        continue;
      }
      int64_t sads[5][5];
      for (int i = 0; i < 5; ++i)
        for (int j = 0; j < 5; ++j) sads[i][j] = INT64_MAX;
      sads[2][2] = min_cost;
      int64_t best_c = min_cost;
      int best_h = 0, best_v = 0;
      for (int ver = -2; ver <= 2; ++ver)
        for (int hor = -2; hor <= 2; ++hor) {
          if (!(hor == 0 && ver == 0)) {
            const int32_t* b0 =
                bl0 + size_t(pad + ys + ver) * stride + pad + xs + hor;
            const int32_t* b1 =
                bl1 + size_t(pad + ys - ver) * stride + pad + xs - hor;
            sads[ver + 2][hor + 2] = sad_rows(b0, b1, stride, dy_, dx_);
          }
          if (sads[ver + 2][hor + 2] < best_c) {
            best_c = sads[ver + 2][hor + 2];
            best_h = hor;
            best_v = ver;
          }
        }
      int tx = best_h << 4, ty = best_v << 4;
      if (std::abs(tx) != 32 && std::abs(ty) != 32) {
        // xSubPelErrorSrfc
        int cy = best_v + 2, cx = best_h + 2;
        int64_t buf[5] = {sads[cy][cx], sads[cy][cx - 1],
                          sads[cy - 1][cx], sads[cy][cx + 1],
                          sads[cy + 1][cx]};
        int outd[2] = {0, 0};
        for (int hv = 0; hv < 2; ++hv) {
          int64_t num = (buf[hv + 1] - buf[hv + 3]) << 4;
          int64_t den = buf[hv + 1] + buf[hv + 3] - (buf[0] << 1);
          if (den != 0) {
            if (buf[hv + 1] != buf[0] && buf[hv + 3] != buf[0])
              outd[hv] = div_q7(num, den);
            else
              outd[hv] = buf[hv + 1] == buf[0] ? -8 : 8;
          }
        }
        tx += outd[0];
        ty += outd[1];
      }
      out[n * 3 + 0] = tx;
      out[n * 3 + 1] = ty;
      out[n * 3 + 2] = best_c >= 2 * int64_t(dx_) * dy_ ? 1 : 0;
    }
}

}  // extern "C"
