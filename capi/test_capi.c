/* Pure-C smoke test of the vvenc_tpu C API (mirror of the reference's
 * test/vvencinterfacetest.c: synthetic gradient frames, encode loop,
 * sanity checks on the produced access units). */
#include "vvenc_tpu.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define W 64
#define H 64
#define FRAMES 2

static int g_rec_count = 0;
static uint16_t g_rec_first = 0;

static void rec_cb(void *ctx, int poc, const uint16_t *y,
                   const uint16_t *u, const uint16_t *v, int w, int h) {
  (void)ctx;
  (void)u;
  (void)v;
  if (g_rec_count == 0) g_rec_first = y[0];
  if (w == W && h == H && poc >= 0) ++g_rec_count;
}

int main(int argc, char **argv) {
  const char *out_path = argc > 1 ? argv[1] : "/tmp/capi_out.266";
  vvenc_tpu_encoder *enc = vvenc_tpu_encoder_open(
      "width=64;height=64;qp=37;intra_period=1;gop_size=1");
  if (!enc) {
    fprintf(stderr, "open failed\n");
    return 1;
  }
  /* get_headers before any picture: SPS+PPS NALs (vvenc_get_headers) */
  {
    const uint8_t *hdrs = NULL;
    size_t hlen = 0;
    if (vvenc_tpu_get_headers(enc, &hdrs, &hlen) != VVENC_TPU_OK ||
        hlen < 8 || hdrs[0] != 0 || hdrs[1] != 0 || hdrs[2] != 0 ||
        hdrs[3] != 1) {
      fprintf(stderr, "get_headers failed\n");
      return 6;
    }
  }
  /* reconfig: qp change is legal; a structural change must demand a
   * restart (vvenc_reconfig contract) */
  if (vvenc_tpu_reconfig(enc, "qp=37") != VVENC_TPU_OK) {
    fprintf(stderr, "legal reconfig rejected\n");
    return 7;
  }
  if (vvenc_tpu_reconfig(enc, "width=128") !=
      VVENC_TPU_ERR_RESTART_REQUIRED) {
    fprintf(stderr, "structural reconfig not flagged\n");
    return 8;
  }
  if (vvenc_tpu_set_rec_callback(enc, rec_cb, NULL) != VVENC_TPU_OK)
    return 9;
  uint8_t y[W * H], u[W * H / 4], v[W * H / 4];
  FILE *f = fopen(out_path, "wb");
  size_t total = 0;
  for (int t = 0; t < FRAMES; ++t) {
    for (int r = 0; r < H; ++r)
      for (int c = 0; c < W; ++c)
        y[r * W + c] = (uint8_t)((r * 2 + c * 3 + t * 16) & 0xFF);
    memset(u, 100 + 8 * t, sizeof(u));
    memset(v, 160 - 8 * t, sizeof(v));
    const uint8_t *au = NULL;
    size_t au_len = 0;
    int rc = vvenc_tpu_encode(enc, y, u, v, &au, &au_len);
    if (rc != VVENC_TPU_OK || au_len == 0) {
      fprintf(stderr, "encode failed rc=%d len=%zu\n", rc, au_len);
      return 2;
    }
    /* the first AU must carry parameter sets (start code + SPS) */
    if (t == 0 && !(au_len > 8 && au[0] == 0 && au[1] == 0 && au[2] == 0 &&
                    au[3] == 1)) {
      fprintf(stderr, "bad annex-b start\n");
      return 3;
    }
    fwrite(au, 1, au_len, f);
    total += au_len;
  }
  {
    /* NULL-picture flush analog: all-intra has nothing buffered, but
     * the call must succeed and return an (empty) AU */
    const uint8_t *au = NULL;
    size_t au_len = 1;
    if (vvenc_tpu_flush(enc, &au, &au_len) != VVENC_TPU_OK) return 5;
    fwrite(au, 1, au_len, f);
    total += au_len;
  }
  fclose(f);
  if (g_rec_count != FRAMES) {
    fprintf(stderr, "rec callback fired %d times (want %d)\n",
            g_rec_count, FRAMES);
    return 10;
  }
  if (vvenc_tpu_encoder_close(enc) != VVENC_TPU_OK) return 4;

  /* two-pass rate control through vvenc_tpu_init_pass: pass 0 collects
   * statistics, pass 1 consumes them (separate encoder instance) */
  {
    vvenc_tpu_encoder *e2 = vvenc_tpu_encoder_open(
        "width=64;height=64;qp=37;intra_period=1;gop_size=1;"
        "target_bitrate=200000");
    if (!e2) return 11;
    const char *stats = "/tmp/capi_rc_stats.json";
    if (vvenc_tpu_init_pass(e2, 0, stats) != VVENC_TPU_OK) return 12;
    const uint8_t *au = NULL;
    size_t au_len = 0;
    int t, r, c;
    for (t = 0; t < FRAMES; ++t) {
      for (r = 0; r < H; ++r)
        for (c = 0; c < W; ++c)
          y[r * W + c] = (uint8_t)((r + c * 2 + t * 8) & 0xFF);
      memset(u, 90, sizeof(u));
      memset(v, 170, sizeof(v));
      if (vvenc_tpu_encode(e2, y, u, v, &au, &au_len) != VVENC_TPU_OK)
        return 13;
    }
    if (vvenc_tpu_flush(e2, &au, &au_len) != VVENC_TPU_OK) return 14;
    if (vvenc_tpu_init_pass(e2, 1, stats) != VVENC_TPU_OK) return 15;
    size_t p2_total = 0;
    for (t = 0; t < FRAMES; ++t) {
      for (r = 0; r < H; ++r)
        for (c = 0; c < W; ++c)
          y[r * W + c] = (uint8_t)((r + c * 2 + t * 8) & 0xFF);
      memset(u, 90, sizeof(u));
      memset(v, 170, sizeof(v));
      if (vvenc_tpu_encode(e2, y, u, v, &au, &au_len) != VVENC_TPU_OK)
        return 16;
      p2_total += au_len;
    }
    if (p2_total == 0) return 17;
    if (vvenc_tpu_encoder_close(e2) != VVENC_TPU_OK) return 18;
  }
  printf("capi ok: %zu bytes (%s by %s)\n", total, out_path,
         vvenc_tpu_version());
  return 0;
}
