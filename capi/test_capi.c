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

int main(int argc, char **argv) {
  const char *out_path = argc > 1 ? argv[1] : "/tmp/capi_out.266";
  vvenc_tpu_encoder *enc = vvenc_tpu_encoder_open(
      "width=64;height=64;qp=37;intra_period=1;gop_size=1");
  if (!enc) {
    fprintf(stderr, "open failed\n");
    return 1;
  }
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
  if (vvenc_tpu_encoder_close(enc) != VVENC_TPU_OK) return 4;
  printf("capi ok: %zu bytes (%s by %s)\n", total, out_path,
         vvenc_tpu_version());
  return 0;
}
