/* vvenc_tpu C API — stable C ABI over the TPU-native VVC encoder.
 *
 * Mirrors the reference encoder's C interface shape
 * (vvenc include/vvenc/vvenc.h.in: vvenc_encoder_create/open/encode/close):
 * create+open an encoder from a key=value parameter string, push 8-bit
 * planar 4:2:0 frames, receive Annex-B access units.
 *
 * The implementation embeds CPython and drives the vvenc_tpu package;
 * link with -lvvenc_tpu_capi (built from vvenc_tpu_capi.cpp).
 */
#ifndef VVENC_TPU_CAPI_H
#define VVENC_TPU_CAPI_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct vvenc_tpu_encoder vvenc_tpu_encoder;

#define VVENC_TPU_OK 0
#define VVENC_TPU_ERR_PARAMETER (-1)
#define VVENC_TPU_ERR_INITIALIZE (-2)
#define VVENC_TPU_ERR_UNSPECIFIED (-3)

/* Open an encoder. params: semicolon-separated key=value pairs, e.g.
 * "width=176;height=144;qp=32;preset=faster;intra_period=1".
 * Returns NULL on error. */
vvenc_tpu_encoder *vvenc_tpu_encoder_open(const char *params);

/* Encode one frame (8-bit planar 4:2:0, tightly packed).  On success
 * *au/*au_len describe the Annex-B access unit; the buffer stays valid
 * until the next call on this encoder.  Returns VVENC_TPU_OK. */
int vvenc_tpu_encode(vvenc_tpu_encoder *enc,
                     const uint8_t *y, const uint8_t *u, const uint8_t *v,
                     const uint8_t **au, size_t *au_len);

/* Flush: drain any buffered pictures (hierarchical-B GOP tail) —
 * the analog of the reference's NULL-picture encode call.  *au/*au_len
 * receive the remaining access units (may be empty). */
int vvenc_tpu_flush(vvenc_tpu_encoder *enc,
                    const uint8_t **au, size_t *au_len);

/* Close and free the encoder. */
int vvenc_tpu_encoder_close(vvenc_tpu_encoder *enc);

/* Library version string (static storage). */
const char *vvenc_tpu_version(void);

#ifdef __cplusplus
}
#endif
#endif /* VVENC_TPU_CAPI_H */
