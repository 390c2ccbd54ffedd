"""Codec core: picture/CU state model shared by encoder and subset decoder.

The numpy "spec model" layer (the analog of vvenc's CommonLib scalar paths,
SURVEY.md §2.3): QP derivation, partitioning, CU syntax, reconstruction.
The TPU encoder uses these for final bitstream emission while doing its
search/decision work in batched JAX (vvenc_tpu/ops, vvenc_tpu/encoder).
"""
