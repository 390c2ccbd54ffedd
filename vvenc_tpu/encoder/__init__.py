"""Encoder pipeline: stages, frame encoders, rate-distortion search.

Round 1: all-intra encoder with QT partition RD search.  The architecture
mirrors SURVEY.md §7's plan — host Python orchestrates decisions and entropy
coding while the math-heavy parts (prediction, transforms, costs) have
batched JAX counterparts in vvenc_tpu/ops for the TPU path.
"""

from .intra_encoder import IntraEncoder, EncoderConfig
