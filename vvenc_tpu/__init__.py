"""vvenc_tpu — a TPU-native H.266/VVC encoder framework.

A from-scratch re-design of the capabilities of fraunhoferhhi/vvenc
(reference layout: /root/reference, see SURVEY.md) built TPU-first:

- compute path (prediction, transforms, quantization, distortion, in-loop
  filters, motion search) runs as batched JAX/XLA/Pallas programs over
  blocks/CTUs instead of per-pixel SIMD loops
  (reference analog: source/Lib/CommonLib/x86/*, §2.4 of SURVEY.md);
- entropy coding (CABAC) and high-level syntax run on host, fed by
  device-computed decisions (reference analog: EncoderLib/BinEncoder.cpp,
  EncoderLib/VLCWriter.cpp);
- scale-out is expressed via jax.sharding Mesh over frames / tile columns /
  GOPs (reference analog: NoMallocThreadPool + frame/IFP/tile parallelism,
  SURVEY.md §2.5).

Subpackages
-----------
bitstream : bit-level writers/readers, NAL/EBSP, CABAC engine, HLS syntax
ops       : JAX/Pallas kernels (transforms, intra pred, quant, distortion)
config    : flat encoder configuration + presets (vvencCfg analog)
encoder   : encoder pipeline (stages, frame/CTU encoders)
decoder   : subset bitstream decoder used for conformance round-trip tests
parallel  : device-mesh sharding helpers
utils     : YUV I/O, math helpers
"""

__version__ = "0.1.0"
