"""JAX/Pallas compute kernels + numpy golden models.

Each op family ships two implementations:
- a numpy "spec model" (golden, scalar semantics, used by the subset decoder
  and as the reference in kernel equivalence tests — the analog of vvenc's
  scalar fallback kernels, SURVEY.md §2.4), and
- a batched JAX path designed for the TPU MXU/VPU (blocks batched along a
  leading axis; transforms expressed as matmuls).
"""
