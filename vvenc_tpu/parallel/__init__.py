"""Device-mesh sharding for multi-chip encoding.

Reference analog (SURVEY.md §2.5): vvenc scales via threads over WPP rows /
frames / tiles; the TPU design shards the same axes over a jax.sharding.Mesh
— CTU-block batches and tile columns within a chip's program, frames and
GOPs across chips — with collectives aggregating rate/distortion state.
"""

from .mesh import make_mesh, shard_batch, sharded_search_step
