"""u2mkd_tpu — TPU-native uni-to-multi-modal knowledge distillation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of isunLt/U2MKD
(TPAMI 2024, "Uni-to-Multi Modal Knowledge Distillation for Bidirectional
LiDAR-Camera Semantic Segmentation").

Design principles (TPU-first, not a port):
  * Fixed-capacity buffers everywhere: a scan is ``(points[P,*], mask[P])``;
    a voxel grid is ``(coords[V,3], feats[V,C], mask[V])``. Every train step
    compiles to exactly one XLA program.
  * Coordinate "hashing" is exact bit-packing (collision-free) + bitonic
    sort / vectorized binary search — no open-addressing probing loops.
  * Sparse convolution = cached neighbor rulebooks + gather-GEMM accumulation
    on the MXU.
  * Window attention = sort-by-window + block-sparse flash attention over the
    sorted sequence (Pallas), replacing the reference's CSR pair expansion.
  * Data parallelism via ``jax.sharding.Mesh`` + ``shard_map``; ``psum`` for
    gradients / BN statistics / metric counters.
"""

__version__ = "0.1.0"
