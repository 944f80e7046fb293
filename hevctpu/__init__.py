"""hevctpu — a TPU-native HEVC All-Intra encoder with a fused CNN CU-depth
predictor, built from scratch in JAX/XLA/Pallas.

Capability target: the wolverinn/HEVC-deep-learning-pipeline reference
(HM 16.20 All-Intra + ConvNet2 CU-depth pruning), re-designed TPU-first:
batched on-device CNN depth inference prunes the CU quadtree, the intra
search/transform/quant path runs as fused XLA/Pallas programs over CTU
wavefronts, and only the final CABAC write is serial (host/native).
"""

__version__ = "0.1.0"
