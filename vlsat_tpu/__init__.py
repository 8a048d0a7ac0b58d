"""vlsat_tpu — a TPU-native 3D semantic scene-graph framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wz7in/CVPR2023-VLSAT ("VL-SAT", CVPR 2023): predict a semantic scene graph
(160 object classes, 26 multi-label predicates) from a 3RScan point cloud,
training a dual-branch (3D point cloud + frozen-CLIP 2D) graph network with
visual-linguistic distillation.

Design stance (vs. the reference's dynamic-shape PyTorch/torch-geometric
pipeline, see SURVEY.md):
  * scenes are fixed-shape padded tensors ``(B, N, ...)`` nodes /
    ``(B, E, ...)`` edges with validity masks — every per-edge / per-scene
    Python loop in the reference becomes one batched XLA op;
  * torch-scatter / MessagePassing becomes take_along_axis + segment ops;
  * the block-diagonal per-scene attention masking becomes a plain batch
    axis; distance-bias attention is one pairwise op;
  * CLIP text embeddings are precomputed tables, not a per-batch text
    encoder call;
  * parallelism is data-parallel ``jax.sharding`` over a Mesh, not
    DataLoader workers.
"""

__version__ = "0.1.0"

from vlsat_tpu.scene import SceneBatch  # noqa: F401
