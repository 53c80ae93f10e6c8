"""faceformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for neural face
identification in 2D wireframe projections of manifold objects.

Re-designed from scratch with the same capabilities as the CVPR 2022 FaceFormer
reference (manycore-research/faceformer): pointer-network seq2seq models over
wireframe edges, a parallel per-edge-anchor decoder, the ABC dataset pipeline,
face-level metrics, and optimization-based 3D reconstruction.

Layer map (TPU-first redesign of the reference's five layers):
  - config:          frozen dataclass config tree (reference: fvcore CfgNode,
                     faceformer/config.py)
  - geometry/:       pure-numpy geometry predicates + synthetic fixtures
  - data/:           JSON dataset -> packed static-shape device arrays
  - models/:         pure-functional pointer-network transformers (init/apply)
  - decode:          lax.while_loop greedy decoders, zero host round-trips
  - ops/:            Pallas TPU kernels for the hot paths
  - parallel/:       jax.sharding Mesh + pjit data parallelism
  - train/:          train/eval harness, metrics, Orbax checkpoints
  - reconstruction/: L1-LP depth lifting, wireframe/mesh export
"""

__version__ = "0.1.0"

from faceformer_tpu.config import Config, load_config  # noqa: F401
