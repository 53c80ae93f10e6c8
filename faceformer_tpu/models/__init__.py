"""Pointer-network transformer models (pure-functional JAX).

Two model families, matching the reference's capability surface:
  - SurfaceFormer: all faces as one flat sequence
    (reference: faceformer/models/model.py)
  - SurfaceFormer_Parallel: every edge is a decoding anchor; all face
    sequences decode simultaneously (reference: faceformer/models/model_para.py)
"""

from faceformer_tpu.models.surfaceformer import SurfaceFormer  # noqa: F401
from faceformer_tpu.models.parallel import SurfaceFormerParallel  # noqa: F401

# reference-compatible alias (string dispatch in main.py)
SurfaceFormer_Parallel = SurfaceFormerParallel

MODEL_REGISTRY = {
    "SurfaceFormer": SurfaceFormer,
    "SurfaceFormer_Parallel": SurfaceFormerParallel,
}
