"""Pure-numpy geometry library: the correctness bedrock of the framework.

Everything here is host-side, accelerator-free, and property-testable.
The predicates reproduce the reference's dataset-generation and eval-time
invariants (reference: dataset/tests/check_faces_enclosed.py,
faceformer/post_processing.py, reconstruction/reconstruction_utils.py).
"""

from faceformer_tpu.geometry.sampling import (  # noqa: F401
    resample_edge,
    resample_edge_batch,
)
from faceformer_tpu.geometry.enclosedness import (  # noqa: F401
    edges_connect,
    is_face_enclosed,
)
from faceformer_tpu.geometry.loops import (  # noqa: F401
    assemble_cycles,
    assemble_cylinder_cycle,
    canonicalize_loops,
)
from faceformer_tpu.geometry.circles import (  # noqa: F401
    circle_through_points,
    discretize_circle,
    fit_arc_through_points,
)
