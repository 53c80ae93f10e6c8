"""3D reconstruction: lift predicted 2D faces to wireframes and meshes.

Pipeline parity with the reference (reconstruction/reconstruct_to_*.py):
per-face plane parameters (a, b, c with depth z = ax + by + c) solved by an
L1-minimization LP constrained by dominant-direction perpendicularity and
shared-vertex depth agreement; cylinder faces decomposed via synthesized
intermediate planes; circle arcs re-fit through lifted points.

CAD-kernel-free: the LP runs on scipy's HiGHS (reference used cvxpy/ECOS),
circles are fit analytically, and PLY/OBJ files are written directly
(reference used open3d / OCC tessellation).
"""

from faceformer_tpu.reconstruction.lp import solve_l1_plane_fit  # noqa: F401
from faceformer_tpu.reconstruction.wireframe import reconstruct_wireframe  # noqa: F401
from faceformer_tpu.reconstruction.mesh import reconstruct_mesh  # noqa: F401
