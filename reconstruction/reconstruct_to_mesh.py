"""CLI: prediction JSONs -> surface meshes (OBJ).

Same surface as the reference script (reconstruction/reconstruct_to_mesh.py):
    python reconstruction/reconstruct_to_mesh.py --root <logdir> [--name ID]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from faceformer_tpu.reconstruction.mesh import main

if __name__ == "__main__":
    main()
