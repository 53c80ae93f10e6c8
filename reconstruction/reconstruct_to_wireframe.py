"""CLI: prediction JSONs -> 3D wireframe PLYs.

Same surface as the reference script (reconstruction/reconstruct_to_wireframe.py):
    python reconstruction/reconstruct_to_wireframe.py --root <logdir> [--name ID]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from faceformer_tpu.reconstruction.wireframe import main

if __name__ == "__main__":
    main()
