"""Dataset integrity checker CLI: verify every face of every sample is a
closed loop chain; optionally delete offenders
(reference: dataset/tests/check_faces_enclosed.py:48-94)."""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional, Sequence

from faceformer_tpu.geometry.enclosedness import is_face_enclosed


def check_sample(path: str, tol: float) -> bool:
    with open(path) as f:
        data = json.load(f)
    edges = data["edges"]
    for entry in data["faces_indices"]:
        # entries are flat index lists, [loops...], or [type, [loops...]]
        if len(entry) == 2 and isinstance(entry[0], int) and isinstance(entry[1], list):
            face = [i for loop in entry[1] for i in loop]  # [type, [loops]]
        elif isinstance(entry[0], int):
            face = entry  # flat (combined-coedge) face
        else:
            face = [i for loop in entry for i in loop]  # [loops] (no_face_type)
        if not is_face_enclosed(edges, face, tol):
            return False
    return True


def check_dataset(root: str, tol: float = 3e-4, remove: bool = False,
                  names: Optional[Sequence[str]] = None) -> List[str]:
    """Returns the names that FAILED the check."""
    json_dir = os.path.join(root, "json")
    if names is None:
        names = [os.path.splitext(n)[0] for n in sorted(os.listdir(json_dir))]
    bad = []
    for name in names:
        path = os.path.join(json_dir, f"{name}.json")
        if not check_sample(path, tol):
            bad.append(name)
            print(f"{name} contains unclosed face")
            if remove:
                os.remove(path)
    return bad


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="face enclosedness integrity check")
    parser.add_argument("--root", type=str, default="./data")
    parser.add_argument("--name", type=str, default=None)
    # discretization tolerance is 1e-4 -> default check tolerance 3e-4
    parser.add_argument("--tol", type=float, default=3e-4)
    parser.add_argument("--remove", action="store_true")
    args = parser.parse_args(argv)
    names = [args.name] if args.name else None
    bad = check_dataset(args.root, args.tol, args.remove, names)
    print(f"{len(bad)} bad samples")


if __name__ == "__main__":
    main()
