"""Synthetic dataset generator CLI: analytic solids -> reference-layout dataset.

Produces the same on-disk layout as the reference's prepare_data.py
(dataset/prepare_data.py:349-375): root/json/<id>.json samples plus
train.txt/valid.txt/test.txt splits (seeded 0.93/0.02/0.05 shuffle,
prepare_data.py:329-346). Works without any CAD kernel; use
tools/prepare_data.py for real ABC STEP files (requires pythonocc).

    python -m faceformer_tpu.tools.synthetic_data --root data/ours --num 256
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Sequence

import numpy as np

from faceformer_tpu.geometry.fixtures import random_sample


def prepare_splits(root: str, names: Sequence[str], split=(0.93, 0.02, 0.05),
                   seed: int = 42) -> None:
    """Seeded shuffle -> train/valid/test txt files
    (reference: prepare_data.py:329-346)."""
    names = list(names)
    np.random.seed(seed)
    np.random.shuffle(names)
    train_ratio, valid_ratio, _ = split
    n = len(names)
    cut1, cut2 = int(n * train_ratio), int(n * (train_ratio + valid_ratio))
    for fname, chunk in (("train.txt", names[:cut1]),
                         ("valid.txt", names[cut1:cut2]),
                         ("test.txt", names[cut2:])):
        with open(os.path.join(root, fname), "w") as f:
            f.writelines(f"json/{name}.json\n" for name in chunk)


def generate(root: str, num: int, seed: int = 0, coedge: bool = True,
             no_face_type: bool = False, direction_token: bool = False,
             focus: float = 0.0, max_edges: int = 64,
             split=(0.93, 0.02, 0.05)) -> list:
    os.makedirs(os.path.join(root, "json"), exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    while len(names) < num:
        sample = random_sample(rng, coedge=coedge, no_face_type=no_face_type,
                               direction_token=direction_token, focus=focus)
        if len(sample["edges"]) > max_edges * (2 if coedge else 1):
            continue  # reference rejects >64-edge shapes (prepare_data.py:405-407)
        name = f"{len(names):08d}"
        with open(os.path.join(root, "json", f"{name}.json"), "w") as f:
            json.dump(sample, f)
        names.append(name)
    prepare_splits(root, names, split=split)
    return names


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="synthetic dataset generator")
    parser.add_argument("--root", type=str, required=True)
    parser.add_argument("--num", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--combine_coedge", action="store_true",
                        help="one token per undirected edge (seq2seq flavor)")
    parser.add_argument("--no_face_type", action="store_true")
    parser.add_argument("--direction_token", action="store_true",
                        help="combined edges + (index, orientation) labels")
    parser.add_argument("--focus", type=float, default=0.0,
                        help="0 = orthographic; >0 = perspective focal length")
    args = parser.parse_args(argv)
    names = generate(args.root, args.num, seed=args.seed,
                     coedge=not args.combine_coedge and not args.direction_token,
                     no_face_type=args.no_face_type,
                     direction_token=args.direction_token, focus=args.focus)
    print(f"wrote {len(names)} samples under {args.root}")


if __name__ == "__main__":
    main()
