"""Dataset classes: preload reference-format JSONs, emit packed samples.

Equivalent surface to the reference's ABCDataset / ABCDataset_Parallel
(faceformer/datasets/data.py:31-118, data_para.py:28-131): same constructor
signature shape (root_dir, splits, model config), same preload-to-RAM
behavior, same per-sample dict keys. Indexing returns numpy arrays; batching
is done by ``faceformer_tpu.data.batching``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Union

import numpy as np

from faceformer_tpu.config import ModelConfig
from faceformer_tpu.data.packing import (
    pack_input_edges,
    pack_label_parallel,
    pack_label_single,
)


def parse_splits_list(root_dir: str, splits: Union[str, Sequence[str]]) -> List[str]:
    """Resolve split entries to sample paths relative to root_dir.

    Each entry is either a .json sample path or a .txt file listing .json
    paths (reference: data.py:99-118).
    """
    if isinstance(splits, str):
        splits = splits.split()
    info_files: List[str] = []
    for split in splits:
        ext = os.path.splitext(split)[1]
        if ext == ".json":
            info_files.append(split)
        elif ext == ".txt":
            with open(os.path.join(root_dir, split), "r") as f:
                info_files += [line.rstrip() for line in f]
        else:
            raise NotImplementedError(f"{split} is not a valid info_file type")
    return info_files


class _BaseDataset:
    def __init__(self, root_dir: str, splits: Union[str, Sequence[str]], config: ModelConfig):
        self.root_dir = root_dir
        self.config = config
        self.info_files = parse_splits_list(root_dir, splits)
        # preload all JSONs to RAM (reference: data.py:48-51)
        self.raw_datas: List[Dict] = []
        for info_file in self.info_files:
            with open(os.path.join(root_dir, info_file), "r") as f:
                self.raw_datas.append(json.load(f))
        self._cache: Dict[int, Dict] = {}

    @classmethod
    def from_samples(cls, samples: Sequence[Dict], config: ModelConfig, names=None):
        """Build a dataset directly from in-memory sample dicts (fixtures)."""
        obj = cls.__new__(cls)
        obj.root_dir = ""
        obj.config = config
        obj.raw_datas = list(samples)
        obj.info_files = list(names) if names else [f"json/{i:08d}.json" for i in range(len(samples))]
        obj._cache = {}
        return obj

    def __len__(self) -> int:
        return len(self.raw_datas)

    def __getitem__(self, index: int) -> Dict:
        # packing is deterministic: memoize so epochs after the first skip
        # the host-side resample/pack work entirely (the reference re-packs
        # every epoch in DataLoader workers)
        if index not in self._cache:
            self._cache[index] = self._pack(index)
        return self._cache[index]


class ABCDataset(_BaseDataset):
    """Single-sequence dataset: all faces flattened into one token stream."""

    def _pack(self, index: int) -> Dict:
        raw = self.raw_datas[index]
        sample = {"id": index, "name": self.info_files[index]}
        sample.update(pack_input_edges(raw["edges"], self.config))
        sample.update(pack_label_single(raw["faces_indices"], self.config))
        return sample


class ABCDatasetParallel(_BaseDataset):
    """Per-edge-anchor dataset: one label row per loop rotation."""

    def _pack(self, index: int) -> Dict:
        raw = self.raw_datas[index]
        sample = {"id": index, "name": self.info_files[index]}
        sample.update(pack_input_edges(raw["edges"], self.config))
        sample.update(pack_label_parallel(raw["faces_indices"], self.config))
        return sample


# reference-compatible aliases (main.py dispatches on these names)
ABCDataset_Parallel = ABCDatasetParallel
