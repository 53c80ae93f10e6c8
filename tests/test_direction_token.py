"""--direction_token flavor end-to-end (fixtures -> packing -> metrics).

The reference generates direction-token data (prepare_data.py:183-245:
combined edges + per-face (index, orientation) pairs) but ships no dataset
or model for it. Here the flat SurfaceFormer consumes it: labels interleave
each edge pointer with a DIR0/DIR1 special token (token.length = 6), the
metrics parse oriented faces, filter them by (orientation-aware)
enclosedness, and compare undirected edge sets.
"""

import dataclasses

import numpy as np
import pytest

from faceformer_tpu.config import ModelConfig, PostProcessConfig, TokenConfig
from faceformer_tpu.data.dataset import ABCDataset
from faceformer_tpu.data.packing import pack_label_single
from faceformer_tpu.geometry.enclosedness import is_face_enclosed
from faceformer_tpu.geometry.fixtures import build_sample, make_box, random_sample
from faceformer_tpu.train.metrics import FaceMetrics, parse_directed_faces

DIR_TOKENS = TokenConfig(DIR0=4, DIR1=5, length=6)


@pytest.fixture(scope="module")
def dir_cfg(tiny_model_cfg):
    return dataclasses.replace(
        tiny_model_cfg, num_lines=32, label_seq_length=160, token=DIR_TOKENS)


@pytest.fixture(scope="module")
def box_sample():
    return build_sample(make_box(), theta=25.0, phi=45.0, direction_token=True)


class TestFixtureFlavor:
    def test_schema(self, box_sample):
        # combined edges: each undirected box edge stored once
        assert len(box_sample["edges"]) == 12
        assert box_sample["pairings"] == {}
        assert len(box_sample["faces_indices"]) == 6
        for loops in box_sample["faces_indices"]:
            for loop in loops:
                for idx, orient in loop:
                    assert 0 <= idx < 12 and orient in (0, 1)

    def test_each_edge_used_twice_in_opposite_directions(self, box_sample):
        uses = {}
        for loops in box_sample["faces_indices"]:
            for loop in loops:
                for idx, orient in loop:
                    uses.setdefault(idx, []).append(orient)
        assert all(sorted(v) == [0, 1] for v in uses.values())

    def test_oriented_loops_enclose(self, box_sample):
        edges = box_sample["edges"]
        for loops in box_sample["faces_indices"]:
            flat = [tuple(p) for loop in loops for p in loop]
            assert is_face_enclosed(edges, flat, 2e-4)

    def test_random_samples(self):
        rng = np.random.default_rng(5)
        for _ in range(4):
            sample = random_sample(rng, direction_token=True)
            edges = sample["edges"]
            for loops in sample["faces_indices"]:
                flat = [tuple(p) for loop in loops for p in loop]
                assert is_face_enclosed(edges, flat, 2e-4)


class TestPacking:
    def test_interleaved_tokens(self, box_sample, dir_cfg):
        tok = dir_cfg.token
        out = pack_label_single(box_sample["faces_indices"], dir_cfg)
        label = out["label"]
        assert label[0] == tok.SOS
        # walk: after SOS, alternating [edge+6, DIR] pairs within faces
        i = 1
        pairs = 0
        while label[i] != tok.EOS:
            if label[i] == tok.SEP:
                i += 1
                continue
            assert label[i] >= tok.length, f"expected edge pointer at {i}"
            assert label[i + 1] in (tok.DIR0, tok.DIR1)
            pairs += 1
            i += 2
        assert pairs == 24  # 6 faces x 4 oriented edges
        assert out["num_label"] == i + 1

    def test_dataset_roundtrip(self, box_sample, dir_cfg):
        ds = ABCDataset.from_samples([box_sample], dir_cfg)
        item = ds[0]
        assert item["label"].shape == (dir_cfg.label_seq_length,)
        assert (item["label"] >= dir_cfg.token.length).sum() == 24


class TestMetrics:
    def test_parse_and_perfect_prediction(self, box_sample, dir_cfg):
        ds = ABCDataset.from_samples([box_sample], dir_cfg)
        label = ds[0]["label"]
        pred, lab = parse_directed_faces(
            label, label, len(box_sample["edges"]), dir_cfg.token)
        assert pred == lab and len(lab) == 6

        metrics = FaceMetrics(
            PostProcessConfig(is_coedge=False, direction_token=True),
            dir_cfg.token)
        out = metrics.evaluate_batch(
            label[None], label[None], [box_sample], [True])
        assert out["precision"] == [1.0]
        assert out["recall"] == [1.0]
        assert out["accuracy"] == [1.0]

    def test_hallucination_tolerance(self, box_sample, dir_cfg):
        ds = ABCDataset.from_samples([box_sample], dir_cfg)
        label = np.asarray(ds[0]["label"]).copy()
        pred = label.copy()
        # corrupt one DIR token into an edge pointer: that face's stream is
        # malformed and its loop no longer closes -> face dropped, not a crash
        dir_positions = np.where((pred == 4) | (pred == 5))[0]
        pred[dir_positions[0]] = dir_cfg.token.length + 1
        metrics = FaceMetrics(
            PostProcessConfig(is_coedge=False, direction_token=True),
            dir_cfg.token)
        out = metrics.evaluate_batch(
            pred[None], label[None], [box_sample], [True])
        assert out["recall"][0] < 1.0
        assert 0.0 <= out["precision"][0] <= 1.0
