"""Metric-engine tests: parsing, post-processing, and the P/R/type-acc
contract, including the perfect-prediction identity on fixture data."""

import numpy as np
import pytest

from faceformer_tpu.config import ModelConfig, PostProcessConfig, TokenConfig
from faceformer_tpu.data.packing import pack_label_parallel, pack_label_single
from faceformer_tpu.geometry.fixtures import build_sample, make_box, make_cylinder
from faceformer_tpu.post_processing import (
    filter_faces_by_coedge,
    filter_faces_by_encloseness,
    map_coedge_into_edges,
)
from faceformer_tpu.train.metrics import FaceMetrics, parse_faces, parse_parallel_faces

TOK = TokenConfig()


class TestParseFaces:
    def test_single_roundtrip(self):
        # [SOS, 4,5,6, SEP, 7,8, EOS]
        labels = np.array([1, 4, 5, 6, 2, 7, 8, 3, 0, 0])
        preds = np.array([1, 4, 5, 2, 9, 3, 0, 0, 0, 0])
        pf, lf = parse_faces(preds, labels, num_edges=10, tok=TOK)
        assert lf == [(0, (0, 1, 2)), (0, (3, 4))]
        assert pf == [(0, (0, 1)), (0, (5,))]

    def test_out_of_range_dropped(self):
        labels = np.array([1, 4, 99, 3])
        pf, lf = parse_faces(labels, labels, num_edges=10, tok=TOK)
        assert lf == [(0, (0,))]

    def test_parallel_rows(self):
        rows = np.array([
            [4, 5, 6, 1, 0, 0],   # plane face (0,1,2)
            [7, 8, 2, 0, 0, 0],   # cylinder face (3,4)
            [3, 0, 0, 0, 0, 0],   # bare Other -> empty, dropped
        ])
        pf, lf = parse_parallel_faces(rows, rows, num_edges=10, tok=TOK)
        assert lf == [(0, (0, 1, 2)), (1, (3, 4))]
        assert pf == lf

    def test_parallel_clips_predictions_only(self):
        rows = np.array([[4, 90, 1, 0]])
        pf, lf = parse_parallel_faces(rows, rows, num_edges=3, tok=TOK)
        assert lf == [(0, (0, 86))]  # labels keep out-of-range (reference)
        assert pf == [(0, (0,))]


class TestPostProcessing:
    def test_map_coedge_string_keys(self):
        pairings = {"0": 5, "2": 7}
        assert map_coedge_into_edges(pairings, [0, 1, 2, 5]) == [5, 1, 7, 5]

    def test_filter_by_coedge(self):
        pairings = {0: 1}
        # second face reuses coedge 0 whose canonical twin 1 is already taken
        faces = [(0, ((0, 2),)), (0, ((0, 3),))]
        kept = filter_faces_by_coedge(pairings, faces)
        assert kept == [(0, ((0, 2),))]
        # conflicts NOT routed through the pairing map are kept (reference
        # post_processing.py:23-39 only maps lower-index twins)
        faces = [(0, ((0, 2),)), (0, ((1, 3),))]
        assert len(filter_faces_by_coedge(pairings, faces)) == 2

    def test_filter_by_encloseness_canonicalizes(self):
        square = [
            [[0.0, 0.0], [1.0, 0.0]],
            [[1.0, 0.0], [1.0, 1.0]],
            [[1.0, 1.0], [0.0, 1.0]],
            [[0.0, 1.0], [0.0, 0.0]],
        ]
        faces = [(0, (1, 2, 3, 0)), (0, (0, 2, 1, 3))]
        kept = filter_faces_by_encloseness(square, faces, 1e-6)
        assert kept == [(0, ((0, 1, 2, 3),))]


class TestFaceMetrics:
    @pytest.fixture(scope="class")
    def cfg(self):
        return ModelConfig(num_points_per_line=8, num_lines=40, max_face_length=16,
                           label_seq_length=64)

    def test_perfect_parallel_prediction(self, cfg):
        sample = build_sample(make_cylinder(), theta=35.0, phi=40.0)
        packed = pack_label_parallel(sample["faces_indices"], cfg)
        engine = FaceMetrics(PostProcessConfig(is_coedge=True), TOK)
        out = engine.evaluate_sample(packed["label"], packed["label"], sample)
        assert out["precision"] == 1.0
        assert out["recall"] == 1.0
        assert out["type_acc"] == 1.0
        assert out["accuracy"] == 1.0

    def test_perfect_single_prediction(self, cfg):
        sample = build_sample(make_box(), theta=35.0, phi=40.0, coedge=False)
        packed = pack_label_single(sample["faces_indices"], cfg)
        engine = FaceMetrics(PostProcessConfig(is_coedge=False), TOK)
        out = engine.evaluate_sample(packed["label"], packed["label"], sample)
        assert out["precision"] == 1.0
        assert out["recall"] == 1.0

    def test_corrupted_row_cannot_score_perfect(self, cfg):
        sample = build_sample(make_box(), theta=35.0, phi=40.0)
        packed = pack_label_parallel(sample["faces_indices"], cfg)
        predicts = packed["label"].copy()
        # corrupting ONE rotation row is metric-invisible by design (the
        # face survives via its other rotations after the enclosedness
        # filter — reference semantics); corrupt EVERY row's second token
        # so whole faces break or mutate and the degradation must register
        n_edges = len(sample["edges"])
        rows = predicts[:, 1] >= 4
        predicts[rows, 1] = (predicts[rows, 1] - 4 + 7) % n_edges + 4
        engine = FaceMetrics(PostProcessConfig(is_coedge=True), TOK)
        clean = engine.evaluate_sample(packed["label"], packed["label"], sample)
        out = engine.evaluate_sample(predicts, packed["label"], sample)
        assert clean["precision"] == clean["recall"] == 1.0
        assert out["precision"] < 1.0 or out["recall"] < 1.0

    def test_empty_prediction_zeroes(self, cfg):
        sample = build_sample(make_box(), theta=35.0, phi=40.0)
        packed = pack_label_parallel(sample["faces_indices"], cfg)
        predicts = np.zeros_like(packed["label"])
        predicts[:, 0] = 3  # every row bare Other
        engine = FaceMetrics(PostProcessConfig(is_coedge=True), TOK)
        out = engine.evaluate_sample(predicts, packed["label"], sample)
        assert out["precision"] == 0
        assert out["recall"] == 0

    def test_batch_token_accuracy(self, cfg):
        sample = build_sample(make_box(), theta=35.0, phi=40.0)
        packed = pack_label_parallel(sample["faces_indices"], cfg)
        labels = packed["label"][None]
        engine = FaceMetrics(PostProcessConfig(is_coedge=True), TOK)
        out = engine.evaluate_batch(labels, labels, [sample])
        assert out["token_accuracy"] == 1.0
        assert out["precision"] == [1.0]
