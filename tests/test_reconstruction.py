"""Reconstruction tests: LP solver, wireframe lift, mesh build — end to end
from fixture predictions through the real prediction-JSON path."""

import json
import os

import numpy as np
import pytest

from faceformer_tpu.config import ModelConfig, PostProcessConfig, TokenConfig
from faceformer_tpu.data.packing import pack_label_parallel
from faceformer_tpu.geometry.fixtures import build_sample, make_box, make_cylinder
from faceformer_tpu.reconstruction.io3d import (
    read_ply_points,
    write_obj_mesh,
    write_ply_points,
)
from faceformer_tpu.reconstruction.lp import solve_l1_plane_fit
from faceformer_tpu.reconstruction.mesh import ear_clip, polygon_area, reconstruct_mesh
from faceformer_tpu.reconstruction.wireframe import (
    reconstruct_file,
    reconstruct_wireframe,
)
from faceformer_tpu.train.metrics import FaceMetrics


def prediction_record(solid, theta=30.0, phi=40.0):
    """Run the REAL eval path: fixture -> labels -> metric engine ->
    prediction JSON record (as the test loop writes it)."""
    sample = build_sample(solid, theta=theta, phi=phi)
    cfg = ModelConfig(num_points_per_line=8, num_lines=64, max_face_length=16)
    packed = pack_label_parallel(sample["faces_indices"], cfg)
    engine = FaceMetrics(PostProcessConfig(is_coedge=True), TokenConfig())
    out = engine.evaluate_sample(packed["label"], packed["label"], sample)
    return {
        "edges": sample["edges"],
        "dominant_directions": sample["dominant_directions"],
        "pred_faces": out["predictions"],
        "label_faces": out["labels"],
    }


class TestLP:
    def test_exact_fit(self):
        # two variables, consistent system: f = (1, -2)
        P = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        b = np.array([-1.0, 2.0, 1.0])
        C = np.zeros((1, 2))
        f = solve_l1_plane_fit(P, b, C)
        np.testing.assert_allclose(f, [1.0, -2.0], atol=1e-8)

    def test_l1_robustness_to_outlier(self):
        # median-like behavior: single variable, 3 votes for 1, 1 outlier
        P = np.ones((4, 1))
        b = np.array([-1.0, -1.0, -1.0, -100.0])
        f = solve_l1_plane_fit(P, b, np.zeros((1, 1)))
        assert abs(f[0] - 1.0) < 1e-8

    def test_inequality_respected(self):
        P = np.array([[1.0]])
        b = np.array([5.0])  # wants f = -5
        C = np.array([[1.0]])  # f >= 0
        f = solve_l1_plane_fit(P, b, C)
        assert f[0] >= -1e-9


class TestWireframe:
    def test_box(self):
        record = prediction_record(make_box())
        points = reconstruct_wireframe(record)
        assert points is not None
        assert len(points) > 100
        assert np.all(np.isfinite(points))
        # xy of reconstruction matches the input wireframe footprint
        xs = [p[0] for e in record["edges"] for p in e]
        assert points[:, 0].min() >= min(xs) - 1e-6
        assert points[:, 0].max() <= max(xs) + 1e-6

    def test_cylinder_produces_arcs(self):
        record = prediction_record(make_cylinder(), theta=40.0, phi=35.0)
        points = reconstruct_wireframe(record)
        assert points is not None and len(points) > 100
        assert np.all(np.isfinite(points))

    def test_reconstruct_file_roundtrip(self, tmp_path):
        record = prediction_record(make_box())
        os.makedirs(tmp_path / "json")
        os.makedirs(tmp_path / "ply")
        with open(tmp_path / "json" / "00000001.json", "w") as f:
            json.dump(record, f)
        assert reconstruct_file("00000001", str(tmp_path))
        pts = read_ply_points(str(tmp_path / "ply" / "00000001.ply"))
        assert len(pts) > 100
        # idempotent resume-by-skip (reference :29-30)
        assert reconstruct_file("00000001", str(tmp_path))


class TestMesh:
    def test_ear_clip_square(self):
        square = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
        tris = ear_clip(square)
        assert len(tris) == 2
        area = sum(abs(polygon_area(square[list(t)])) for t in tris)
        assert area == pytest.approx(1.0)

    def test_ear_clip_concave(self):
        lshape = np.array([[0.0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]])
        tris = ear_clip(lshape)
        area = sum(abs(polygon_area(lshape[list(t)])) for t in tris)
        assert area == pytest.approx(3.0)

    def test_merge_holes_bridge_avoids_other_holes(self):
        # regression: a hole's bridge used to be visibility-tested against
        # only itself and the outer ring, so it could cut straight through
        # another hole and produce a self-intersecting spliced polygon;
        # the total triangulated area then misses the hole-area contract
        from faceformer_tpu.reconstruction.mesh import merge_holes

        outer = np.array([[-1.0, -0.2], [1, -0.2], [1, 0.2], [-1, 0.2]])

        def ring(cx, cy, r, n=8):
            t = np.linspace(0, 2 * np.pi, n, endpoint=False)
            return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], axis=1)

        hole_a = ring(-0.4, 0.0, 0.1)
        hole_b = ring(-0.75, 0.13, 0.05)
        merged = merge_holes(outer, [hole_a, hole_b])
        tris = ear_clip(merged)
        area = sum(abs(polygon_area(merged[list(t)])) for t in tris)
        expect = (abs(polygon_area(outer)) - abs(polygon_area(hole_a))
                  - abs(polygon_area(hole_b)))
        assert area == pytest.approx(expect, rel=0.02)

    def test_box_mesh(self):
        record = prediction_record(make_box())
        mesh = reconstruct_mesh(record)
        assert mesh is not None
        vertices, faces = mesh
        assert len(faces) >= 2  # at least some faces triangulated
        assert np.all(np.isfinite(vertices))

    def test_cylinder_mesh(self):
        record = prediction_record(make_cylinder(), theta=40.0, phi=35.0)
        mesh = reconstruct_mesh(record)
        assert mesh is not None
        vertices, faces = mesh
        assert len(faces) > 10

    def test_obj_write(self, tmp_path):
        path = str(tmp_path / "out.obj")
        write_obj_mesh(path, np.eye(3), [(0, 1, 2)])
        text = open(path).read()
        assert "v 1 0 0" in text and "f 1 2 3" in text


class TestPLYIO:
    def test_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).standard_normal((17, 3))
        path = str(tmp_path / "x.ply")
        write_ply_points(path, pts)
        back = read_ply_points(path)
        np.testing.assert_allclose(back, pts, atol=1e-9)


class TestHoleMerging:
    def test_square_with_hole(self):
        from faceformer_tpu.reconstruction.mesh import ear_clip, merge_holes, polygon_area
        outer = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4]])
        hole = np.array([[1.0, 1], [1, 3], [3, 3], [3, 1]])  # CW
        merged = merge_holes(outer, [hole])
        assert len(merged) == len(outer) + len(hole) + 2  # bridge duplicates
        tris = ear_clip(merged)
        area = sum(abs(polygon_area(merged[list(t)])) for t in tris)
        assert area == pytest.approx(16.0 - 4.0, abs=1e-6)

    def test_two_holes(self):
        from faceformer_tpu.reconstruction.mesh import ear_clip, merge_holes, polygon_area
        outer = np.array([[0.0, 0], [8, 0], [8, 4], [0, 4]])
        h1 = np.array([[1.0, 1], [1, 3], [3, 3], [3, 1]])
        h2 = np.array([[5.0, 1], [5, 3], [7, 3], [7, 1]])
        merged = merge_holes(outer, [h1, h2])
        tris = ear_clip(merged)
        area = sum(abs(polygon_area(merged[list(t)])) for t in tris)
        assert area == pytest.approx(32.0 - 8.0, abs=1e-6)


class TestHoledPlate:
    def test_wireframe_and_mesh(self):
        from faceformer_tpu.geometry.fixtures import make_plate_with_hole

        record = prediction_record(make_plate_with_hole(), theta=50.0, phi=42.0)
        # multi-loop faces must survive the eval path: the holed plate's
        # caps carry an outer ring + a hole ring, so at least one predicted
        # face must keep more edges than a single quad loop
        assert any(len(f[1]) > 4 for f in record["pred_faces"])
        points = reconstruct_wireframe(record)
        assert points is not None and len(points) > 100
        mesh = reconstruct_mesh(record)
        assert mesh is not None
        vertices, faces = mesh
        assert len(faces) > 10
        assert np.all(np.isfinite(vertices))
