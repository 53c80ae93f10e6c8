"""OCC-free tests for the pure-Python core of the dataset-generation
pipeline: camera math, EdgeRecord/FaceRecord bookkeeping, the sewn-edge
face/edge merge logic (reference TopoMapper.py:118-185, Face.py:73-113,
Edge.py:44-68), and assemble_json canonicalization for all three dataset
flavors (reference prepare_data.py:128-179).

Everything here runs on fake records; only the OCC entry points (STEP read,
HLR projection, wire exploration) stay gated behind pythonocc.
"""

import argparse

import numpy as np
import pytest

from faceformer_tpu.tools.occ_pipeline import (
    FACE_TYPE_MERGED,
    EdgeRecord,
    FaceRecord,
    TopoMapper,
    generate_random_camera_pos,
    pose_spherical,
)

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "prepare_data", os.path.join(os.path.dirname(__file__), "..",
                                 "tools", "prepare_data.py"))
prepare_data = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(prepare_data)


# ---------------------------------------------------------------------------
# camera math (reference projection_utils.py:10-45)
# ---------------------------------------------------------------------------


class TestCamera:
    def test_pose_spherical_radius_and_orthonormality(self):
        pose = pose_spherical(theta_deg=73.0, phi_deg=41.0, radius=1.4)
        assert pose.shape == (4, 4)
        np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 1.4, rtol=1e-5)
        rot = pose[:3, :3]
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)

    def test_random_camera_ranges(self):
        for seed in range(5):
            focus, pose = generate_random_camera_pos(seed)
            assert 3.0 <= focus <= 5.0
            assert 1.25 <= np.linalg.norm(pose[:3, 3]) <= 1.5

    def test_random_camera_rng_advances(self):
        # consecutive draws from one stream must differ (the reference
        # reseeds global np.random with a constant per call, so every
        # shape/re-roll got the identical camera — documented deviation)
        rng = np.random.default_rng(7)
        draws = [generate_random_camera_pos(rng=rng) for _ in range(3)]
        poses = [p for _, p in draws]
        assert not np.allclose(poses[0], poses[1])
        assert not np.allclose(poses[1], poses[2])
        # while a bare int seed stays deterministic
        f1, p1 = generate_random_camera_pos(11)
        f2, p2 = generate_random_camera_pos(11)
        assert f1 == f2 and np.array_equal(p1, p2)


# ---------------------------------------------------------------------------
# record bookkeeping
# ---------------------------------------------------------------------------


def edge(key, points):
    rec = EdgeRecord(edge=key)
    rec.dedge = [tuple(p) for p in points]
    rec.dedge3d = [tuple(p) + (0.0,) for p in points]
    return rec


def face(key, face_type, edges_orients):
    rec = FaceRecord(face=key, face_type=face_type, parameters=None)
    for erec, orient in edges_orients:
        rec.add(erec, orient)
        erec.faces.append(rec)
        erec.orientations.append(orient)
    return rec


class TestRecords:
    def test_oriented_reverses(self):
        e = edge("e", [(0, 0), (1, 0)])
        assert e.oriented(0) == [(0, 0), (1, 0)]
        assert e.oriented(1) == [(1, 0), (0, 0)]
        assert e.oriented(1, is_3d=True) == [(1, 0, 0), (0, 0, 0)]

    def test_same_orientation(self):
        head = edge("a", [(0, 0), (1, 0)])
        tail = edge("b", [(1, 0), (2, 0)])
        assert head.same_orientation(tail)  # head end meets tail start
        assert not tail.same_orientation(head)

    def test_face_roll_and_remove(self):
        e0, e1, e2 = (edge(k, [(i, 0), (i + 1, 0)])
                      for i, k in enumerate("abc"))
        f = face("f", 0, [(e0, 0), (e1, 0), (e2, 1)])
        f.roll(1)
        assert f.keys == [hash("b"), hash("c"), hash("a")]
        assert f.orientations == [0, 1, 0]
        f.remove_key(hash("c"))
        assert f.keys == [hash("b"), hash("a")]
        assert f.orientations == [0, 0]


# ---------------------------------------------------------------------------
# sewn-edge removal + face/edge merging (reference TopoMapper.py:118-185)
# ---------------------------------------------------------------------------


def bare_mapper(all_edges, all_faces, tol=1e-4):
    topo = object.__new__(TopoMapper)
    topo.tol = tol
    topo.all_edges = {e.key: e for e in all_edges}
    topo.all_faces = {hash(f.face): f for f in all_faces}
    return topo


class TestSewnEdgeMerge:
    def test_two_faces_merge_across_sewn_edge(self):
        # diamond split by a vertical seam: F1 = left triangle [s, a1, a2],
        # F2 = right triangle [s(rev), b1, b2]; removing s merges the faces
        # and chains the newly-adjacent boundary edges at both tips
        s = edge("s", [(0, -1), (0, 1)])
        a1 = edge("a1", [(0, 1), (-1, 0)])
        a2 = edge("a2", [(-1, 0), (0, -1)])
        b1 = edge("b1", [(0, -1), (1, 0)])
        b2 = edge("b2", [(1, 0), (0, 1)])
        f1 = face("F1", 0, [(s, 0), (a1, 0), (a2, 0)])
        f2 = face("F2", 1, [(s, 1), (b1, 0), (b2, 0)])
        topo = bare_mapper([s, a1, a2, b1, b2], [f1, f2])

        topo._remove_sewn_edges([s.key])

        assert len(topo.all_faces) == 1
        merged = next(iter(topo.all_faces.values()))
        # differing types -> merged marker (reference Face.py:104-108)
        assert merged.face_type == FACE_TYPE_MERGED
        assert s.key not in topo.all_edges
        # the 4 boundary edges chained pairwise into 2
        assert len(topo.all_edges) == 2
        assert set(merged.keys) == set(topo.all_edges)
        for erec in topo.all_edges.values():
            assert len(erec.dedge) == 4  # two 2-point polylines chained

    def test_third_edge_at_vertex_blocks_edge_merge(self):
        # same diamond, plus a spoke edge ending at the top tip (0, 1):
        # faces still merge but the (a1, b2) pair must NOT chain
        s = edge("s", [(0, -1), (0, 1)])
        a1 = edge("a1", [(0, 1), (-1, 0)])
        a2 = edge("a2", [(-1, 0), (0, -1)])
        b1 = edge("b1", [(0, -1), (1, 0)])
        b2 = edge("b2", [(1, 0), (0, 1)])
        spoke = edge("spoke", [(0, 1), (0, 2)])
        f1 = face("F1", 0, [(s, 0), (a1, 0), (a2, 0)])
        f2 = face("F2", 0, [(s, 1), (b1, 0), (b2, 0)])
        topo = bare_mapper([s, a1, a2, b1, b2, spoke], [f1, f2])

        topo._remove_sewn_edges([s.key])

        merged = [f for f in topo.all_faces.values() if f.face is not None]
        assert len(topo.all_faces) == 1
        assert merged[0].face_type == 0  # same types -> type preserved
        # a1 and b2 stay separate (blocked); a2 and b1 merged
        assert a1.key in topo.all_edges and b2.key in topo.all_edges
        assert len(topo.all_edges) == 4  # a1, b2, spoke, merged(a2+b1)

    def test_self_sewn_edge_dropped(self):
        # a cylinder-seam-like face traversing the sewn edge twice
        s = edge("s", [(0, 0), (0, 1)])
        c1 = edge("c1", [(0, 1), (1, 0.5)])
        c2 = edge("c2", [(1, 0.5), (0, 0)])
        f = FaceRecord(face="F", face_type=1, parameters=None)
        for erec, orient in ((s, 0), (c1, 0), (s, 1), (c2, 0)):
            f.add(erec, orient)
            erec.orientations.append(orient)
        s.faces = [f, f]
        c1.faces = [f]
        c2.faces = [f]
        topo = bare_mapper([s, c1, c2], [f])

        topo._remove_sewn_edges([s.key])

        assert s.key not in topo.all_edges
        assert len(topo.all_faces) == 1
        assert f.keys == [hash("c1"), hash("c2")]


# ---------------------------------------------------------------------------
# assemble_json canonicalization (reference prepare_data.py:41-179, 249-265)
# ---------------------------------------------------------------------------


def square_pair_topo():
    """Two unit squares sharing a vertical edge — 2 planar faces, 7 edges."""
    shared = edge("shared", [(1, 0), (1, 1)])
    a_bot = edge("a_bot", [(0, 0), (1, 0)])
    a_top = edge("a_top", [(1, 1), (0, 1)])
    a_left = edge("a_left", [(0, 1), (0, 0)])
    b_bot = edge("b_bot", [(1, 0), (2, 0)])
    b_right = edge("b_right", [(2, 0), (2, 1)])
    b_top = edge("b_top", [(2, 1), (1, 1)])
    fa = face("FA", 0, [(a_bot, 0), (shared, 0), (a_top, 0), (a_left, 0)])
    fb = face("FB", 0, [(b_bot, 0), (b_right, 0), (b_top, 0), (shared, 1)])
    topo = bare_mapper(
        [shared, a_bot, a_top, a_left, b_bot, b_right, b_top], [fa, fb])
    topo.dominant_directions = lambda: [[1, 0], [0, 1], [0.5, 0.5]]
    return topo


def gen_args(**overrides):
    base = dict(combine_coedge=False, direction_token=False,
                order_by_position=False, no_face_type=False, tol=1e-4)
    base.update(overrides)
    return argparse.Namespace(**base)


class TestAssembleJson:
    def test_coedge_flavor(self):
        data = prepare_data.assemble_json(square_pair_topo(), gen_args(), "x")
        # every face traversal emits its own oriented copy: 4 + 4 edges
        assert len(data["edges"]) == 8
        # edges sorted lexicographically
        order = sorted(range(8), key=lambda i: data["edges"][i])
        assert order == list(range(8))
        # the shared edge's two oriented copies are paired
        assert len(data["pairings"]) == 1
        (i, j), = data["pairings"].items()
        assert data["edges"][i] == data["edges"][j][::-1]
        # faces: [type, loops], loops rolled to min index, sorted by first
        assert len(data["faces_indices"]) == 2
        for ftype, loops in data["faces_indices"]:
            assert ftype == 0
            assert len(loops) == 1 and len(loops[0]) == 4
            assert loops[0][0] == min(loops[0])
        firsts = [f[1][0][0] for f in data["faces_indices"]]
        assert firsts == sorted(firsts)
        # the two faces cover all 8 coedge records exactly once
        used = sorted(i for _, loops in data["faces_indices"]
                      for lp in loops for i in lp)
        assert used == list(range(8))

    def test_combined_flavor(self):
        data = prepare_data.assemble_json(
            square_pair_topo(), gen_args(combine_coedge=True), "x")
        # one record per undirected edge
        assert len(data["edges"]) == 7
        assert data["pairings"] == {}
        # flat pointer loops (no face type), rolled to min, sorted by first
        assert len(data["faces_indices"]) == 2
        for ptrs in data["faces_indices"]:
            assert all(isinstance(p, int) for p in ptrs)
            assert ptrs[0] == min(ptrs)
        # the shared edge index appears in both faces
        both = set(data["faces_indices"][0]) & set(data["faces_indices"][1])
        assert len(both) == 1

    def test_direction_token_flavor(self):
        data = prepare_data.assemble_json(
            square_pair_topo(), gen_args(direction_token=True), "x")
        assert len(data["edges"]) == 7
        faces = data["faces_indices"]
        assert len(faces) == 2
        for loops in faces:
            for loop in loops:
                for ptr in loop:
                    idx, orient = ptr
                    assert 0 <= idx < 7 and orient in (0, 1)
        # the shared undirected edge is traversed in opposite directions
        shared_uses = {}
        for loops in faces:
            for loop in loops:
                for idx, orient in loop:
                    shared_uses.setdefault(idx, []).append(orient)
        two_use = [o for o in shared_uses.values() if len(o) == 2]
        assert two_use == [[0, 1]] or two_use == [[1, 0]]

    def test_unenclosed_face_raises(self):
        topo = square_pair_topo()
        # break face FA's loop by dropping an edge
        fa = next(f for f in topo.all_faces.values() if f.face == "FA")
        fa.remove_key(hash("a_left"))
        with pytest.raises(AssertionError, match="unenclosed"):
            prepare_data.assemble_json(topo, gen_args(), "x")
