"""Property tests for the geometry bedrock: enclosedness, loops, circles,
sampling, and fixture invariants."""

import zlib

import numpy as np
import pytest

from faceformer_tpu.geometry import (
    assemble_cycles,
    assemble_cylinder_cycle,
    canonicalize_loops,
    circle_through_points,
    fit_arc_through_points,
    is_face_enclosed,
    resample_edge,
    resample_edge_batch,
)
from faceformer_tpu.geometry.fixtures import (
    SOLID_BUILDERS,
    build_sample,
    make_box,
    make_cylinder,
    random_sample,
)

SQUARE_EDGES = [
    [[0.0, 0.0], [1.0, 0.0]],
    [[1.0, 0.0], [1.0, 1.0]],
    [[1.0, 1.0], [0.0, 1.0]],
    [[0.0, 1.0], [0.0, 0.0]],
]


class TestSampling:
    def test_line_lerp(self):
        pts = resample_edge([[0.0, 0.0], [1.0, 2.0]], 5)
        assert pts.shape == (5, 2)
        np.testing.assert_allclose(pts[2], [0.5, 1.0])
        np.testing.assert_allclose(pts[-1], [1.0, 2.0])

    def test_curve_index_subsample(self):
        curve = [[float(i), 0.0] for i in range(10)]
        pts = resample_edge(curve, 4)
        # reference semantics: rounded index subsampling, not interpolation
        np.testing.assert_allclose(pts[:, 0], [0.0, 3.0, 6.0, 9.0])

    def test_batch_padding(self):
        out = resample_edge_batch(SQUARE_EDGES, num_lines=6, num_samples=4)
        assert out.shape == (6, 4, 2)
        assert np.all(out[4:] == 0)


class TestEnclosedness:
    def test_square_is_one_loop(self):
        loops = is_face_enclosed(SQUARE_EDGES, [0, 1, 2, 3], 1e-6)
        assert loops == [[0, 1, 2, 3]]

    def test_broken_chain_fails(self):
        assert is_face_enclosed(SQUARE_EDGES, [0, 2, 1, 3], 1e-6) is False

    def test_unclosed_tail_fails(self):
        assert is_face_enclosed(SQUARE_EDGES, [0, 1, 2], 1e-6) is False

    def test_two_loops(self):
        edges = SQUARE_EDGES + [
            [[2.0, 2.0], [3.0, 2.0]],
            [[3.0, 2.0], [2.0, 2.0]],
        ]
        loops = is_face_enclosed(edges, [0, 1, 2, 3, 4, 5], 1e-6)
        assert loops == [[0, 1, 2, 3], [4, 5]]

    def test_out_of_range_index_skipped(self):
        loops = is_face_enclosed(SQUARE_EDGES, [0, 1, 99, 2, 3], 1e-6)
        assert loops == [[0, 1, 2, 3]]

    def test_oriented_pairs(self):
        # traverse the square with edges 1 and 3 reversed: breaks the chain
        assert is_face_enclosed(SQUARE_EDGES, [(0, 0), (1, 1), (2, 0), (3, 1)], 1e-6) is False
        loops = is_face_enclosed(SQUARE_EDGES, [(0, 0), (1, 0), (2, 0), (3, 0)], 1e-6)
        assert loops == [[(0, 0), (1, 0), (2, 0), (3, 0)]]

    def test_undirected_property_random_cycles(self):
        # property test for the order-free combined-flavor check: any set of
        # random polygon loops passes under ANY edge permutation and ANY
        # per-edge orientation flips; dropping one open edge always fails
        from faceformer_tpu.geometry.enclosedness import (
            is_face_enclosed_undirected)

        rng = np.random.default_rng(4)
        for trial in range(40):
            edges = []
            n_loops = int(rng.integers(1, 4))
            for _ in range(n_loops):
                k = int(rng.integers(3, 8))
                center = rng.uniform(-5, 5, 2)
                angles = np.sort(rng.uniform(0, 2 * np.pi, k))
                ring = center + np.stack(
                    [np.cos(angles), np.sin(angles)], 1) * rng.uniform(0.5, 2)
                for a, b in zip(ring, np.roll(ring, -1, axis=0)):
                    seg = [a.tolist(), b.tolist()]
                    edges.append(seg[::-1] if rng.random() < 0.5 else seg)
            face = list(rng.permutation(len(edges)))
            assert is_face_enclosed_undirected(edges, face, 1e-9), trial
            # removing any single (open) edge leaves odd-degree vertices
            assert not is_face_enclosed_undirected(edges, face[1:], 1e-9)


class TestLoops:
    def test_canonicalize(self):
        loops = canonicalize_loops([[5, 7, 2], [9, 1]])
        assert loops == ((1, 9), (2, 5, 7))

    def test_assemble_cycles_square(self):
        shuffled = [SQUARE_EDGES[2], SQUARE_EDGES[0], SQUARE_EDGES[3][::-1], SQUARE_EDGES[1]]
        cycles, inds, dirs = assemble_cycles(shuffled, [10, 11, 12, 13])
        assert len(cycles) == 1
        assert sorted(inds[0]) == [10, 11, 12, 13]
        # walked cycle must chain end-to-start
        cyc = cycles[0]
        for a, b in zip(cyc, cyc[1:] + cyc[:1]):
            assert np.allclose(a[-1], b[0], atol=1e-9)

    def test_assemble_cylinder_cycle(self):
        arc1 = [[0.0, 0.0], [0.5, 0.3], [1.0, 0.0]]
        line1 = [[1.0, 0.0], [1.0, -1.0]]
        arc2 = [[1.0, -1.0], [0.5, -1.3], [0.0, -1.0]]
        line2 = [[0.0, -1.0], [0.0, 0.0]]
        cycle, inds, dirs = assemble_cylinder_cycle(
            [arc2, line1, arc1, line2], [0, 1, 2, 3]
        )
        assert len(cycle) == 4
        assert sorted(inds) == [0, 1, 2, 3]


class TestCircles:
    def test_circumcircle(self):
        center, radius, normal = circle_through_points(
            [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]
        )
        np.testing.assert_allclose(center, [0, 0, 0], atol=1e-12)
        assert radius == pytest.approx(1.0)
        np.testing.assert_allclose(np.abs(normal), [0, 0, 1], atol=1e-12)

    def test_arc_passes_through_midpoint(self):
        p1, p2, p3 = np.array([1.0, 0, 0]), np.array([-1.0, 0, 0]), np.array([0, 1.0, 0])
        arc = fit_arc_through_points(p1, p2, p3, deflection=1e-4)
        d_end1 = min(np.linalg.norm(arc[0] - p1), np.linalg.norm(arc[-1] - p1))
        d_end2 = min(np.linalg.norm(arc[0] - p2), np.linalg.norm(arc[-1] - p2))
        d_mid = np.min(np.linalg.norm(arc - p3, axis=1))
        assert max(d_end1, d_end2, d_mid) < 0.05
        # all points on the unit circle
        np.testing.assert_allclose(np.linalg.norm(arc, axis=1), 1.0, atol=1e-6)


class TestFixtures:
    @pytest.mark.parametrize("kind", sorted(SOLID_BUILDERS))
    def test_faces_enclosed(self, kind):
        sample = build_sample(SOLID_BUILDERS[kind](), theta=33.0, phi=41.0)
        assert len(sample["edges"]) > 0
        for ftype, loops in sample["faces_indices"]:
            found = is_face_enclosed(sample["edges"], [i for lp in loops for i in lp], 2e-4)
            assert found, f"{kind} face not enclosed"

    @pytest.mark.parametrize("kind", sorted(SOLID_BUILDERS))
    def test_coedge_coherence(self, kind):
        """Every undirected edge appears exactly twice, in opposite directions."""
        sample = build_sample(SOLID_BUILDERS[kind](), theta=70.0, phi=30.0)
        edges = sample["edges"]
        pairings = sample["pairings"]
        # pairings must be a PERFECT MATCHING: every edge exactly once as
        # lower or upper twin (len == E/2 rules out chained or duplicate
        # entries that the coverage check alone would accept)
        assert len(pairings) == len(edges) // 2
        paired = set()
        for i_str, j in pairings.items():
            i = int(i_str)
            assert edges[i] == edges[j][::-1]
            assert i < j  # lower index keys its twin, each pair stored once
            paired.add(i)
            paired.add(j)
        assert paired == set(range(len(edges)))

    def test_canonical_ordering(self):
        sample = build_sample(make_box(), theta=25.0, phi=45.0)
        # edges sorted lexicographically by their point sequences
        for e1, e2 in zip(sample["edges"], sample["edges"][1:]):
            assert e1 <= e2
        # faces sorted by first loop's first index; loops rolled to min-first
        firsts = [loops[0][0] for _, loops in sample["faces_indices"]]
        assert firsts == sorted(firsts)
        for _, loops in sample["faces_indices"]:
            for loop in loops:
                assert loop[0] == min(loop)

    def test_cylinder_face_types(self):
        sample = build_sample(make_cylinder(), theta=25.0, phi=40.0)
        types = sorted(t for t, _ in sample["faces_indices"])
        assert types == [0, 0, 1, 1]

    def test_random_samples(self, rng):
        for _ in range(5):
            sample = random_sample(rng)
            assert len(sample["edges"]) <= 64
            assert len(sample["dominant_directions"]) == 3
            assert all(len(d) == 3 for d in sample["dominant_directions"])

    def test_combined_coedge_mode(self):
        sample = build_sample(make_box(), theta=25.0, phi=45.0, coedge=False)
        # combined mode: 12 undirected edges, faces are flat sorted lists
        assert len(sample["edges"]) == 12
        assert sample["pairings"] == {}
        for face in sample["faces_indices"]:
            assert face == sorted(face)


class TestCanonical:
    def test_open_edge_direction(self):
        from faceformer_tpu.geometry.canonical import correct_edge_direction
        assert correct_edge_direction([[1.0, 0.0], [0.0, 0.0]]) == [[0.0, 0.0], [1.0, 0.0]]
        assert correct_edge_direction([[0.0, 0.0], [1.0, 0.0]]) == [[0.0, 0.0], [1.0, 0.0]]
        # x tie -> order by y
        assert correct_edge_direction([[0.0, 1.0], [0.0, 0.0]]) == [[0.0, 0.0], [0.0, 1.0]]

    def test_closed_edge_canonicalization(self):
        from faceformer_tpu.geometry.canonical import correct_edge_direction
        ring = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0], [1.0, 0.0]]
        out = correct_edge_direction(ring)
        assert out[0] == [-1.0, 0.0]  # min-x point leads
        assert out[0] == out[-1]  # still closed
        # clockwise by y: second point has the larger y neighbor first
        assert out[1][1] >= out[-2][1]

    def test_sort_key_edges(self):
        from faceformer_tpu.geometry.canonical import sort_key_edges
        edges = [[[1.0, 0.0], [2.0, 0.0]], [[0.0, 0.0], [1.0, 0.0]]]
        assert sort_key_edges(edges) == [1, 0]

    def test_sort_faces(self):
        from faceformer_tpu.geometry.canonical import sort_faces_by_indices
        assert sort_faces_by_indices([[3, 1], [0, 9], [3, 0]]) == [[0, 9], [3, 0], [3, 1]]


class TestFrustum:
    def test_types_and_enclosedness(self):
        from faceformer_tpu.geometry.fixtures import make_frustum
        sample = build_sample(make_frustum(), theta=40.0, phi=35.0)
        types = sorted(t for t, _ in sample["faces_indices"])
        assert types == [0, 0, 2, 2]  # 2 planes + 2 Other (cone) sides


class TestCompositeSolids:
    """geometry/solids.py composition invariant: every undirected edge
    appears exactly TWICE across all face loops, once per direction (what
    OCC wire exploration produces and what pairings/enclosedness rely on).
    With coedge interning, that means every edge has exactly one reversed
    twin: len(pairings) == len(edges) / 2."""

    @pytest.mark.parametrize("gen", ["extrusion", "plate_holes", "boss",
                                     "pocket", "shaft"])
    def test_edge_pairing_invariant(self, gen):
        import numpy as np

        from faceformer_tpu.geometry import solids
        from faceformer_tpu.geometry.fixtures import build_sample

        fns = {
            "extrusion": solids.gen_extrusion,
            "plate_holes": solids.gen_plate_with_holes,
            "boss": solids.gen_boss,
            "pocket": solids.gen_pocket,
            "shaft": solids.gen_stepped_shaft,
        }
        # stable per-generator seed: hash() is salted per process
        # (PYTHONHASHSEED), which would make failures unreproducible
        rng = np.random.default_rng(zlib.crc32(gen.encode()))
        built = 0
        for trial in range(12):
            faces = fns[gen](rng)
            try:
                sample = build_sample(
                    faces, theta=float(rng.uniform(0, 360)),
                    phi=float(rng.uniform(25, 65)), coedge=True)
            except AssertionError:
                continue  # degenerate projection; generator retries too
            built += 1
            n_edges = len(sample["edges"])
            assert n_edges % 2 == 0
            assert len(sample["pairings"]) == n_edges // 2, gen
            # every face loop chains (checked by build_sample), and each
            # coedge index is used exactly once across all face loops
            used = [i for _, loops in _typed_loops(sample["faces_indices"])
                    for loop in loops for i in loop]
            assert sorted(used) == list(range(n_edges)), gen
        assert built >= 6, f"{gen}: too many degenerate draws"


def _typed_loops(faces_indices):
    for face in faces_indices:
        ftype, loops = face
        yield ftype, loops


class TestHostPolygon:
    def test_claimed_inradius_never_exceeds_true_clearance(self):
        # regression: the convex-host branch used to claim 0.6*r as a
        # "conservative inradius" while ~27% of draws had less true
        # clearance (worst: origin outside the polygon), letting holes and
        # bosses land across the host boundary
        from faceformer_tpu.geometry import solids

        rng = np.random.default_rng(321)
        for _ in range(500):
            poly, claimed = solids._host_polygon(rng, 1.0)
            clear = solids.origin_clearance(poly)
            assert claimed <= clear + 1e-9
            assert claimed >= 0.2  # enough room for child placement

    def test_origin_clearance_known_shapes(self):
        from faceformer_tpu.geometry import solids

        square = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
        assert abs(solids.origin_clearance(square) - 1.0) < 1e-12
        shifted = square + np.array([5.0, 0.0])  # origin outside
        assert solids.origin_clearance(shifted) == 0.0
