"""Native STEP backend: Part 21 parsing, analytic silhouettes, and the
CAD-free STEP -> JSON generation pipeline (tools/prepare_data.py
--backend native).

This is the path the reference runs through OpenCascade
(dataset/prepare_data.py + dataset/utils/TopoMapper.py); here the whole
chain — reader, HLR outline splitting, sewn-edge removal, canonical JSON
emission — executes against real ISO-10303-21 files with no CAD kernel.
"""

import argparse
import importlib.util
import json
import os

import numpy as np
import pytest

from faceformer_tpu.geometry.enclosedness import is_face_enclosed
from faceformer_tpu.tools import step21, step_native
from faceformer_tpu.tools.occ_pipeline import ProjectionArgs
from faceformer_tpu.tools.step21 import (
    CONE, CYLINDER, PLANE, SPHERE, TORUS, UnsupportedStep)

_spec = importlib.util.spec_from_file_location(
    "prepare_data_step", os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "prepare_data.py"))
prepare_data = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(prepare_data)

_gspec = importlib.util.spec_from_file_location(
    "gen_step_solids", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "gen_step_solids.py"))
gen_step = importlib.util.module_from_spec(_gspec)
_gspec.loader.exec_module(gen_step)

BOX_POLY = np.array([[-0.8, -0.5], [0.8, -0.5], [0.8, 0.5], [-0.8, 0.5]])


def _gen_args(**over):
    base = dict(combine_coedge=False, direction_token=False,
                order_by_position=False, no_face_type=False, tol=1e-4)
    base.update(over)
    return argparse.Namespace(**base)


def _pipeline(text, focus=0.0, **gen_over):
    return _pipeline_view(text, (1, 1, 1), focus=focus, **gen_over)


def _pipeline_view(text, location, focus=0.0, **gen_over):
    ents = step21.parse_step_text(text)
    solid = step21._Resolver(ents).solids()[0]
    step_native.normalize_solid(solid)
    proj = ProjectionArgs(location=tuple(location), direction=tuple(location),
                          focus=focus, tol=1e-4)
    topo = step_native.NativeTopoMapper(solid, proj)
    data = prepare_data.assemble_json(topo, _gen_args(**gen_over), "t")
    return topo, data


# ---------------------------------------------------------------------------
# Part 21 parser
# ---------------------------------------------------------------------------


class TestParser:
    def test_box_roundtrip(self):
        text = step21.brep_extrusion(BOX_POLY, -0.4, 0.4, name="box")
        solids = step21._Resolver(step21.parse_step_text(text)).solids()
        assert len(solids) == 1
        solid = solids[0]
        assert len(solid.faces) == 6
        assert len(solid.edges()) == 12
        assert all(f.surface_kind == PLANE for f in solid.faces)
        # every undirected edge is traversed exactly twice, in opposite
        # directions (the invariant the pairing machinery relies on)
        counts = {}
        for face in solid.faces:
            for loop in face.loops:
                for edge, orient in loop:
                    counts.setdefault(id(edge), []).append(orient)
        assert all(sorted(v) == [0, 1] for v in counts.values())

    def test_string_escapes_enums_and_complex_instances(self):
        text = (
            "ISO-10303-21;HEADER;ENDSEC;DATA;\n"
            "#1 = CARTESIAN_POINT('it''s ; tricky (really)',(1.,2.,-3.E-1)) ;\n"
            "#2 = ( GEOMETRIC_REPRESENTATION_CONTEXT(3) "
            "GLOBAL_UNIT_ASSIGNED_CONTEXT((#1)) REPRESENTATION_CONTEXT('','') ) ;\n"
            "#3 = DIRECTION('',(0.,0.,1.)) ;\n"
            "ENDSEC;END-ISO-10303-21;")
        ents = step21.parse_step_text(text)
        assert ents[1].name == "CARTESIAN_POINT"
        assert ents[1].args[0] == "it's ; tricky (really)"
        np.testing.assert_allclose(ents[1].args[1], [1.0, 2.0, -0.3])
        assert ents[2].name == "&"  # complex instance, tolerated
        assert ents[2].args[1].name == "GLOBAL_UNIT_ASSIGNED_CONTEXT"

    def test_unsupported_surface_raises(self):
        text = step21.brep_cylinder(0.5, 1.0)
        text = text.replace("CYLINDRICAL_SURFACE", "B_SPLINE_SURFACE")
        with pytest.raises(UnsupportedStep):
            step21._Resolver(step21.parse_step_text(text)).solids()

    def test_malformed_torus_raises(self):
        # a TOROIDAL_SURFACE without a minor radius (e.g. a rewritten
        # cylinder entity) must fail as unsupported, not crash
        text = step21.brep_cylinder(0.5, 1.0)
        text = text.replace("CYLINDRICAL_SURFACE", "TOROIDAL_SURFACE")
        with pytest.raises(UnsupportedStep):
            step21._Resolver(step21.parse_step_text(text)).solids()

    def test_oriented_edge_and_bound_flags(self):
        # a reversed FACE_BOUND must flip loop order and every orientation
        text = step21.brep_extrusion(BOX_POLY, -0.4, 0.4)
        ents = step21.parse_step_text(text)
        # find one FACE_OUTER_BOUND and flip its flag
        for ident, ent in ents.items():
            if ent.name == "FACE_OUTER_BOUND":
                ent.args[2] = ".F."
                break
        solid = step21._Resolver(ents).solids()[0]
        counts = {}
        for face in solid.faces:
            for loop in face.loops:
                for edge, orient in loop:
                    counts.setdefault(id(edge), []).append(orient)
        # the invariant survives because BOTH traversals of each edge of
        # that bound flipped together is false — flipping one face breaks
        # pairing for its edges, proving the flag is honored
        assert any(sorted(v) != [0, 1] for v in counts.values())


# ---------------------------------------------------------------------------
# analytic silhouettes (the HLR outline contract)
# ---------------------------------------------------------------------------


def _random_frame(rng):
    z = rng.normal(size=3)
    z /= np.linalg.norm(z)
    seed = rng.normal(size=3)
    x = seed - z * (seed @ z)
    x /= np.linalg.norm(x)
    return step21.Frame(rng.normal(scale=0.3, size=3), z, x)


class TestSilhouette:
    @pytest.mark.parametrize("focus", [0.0, 3.5])
    def test_cylinder_normal_orthogonality(self, focus):
        rng = np.random.default_rng(0)
        for _ in range(20):
            f = _random_frame(rng)
            face = step21.BFace(CYLINDER, f, float(rng.uniform(0.2, 0.8)),
                                0.0, True, [])
            proj = step_native.NativeProjector(
                ProjectionArgs(location=tuple(rng.uniform(1, 2, 3)),
                               direction=tuple(rng.normal(size=3)),
                               focus=focus))
            for theta in step_native.silhouette_angles(face, proj):
                n = np.cos(theta) * f.x + np.sin(theta) * f.y
                p = f.origin + face.radius * n + 0.3 * f.z  # ruling point
                view = proj.n if proj.eye is None else (p - proj.eye)
                assert abs(float(n @ view)) < 1e-6 * max(1, np.linalg.norm(view))

    @pytest.mark.parametrize("focus", [0.0, 3.5])
    def test_cone_normal_orthogonality(self, focus):
        rng = np.random.default_rng(1)
        for _ in range(20):
            f = _random_frame(rng)
            alpha = float(rng.uniform(0.1, 0.6)) * float(rng.choice([-1, 1]))
            radius = float(rng.uniform(0.3, 0.8))
            face = step21.BFace(CONE, f, radius, alpha, True, [])
            proj = step_native.NativeProjector(
                ProjectionArgs(location=tuple(rng.uniform(1.5, 2.5, 3)),
                               direction=tuple(rng.normal(size=3)),
                               focus=focus))
            ca, sa = np.cos(alpha), np.sin(alpha)
            for theta in step_native.silhouette_angles(face, proj):
                n = ca * (np.cos(theta) * f.x + np.sin(theta) * f.y) - sa * f.z
                z = 0.25
                r_z = radius + z * np.tan(alpha)
                p = (f.origin + z * f.z
                     + r_z * (np.cos(theta) * f.x + np.sin(theta) * f.y))
                view = proj.n if proj.eye is None else (p - proj.eye)
                assert abs(float(n @ view)) < 1e-6 * max(1, np.linalg.norm(view))


# ---------------------------------------------------------------------------
# the full native pipeline per solid family
# ---------------------------------------------------------------------------


class TestNativePipeline:
    @pytest.mark.parametrize("focus", [0.0, 3.0])
    @pytest.mark.parametrize("maker,exp_types", [
        (lambda: step21.brep_extrusion(BOX_POLY, -0.4, 0.4),
         {PLANE: 6}),
        (lambda: step21.brep_cylinder(0.6, 1.2),
         {CYLINDER: 2, PLANE: 2}),
        (lambda: step21.brep_frustum(0.8, 0.45, 1.0),
         {CONE: 2, PLANE: 2}),
        (lambda: step21.brep_extrusion(BOX_POLY, -0.4, 0.4,
                                       holes=[(0.1, 0.0, 0.25)]),
         {PLANE: 6, CYLINDER: 2}),
    ])
    def test_families_valid_and_split(self, maker, exp_types, focus):
        topo, data = _pipeline(maker(), focus=focus)
        got = {}
        for rec in topo.all_faces.values():
            got[rec.face_type] = got.get(rec.face_type, 0) + 1
        assert got == exp_types
        # sewn edges are gone: no face uses an edge twice
        for rec in topo.all_faces.values():
            assert len(rec.keys) == len(set(rec.keys))
        # every coedge has its reversed partner (assemble_json already
        # asserted per-face enclosedness at tol*2)
        assert 2 * len(data["pairings"]) == len(data["edges"])

    def test_normalization_scales_bbox_diagonal_to_two(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_extrusion(BOX_POLY * 7.3, -2.0, 5.0))).solids()[0]
        step_native.normalize_solid(solid)
        lo, hi = step_native.solid_bbox(solid)
        np.testing.assert_allclose(np.linalg.norm(hi - lo), 2.0, atol=1e-3)
        np.testing.assert_allclose((lo + hi) / 2, 0.0, atol=1e-3)

    def test_seam_vertex_keeps_arcs_split_but_edges_paired(self):
        # the cylinder's seam is removed by the sewn-edge machinery; the
        # circles stay split at the seam vertex (reference Face.py:73-113
        # same-face branch), so each cap decomposes into one loop of arcs
        topo, data = _pipeline(step21.brep_cylinder(0.6, 1.2))
        plane_faces = [f for f in data["faces_indices"] if f[0] == PLANE]
        assert len(plane_faces) == 2
        for _, loops in plane_faces:
            assert len(loops) == 1
            assert len(loops[0]) == 3  # split at 2 silhouettes + the seam

    def test_direction_token_flavor(self):
        _, data = _pipeline(step21.brep_cylinder(0.6, 1.2),
                            direction_token=True)
        # oriented pointers: each stored edge referenced once per direction
        seen = {}
        for loops in data["faces_indices"]:
            for loop in loops:
                for idx, orient in loop:
                    seen.setdefault(idx, []).append(orient)
        assert all(sorted(v) == [0, 1] for v in seen.values())

    def test_combine_coedge_flavor(self):
        _, data = _pipeline(step21.brep_extrusion(BOX_POLY, -0.4, 0.4),
                            combine_coedge=True)
        assert len(data["edges"]) == 12  # one record per undirected edge
        assert data["pairings"] == {}

    def test_multi_solid_rejected(self):
        text = step21.brep_cylinder(0.5, 1.0)
        # duplicate the solid entity: two MANIFOLD_SOLID_BREPs
        ents = step21.parse_step_text(text)
        shell_ref = next(e.args[1] for e in ents.values()
                         if e.name == "MANIFOLD_SOLID_BREP")
        ents[max(ents) + 1] = step21.Typed(
            "MANIFOLD_SOLID_BREP", ["again", shell_ref])
        assert len(step21._Resolver(ents).solids()) == 2


class TestSphere:
    """SPHERICAL_SURFACE support (round-4 VERDICT #4): sphere silhouettes
    are circles; the splitter handles the crossing case (two sub-faces
    along the silhouette arc), the interior case (sub-cap + two-loop
    band), and the miss case. Spheres map to the reference's Other face
    type (GeomAbs_Sphere = 3, Face.py:18-24)."""

    def test_parse_roundtrip(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_dome(1.0, 0.8))).solids()[0]
        kinds = sorted(f.surface_kind for f in solid.faces)
        assert kinds == [PLANE, SPHERE]
        sph = next(f for f in solid.faces if f.surface_kind == SPHERE)
        assert sph.radius == pytest.approx(1.0)

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_crossing_split(self, focus):
        # side view of a dome: the silhouette circle crosses the boundary
        # circle twice -> near + far sphere sub-faces sharing the
        # silhouette arc, every coedge paired, every face enclosed
        topo, data = _pipeline(step21.brep_dome(1.0, 0.8), focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types == [PLANE, SPHERE, SPHERE]
        assert 2 * len(data["pairings"]) == len(data["edges"])

    @pytest.mark.parametrize("focus,cap_height", [(0.0, 1.2), (3.0, 1.0)])
    def test_band_split(self, focus, cap_height):
        # pole-on view of a big cap: the silhouette circle lies inside the
        # face -> inner sub-cap + a two-loop band face
        topo, data = _pipeline_view(step21.brep_dome(1.0, cap_height),
                                    (0.01, 0.01, 1.0), focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types == [PLANE, SPHERE, SPHERE]
        loop_counts = sorted(len(f[1]) for f in data["faces_indices"]
                             if f[0] == SPHERE)
        assert loop_counts == [1, 2]
        assert 2 * len(data["pairings"]) == len(data["edges"])

    def test_no_split_when_silhouette_misses(self):
        # shallow cap viewed pole-on orthographic: the silhouette great
        # circle misses the cap entirely -> 2 faces, 1 shared circle
        topo, data = _pipeline_view(step21.brep_dome(1.0, 0.3),
                                    (0.01, 0.01, 1.0), focus=0.0)
        assert sorted(f[0] for f in data["faces_indices"]) == [PLANE, SPHERE]
        assert len(data["pairings"]) == 1

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_dome_block_shared_equator(self, focus):
        # hemisphere on a cylinder: the wall's ruling endpoints and the
        # sphere's silhouette crossings land on the SAME equator vertices;
        # the split must share them so chains close and coedges pair
        topo, data = _pipeline(step21.brep_dome_block(0.7, 0.8), focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types == [PLANE, CYLINDER, CYLINDER, SPHERE, SPHERE]
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for rec in topo.all_faces.values():
            assert len(rec.keys) == len(set(rec.keys))

    def test_random_camera_sweep(self):
        rng = np.random.default_rng(12)
        ran = 0
        for i in range(24):
            loc = tuple(rng.uniform(-1.5, 1.5, 3))
            if float(np.linalg.norm(loc)) < 0.5:
                continue
            focus = float(rng.choice([0.0, 3.0, 4.5]))
            text = (step21.brep_dome(1.0, float(rng.uniform(0.3, 1.5)))
                    if i % 2 else
                    step21.brep_dome_block(0.7, float(rng.uniform(0.5, 1.2))))
            _, data = _pipeline_view(text, loc, focus=focus)
            assert 2 * len(data["pairings"]) == len(data["edges"])
            ran += 1
        assert ran >= 20

    def test_bbox_includes_cap_pole(self):
        # the hemisphere bulges past its boundary edges: normalization
        # must account for the pole, not just discretized edge points
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_dome(1.0, 1.0))).solids()[0]
        lo, hi = step_native.solid_bbox(solid)
        assert hi[2] == pytest.approx(1.0, abs=1e-6)  # the pole, not z=0
        step_native.normalize_solid(solid)
        lo, hi = step_native.solid_bbox(solid)
        np.testing.assert_allclose(np.linalg.norm(hi - lo), 2.0, atol=1e-3)

    def test_direction_token_flavor(self):
        _, data = _pipeline(step21.brep_dome_block(0.7, 0.8),
                            direction_token=True)
        seen = {}
        for loops in data["faces_indices"]:
            for loop in loops:
                for idx, orient in loop:
                    seen.setdefault(idx, []).append(orient)
        assert all(sorted(v) == [0, 1] for v in seen.values())


class TestTorus:
    """TOROIDAL_SURFACE support: the silhouette condition reduces per-u to
    the same one-harmonic equation as the other quadrics, branches are
    traced as polyline edges (OCC's HLR also hands torus outlines over
    discretized), and faces are recovered by half-edge tracing over the
    band. Tori map to the reference's Other face type (GeomAbs_Torus = 4,
    Face.py:18-24; labels clamp >= 2, data_para.py:76-80)."""

    def test_parse_roundtrip(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_torus(0.8, 0.3))).solids()[0]
        assert [f.surface_kind for f in solid.faces] == [TORUS, TORUS]
        assert solid.faces[0].radius == pytest.approx(0.8)
        assert solid.faces[0].radius2 == pytest.approx(0.3)

    def test_non_ring_torus_rejected(self):
        with pytest.raises(UnsupportedStep):
            step21.brep_torus(0.3, 0.8)

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_donut_three_quarter_view(self, focus):
        # generic 3/4 view: each band carries one wrapping silhouette
        # branch, splitting the donut's 2 faces into 4
        topo, data = _pipeline(step21.brep_torus(0.8, 0.3), focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types == [TORUS] * 4
        assert 2 * len(data["pairings"]) == len(data["edges"])

    def test_donut_axis_view(self):
        # straight down the axis (orthographic): the silhouettes are the
        # outer (v = 0) and inner (v = pi) equator circles, one in each
        # band's interior -> both bands split in two
        topo, data = _pipeline_view(step21.brep_torus(0.8, 0.3),
                                    (0.0, 0.0, 1.0), focus=0.0)
        assert sorted(f[0] for f in data["faces_indices"]) == [TORUS] * 4
        assert 2 * len(data["pairings"]) == len(data["edges"])

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_round_top_cylinder(self, focus):
        # quarter-torus fillet between a cylinder wall and a top disc: the
        # fillet's silhouette crossings must share vertices with the wall's
        # ruling endpoints on their common circle so all chains close
        topo, data = _pipeline(step21.brep_round_top_cylinder(0.6, 0.9, 0.25),
                               focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types == [PLANE, PLANE, CYLINDER, CYLINDER, TORUS, TORUS]
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for rec in topo.all_faces.values():
            assert len(rec.keys) == len(set(rec.keys))

    def test_silhouette_points_on_silhouette(self):
        # every poly (silhouette) edge the split emits satisfies the HLR
        # condition N . view = 0 along its samples
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_torus(0.8, 0.3))).solids()[0]
        step_native.normalize_solid(solid)
        torus = solid.faces[0]
        C, R, r = torus.frame.origin, torus.radius, torus.radius2
        X, Y, Z = torus.frame.x, torus.frame.y, torus.frame.z
        for focus in (0.0, 3.0):
            proj = step_native.NativeProjector(ProjectionArgs(
                location=(1, 1, 1), direction=(1, 1, 1), focus=focus))
            reg = step_native._SplitRegistry()
            subs = step_native._TorusSplitter(torus, proj, 1e-4, reg).split()
            checked = 0
            for face in subs:
                for edge, _ in face.loops[0]:
                    if edge.curve.kind != "poly":
                        continue
                    for p in edge.curve.points:
                        q = p - C
                        zc = float(q @ Z)
                        rad = q - zc * Z
                        er = rad / np.linalg.norm(rad)
                        radial = float(np.linalg.norm(rad)) - R
                        n = radial / r * er + zc / r * Z
                        view = proj.n if proj.eye is None else (p - proj.eye)
                        assert abs(float(n @ view)) < 5e-3 * max(
                            1.0, float(np.linalg.norm(view)))
                        checked += 1
            assert checked > 32

    def test_random_camera_sweep(self):
        rng = np.random.default_rng(21)
        ran = rejected = 0
        for i in range(30):
            loc = tuple(rng.uniform(-1.5, 1.5, 3))
            if float(np.linalg.norm(loc)) < 0.5:
                continue
            focus = float(rng.choice([0.0, 3.0, 4.5]))
            text = (step21.brep_torus(0.8, float(rng.uniform(0.15, 0.5)))
                    if i % 2 else
                    step21.brep_round_top_cylinder(
                        0.6, float(rng.uniform(0.5, 1.1)),
                        float(rng.uniform(0.12, 0.28))))
            try:
                _, data = _pipeline_view(text, loc, focus=focus)
            except UnsupportedStep:
                rejected += 1  # conservative guards route to the OCC backend
                continue
            assert 2 * len(data["pairings"]) == len(data["edges"])
            ran += 1
        assert ran >= 20
        assert rejected <= 4

    def test_bbox_includes_tube_extremes(self):
        # the donut's outer equator (radius R + r) and top/bottom circles
        # (z = +-r) lie in face interiors, not on boundary edges
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_torus(0.8, 0.3))).solids()[0]
        lo, hi = step_native.solid_bbox(solid)
        np.testing.assert_allclose(hi, [1.1, 1.1, 0.3], atol=1e-3)
        np.testing.assert_allclose(lo, [-1.1, -1.1, -0.3], atol=1e-3)
        step_native.normalize_solid(solid)
        lo, hi = step_native.solid_bbox(solid)
        np.testing.assert_allclose(np.linalg.norm(hi - lo), 2.0, atol=1e-3)

    def test_face_type_clamps_to_other(self):
        from faceformer_tpu.config import TokenConfig
        from faceformer_tpu.data.packing import face_type_token

        tok = TokenConfig()
        assert (face_type_token(TORUS, tok)
                == face_type_token(2, tok))  # Other, like cone/sphere


# ---------------------------------------------------------------------------
# corpus end-to-end: STEP files on disk -> prepare_data --backend native ->
# integrity check -> the production dataset packs it
# ---------------------------------------------------------------------------


from faceformer_tpu.geometry.solids import bezier_star_segments as _star_segments  # noqa: E402


class TestSplinePrism:
    """Freeform extrusion walls (B_SPLINE_SURFACE_WITH_KNOTS, linear in v):
    the silhouette of P(u,t) = C(u) + t*d is t-free, so outlines are whole
    rulings at the roots of g(u) = (C'(u) x d).(C(u) - E) — the edges
    OCC's HLR finds on ruled freeform faces (TopoMapper.py:38-83). Spline
    faces map to the reference's Other type (GeomAbs_BSplineSurface = 6,
    labels clamp >= 2, data_para.py:76-80)."""

    def _prism(self, seed=12, n=4):
        rng = np.random.default_rng(seed)
        return step21.brep_spline_prism(_star_segments(rng, n=n), -0.4, 0.4)

    def test_side_view_split_count_matches_tangent_extremes(self):
        # orthographic view along w = (1,1,0): g(u) = (C'(u) x z).w =
        # C'(u).(z x w), so silhouette rulings sit exactly where the
        # profile tangent satisfies ty = tx (its extremes along the view
        # normal) — count them independently from dense tangent samples.
        # (The +x view is degenerate for this profile family: its
        # y-extremes fall exactly on the segment junctions.)
        text = self._prism()
        solid = step21._Resolver(step21.parse_step_text(text)).solids()[0]
        step_native.normalize_solid(solid)
        walls = [f for f in solid.faces if f.surface_kind == step21.BSPLINE]
        expected = len(walls)
        for w in walls:
            bot = [e for e, _ in w.loops[0] if e.curve.kind == "bspline"
                   and float(midpoint_z(e)) < 0][0]
            hodo = step21.bspline_hodograph(bot.curve)
            lo, hi = step21.bspline_domain(bot.curve)
            der = step21.bspline_eval(hodo, np.linspace(lo, hi, 257))
            ind = der[:, 1] - der[:, 0]
            expected += int(np.sum(ind[:-1] * ind[1:] < 0))
        topo, data = _pipeline_view(text, (1.0, 1.0, 0.0), focus=0.0)
        got = sum(1 for f in data["faces_indices"] if f[0] == step21.BSPLINE)
        assert got == expected and expected > len(walls)
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for face in data["faces_indices"]:
            flat = [i for lp in face[1] for i in lp]
            assert is_face_enclosed(data["edges"], flat, 2e-4)

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_generic_view_pipeline(self, focus):
        topo, data = _pipeline(self._prism(seed=13), focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types.count(PLANE) == 2
        assert all(t in (PLANE, step21.BSPLINE) for t in types)
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for face in data["faces_indices"]:
            flat = [i for lp in face[1] for i in lp]
            assert is_face_enclosed(data["edges"], flat, 2e-4)
        for rec in topo.all_faces.values():
            assert len(rec.keys) == len(set(rec.keys))

    def test_axis_view_needs_no_split(self):
        # straight down the extrusion axis g = (C' x z).z = 0 identically:
        # walls project to curves, nothing to split
        topo, data = _pipeline_view(self._prism(seed=14), (0.0, 0.0, 1.0))
        assert sum(1 for f in data["faces_indices"]
                   if f[0] == step21.BSPLINE) == 4

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_new_rulings_lie_on_silhouette(self, focus):
        solid = step21._Resolver(step21.parse_step_text(
            self._prism(seed=15))).solids()[0]
        step_native.normalize_solid(solid)
        proj = step_native.NativeProjector(ProjectionArgs(
            location=(1, 1, 1), direction=(1, 1, 1), focus=focus))
        checked = 0
        for face in list(solid.faces):
            if face.surface_kind != step21.BSPLINE:
                continue
            reg = step_native._SplitRegistry()
            splitter = step_native._ExtrusionSplitter(face, proj, 1e-4, reg)
            subs = splitter.split()
            if subs is None:
                continue
            orig_lines = {id(e) for e, _ in face.loops[0]
                          if e.curve.kind == "line"}
            d = np.asarray(face.extrude, dtype=float)
            for sub in subs:
                for edge, _ in sub.loops[0]:
                    if edge.curve.kind != "line" or id(edge) in orig_lines:
                        continue
                    base = (edge.v0.point
                            if float((edge.v1.point - edge.v0.point) @ d) > 0
                            else edge.v1.point)
                    # recover u at the base and check N . view = 0 there
                    lo, hi = step21.bspline_domain(splitter.bot.curve)
                    us = np.linspace(lo, hi, 4097)
                    pts = step21.bspline_eval(splitter.bot.curve, us)
                    u = us[int(np.argmin(np.linalg.norm(pts - base, axis=1)))]
                    der = step21.bspline_eval(splitter._hodo, [u])[0]
                    n = np.cross(der, d)
                    view = (proj.n if proj.eye is None
                            else base - proj.eye)
                    cosang = abs(float(n @ view)) / (
                        np.linalg.norm(n) * np.linalg.norm(view))
                    assert cosang < 5e-3
                    checked += 1
        assert checked >= 2


def midpoint_z(edge):
    return step_native.midpoint_of(edge)[2]


class TestApexCone:
    """Apex cones: the wall has ONE arc station; the other bound is the
    apex point where station_radius vanishes. Both silhouette rulings end
    at the shared apex vertex (reference cones go through OCC's HLR the
    same way, with GeomAbs_Cone = 2 clamping to the Other label)."""

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_cone_splits_at_apex(self, focus):
        topo, data = _pipeline(step21.brep_cone(0.6, 1.0), focus=focus)
        assert sorted(f[0] for f in data["faces_indices"]) == [PLANE, CONE, CONE]
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for face in data["faces_indices"]:
            flat = [i for lp in face[1] for i in lp]
            assert is_face_enclosed(data["edges"], flat, 2e-4)

    def test_point_down_cone(self):
        # arcs on the TOP station, apex below: orientation falls out of
        # the top arcs directly
        topo, data = _pipeline_view(step21.brep_cone(0.5, -0.8),
                                    (1.0, 1.0, -1.0), focus=3.0)
        assert sorted(f[0] for f in data["faces_indices"]) == [PLANE, CONE, CONE]

    def test_rulings_share_one_apex_vertex(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_cone(0.6, 1.0))).solids()[0]
        step_native.normalize_solid(solid)
        proj = step_native.NativeProjector(ProjectionArgs(
            location=(1, 1, 1), direction=(1, 1, 1), focus=0.0))
        wall = [f for f in solid.faces if f.surface_kind == CONE][0]
        reg = step_native._SplitRegistry()
        subs = step_native._FaceSplitter(wall, proj, 1e-4, reg).split()
        assert subs is not None and len(subs) == 2
        apexes = set()
        for sub in subs:
            for edge, _ in sub.loops[0]:
                if edge.curve.kind == "line":
                    for v in (edge.v0, edge.v1):
                        r = v.point - wall.frame.origin
                        z = float(r @ wall.frame.z)
                        if float(np.linalg.norm(r - z * wall.frame.z)) < 1e-6:
                            apexes.add(id(v))
        assert len(apexes) == 1  # every ruling ends at the SAME vertex


class TestRevolution:
    """SURFACE_OF_REVOLUTION over B-spline meridian profiles: the HLR
    condition is one-harmonic in the revolution angle per profile station,
    so silhouette branches are analytic u(s) graphs traced by an s-sweep
    with tangency flips; the torus band machinery assembles the regions
    (reference: OCC HLR on GeomAbs_SurfaceOfRevolution faces,
    TopoMapper.py:38-83; type 7 clamps to Other, data_para.py:76-80)."""

    PRZ = np.array([[0.6, 0.0], [0.9, 0.3], [0.4, 0.6],
                    [0.8, 0.9], [0.5, 1.2]])

    def test_parse_roundtrip(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_vase(self.PRZ))).solids()[0]
        kinds = sorted(f.surface_kind for f in solid.faces)
        assert kinds == [PLANE, PLANE, step21.REVOLUTION]
        band = [f for f in solid.faces
                if f.surface_kind == step21.REVOLUTION][0]
        assert band.profile is not None and band.profile.degree == 3
        # the seam edge shares the surface's profile curve entity
        seam = [e for e, _ in band.loops[0] if e.curve.kind == "bspline"][0]
        assert seam.curve is band.profile

    @pytest.mark.parametrize("focus,loc", [
        (3.0, (0.5, 1.0, 0.8)), (0.0, (0.2, -1.0, 0.5)),
        (4.0, (0.7, -0.6, 0.9))])
    def test_vase_pipeline(self, focus, loc):
        topo, data = _pipeline_view(step21.brep_vase(self.PRZ), loc,
                                    focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types.count(PLANE) == 2
        assert types.count(step21.REVOLUTION) >= 2  # the band split
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for face in data["faces_indices"]:
            flat = [i for lp in face[1] for i in lp]
            assert is_face_enclosed(data["edges"], flat, 2e-4)
        for rec in topo.all_faces.values():
            assert len(rec.keys) == len(set(rec.keys))

    def test_silhouette_polylines_satisfy_hlr_condition(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_vase(self.PRZ))).solids()[0]
        step_native.normalize_solid(solid)
        band = [f for f in solid.faces
                if f.surface_kind == step21.REVOLUTION][0]
        proj = step_native.NativeProjector(ProjectionArgs(
            location=(0.5, 1.0, 0.8), direction=(0.5, 1.0, 0.8), focus=3.0))
        reg = step_native._SplitRegistry()
        subs = step_native._RevolutionSplitter(band, proj, 1e-4, reg).split()
        assert subs is not None
        C, Z = band.frame.origin, band.frame.z
        eye = proj.eye
        checked = 0
        for face in subs:
            for edge, _ in face.loops[0]:
                if edge.curve.kind != "poly":
                    continue
                pts = np.asarray(edge.curve.points)[1:-1:5]
                for p in pts:
                    # normal direction from the profile at this station
                    q = p - C
                    zc = float(q @ Z)
                    rad = float(np.linalg.norm(q - zc * Z))
                    er = (q - zc * Z) / rad
                    s = step_native._RevolutionSplitter(
                        band, proj, 1e-4,
                        step_native._SplitRegistry())._v_of(p)
                    d = step21.bspline_eval(
                        step21.bspline_hodograph(band.profile), s)[0]
                    pr, pz = float(d @ band.frame.x), float(d @ Z)
                    n = pz * er - pr * Z
                    view = p - eye
                    cosang = abs(float(n @ view)) / (
                        np.linalg.norm(n) * np.linalg.norm(view))
                    assert cosang < 2e-2
                    checked += 1
        assert checked >= 4

    def test_random_views_never_emit_bad_topology(self):
        # conservative contract: any emitted split passes pairing +
        # enclosedness; hard configs raise UnsupportedStep instead
        rng = np.random.default_rng(7)
        emitted = 0
        for _ in range(12):
            k = int(rng.integers(4, 7))
            rho = rng.uniform(0.3, 1.0, size=k)
            z = np.cumsum(rng.uniform(0.15, 0.45, size=k))
            prz = np.stack([rho, z - z[0]], axis=1)
            loc = rng.normal(size=3)
            focus = float(rng.choice([0.0, 3.0]))
            try:
                topo, data = _pipeline_view(step21.brep_vase(prz),
                                            tuple(loc), focus=focus)
            except UnsupportedStep:
                continue
            emitted += 1
            assert 2 * len(data["pairings"]) == len(data["edges"])
            for face in data["faces_indices"]:
                flat = [i for lp in face[1] for i in lp]
                assert is_face_enclosed(data["edges"], flat, 2e-4)
        assert emitted >= 6

    def test_off_meridian_profile_raises(self):
        text = step21.brep_vase(self.PRZ)
        # bend one profile control point off the meridian plane
        lines = text.splitlines()
        for i, ln in enumerate(lines):
            if "CARTESIAN_POINT('',(0.9," in ln:
                lines[i] = ln.replace("(0.9,0,", "(0.9,0.2,")
        with pytest.raises(UnsupportedStep):
            step21._Resolver(step21.parse_step_text(
                "\n".join(lines))).solids()


class TestPatch:
    """General doubly-curved B-spline patch faces: silhouettes have no
    analytic structure, so boundary events come from 1-D bisection along
    the four sides, arcs march with predictor-corrector steps on the
    finite-difference gradient, and a sign flood fill rejects interior
    islands (reference: OCC HLR on GeomAbs_BSplineSurface faces,
    TopoMapper.py:38-83; type 6 clamps to Other, data_para.py:76-80)."""

    GZ = np.array([[0.5, 0.55, 0.5], [0.6, 1.1, 0.6], [0.5, 0.55, 0.5]])

    def test_parse_roundtrip(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_pillow(self.GZ, 0.8, 0.7))).solids()[0]
        kinds = sorted(f.surface_kind for f in solid.faces)
        assert kinds == [PLANE] * 5 + [step21.BSPLINE]
        roof = [f for f in solid.faces
                if f.surface_kind == step21.BSPLINE][0]
        assert roof.patch is not None and roof.patch.grid.shape == (3, 3, 3)
        assert roof.profile is None  # general patch, not an extrusion

    def test_patch_eval_matches_tensor_deboor(self):
        rng = np.random.default_rng(3)
        grid = rng.normal(size=(5, 4, 3))
        patch = step21.BPatch(grid, 3, 3,
                              step21.expand_knots([0., .5, 1.], [4, 1, 4]),
                              step21.expand_knots([0., 1.], [4, 4]))
        (ul, uh), (vl, vh) = patch.domain()
        for u, v in [(0.2, 0.3), (0.77, 0.9), (ul, vl), (uh, vh)]:
            # reference: collapse u first instead of v
            cu = grid.reshape(5, -1)
            rows = step21.bspline_eval_raw(cu, patch.uknots, 3, [u])[0]
            want = step21.bspline_eval_raw(rows.reshape(4, 3),
                                           patch.vknots, 3, [v])[0]
            got = step21.patch_eval(patch, [(u, v)])[0]
            np.testing.assert_allclose(got, want, atol=1e-12)

    @pytest.mark.parametrize("focus,loc", [
        (0.0, (1.0, 0.2, -0.3)), (3.0, (0.6, -0.9, 0.4))])
    def test_low_view_splits_roof(self, focus, loc):
        topo, data = _pipeline_view(step21.brep_pillow(self.GZ, 0.8, 0.7),
                                    loc, focus=focus)
        types = sorted(f[0] for f in data["faces_indices"])
        assert types.count(step21.BSPLINE) == 2  # roof split once
        assert types.count(PLANE) == 5
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for face in data["faces_indices"]:
            flat = [i for lp in face[1] for i in lp]
            assert is_face_enclosed(data["edges"], flat, 2e-4)

    def test_top_view_no_split(self):
        topo, data = _pipeline_view(step21.brep_pillow(self.GZ, 0.8, 0.7),
                                    (0.3, 0.2, 1.0), focus=0.0)
        assert sorted(f[0] for f in data["faces_indices"]).count(
            step21.BSPLINE) == 1

    def test_silhouette_polyline_satisfies_hlr_condition(self):
        solid = step21._Resolver(step21.parse_step_text(
            step21.brep_pillow(self.GZ, 0.8, 0.7))).solids()[0]
        step_native.normalize_solid(solid)
        roof = [f for f in solid.faces
                if f.surface_kind == step21.BSPLINE][0]
        proj = step_native.NativeProjector(ProjectionArgs(
            location=(0.6, -0.9, 0.4), direction=(0.6, -0.9, 0.4),
            focus=3.0))
        sp = step_native._PatchSplitter(roof, proj, 1e-4,
                                        step_native._SplitRegistry())
        subs = sp.split()
        assert subs is not None and len(subs) == 2
        # the traced curve must satisfy g = 0 far below the functional's
        # scale over the domain (the corrector converges each sample)
        key = next(iter(sp.v_coords))
        samples, _end = sp._march(key)
        g = np.abs(sp._g(np.asarray(samples[1:-1])))
        scale = float(np.max(np.abs(sp._g(np.stack(np.meshgrid(
            np.linspace(sp.ul, sp.uh, 9), np.linspace(sp.vl, sp.vh, 9),
            indexing="ij"), axis=-1).reshape(-1, 2)))))
        assert float(np.max(g)) < 1e-6 * scale
        checked = len(g)
        assert checked >= 10

    def test_random_views_never_emit_bad_topology(self):
        rng = np.random.default_rng(11)
        emitted = 0
        for _ in range(6):
            gz = rng.uniform(0.4, 1.2, size=(int(rng.integers(3, 5)),
                                             int(rng.integers(3, 5))))
            loc = rng.normal(size=3)
            try:
                topo, data = _pipeline_view(
                    step21.brep_pillow(gz, 0.8, 0.8), tuple(loc),
                    focus=float(rng.choice([0.0, 3.0])))
            except UnsupportedStep:
                continue
            emitted += 1
            assert 2 * len(data["pairings"]) == len(data["edges"])
            for face in data["faces_indices"]:
                flat = [i for lp in face[1] for i in lp]
                assert is_face_enclosed(data["edges"], flat, 2e-4)
        assert emitted >= 4


class TestComposite:
    """Multi-feature composite plates (brep_plate_features): mixed
    hole/boss/dome-boss/pocket features on one body — the topology class
    real ABC parts live in (reference handles arbitrary ABC composites
    through OCC, prepare_data.py:268-327)."""

    POLY = np.array([[-1.0, -0.8], [1.0, -0.8], [1.0, 0.8], [-1.0, 0.8]])
    FEATS = [("hole", -0.5, -0.3, 0.18, 0.0),
             ("boss", 0.45, 0.3, 0.22, 0.5),
             ("dome_boss", -0.45, 0.35, 0.2, 0.0),
             ("pocket", 0.5, -0.35, 0.15, 0.25)]

    def test_parse_roundtrip(self):
        text = step21.brep_plate_features(self.POLY, -0.25, 0.25, self.FEATS)
        solid = step21._Resolver(step21.parse_step_text(text)).solids()[0]
        kinds = sorted(f.surface_kind for f in solid.faces)
        # 4 rect walls + bottom + top + boss cap + pocket floor = 8 planes;
        # hole/boss/pocket walls = 3 cylinders; dome = 1 sphere
        assert kinds == [PLANE] * 8 + [CYLINDER] * 3 + [SPHERE]
        # every undirected edge is used exactly twice in opposite senses
        uses = {}
        for f in solid.faces:
            for loop in f.loops:
                for e, o in loop:
                    uses.setdefault(id(e), []).append(o)
        assert all(sorted(v) == [0, 1] for v in uses.values())

    def test_shared_feature_bounds_on_top_face(self):
        text = step21.brep_plate_features(self.POLY, -0.25, 0.25, self.FEATS)
        solid = step21._Resolver(step21.parse_step_text(text)).solids()[0]
        tops = [f for f in solid.faces if f.surface_kind == PLANE
                and len(f.loops) > 1]
        # top face: outer polygon + hole + boss base + dome rim + pocket
        # mouth = 5 bounds; bottom face: outer + hole = 2
        assert sorted(len(f.loops) for f in tops) == [2, 5]

    @pytest.mark.parametrize("loc,focus", [
        ((1, 1, 1), 0.0), ((0.6, -0.9, 0.7), 3.0), ((-0.8, 0.5, 0.9), 3.0)])
    def test_pipeline_valid_topology(self, loc, focus):
        text = step21.brep_plate_features(self.POLY, -0.25, 0.25, self.FEATS)
        topo, data = _pipeline_view(text, loc, focus=focus)
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for face in data["faces_indices"]:
            flat = [i for lp in face[1] for i in lp]
            assert is_face_enclosed(data["edges"], flat, 2e-4)

    def test_random_composites_never_emit_bad_topology(self):
        rng = np.random.default_rng(17)
        emitted = 0
        for i in range(8):
            text = gen_step.random_composite(rng, f"c{i}")
            loc = tuple(rng.normal(size=3))
            try:
                topo, data = _pipeline_view(
                    text, loc, focus=float(rng.choice([0.0, 3.0])))
            except UnsupportedStep:
                continue
            emitted += 1
            assert 2 * len(data["pairings"]) == len(data["edges"])
            for face in data["faces_indices"]:
                flat = [i for lp in face[1] for i in lp]
                assert is_face_enclosed(data["edges"], flat, 2e-4)
        assert emitted >= 6


class TestStepCorpusEndToEnd:
    def test_corpus(self, tmp_path):
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "step"))
        for sub in ("json", "svg", "png", "3view_svg", "3view_png"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        n = 6
        for i in range(n):
            rng = np.random.default_rng(np.random.SeedSequence([11, i]))
            with open(os.path.join(root, "step", f"{i:08d}.step"), "w") as f:
                f.write(gen_step.random_step_solid(rng, f"{i:08d}"))

        args = argparse.Namespace(
            root=root, tol=1e-4, filter_num_shapes=1, filter_num_edges=64,
            location=[1, 1, 1], direction=[1, 1, 1], focus=0.0,
            combine_coedge=False, direction_token=False,
            order_by_position=False, no_face_type=False,
            discretize_last=False, random_camera=True, seed=7,
            width=256, height=256, backend="native")
        for i in range(n):
            prepare_data.render_shape(f"{i:08d}", args)

        names = sorted(os.listdir(os.path.join(root, "json")))
        assert len(names) == n
        for fname in names:
            with open(os.path.join(root, "json", fname)) as f:
                data = json.load(f)
            assert 2 * len(data["pairings"]) == len(data["edges"])
            for face in data["faces_indices"]:
                flat = [i for lp in face[1] for i in lp]
                assert is_face_enclosed(data["edges"], flat, 2e-4)

        # the production dataset consumes it directly
        from faceformer_tpu.config import load_config
        from faceformer_tpu.data.dataset import ABCDatasetParallel

        with open(os.path.join(root, "all.txt"), "w") as f:
            f.write("\n".join(f"json/{n}" for n in names))
        cfg = load_config(opts=[
            "model.num_lines", "160", "model.max_num_faces", "24",
            "model.max_face_length", "32", "root_dir", root])
        ds = ABCDatasetParallel(root, "all.txt", cfg.model)
        assert len(ds) == n
        sample = ds[0]
        assert sample["input"].shape == (160, 50, 2)
        assert sample["label"].shape == (160, 32)
