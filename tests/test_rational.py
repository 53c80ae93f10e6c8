"""Rational (NURBS) B-spline support in the native STEP backend:
homogeneous de Boor evaluation, quotient-rule derivatives, exact
circle/cylinder recognition, and the rational writers.

Real ABC STEP exports encode circles, fillets, and revolved blends as
rational NURBS (the reference reads them through OCC,
dataset/utils/read_step_file.py:9 -> Geom_BSplineCurve/Surface); here
they resolve with no CAD kernel. Recognition converts the
exporter-encoded analytic shapes back to CIRCLE/CYLINDRICAL_SURFACE so
the downstream silhouette machinery follows the exact analytic path —
the predictions must match the natively-analytic encoding bit-for-bit
modulo float noise.
"""

import argparse
import importlib.util
import os

import numpy as np
import pytest

from faceformer_tpu.geometry.enclosedness import is_face_enclosed
from faceformer_tpu.tools import step21, step_native
from faceformer_tpu.tools.occ_pipeline import ProjectionArgs
from faceformer_tpu.tools.step21 import (
    BSPLINE, CYLINDER, PLANE, BCurve, BPatch, bspline_domain, bspline_eval,
    bspline_hodograph, bspline_reversed, expand_knots, nurbs_circle_net,
    patch_boundary_curve, patch_eval, patch_partials)
from faceformer_tpu.tools.step_native import NativeTopoMapper

_spec = importlib.util.spec_from_file_location(
    "prepare_data_rational", os.path.join(os.path.dirname(__file__), "..",
                                          "tools", "prepare_data.py"))
prepare_data = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(prepare_data)


def _gen_args(**over):
    base = dict(combine_coedge=False, direction_token=False,
                order_by_position=False, no_face_type=False, tol=1e-4)
    base.update(over)
    return argparse.Namespace(**base)


def _pipeline_view(text, location, focus=0.0):
    solid = step21._Resolver(step21.parse_step_text(text)).solids()[0]
    step_native.normalize_solid(solid)
    proj = ProjectionArgs(location=tuple(location), direction=tuple(location),
                          focus=focus, tol=1e-4)
    topo = NativeTopoMapper(solid, proj)
    return prepare_data.assemble_json(topo, _gen_args(), "t")


def _quarter_circle() -> BCurve:
    w = np.sqrt(2.0) / 2.0
    return BCurve("bspline",
                  ctrl=np.array([[1.0, 0, 0], [1.0, 1, 0], [0.0, 1, 0]]),
                  knots=np.array([0.0, 0, 0, 1, 1, 1]), degree=2,
                  weights=np.array([1.0, w, 1.0]))


class TestRationalEval:
    def test_quarter_circle_is_exact(self):
        c = _quarter_circle()
        pts = bspline_eval(c, np.linspace(0, 1, 33))
        r = np.linalg.norm(pts, axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-14)

    def test_derivative_matches_finite_differences(self):
        c = _quarter_circle()
        d = bspline_hodograph(c)
        assert d.kind == "rational_deriv"
        eps = 1e-6
        for t in (0.1, 0.37, 0.5, 0.83):
            fd = (bspline_eval(c, t + eps)[0]
                  - bspline_eval(c, t - eps)[0]) / (2 * eps)
            np.testing.assert_allclose(bspline_eval(d, t)[0], fd, atol=1e-5)

    def test_reversed_traverses_same_points(self):
        c = _quarter_circle()
        r = bspline_reversed(c)
        lo, hi = bspline_domain(c)
        ts = np.linspace(lo, hi, 9)
        np.testing.assert_allclose(
            bspline_eval(r, (lo + hi) - ts), bspline_eval(c, ts), atol=1e-14)

    def test_full_circle_net(self):
        ctrl, wts, knots, mults = nurbs_circle_net([0.2, -0.1, 0.5], 0.7)
        c = BCurve("bspline", ctrl=ctrl, knots=expand_knots(knots, mults),
                   degree=2, weights=wts)
        pts = bspline_eval(c, np.linspace(0, 1, 65))
        r = np.linalg.norm(pts - np.array([0.2, -0.1, 0.5]), axis=1)
        np.testing.assert_allclose(r, 0.7, atol=1e-14)


class TestRecognition:
    def test_full_circle_recognized(self):
        ctrl, wts, knots, mults = nurbs_circle_net([0, 0, 0.3], 0.7)
        c = BCurve("bspline", ctrl=ctrl, knots=expand_knots(knots, mults),
                   degree=2, weights=wts)
        rec = step21._recognize_circle(c)
        assert rec is not None and rec.kind == "circle"
        np.testing.assert_allclose(rec.radius, 0.7, atol=1e-12)
        np.testing.assert_allclose(rec.frame.origin, [0, 0, 0.3], atol=1e-12)
        np.testing.assert_allclose(rec.frame.z, [0, 0, 1], atol=1e-9)
        np.testing.assert_allclose(rec.frame.x, [1, 0, 0], atol=1e-9)

    def test_clockwise_arc_flips_normal(self):
        # reverse the quarter circle: traversal is CW around +z, so the
        # recognized frame's z must flip to keep CCW semantics
        rec = step21._recognize_circle(bspline_reversed(_quarter_circle()))
        assert rec is not None
        np.testing.assert_allclose(rec.frame.z, [0, 0, -1], atol=1e-9)
        np.testing.assert_allclose(rec.frame.x, [0, 1, 0], atol=1e-9)

    def test_non_circular_rational_not_recognized(self):
        c = _quarter_circle()
        c = BCurve("bspline", ctrl=c.ctrl * np.array([2.0, 1.0, 1.0]),
                   knots=c.knots, degree=2, weights=c.weights)  # ellipse
        assert step21._recognize_circle(c) is None

    def test_polynomial_circle_approx_not_recognized(self):
        # a cubic LSQ fit to a quarter arc is close but never exact
        ts = np.linspace(0, np.pi / 2, 4)
        ctrl = np.stack([np.cos(ts), np.sin(ts), np.zeros_like(ts)], axis=1)
        c = BCurve("bspline", ctrl=ctrl,
                   knots=expand_knots([0.0, 1.0], [4, 4]), degree=3,
                   weights=np.array([1.0, 1.2, 1.2, 1.0]))
        assert step21._recognize_circle(c) is None


class TestRationalPatch:
    def _patch(self):
        rng = np.random.default_rng(2)
        grid = rng.normal(size=(4, 4, 3))
        w = np.ones((4, 4))
        w[1:-1, 1:-1] = 2.5
        k = expand_knots([0.0, 1.0], [4, 4])
        return BPatch(grid, 3, 3, k.copy(), k.copy(), weights=w)

    def test_eval_matches_homogeneous_by_hand(self):
        p = self._patch()
        uvs = np.array([[0.3, 0.7], [0.0, 0.0], [1.0, 0.45]])
        hom = p.hom_grid()
        for uv in uvs:
            # collapse u then v on the homogeneous net, textbook order
            rows = np.stack([
                step21.bspline_eval_raw(hom[:, j], p.uknots, 3, [uv[0]])[0]
                for j in range(hom.shape[1])])
            h = step21.bspline_eval_raw(rows, p.vknots, 3, [uv[1]])[0]
            want = h[:3] / h[3]
            np.testing.assert_allclose(
                patch_eval(p, [uv])[0], want, atol=1e-12)

    def test_partials_match_finite_differences(self):
        p = self._patch()
        su, sv = patch_partials(p)
        eps = 1e-6
        for uv in [(0.2, 0.3), (0.77, 0.52), (0.5, 0.9)]:
            u, v = uv
            fdu = (patch_eval(p, [(u + eps, v)])[0]
                   - patch_eval(p, [(u - eps, v)])[0]) / (2 * eps)
            fdv = (patch_eval(p, [(u, v + eps)])[0]
                   - patch_eval(p, [(u, v - eps)])[0]) / (2 * eps)
            np.testing.assert_allclose(patch_eval(su, [uv])[0], fdu, atol=1e-5)
            np.testing.assert_allclose(patch_eval(sv, [uv])[0], fdv, atol=1e-5)

    def test_boundary_curves_carry_weights(self):
        p = self._patch()
        for side, want in [("u0", p.weights[0]), ("u1", p.weights[-1]),
                           ("v0", p.weights[:, 0]), ("v1", p.weights[:, -1])]:
            bc = patch_boundary_curve(p, side)
            np.testing.assert_allclose(bc.weights, want)


class TestNurbsCylinderRoundTrip:
    def test_parses_to_analytic_faces(self, tmp_path):
        path = tmp_path / "nc.step"
        path.write_text(step21.brep_nurbs_cylinder(0.7, 1.1))
        solid = step21.read_brep(str(path))[0]
        kinds = sorted(f.surface_kind for f in solid.faces)
        assert kinds == [PLANE, PLANE, CYLINDER]
        wall = [f for f in solid.faces if f.surface_kind == CYLINDER][0]
        np.testing.assert_allclose(wall.radius, 0.7, atol=1e-12)
        np.testing.assert_allclose(np.abs(wall.frame.z), [0, 0, 1],
                                   atol=1e-9)
        # cap bounds resolved to analytic circles (recognition, not NURBS)
        for f in solid.faces:
            if f.surface_kind == PLANE:
                assert [e.curve.kind for e, _ in f.loops[0]] == ["circle"]

    @pytest.mark.parametrize("loc,focus", [
        ((1, 1, 1), 0.0), ((0.6, -0.9, 0.4), 3.0), ((0.2, 1.0, 0.3), 0.0)])
    def test_json_matches_analytic_cylinder(self, loc, focus):
        d1 = _pipeline_view(step21.brep_cylinder(0.7, 1.1), loc, focus=focus)
        d2 = _pipeline_view(step21.brep_nurbs_cylinder(0.7, 1.1), loc,
                            focus=focus)
        assert d1["faces_indices"] == d2["faces_indices"]
        assert d1["pairings"] == d2["pairings"]
        assert len(d1["edges"]) == len(d2["edges"])
        for a, b in zip(d1["edges"], d2["edges"]):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-9)


class TestRationalPillow:
    GZ = np.array([[0.5, 0.55, 0.5], [0.6, 1.1, 0.6], [0.5, 0.55, 0.5]])

    def test_reads_as_rational_patch(self, tmp_path):
        path = tmp_path / "rp.step"
        path.write_text(step21.brep_pillow(self.GZ, 0.8, 0.7,
                                           interior_weight=2.5))
        solid = step21.read_brep(str(path))[0]
        roof = [f for f in solid.faces if f.surface_kind == BSPLINE][0]
        assert roof.patch is not None and roof.patch.weights is not None
        np.testing.assert_allclose(roof.patch.weights[1, 1], 2.5)
        # boundary weights are 1 -> boundary iso-curves equal the wall's
        # polynomial rim edges (watertightness)
        bc = patch_boundary_curve(roof.patch, "v0")
        np.testing.assert_allclose(bc.weights, 1.0)

    @pytest.mark.parametrize("w", [0.4, 2.5])
    def test_splits_to_valid_topology(self, w):
        text = step21.brep_pillow(self.GZ, 0.8, 0.7, interior_weight=w)
        data = _pipeline_view(text, (0.6, -0.9, 0.4), focus=3.0)
        assert 2 * len(data["pairings"]) == len(data["edges"])
        for face in data["faces_indices"]:
            flat = [i for lp in face[1] for i in lp]
            assert is_face_enclosed(data["edges"], flat, 2e-4)

    def test_weight_changes_the_silhouette(self):
        # the weight genuinely deforms the surface: silhouette edge sets
        # from the same view must differ between weights
        views = {}
        for w in (0.4, 2.5):
            text = step21.brep_pillow(self.GZ, 0.8, 0.7, interior_weight=w)
            data = _pipeline_view(text, (0.6, -0.9, 0.4), focus=3.0)
            views[w] = sorted(f[0] for f in data["faces_indices"])
        assert views[0.4] != views[2.5]
