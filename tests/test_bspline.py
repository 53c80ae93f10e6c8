"""Non-rational B-spline support in the native STEP backend: de Boor
evaluation, B_SPLINE_CURVE_WITH_KNOTS / B_SPLINE_SURFACE_WITH_KNOTS /
SURFACE_OF_LINEAR_EXTRUSION resolution, and the spline-prism writer.

The reference reads these entities through OCC (read_step_file.py:9 ->
Geom_BSplineCurve/Surface adaptors); here they resolve with no CAD
kernel and the extrusion walls carry the freeform profile analytically.
"""

from math import comb

import numpy as np
import pytest

from faceformer_tpu.tools import step21
from faceformer_tpu.tools.step21 import (
    BSPLINE, EXTRUSION, PLANE, BCurve, UnsupportedStep,
    bspline_domain, bspline_eval, bspline_hodograph, bspline_reversed,
    expand_knots)


def _naive_basis(i, p, knots, t):
    """Cox-de Boor recursion, the textbook definition."""
    if p == 0:
        return 1.0 if knots[i] <= t < knots[i + 1] else 0.0
    out = 0.0
    den = knots[i + p] - knots[i]
    if den > 1e-12:
        out += (t - knots[i]) / den * _naive_basis(i, p - 1, knots, t)
    den = knots[i + p + 1] - knots[i + 1]
    if den > 1e-12:
        out += (knots[i + p + 1] - t) / den * _naive_basis(i + 1, p - 1, knots, t)
    return out


def _bezier(rng, k=4):
    ctrl = rng.normal(size=(k, 3))
    knots = expand_knots([0.0, 1.0], [k, k])
    return BCurve("bspline", ctrl=ctrl, knots=knots, degree=k - 1)


class TestDeBoor:
    def test_cubic_bezier_matches_bernstein(self):
        rng = np.random.default_rng(0)
        c = _bezier(rng)
        ts = np.linspace(0.0, 1.0, 17)
        bern = sum(
            np.outer(comb(3, i) * ts ** i * (1 - ts) ** (3 - i), c.ctrl[i])
            for i in range(4))
        np.testing.assert_allclose(bspline_eval(c, ts), bern, atol=1e-12)

    def test_multispan_matches_naive_recursion(self):
        rng = np.random.default_rng(1)
        ctrl = rng.normal(size=(6, 3))
        knots = expand_knots([0.0, 0.4, 0.7, 1.0], [4, 1, 1, 4])
        c = BCurve("bspline", ctrl=ctrl, knots=knots, degree=3)
        ts = np.linspace(0.01, 0.99, 23)  # interior (naive is half-open at 1)
        want = np.stack([
            sum(_naive_basis(i, 3, knots, t) * ctrl[i] for i in range(6))
            for t in ts])
        np.testing.assert_allclose(bspline_eval(c, ts), want, atol=1e-12)

    def test_clamped_endpoints_are_end_control_points(self):
        rng = np.random.default_rng(2)
        c = _bezier(rng, k=5)
        lo, hi = bspline_domain(c)
        ends = bspline_eval(c, [lo, hi])
        np.testing.assert_allclose(ends[0], c.ctrl[0], atol=1e-12)
        np.testing.assert_allclose(ends[-1], c.ctrl[-1], atol=1e-12)

    def test_hodograph_matches_finite_differences(self):
        rng = np.random.default_rng(3)
        ctrl = rng.normal(size=(6, 3))
        knots = expand_knots([0.0, 0.5, 1.0], [4, 2, 4])
        c = BCurve("bspline", ctrl=ctrl, knots=knots, degree=3)
        d = bspline_hodograph(c)
        assert d.degree == 2
        eps = 1e-6
        for t in (0.12, 0.31, 0.62, 0.88):
            fd = (bspline_eval(c, t + eps)[0] - bspline_eval(c, t - eps)[0]) / (2 * eps)
            np.testing.assert_allclose(bspline_eval(d, t)[0], fd, atol=1e-5)

    def test_reversed_traverses_same_points(self):
        rng = np.random.default_rng(4)
        c = _bezier(rng, k=6)
        r = bspline_reversed(c)
        lo, hi = bspline_domain(c)
        ts = np.linspace(lo, hi, 9)
        np.testing.assert_allclose(
            bspline_eval(r, (lo + hi) - ts), bspline_eval(c, ts), atol=1e-12)


from faceformer_tpu.geometry.solids import bezier_star_segments as _star_segments  # noqa: E402


class TestSplinePrismRoundTrip:
    def test_roundtrip_structure(self, tmp_path):
        rng = np.random.default_rng(5)
        segs = _star_segments(rng, n=4)
        text = step21.brep_spline_prism(segs, -0.4, 0.4, name="blob")
        path = tmp_path / "blob.step"
        path.write_text(text)
        solids = step21.read_brep(str(path))
        assert len(solids) == 1
        faces = solids[0].faces
        assert len(faces) == 6  # 4 walls + 2 caps
        walls = [f for f in faces if f.surface_kind == BSPLINE]
        caps = [f for f in faces if f.surface_kind == PLANE]
        assert len(walls) == 4 and len(caps) == 2
        for w in walls:
            assert w.profile is not None and w.profile.kind == "bspline"
            np.testing.assert_allclose(w.extrude, [0.0, 0.0, 0.8], atol=1e-9)
            # the wall's profile curve IS its bottom spline edge's curve
            bot = [e for e, _ in w.loops[0] if e.curve.kind == "bspline"
                   and abs(float(e.v0.point[2]) + 0.4) < 1e-9]
            assert len(bot) == 1
            ts = np.linspace(*bspline_domain(w.profile), 7)
            np.testing.assert_allclose(
                bspline_eval(w.profile, ts),
                bspline_eval(bot[0].curve, ts), atol=1e-9)

    def test_shared_topology(self, tmp_path):
        rng = np.random.default_rng(6)
        segs = _star_segments(rng, n=3)
        path = tmp_path / "b.step"
        path.write_text(step21.brep_spline_prism(segs, 0.0, 1.0))
        solid = step21.read_brep(str(path))[0]
        # each bottom spline edge is used by exactly one wall and the cap
        ids = {}
        for f in solid.faces:
            for loop in f.loops:
                for e, _ in loop:
                    ids.setdefault(id(e), []).append(f)
        assert all(len(v) == 2 for v in ids.values())


class TestSurfaceOfLinearExtrusion:
    def test_resolves_like_bspline_surface(self, tmp_path):
        rng = np.random.default_rng(7)
        segs = _star_segments(rng, n=3)
        b = step21.StepBuilder()

        def lift(seg, z):
            return np.concatenate([seg, np.full((len(seg), 1), z)], axis=1)

        def sole(ctrl3, delta):
            pts = ",".join(b.point(p) for p in ctrl3)
            curve = b.emit(
                f"B_SPLINE_CURVE_WITH_KNOTS('',3,({pts}),"
                ".UNSPECIFIED.,.F.,.F.,(4,4),(0.,1.),.UNSPECIFIED.)")
            vec = b.emit(
                f"VECTOR('',{b.direction(delta)},"
                f"{b._fmt(np.linalg.norm(delta))})")
            return b.emit(f"SURFACE_OF_LINEAR_EXTRUSION('',{curve},{vec})")

        delta = np.array([0.0, 0.0, 0.9])
        bot = [b.bspline_edge(lift(s, 0.0), 3, (0.0, 1.0), (4, 4)) for s in segs]
        top = [b.bspline_edge(lift(s, 0.9), 3, (0.0, 1.0), (4, 4)) for s in segs]
        ups = [b.line_edge(lift(s, 0.0)[0], lift(s, 0.9)[0]) for s in segs]
        faces = []
        for i in range(3):
            j = (i + 1) % 3
            loop = [(bot[i], True), (ups[j], True), (top[i], False), (ups[i], False)]
            faces.append(b.face([loop], sole(lift(segs[i], 0.0), delta)))
        faces.append(b.face([[(e, False) for e in bot[::-1]]],
                            b.plane(np.zeros(3), [0, 0, -1])))
        faces.append(b.face([[(e, True) for e in top]],
                            b.plane(np.array([0, 0, 0.9]), [0, 0, 1])))
        b.solid(faces)
        path = tmp_path / "sole.step"
        path.write_text(b.text())
        solid = step21.read_brep(str(path))[0]
        walls = [f for f in solid.faces if f.surface_kind == EXTRUSION]
        assert len(walls) == 3
        for w in walls:
            np.testing.assert_allclose(w.extrude, delta, atol=1e-9)
            assert w.profile.kind == "bspline"


class TestRejections:
    _HEADER = ("ISO-10303-21;\nHEADER;\nFILE_DESCRIPTION((''),'2;1');\n"
               "FILE_NAME('','',(''),(''),'','','');\nFILE_SCHEMA(('X'));\n"
               "ENDSEC;\nDATA;\n")
    _FOOTER = "\nENDSEC;\nEND-ISO-10303-21;\n"

    def test_rational_complex_curve_resolves(self):
        # Historically rejected; rational (NURBS) curves now evaluate
        # through homogeneous de Boor (tests/test_rational.py carries the
        # geometry contracts). This pins the complex-instance PARSE path:
        # weight 0.7 at the middle control point pulls the curve toward it
        # relative to the polynomial Bezier.
        txt = self._HEADER + "\n".join([
            "#1 = CARTESIAN_POINT('',(0.,0.,0.)) ;",
            "#2 = CARTESIAN_POINT('',(1.,0.,0.)) ;",
            "#3 = CARTESIAN_POINT('',(1.,1.,0.)) ;",
            "#4 = VERTEX_POINT('',#1) ;",
            "#5 = VERTEX_POINT('',#3) ;",
            "#6 = ( B_SPLINE_CURVE(2,(#1,#2,#3),.UNSPECIFIED.,.F.,.F.) "
            "B_SPLINE_CURVE_WITH_KNOTS((3,3),(0.,1.),.UNSPECIFIED.) "
            "RATIONAL_B_SPLINE_CURVE((1.,0.7,1.)) CURVE() ) ;",
            "#7 = EDGE_CURVE('',#4,#5,#6,.T.) ;",
        ]) + self._FOOTER
        res = step21._Resolver(step21.parse_step_text(txt))
        edge = res.edge(7)
        assert edge.curve.kind == "bspline"
        np.testing.assert_allclose(edge.curve.weights, [1.0, 0.7, 1.0])
        mid = bspline_eval(edge.curve, [0.5])[0]
        w = 0.7
        want = (0.25 * np.array([0., 0, 0]) + 0.5 * w * np.array([1., 0, 0])
                + 0.25 * np.array([1., 1, 0])) / (0.25 + 0.5 * w + 0.25)
        np.testing.assert_allclose(mid, want, atol=1e-12)

    def test_uniform_weights_divide_out(self):
        txt = self._HEADER + "\n".join([
            "#1 = CARTESIAN_POINT('',(0.,0.,0.)) ;",
            "#2 = CARTESIAN_POINT('',(1.,0.,0.)) ;",
            "#3 = CARTESIAN_POINT('',(1.,1.,0.)) ;",
            "#4 = VERTEX_POINT('',#1) ;",
            "#5 = VERTEX_POINT('',#3) ;",
            "#6 = ( B_SPLINE_CURVE(2,(#1,#2,#3),.UNSPECIFIED.,.F.,.F.) "
            "B_SPLINE_CURVE_WITH_KNOTS((3,3),(0.,1.),.UNSPECIFIED.) "
            "RATIONAL_B_SPLINE_CURVE((2.,2.,2.)) CURVE() ) ;",
            "#7 = EDGE_CURVE('',#4,#5,#6,.T.) ;",
        ]) + self._FOOTER
        res = step21._Resolver(step21.parse_step_text(txt))
        assert res.edge(7).curve.weights is None  # plain polynomial path

    def test_trimmed_spline_edge_raises(self):
        txt = self._HEADER + "\n".join([
            "#1 = CARTESIAN_POINT('',(0.,0.,0.)) ;",
            "#2 = CARTESIAN_POINT('',(1.,0.,0.)) ;",
            "#3 = CARTESIAN_POINT('',(2.,1.,0.)) ;",
            "#4 = CARTESIAN_POINT('',(3.,1.,0.)) ;",
            "#5 = CARTESIAN_POINT('',(0.5,0.1,0.)) ;",  # off the curve end
            "#6 = VERTEX_POINT('',#5) ;",
            "#7 = VERTEX_POINT('',#4) ;",
            "#8 = B_SPLINE_CURVE_WITH_KNOTS('',3,(#1,#2,#3,#4),"
            ".UNSPECIFIED.,.F.,.F.,(4,4),(0.,1.),.UNSPECIFIED.) ;",
            "#9 = EDGE_CURVE('',#6,#7,#8,.T.) ;",
        ]) + self._FOOTER
        res = step21._Resolver(step21.parse_step_text(txt))
        with pytest.raises(UnsupportedStep, match="trimmed"):
            res.edge(9)

    def test_doubly_curved_surface_resolves_as_patch(self, tmp_path):
        # Historically this warp raised UnsupportedStep("doubly-curved");
        # since _PatchSplitter (step_native.py) landed, a wall whose
        # control grid is no longer a translate of its profile resolves
        # as a general B-spline patch (f.patch set, no extrusion profile)
        # instead of being rejected. Reference reads the same class via
        # OCC HLR on GeomAbs_BSplineSurface faces (TopoMapper.py:38-83).
        rng = np.random.default_rng(8)
        segs = _star_segments(rng, n=3)
        text = step21.brep_spline_prism(segs, 0.0, 1.0)
        # bend one wall's second control row so it is no longer a
        # translate of the first (the surface becomes doubly curved)
        marker = "B_SPLINE_SURFACE_WITH_KNOTS"
        lines = text.splitlines()
        for i, ln in enumerate(lines):
            if marker in ln:
                # swap the v-row order of the FIRST grid pair: (#a,#b) ->
                # (#b,#a) breaks the constant-delta check for that row only
                head, grid = ln.split(",((", 1)
                pair, rest = grid.split(")", 1)
                a, bb = pair.split(",")
                lines[i] = head + ",((" + bb + "," + a + ")" + rest
                break
        path = tmp_path / "warp.step"
        path.write_text("\n".join(lines))
        solid = step21.read_brep(str(path))[0]
        walls = [f for f in solid.faces if f.surface_kind == BSPLINE]
        assert len(walls) == 3
        patched = [w for w in walls if w.patch is not None]
        ruled = [w for w in walls if w.profile is not None]
        assert len(patched) == 1 and len(ruled) == 2
        assert patched[0].profile is None  # general patch, not an extrusion
