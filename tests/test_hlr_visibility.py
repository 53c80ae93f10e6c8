"""Native hidden-line visibility: ray-cast occlusion against analytic
faces, the visible-runs splitter, and the CAD-free 3-view render +
similarity-filter pipeline.

Reference gets all of this from OCC HLR's visible compounds
(dataset/filters/3view_render.py:29-105) and clusters the binarized
renders (filter_3view.py:44-84); here the whole chain executes with no
CAD kernel and no cairo."""

import importlib.util
import json
import os

import numpy as np
import pytest

from faceformer_tpu.tools import step21
from faceformer_tpu.tools.hlr_visibility import OcclusionTester, unproject
from faceformer_tpu.tools.occ_pipeline import ProjectionArgs
from faceformer_tpu.tools.step_native import NativeProjector
from faceformer_tpu.tools.svg import rasterize_edges, write_png

_spec = importlib.util.spec_from_file_location(
    "prepare_data_hlr", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "prepare_data.py"))
prepare_data = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(prepare_data)

BOX = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def _tester(text, tmp_path, loc, focus=0.0):
    path = tmp_path / "t.step"
    path.write_text(text)
    solid = step21.read_brep(str(path))[0]
    proj = NativeProjector(ProjectionArgs(location=tuple(loc),
                                          direction=tuple(loc), focus=focus))
    return OcclusionTester(solid, proj), solid


class TestOcclusionGroundTruths:
    def test_box_from_above(self, tmp_path):
        t, _ = _tester(step21.brep_extrusion(BOX, -0.5, 0.5), tmp_path,
                       (0, 0, 1))
        assert not t.occluded([[0.3, 0.2, 0.5], [0.0, 0.0, 0.5]]).any()
        assert t.occluded([[0.3, 0.2, -0.5], [0.0, 0.0, -0.5]]).all()

    def test_hole_is_see_through(self, tmp_path):
        t, _ = _tester(step21.brep_extrusion(BOX, -0.3, 0.3,
                                             holes=[(0.0, 0.0, 0.3)]),
                       tmp_path, (0, 0, 1))
        occ = t.occluded([[0.0, 0.05, -0.3],   # under the hole: visible
                          [0.6, 0.6, -0.3]])   # under the plate: hidden
        assert list(occ) == [False, True]

    def test_cylinder_far_side_hidden(self, tmp_path):
        t, _ = _tester(step21.brep_cylinder(0.7, 1.0), tmp_path, (1, 0, 0))
        occ = t.occluded([[0.7, 0, 0], [-0.7, 0, 0],
                          [0, 0.7, 0], [0, -0.7, 0]])
        assert list(occ) == [False, True, False, False]

    def test_sphere_cap(self, tmp_path):
        t, _ = _tester(step21.brep_dome_block(0.6, 1.0), tmp_path, (1, 0, 0))
        occ = t.occluded([[0, 0, 1.1],        # apex: visible
                          [-0.6, 0, -0.5],    # far bottom rim: hidden
                          [0.6, 0, -0.5]])    # near bottom rim: visible
        assert list(occ) == [False, True, False]

    def test_torus_tube_occludes_inner_ring(self, tmp_path):
        t, _ = _tester(step21.brep_torus(0.8, 0.3), tmp_path, (1, 0, 0))
        occ = t.occluded([[0.5, 0, 0],     # inner equator near side: behind
                          [1.1, 0, 0],     # outer equator near side
                          [-1.1, 0, 0]])   # outer equator far side
        assert list(occ) == [True, False, True]

    def test_extrusion_walls(self, tmp_path):
        from faceformer_tpu.geometry.solids import bezier_star_segments
        segs = bezier_star_segments(np.random.default_rng(5), n=4)
        t, solid = _tester(step21.brep_spline_prism(segs, -0.4, 0.4),
                           tmp_path, (1, 0, 0))
        states = []
        for w in [f for f in solid.faces if f.profile is not None]:
            lo, hi = step21.bspline_domain(w.profile)
            mid = step21.bspline_eval(w.profile, [(lo + hi) / 2])[0] \
                + np.array([0, 0, 0.4])
            states.append((float(mid[0]), bool(t.occluded(mid[None])[0])))
        # walls on the -x side hide behind the +x side ones
        for x, occ in states:
            assert occ == (x < 0)

    def test_revolution_far_meridian_hidden(self, tmp_path):
        vase = step21.brep_vase(np.array([[0.5, 0.0], [0.8, 0.4],
                                          [0.45, 0.8], [0.6, 1.2]]))
        t, solid = _tester(vase, tmp_path, (1, 0, 0))
        band = [f for f in solid.faces
                if f.surface_kind == step21.REVOLUTION][0]
        lo, hi = step21.bspline_domain(band.profile)
        near = step21.bspline_eval(band.profile, np.linspace(lo, hi, 9))[1:-1]
        far = near * np.array([-1, 1, 1])
        assert not t.occluded(near).any()
        assert t.occluded(far).all()

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_patch_roof(self, tmp_path, focus):
        gz = np.array([[0.5, 0.55, 0.5], [0.6, 1.1, 0.6], [0.5, 0.55, 0.5]])
        text = step21.brep_pillow(gz, 0.8, 0.7)
        path = tmp_path / "p.step"
        path.write_text(text)
        solid = step21.read_brep(str(path))[0]
        roof = [f for f in solid.faces
                if f.surface_kind == step21.BSPLINE][0]
        uv = np.stack(np.meshgrid(np.linspace(0.1, 0.9, 4),
                                  np.linspace(0.1, 0.9, 4)), -1).reshape(-1, 2)
        pts = step21.patch_eval(roof.patch, uv)
        above = OcclusionTester(solid, NativeProjector(ProjectionArgs(
            location=(0, 0, 1), direction=(0, 0, 1), focus=focus)))
        below = OcclusionTester(solid, NativeProjector(ProjectionArgs(
            location=(0, 0, -1), direction=(0, 0, -1), focus=focus)))
        assert not above.occluded(pts).any()
        assert below.occluded(pts).all()


class TestRunsAndUnproject:
    def test_visible_runs_split(self, tmp_path):
        # a straight line passing behind a cylinder: the middle samples
        # hide, the ends stay visible -> two runs
        t, _ = _tester(step21.brep_cylinder(0.5, 4.0), tmp_path, (1, 0, 0))
        ys = np.linspace(-2.0, 2.0, 41)
        pts = np.stack([np.full_like(ys, -0.6), ys, np.zeros_like(ys)],
                       axis=1)
        runs = t.visible_runs(pts)
        assert len(runs) == 2
        covered = np.concatenate(runs)
        assert np.all(np.abs(ys[covered]) > 0.3)  # the shadow is excluded

    @pytest.mark.parametrize("focus", [0.0, 3.0])
    def test_unproject_inverts_project(self, focus):
        proj = NativeProjector(ProjectionArgs(
            location=(0.6, -0.9, 0.4), direction=(0.6, -0.9, 0.4),
            focus=focus))
        rng = np.random.default_rng(3)
        world = rng.normal(size=(17, 3))
        cam = proj.project(world)
        np.testing.assert_allclose(unproject(proj, cam), world, atol=1e-9)


class TestThreeViewNative:
    def _args(self, root):
        import argparse
        return argparse.Namespace(
            root=root, tol=1e-4, filter_num_shapes=1, filter_num_edges=64,
            width=256, height=256)

    def test_renders_and_filter_clusters_duplicates(self, tmp_path):
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "step"))
        for sub in ("3view_svg", "3view_png"):
            os.makedirs(os.path.join(root, sub))
        # ids 0 and 1 are the SAME solid; 2 shares topology but not
        # proportions; 3 and 4 duplicate a holed plate
        solids = {
            "00000000": step21.brep_cylinder(0.7, 1.0),
            "00000001": step21.brep_cylinder(0.7, 1.0),
            "00000002": step21.brep_cylinder(0.3, 1.6),
            "00000003": step21.brep_extrusion(BOX, -0.3, 0.3,
                                              holes=[(0.2, 0.1, 0.3)]),
            "00000004": step21.brep_extrusion(BOX, -0.3, 0.3,
                                              holes=[(0.2, 0.1, 0.3)]),
        }
        for name, text in solids.items():
            with open(os.path.join(root, "step", f"{name}.step"), "w") as f:
                f.write(text)
        args = self._args(root)
        for name in solids:
            prepare_data.render_three_views_native(name, args)
        pngs = sorted(os.listdir(os.path.join(root, "3view_png")))
        assert len(pngs) == 20  # 5 solids x 4 views
        # duplicates byte-identical, the distinct solid differs
        views = {}
        for name in ("00000000", "00000001", "00000002"):
            with open(os.path.join(root, "3view_png", f"{name}-1.png"),
                      "rb") as f:
                views[name] = f.read()
        assert views["00000000"] == views["00000001"]
        assert views["00000000"] != views["00000002"]

        # the 3-view filter keeps one id per duplicate cluster
        from faceformer_tpu.tools.filters import filter_3view
        bins = [["00000000", "00000001", "00000002"],
                ["00000003", "00000004"]]
        bins_path = os.path.join(root, "bins.json")
        with open(bins_path, "w") as f:
            json.dump(bins, f)
        out = os.path.join(root, "kept.json")
        filter_3view.main(["--root", root, "--bins", bins_path,
                           "--out", out])
        with open(out) as f:
            kept = json.load(f)
        assert kept == ["00000000", "00000002", "00000003"]

    def test_torus_front_view_hides_about_half(self, tmp_path):
        # the split torus wireframe seen from the front: a solid with real
        # self-occlusion must classify a large share of its edge samples
        # hidden, and the render must still carry the visible share
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "step"))
        for sub in ("3view_svg", "3view_png"):
            os.makedirs(os.path.join(root, sub))
        name = "00000000"
        with open(os.path.join(root, "step", f"{name}.step"), "w") as f:
            f.write(step21.brep_torus(0.8, 0.3))
        prepare_data.render_three_views_native(name, self._args(root))
        import cv2
        vis = cv2.imread(os.path.join(root, "3view_png", f"{name}-1.png"))
        assert vis is not None and int((vis < 255).sum()) > 0
        from faceformer_tpu.tools import step_native
        proj_args = ProjectionArgs(location=(0, 0, 0),
                                   direction=(0.0, -1.0, 0.0), focus=0.0,
                                   tol=1e-4)
        solid, _ = step_native.load_solid(
            os.path.join(root, "step", f"{name}.step"))
        step_native.normalize_solid(solid)
        topo = step_native.NativeTopoMapper(solid, proj_args)
        occ_solid, _ = step_native.load_solid(
            os.path.join(root, "step", f"{name}.step"))
        step_native.normalize_solid(occ_solid)
        projector = NativeProjector(proj_args)
        tester = OcclusionTester(occ_solid, projector, 1e-4)
        n_vis = n_hid = 0
        seen = set()
        for face in topo.all_faces.values():
            for erec in face.edges:
                if erec.key in seen:
                    continue
                seen.add(erec.key)
                occ = tester.occluded(unproject(
                    projector, np.asarray(erec.dedge3d, dtype=float)))
                n_vis += int((~occ).sum())
                n_hid += int(occ.sum())
        assert n_hid > 0.25 * (n_vis + n_hid)
        assert n_vis > 0.25 * (n_vis + n_hid)


class TestRasterizer:
    def test_png_roundtrip(self, tmp_path):
        img = rasterize_edges([[[0.0, 0.0], [1.0, 1.0]],
                               [[0.0, 1.0], [1.0, 0.0]]], 64, 64)
        path = os.path.join(str(tmp_path), "x.png")
        write_png(img, path)
        import cv2
        back = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(back, img)
