"""Dataset-tooling tests: synthetic generation, integrity check, splits,
filters, SVG rendering."""

import json
import os

import numpy as np
import pytest

from faceformer_tpu.tools.check_faces_enclosed import check_dataset, check_sample
from faceformer_tpu.tools.filters.filter_length import filter_length, sequence_length
from faceformer_tpu.tools.filters.filter_topology import bin_by_topology, topology_feature
from faceformer_tpu.tools.objio import load_obj, scale_to_unit_sphere
from faceformer_tpu.tools.svg import render_svg, render_svg_groups
from faceformer_tpu.tools.synthetic_data import generate, prepare_splits


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    generate(root, num=12, seed=11)
    return root


class TestSyntheticData:
    def test_layout(self, dataset_root):
        assert len(os.listdir(os.path.join(dataset_root, "json"))) == 12
        for split in ("train.txt", "valid.txt", "test.txt"):
            assert os.path.exists(os.path.join(dataset_root, split))

    def test_split_coverage(self, dataset_root):
        names = set()
        for split in ("train.txt", "valid.txt", "test.txt"):
            with open(os.path.join(dataset_root, split)) as f:
                names.update(line.strip() for line in f if line.strip())
        assert len(names) == 12

    def test_split_deterministic(self, tmp_path):
        names = [f"{i:08d}" for i in range(20)]
        prepare_splits(str(tmp_path), names, seed=42)
        first = open(tmp_path / "train.txt").read()
        prepare_splits(str(tmp_path), names, seed=42)
        assert open(tmp_path / "train.txt").read() == first


class TestIntegrityCheck:
    def test_clean_dataset_passes(self, dataset_root):
        assert check_dataset(dataset_root, tol=3e-4) == []

    def test_corrupt_sample_fails(self, dataset_root, tmp_path):
        name = sorted(os.listdir(os.path.join(dataset_root, "json")))[0]
        with open(os.path.join(dataset_root, "json", name)) as f:
            data = json.load(f)
        # swap two indices inside a face loop to break the chain; without a
        # >=3-edge loop the sample stays pristine and asserting it invalid
        # would blame the checker for a fixture quirk
        entry = data["faces_indices"][0]
        loops = entry[1] if isinstance(entry[0], int) else entry
        if len(loops[0]) < 3:
            pytest.skip("first face's first loop too short to corrupt")
        loops[0][0], loops[0][1] = loops[0][1], loops[0][0]
        os.makedirs(tmp_path / "json")
        bad_path = tmp_path / "json" / name
        with open(bad_path, "w") as f:
            json.dump(data, f)
        assert not check_sample(str(bad_path), 3e-4)


class TestIntegrityCheckFlavors:
    """Every dataset flavor must validate from disk (the reference checker
    only supports directed coedges; combined/dirtok corpora crash it or
    report every sample bad)."""

    FLAVOR_KW = {
        "combined": dict(coedge=False),
        "direction_token": dict(coedge=False, direction_token=True),
        "coedge_untyped": dict(no_face_type=True),
    }

    @pytest.fixture(scope="class", params=sorted(FLAVOR_KW))
    def flavored_root(self, tmp_path_factory, request):
        root = str(tmp_path_factory.mktemp(request.param))
        generate(root, num=8, seed=13, profile="rich",
                 **self.FLAVOR_KW[request.param])
        return root

    def test_clean_corpus_passes(self, flavored_root):
        assert check_dataset(flavored_root, tol=3e-4) == []

    def test_corrupt_sample_fails(self, flavored_root, tmp_path):
        json_dir = os.path.join(flavored_root, "json")
        # pick a sample with a multi-edge face, break it by dropping one
        # OPEN edge token (a closed-curve edge has equal endpoints and its
        # removal keeps all vertex degrees even, which the set-based
        # combined check rightly accepts)
        for name in sorted(os.listdir(json_dir)):
            with open(os.path.join(json_dir, name)) as f:
                data = json.load(f)
            edges = data["edges"]

            def is_open(tok):
                i = tok[0] if isinstance(tok, list) else tok
                e = edges[i]
                return abs(e[0][0] - e[-1][0]) > 1e-3 or abs(e[0][1] - e[-1][1]) > 1e-3

            for entry in data["faces_indices"]:
                if entry and isinstance(entry[0], int):       # combined: flat list
                    face = entry
                else:                                          # loops (pairs or ints)
                    face = max(entry, key=len)
                open_positions = [k for k, tok in enumerate(face) if is_open(tok)]
                if len(face) >= 4 and open_positions:
                    del face[open_positions[0]]
                    os.makedirs(tmp_path / "json", exist_ok=True)
                    bad = tmp_path / "json" / name
                    with open(bad, "w") as f:
                        json.dump(data, f)
                    flavor = json.load(open(os.path.join(flavored_root, "meta.json")))["flavor"]
                    assert not check_sample(str(bad), 3e-4, flavor=flavor)
                    return
        pytest.fail("no sample with a >=4-edge face in the fixture corpus")


class TestFilters:
    def test_sequence_length(self):
        assert sequence_length([[0, 1, 2], [3, 4]]) == 1 + 4 + 3

    def test_filter_length(self, dataset_root):
        names = [os.path.splitext(n)[0]
                 for n in os.listdir(os.path.join(dataset_root, "json"))]
        kept = filter_length(dataset_root, names, face_seq_max=10_000,
                             num_edge_max=10_000)
        assert kept == names
        assert filter_length(dataset_root, names, face_seq_max=2, num_edge_max=2) == []

    def test_topology_binning(self):
        stats = [
            {"#edges": 12, "#parts": 1, "#sharp": 12, "#surfs": 6,
             "curves": ["Line"] * 12, "surfs": ["Plane"] * 6},
            {"#edges": 12, "#parts": 1, "#sharp": 12, "#surfs": 6,
             "curves": ["Line"] * 12, "surfs": ["Plane"] * 6},
            {"#edges": 6, "#parts": 1, "#sharp": 6, "#surfs": 4,
             "curves": ["Line", "Line", "Circle", "Circle", "Line", "Line"],
             "surfs": ["Plane", "Plane", "Cylinder", "Cylinder"]},
        ]
        features = [topology_feature(s) for s in stats]
        bins = bin_by_topology(features, ["a", "b", "c"], threshold=0.0)
        assert sorted(sorted(b) for b in bins) == [["a", "b"], ["c"]]


class TestObjIO:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "m.obj")
        with open(path, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 2 0\nf 1 2 3\n")
        verts, faces = load_obj(path)
        assert verts.shape == (3, 3)
        assert faces == [[0, 1, 2]]
        unit = scale_to_unit_sphere(verts)
        extent = unit.max(axis=0) - unit.min(axis=0)
        assert np.linalg.norm(extent) == pytest.approx(2.0)


class TestSVG:
    def test_render(self):
        svg = render_svg([[[0.0, 0.0], [1.0, 0.0]], [[1.0, 0.0], [1.0, 1.0]]])
        assert svg.startswith("<svg") and svg.endswith("</svg>")
        assert svg.count("<polyline") == 2

    def test_groups(self):
        svg = render_svg_groups([[[[0.0, 0.0], [1.0, 0.0]]], [[[1.0, 0.0], [1.0, 1.0]]]])
        assert svg.count("<polyline") == 2


class TestPredictCLI:
    def test_label_free_prediction(self, tmp_path, tiny_model_cfg):
        import json

        from faceformer_tpu.config import Config, DecodeConfig, TrainerConfig
        from faceformer_tpu.geometry.fixtures import random_sample
        from faceformer_tpu.tools.predict import predict_faces
        from faceformer_tpu.train.trainer import Harness

        cfg = Config(
            model_class="SurfaceFormer_Parallel",
            dataset_class="ABCDataset_Parallel",
            batch_size_valid=2,
            trainer=TrainerConfig(num_devices=2, precision="fp32"),
            model=tiny_model_cfg,
            decode=DecodeConfig(mode="causal_cache", precision="fp32"),
        )
        harness = Harness(cfg)
        state = harness.init_state()
        rng = np.random.default_rng(5)
        samples = [random_sample(rng) for _ in range(3)]
        preds = predict_faces(harness, state["params"], samples)
        assert len(preds) == 3
        for faces in preds:
            for ftype, indices in faces:
                assert isinstance(indices, tuple)


class TestSampleStats:
    def test_face_lengths_typed_coedge(self):
        # regression: [type, loops] faces were measured as len(face)==2,
        # silently disabling the max_face_len acceptance filter
        from faceformer_tpu.tools.synthetic_data import sample_stats

        sample = {"edges": [[[0, 0], [1, 1]]] * 6,
                  "faces_indices": [[0, [[0, 1, 2], [3, 4]]], [1, [[5]]]]}
        st = sample_stats(sample, direction_token=False)
        assert st["max_face_len"] == 5
        assert st["label_len"] == (5 + 1) + (1 + 1) + 1

    def test_face_lengths_combined_flat(self):
        from faceformer_tpu.tools.synthetic_data import sample_stats

        sample = {"edges": [[[0, 0], [1, 1]]] * 4,
                  "faces_indices": [[0, 1, 2, 3], [1, 2]]}
        st = sample_stats(sample, direction_token=False)
        assert st["max_face_len"] == 4

    def test_face_lengths_direction_token(self):
        from faceformer_tpu.tools.synthetic_data import sample_stats

        sample = {"edges": [[[0, 0], [1, 1]]] * 3,
                  "faces_indices": [[[(0, 0), (1, 1)], [(2, 0)]]]}
        st = sample_stats(sample, direction_token=True)
        assert st["max_face_len"] == 6


class TestAnalyzeFamily:
    """tools/analyze_family.py: metric contract + deterministic family
    recovery from the generator's per-solid seed sequence."""

    def test_sample_metrics_contract(self):
        from tools.analyze_family import sample_metrics

        rec = {
            "pred_faces": [[0, [1, 2]], [2, [3]], [0, [9]]],
            "label_faces": [[0, [2, 1]], [1, [3]], [0, [4, 5]]],
        }
        m = sample_metrics(rec)
        # two pred edge-sets match labels, one of those with the right type
        assert m["precision"] == pytest.approx(2 / 3)
        assert m["recall"] == pytest.approx(2 / 3)
        assert m["type_acc"] == pytest.approx(1 / 2)
        assert not m["empty_pred"]
        assert sample_metrics({"pred_faces": [], "label_faces": [[0, [1]]]})[
            "empty_pred"]

    def test_family_recovery_matches_generator(self, tmp_path):
        """family_of(seed, i) names the family whose writer actually ran:
        cross-checked against the surface signature of the emitted STEP."""
        import re

        from tools.analyze_family import KINDS, family_of
        from tools.gen_step_solids import random_step_solid

        signatures = {
            "torus": "TOROIDAL_SURFACE",
            "dome": "SPHERICAL_SURFACE",
            "cone": "CONICAL_SURFACE",
            "vase": "SURFACE_OF_REVOLUTION",
        }
        seen = set()
        for i in range(40):
            fam = family_of(99, i)
            assert fam in KINDS
            assert family_of(99, i) == fam  # deterministic
            if fam in signatures and fam not in seen:
                seen.add(fam)
                rng = np.random.default_rng(np.random.SeedSequence([99, i]))
                text = random_step_solid(rng, f"{i:08d}")
                assert signatures[fam] in text, (i, fam)
        assert seen  # the 40-draw window hits at least one signed family

    def test_analyze_groups_by_family(self, tmp_path):
        from tools.analyze_family import analyze, family_of

        os.makedirs(os.path.join(tmp_path, "json"))
        for i in range(4):
            rec = {"pred_faces": [[0, [1]]], "label_faces": [[0, [1]]]}
            with open(os.path.join(tmp_path, "json", f"{i:08d}.json"), "w") as f:
                json.dump(rec, f)
        out = analyze(str(tmp_path), seed=7)
        assert out["samples"] == 4
        assert out["overall"]["precision"] == 1.0
        assert sum(v["n"] for v in out["families"].values()) == 4
        assert set(out["families"]) == {family_of(7, i) for i in range(4)}


class TestDedupPipelineEndToEnd:
    """The reference's dedup chain (stat yml -> topology bins -> 3-view
    Jaccard clustering, dataset/filters/filter_{topology,3view}.py) run
    CAD-free on a corpus seeded with exact duplicates: duplicates must
    collapse to the smallest id while same-topology-different-shape
    solids survive via their renders."""

    @pytest.fixture(scope="class")
    def dedup_root(self, tmp_path_factory):
        import subprocess
        import sys as _sys

        from faceformer_tpu.tools import step21

        root = tmp_path_factory.mktemp("dedup")
        os.makedirs(root / "step")
        solids = [
            step21.brep_cylinder(0.7, 1.1, name="00000000"),
            step21.brep_cylinder(0.7, 1.1, name="00000001"),  # dup of 0
            step21.brep_cylinder(0.7, 0.25, name="00000002"),  # same topo bin
            step21.brep_dome_block(0.6, 1.0, name="00000003"),
            step21.brep_dome_block(0.6, 1.0, name="00000004"),  # dup of 3
        ]
        for i, text in enumerate(solids):
            with open(root / "step" / f"{i:08d}.step", "w") as f:
                f.write(text)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for extra in ([], ["--three_view"]):
            subprocess.run(
                [_sys.executable, os.path.join(repo, "tools", "prepare_data.py"),
                 "--root", str(root), "--backend", "native", "--seed", "3",
                 "--num_cores", "1"] + extra,
                check=True, cwd=repo, capture_output=True)
        return root

    def test_stat_sidecars_written(self, dedup_root):
        import yaml

        stats = sorted(os.listdir(dedup_root / "stat"))
        assert stats == [f"{i:08d}.yml" for i in range(5)]
        with open(dedup_root / "stat" / "00000000.yml") as f:
            s0 = yaml.safe_load(f)
        with open(dedup_root / "stat" / "00000002.yml") as f:
            s2 = yaml.safe_load(f)
        assert s0 == s2  # same topology, different metrics
        assert s0["surfs"].count("Cylinder") == 1

    def test_duplicates_collapse_shapes_survive(self, dedup_root):
        from faceformer_tpu.tools.filters import filter_3view, filter_topology

        bins_path = str(dedup_root / "bins.json")
        filter_topology.main(["--root", str(dedup_root), "--out", bins_path])
        with open(bins_path) as f:
            bins = json.load(f)
        # cylinders share one bin, dome_blocks the other
        assert sorted(map(sorted, bins)) == [
            ["00000000", "00000001", "00000002"], ["00000003", "00000004"]]

        kept_path = str(dedup_root / "kept.json")
        filter_3view.main(["--root", str(dedup_root), "--bins", bins_path,
                           "--out", kept_path])
        with open(kept_path) as f:
            kept = json.load(f)
        assert kept == ["00000000", "00000002", "00000003"]


class TestSolidStats:
    """stats.solid_stat: tangential joins are smooth, corners sharp."""

    def _stat(self, text, tmp_path):
        from faceformer_tpu.tools import step21
        from faceformer_tpu.tools.stats import solid_stat

        path = os.path.join(tmp_path, "s.step")
        with open(path, "w") as f:
            f.write(text)
        return solid_stat(step21.read_brep(path))

    def test_tangential_joins_are_smooth(self, tmp_path):
        from faceformer_tpu.tools import step21

        # hemisphere cap meets its wall tangentially: only the base circle
        # is sharp; the fillet torus of a round-top is tangent on BOTH
        # sides (wall and top plane)
        assert self._stat(step21.brep_dome_block(0.6, 1.0), tmp_path)["#sharp"] == 1
        assert self._stat(
            step21.brep_round_top_cylinder(0.7, 1.0, 0.2), tmp_path)["#sharp"] == 1

    def test_corners_are_sharp(self, tmp_path):
        from faceformer_tpu.tools import step21

        s = self._stat(step21.brep_cylinder(0.7, 1.1), tmp_path)
        assert s["#sharp"] == 2 and s["#surfs"] == 3
        assert s["surfs"] == ["Cylinder", "Plane", "Plane"]
        assert s["curves"].count("Circle") == 2
