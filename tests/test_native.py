"""Native C++ geometry kernel: build + parity against the Python paths."""

import numpy as np
import pytest

from faceformer_tpu.geometry import native
from faceformer_tpu.geometry.enclosedness import is_face_enclosed
from faceformer_tpu.geometry.fixtures import random_sample
from faceformer_tpu.geometry.sampling import resample_edge_batch
from faceformer_tpu.post_processing import filter_faces_by_encloseness

pytestmark = pytest.mark.skipif(
    not (native.build() and native.available()),
    reason="native kernel could not be built")


class TestAbiHandshake:
    def test_version_matches(self):
        lib = native.load()
        assert int(lib.faceformer_abi_version()) == native.FACEFORMER_NATIVE_ABI

    def test_mismatch_refuses_to_bind(self, monkeypatch):
        # a library built from other sources (different ABI) must engage the
        # Python fallbacks rather than be called with the wrong layout
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_load_failed", False)
        monkeypatch.setattr(native, "FACEFORMER_NATIVE_ABI",
                            native.FACEFORMER_NATIVE_ABI + 1)
        with pytest.warns(UserWarning, match="ABI"):
            assert native.load() is None
        assert native._load_failed  # memoized: no rebuild storm per sample
        monkeypatch.undo()
        native._lib = None
        native._load_failed = False
        assert native.load() is not None  # real version binds again


class TestResample:
    def test_parity_random_edges(self, rng):
        edges = []
        for _ in range(30):
            n = int(rng.integers(2, 40))
            edges.append(rng.standard_normal((n, 2)).tolist())
        points, offsets = native.flatten_edges(edges)
        nat = native.resample_edges_native(points, offsets, 50)
        # force the pure-python path via per-edge calls
        ref = np.stack([np.asarray(
            __import__("faceformer_tpu.geometry.sampling", fromlist=["resample_edge"]
                       ).resample_edge(e, 50), dtype=np.float32) for e in edges])
        np.testing.assert_array_equal(nat, ref.astype(np.float32))

    def test_wired_into_packing(self, rng):
        edges = [rng.standard_normal((5, 2)).tolist() for _ in range(4)]
        out = resample_edge_batch(edges, num_lines=6, num_samples=8)
        assert out.shape == (6, 8, 2)
        assert np.all(out[4:] == 0)


class TestEnclosedness:
    def test_parity_on_fixtures(self, rng):
        for _ in range(5):
            sample = random_sample(rng)
            edges = sample["edges"]
            points, offsets = native.flatten_edges(edges)
            faces = [[i for lp in loops for i in lp]
                     for _, loops in sample["faces_indices"]]
            # add corrupted variants
            bad = [list(reversed(f)) for f in faces[:2]]
            all_faces = faces + bad
            nat = native.check_faces_enclosed_native(points, offsets, all_faces, 2e-4)
            for face, out in zip(all_faces, nat):
                py = is_face_enclosed(edges, face, 2e-4)
                if py is False:
                    assert out is None
                else:
                    lens = [sum(len(l) for l in py[: k + 1]) for k in range(len(py))]
                    assert out == lens

    def test_filter_batch_matches_python(self, rng):
        sample = random_sample(rng)
        edges = sample["edges"]
        typed = [(t, tuple(i for lp in loops for i in lp))
                 for t, loops in sample["faces_indices"]]
        typed += [(0, tuple(reversed(typed[0][1])))]  # one broken face
        nat = native.filter_faces_by_encloseness_batch(edges, typed, 2e-4)
        ref = filter_faces_by_encloseness(edges, typed, 2e-4)
        assert nat == ref

    def test_filter_batch_degenerate_faces_match_python(self):
        # regression: the C path used to KEEP all-hallucinated faces as
        # (type, ()) where Python drops them, and SKIPPED in-range negative
        # indices where Python wraps them (edges[-1])
        edges = [[[0, 0], [1, 0]], [[1, 0], [1, 1]],
                 [[1, 1], [0, 1]], [[0, 1], [0, 0]]]
        cases = [
            [(0, (99,))],             # every index hallucinated -> dropped
            [(0, (-1, -2))],          # negatives wrap like Python indexing
            [(0, (0, 1, 2, 3))],      # plain enclosed square
            [(1, (3, 99, 2, 1, 0))],  # hallucinated id skipped mid-face
        ]
        for faces in cases:
            ref = filter_faces_by_encloseness(edges, faces, 1e-6)
            nat = native.filter_faces_by_encloseness_batch(edges, faces, 1e-6)
            assert nat == ref, (faces, nat, ref)
