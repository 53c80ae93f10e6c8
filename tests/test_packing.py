"""Label-packing contract tests: exact reference token-stream semantics."""

import numpy as np
import pytest

from faceformer_tpu.config import ModelConfig
from faceformer_tpu.data.packing import (
    count_rotation_rows,
    pack_input_edges,
    pack_label_parallel,
    pack_label_single,
)
from faceformer_tpu.data.dataset import ABCDataset, ABCDatasetParallel
from faceformer_tpu.geometry.fixtures import build_sample, make_box


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        num_points_per_line=8, num_lines=30, label_seq_length=40, max_face_length=12
    )


class TestSingleSeq:
    def test_flat_faces(self, cfg):
        out = pack_label_single([[0, 1, 2], [3, 4]], cfg)
        lab = out["label"]
        # [SOS, 4,5,6, SEP, 7,8, EOS, PAD...]
        assert lab[:8].tolist() == [1, 4, 5, 6, 2, 7, 8, 3]
        assert np.all(lab[8:] == 0)
        assert out["num_label"] == 8
        assert out["label_mask"].tolist() == (lab == 0).tolist()

    def test_nested_loops_flattened(self, cfg):
        out = pack_label_single([[[0, 1], [2]], [[3]]], cfg)
        assert out["label"][:7].tolist() == [1, 4, 5, 6, 2, 7, 3]

    def test_single_face_eos_overwrites_sep(self, cfg):
        out = pack_label_single([[5]], cfg)
        assert out["label"][:3].tolist() == [1, 9, 3]


class TestParallel:
    def test_rotations(self, cfg):
        faces = [(0, [[0, 1, 2]]), (2, [[3, 4]])]
        out = pack_label_parallel(faces, cfg)
        lab = out["label"]
        # face 0 (Plane -> type token 1): 3 rotations of [0,1,2]+4
        assert lab[0, :4].tolist() == [4, 5, 6, 1]
        assert lab[1, :4].tolist() == [6, 4, 5, 1]
        assert lab[2, :4].tolist() == [5, 6, 4, 1]
        # face 1 (Other -> type token 3): 2 rotations of [3,4]+4
        assert lab[3, :3].tolist() == [7, 8, 3]
        assert lab[4, :3].tolist() == [8, 7, 3]
        # unused rows: bare Other token
        assert np.all(lab[5:, 0] == 3)
        assert np.all(lab[5:, 1:] == 0)
        assert out["num_faces"] == 2

    def test_multi_loop_face(self, cfg):
        faces = [(1, [[0, 1], [2, 3]])]
        out = pack_label_parallel(faces, cfg)
        lab = out["label"]
        # rotation of loop 1 followed by loop 2, type token 2 (Cylinder)
        assert lab[0, :5].tolist() == [4, 5, 6, 7, 2]
        assert lab[1, :5].tolist() == [5, 4, 6, 7, 2]
        # rotations of loop 2 followed by loop 1
        assert lab[2, :5].tolist() == [6, 7, 4, 5, 2]
        assert lab[3, :5].tolist() == [7, 6, 4, 5, 2]

    def test_type_clamping(self, cfg):
        out = pack_label_parallel([(7, [[0]])], cfg)
        assert out["label"][0, :2].tolist() == [4, 3]  # clamped to Other

    def test_count_rotation_rows(self):
        faces = [(0, [[0, 1, 2]]), (1, [[3, 4], [5]])]
        assert count_rotation_rows(faces) == 6


class TestInputPacking:
    def test_mask_and_shape(self, cfg):
        edges = [[[0.0, 0.0], [1.0, 0.0]], [[1.0, 0.0], [1.0, 1.0]]]
        out = pack_input_edges(edges, cfg)
        assert out["input"].shape == (30, 8, 2)
        assert out["input_mask"].tolist() == [False, False] + [True] * 28
        assert out["num_input"] == 2


class TestDatasets:
    def test_parallel_dataset_from_fixture(self):
        sample = build_sample(make_box(), theta=25.0, phi=45.0)
        cfg = ModelConfig(num_points_per_line=8, num_lines=30, max_face_length=12)
        ds = ABCDatasetParallel.from_samples([sample], cfg)
        item = ds[0]
        assert item["input"].shape == (30, 8, 2)
        assert item["label"].shape == (30, 12)
        assert item["num_input"] == len(sample["edges"]) == 24  # 12 edges x 2 coedges
        # rotation rows == coedge count for coedge data
        assert count_rotation_rows(sample["faces_indices"]) == 24

    def test_single_dataset_from_fixture(self):
        sample = build_sample(make_box(), theta=25.0, phi=45.0, coedge=False)
        cfg = ModelConfig(num_points_per_line=8, num_lines=30, label_seq_length=80)
        ds = ABCDataset.from_samples([sample], cfg)
        item = ds[0]
        lab = item["label"]
        assert lab[0] == 1  # SOS
        assert 3 in lab  # EOS present


class TestBatching:
    def test_process_sharding_disjoint(self):
        from faceformer_tpu.data.batching import iter_batches

        class FakeDS:
            def __len__(self):
                return 20

            def __getitem__(self, i):
                import numpy as np
                return {"id": np.asarray(i)}

        seen = []
        for rank in range(4):
            ids = []
            for batch in iter_batches(FakeDS(), 2, shuffle=True, seed=3,
                                      process_index=rank, process_count=4):
                ids.extend(batch["id"].tolist())
            seen.append(set(ids))
        all_ids = set().union(*seen)
        assert all_ids == set(range(20))
        for a in range(4):
            for b in range(a + 1, 4):
                assert not (seen[a] & seen[b])

    def test_uneven_stripes_yield_equal_batch_counts(self):
        # regression: stride-sliced stripes can differ by one sample; with
        # drop_last the per-host BATCH counts then diverged (7 samples / 2
        # hosts / batch 4: host 0 got a batch, host 1 none), deadlocking
        # the cross-host collective in the jitted train step. Stripes are
        # now truncated to the global minimum.
        import numpy as np

        from faceformer_tpu.data.batching import iter_batches

        class FakeDS:
            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return {"id": np.asarray(i)}

        for n, hosts, bs in ((7, 2, 4), (9, 2, 2), (21, 4, 4), (5, 3, 2)):
            counts = []
            for rank in range(hosts):
                batches = list(iter_batches(
                    FakeDS(n), bs, shuffle=True, seed=1, drop_last=True,
                    process_index=rank, process_count=hosts))
                counts.append(len(batches))
            assert len(set(counts)) == 1, (n, hosts, bs, counts)
