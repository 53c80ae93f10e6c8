"""Native C++ data loader: parity against the Python packers, fallback paths.

The loader (native/dataloader.cc, bridged by data/native_loader.py) does the
whole load-parse-resample-pack pass in C++ threads; these tests assert its
arrays match faceformer_tpu/data/packing.py element-for-element on synthetic
datasets of every flavor, and that malformed inputs fall back cleanly to the
Python path.
"""

import dataclasses
import json

import numpy as np
import pytest

from faceformer_tpu.config import TokenConfig
from faceformer_tpu.data import native_loader
from faceformer_tpu.data.dataset import ABCDataset, ABCDatasetParallel
from faceformer_tpu.geometry import native
from faceformer_tpu.geometry.fixtures import random_sample

pytestmark = pytest.mark.skipif(
    not (native.build() and native.available() and native_loader.available()),
    reason="native loader could not be built")


def _write_dataset(tmp_path, samples):
    (tmp_path / "json").mkdir()
    names = []
    for i, s in enumerate(samples):
        name = f"json/{i:08d}.json"
        with open(tmp_path / name, "w") as f:
            json.dump(s, f)
        names.append(name)
    with open(tmp_path / "all.txt", "w") as f:
        f.write("\n".join(names))
    return str(tmp_path), "all.txt"


@pytest.fixture(scope="module")
def flavor_samples(rng):
    return [random_sample(rng) for _ in range(10)]


def _assert_items_equal(fast, slow):
    assert len(fast) == len(slow)
    for i in range(len(slow)):
        a, b = fast[i], slow[i]
        assert set(a) == set(b)
        for key in b:
            if isinstance(b[key], np.ndarray):
                np.testing.assert_array_equal(a[key], b[key], err_msg=key)
            else:
                assert a[key] == b[key], key


class TestParity:
    def test_parallel(self, tmp_path, flavor_samples, tiny_model_cfg):
        root, split = _write_dataset(tmp_path, flavor_samples)
        fast = ABCDatasetParallel(root, split, tiny_model_cfg)
        assert fast._packed is not None, "native path did not engage"
        slow = ABCDatasetParallel.from_samples(flavor_samples, tiny_model_cfg)
        _assert_items_equal(fast, slow)

    def test_single_combined(self, tmp_path, rng, tiny_model_cfg):
        # --combine_coedge flavor: flat index lists per face
        samples = [random_sample(rng, coedge=False) for _ in range(8)]
        cfg = dataclasses.replace(tiny_model_cfg, label_seq_length=256)
        root, split = _write_dataset(tmp_path, samples)
        fast = ABCDataset(root, split, cfg)
        assert fast._packed is not None
        slow = ABCDataset.from_samples(samples, cfg)
        _assert_items_equal(fast, slow)

    def test_single_coedge_loops(self, tmp_path, rng, tiny_model_cfg):
        # seq2seq+coedge flavor without face types: nested loop lists
        samples = [random_sample(rng, no_face_type=True) for _ in range(8)]
        cfg = dataclasses.replace(tiny_model_cfg, label_seq_length=256)
        root, split = _write_dataset(tmp_path, samples)
        fast = ABCDataset(root, split, cfg)
        assert fast._packed is not None
        slow = ABCDataset.from_samples(samples, cfg)
        _assert_items_equal(fast, slow)

    def test_single_direction_token(self, tmp_path, rng, tiny_model_cfg):
        samples = [random_sample(rng, direction_token=True) for _ in range(6)]
        cfg = dataclasses.replace(
            tiny_model_cfg, label_seq_length=512,
            token=TokenConfig(DIR0=4, DIR1=5, length=6))
        root, split = _write_dataset(tmp_path, samples)
        fast = ABCDataset(root, split, cfg)
        assert fast._packed is not None
        slow = ABCDataset.from_samples(samples, cfg)
        _assert_items_equal(fast, slow)

    def test_parallel_extended_token_table(self, tmp_path, rng, tiny_model_cfg):
        # 6-row token table (the direction_token layout): unused label rows
        # must carry the Other face-type token, NOT tok.length-1 (= DIR1
        # here) — the native packer once wrote the literal len-1 and
        # silently diverged from pack_label_parallel on this table
        samples = [random_sample(rng) for _ in range(6)]
        cfg = dataclasses.replace(
            tiny_model_cfg, token=TokenConfig(DIR0=4, DIR1=5, length=6))
        root, split = _write_dataset(tmp_path, samples)
        fast = ABCDatasetParallel(root, split, cfg)
        assert fast._packed is not None
        slow = ABCDatasetParallel.from_samples(samples, cfg)
        _assert_items_equal(fast, slow)

    def test_raw_datas_lazy_but_correct(self, tmp_path, flavor_samples,
                                        tiny_model_cfg):
        root, split = _write_dataset(tmp_path, flavor_samples)
        ds = ABCDatasetParallel(root, split, tiny_model_cfg)
        raw = ds.raw_datas[3]
        assert raw["edges"] == flavor_samples[3]["edges"]
        assert len(ds.raw_datas) == len(flavor_samples)


class TestFallback:
    def test_malformed_json_falls_back_per_file(self, tmp_path,
                                                flavor_samples,
                                                tiny_model_cfg):
        # ONE bad file in the corpus: the other 9 still load natively (no
        # silent 15x whole-corpus revert), the warning names the offender,
        # and indexing the bad sample raises exactly what the reference's
        # json.load would
        root, split = _write_dataset(tmp_path, flavor_samples)
        with open(tmp_path / "json" / "00000003.json", "w") as f:
            f.write("{ not json")
        with pytest.warns(UserWarning, match="00000003.json"):
            ds = ABCDatasetParallel(root, split, tiny_model_cfg)
        assert ds._packed is not None, "native path must stay engaged"
        assert ds._native_failed == {3}
        slow = ABCDatasetParallel.from_samples(flavor_samples, tiny_model_cfg)
        for i in (0, 1, 2, 4, 9):  # native rows match the Python packer
            for key, val in slow[i].items():
                if isinstance(val, np.ndarray):
                    np.testing.assert_array_equal(ds[i][key], val, err_msg=key)
        with pytest.raises(json.JSONDecodeError):
            ds[3]

    def test_env_opt_out(self, tmp_path, flavor_samples, tiny_model_cfg,
                         monkeypatch):
        monkeypatch.setenv("FACEFORMER_NATIVE_LOADER", "0")
        root, split = _write_dataset(tmp_path, flavor_samples)
        ds = ABCDatasetParallel(root, split, tiny_model_cfg)
        assert ds._packed is None
        assert isinstance(ds.raw_datas, list)

    def test_overflow_label_falls_back(self, tmp_path, flavor_samples,
                                       tiny_model_cfg):
        # a face longer than max_face_length must fail identically to the
        # Python packer (ValueError), via the fallback path
        cfg = dataclasses.replace(tiny_model_cfg, max_face_length=3)
        root, split = _write_dataset(tmp_path, flavor_samples)
        with pytest.warns(UserWarning, match="native loader"):
            with pytest.raises(ValueError, match="max_face_length"):
                ds = ABCDatasetParallel(root, split, cfg)
                ds[0]
