"""Harness eval with decode.mode=fused: the whole test() path must run the
fused Pallas engine on one device (interpreter on CPU), produce the same
artifacts as the XLA path, and transparently fall back to causal_cache when
the mesh spans multiple devices (the fused kernel is single-device)."""

import json
import os

import numpy as np
import pytest

from faceformer_tpu.config import Config, DecodeConfig, TrainerConfig
from faceformer_tpu.data.dataset import ABCDatasetParallel
from faceformer_tpu.geometry.fixtures import random_sample
from faceformer_tpu.train.trainer import Harness
from faceformer_tpu import ops


@pytest.fixture(autouse=True)
def _force_kernels():
    # decode.mode=fused honors the Pallas kill switch; force kernels on so
    # the CPU run actually exercises the fused engine (interpreter)
    ops.enable(True)
    yield
    ops.enable(None)


def make_harness(tiny_model_cfg, tmp_path, num_devices):
    cfg = Config(
        model_class="SurfaceFormer_Parallel",
        dataset_class="ABCDataset_Parallel",
        batch_size_train=4,
        batch_size_valid=4,
        trainer=TrainerConfig(name="fz", version="v0", lr=1e-3,
                              checkpoint_period=1, precision="fp32",
                              num_devices=num_devices),
        model=tiny_model_cfg,
        decode=DecodeConfig(mode="fused", precision="fp32"),
    )
    rng = np.random.default_rng(21)
    samples = [random_sample(rng) for _ in range(4)]
    datasets = {
        "test": ABCDatasetParallel.from_samples(samples, tiny_model_cfg),
    }
    harness = Harness(cfg, datasets=datasets)
    harness.log_dir = str(tmp_path)
    return harness


class TestFusedHarness:
    def test_single_device_test_loop(self, tiny_model_cfg, tmp_path):
        harness = make_harness(tiny_model_cfg, tmp_path / "one", 1)
        state = harness.init_state()
        results = harness.test(state["params"])
        assert 0.0 <= results["test_precision"] <= 1.0
        assert results["num_samples"] == 4
        persisted = json.load(open(os.path.join(harness.log_dir, "results.json")))
        assert persisted["test_precision"] == results["test_precision"]

    def test_multi_device_runs_fused_via_shard_map(self, tiny_model_cfg,
                                                   tmp_path, capsys):
        # data-parallel meshes no longer fall back: the fused engine runs
        # per-shard under shard_map (tests/test_sharded_kernels.py proves
        # grid equality); no fallback message is printed
        harness = make_harness(tiny_model_cfg, tmp_path / "many", 4)
        state = harness.init_state()
        results = harness.test(state["params"])
        assert 0.0 <= results["test_precision"] <= 1.0
        assert "causal_cache" not in capsys.readouterr().out
