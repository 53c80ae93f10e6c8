"""Harness e2e for the flat single-sequence model family + resume path +
scheduled sampling."""

import os

import numpy as np
import pytest

import jax

from faceformer_tpu.config import Config, DecodeConfig, TrainerConfig
from faceformer_tpu.data.dataset import ABCDataset
from faceformer_tpu.geometry.fixtures import random_sample
from faceformer_tpu.train.trainer import Harness


@pytest.fixture(scope="module")
def single_cfg(tiny_model_cfg):
    return Config(
        model_class="SurfaceFormer",
        dataset_class="ABCDataset",
        batch_size_train=4,
        batch_size_valid=4,
        trainer=TrainerConfig(name="t", version="s0", lr=1e-3,
                              checkpoint_period=1, precision="fp32",
                              num_devices=2, lr_step=2),
        model=tiny_model_cfg,
        post_process=__import__("faceformer_tpu.config", fromlist=["PostProcessConfig"]
                                ).PostProcessConfig(is_coedge=False),
        decode=DecodeConfig(mode="causal_cache", precision="fp32"),
    )


@pytest.fixture(scope="module")
def single_harness(single_cfg, tiny_model_cfg, tmp_path_factory):
    rng = np.random.default_rng(13)
    samples = [random_sample(rng, coedge=False) for _ in range(8)]
    datasets = {
        "train": ABCDataset.from_samples(samples, tiny_model_cfg),
        "valid": ABCDataset.from_samples(samples[:4], tiny_model_cfg),
        "test": ABCDataset.from_samples(samples[4:6], tiny_model_cfg),
    }
    harness = Harness(single_cfg, datasets=datasets)
    harness.log_dir = str(tmp_path_factory.mktemp("logs_single"))
    return harness


@pytest.fixture(scope="module")
def single_fitted(single_harness):
    # fit ONCE per module so the resume test below is order-independent
    return single_harness.fit(max_epochs=2)


class TestSingleSeqHarness:
    def test_fit_eval_test(self, single_harness, single_fitted):
        results = single_harness.test(single_fitted["params"])
        assert 0.0 <= results["test_precision"] <= 1.0
        json_dir = os.path.join(single_harness.log_dir, "json")
        assert len(os.listdir(json_dir)) == 2

    def test_resume_from_checkpoint(self, single_harness, single_fitted):
        ckpt = os.path.join(single_harness.log_dir, "checkpoints", "last")
        state = single_harness.load(ckpt)
        assert state["epoch"] == 2  # restored from the checkpoint tree
        assert state["step"] == 4
        # one more epoch from restored params runs clean
        state = single_harness.fit(state, max_epochs=3)
        assert state["epoch"] == 3
        assert state["step"] == 6

    def test_steplr_schedule(self, single_harness):
        # lr_step=2 -> epoch 0-1 at lr, epoch 2+ at lr/10
        sched = single_harness._epoch_schedule
        assert sched is not None
        assert sched(0) == pytest.approx(1e-3)
        assert sched(2) == pytest.approx(1e-4)
        assert sched(4) == pytest.approx(1e-5)


class TestScheduledSampling:
    def test_mixes_predictions(self, tiny_model_cfg):
        from faceformer_tpu.data.batching import collate
        from faceformer_tpu.data.dataset import ABCDataset
        from faceformer_tpu.geometry.fixtures import build_sample, make_box
        from faceformer_tpu.models.surfaceformer import SurfaceFormer
        from faceformer_tpu.train.loss import pointer_cross_entropy

        sample = build_sample(make_box(), theta=25.0, phi=45.0, coedge=False)
        ds = ABCDataset.from_samples([sample], tiny_model_cfg)
        batch = collate([ds[0]])
        params = SurfaceFormer.init(jax.random.PRNGKey(0), tiny_model_cfg)
        out = SurfaceFormer.forward_train(
            params, tiny_model_cfg, batch, rng=jax.random.PRNGKey(1),
            scheduled_sampling_ratio=0.5)
        loss, _ = pointer_cross_entropy(out, tiny_model_cfg.token)
        assert np.isfinite(float(loss))
        # ratio 0 differs from ratio 1 (full sampled conditioning)
        out_full = SurfaceFormer.forward_train(
            params, tiny_model_cfg, batch, rng=jax.random.PRNGKey(1),
            scheduled_sampling_ratio=1.0)
        assert not np.allclose(np.asarray(out["pointer"]),
                               np.asarray(out_full["pointer"]))


class TestSeq2SeqCoedge:
    """The seq2seq+coedge flavor: flat model over coedge data with
    enclosedness filtering + pairing mapping at eval
    (reference configs/seq2seq+coedge.yml, trainer.py:226-255)."""

    def test_eval_pipeline(self, tiny_model_cfg):
        from faceformer_tpu.config import (Config, DecodeConfig,
                                           PostProcessConfig, TrainerConfig)
        from faceformer_tpu.data.dataset import ABCDataset
        from faceformer_tpu.geometry.fixtures import random_sample

        rng = np.random.default_rng(17)
        # coedge data WITHOUT face types: faces are lists of loops
        samples = [random_sample(rng, coedge=True, no_face_type=True)
                   for _ in range(4)]
        cfg = Config(
            model_class="SurfaceFormer",
            dataset_class="ABCDataset",
            batch_size_valid=4,
            trainer=TrainerConfig(num_devices=2, precision="fp32"),
            model=tiny_model_cfg,
            post_process=PostProcessConfig(is_coedge=True),
            decode=DecodeConfig(mode="causal_cache", precision="fp32"),
        )
        datasets = {"valid": ABCDataset.from_samples(samples, tiny_model_cfg)}
        harness = Harness(cfg, datasets=datasets)
        state = harness.init_state()
        results = harness.validate(state["params"])
        assert 0.0 <= results["valid_precision"] <= 1.0
        # coedge-seq metrics are produced in this flavor
        assert "valid_accuracy" in results

    def test_perfect_label_metrics(self, tiny_model_cfg):
        """Labels fed as predictions through the coedge+flat parse chain
        must score perfectly (parse -> enclosedness -> pairing mapping)."""
        from faceformer_tpu.config import PostProcessConfig, TokenConfig
        from faceformer_tpu.data.packing import pack_label_single
        from faceformer_tpu.geometry.fixtures import build_sample, make_box
        from faceformer_tpu.train.metrics import FaceMetrics

        sample = build_sample(make_box(), theta=25.0, phi=45.0,
                              no_face_type=True)
        packed = pack_label_single(sample["faces_indices"], tiny_model_cfg)
        engine = FaceMetrics(PostProcessConfig(is_coedge=True), TokenConfig())
        out = engine.evaluate_sample(packed["label"], packed["label"], sample)
        assert out["precision"] == 1.0
        assert out["recall"] == 1.0
        assert out["accuracy"] == 1.0
