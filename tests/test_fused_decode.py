"""Fused whole-step decode kernel (ops/decode_step.py) equivalence.

The fused engine must produce exactly the causal_cache XLA engine's token
grids in fp32 (same math, same argmax; the kernel runs in the Pallas
interpreter on CPU). Covers layer counts that exercise the unrolled layer
loop and the two-slot cache-write pipelining, t_max values that are and are
not multiples of the DMA chunk, and both stop modes.
"""

import dataclasses

import numpy as np
import pytest

import jax

from faceformer_tpu.data.batching import collate
from faceformer_tpu.data.dataset import ABCDatasetParallel
from faceformer_tpu.decode import greedy_decode_parallel
from faceformer_tpu.geometry.fixtures import random_sample
from faceformer_tpu.models.parallel import SurfaceFormerParallel
from faceformer_tpu import ops


@pytest.fixture(autouse=True)
def _force_kernels():
    # mode="fused" honors the Pallas kill switch; on CPU kernels default
    # OFF, so force them on (interpret mode engages automatically off-TPU)
    # or every fused call would silently fall back to causal_cache and the
    # equality assertions would be vacuous
    ops.enable(True)
    yield
    ops.enable(None)


@pytest.fixture(scope="module")
def batch(tiny_model_cfg):
    rng = np.random.default_rng(9)
    samples = [random_sample(rng) for _ in range(2)]
    ds = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
    b = collate([ds[0], ds[1]])
    return {k: v for k, v in b.items() if not isinstance(v, (list, str))}


class TestFusedDecode:
    @pytest.mark.parametrize("early_stop", [True, False])
    def test_matches_causal_cache(self, tiny_model_cfg, batch, early_stop):
        cfg = tiny_model_cfg
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(2), cfg)
        ref = np.asarray(greedy_decode_parallel(
            params, cfg, batch, precision="fp32", mode="causal_cache",
            early_stop=early_stop)["predict"])
        fused = np.asarray(greedy_decode_parallel(
            params, cfg, batch, precision="fp32", mode="fused",
            early_stop=early_stop)["predict"])
        np.testing.assert_array_equal(fused, ref)

    @pytest.mark.parametrize("layers,t_max", [(1, 12), (3, 9)])
    def test_odd_depths_and_lengths(self, tiny_model_cfg, batch, layers, t_max):
        # t_max=12 and 9 are not CHUNK multiples; layers=1 skips the
        # two-slot write pipeline, layers=3 exercises an odd slot parity
        cfg = dataclasses.replace(
            tiny_model_cfg, num_decoder_layers=layers, max_face_length=t_max)
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(4), cfg)
        ref = np.asarray(greedy_decode_parallel(
            params, cfg, batch, precision="fp32", mode="causal_cache",
            early_stop=False)["predict"])
        fused = np.asarray(greedy_decode_parallel(
            params, cfg, batch, precision="fp32", mode="fused",
            early_stop=False)["predict"])
        np.testing.assert_array_equal(fused, ref)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel check needs a real TPU")
class TestFusedDecodeOnTPU:
    def test_compiled_matches_xla_bf16(self, tiny_model_cfg, batch):
        """The COMPILED kernel (not the interpreter) against the XLA engine
        in bf16 on hardware. Compiled MXU rounding differs from the XLA
        engine (even in fp32), so near-tied argmaxes flip occasionally on
        random weights and a flip cascades down its autoregressive row —
        measured ~98% token agreement; demand >=95%. (Exact equivalence is
        covered by the interpreter tests above, which share XLA's fp math.)
        Dims satisfy the compiled path's lane-tiling constraint
        (2*num_model % 128 == 0)."""
        cfg = dataclasses.replace(
            tiny_model_cfg, num_model=128, num_head=2, num_feedforward=128)
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(2), cfg)
        ref = np.asarray(greedy_decode_parallel(
            params, cfg, batch, precision="bf16", mode="causal_cache",
            early_stop=False)["predict"])
        fused = np.asarray(greedy_decode_parallel(
            params, cfg, batch, precision="bf16", mode="fused",
            early_stop=False)["predict"])
        agreement = (ref == fused).mean()
        assert agreement >= 0.95, f"token agreement {agreement:.4f}"


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel check needs a real TPU")
class TestFusedDecodeTrainedWeights:
    def test_trained_ckpt_grid_equality(self):
        """VERDICT r2 #5: compiled fused kernel vs XLA causal_cache on a
        TRAINED flagship checkpoint over real test samples.

        Exact equality is the INTERPRETER contract (TestFusedDecode above:
        same fp math as XLA). Compiled on hardware, both fp32 and bf16
        matmuls lower to MXU passes whose rounding differs from the XLA
        engine's op split, and trained weights still leave a handful of
        genuinely ambiguous rows — symmetric solids (prisms, cylinders)
        give some coedges near-identical memory rows, so near-zero argmax
        margins survive training and rounding can flip them (measured
        14/127,872 tokens = 0.011% on big-s0). The hardware contract is
        therefore >=99.9% token agreement AND metric means within 0.005."""
        import glob as _glob
        import os as _os

        from faceformer_tpu.config import load_config
        from faceformer_tpu.data.batching import iter_batches
        from faceformer_tpu.train.trainer import Harness

        log_dir = "logs/SurfaceFormer/big-s0"
        if not _os.path.isdir(_os.path.join(log_dir, "checkpoints")):
            pytest.skip("no trained flagship checkpoint on this machine")
        cfg = load_config("configs/synthetic-big.yml")
        if not _os.path.isdir(cfg.root_dir):
            pytest.skip("flagship corpus not present")
        import sys
        sys.path.insert(0, _os.getcwd())
        from tools.best_ckpt import best_ckpt

        harness = Harness(cfg)
        params = harness.load(best_ckpt(log_dir))["params"]
        ds = harness.dataset("test")
        batch = next(iter(iter_batches(ds, 16, pad_to_full=True)))
        arrays = {k: v for k, v in batch.items() if not isinstance(v, (list, str))}
        arrays = jax.device_put(arrays)

        def grids(precision):
            return {mode: np.asarray(greedy_decode_parallel(
                params, cfg.model, arrays, precision=precision,
                mode=mode)["predict"]) for mode in ("causal_cache", "fused")}

        g16 = grids("bf16")
        agreement = (g16["fused"] == g16["causal_cache"]).mean()
        assert agreement >= 0.999, f"bf16 token agreement {agreement:.5f}"
        from faceformer_tpu.train.metrics import FaceMetrics

        engine = FaceMetrics(cfg.post_process, cfg.model.token)
        raw = [ds.raw_datas[i] for i in batch["id"]]
        outs = {m: engine.evaluate_batch(
            g16[m], np.asarray(batch["label"]), raw, batch["sample_valid"])
            for m in g16}
        for key in ("precision", "recall", "type_acc"):
            a = float(np.mean(outs["fused"][key]))
            b = float(np.mean(outs["causal_cache"][key]))
            assert abs(a - b) <= 0.005, f"{key}: fused {a} vs xla {b}"
