"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faceformer_tpu.ops.pointer import pointer_argmax, pointer_argmax_batched


class TestPointerArgmax:
    def test_matches_masked_argmax(self, rng):
        r, s, e = 37, 29, 32
        rows = jnp.asarray(rng.standard_normal((r, e)), jnp.float32)
        memory = jnp.asarray(rng.standard_normal((s, e)), jnp.float32)
        pad = np.zeros(s, bool)
        pad[23:] = True
        got = pointer_argmax(rows, memory, jnp.asarray(pad), interpret=True)
        logits = np.array(rows @ memory.T)
        logits[:, pad] = np.finfo(np.float32).min
        np.testing.assert_array_equal(np.asarray(got), logits.argmax(-1))

    def test_batched(self, rng):
        n, f, s, e = 3, 11, 19, 16
        rows = jnp.asarray(rng.standard_normal((n, f, e)), jnp.float32)
        memory = jnp.asarray(rng.standard_normal((n, s, e)), jnp.float32)
        pad = jnp.asarray(rng.random((n, s)) < 0.3)
        pad = pad.at[:, 0].set(False)  # keep at least one valid row
        got = pointer_argmax_batched(rows, memory, pad, interpret=True)
        from faceformer_tpu.models.common import masked_argmax

        want = masked_argmax(memory, rows, pad)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestWiredIntoModel:
    def test_forward_train_parity(self, tiny_model_cfg, rng):
        """Full model forward with Pallas routing on vs off must agree."""
        import jax
        from faceformer_tpu import ops
        from faceformer_tpu.data.batching import collate
        from faceformer_tpu.data.dataset import ABCDatasetParallel
        from faceformer_tpu.geometry.fixtures import build_sample, make_box
        from faceformer_tpu.models.parallel import SurfaceFormerParallel

        samples = [build_sample(make_box(), theta=25.0, phi=45.0)]
        ds = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
        batch = collate([ds[0]])
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(0), tiny_model_cfg)
        try:
            # pin kernels OFF for the baseline (on TPU the default is ON,
            # which would make the comparison kernels-vs-kernels). fp32
            # matmul precision: on TPU the XLA baseline otherwise runs
            # single-pass bf16 MXU matmuls, ~4e-3 noise vs the kernel's
            # fp32-accumulated dots.
            ops.enable(False)
            with jax.default_matmul_precision("float32"):
                base = SurfaceFormerParallel.forward_train(params, tiny_model_cfg, batch)
                ops.enable(True)
                fused = SurfaceFormerParallel.forward_train(params, tiny_model_cfg, batch)
        finally:
            ops.enable(None)  # restore the platform default for later tests
        np.testing.assert_allclose(
            np.asarray(fused["pointer"]), np.asarray(base["pointer"]),
            atol=2e-4 if jax.default_backend() == "tpu" else 3e-5)

    def test_decode_parity(self, tiny_model_cfg, rng):
        import jax
        from faceformer_tpu import ops
        from faceformer_tpu.data.batching import collate
        from faceformer_tpu.data.dataset import ABCDatasetParallel
        from faceformer_tpu.decode import greedy_decode_parallel
        from faceformer_tpu.geometry.fixtures import build_sample, make_box
        from faceformer_tpu.models.parallel import SurfaceFormerParallel

        samples = [build_sample(make_box(), theta=25.0, phi=45.0)]
        ds = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
        batch = collate([ds[0]])
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(3), tiny_model_cfg)
        try:
            ops.enable(False)  # kernels-off baseline, even on TPU
            base = greedy_decode_parallel(params, tiny_model_cfg, batch,
                                          mode="causal_cache")
            ops.enable(True)
            fused = greedy_decode_parallel(params, tiny_model_cfg, batch,
                                           mode="causal_cache")
        finally:
            ops.enable(None)  # restore the platform default for later tests
        np.testing.assert_array_equal(
            np.asarray(fused["predict"]), np.asarray(base["predict"]))
