"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faceformer_tpu.ops.attention import fused_attention
from faceformer_tpu.ops.pointer import pointer_argmax, pointer_argmax_batched


def reference_attention(q, k, v, key_padding, causal=False):
    hd = q.shape[-1]
    scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) * hd ** -0.5
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(key_padding[:, None, None, :], neg, scores)
    if causal:
        sq, sk = scores.shape[-2:]
        cmask = jnp.triu(jnp.ones((sq, sk), bool), k=1)
        scores = jnp.where(cmask, neg, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


class TestFusedAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, rng, causal):
        n, s, h, hd = 2, 21, 4, 16
        q = jnp.asarray(rng.standard_normal((n, s, h, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((n, s, h, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((n, s, h, hd)), jnp.float32)
        pad = np.zeros((n, s), bool)
        pad[:, 17:] = True
        pad = jnp.asarray(pad)

        got = fused_attention(q, k, v, pad, num_head=h, causal=causal, interpret=True)
        want = reference_attention(q, k, v, pad, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_cross_attention_shapes(self, rng):
        n, sq, sk, h, hd = 2, 9, 30, 2, 8
        q = jnp.asarray(rng.standard_normal((n, sq, h, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((n, sk, h, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((n, sk, h, hd)), jnp.float32)
        pad = jnp.zeros((n, sk), bool)
        got = fused_attention(q, k, v, pad, num_head=h, interpret=True)
        want = reference_attention(q, k, v, pad)
        assert got.shape == (n, sq, h, hd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


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
        base = SurfaceFormerParallel.forward_train(params, tiny_model_cfg, batch)
        ops.enable(True)
        try:
            fused = SurfaceFormerParallel.forward_train(params, tiny_model_cfg, batch)
        finally:
            ops.enable(False)
        np.testing.assert_allclose(
            np.asarray(fused["pointer"]), np.asarray(base["pointer"]), atol=3e-5)

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
        base = greedy_decode_parallel(params, tiny_model_cfg, batch, mode="causal_cache")
        ops.enable(True)
        try:
            fused = greedy_decode_parallel(params, tiny_model_cfg, batch, mode="causal_cache")
        finally:
            ops.enable(False)
        np.testing.assert_array_equal(
            np.asarray(fused["predict"]), np.asarray(base["predict"]))
