"""Flash-attention custom-VJP kernel: forward + gradient parity against the
XLA reference implementation (interpreter mode on CPU; the compiled kernel
on TPU hardware).

On TPU the parity comparisons run under fp32 matmul precision: the XLA
reference otherwise lowers fp32 matmuls to single-pass bf16 on the MXU,
which adds ~4e-3 noise vs the kernel's fp32-accumulated dots (measured
2026-08-19; the CPU-calibrated 3e-5 tolerances are meaningless against
that). Gradient tolerances stay modestly looser on TPU because the
flash backward recomputes attention in a different association order
than autodiff's saved-activation replay."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faceformer_tpu.ops.flash import flash_attention, padding_mask_bias

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU  # exercise the compiled kernel on real hardware
GRAD_ATOL = 2e-4 if ON_TPU else 3e-5


def reference(q, k, v, bias, causal=False):
    hd = q.shape[-1]
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * hd ** -0.5
    s = s + bias[:, None, None, :]
    if causal:
        sq, sk = s.shape[-2:]
        cm = jnp.triu(jnp.ones((sq, sk), bool), k=1)
        s = jnp.where(cm, jnp.finfo(jnp.float32).min, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", p, v)


@pytest.fixture(scope="module")
def inputs(rng):
    n, sq, sk, h, hd = 2, 13, 21, 4, 16
    q = jnp.asarray(rng.standard_normal((n, sq, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, sk, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, sk, h, hd)), jnp.float32)
    pad = np.zeros((n, sk), bool)
    pad[:, 17:] = True
    bias = padding_mask_bias(jnp.asarray(pad))
    return q, k, v, bias


class TestFlashForward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, inputs, causal):
        q, k, v, bias = inputs
        with jax.default_matmul_precision("float32"):
            got = flash_attention(q, k, v, bias, causal=causal, interpret=INTERPRET)
            want = reference(q, k, v, bias, causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestFlashBackward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_autodiff(self, inputs, causal):
        q, k, v, bias = inputs

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, bias, causal=causal, interpret=INTERPRET)
            return jnp.sum(jnp.sin(out))  # nontrivial cotangents

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(reference(q, k, v, bias, causal)))

        with jax.default_matmul_precision("float32"):
            g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=GRAD_ATOL,
                err_msg=f"grad mismatch for {name}")

    def test_value_and_grad_jits(self, inputs):
        q, k, v, bias = inputs

        @jax.jit
        def f(q, k, v):
            return jnp.sum(flash_attention(q, k, v, bias, causal=False,
                                           interpret=INTERPRET) ** 2)

        val, grads = jax.value_and_grad(f)(q, k, v)
        assert np.isfinite(float(val))


class TestFlashInModel:
    def test_train_grads_match_xla_path(self, tiny_model_cfg):
        """Full-model gradients with flash routing on vs off (dropout 0)."""
        from faceformer_tpu import ops
        from faceformer_tpu.data.batching import collate
        from faceformer_tpu.data.dataset import ABCDatasetParallel
        from faceformer_tpu.geometry.fixtures import build_sample, make_box
        from faceformer_tpu.models.parallel import SurfaceFormerParallel
        from faceformer_tpu.train.loss import pointer_cross_entropy

        sample = build_sample(make_box(), theta=25.0, phi=45.0)
        ds = ABCDatasetParallel.from_samples([sample], tiny_model_cfg)
        batch = collate([ds[0]])
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(0), tiny_model_cfg)

        def loss_fn(p):
            out = SurfaceFormerParallel.forward_train(p, tiny_model_cfg, batch)
            return pointer_cross_entropy(out, tiny_model_cfg.token)[0]

        try:
            ops.enable(False)  # kernels-off baseline, even on TPU
            with jax.default_matmul_precision("float32"):
                g_base = jax.grad(loss_fn)(params)
                ops.enable(True)
                g_flash = jax.grad(loss_fn)(params)
        finally:
            ops.enable(None)  # restore the platform default for later tests
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_base)[0],
            jax.tree_util.tree_flatten_with_path(g_flash)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4,
                err_msg=f"grad mismatch at {path}")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel dropout needs the compiled TPU PRNG")
class TestFlashDropoutTPU:
    def test_deterministic_and_mean_preserving(self, inputs):
        q, k, v, bias = inputs
        seed = jnp.asarray([42.0], jnp.float32)
        a = flash_attention(q, k, v, bias, seed, False, False, 0.2)
        b = flash_attention(q, k, v, bias, seed, False, False, 0.2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # different seed -> different mask
        c = flash_attention(q, k, v, bias, jnp.asarray([43.0], jnp.float32),
                            False, False, 0.2)
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_directional_gradient(self, inputs):
        """Finite-difference check: dropout is deterministic given the seed,
        so the custom VJP must match the numerical directional derivative.
        fp32 matmul precision keeps FD noise below the tolerance (default
        bf16 matmuls add ~1e-2 relative noise; verified 1e-4 at fp32)."""
        q, k, v, bias = inputs
        seed = jnp.asarray([11.0], jnp.float32)
        rng = np.random.default_rng(1)
        dq = jnp.asarray(rng.standard_normal(q.shape) * 1e-3, jnp.float32)

        def f(qq):
            return jnp.sum(flash_attention(qq, k, v, bias, seed, False, False, 0.2))

        with jax.default_matmul_precision("float32"):
            g = jax.grad(f)(q)
            analytic = float(jnp.sum(g * dq))
            numeric = float((f(q + dq) - f(q - dq)) / 2.0)
        assert abs(analytic - numeric) < 5e-3 * max(abs(numeric), 1.0)
