"""Pallas kernels under sharded meshes (the production multi-chip path).

Round-2 risk closure: every multi-device test used to run with kernels OFF
(they only enable on TPU backends), so whether the Pallas paths partition
under pjit sharding propagation — and whether the fused decode engine works
at all beyond one device — was untested. Here the kernels are forced ON
through the interpreter on the 8-virtual-CPU-device backend:

  - flash attention (fwd + VJP) under jit with batch-sharded operands on a
    2x2 data x model mesh: executes, stays batch-sharded, matches the
    replicated run;
  - the flash-kernel train step (forward_train + grads) with the batch
    sharded over `data`: loss/grads match the single-device kernel run;
  - the fused whole-step decode engine through Harness.decode_fn on a
    2-device mesh (jax.shard_map over `data`): token grids EQUAL the
    single-device fused engine (retired-row grids are stop-invariant,
    decode.py docstring);
  - a flagship-dims (d=512, 6+6, L=216 — configs/ours.yml) sharded train
    step LOWERING check: compile-only, so shape/sharding bugs at real dims
    can't hide behind the toy-dims dryrun (VERDICT r2 #10).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from faceformer_tpu import ops
from faceformer_tpu.config import ModelConfig
from faceformer_tpu.data.batching import collate
from faceformer_tpu.data.dataset import ABCDatasetParallel
from faceformer_tpu.geometry.fixtures import random_sample
from faceformer_tpu.models.parallel import SurfaceFormerParallel
from faceformer_tpu.ops.flash import flash_attention, padding_mask_bias
from faceformer_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from faceformer_tpu.train.loss import pointer_cross_entropy

# These tests validate SHARDING semantics and need the >=8-device virtual
# CPU mesh from conftest; under FACEFORMER_TEST_TPU=1 the backend is the
# single tunneled chip, which cannot form the meshes (tools/run_tpu_tests.py
# records them as skipped there — the kernel-on-hardware coverage lives in
# test_flash/test_pallas/test_fused_decode).
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs >=8 devices (virtual CPU mesh); single-chip backend")


@pytest.fixture(autouse=True)
def _force_kernels():
    ops.enable(True)  # interpret mode engages automatically off-TPU
    yield
    ops.enable(None)


@pytest.fixture(scope="module")
def batch(tiny_model_cfg):
    rng = np.random.default_rng(21)
    samples = [random_sample(rng) for _ in range(4)]
    ds = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
    b = collate([ds[i] for i in range(4)])
    return {k: v for k, v in b.items() if not isinstance(v, (list, str))}


class TestFlashUnderSharding:
    def test_fwd_sharded_matches_replicated(self):
        mesh = make_mesh(8, model_axis=2)
        rng = np.random.default_rng(3)
        n, s, h, hd = 8, 16, 4, 16
        q, k, v = (jnp.asarray(rng.normal(size=(n, s, h, hd)), jnp.float32)
                   for _ in range(3))
        bias = padding_mask_bias(jnp.zeros((n, s), bool).at[:, 12:].set(True))
        ref = flash_attention(q, k, v, bias, interpret=True)

        sh = NamedSharding(mesh, P("data"))
        f = jax.jit(lambda a, b, c, d: flash_attention(a, b, c, d, interpret=True))
        out = f(*(jax.device_put(x, sh) for x in (q, k, v, bias)))
        assert "data" in str(out.sharding.spec), out.sharding
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_vjp_sharded_matches_replicated(self):
        mesh = make_mesh(8, model_axis=2)
        rng = np.random.default_rng(4)
        n, s, h, hd = 8, 16, 4, 16
        q, k, v = (jnp.asarray(rng.normal(size=(n, s, h, hd)), jnp.float32)
                   for _ in range(3))
        bias = padding_mask_bias(jnp.zeros((n, s), bool))

        def loss(a, b, c):
            return flash_attention(a, b, c, bias, interpret=True).sum()

        ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        sh = NamedSharding(mesh, P("data"))
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
            *(jax.device_put(x, sh) for x in (q, k, v)))
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)

    def test_train_step_batch_sharded(self, tiny_model_cfg, batch):
        cfg = tiny_model_cfg
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(0), cfg)

        def loss_fn(p, b):
            out = SurfaceFormerParallel.forward_train(p, cfg, b, rng=None)
            return pointer_cross_entropy(out, cfg.token)[0]

        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, batch)

        mesh = make_mesh(4, model_axis=1)
        p_sh = shard_params(params, mesh)
        b_sh = shard_batch(batch, mesh)
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p_sh, b_sh)
        np.testing.assert_allclose(np.asarray(loss), np.asarray(ref_loss),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)


class TestShardedFusedDecode:
    def test_harness_fused_matches_single_device(self, tiny_model_cfg):
        from faceformer_tpu.config import Config
        from faceformer_tpu.train.trainer import Harness

        rng = np.random.default_rng(31)
        samples = [random_sample(rng) for _ in range(8)]
        ds = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
        b = collate([ds[i] for i in range(8)])
        batch = {k: v for k, v in b.items() if not isinstance(v, (list, str))}

        def harness(num_devices):
            cfg = Config(
                model_class="SurfaceFormer_Parallel",
                dataset_class="ABCDataset_Parallel",
                model=tiny_model_cfg,
                trainer=dataclasses.replace(
                    Config().trainer, num_devices=num_devices),
                decode=dataclasses.replace(Config().decode, mode="fused",
                                           precision="fp32"))
            return Harness(cfg)

        single = harness(1)
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(5),
                                            tiny_model_cfg)
        ref = np.asarray(single.decode_fn()(
            params, shard_batch(batch, single.mesh)))

        multi = harness(2)
        assert multi.mesh.devices.size == 2
        got = np.asarray(multi.decode_fn()(
            shard_params(params, multi.mesh), shard_batch(batch, multi.mesh)))
        np.testing.assert_array_equal(got, ref)


class TestFlagshipDimsLowering:
    def test_sharded_train_step_lowers_at_flagship_dims(self):
        # compile-only (abstract eval + lowering): proves shapes/shardings
        # at the reference `ours` dims on the 8-device mesh without paying
        # a CPU execution of the full model
        cfg = ModelConfig(num_lines=216, max_num_faces=42, max_face_length=37)
        mesh = make_mesh(8, model_axis=2)
        n = 8

        def loss_fn(p, b, rng):
            out = SurfaceFormerParallel.forward_train(p, cfg, b, rng=rng)
            return pointer_cross_entropy(out, cfg.token)[0]

        params_shape = jax.eval_shape(
            lambda k: SurfaceFormerParallel.init(k, cfg), jax.random.PRNGKey(0))
        batch_shape = {
            "input": jax.ShapeDtypeStruct(
                (n, cfg.num_lines, cfg.num_points_per_line, 2), jnp.float32),
            "input_mask": jax.ShapeDtypeStruct((n, cfg.num_lines), bool),
            "num_input": jax.ShapeDtypeStruct((n,), jnp.int32),
            "label": jax.ShapeDtypeStruct(
                (n, cfg.num_lines, cfg.max_face_length), jnp.int32),
            "label_mask": jax.ShapeDtypeStruct(
                (n, cfg.num_lines, cfg.max_face_length), bool),
            "num_faces": jax.ShapeDtypeStruct((n,), jnp.int32),
            "sample_valid": jax.ShapeDtypeStruct((n,), bool),
        }
        rng_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)
        from faceformer_tpu.parallel.mesh import param_partition_specs

        p_specs = jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            param_partition_specs(jax.tree.map(lambda _: 0, params_shape,
                                               is_leaf=lambda x: isinstance(
                                                   x, jax.ShapeDtypeStruct)),
                                  shard_model=True),
            is_leaf=lambda x: isinstance(x, P))
        b_specs = jax.tree.map(lambda _: NamedSharding(mesh, P("data")),
                               batch_shape)
        lowered = jax.jit(
            jax.value_and_grad(loss_fn),
            in_shardings=(p_specs, b_specs, NamedSharding(mesh, P())),
        ).lower(params_shape, batch_shape, rng_shape)
        assert lowered is not None
