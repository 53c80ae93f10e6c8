"""Tensor-parallel correctness: the Megatron-style PartitionSpecs in
parallel/mesh.py (shard_model=True) must be a pure layout change — loss,
gradients, and greedy decode outputs must match the replicated run.

Runs on the 8-virtual-CPU-device backend (conftest.py) with a 2x2
data x model mesh, the same shape dryrun_multichip exercises.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faceformer_tpu.data.batching import collate
from faceformer_tpu.data.dataset import ABCDatasetParallel
from faceformer_tpu.decode import greedy_decode_parallel
from faceformer_tpu.geometry.fixtures import random_sample
from faceformer_tpu.models.parallel import SurfaceFormerParallel
from faceformer_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from faceformer_tpu.train.loss import pointer_cross_entropy


@pytest.fixture(scope="module")
def batch(tiny_model_cfg):
    rng = np.random.default_rng(11)
    samples = [random_sample(rng) for _ in range(4)]
    ds = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
    b = collate([ds[i] for i in range(4)])
    return {k: v for k, v in b.items() if not isinstance(v, (list, str))}


@pytest.fixture(scope="module")
def params(tiny_model_cfg):
    return SurfaceFormerParallel.init(jax.random.PRNGKey(0), tiny_model_cfg)


def _loss_and_grads(params, cfg, batch):
    def loss_fn(p):
        out = SurfaceFormerParallel.forward_train(p, cfg, batch, rng=None)
        return pointer_cross_entropy(out, cfg.token)[0]

    return jax.jit(jax.value_and_grad(loss_fn))(params)


class TestTensorParallel:
    def test_loss_and_grads_match_replicated(self, params, batch, tiny_model_cfg):
        cfg = tiny_model_cfg
        ref_loss, ref_grads = _loss_and_grads(params, cfg, batch)

        mesh = make_mesh(4, model_axis=2)
        tp_params = shard_params(params, mesh, shard_model=True)
        tp_batch = shard_batch(batch, mesh)
        # params really are laid out over the model axis, not replicated
        wq = tp_params["decoder"]["layers"]["self_attn"]["wq"]
        assert not wq.sharding.is_fully_replicated

        tp_loss, tp_grads = _loss_and_grads(tp_params, cfg, tp_batch)

        np.testing.assert_allclose(
            np.asarray(tp_loss), np.asarray(ref_loss), rtol=1e-5, atol=1e-5)
        flat_ref = jax.tree.leaves(ref_grads)
        flat_tp = jax.tree.leaves(tp_grads)
        assert len(flat_ref) == len(flat_tp)
        for a, b in zip(flat_ref, flat_tp):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)

    def test_decode_matches_replicated(self, params, batch, tiny_model_cfg):
        cfg = tiny_model_cfg
        ref = np.asarray(greedy_decode_parallel(
            params, cfg, batch, precision="fp32", mode="causal_cache")["predict"])

        mesh = make_mesh(4, model_axis=2)
        tp_params = shard_params(params, mesh, shard_model=True)
        tp_batch = shard_batch(batch, mesh)
        tp = np.asarray(greedy_decode_parallel(
            tp_params, cfg, tp_batch, precision="fp32",
            mode="causal_cache")["predict"])

        # integer token grids; reduction-order ulps could in principle flip a
        # tied argmax, but random weights make exact ties vanishingly rare
        np.testing.assert_array_equal(tp, ref)


class TestShardOptState:
    def test_opt_state_mirrors_param_specs(self, params):
        # restored optimizer state must land on the mesh with the SAME
        # partition specs as the params (Adam mu/nu are param-shaped);
        # scalars (count) replicate
        import optax

        from faceformer_tpu.parallel.mesh import shard_opt_state

        mesh = make_mesh(4, model_axis=2)
        sharded = shard_params(params, mesh, shard_model=True)
        opt_state = optax.adam(1e-3).init(params)
        # simulate a restore: host numpy leaves
        host = jax.tree.map(np.asarray, opt_state)
        placed = shard_opt_state(host, sharded, mesh, shard_model=True)

        mu = placed[0].mu
        for pleaf, mleaf in zip(jax.tree.leaves(sharded), jax.tree.leaves(mu)):
            assert mleaf.sharding == pleaf.sharding, (
                f"{mleaf.sharding} != {pleaf.sharding}")
        assert placed[0].count.sharding.is_fully_replicated
        # values survive placement
        for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(placed)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
