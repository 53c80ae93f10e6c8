"""Layer-level parity against torch.nn building blocks.

These tests arrange torch.nn.MultiheadAttention / LayerNorm / Linear in the
DETR pre-LN pattern the reference uses and verify our functional layers
produce the same numbers when loaded with the same weights. This validates
the attention math (q-scaling, additive q/k positional embeds, mask
semantics) and is the foundation the PyTorch checkpoint converter rests on.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from faceformer_tpu.models import layers as L

E, H, FFN, S = 32, 4, 48, 10
N = 3


def make_attn_params(rng):
    def mat():
        return jnp.asarray(rng.standard_normal((E, E)) * 0.1, jnp.float32)

    def vec():
        return jnp.asarray(rng.standard_normal(E) * 0.1, jnp.float32)

    return {
        "wq": mat(), "wk": mat(), "wv": mat(), "wo": mat(),
        "bq": vec(), "bk": vec(), "bv": vec(), "bo": vec(),
    }


def load_torch_mha(p):
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=False)
    with torch.no_grad():
        in_proj = np.concatenate(
            [np.asarray(p["wq"]).T, np.asarray(p["wk"]).T, np.asarray(p["wv"]).T], axis=0)
        mha.in_proj_weight.copy_(torch.tensor(in_proj))
        mha.in_proj_bias.copy_(torch.tensor(
            np.concatenate([np.asarray(p["bq"]), np.asarray(p["bk"]), np.asarray(p["bv"])])))
        mha.out_proj.weight.copy_(torch.tensor(np.asarray(p["wo"]).T))
        mha.out_proj.bias.copy_(torch.tensor(np.asarray(p["bo"])))
    return mha.eval()


class TestMultiheadAttention:
    def test_matches_torch(self, rng):
        p = make_attn_params(rng)
        mha = load_torch_mha(p)
        q = rng.standard_normal((N, S, E)).astype(np.float32)
        kv = rng.standard_normal((N, S, E)).astype(np.float32)
        key_pad = np.zeros((N, S), bool)
        key_pad[:, 7:] = True

        ours = L.multihead_attention(
            p, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), H,
            key_padding_mask=jnp.asarray(key_pad))

        with torch.no_grad():
            theirs, _ = mha(
                torch.tensor(q).transpose(0, 1),
                torch.tensor(kv).transpose(0, 1),
                torch.tensor(kv).transpose(0, 1),
                key_padding_mask=torch.tensor(key_pad))
        np.testing.assert_allclose(
            np.asarray(ours), theirs.transpose(0, 1).numpy(), atol=2e-5)

    def test_causal_mask_matches_torch(self, rng):
        p = make_attn_params(rng)
        mha = load_torch_mha(p)
        x = rng.standard_normal((N, S, E)).astype(np.float32)
        causal = np.triu(np.ones((S, S), bool), k=1)

        ours = L.multihead_attention(
            p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), H,
            attn_mask=jnp.asarray(causal))
        with torch.no_grad():
            theirs, _ = mha(
                torch.tensor(x).transpose(0, 1),
                torch.tensor(x).transpose(0, 1),
                torch.tensor(x).transpose(0, 1),
                attn_mask=torch.tensor(causal))
        np.testing.assert_allclose(
            np.asarray(ours), theirs.transpose(0, 1).numpy(), atol=2e-5)

    def test_broadcast_kv_equals_materialized(self, rng):
        """The anchor-broadcast path must equal explicit memory repetition
        (what the reference does with repeat_interleave)."""
        p = make_attn_params(rng)
        F = 5
        q = jnp.asarray(rng.standard_normal((N, F, S, E)), jnp.float32)
        kv = jnp.asarray(rng.standard_normal((N, 1, S, E)), jnp.float32)
        pad = jnp.zeros((N, 1, S), bool).at[:, :, 6:].set(True)

        broadcast = L.multihead_attention(p, q, kv, kv, H, key_padding_mask=pad)
        tiled = L.multihead_attention(
            p, q, jnp.broadcast_to(kv, (N, F, S, E)), jnp.broadcast_to(kv, (N, F, S, E)),
            H, key_padding_mask=jnp.broadcast_to(pad, (N, F, S)))
        np.testing.assert_allclose(np.asarray(broadcast), np.asarray(tiled), atol=1e-6)


class TestBlocksAgainstTorch:
    def _torch_encoder_layer(self, p):
        """Reference encoder block (pre-LN) from torch.nn primitives."""
        mha = load_torch_mha(p["self_attn"])
        norm1 = torch.nn.LayerNorm(E)
        norm2 = torch.nn.LayerNorm(E)
        lin1 = torch.nn.Linear(E, FFN)
        lin2 = torch.nn.Linear(FFN, E)
        with torch.no_grad():
            norm1.weight.copy_(torch.tensor(np.asarray(p["norm1"]["scale"])))
            norm1.bias.copy_(torch.tensor(np.asarray(p["norm1"]["bias"])))
            norm2.weight.copy_(torch.tensor(np.asarray(p["norm2"]["scale"])))
            norm2.bias.copy_(torch.tensor(np.asarray(p["norm2"]["bias"])))
            lin1.weight.copy_(torch.tensor(np.asarray(p["ffn"]["lin1"]["w"]).T))
            lin1.bias.copy_(torch.tensor(np.asarray(p["ffn"]["lin1"]["b"])))
            lin2.weight.copy_(torch.tensor(np.asarray(p["ffn"]["lin2"]["w"]).T))
            lin2.bias.copy_(torch.tensor(np.asarray(p["ffn"]["lin2"]["b"])))

        def forward(src, pos, key_pad):
            src2 = norm1(src)
            q = k = src2 + pos
            src2 = mha(q, k, src2, key_padding_mask=key_pad)[0]
            src = src + src2
            src2 = norm2(src)
            src2 = lin2(torch.relu(lin1(src2)))
            return src + src2

        return forward

    def test_encoder_layer(self, rng):
        key = jax.random.PRNGKey(0)
        p = L.init_encoder_layer(key, E, FFN)
        x = rng.standard_normal((N, S, E)).astype(np.float32)
        pos = rng.standard_normal((1, S, E)).astype(np.float32)
        key_pad = np.zeros((N, S), bool)
        key_pad[:, 8:] = True

        ours = L.encoder_layer(
            p, jnp.asarray(x), jnp.asarray(pos), jnp.asarray(key_pad),
            num_head=H, dropout_rate=0.0, activation="relu",
            normalize_before=True, rng=None)

        fwd = self._torch_encoder_layer(p)
        with torch.no_grad():
            theirs = fwd(
                torch.tensor(x).transpose(0, 1),
                torch.tensor(pos).transpose(0, 1),
                torch.tensor(key_pad))
        np.testing.assert_allclose(
            np.asarray(ours), theirs.transpose(0, 1).numpy(), atol=3e-5)

    def test_decoder_layer(self, rng):
        key = jax.random.PRNGKey(1)
        p = L.init_decoder_layer(key, E, FFN)
        T = 6
        tgt = rng.standard_normal((N, T, E)).astype(np.float32)
        mem = rng.standard_normal((N, S, E)).astype(np.float32)
        qpos = rng.standard_normal((1, T, E)).astype(np.float32)
        pos = rng.standard_normal((1, S, E)).astype(np.float32)
        mem_pad = np.zeros((N, S), bool)
        mem_pad[:, 7:] = True
        tgt_pad = np.zeros((N, T), bool)
        tgt_pad[:, 4:] = True
        causal = np.triu(np.ones((T, T), bool), k=1)

        ours = L.decoder_layer(
            p, jnp.asarray(tgt), jnp.asarray(mem), jnp.asarray(qpos), jnp.asarray(pos),
            num_head=H, dropout_rate=0.0, activation="relu", normalize_before=True,
            tgt_mask=jnp.asarray(causal), tgt_key_padding_mask=jnp.asarray(tgt_pad),
            memory_key_padding_mask=jnp.asarray(mem_pad), rng=None)

        sa = load_torch_mha(p["self_attn"])
        ca = load_torch_mha(p["cross_attn"])
        norms = {}
        for name in ("norm1", "norm2", "norm3"):
            ln = torch.nn.LayerNorm(E)
            with torch.no_grad():
                ln.weight.copy_(torch.tensor(np.asarray(p[name]["scale"])))
                ln.bias.copy_(torch.tensor(np.asarray(p[name]["bias"])))
            norms[name] = ln
        lin1 = torch.nn.Linear(E, FFN)
        lin2 = torch.nn.Linear(FFN, E)
        with torch.no_grad():
            lin1.weight.copy_(torch.tensor(np.asarray(p["ffn"]["lin1"]["w"]).T))
            lin1.bias.copy_(torch.tensor(np.asarray(p["ffn"]["lin1"]["b"])))
            lin2.weight.copy_(torch.tensor(np.asarray(p["ffn"]["lin2"]["w"]).T))
            lin2.bias.copy_(torch.tensor(np.asarray(p["ffn"]["lin2"]["b"])))

        with torch.no_grad():
            t = torch.tensor(tgt).transpose(0, 1)
            m = torch.tensor(mem).transpose(0, 1)
            qp = torch.tensor(qpos).transpose(0, 1)
            pp = torch.tensor(pos).transpose(0, 1)
            t2 = norms["norm1"](t)
            q = k = t2 + qp
            t = t + sa(q, k, t2, attn_mask=torch.tensor(causal),
                       key_padding_mask=torch.tensor(tgt_pad))[0]
            t2 = norms["norm2"](t)
            t = t + ca(t2 + qp, m + pp, m,
                       key_padding_mask=torch.tensor(mem_pad))[0]
            t2 = norms["norm3"](t)
            t = t + lin2(torch.relu(lin1(t2)))
        np.testing.assert_allclose(
            np.asarray(ours), t.transpose(0, 1).numpy(), atol=3e-5)
