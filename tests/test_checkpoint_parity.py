"""End-to-end checkpoint parity: export our params to the reference's torch
state-dict layout, rebuild the model from torch.nn primitives following the
documented reference conventions, run the reference's greedy eval procedure
in torch, and demand IDENTICAL prediction grids from our 'reference'-mode
decode engine.

This is the north-star test for "identical JSON predictions from ported
checkpoints": it exercises the converter (packed qkv, transposes, module
paths), the embedding/pointer alignment, the decoder conventions, and both
eval loops' quirky stop logic, with no reference code involved.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from faceformer_tpu.data.batching import collate
from faceformer_tpu.data.dataset import ABCDataset, ABCDatasetParallel
from faceformer_tpu.decode import greedy_decode_parallel, greedy_decode_single
from faceformer_tpu.geometry.fixtures import build_sample, make_box, make_prism
from faceformer_tpu.models.parallel import SurfaceFormerParallel
from faceformer_tpu.models.surfaceformer import SurfaceFormer
from faceformer_tpu.train.checkpoint import export_torch_state_dict


class TorchReferenceModel(torch.nn.Module):
    """The reference architecture from torch.nn primitives: DETR-style
    pre-LN layers with positions added at q/k, pointer-gather decoding."""

    def __init__(self, cfg, state_dict):
        super().__init__()
        e, h = cfg.num_model, cfg.num_head
        self.cfg = cfg
        self.e, self.h = e, h

        def ten(name):
            return torch.tensor(np.asarray(state_dict["model." + name]))

        self.token_table = ten("val_enc.embedding_token.weight")
        self.mlp_w1 = ten("val_enc.embedding_value.0.weight")
        self.mlp_b1 = ten("val_enc.embedding_value.0.bias")
        self.mlp_w2 = ten("val_enc.embedding_value.2.weight")
        self.mlp_b2 = ten("val_enc.embedding_value.2.bias")
        self.pos = ten("pos_enc.pos_embed.weight")
        self.qpos = ten("query_pos_enc.pos_embed.weight")
        self.proj_w = ten("project.weight")
        self.proj_b = ten("project.bias")

        def mha(prefix):
            m = torch.nn.MultiheadAttention(e, h, dropout=0.0)
            with torch.no_grad():
                m.in_proj_weight.copy_(ten(prefix + ".in_proj_weight"))
                m.in_proj_bias.copy_(ten(prefix + ".in_proj_bias"))
                m.out_proj.weight.copy_(ten(prefix + ".out_proj.weight"))
                m.out_proj.bias.copy_(ten(prefix + ".out_proj.bias"))
            return m.eval()

        def ln(name):
            m = torch.nn.LayerNorm(e)
            with torch.no_grad():
                m.weight.copy_(ten(name + ".weight"))
                m.bias.copy_(ten(name + ".bias"))
            return m.eval()

        def lin(name):
            w, b = ten(name + ".weight"), ten(name + ".bias")
            return lambda x: x @ w.T + b

        self.enc_layers = []
        for i in range(cfg.num_encoder_layers):
            base = f"encoder.layers.{i}"
            self.enc_layers.append(dict(
                sa=mha(base + ".self_attn"), n1=ln(base + ".norm1"),
                n2=ln(base + ".norm2"), l1=lin(base + ".linear1"),
                l2=lin(base + ".linear2")))
        self.enc_norm = ln("encoder.norm")
        self.dec_layers = []
        for i in range(cfg.num_decoder_layers):
            base = f"decoder.layers.{i}"
            self.dec_layers.append(dict(
                sa=mha(base + ".self_attn"), ca=mha(base + ".multihead_attn"),
                n1=ln(base + ".norm1"), n2=ln(base + ".norm2"),
                n3=ln(base + ".norm3"), l1=lin(base + ".linear1"),
                l2=lin(base + ".linear2")))
        self.dec_norm = ln("decoder.norm")

    @torch.no_grad()
    def encode(self, inputs, input_mask):
        n = inputs.shape[0]
        tok = self.token_table[None].expand(n, -1, -1)
        flat = inputs.flatten(-2)
        edge = torch.relu(flat @ self.mlp_w1.T + self.mlp_b1) @ self.mlp_w2.T + self.mlp_b2
        x = torch.cat([tok, edge], dim=1).transpose(0, 1)  # (S, N, E)
        s = x.shape[0]
        pos = self.pos[:s, None, :]
        pad = torch.cat(
            [torch.zeros(n, self.cfg.token.length, dtype=torch.bool), input_mask], dim=1)
        for lp in self.enc_layers:
            x2 = lp["n1"](x)
            qk = x2 + pos
            x = x + lp["sa"](qk, qk, x2, key_padding_mask=pad)[0]
            x2 = lp["n2"](x)
            x = x + lp["l2"](torch.relu(lp["l1"](x2)))
        return self.enc_norm(x), pos, pad

    @torch.no_grad()
    def run_decoder(self, tgt, memory, qpos, pos, mem_pad):
        """Reference eval decoder: NO causal mask (model.py:199-201)."""
        x = tgt
        for lp in self.dec_layers:
            x2 = lp["n1"](x)
            qk = x2 + qpos
            x = x + lp["sa"](qk, qk, x2)[0]
            x2 = lp["n2"](x)
            x = x + lp["ca"](x2 + qpos, memory + pos, memory,
                             key_padding_mask=mem_pad)[0]
            x2 = lp["n3"](x)
            x = x + lp["l2"](torch.relu(lp["l1"](x2)))
        return self.dec_norm(x)

    @torch.no_grad()
    def select_next(self, memory, pointer_last, mem_pad):
        logits = torch.einsum("sne,ne->ns", memory, pointer_last)
        logits = logits.masked_fill(mem_pad, torch.finfo(logits.dtype).min)
        return logits.argmax(dim=1)

    @torch.no_grad()
    def decode_single(self, inputs, input_mask):
        """Reference model.py:169-219 forward_eval."""
        tok = self.cfg.token
        memory, pos, pad = self.encode(inputs, input_mask)
        n = inputs.shape[0]
        t_max = self.cfg.label_seq_length
        predicts = torch.full((1, n), tok.SOS, dtype=torch.long)
        eos_found = 0
        for step in range(t_max - 1):
            gathered = memory.gather(
                0, predicts[..., None].expand(-1, -1, self.e))
            qpos = self.qpos[: step + 1, None, :]
            out = self.run_decoder(gathered, memory, qpos, pos, pad)
            pointer = out[-1] @ self.proj_w.T + self.proj_b
            nxt = self.select_next(memory, pointer, pad)
            predicts = torch.cat([predicts, nxt[None]], dim=0)
            eos_found += int((nxt == tok.EOS).sum())
            if eos_found == n:
                break
        full = torch.zeros(t_max, n, dtype=torch.long)
        full[: predicts.shape[0]] = predicts
        return full.T  # (N, T)

    @torch.no_grad()
    def decode_parallel(self, inputs, input_mask, num_input):
        """Reference model_para.py:181-241 forward_eval."""
        tok = self.cfg.token
        memory, pos, pad = self.encode(inputs, input_mask)
        n = inputs.shape[0]
        f = self.cfg.num_lines
        t_max = self.cfg.max_face_length
        anchors = torch.arange(f)[None].repeat(n, 1)
        for i, num in enumerate(num_input):
            anchors[i, int(num):] = tok.length - 1
        predicts = anchors.reshape(1, n * f)  # (1, N*F), sample-major
        mem_rep = memory.repeat_interleave(f, dim=1)
        pos_rep = pos  # broadcasts over batch
        pad_rep = pad.repeat_interleave(f, dim=0)
        for step in range(t_max - 1):
            gathered = mem_rep.gather(
                0, predicts[..., None].expand(-1, -1, self.e))
            qpos = self.qpos[: step + 1, None, :]
            out = self.run_decoder(gathered, mem_rep, qpos, pos_rep, pad_rep)
            pointer = out[-1] @ self.proj_w.T + self.proj_b
            nxt = self.select_next(mem_rep, pointer, pad_rep)
            predicts = torch.cat([predicts, nxt[None]], dim=0)
            if bool((nxt < tok.length).all()):
                break
        full = torch.zeros(t_max, n * f, dtype=torch.long)
        full[: predicts.shape[0]] = predicts
        return full.T.reshape(n, f, t_max)


@pytest.fixture(scope="module")
def fixture_batches(tiny_model_cfg):
    samples = [
        build_sample(make_box(), theta=25.0, phi=45.0),
        build_sample(make_prism(5), theta=110.0, phi=30.0),
    ]
    flat = [
        build_sample(make_box(), theta=25.0, phi=45.0, coedge=False),
        build_sample(make_prism(5), theta=110.0, phi=30.0, coedge=False),
    ]
    para = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
    single = ABCDataset.from_samples(flat, tiny_model_cfg)
    return collate([para[0], para[1]]), collate([single[0], single[1]])


class TestFullModelParity:
    def test_parallel_decode_identical(self, tiny_model_cfg, fixture_batches):
        batch, _ = fixture_batches
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(11), tiny_model_cfg)
        ours = np.asarray(greedy_decode_parallel(
            params, tiny_model_cfg, batch, mode="reference")["predict"])

        sd = export_torch_state_dict(params)
        model = TorchReferenceModel(tiny_model_cfg, sd)
        theirs = model.decode_parallel(
            torch.tensor(np.asarray(batch["input"])),
            torch.tensor(np.asarray(batch["input_mask"])),
            np.asarray(batch["num_input"])).numpy()
        mismatch = (ours != theirs).mean()
        np.testing.assert_array_equal(ours, theirs, err_msg=f"mismatch {mismatch:.4f}")

    def test_single_decode_identical(self, tiny_model_cfg, fixture_batches):
        _, batch = fixture_batches
        params = SurfaceFormer.init(jax.random.PRNGKey(12), tiny_model_cfg)
        ours = np.asarray(greedy_decode_single(
            params, tiny_model_cfg, batch, mode="reference",
            retire_rows=False)["predict"])  # torch twin uses the count stop

        sd = export_torch_state_dict(params)
        model = TorchReferenceModel(tiny_model_cfg, sd)
        theirs = model.decode_single(
            torch.tensor(np.asarray(batch["input"])),
            torch.tensor(np.asarray(batch["input_mask"]))).numpy()
        np.testing.assert_array_equal(ours, theirs)
