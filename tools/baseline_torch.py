"""PyTorch-CPU baseline: reference-procedure decode throughput.

Builds the reference architecture from torch.nn primitives (MultiheadAttention
arranged in the DETR pre-LN pattern, pointer-gather decoding) and times the
reference's eval procedure — full-prefix decoder re-runs with NO causal mask
and NO KV cache, batch size 1 (reference: faceformer/trainer.py:51,106-112,
models/model_para.py:181-241). Writes benchmarks/baseline_torch_cpu.json,
which bench.py uses as the vs_baseline denominator.

This is a measurement harness written against the documented reference
behavior, not a copy of the reference implementation.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch
import torch.nn as nn

from faceformer_tpu.config import load_config
from faceformer_tpu.geometry.fixtures import random_sample
from faceformer_tpu.data.dataset import ABCDatasetParallel
from faceformer_tpu.data.batching import collate


class TorchPointerDecoder(nn.Module):
    """Reference-equivalent model assembled from torch.nn building blocks."""

    def __init__(self, cfg):
        super().__init__()
        e, h, ffn = cfg.num_model, cfg.num_head, cfg.num_feedforward
        self.cfg = cfg
        self.token_table = nn.Embedding(cfg.token.length, e)
        self.edge_mlp = nn.Sequential(
            nn.Linear(cfg.num_points_per_line * cfg.point_dim, e), nn.ReLU(),
            nn.Linear(e, e))
        self.pos = nn.Embedding(cfg.num_lines + cfg.token.length, e)
        self.query_pos = nn.Embedding(cfg.max_face_length, e)
        enc_layer = nn.TransformerEncoderLayer(
            e, h, ffn, dropout=0.0, batch_first=True, norm_first=True)
        self.encoder = nn.TransformerEncoder(enc_layer, cfg.num_encoder_layers,
                                             norm=nn.LayerNorm(e))
        dec_layer = nn.TransformerDecoderLayer(
            e, h, ffn, dropout=0.0, batch_first=True, norm_first=True)
        self.decoder = nn.TransformerDecoder(dec_layer, cfg.num_decoder_layers,
                                             norm=nn.LayerNorm(e))
        self.project = nn.Linear(e, e)

    @torch.no_grad()
    def decode_sample(self, inputs, input_mask, num_input):
        cfg = self.cfg
        tok_embed = self.token_table.weight[None]  # (1, 4, E)
        edge_embed = self.edge_mlp(inputs.flatten(-2))  # (1, L, E)
        x = torch.cat([tok_embed, edge_embed], dim=1)
        s = x.shape[1]
        x = x + self.pos.weight[None, :s]
        pad = torch.cat(
            [torch.zeros(1, cfg.token.length, dtype=torch.bool), input_mask], dim=1)
        memory = self.encoder(x, src_key_padding_mask=pad)

        f = cfg.num_lines
        anchors = torch.arange(f)
        anchors = torch.where(anchors < num_input, anchors,
                              torch.tensor(cfg.token.length - 1))
        tokens = anchors[None, :, None]  # (1, F, 1)

        # reference eval: per step, gather memory rows for the WHOLE prefix
        # and re-run the decoder with no causal mask, no KV cache
        mem_rep = memory.expand(f, -1, -1)  # anchor-expanded memory
        pad_rep = pad.expand(f, -1)
        for step in range(cfg.max_face_length - 1):
            flat = tokens[0]  # (F, T_cur)
            tgt = memory[0][flat]  # (F, T_cur, E)
            tgt = tgt + self.query_pos.weight[None, : tgt.shape[1]]
            out = self.decoder(tgt, mem_rep, memory_key_padding_mask=pad_rep)
            pointer = self.project(out[:, -1])  # (F, E)
            logits = memory[0] @ pointer.T  # (S, F)
            logits = logits.masked_fill(pad[0][:, None], torch.finfo(logits.dtype).min)
            nxt = logits.argmax(dim=0)  # (F,)
            tokens = torch.cat([tokens, nxt[None, :, None]], dim=2)
            # full-length decode: matches bench.py's early_stop=False so both
            # sides measure the same worst-case work per face
        return tokens


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=4)
    parser.add_argument("--out", default="benchmarks/baseline_torch_cpu.json")
    args = parser.parse_args()

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "ours.yml")).model
    torch.manual_seed(0)
    model = TorchPointerDecoder(cfg).eval()

    rng = np.random.default_rng(3)
    ds = ABCDatasetParallel.from_samples(
        [random_sample(rng) for _ in range(args.samples)], cfg)

    # batch size 1, like the reference test loop (trainer.py:51)
    per_sample = []
    total_faces = 0
    for i in range(args.samples):
        item = collate([ds[i]])
        inputs = torch.tensor(item["input"])
        mask = torch.tensor(item["input_mask"])
        t0 = time.perf_counter()
        model.decode_sample(inputs, mask, int(item["num_input"][0]))
        per_sample.append(time.perf_counter() - t0)
        total_faces += cfg.num_lines
    total_time = sum(per_sample)

    result = {
        "face_seqs_per_sec": total_faces / total_time,
        "avg_time_per_sample": total_time / args.samples,
        "per_sample_seconds": [round(t, 2) for t in per_sample],
        "std_seconds": round(float(np.std(per_sample)), 2),
        "samples": args.samples,
        "procedure": "reference eval loop: batch=1, full-prefix re-run, no KV cache",
        "hardware": "CPU (torch, single process)",
        "model_dims": {"num_lines": cfg.num_lines, "num_model": cfg.num_model,
                       "layers": [cfg.num_encoder_layers, cfg.num_decoder_layers],
                       "max_face_length": cfg.max_face_length},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
