"""SurfaceFormer_Parallel: per-edge-anchor simultaneous face decoding.

Every edge index is the start token of its own face sequence; all sequences
decode at once (reference: faceformer/models/model_para.py). The reference
materializes memory.repeat_interleave(max_num_edges, 1) — an O(L x N*F x E)
copy (model_para.py:122,212). Here the anchor axis F is a broadcast dim of
the attention einsum, so memory stays (N, 4+L, E).

Static-shape note: the reference trims label rows to the batch's max edge
count (model_para.py:104-105) and uses that dynamic F everywhere. On TPU we
keep F = num_lines static. This is loss-equivalent (rows past the real
rotations carry a bare Other token whose shifted target is all-PAD, hence
zero loss) and prediction-equivalent (extra anchor rows parse to empty faces
and are dropped, trainer.py:181-208 semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from faceformer_tpu.config import ModelConfig
from faceformer_tpu.models import layers as L
from faceformer_tpu.models.common import (
    compute_dtype,
    encode,
    gather_memory_rows,
    init_params,
    pad_target_time,
    padded_query_pos,
    pointer_logits,
)

Params = Dict[str, Any]


class SurfaceFormerParallel:
    is_parallel = True

    @staticmethod
    def init(key: jax.Array, cfg: ModelConfig) -> Params:
        return init_params(key, cfg, query_pos_len=cfg.max_face_length)

    @staticmethod
    def forward_train(
        params: Params,
        cfg: ModelConfig,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        precision: str = "fp32",
        scheduled_sampling_ratio: float = 0.0,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced pass over all anchor rows
        (reference: model_para.py:99-171).

        batch: input (N, L, P, D), label (N, F, T), input_mask (N, L),
        label_mask (N, F, T) with F == num_lines. Returns
        embedding (N, 4+L, E), pointer (N, F, T-1, E), label (N, F, T-1).
        """
        dtype = compute_dtype(precision)
        label = batch["label"].astype(jnp.int32)
        r_enc, r_dec, r_ss = (
            jax.random.split(rng, 3) if rng is not None else (None, None, None)
        )

        memory, pos, padded_mask = encode(
            params, cfg, batch["input"], batch["input_mask"], r_enc, dtype)

        target, shifted_label = label[:, :, :-1], label[:, :, 1:]
        tgt_key_padding = batch["label_mask"][:, :, :-1]  # (N, F, T-1)
        t = target.shape[-1]
        target, tgt_key_padding, t_pad = pad_target_time(
            target, tgt_key_padding, t)
        tgt_mask = L.causal_mask(t_pad)
        query_pos = padded_query_pos(
            params["query_pos_table"], t, t_pad, dtype)[None, None]

        # broadcast memory across the anchor axis instead of repeating it
        mem_b = memory[:, None]  # (N, 1, 4+L, E)
        pos_b = pos[:, None]
        mem_pad_b = padded_mask[:, None]

        def run_decoder(tokens, dec_rng):
            tgt = gather_memory_rows(memory, tokens)  # (N, F, T-1, E)
            out = L.decoder_forward(
                params["decoder"], tgt, mem_b, query_pos, pos_b,
                num_head=cfg.num_head, dropout_rate=cfg.dropout,
                activation=cfg.activation, normalize_before=cfg.normalize_before,
                tgt_mask=tgt_mask, tgt_key_padding_mask=tgt_key_padding,
                memory_key_padding_mask=mem_pad_b, rng=dec_rng,
                remat=cfg.remat, remat_policy=cfg.remat_policy)
            return L.linear(params["project"], out)

        if scheduled_sampling_ratio > 0.0 and rng is not None:
            pointer = jax.lax.stop_gradient(run_decoder(target, None))
            logits = pointer_logits(memory, pointer)  # (N, S, F, T-1)
            logits = jnp.where(
                padded_mask[:, :, None, None], L.big_neg(logits.dtype), logits)
            sampled = jnp.argmax(logits, axis=1).astype(jnp.int32)
            sampled = jnp.concatenate([target[..., :1], sampled[..., :-1]], axis=-1)
            use_sampled = (
                jax.random.uniform(r_ss, target.shape) < scheduled_sampling_ratio)
            target = jnp.where(use_sampled, sampled, target)

        pointer = run_decoder(target, r_dec)[:, :, :t]
        return {
            "embedding": memory,
            "pointer": pointer,
            "label": shifted_label,
        }

    @staticmethod
    def forward_eval(
        params: Params,
        cfg: ModelConfig,
        batch: Dict[str, jnp.ndarray],
        precision: str = "fp32",
        mode: str = "reference",
        anchor_mode: str = "reference",
    ) -> Dict[str, jnp.ndarray]:
        """Anchor-parallel greedy decode (reference: model_para.py:181-241).
        Returns predict (N, F, T) token grids."""
        from faceformer_tpu.decode import greedy_decode_parallel

        return greedy_decode_parallel(params, cfg, batch, precision=precision,
                                      mode=mode, anchor_mode=anchor_mode)
