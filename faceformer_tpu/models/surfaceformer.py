"""SurfaceFormer: the flat single-sequence pointer network.

All faces of a wireframe decode as one token stream
[SOS, face1..., SEP, face2..., ..., EOS] whose tokens point at encoder
memory rows (reference: faceformer/models/model.py).
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
    masked_argmax,
    pad_target_time,
    padded_query_pos,
    pointer_logits,
)

Params = Dict[str, Any]


class SurfaceFormer:
    """Pure-functional model namespace: init + apply functions, no state."""

    is_parallel = False

    @staticmethod
    def init(key: jax.Array, cfg: ModelConfig) -> Params:
        return init_params(key, cfg, query_pos_len=cfg.label_seq_length)

    @staticmethod
    def forward_train(
        params: Params,
        cfg: ModelConfig,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        precision: str = "fp32",
        scheduled_sampling_ratio: float = 0.0,
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced training pass (reference: model.py:98-159).

        batch: input (N, L, P, D), label (N, T), input_mask (N, L),
        label_mask (N, T). Returns embedding (N, 4+L, E),
        pointer (N, T-1, E), label (N, T-1) — the shifted targets.
        """
        dtype = compute_dtype(precision)
        label = batch["label"].astype(jnp.int32)
        r_enc, r_dec, r_ss = (
            jax.random.split(rng, 3) if rng is not None else (None, None, None)
        )

        memory, pos, padded_mask = encode(
            params, cfg, batch["input"], batch["input_mask"], r_enc, dtype)

        target, shifted_label = label[:, :-1], label[:, 1:]
        tgt_key_padding = batch["label_mask"][:, :-1]
        t = target.shape[1]
        target, tgt_key_padding, t_pad = pad_target_time(
            target, tgt_key_padding, t)
        tgt_mask = L.causal_mask(t_pad)
        query_pos = padded_query_pos(
            params["query_pos_table"], t, t_pad, dtype)[None]

        def run_decoder(tokens, dec_rng):
            tgt = gather_memory_rows(memory, tokens)
            out = L.decoder_forward(
                params["decoder"], tgt, memory, query_pos, pos,
                num_head=cfg.num_head, dropout_rate=cfg.dropout,
                activation=cfg.activation, normalize_before=cfg.normalize_before,
                tgt_mask=tgt_mask, tgt_key_padding_mask=tgt_key_padding,
                memory_key_padding_mask=padded_mask, rng=dec_rng,
                remat=cfg.remat, remat_policy=cfg.remat_policy)
            return L.linear(params["project"], out)

        if scheduled_sampling_ratio > 0.0 and rng is not None:
            # sample model predictions with no gradient, then mix with gold
            # (reference: model.py:122-140, mix_gold_sampled model.py:87-96)
            pointer = jax.lax.stop_gradient(run_decoder(target, None))
            logits = pointer_logits(memory, pointer)
            logits = jnp.where(
                padded_mask[:, :, None], L.big_neg(logits.dtype), logits)
            sampled = jnp.argmax(logits, axis=1).astype(jnp.int32)
            # shift sampled right so position t sees the sample for t-1
            sampled = jnp.concatenate([target[:, :1], sampled[:, :-1]], axis=1)
            use_sampled = (
                jax.random.uniform(r_ss, target.shape) < scheduled_sampling_ratio)
            target = jnp.where(use_sampled, sampled, target)

        pointer = run_decoder(target, r_dec)[:, :t]
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
        retire_rows: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Greedy decode (reference: model.py:169-219). Dispatches to the
        decode engine; returns predict (N, T) token grid."""
        from faceformer_tpu.decode import greedy_decode_single

        return greedy_decode_single(params, cfg, batch, precision=precision,
                                    mode=mode, retire_rows=retire_rows)

    # convenience used by eval paths
    select_next = staticmethod(masked_argmax)
