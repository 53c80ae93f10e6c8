"""Shared model core: parameter init, encoder pass, pointer scoring.

Both SurfaceFormer variants share the same encoder/embedding/pointer
machinery (reference: model.py:12-96 vs model_para.py:12-97 are near-twins);
here it lives once.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from faceformer_tpu.config import ModelConfig
from faceformer_tpu.models import layers as L
from faceformer_tpu.models.embedding import (
    init_position_table,
    init_vanilla_embedding,
    position_embedding,
    vanilla_embedding,
)

Params = Dict[str, Any]


def compute_dtype(precision: str):
    return jnp.bfloat16 if precision in ("bf16", "16", 16) else jnp.float32


def init_params(key: jax.Array, cfg: ModelConfig, query_pos_len: int) -> Params:
    """Initialize the full parameter tree.

    query_pos_len is label_seq_length for the flat model and max_face_length
    for the parallel model (reference: model.py:31-32, model_para.py:31-33).
    """
    ke, kp, kq, kenc, kdec, kproj = jax.random.split(key, 6)
    dim, ffn = cfg.num_model, cfg.num_feedforward
    return {
        "embed": init_vanilla_embedding(
            ke, cfg.num_points_per_line * cfg.point_dim, dim, cfg.token.length),
        "pos_table": init_position_table(kp, cfg.num_lines + cfg.token.length, dim),
        "query_pos_table": init_position_table(kq, query_pos_len, dim),
        "encoder": {
            "layers": L.init_stack(kenc, cfg.num_encoder_layers,
                                   lambda k: L.init_encoder_layer(k, dim, ffn)),
            "norm": L.init_layer_norm(dim),
        },
        "decoder": {
            "layers": L.init_stack(kdec, cfg.num_decoder_layers,
                                   lambda k: L.init_decoder_layer(k, dim, ffn)),
            "norm": L.init_layer_norm(dim),
        },
        "project": L.init_linear(kproj, dim, dim),
    }


def pad_input_mask(input_mask: jnp.ndarray, num_tokens: int) -> jnp.ndarray:
    """Prepend ``num_tokens`` unmasked slots for the special-token rows
    (reference: model.py:61-66 process_masks)."""
    pad = jnp.zeros((*input_mask.shape[:-1], num_tokens), dtype=input_mask.dtype)
    return jnp.concatenate([pad, input_mask], axis=-1)


def encode(
    params: Params,
    cfg: ModelConfig,
    inputs: jnp.ndarray,
    input_mask: jnp.ndarray,
    rng: Optional[jax.Array],
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Embed + encode. Returns (memory (N, 4+L, E), pos (1, 4+L, E),
    padded key mask (N, 4+L))."""
    x = vanilla_embedding(params["embed"], inputs.astype(dtype))
    pos = position_embedding(params["pos_table"], x.shape[1], dtype)
    padded_mask = pad_input_mask(input_mask, cfg.token.length)
    memory = L.encoder_forward(
        params["encoder"], x, pos, padded_mask,
        num_head=cfg.num_head, dropout_rate=cfg.dropout,
        activation=cfg.activation, normalize_before=cfg.normalize_before,
        rng=rng, remat=cfg.remat, remat_policy=cfg.remat_policy)
    return memory, pos, padded_mask


def pad_target_time(
    target: jnp.ndarray, tgt_key_padding: jnp.ndarray, t: int
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad the face-token (time) axis to a sublane multiple (8) ONCE before
    the decoder stack. Without this every flash-attention call pads its own
    query axis — 3 pads plus a slice of a ~260 MB tensor per decoder layer
    at flagship dims. Padded positions carry PAD tokens and a True
    key-padding mask, and sit AFTER every real position, so causal
    attention leaves real outputs bit-identical; callers slice the pointer
    output back to t."""
    t_pad = -(-t // 8) * 8
    if t_pad == t:
        return target, tgt_key_padding, t_pad
    width = [(0, 0)] * (target.ndim - 1) + [(0, t_pad - t)]
    return (jnp.pad(target, width),
            jnp.pad(tgt_key_padding, width, constant_values=True), t_pad)


def padded_query_pos(table: jnp.ndarray, t: int, t_pad: int, dtype) -> jnp.ndarray:
    """First t learned query positions, zero-padded to t_pad rows."""
    qp = table[:t].astype(dtype)
    if t_pad != t:
        qp = jnp.pad(qp, ((0, t_pad - t), (0, 0)))
    return qp


def gather_memory_rows(memory: jnp.ndarray, token_ids: jnp.ndarray) -> jnp.ndarray:
    """Decoder inputs are rows of encoder memory at token indices — the
    pointer-network trick (reference: model.py:147, model_para.py:155).

    memory: (N, S, E); token_ids: (N, ...) integer grid. Returns
    (N, ..., E). Plain gather; no repeat_interleave copies.
    """
    flat = token_ids.reshape(token_ids.shape[0], -1)  # (N, R)
    rows = jnp.take_along_axis(memory, flat[..., None], axis=1)  # (N, R, E)
    return rows.reshape(*token_ids.shape, memory.shape[-1])


def pointer_logits(memory: jnp.ndarray, pointer: jnp.ndarray) -> jnp.ndarray:
    """Pointer scores against every memory row (reference: trainer.py:65).

    memory: (N, S, E); pointer: (N, ..., E) -> logits (N, S, ...) with the
    class axis at position 1, matching the reference's cross-entropy layout.
    Accumulates in fp32 on the MXU.
    """
    flat = pointer.reshape(pointer.shape[0], -1, pointer.shape[-1])
    logits = jnp.einsum("nse,nre->nsr", memory, flat,
                        preferred_element_type=jnp.float32)
    return logits.reshape(memory.shape[0], memory.shape[1], *pointer.shape[1:-1])


def masked_argmax(
    memory: jnp.ndarray, pointer_vec: jnp.ndarray, padded_mask: jnp.ndarray
) -> jnp.ndarray:
    """Greedy next-token pick: dot against memory rows, mask padded rows with
    the dtype's lowest value, argmax (reference: model.py:161-167
    select_next). memory (N, S, E), pointer_vec (N, ..., E) -> (N, ...)."""
    from faceformer_tpu import ops

    if ops.enabled() and padded_mask.ndim == 2:
        from faceformer_tpu.ops.pointer import pointer_argmax_batched

        return pointer_argmax_batched(pointer_vec, memory, padded_mask,
                                      interpret=ops.interpret_mode())
    logits = jnp.einsum("nse,n...e->n...s", memory, pointer_vec,
                        preferred_element_type=jnp.float32)
    mask = padded_mask.reshape(padded_mask.shape[0], *([1] * (logits.ndim - 2)), -1)
    logits = jnp.where(mask, L.big_neg(logits.dtype), logits)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
