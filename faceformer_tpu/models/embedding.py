"""Input embeddings: special-token table + per-edge MLP, learned positions.

Contract (reference: faceformer/embedding.py:7-38,90-108):
  - 4 learned special-token embeddings are PREPENDED to the per-edge MLP
    embeddings, producing (N, 4+L, E). This alignment is what makes pointer
    logits indexable by token id (PAD/SOS/SEP/EOS at rows 0-3, edge i at
    row 4+i, matching the +4 label offset).
  - the edge MLP flattens the (P, D) sampled points and applies
    Linear -> ReLU -> Linear;
  - positional embeddings are learned tables indexed 0..len-1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from faceformer_tpu.models.layers import init_linear, linear, xavier_uniform

Params = Dict[str, Any]


def init_vanilla_embedding(key, input_dim: int, num_model: int, num_tokens: int) -> Params:
    kt, k1, k2 = jax.random.split(key, 3)
    return {
        "token_table": xavier_uniform(kt, num_tokens, num_model),
        "lin1": init_linear(k1, input_dim, num_model),
        "lin2": init_linear(k2, num_model, num_model),
    }


def vanilla_embedding(p: Params, coords: jnp.ndarray) -> jnp.ndarray:
    """(N, L, P, D) sampled edge points -> (N, 4+L, E) memory-aligned embeds."""
    n = coords.shape[0]
    flat = coords.reshape(*coords.shape[:-2], -1)  # (N, L, P*D)
    edge_embed = linear(p["lin2"], jax.nn.relu(linear(p["lin1"], flat)))
    token_embed = jnp.broadcast_to(
        p["token_table"].astype(coords.dtype)[None],
        (n, *p["token_table"].shape),
    )
    return jnp.concatenate([token_embed, edge_embed], axis=1)


def sinusoidal_position_encoding(max_len: int, num_model: int) -> jnp.ndarray:
    """Fixed sin/cos position table (Attention-is-all-you-need convention).
    Present for capability parity — the reference defines it but its models
    use learned positions instead (reference: embedding.py:68-87)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, num_model, 2, dtype=jnp.float32)
                  * (-jnp.log(10000.0) / num_model))
    pe = jnp.zeros((max_len, num_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def init_coordinate_embedding(key, num_axes: int, num_bits: int, num_embed: int,
                              num_model: int, dependent_embed: bool = False) -> Params:
    """Quantized-coordinate embedding (reference: embedding.py:41-65).
    Present for capability parity; the shipped models embed raw sampled
    points through the MLP instead."""
    # Reference quirk kept on purpose: dependent_embed=False sizes the table
    # at 2**num_bits * num_axes rows, but forward indexes raw quantized
    # values in [0, 2**num_bits) with NO per-axis offset (reference
    # embedding.py:45,60) — axes share the first 2**num_bits rows and the
    # rest of the table is never read. Checkpoint-parity requires the same
    # table shape and the same (unused) rows.
    ntoken = 2 ** num_bits if dependent_embed else (2 ** num_bits) * num_axes
    kt, kv, kp = jax.random.split(key, 3)
    return {
        "token_table": xavier_uniform(kt, 3, num_model),
        "value_table": xavier_uniform(kv, ntoken, num_embed),
        "proj": xavier_uniform(kp, num_axes * num_embed, num_model),
    }


def coordinate_embedding(p: Params, coords: jnp.ndarray) -> jnp.ndarray:
    """(N, S, A) integer-quantized coords -> (N, 3+S, E)."""
    n, s, _ = coords.shape
    token_embed = jnp.broadcast_to(p["token_table"][None], (n, 3, p["token_table"].shape[1]))
    value = p["value_table"][coords]  # (N, S, A, num_embed)
    coord_embed = value.reshape(n, s, -1) @ p["proj"]
    return jnp.concatenate([token_embed, coord_embed], axis=1)


def init_position_table(key, max_len: int, num_model: int) -> jnp.ndarray:
    """Learned absolute positions. The reference initializes these
    kaiming-normal then immediately overwrites with xavier-uniform via the
    model-wide reset (model.py:49-52), so xavier is the effective init."""
    return xavier_uniform(key, max_len, num_model)


def position_embedding(table: jnp.ndarray, length: int, dtype) -> jnp.ndarray:
    """First ``length`` rows of the table, shaped (1, length, E)."""
    return table[None, :length].astype(dtype)
