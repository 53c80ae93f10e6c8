"""Fused pointer scoring: logits = rows @ memory^T, mask, argmax — one kernel.

The decode inner step scores every pointer vector against every encoder
memory row, masks padded rows with the dtype minimum, and takes an argmax
(reference: model.py:161-167 select_next). Composed in XLA that is a matmul,
a select, and a reduce with an HBM round-trip for the (R, S) logits; here
the three fuse into one MXU+VPU kernel and only the (R,) winners leave VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256


def _kernel(rows_ref, memory_ref, mask_ref, out_ref):
    # rows: (RB, E), memory: (S, E), mask: (1, S) bool (True = padded)
    scores = jax.lax.dot_general(
        rows_ref[:], memory_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (RB, S)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask_ref[:], neg, scores)
    out_ref[:] = jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pointer_argmax(rows: jnp.ndarray, memory: jnp.ndarray,
                   padding_mask: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Greedy pointer pick for one sample: rows (R, E) x memory (S, E) ->
    argmax indices (R,) int32, with padded memory rows masked out.

    padding_mask: (S,) bool, True = padded.
    """
    r, e = rows.shape
    s = memory.shape[0]
    r_pad = -(-r // ROW_BLOCK) * ROW_BLOCK
    if r_pad != r:
        rows = jnp.pad(rows, ((0, r_pad - r), (0, 0)))
    mask2d = padding_mask.reshape(1, s)

    out = pl.pallas_call(
        _kernel,
        grid=(r_pad // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * s * e, bytes_accessed=(r_pad * e + s * e) * 4,
            transcendentals=0),
    )(rows, memory, mask2d)
    return out[:r, 0]


def pointer_argmax_batched(rows: jnp.ndarray, memory: jnp.ndarray,
                           padding_mask: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Batched wrapper: rows (N, ..., E), memory (N, S, E),
    padding_mask (N, S) -> (N, ...) int32. vmapped over the batch."""
    batch_shape = rows.shape[1:-1]
    rows2 = rows.reshape(rows.shape[0], -1, rows.shape[-1])
    fn = jax.vmap(functools.partial(pointer_argmax, interpret=interpret))
    out = fn(rows2, memory, padding_mask)
    return out.reshape(rows.shape[0], *batch_shape)
