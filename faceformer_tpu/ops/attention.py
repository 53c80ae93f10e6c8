"""Fused multi-head attention kernel (score + mask + softmax + weighted sum).

Operates on already-projected Q/K/V so the projection matmuls stay in XLA
(where they already hit the MXU optimally); the kernel fuses everything in
between, keeping the (Sq, Sk) score matrix in VMEM instead of HBM.

Layout: heads fold into the grid — inputs are reshaped to (N*H, S, hd)
outside the kernel and each grid step processes one (sample, head) pair.
head_dim is padded to the 128-lane width; the MXU contracts 128 lanes per
pass regardless, so the padding costs memory, not FLOPs. Sequence lengths
pad to the fp32 sublane tile (8).

Used for encoder self-attention and teacher-forced decoder attention
(dropout-free paths); the reference's additive-positional-at-q/k convention
happens before projection, so it needs no kernel support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale, causal):
    q = q_ref[0]  # (Sq, hd_pad)
    k = k_ref[0]  # (Sk, hd_pad)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Sq, Sk)
    neg = jnp.finfo(jnp.float32).min
    # the padded Sk tail arrives pre-masked (padding_mask padded with True)
    scores = jnp.where(mask_ref[0], neg, scores)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(cols > rows, neg, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out_ref[0] = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_head", "causal", "interpret"))
def fused_attention(
    q: jnp.ndarray,  # (N, Sq, H, hd) post-projection, pre-scaled NOT applied
    k: jnp.ndarray,  # (N, Sk, H, hd)
    v: jnp.ndarray,  # (N, Sk, H, hd)
    key_padding_mask: jnp.ndarray,  # (N, Sk) bool, True = padded
    num_head: int,
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (N, Sq, H, hd) attention outputs (softmax((qk^T)/sqrt(hd))v)."""
    n, sq, h, hd = q.shape
    sk = k.shape[1]
    scale = hd ** -0.5

    hd_pad = _round_up(hd, LANE)
    sq_pad = _round_up(sq, SUBLANE)
    sk_pad = _round_up(sk, LANE)

    def fold(x, s_pad):
        x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0), (0, hd_pad - hd)))
        return x.transpose(0, 2, 1, 3).reshape(n * h, s_pad, hd_pad)

    qf, kf, vf = fold(q, sq_pad), fold(k, sk_pad), fold(v, sk_pad)
    mask = jnp.pad(key_padding_mask, ((0, 0), (0, sk_pad - sk)),
                   constant_values=True)
    mask = jnp.repeat(mask[:, None, :], h, axis=1).reshape(n * h, 1, sk_pad)

    kernel = functools.partial(_kernel, scale=scale, causal=causal)
    out = pl.pallas_call(
        kernel,
        grid=(n * h,),
        in_specs=[
            pl.BlockSpec((1, sq_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sq_pad, hd_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h, sq_pad, hd_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * sq_pad * sk_pad * hd_pad,
            bytes_accessed=n * h * (sq_pad + 2 * sk_pad) * hd_pad * 4,
            transcendentals=n * h * sq_pad * sk_pad),
    )(qf, kf, vf, mask)

    out = out.reshape(n, h, sq_pad, hd_pad).transpose(0, 2, 1, 3)
    return out[:, :sq, :, :hd]
