"""Flash attention with a custom VJP: no materialized score/prob activations.

The teacher-forced training path's activation bill is dominated by stored
(batch, heads, Sq, Sk) attention probabilities (the parallel model's
cross-attention alone is N x F x H x T x S per layer). This kernel pair
computes attention forward with only (out, logsumexp) residuals and
recomputes probabilities on the fly in the backward pass — the standard
flash-attention recipe.

Key lengths here are short (<= 256 after padding) so K/V stay VMEM-resident
per (sample, head); the query axis — which carries the folded anchor axis
and can reach tens of thousands of rows — is tiled over the grid. The
backward pass accumulates dK/dV across query blocks by revisiting the same
output block over sequential grid steps.

Attention-probability dropout runs INSIDE the kernels: both passes reseed
the TPU PRNG with the same per-block seed and regenerate identical keep
masks, so no mask tensor is ever materialized. (The reference applies
dropout to attention probabilities, transformer.py:146-156 via
nn.MultiheadAttention.) The PRNG primitives have no interpreter lowering
on this platform, so dropout parity tests are TPU-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
SQ_BLOCK = 512
NEG = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def padding_mask_bias(key_padding_mask) -> jnp.ndarray:
    """(N, Sk) bool (True = padded) -> additive float bias."""
    return jnp.where(key_padding_mask, NEG, 0.0).astype(jnp.float32)


def _scores(q, k, bias_row, scale, causal, sq_block):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_row  # (1, Sk) additive mask bias (0 or NEG)
    if causal:
        j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * sq_block
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols > rows, NEG, s)
    return s


def _keep_mask(seed_ref, shape, rate):
    """Deterministic per-block bernoulli keep mask from the TPU PRNG."""
    block = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + block)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32((1.0 - rate) * 4294967296.0)
    return pltpu.bitcast(bits, jnp.uint32) < threshold


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, out_ref, lse_ref,
                *, scale, causal, sq_block, dropout_rate):
    s = _scores(q_ref[0], k_ref[0], bias_ref[0], scale, causal, sq_block)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # lse broadcast across the lane dim (single-lane outputs tile poorly)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(denom), lse_ref[0].shape)
    p = e / denom
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, p.shape, dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out_ref[0] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, sq_block, dropout_rate):
    s = _scores(q_ref[0], k_ref[0], bias_ref[0], scale, causal, sq_block)
    p = jnp.exp(s - lse_ref[0][:, :1])  # pre-dropout probs; masked cols -> 0
    do = do_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)

    # dp~ = dO V^T is the gradient wrt the (possibly dropped) probabilities;
    # the same keep mask regenerates from the same per-block seed
    dpt = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (SQ, Sk)
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, p.shape, dropout_rate)
        p_used = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        dp = jnp.where(keep, dpt / (1.0 - dropout_rate), 0.0)
    else:
        p_used = p
        dp = dpt
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale

    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    # dK/dV accumulate over query blocks: the (i, j) grid revisits the same
    # dk/dv block for every j, sequentially on TPU
    dk_part = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dv_part = jax.lax.dot_general(p_used, do, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[0] = dk_part
        dv_ref[0] = dv_part

    @pl.when(pl.program_id(1) != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk_part
        dv_ref[0] = dv_ref[0] + dv_part


def _prepare(q, k, v, bias):
    """Pad/fold (N, S, H, hd) inputs to (N*H, S_pad, hd_pad) blocks; the
    (N, Sk) float bias pads with NEG so tiling slots never attend."""
    n, sq, h, hd = q.shape
    sk = k.shape[1]
    hd_pad = _round_up(hd, LANE)
    sq_block = min(SQ_BLOCK, _round_up(sq, SUBLANE))
    sq_pad = _round_up(sq, sq_block)
    sk_pad = _round_up(sk, LANE)

    def fold(x, s_pad):
        x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0), (0, hd_pad - hd)))
        return x.transpose(0, 2, 1, 3).reshape(n * h, s_pad, hd_pad)

    bias = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, sk_pad - sk)),
                   constant_values=NEG)
    bias = jnp.repeat(bias[:, None, :], h, axis=1).reshape(n * h, 1, sk_pad)
    return (fold(q, sq_pad), fold(k, sk_pad), fold(v, sk_pad), bias,
            (sq_pad, sk_pad, hd_pad, sq_block))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention(q, k, v, bias, seed=None, causal=False, interpret=False,
                    dropout_rate=0.0):
    """softmax(q k^T / sqrt(hd) + bias) v with flash residuals.

    q (N, Sq, H, hd); k/v (N, Sk, H, hd); bias (N, Sk) float additive mask
    (0 for valid keys, the dtype minimum for padded ones; treated as a
    constant — zero cotangent). seed: (1,) float32 PRNG seed material for
    in-kernel dropout (required when dropout_rate > 0; zero cotangent).
    Returns (N, Sq, H, hd)."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.float32)
    out, _ = _flash_fwd_impl(q, k, v, bias, seed, causal, interpret, dropout_rate)
    return out


def _flash_fwd_impl(q, k, v, bias, seed, causal, interpret, dropout_rate):
    n, sq, h, hd = q.shape
    scale = hd ** -0.5
    qf, kf, vf, biasf, (sq_pad, sk_pad, hd_pad, sq_block) = _prepare(q, k, v, bias)
    grid = (n * h, sq_pad // sq_block)

    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               sq_block=sq_block, dropout_rate=dropout_rate)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sq_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, sq_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_block, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * h, sq_pad, hd_pad), q.dtype),
            jax.ShapeDtypeStruct((n * h, sq_pad, LANE), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, biasf, seed)

    out4 = out.reshape(n, h, sq_pad, hd_pad).transpose(0, 2, 1, 3)[:, :sq, :, :hd]
    return out4, lse


def _flash_fwd(q, k, v, bias, seed, causal, interpret, dropout_rate):
    if seed is None:
        seed = jnp.zeros((1,), jnp.float32)
    out, lse = _flash_fwd_impl(q, k, v, bias, seed, causal, interpret, dropout_rate)
    return out, (q, k, v, bias, seed, lse)


def _flash_bwd(causal, interpret, dropout_rate, residuals, g):
    q, k, v, bias, seed, lse = residuals
    n, sq, h, hd = q.shape
    sk = k.shape[1]
    scale = hd ** -0.5
    qf, kf, vf, biasf, (sq_pad, sk_pad, hd_pad, sq_block) = _prepare(q, k, v, bias)
    gf = _prepare(g, k, v, bias)[0]
    grid = (n * h, sq_pad // sq_block)

    kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                               sq_block=sq_block, dropout_rate=dropout_rate)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sq_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sq_block, LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, sq_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * h, sq_pad, hd_pad), q.dtype),
            jax.ShapeDtypeStruct((n * h, sk_pad, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((n * h, sk_pad, hd_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, biasf, seed, lse, gf)

    def unfold(x, s_orig, s_pad):
        return x.reshape(n, h, s_pad, hd_pad).transpose(0, 2, 1, 3)[:, :s_orig, :, :hd]

    # bias is a mask and seed is RNG material: zero cotangents by design
    return (unfold(dq, sq, sq_pad), unfold(dk, sk, sk_pad).astype(k.dtype),
            unfold(dv, sk, sk_pad).astype(v.dtype),
            jnp.zeros_like(bias, dtype=jnp.float32),
            jnp.zeros_like(seed))


flash_attention.defvjp(_flash_fwd, _flash_bwd)
