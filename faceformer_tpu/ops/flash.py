"""Flash attention with a custom VJP: no materialized score/prob activations.

The teacher-forced training path's activation bill is dominated by stored
(batch, heads, Sq, Sk) attention probabilities (the parallel model's
cross-attention alone is N x F x H x T x S per layer). This kernel pair
computes attention forward with only (out, logsumexp) residuals and
recomputes probabilities on the fly in the backward pass — the standard
flash-attention recipe.

Layout regime (every rule below was measured on v5e, not guessed):
  - Kernels consume the NATURAL packed layout (N, S, H*hd): the projection
    GEMMs already produce it, so q/k/v/out/do need no (N,S,H,hd) ->
    (N*H,S,hd) fold. The fold transposes were ~20 ms/decoder-layer of pure
    HBM copies — more than the attention math itself. Heads are sliced
    lane-wise INSIDE the kernel from VMEM-resident blocks, where the
    relayout is kilobytes, not hundreds of megabytes.
  - The decoder self-attention is ~7k independent tiny sequences (N*F
    anchor rows, 37 tokens each). One grid step per sequence drowns in
    per-step overhead (measured 36 ms/call vs 9 ms XLA); the grid therefore
    batches G rows per step as a leading block dim.
  - Sk pads to the SUBLANE (8), not the lane (128): padded score lanes get
    NEG bias so their probability underflows to zero exactly.
  - logsumexp residuals are (N, Sq, H) — compact (the first version's
    128-lane broadcast wrote ~1 GB of redundant lse per call).

Attention-probability dropout runs INSIDE the kernels: both passes reseed
the TPU PRNG with the same per-(block, head) seed and regenerate identical
keep masks, so no mask tensor is ever materialized. (The reference applies
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


# scoped-VMEM budget for one grid step's blocks (the hardware limit is
# 16 MB; the estimate below is calibrated against it, see _vmem_estimate)
VMEM_BUDGET = 16 * 1024 * 1024


def _vmem_estimate(g: int, sq_block: int, sk_pad: int, e: int) -> int:
    """Approximate worst-case (backward-pass) scoped-VMEM bytes for one
    grid step: q/dq + k,v/dk,dv blocks + score/weight scratch, counted at
    f32 width. Calibrated on v5e: predicts ~18.9M for the (g=2, 512, 512,
    512) geometry that measurably overflows the 16M scoped limit (21.8M)
    and ~14.4M for the long-standing compiling encoder geometry
    (g=4, 224, 224, 512)."""
    return 4 * (3 * g * sq_block * e + 4 * g * sk_pad * e
                + 2 * g * sq_block * sk_pad)


def _block_geometry(n: int, sq: int, sk: int, e: int):
    """(G rows per grid step, sq_block, padded sq, padded sk)."""
    sq_pad = _round_up(sq, SUBLANE)
    sk_pad = _round_up(sk, SUBLANE)
    # largest multiple of 8 <= SQ_BLOCK that divides sq_pad, so no query
    # padding beyond the sublane round-up is ever needed; shrink further if
    # even a single-row grid step would overflow scoped VMEM (long seqs)
    sq_block = SUBLANE
    for b in range(min(SQ_BLOCK, sq_pad), 0, -SUBLANE):
        if sq_pad % b == 0 and _vmem_estimate(1, b, sk_pad, e) <= VMEM_BUDGET:
            sq_block = b
            break
    g = 1
    for cand in (16, 8, 4, 2):
        if (cand * sq_block <= 1024 and n % cand == 0
                and _vmem_estimate(cand, sq_block, sk_pad, e) <= VMEM_BUDGET):
            g = cand
            break
    return g, sq_block, sq_pad, sk_pad


def _keep_mask(seed_ref, shape, rate, head):
    """Deterministic per-(block, head) bernoulli keep mask (TPU PRNG)."""
    block = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + block * 256 + head)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32((1.0 - rate) * 4294967296.0)
    return pltpu.bitcast(bits, jnp.uint32) < threshold


def _head_scores(qh, kh, bias, scale, causal, sq_block):
    """qh (G, SQ, hd), kh (G, Sk, hd), bias (G, 1, Sk) -> (G, SQ, Sk) f32."""
    s = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s + bias
    if causal:
        j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * sq_block
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(cols > rows, NEG, s)
    return s


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, out_ref, lse_ref,
                *, scale, causal, sq_block, dropout_rate, num_head):
    hd = q_ref.shape[-1] // num_head
    bias = bias_ref[:]  # (G, 1, Sk)
    for h in range(num_head):
        sl = slice(h * hd, (h + 1) * hd)
        s = _head_scores(q_ref[:, :, sl], k_ref[:, :, sl], bias, scale,
                         causal, sq_block)
        m = jnp.max(s, axis=-1, keepdims=True)   # (G, SQ, 1)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        lse_ref[:, :, h] = (m + jnp.log(denom))[..., 0]  # (G, SQ)
        p = e / denom
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, p.shape, dropout_rate, h)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        out_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, :, sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, sq_block,
                dropout_rate, num_head):
    hd = q_ref.shape[-1] // num_head
    bias = bias_ref[:]
    first = pl.program_id(1) == 0
    for h in range(num_head):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        do = do_ref[:, :, sl].astype(jnp.float32)
        s = _head_scores(q, k, bias, scale, causal, sq_block)
        p = jnp.exp(s - lse_ref[:, :, h][..., None])  # pre-dropout; masked -> 0

        dpt = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, p.shape, dropout_rate, h)
            p_used = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            dp = jnp.where(keep, dpt / (1.0 - dropout_rate), 0.0)
        else:
            p_used = p
            dp = dpt
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale

        dq_ref[:, :, sl] = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)

        # dK/dV accumulate over query blocks: the (i, j) grid revisits the
        # same dk/dv block for every j, sequentially on TPU
        dk_part = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
        dv_part = jax.lax.dot_general(p_used, do, (((1,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)

        @pl.when(first)
        def _():
            dk_ref[:, :, sl] = dk_part
            dv_ref[:, :, sl] = dv_part

        @pl.when(jnp.logical_not(first))
        def _():
            dk_ref[:, :, sl] = dk_ref[:, :, sl] + dk_part
            dv_ref[:, :, sl] = dv_ref[:, :, sl] + dv_part


def _prepare(q, k, v, bias):
    """Pack (N, S, H, hd) -> (N, S_pad, E) views + padded (N, 1, Sk) bias.
    The head-merge reshape is free (contiguous); only the sublane round-up
    of S pads, and only when S % 8 != 0."""
    n, sq, h, hd = q.shape
    sk = k.shape[1]
    g, sq_block, sq_pad, sk_pad = _block_geometry(n, sq, sk, h * hd)

    def pack(x, s_pad):
        x = x.reshape(n, x.shape[1], h * hd)
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0)))
        return x

    bias = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, sk_pad - sk)),
                   constant_values=NEG)[:, None, :]
    return (pack(q, sq_pad), pack(k, sk_pad), pack(v, sk_pad), bias,
            (g, sq_block, sq_pad, sk_pad))


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


def _specs(g, sq_block, sk_pad, e, num_head):
    qspec = pl.BlockSpec((g, sq_block, e), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((g, sk_pad, e), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((g, 1, sk_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    # lse is (N, Sq, H): heads on the LAST axis with block == array dim, so
    # Mosaic's "last two block dims divisible by (8, 128) or equal to the
    # array" rule holds for any g / sq_block (the 8->128 lane tile padding
    # wastes 16x on this small residual; acceptable)
    lspec = pl.BlockSpec((g, sq_block, num_head), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, bspec, lspec


def _flash_fwd_impl(q, k, v, bias, seed, causal, interpret, dropout_rate):
    n, sq, h, hd = q.shape
    e = h * hd
    scale = hd ** -0.5
    qf, kf, vf, biasf, (g, sq_block, sq_pad, sk_pad) = _prepare(q, k, v, bias)
    grid = (n // g, sq_pad // sq_block)
    qspec, kspec, bspec, lspec = _specs(g, sq_block, sk_pad, e, h)

    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               sq_block=sq_block, dropout_rate=dropout_rate,
                               num_head=h)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(qspec, lspec),
        out_shape=(
            jax.ShapeDtypeStruct((n, sq_pad, e), q.dtype),
            jax.ShapeDtypeStruct((n, sq_pad, h), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, biasf, seed)

    return out[:, :sq].reshape(n, sq, h, hd), lse


def _flash_fwd(q, k, v, bias, seed, causal, interpret, dropout_rate):
    if seed is None:
        seed = jnp.zeros((1,), jnp.float32)
    out, lse = _flash_fwd_impl(q, k, v, bias, seed, causal, interpret, dropout_rate)
    return out, (q, k, v, bias, seed, lse)


def _flash_bwd(causal, interpret, dropout_rate, residuals, g_out):
    q, k, v, bias, seed, lse = residuals
    n, sq, h, hd = q.shape
    e = h * hd
    sk = k.shape[1]
    scale = hd ** -0.5
    qf, kf, vf, biasf, (g, sq_block, sq_pad, sk_pad) = _prepare(q, k, v, bias)
    # g_out shares q's geometry: pack it directly instead of re-running the
    # whole _prepare (which would redundantly re-pad k/v/bias)
    gf = g_out.reshape(n, sq, e)
    if sq_pad != sq:
        gf = jnp.pad(gf, ((0, 0), (0, sq_pad - sq), (0, 0)))
    grid = (n // g, sq_pad // sq_block)
    qspec, kspec, bspec, lspec = _specs(g, sq_block, sk_pad, e, h)

    kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                               sq_block=sq_block, dropout_rate=dropout_rate,
                               num_head=h)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec,
                  pl.BlockSpec(memory_space=pltpu.SMEM), lspec, qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((n, sq_pad, e), q.dtype),
            jax.ShapeDtypeStruct((n, sk_pad, e), jnp.float32),
            jax.ShapeDtypeStruct((n, sk_pad, e), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, biasf, seed, lse, gf)

    # bias is a mask and seed is RNG material: zero cotangents by design
    return (dq[:, :sq].reshape(n, sq, h, hd),
            dk[:, :sk].reshape(n, sk, h, hd).astype(k.dtype),
            dv[:, :sk].reshape(n, sk, h, hd).astype(v.dtype),
            jnp.zeros_like(bias, dtype=jnp.float32),
            jnp.zeros_like(seed))


flash_attention.defvjp(_flash_fwd, _flash_bwd)
