"""Whole-decode-step fused Pallas kernel for the anchor-parallel model.

ONE pallas_call per greedy-decode step covers: all decoder layers
(self-attn with KV-cache read/write, cross-attn against precomputed
per-layer K/V, FFN), the final norm, the pointer projection, masked
argmax over encoder memory, and the gather of the next step's decoder
input — work the XLA path spreads over ~70 kernels per step
(reference hot loop: model_para.py:216-233; XLA path: decode.py
greedy_decode_parallel "causal_cache").

Structure: grid = (batch,). The layer loop is UNROLLED INSIDE the kernel
body — the full stacked decoder weights (~32 MB bf16 at flagship dims) sit
resident in VMEM with constant-index BlockSpecs, activations stay in
registers across layers, and each layer's live KV-cache chunks stream from
HBM through per-chunk landing slots whose DMAs are all issued up front.

Key performance rules learned on v5e (measured, not guessed):
  - sub-128-lane slicing of big slabs relayouts through the VPU and
    dominates everything — per-head math therefore runs as MXU "segment
    matmuls" against a constant 0/1 (E, H) head-grouping matrix, and the
    packed K|V cache is sliced only at 128-aligned lane halves;
  - only the LIVE prefix of the cache is read: ceil(step/CHUNK) chunks,
    guarded by pl.when in a python-unrolled loop so every scratch store
    lands at a static offset (Mosaic rejects dynamic vector-store offsets);
  - the current position's K/V never round-trips through HBM: it is folded
    into the softmax algebraically while its cache-slot write DMA flies.

Numerics mirror models/layers.py: LayerNorm and softmax in fp32, q scaled
by head_dim**-0.5 after projection, mask fill with the dtype minimum,
pointer logits accumulated in fp32. CONTRACT: the FFN hard-codes ReLU and
the block structure is pre-LN — decode.py routes any other
cfg.activation / normalize_before=False config to the XLA engines.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

# self-attn KV-cache chunk length (positions per DMA)
CHUNK = 8

# shared kernel utilities live in ops/flash.py (single source of truth for
# the mask fill value and sublane rounding); re-exported here for callers
from faceformer_tpu.ops.flash import NEG as BIG_NEG, _round_up  # noqa: E402


# ---------------------------------------------------------------------------
# weight packing: stacked per-layer trees -> dense arrays the kernel streams
# ---------------------------------------------------------------------------


def pack_decoder_weights(params: Params, dtype) -> Dict[str, jnp.ndarray]:
    """Pack the stacked decoder-layer tree (models/common.py init_params)
    into dense arrays. Done once per decode call, outside the step loop, so
    the fp32->bf16 casts never re-run per step."""
    lp = params["decoder"]["layers"]
    sa, ca, ffn = lp["self_attn"], lp["cross_attn"], lp["ffn"]

    def c(x):
        return x.astype(dtype)

    # (L, 6, E, E): self wq wk wv wo, cross wq, cross wo
    w_mats = jnp.stack(
        [c(sa["wq"]), c(sa["wk"]), c(sa["wv"]), c(sa["wo"]),
         c(ca["wq"]), c(ca["wo"])], axis=1)
    # (L, 16, E) fp32: biases + per-layer norm params
    f32 = jnp.float32
    zeros = jnp.zeros_like(lp["norm1"]["scale"], dtype=f32)
    vecs = jnp.stack(
        [sa["bq"].astype(f32), sa["bk"].astype(f32), sa["bv"].astype(f32),
         sa["bo"].astype(f32), ca["bq"].astype(f32), ca["bo"].astype(f32),
         ffn["lin2"]["b"].astype(f32),
         lp["norm1"]["scale"].astype(f32), lp["norm1"]["bias"].astype(f32),
         lp["norm2"]["scale"].astype(f32), lp["norm2"]["bias"].astype(f32),
         lp["norm3"]["scale"].astype(f32), lp["norm3"]["bias"].astype(f32),
         zeros, zeros, zeros], axis=1)
    packed = {
        "w_mats": w_mats,
        "vecs": vecs,
        "ffn_w1": c(ffn["lin1"]["w"]),                      # (L, E, FF)
        "ffn_w2": c(ffn["lin2"]["w"]),                      # (L, FF, E)
        "ffn_b1": ffn["lin1"]["b"].astype(f32)[:, None, :],  # (L, 1, FF)
        "final_norm": jnp.stack(
            [params["decoder"]["norm"]["scale"].astype(f32),
             params["decoder"]["norm"]["bias"].astype(f32)]),  # (2, E)
        "proj_w": c(params["project"]["w"]),                # (E, E)
        "proj_b": c(params["project"]["b"])[None, :],       # (1, E)
    }
    return packed


# bias/norm row indices in vecs
_BQ, _BK, _BV, _BO, _CBQ, _CBO, _FB2 = range(7)
_N1S, _N1B, _N2S, _N2B, _N3S, _N3B = range(7, 13)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _ln(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (out * scale + bias).astype(x.dtype)


def _kernel(
    # scalar prefetch
    step_ref,
    # inputs
    x_ref,        # (1, F, E)
    qpos_ref,     # (1, E)
    w_mats_ref,   # (L, 6, E, E) — resident, fetched once per call
    vecs_ref,     # (L, 16, E) fp32
    ffn_w1_ref,   # (L, E, FF)
    ffn_w2_ref,   # (L, FF, E)
    ffn_b1_ref,   # (L, 1, FF) fp32
    fnorm_ref,    # (2, E) fp32
    proj_w_ref,   # (E, E)
    proj_b_ref,   # (1, E)
    cross_k_ref,  # (1, B, L, S, E) — the block's K for every layer
    cross_v_ref,  # (1, B, L, S, E)
    mem_ref,      # (1, B, S, E)
    bias_ref,     # (1, B, 1, S) fp32 (0 valid / BIG_NEG padded)
    cache_kv_ref,  # (L, N, T_pad, F, 2E) in HBM/ANY, aliased to output;
                   # K in lanes [0:E], V in lanes [E:2E]
    # outputs
    x_out_ref,    # (1, F, E) (aliased with x) — next step's decoder input
    tok_out_ref,  # (1, B, F) int32
    cache_kv_out_ref,
    # scratch
    kv_new,       # VMEM (2, 1, F, 2E) — per-layer packed k_t|v_t slots
    chunk,        # VMEM (n_chunks, CHUNK, F, 2E) — per-chunk landing slots
    scores,       # VMEM (T_pad, F, H) fp32
    attn_acc,     # VMEM (F, E) fp32
    sems,         # DMA sems (n_chunks + 2,)
    *,
    num_layers: int,
    num_head: int,
    t_pad: int,
    samples_per_block: int,
):
    n = pl.program_id(0)
    step = step_ref[0]
    f, e = x_ref.shape[1], x_ref.shape[2]  # f = B * F rows
    f_per = f // samples_per_block
    hd = e // num_head
    scale = hd ** -0.5
    dtype = x_ref.dtype
    n_chunks = t_pad // CHUNK
    live_chunks = (step + CHUNK - 1) // CHUNK  # cached positions 0..step-1

    # seg[e, h] = 1 iff lane e belongs to head h: head-local dot products
    # run as MXU matmuls against it instead of 64-lane slices (relayouts)
    seg = (jax.lax.broadcasted_iota(jnp.int32, (e, num_head), 0) // hd
           == jax.lax.broadcasted_iota(jnp.int32, (e, num_head), 1)
           ).astype(jnp.float32)

    x = x_ref[0]  # (F, E)
    qpos = qpos_ref[0]

    def kv_dma(c, l):
        return pltpu.make_async_copy(
            cache_kv_ref.at[l, n, pl.ds(c * CHUNK, CHUNK), :, :],
            chunk.at[c], sems.at[c])

    def w_dma(l):
        return pltpu.make_async_copy(
            kv_new.at[l % 2],
            cache_kv_out_ref.at[l, n, pl.ds(step, 1), :, :],
            sems.at[n_chunks + l % 2])

    for l in range(num_layers):
        vecs = vecs_ref[l]

        # stream this layer's live cache chunks while the projections run
        for c in range(n_chunks):
            @pl.when(c < live_chunks)
            def _(c=c, l=l):
                kv_dma(c, l).start()

        # ---- self attention ---------------------------------------------
        x2 = _ln(x, vecs[_N1S], vecs[_N1B])
        qk_in = x2 + qpos
        q = (jnp.dot(qk_in, w_mats_ref[l, 0],
                     preferred_element_type=jnp.float32)
             + vecs[_BQ]).astype(dtype)
        k_t = (jnp.dot(qk_in, w_mats_ref[l, 1],
                       preferred_element_type=jnp.float32)
               + vecs[_BK]).astype(dtype)
        v_t = (jnp.dot(x2, w_mats_ref[l, 2],
                       preferred_element_type=jnp.float32)
               + vecs[_BV]).astype(dtype)

        # this step's packed K|V -> cache slot, for FUTURE steps; the
        # current position is folded into the softmax from VMEM below, so
        # nothing reads the slot back this step (chunk reads that overlap
        # it are masked). Two slots so layer l+1 can fill while l's flies.
        if l >= 2:
            w_dma(l - 2).wait()
        kv_new[l % 2, 0, :, 0:e] = k_t
        kv_new[l % 2, 0, :, e:2 * e] = v_t
        w_dma(l).start()

        q32 = q.astype(jnp.float32) * scale  # (F, E)
        for c in range(n_chunks):
            @pl.when(c < live_chunks)
            def _(c=c, l=l):
                kv_dma(c, l).wait()
                kc = chunk[c][..., 0:e].astype(jnp.float32)  # (CHUNK, F, E)
                s = jax.lax.dot_general(  # (CHUNK, F, H)
                    q32[None, :, :] * kc, seg,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                scores[c * CHUNK:(c + 1) * CHUNK] = s

        s_self = jax.lax.dot_general(  # (F, H)
            q32 * k_t.astype(jnp.float32), seg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # full softmax over cached positions (< step) plus the current
        # position, handled algebraically so nothing indexes the scratch
        # at the dynamic `step` offset
        pos3 = jax.lax.broadcasted_iota(jnp.int32, (t_pad, f, num_head), 0)
        cached = jnp.where(pos3 < step, scores[:], BIG_NEG)  # (T_pad, F, H)
        m = jnp.maximum(jnp.max(cached, axis=0), s_self)     # (F, H)
        e_cached = jnp.where(pos3 < step, jnp.exp(cached - m[None]), 0.0)
        e_self = jnp.exp(s_self - m)
        denom = jnp.sum(e_cached, axis=0) + e_self
        scores[:] = e_cached / denom[None]
        p_self = e_self / denom  # (F, H)

        # pass 2: probability-weighted V straight from the resident slabs;
        # probabilities expand H -> E lanes via the transpose segment matmul
        attn_acc[:] = jnp.zeros((f, e), jnp.float32)
        for c in range(n_chunks):
            @pl.when(c < live_chunks)
            def _(c=c):
                pc = scores[c * CHUNK:(c + 1) * CHUNK]  # (CHUNK, F, H)
                p_exp = jax.lax.dot_general(  # (CHUNK, F, E)
                    pc, seg, dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                vc = chunk[c][..., e:2 * e].astype(jnp.float32)
                attn_acc[:] = attn_acc[:] + jnp.sum(p_exp * vc, axis=0)

        p_self_exp = jax.lax.dot_general(  # (F, E)
            p_self, seg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn = (attn_acc[:]
                + p_self_exp * v_t.astype(jnp.float32)).astype(dtype)
        x = x + (jnp.dot(attn, w_mats_ref[l, 3],
                         preferred_element_type=jnp.float32)
                 + vecs[_BO]).astype(dtype)

        # ---- cross attention (per sample in the block; kept in fp32 so the
        # per-sample row slices land on 8-aligned fp32 sublanes) -------------
        x2 = _ln(x, vecs[_N2S], vecs[_N2B])
        q2 = (jnp.dot(x2 + qpos, w_mats_ref[l, 4],
                      preferred_element_type=jnp.float32)
              + vecs[_CBQ])  # (B*F, E) fp32
        for b in range(samples_per_block):
            ck = cross_k_ref[0, b, l]  # (S, E)
            cv = cross_v_ref[0, b, l]
            bias_b = bias_ref[0, b, 0]
            r0 = b * f_per
            cross_b = jnp.zeros((f_per, e), jnp.float32)
            for h in range(num_head):
                qh2 = q2[r0:r0 + f_per, h * hd:(h + 1) * hd] * scale
                kh = ck[:, h * hd:(h + 1) * hd].astype(jnp.float32)
                sc = jax.lax.dot_general(  # (F, S)
                    qh2, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sc = sc + bias_b[None, :]
                mx = jnp.max(sc, axis=-1, keepdims=True)
                pr = jnp.exp(sc - mx)
                pr = pr / jnp.sum(pr, axis=-1, keepdims=True)
                vh = cv[:, h * hd:(h + 1) * hd].astype(jnp.float32)  # (S, hd)
                oh = jnp.dot(pr, vh, preferred_element_type=jnp.float32)
                wo_h = w_mats_ref[l, 5, h * hd:(h + 1) * hd, :].astype(
                    jnp.float32)
                cross_b = cross_b + jnp.dot(
                    oh, wo_h, preferred_element_type=jnp.float32)
            attn_acc[r0:r0 + f_per, :] = cross_b
        x = x + (attn_acc[:] + vecs[_CBO]).astype(dtype)

        # ---- FFN -----------------------------------------------------------
        x2 = _ln(x, vecs[_N3S], vecs[_N3B])
        h1 = (jnp.dot(x2, ffn_w1_ref[l], preferred_element_type=jnp.float32)
              + ffn_b1_ref[l, 0])
        h1 = jnp.maximum(h1, 0.0).astype(dtype)
        x = x + (jnp.dot(h1, ffn_w2_ref[l],
                         preferred_element_type=jnp.float32)
                 + vecs[_FB2]).astype(dtype)

    # ---- epilogue: final norm -> pointer -> argmax -> next-token gather
    # (select_next, reference model_para.py:173-179), per sample in the
    # block; fp32 staging via attn_acc so row slices stay 8-aligned --------
    xf = _ln(x, fnorm_ref[0], fnorm_ref[1])
    pointer = (jnp.dot(xf, proj_w_ref[:], preferred_element_type=jnp.float32)
               + proj_b_ref[0].astype(jnp.float32))  # (B*F, E) fp32
    s_dim = mem_ref.shape[2]
    for b in range(samples_per_block):
        mem = mem_ref[0, b].astype(jnp.float32)  # (S, E)
        r0 = b * f_per
        logits = jax.lax.dot_general(  # (F, S) fp32
            pointer[r0:r0 + f_per], mem,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[0, b, 0][None, :]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (F,)
        tok_out_ref[0, b] = nxt
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (f_per, s_dim), 1)
                  == nxt[:, None]).astype(jnp.float32)
        attn_acc[r0:r0 + f_per, :] = jnp.dot(
            onehot, mem, preferred_element_type=jnp.float32)
    x_out_ref[0] = attn_acc[:].astype(dtype)

    w_dma(num_layers - 1).wait()
    if num_layers >= 2:
        w_dma(num_layers - 2).wait()


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_head", "num_layers", "interpret"))
def decode_step(
    step: jnp.ndarray,          # () int32
    x: jnp.ndarray,             # (NB, B*F, E) current decoder inputs
    qpos_t: jnp.ndarray,        # (1, E) this step's learned query position
    packed: Dict[str, jnp.ndarray],
    cross_k: jnp.ndarray,       # (NB, B, L, S, E)
    cross_v: jnp.ndarray,
    memory: jnp.ndarray,        # (NB, B, S, E)
    mem_bias: jnp.ndarray,      # (NB, B, 1, S) fp32
    cache_kv: jnp.ndarray,      # (L, NB, T_pad, B*F, 2E): K | V lane-packed
    num_head: int,
    num_layers: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run one fused decode step over sample blocks of B (the grid is over
    blocks; bigger blocks amortize weight streaming and deepen the GEMMs).
    Returns (x_next, next_tokens (NB, B, F), cache_kv); the cache is
    updated in place (aliased)."""
    n, f, e = x.shape  # n = blocks, f = B * F rows
    b = memory.shape[1]
    s = memory.shape[2]
    t_pad = cache_kv.shape[2]
    ff = packed["ffn_w1"].shape[2]
    dtype = x.dtype
    lyr = num_layers

    n_chunks = t_pad // CHUNK
    out_shape = (
        jax.ShapeDtypeStruct((n, f, e), dtype),
        jax.ShapeDtypeStruct((n, b, f // b), jnp.int32),
        jax.ShapeDtypeStruct(cache_kv.shape, cache_kv.dtype),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, f, e), lambda n, *_: (n, 0, 0)),          # x
            pl.BlockSpec((1, e), lambda n, *_: (0, 0)),                # qpos
            pl.BlockSpec((lyr, 6, e, e), lambda n, *_: (0, 0, 0, 0)),  # w_mats
            pl.BlockSpec((lyr, 16, e), lambda n, *_: (0, 0, 0)),       # vecs
            pl.BlockSpec((lyr, e, ff), lambda n, *_: (0, 0, 0)),       # ffn_w1
            pl.BlockSpec((lyr, ff, e), lambda n, *_: (0, 0, 0)),       # ffn_w2
            pl.BlockSpec((lyr, 1, ff), lambda n, *_: (0, 0, 0)),       # ffn_b1
            pl.BlockSpec((2, e), lambda n, *_: (0, 0)),                # fnorm
            pl.BlockSpec((e, e), lambda n, *_: (0, 0)),                # proj_w
            pl.BlockSpec((1, e), lambda n, *_: (0, 0)),                # proj_b
            pl.BlockSpec((1, b, lyr, s, e),
                         lambda n, *_: (n, 0, 0, 0, 0)),               # cross_k
            pl.BlockSpec((1, b, lyr, s, e),
                         lambda n, *_: (n, 0, 0, 0, 0)),               # cross_v
            pl.BlockSpec((1, b, s, e), lambda n, *_: (n, 0, 0, 0)),    # memory
            pl.BlockSpec((1, b, 1, s), lambda n, *_: (n, 0, 0, 0)),    # mem_bias
            pl.BlockSpec(memory_space=pl.ANY),                      # cache_kv
        ],
        out_specs=(
            pl.BlockSpec((1, f, e), lambda n, *_: (n, 0, 0)),          # x_out
            pl.BlockSpec((1, b, f // b), lambda n, *_: (n, 0, 0)),     # tokens
            pl.BlockSpec(memory_space=pl.ANY),                      # cache_kv
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, f, 2 * e), dtype),
            pltpu.VMEM((n_chunks, CHUNK, f, 2 * e), dtype),
            pltpu.VMEM((t_pad, f, num_head), jnp.float32),
            pltpu.VMEM((f, e), jnp.float32),
            pltpu.SemaphoreType.DMA((n_chunks + 2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, num_layers=num_layers, num_head=num_head, t_pad=t_pad,
        samples_per_block=b)
    x_next, tokens, cache_kv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # inputs are (step,) + 15 tensors; x is input 1, cache is 15
        # (indices count the scalar-prefetch arg)
        input_output_aliases={1: 0, 15: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_layers * n * f * e * (4 * e + 2 * e + 2 * ff + s),
            bytes_accessed=num_layers * n * f * t_pad * e * 2 * 2,
            transcendentals=num_layers * n * f * (t_pad + s) * num_head,
        ),
    )(step.reshape(1), x, qpos_t, packed["w_mats"], packed["vecs"],
      packed["ffn_w1"], packed["ffn_w2"], packed["ffn_b1"],
      packed["final_norm"], packed["proj_w"], packed["proj_b"],
      cross_k, cross_v, memory, mem_bias, cache_kv)
    return x_next, tokens, cache_kv
