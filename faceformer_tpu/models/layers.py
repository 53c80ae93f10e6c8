"""Functional transformer building blocks (DETR-convention, TPU-first).

Math contract (reference: faceformer/transformer.py:127-269):
  - positional embeddings are ADDED TO Q AND K ONLY, never to values;
  - pre-LN ("normalize_before") residual blocks by default, post-LN switch;
  - self-attn value is the normed input; cross-attn value is raw memory;
  - attention is torch.nn.MultiheadAttention-compatible: per-head scaled
    dot product with q scaled by head_dim**-0.5 after projection, additive
    boolean masks, dropout on attention probabilities.

TPU-first departures from the reference:
  - batch-first (..., S, E) layouts throughout (XLA-preferred);
  - per-layer parameters are STACKED along a leading axis and iterated with
    lax.scan — one compiled layer body regardless of depth;
  - keys/values may carry fewer batch dims than queries and broadcast inside
    the attention einsum: this is what replaces the reference's
    memory.repeat_interleave(max_num_edges) blow-up (model_para.py:122,212)
    with a free broadcast;
  - masks fill with the dtype's lowest value rather than -inf (same argmax
    and softmax results for non-degenerate rows, but never NaN);
  - LayerNorm and softmax run in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers (reference: model.py:49-52 xavier-uniform for every dim>1
# param; biases keep torch defaults — zeros for attention, fan-in uniform
# for Linear layers)
# ---------------------------------------------------------------------------


def xavier_uniform(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    bound = math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(key, (in_dim, out_dim), dtype, -bound, bound)


def torch_linear_bias(key, fan_in: int, out_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (out_dim,), dtype, -bound, bound)


def init_linear(key, in_dim: int, out_dim: int, zero_bias: bool = False) -> Params:
    kw, kb = jax.random.split(key)
    return {
        "w": xavier_uniform(kw, in_dim, out_dim),
        "b": jnp.zeros((out_dim,), jnp.float32)
        if zero_bias
        else torch_linear_bias(kb, in_dim, out_dim),
    }


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_attention(key, dim: int) -> Params:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": xavier_uniform(kq, dim, dim),
        "wk": xavier_uniform(kk, dim, dim),
        "wv": xavier_uniform(kv, dim, dim),
        "bq": jnp.zeros((dim,), jnp.float32),
        "bk": jnp.zeros((dim,), jnp.float32),
        "bv": jnp.zeros((dim,), jnp.float32),
        "wo": xavier_uniform(ko, dim, dim),
        "bo": jnp.zeros((dim,), jnp.float32),
    }


def init_encoder_layer(key, dim: int, ffn_dim: int) -> Params:
    ka, k1, k2 = jax.random.split(key, 3)
    return {
        "self_attn": init_attention(ka, dim),
        "norm1": init_layer_norm(dim),
        "norm2": init_layer_norm(dim),
        "ffn": {"lin1": init_linear(k1, dim, ffn_dim), "lin2": init_linear(k2, ffn_dim, dim)},
    }


def init_decoder_layer(key, dim: int, ffn_dim: int) -> Params:
    ka, kc, k1, k2 = jax.random.split(key, 4)
    return {
        "self_attn": init_attention(ka, dim),
        "cross_attn": init_attention(kc, dim),
        "norm1": init_layer_norm(dim),
        "norm2": init_layer_norm(dim),
        "norm3": init_layer_norm(dim),
        "ffn": {"lin1": init_linear(k1, dim, ffn_dim), "lin2": init_linear(k2, ffn_dim, dim)},
    }


def init_stack(key, n_layers: int, init_one) -> Params:
    """Stack per-layer param trees along a leading axis for lax.scan."""
    layers = [init_one(k) for k in jax.random.split(key, n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def big_neg(dtype) -> float:
    """Mask fill value: lowest finite value of the dtype (reference
    faceformer/utils.py:16-20 min_value_of_dtype)."""
    return float(jnp.finfo(dtype).min)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in fp32, cast back to the input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(dtype)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


_DROPOUT_BITS_ENV = os.environ.get("FACEFORMER_DROPOUT_BITS", "32").strip()
if _DROPOUT_BITS_ENV not in ("8", "16", "32"):
    raise ValueError(
        f"FACEFORMER_DROPOUT_BITS={_DROPOUT_BITS_ENV!r} not understood; "
        "use 8, 16 or 32")
#: Random-bit width per dropout mask element. 32 = jax.random.bernoulli
#: (fp32 uniform < keep, ~2^-24 keep-prob granularity) — the production
#: default, matching the reference's semantics. 8/16 = threshold on
#: uint8/uint16 random bits: 4x/2x less PRNG output per mask (keep prob
#: quantized to 1/256: 0.8 -> 204/256 = 0.796875). Measured at flagship
#: dims (benchmarks/dropout_step.json): bits8 is 25 ms (-11%) faster
#: forward-only but a NULL at the full fwd+bwd step (567.9 vs 568.0 ms) —
#: the mask-PRNG saving hides in backward-pass scheduling bubbles. Since
#: eval runs no dropout and training runs fwd+bwd, no production path
#: benefits, so the default stays 32; the knob remains for future remat/
#: fusion changes that could re-expose the forward saving.
DROPOUT_BITS = int(_DROPOUT_BITS_ENV)

_BIT_DTYPES = {8: jnp.uint8, 16: jnp.uint16}


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout; identity when rng is None (eval) or rate == 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    if DROPOUT_BITS == 32:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    else:
        # clamp: keep probs within 0.5/2^bits of 1.0 would round thresh to
        # 2^bits, which wraps to all-False in the uint comparison and
        # silently zeroes every activation — cap at the dtype max so such
        # rates keep (nearly) everything instead of dropping everything
        thresh = min(int(round(keep * (1 << DROPOUT_BITS))),
                     (1 << DROPOUT_BITS) - 1)
        mask = jax.random.bits(rng, x.shape, _BIT_DTYPES[DROPOUT_BITS]) < thresh
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def activation_fn(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return jax.nn.gelu
    if name == "glu":
        return jax.nn.glu
    raise ValueError(f"activation should be relu/gelu/glu, not {name}")


def causal_mask(size: int) -> np.ndarray:
    """Boolean (size, size) mask, True above the diagonal (masked).

    Built with numpy on purpose: under jit tracing a jnp-built mask is a
    tracer, which _is_causal_mask cannot inspect — the flash kernel would
    silently never engage for causal self-attention. A host constant stays
    inspectable and folds into the graph identically."""
    return np.triu(np.ones((size, size), dtype=bool), k=1)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _is_causal_mask(mask) -> bool:
    """True for masks built by causal_mask (a concrete upper-triangular
    constant); traced masks never match."""
    if mask is None or not isinstance(mask, (jnp.ndarray, np.ndarray)):
        return False
    try:
        arr = np.asarray(mask)
    except Exception:
        return False  # traced inside jit: can't inspect, use the XLA path
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        return False
    return bool((arr == np.triu(np.ones(arr.shape, bool), k=1)).all())


def _maybe_fused_attention(q, k, v, attn_mask, key_padding_mask,
                           dropout_rate, rng):
    """Route eligible attention calls to the flash Pallas kernel (forward +
    custom VJP, so it works under jax.grad): dropout-free, and an attn_mask
    that is either absent or the causal constant. Broadcast-KV cross
    attention folds its anchor axis into the query sequence. Returns None
    when the XLA path should run instead."""
    from faceformer_tpu import ops

    if not ops.enabled():
        return None
    causal = attn_mask is not None and _is_causal_mask(attn_mask)
    if attn_mask is not None and not causal:
        return None
    from faceformer_tpu.ops.flash import flash_attention, padding_mask_bias

    # dropout runs inside the kernel (compiled TPU only: the PRNG primitives
    # have no interpreter lowering), seeded from the layer rng
    rate = float(dropout_rate) if rng is not None else 0.0
    if rate > 0.0 and ops.interpret_mode():
        return None
    seed = None
    if rate > 0.0:
        seed = (jax.random.bits(rng, (1,), "uint32") & jnp.uint32(0xFFFFFF)
                ).astype(jnp.float32)

    broadcast_kv = (q.ndim == 5 and k.ndim == 5 and k.shape[1] == 1
                    and q.shape[1] > 1)
    if broadcast_kv and causal:
        return None  # folding would break causal structure
    if not broadcast_kv and q.shape[:-3] != k.shape[:-3]:
        return None

    if broadcast_kv:
        n, f, t, h, hd = q.shape
        sk = k.shape[2]
        q2, k2, v2 = q.reshape(n, f * t, h, hd), k[:, 0], v[:, 0]
        kp = (jnp.zeros((n, sk), bool) if key_padding_mask is None
              else jnp.broadcast_to(key_padding_mask, (n, 1, sk)).reshape(n, sk))
        out = flash_attention(q2, k2, v2, padding_mask_bias(kp), seed,
                              causal, ops.interpret_mode(), rate)
        return out.reshape(n, f, t, h * hd)

    *batch, sq, h, hd = q.shape
    sk = k.shape[-3]
    n = int(np.prod(batch)) if batch else 1
    if key_padding_mask is None:
        kp = jnp.zeros((n, sk), dtype=bool)
    else:
        kp = jnp.broadcast_to(key_padding_mask, (*batch, sk)).reshape(n, sk)
    out = flash_attention(
        q.reshape(n, sq, h, hd), k.reshape(n, sk, h, hd),
        v.reshape(n, sk, h, hd), padding_mask_bias(kp), seed, causal,
        ops.interpret_mode(), rate)
    return out.reshape(*batch, sq, h * hd)


def _split_heads(x: jnp.ndarray, num_head: int) -> jnp.ndarray:
    *batch, s, e = x.shape
    return x.reshape(*batch, s, num_head, e // num_head)


def _attend_folded(q, k, v, key_padding_mask, dropout_rate, rng):
    """Batched-GEMM attention with pre-scaled q: q (N, Q, H, hd),
    k/v (N, S, H, hd), key padding (*, S) broadcastable over (N, 1, 1, S).
    Returns (N, Q, H, hd)."""
    scores = jnp.einsum("nqhd,nshd->nhqs", q, k,
                        preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        pad = key_padding_mask.reshape(key_padding_mask.shape[0], 1, 1, -1)
        scores = jnp.where(pad, big_neg(scores.dtype), scores)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(probs, dropout_rate, rng)
    return jnp.einsum("nhqs,nshd->nqhd", probs.astype(q.dtype), v)


def multihead_attention(
    p: Params,
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    num_head: int,
    attn_mask: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """torch.nn.MultiheadAttention-compatible attention, batch-first.

    query: (*Bq, Sq, E); key/value: (*Bk, Sk, E) where Bk must broadcast
    against Bq (e.g. query (N, F, T, E) vs key (N, 1, L, E) for the parallel
    model's shared memory). attn_mask: (Sq, Sk) bool, True = masked.
    key_padding_mask: (*Bk, Sk) bool, True = padded.
    """
    dtype = query.dtype
    head_dim = query.shape[-1] // num_head

    q = _split_heads(linear({"w": p["wq"], "b": p["bq"]}, query), num_head)
    k = _split_heads(linear({"w": p["wk"], "b": p["bk"]}, key), num_head)
    v = _split_heads(linear({"w": p["wv"], "b": p["bv"]}, value), num_head)

    fused = _maybe_fused_attention(q, k, v, attn_mask,
                                   key_padding_mask, dropout_rate, rng)
    if fused is not None:
        return linear({"w": p["wo"], "b": p["bo"]}, fused)

    # anchor-broadcast cross-attention: q (N, F, T, H, hd) against shared
    # k/v (N, 1, S, H, hd). Fold F into the query-sequence axis so the
    # contraction is one batched GEMM per (N, H) — einsum broadcasting here
    # would materialize K/V per anchor (N*F*S*E bytes of HBM traffic).
    if (q.ndim == 5 and k.ndim == 5 and k.shape[1] == 1 and q.shape[1] > 1
            and attn_mask is None):
        n, f, t, h, hd = q.shape
        out = _attend_folded(
            q.reshape(n, f * t, h, hd) * (head_dim ** -0.5), k[:, 0], v[:, 0],
            key_padding_mask, dropout_rate, rng)
        out = out.reshape(n, f, t, h * hd)
        return linear({"w": p["wo"], "b": p["bo"]}, out)

    q = q * (head_dim ** -0.5)

    # (..., H, Sq, Sk); fp32 accumulation on the MXU
    scores = jnp.einsum("...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32)

    neg = big_neg(jnp.float32)
    if attn_mask is not None:
        scores = jnp.where(attn_mask, neg, scores)
    if key_padding_mask is not None:
        pad = key_padding_mask[..., None, None, :]  # (*Bk, 1, 1, Sk)
        scores = jnp.where(pad, neg, scores)

    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(probs, dropout_rate, rng)

    out = jnp.einsum("...hqk,...khd->...qhd", probs.astype(dtype), v)
    *batch, s, h, d = out.shape
    out = out.reshape(*batch, s, h * d)
    return linear({"w": p["wo"], "b": p["bo"]}, out)


# ---------------------------------------------------------------------------
# encoder / decoder layers (pre-LN and post-LN paths)
# ---------------------------------------------------------------------------


def _ffn(p: Params, x: jnp.ndarray, act, rate: float, rng) -> jnp.ndarray:
    h = act(linear(p["lin1"], x))
    h = dropout(h, rate, rng)
    return _ckpt_name(linear(p["lin2"], h), "ffn_out")


def _ckpt_name(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Tag an intermediate for the named remat policies ("attn"/"attn_ffn",
    _scan_stack): a no-op unless the surrounding jax.checkpoint uses
    save_only_these_names."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, name)


def _rngs(rng: Optional[jax.Array], n: int):
    if rng is None:
        return (None,) * n
    return tuple(jax.random.split(rng, n))


def encoder_layer(
    p: Params,
    x: jnp.ndarray,
    pos: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],
    *,
    num_head: int,
    dropout_rate: float,
    activation: str,
    normalize_before: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    """One encoder block (reference: transformer.py:146-184)."""
    act = activation_fn(activation)
    r_attn, r1, r_ffn_in, r2 = _rngs(rng, 4)
    if normalize_before:
        x2 = layer_norm(p["norm1"], x)
        qk = x2 + pos
        sa = _ckpt_name(multihead_attention(
            p["self_attn"], qk, qk, x2, num_head,
            key_padding_mask=key_padding_mask, dropout_rate=dropout_rate,
            rng=r_attn), "attn_out")
        x = x + dropout(sa, dropout_rate, r1)
        x2 = layer_norm(p["norm2"], x)
        x = x + dropout(_ffn(p["ffn"], x2, act, dropout_rate, r_ffn_in), dropout_rate, r2)
        return x
    qk = x + pos
    sa = _ckpt_name(multihead_attention(
        p["self_attn"], qk, qk, x, num_head,
        key_padding_mask=key_padding_mask, dropout_rate=dropout_rate,
        rng=r_attn), "attn_out")
    x = layer_norm(p["norm1"], x + dropout(sa, dropout_rate, r1))
    ff = _ffn(p["ffn"], x, act, dropout_rate, r_ffn_in)
    return layer_norm(p["norm2"], x + dropout(ff, dropout_rate, r2))


def decoder_layer(
    p: Params,
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    query_pos: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    num_head: int,
    dropout_rate: float,
    activation: str,
    normalize_before: bool,
    tgt_mask: Optional[jnp.ndarray] = None,
    tgt_key_padding_mask: Optional[jnp.ndarray] = None,
    memory_key_padding_mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One decoder block: self-attn, cross-attn to memory, FFN
    (reference: transformer.py:209-259). ``memory`` may have fewer batch
    dims than ``tgt`` and broadcasts (anchor-parallel decode)."""
    act = activation_fn(activation)
    r_sa, r1, r_ca, r2, r_ffn_in, r3 = _rngs(rng, 6)
    if normalize_before:
        t2 = layer_norm(p["norm1"], tgt)
        qk = t2 + query_pos
        sa = _ckpt_name(multihead_attention(
            p["self_attn"], qk, qk, t2, num_head,
            attn_mask=tgt_mask, key_padding_mask=tgt_key_padding_mask,
            dropout_rate=dropout_rate, rng=r_sa), "attn_out")
        tgt = tgt + dropout(sa, dropout_rate, r1)
        t2 = layer_norm(p["norm2"], tgt)
        ca = _ckpt_name(multihead_attention(
            p["cross_attn"], t2 + query_pos, memory + pos, memory, num_head,
            key_padding_mask=memory_key_padding_mask,
            dropout_rate=dropout_rate, rng=r_ca), "attn_out")
        tgt = tgt + dropout(ca, dropout_rate, r2)
        t2 = layer_norm(p["norm3"], tgt)
        tgt = tgt + dropout(_ffn(p["ffn"], t2, act, dropout_rate, r_ffn_in), dropout_rate, r3)
        return tgt
    qk = tgt + query_pos
    sa = _ckpt_name(multihead_attention(
        p["self_attn"], qk, qk, tgt, num_head,
        attn_mask=tgt_mask, key_padding_mask=tgt_key_padding_mask,
        dropout_rate=dropout_rate, rng=r_sa), "attn_out")
    tgt = layer_norm(p["norm1"], tgt + dropout(sa, dropout_rate, r1))
    ca = _ckpt_name(multihead_attention(
        p["cross_attn"], tgt + query_pos, memory + pos, memory, num_head,
        key_padding_mask=memory_key_padding_mask, dropout_rate=dropout_rate,
        rng=r_ca), "attn_out")
    tgt = layer_norm(p["norm2"], tgt + dropout(ca, dropout_rate, r2))
    ff = _ffn(p["ffn"], tgt, act, dropout_rate, r_ffn_in)
    return layer_norm(p["norm3"], tgt + dropout(ff, dropout_rate, r3))


# ---------------------------------------------------------------------------
# stacks: lax.scan over stacked layer params
# ---------------------------------------------------------------------------


def _scan_stack(layer_fn, stacked: Params, x: jnp.ndarray, rng: Optional[jax.Array],
                remat: bool = False, remat_policy: str = "full"):
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    if remat:
        # recompute layer activations in the backward pass (HBM for FLOPs).
        # Policies between "full" (save only the layer boundary; max
        # recompute) and "dots" (save every matmul output; OOMs at flagship
        # dims, benchmarks/train_decomp.json): the named policies keep just
        # the tagged block outputs (_ckpt_name) resident, so backward
        # re-derives the residual chain from cheap adds/LNs instead of
        # re-running attention/FFN matmuls.
        cp = jax.checkpoint_policies
        policies = {
            "full": None,
            "dots": cp.dots_with_no_batch_dims_saveable,
            "attn": cp.save_only_these_names("attn_out"),
            "attn_ffn": cp.save_only_these_names("attn_out", "ffn_out"),
        }
        if remat_policy not in policies:
            raise ValueError(
                f"model.remat_policy must be one of {sorted(policies)}, "
                f"got {remat_policy!r}")
        policy = policies[remat_policy]
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(), policy=policy)

    def body(carry, inputs):
        layer_p, idx = inputs
        layer_rng = None if rng is None else jax.random.fold_in(rng, idx)
        return layer_fn(layer_p, carry, layer_rng), None

    out, _ = jax.lax.scan(body, x, (stacked, jnp.arange(n_layers)))
    return out


def encoder_forward(
    p: Params,
    x: jnp.ndarray,
    pos: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],
    *,
    num_head: int,
    dropout_rate: float,
    activation: str = "relu",
    normalize_before: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    remat_policy: str = "full",
) -> jnp.ndarray:
    """Full encoder stack + final norm (reference: transformer.py:62-83)."""
    fn = partial(
        _apply_encoder_layer, pos=pos, key_padding_mask=key_padding_mask,
        num_head=num_head, dropout_rate=dropout_rate,
        activation=activation, normalize_before=normalize_before)
    out = _scan_stack(fn, p["layers"], x, rng, remat=remat,
                      remat_policy=remat_policy)
    if normalize_before:
        out = layer_norm(p["norm"], out)
    return out


def _apply_encoder_layer(layer_p, x, rng, **kw):
    return encoder_layer(layer_p, x, kw.pop("pos"), kw.pop("key_padding_mask"), rng=rng, **kw)


def decoder_forward(
    p: Params,
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    query_pos: jnp.ndarray,
    pos: jnp.ndarray,
    *,
    num_head: int,
    dropout_rate: float,
    activation: str = "relu",
    normalize_before: bool = True,
    tgt_mask: Optional[jnp.ndarray] = None,
    tgt_key_padding_mask: Optional[jnp.ndarray] = None,
    memory_key_padding_mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    remat_policy: str = "full",
) -> jnp.ndarray:
    """Full decoder stack + final norm (reference: transformer.py:86-124;
    the decoder norm exists in both pre/post-LN modes, model.py:42-43)."""

    def fn(layer_p, x, layer_rng):
        return decoder_layer(
            layer_p, x, memory, query_pos, pos,
            num_head=num_head, dropout_rate=dropout_rate, activation=activation,
            normalize_before=normalize_before, tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_key_padding_mask,
            memory_key_padding_mask=memory_key_padding_mask, rng=layer_rng)

    out = _scan_stack(fn, p["layers"], tgt, rng, remat=remat,
                      remat_policy=remat_policy)
    return layer_norm(p["norm"], out)
