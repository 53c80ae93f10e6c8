"""Greedy decode engines: fixed-shape, fully on-device, zero host round-trips.

The reference decodes by re-running the whole decoder on the growing prefix
every step, with `.item()` / host-side break logic in the loop
(reference: models/model.py:193-210, model_para.py:216-233) — the top-ranked
hot loop. Both engines here run as a single jitted lax.while_loop over
preallocated token buffers with on-device stop predicates.

Two modes:

  - "reference": re-runs the decoder over the full padded buffer each step
    with a prefix key-padding mask and NO causal mask. This reproduces the
    reference eval bit-for-bit logic: the reference omits tgt_mask at eval
    (model.py:199-201), so earlier tokens' features are recomputed
    bidirectionally over the current prefix each step. Required for
    checkpoint-parity ("identical predictions").

  - "causal_cache": incremental decode with per-layer KV caches (self-attn
    keys/values appended per step; cross-attn keys/values precomputed once
    from memory). Matches the model's *training* semantics (causal mask) and
    is the fast path: O(T) instead of O(T^2) decoder work.

Stop predicates (replicated exactly):
  - single-sequence: a running count of EOS emissions; stop when the count
    EQUALS the batch size (reference model.py:205-210 — note a finished row
    that re-emits EOS still increments the count; behavior is the spec).
  - parallel, "reference" mode: stop when every row's next token is a
    special/type token (< token.length; reference model_para.py:231-233).
  - parallel, "causal_cache"/"fused": per-row RETIREMENT — once a row emits
    a face-TYPE token (the terminator parsing cuts at, reference
    trainer.py:184,197), its later positions stay PAD and the loop stops
    when every row has finished once. PAD does NOT retire a row: the
    reference keeps PAD-emitting rows decoding (its stop is whole-batch,
    model_para.py:231-233) and they can still produce a type token later;
    a row that only ever emits PAD runs to the token budget (its parsed
    faces are identical either way). Retirement makes the grid a pure
    function of the per-row prefixes: grids are identical however long
    the loop runs, which is what lets the multi-device shard_map engine
    stop per shard and still match single-device output exactly.
    Downstream parsing cuts each row at its first face-type token
    (train/metrics.py), so metrics match reference semantics (batch=1
    stops per sample there, model_para.py:231-233).

Anchor quirk (replicated): eval anchors are arange(L) WITHOUT the +4 token
offset (reference model_para.py:201), so anchor row j starts from memory row
j — rows 0-3 start at special-token rows and the last 4 edges get no anchor.
Parsing drops the resulting junk faces, so metrics are unaffected, but the
raw grids match the reference exactly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from faceformer_tpu.config import ModelConfig
from faceformer_tpu.models import layers as L
from faceformer_tpu.models.common import (
    compute_dtype,
    encode,
    gather_memory_rows,
    masked_argmax,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _prefix_buckets(t_max: int):
    """Ascending static prefix-buffer sizes for reference-mode decoding:
    powers of two below t_max, then t_max itself. Work per step scales with
    the buffer, so early steps run on small buffers; outputs are identical
    because positions beyond the live prefix are key-masked."""
    buckets = [b for b in (8, 16, 32, 64, 128, 256) if 2 < b < t_max]
    return buckets + [t_max]


def _decoder_kwargs(cfg: ModelConfig) -> Dict[str, Any]:
    return dict(
        num_head=cfg.num_head,
        dropout_rate=0.0,
        activation=cfg.activation,
        normalize_before=cfg.normalize_before,
        rng=None,
    )


def _stacked_linear(w: jnp.ndarray, b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply per-layer-stacked weights (Lyr, E, E) to (N, S, E) -> (Lyr, N, S, E)."""
    out = jnp.einsum("nse,leo->lnso", x, w.astype(x.dtype))
    return out + b.astype(x.dtype)[:, None, None, :]


def _cross_kv(params: Params, memory: jnp.ndarray, pos: jnp.ndarray, num_head: int):
    """Precompute cross-attention K/V for every decoder layer at once:
    K projects (memory + pos), V projects raw memory (DETR convention)."""
    ca = params["decoder"]["layers"]["cross_attn"]
    k = _stacked_linear(ca["wk"], ca["bk"], memory + pos)
    v = _stacked_linear(ca["wv"], ca["bv"], memory)
    lyr, n, s, e = k.shape
    k = k.reshape(lyr, n, s, num_head, e // num_head)
    v = v.reshape(lyr, n, s, num_head, e // num_head)
    return k, v


def _attend(q, k, v, key_padding_mask):
    """One-query attention: q (..., 1, H, hd), k/v (..., S, H, hd).

    When K/V carry a size-1 broadcast dim against q's anchor axis
    (q (N, F, 1, H, hd) vs k (N, 1, S, H, hd)), the anchor axis is folded
    into the query-sequence axis so the contraction is a clean batched GEMM.
    Leaving it to einsum broadcasting materializes K/V per anchor — measured
    ~N*F*S*E bytes of HBM traffic per step, the decode bottleneck."""
    head_dim = q.shape[-1]
    if (q.ndim == 5 and k.ndim == 5 and k.shape[1] == 1 and q.shape[1] > 1
            and q.shape[2] == 1):
        q2 = q[:, :, 0] * head_dim ** -0.5  # (N, F, H, hd)
        k2, v2 = k[:, 0], v[:, 0]  # (N, S, H, hd)
        scores = jnp.einsum("nfhd,nshd->nhfs", q2, k2,
                            preferred_element_type=jnp.float32)
        if key_padding_mask is not None:
            pad = key_padding_mask.reshape(key_padding_mask.shape[0], 1, 1, -1)
            scores = jnp.where(pad, L.big_neg(scores.dtype), scores)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("nhfs,nshd->nfhd", probs, v2)
        return out[:, :, None]  # (N, F, 1, H, hd)
    scores = jnp.einsum("...qhd,...khd->...hqk", q * head_dim ** -0.5, k,
                        preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[..., None, None, :],
                           L.big_neg(scores.dtype), scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


def _incremental_decoder_step(
    params: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,  # (..., 1, E) current-position decoder input
    qpos_t: jnp.ndarray,  # (1, E) learned query position for this step
    step: jnp.ndarray,
    self_k: Tuple[jnp.ndarray, ...],  # per-layer (..., T, H, hd) caches
    self_v: Tuple[jnp.ndarray, ...],
    cross_k: jnp.ndarray,  # (Lyr, ..., S, H, hd)
    cross_v: jnp.ndarray,
    mem_padding: jnp.ndarray,  # (..., S) broadcastable key padding
    t_max: int,
):
    """Run one token through all decoder layers, appending to the KV caches.

    Layers are UNROLLED (not scanned): each layer's cache is its own array
    in the while-loop carry, so the per-step write is one
    dynamic_update_slice XLA performs in place. (A lax.scan carrying the
    stacked caches re-materializes every slab per layer — measured 4.5x
    slower; dynamic-indexing a stacked cache copies it twice per layer.)

    Pre-LN only (the shipped models all use normalize_before=True,
    model.py:16). Returns (decoder output (..., 1, E), updated caches).
    """
    num_head = cfg.num_head
    head_dim = cfg.num_model // num_head
    # positions beyond the current step are unwritten cache slots
    self_padding = jnp.arange(t_max) > step  # (T,)
    lp = params["decoder"]["layers"]
    n_layers = cfg.num_decoder_layers

    new_k: List[jnp.ndarray] = []
    new_v: List[jnp.ndarray] = []
    for i in range(n_layers):
        p = jax.tree.map(lambda a: a[i], lp)
        sk, sv = self_k[i], self_v[i]

        t2 = L.layer_norm(p["norm1"], x)
        qk_in = t2 + qpos_t
        sa = p["self_attn"]
        q = (qk_in @ sa["wq"].astype(x.dtype) + sa["bq"].astype(x.dtype))
        k_t = (qk_in @ sa["wk"].astype(x.dtype) + sa["bk"].astype(x.dtype))
        v_t = (t2 @ sa["wv"].astype(x.dtype) + sa["bv"].astype(x.dtype))
        q = q.reshape(*q.shape[:-1], num_head, head_dim)
        k_t = k_t.reshape(*k_t.shape[:-1], num_head, head_dim)
        v_t = v_t.reshape(*v_t.shape[:-1], num_head, head_dim)
        # write this step's K/V (T axis is 3rd from the end of the cache)
        t_axis = sk.ndim - 3
        start = (0,) * t_axis + (step,) + (0, 0)
        sk = jax.lax.dynamic_update_slice(
            sk, jnp.expand_dims(k_t[..., 0, :, :], t_axis), start)
        sv = jax.lax.dynamic_update_slice(
            sv, jnp.expand_dims(v_t[..., 0, :, :], t_axis), start)
        new_k.append(sk)
        new_v.append(sv)
        attn = _attend(q, sk, sv, self_padding)
        attn = attn.reshape(*attn.shape[:-2], -1)
        x = x + (attn @ sa["wo"].astype(x.dtype) + sa["bo"].astype(x.dtype))

        t2 = L.layer_norm(p["norm2"], x)
        ca = p["cross_attn"]
        q2 = ((t2 + qpos_t) @ ca["wq"].astype(x.dtype) + ca["bq"].astype(x.dtype))
        q2 = q2.reshape(*q2.shape[:-1], num_head, head_dim)
        attn = _attend(q2, cross_k[i], cross_v[i], mem_padding)
        attn = attn.reshape(*attn.shape[:-2], -1)
        x = x + (attn @ ca["wo"].astype(x.dtype) + ca["bo"].astype(x.dtype))

        t2 = L.layer_norm(p["norm3"], x)
        act = L.activation_fn(cfg.activation)
        h = act(L.linear(p["ffn"]["lin1"], t2))
        x = x + L.linear(p["ffn"]["lin2"], h)

    x = L.layer_norm(params["decoder"]["norm"], x)
    return x, tuple(new_k), tuple(new_v)


# ---------------------------------------------------------------------------
# single-sequence model
# ---------------------------------------------------------------------------


def greedy_decode_single(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    precision: str = "fp32",
    mode: str = "reference",
    early_stop: bool = True,
    retire_rows: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Flat-sequence greedy decode (reference: model.py:169-219).

    retire_rows=True (production default) retires each row at its first
    EOS: later positions write PAD and the batch stops once every row has
    seen an EOS. Grids become a pure function of per-row prefixes — a
    sample's prediction no longer depends on its batchmates, so eval
    metrics are batch-composition/order-invariant and per-shard stops
    under a sharded mesh match the single-device grids.
    retire_rows=False restores the reference's stop — a cumulative count
    of EOS *emissions* reaching batch size (model.py:191-210), which a
    row re-emitting EOS can trip before a deep row finishes; kept for
    reference-parity tests and as a measured ablation.

    early_stop=False decodes the full token budget regardless of EOS —
    used for worst-case throughput benchmarking."""
    if mode != "reference" and not cfg.normalize_before:
        # the incremental KV-cache engine implements the pre-LN block
        # structure only; post-LN configs decode through the reference
        # engine (decoder_forward honors normalize_before)
        mode = "reference"
    dtype = compute_dtype(precision)
    tok = cfg.token
    memory, pos, padded_mask = encode(
        params, cfg, batch["input"], batch["input_mask"], None, dtype)
    n = memory.shape[0]
    t_max = cfg.label_seq_length
    query_pos = params["query_pos_table"].astype(dtype)  # (T, E)

    tokens0 = jnp.full((n, t_max), tok.PAD, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok.SOS)

    # eos-state triple: initial value, per-step update, batch-done predicate.
    # retirement tracks a per-row seen-EOS flag; the reference ablation keeps
    # the cumulative emission count (model.py:191-210)
    if retire_rows:
        eos0 = jnp.zeros((n,), bool)
        eos_update = lambda e, nxt: jnp.logical_or(e, nxt == tok.EOS)
        eos_done = lambda e: e.all()
    else:
        eos0 = jnp.int32(0)
        eos_update = lambda e, nxt: e + (nxt == tok.EOS).sum().astype(jnp.int32)
        eos_done = lambda e: e == n

    def cond(state):
        step, _, eos_state = state[0], state[1], state[2]
        if not early_stop:
            return step < t_max - 1
        return jnp.logical_and(step < t_max - 1, ~eos_done(eos_state))

    if mode == "reference":
        # prefix buckets: early steps re-run the decoder over a SHORTER
        # static buffer (positions beyond the live prefix are masked and
        # never read, so every bucket computes exactly the same tokens);
        # total decoder work drops from T * O(T^2) toward sum of bucket^2
        def make_body(bucket):
            def body(state):
                step, tokens, eos_state = state
                tgt = gather_memory_rows(memory, tokens[:, :bucket])
                prefix_pad = jnp.arange(bucket)[None, :] > step  # (1, b)
                out = L.decoder_forward(
                    params["decoder"], tgt, memory, query_pos[None, :bucket], pos,
                    tgt_mask=None, tgt_key_padding_mask=prefix_pad,
                    memory_key_padding_mask=padded_mask, **_decoder_kwargs(cfg))
                out_t = jax.lax.dynamic_index_in_dim(out, step, axis=1, keepdims=False)
                pointer_t = L.linear(params["project"], out_t)  # (N, E)
                nxt = masked_argmax(memory, pointer_t, padded_mask)  # (N,)
                if retire_rows:  # retired rows write PAD (stop-invariant grids)
                    nxt = jnp.where(eos_state, tok.PAD, nxt)
                tokens = jax.lax.dynamic_update_index_in_dim(tokens, nxt, step + 1, 1)
                return step + jnp.int32(1), tokens, eos_update(eos_state, nxt)

            return body

        state = (jnp.int32(0), tokens0, eos0)
        for bucket in _prefix_buckets(t_max):
            # steps s <= bucket - 2 fit this buffer (token s+1 must land in it)
            def bucket_cond(state, _last=bucket - 2):
                step, _, eos_state = state
                ok = step <= _last if _last < t_max - 2 else step < t_max - 1
                if not early_stop:
                    return ok
                return jnp.logical_and(ok, ~eos_done(eos_state))

            state = jax.lax.while_loop(bucket_cond, make_body(bucket), state)
        return {"predict": state[1]}

    # causal_cache mode
    head_dim = cfg.num_model // cfg.num_head
    n_layers = cfg.num_decoder_layers
    cross_k, cross_v = _cross_kv(params, memory, pos, cfg.num_head)
    layer_cache = (n, t_max, cfg.num_head, head_dim)
    sk0 = tuple(jnp.zeros(layer_cache, dtype) for _ in range(n_layers))
    sv0 = tuple(jnp.zeros(layer_cache, dtype) for _ in range(n_layers))

    def body(state):
        step, tokens, eos_state, sk, sv = state
        cur = jax.lax.dynamic_index_in_dim(tokens, step, axis=1, keepdims=True)  # (N,1)
        x = gather_memory_rows(memory, cur)  # (N, 1, E)
        qpos_t = jax.lax.dynamic_index_in_dim(query_pos, step, 0, keepdims=True)
        out, sk, sv = _incremental_decoder_step(
            params, cfg, x, qpos_t, step, sk, sv, cross_k, cross_v,
            padded_mask, t_max)
        pointer_t = L.linear(params["project"], out[:, 0])
        nxt = masked_argmax(memory, pointer_t, padded_mask)
        if retire_rows:  # retired rows write PAD (stop-invariant grids)
            nxt = jnp.where(eos_state, tok.PAD, nxt)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, nxt, step + 1, 1)
        return step + jnp.int32(1), tokens, eos_update(eos_state, nxt), sk, sv

    state = (jnp.int32(0), tokens0, eos0, sk0, sv0)
    step, tokens, *_ = jax.lax.while_loop(cond, body, state)
    return {"predict": tokens}


# ---------------------------------------------------------------------------
# fused whole-step engine (ops/decode_step.py)
# ---------------------------------------------------------------------------


def _fused_decode_parallel(params, cfg, memory, pos, padded_mask,
                           tokens0, anchors, dtype, early_stop,
                           retire_rows=True):
    """causal_cache semantics, one fused Pallas kernel per step."""
    from faceformer_tpu import ops
    from faceformer_tpu.ops.decode_step import (
        BIG_NEG,
        CHUNK,
        _round_up,
        decode_step,
        pack_decoder_weights,
    )

    tok = cfg.token
    n, s, e = memory.shape
    f = cfg.num_lines
    t_max = cfg.max_face_length
    n_layers = cfg.num_decoder_layers
    interpret = ops.interpret_mode()

    s_pad = _round_up(s, 8)
    cross_k, cross_v = _cross_kv(params, memory, pos, cfg.num_head)
    # (N, L, S, E): the kernel's grid is over sample BLOCKS, so each grid
    # step fetches its samples' K/V for every layer in a single block
    cross_k = cross_k.reshape(n_layers, n, s, e).transpose(1, 0, 2, 3)
    cross_v = cross_v.reshape(n_layers, n, s, e).transpose(1, 0, 2, 3)
    if s_pad != s:
        pad4 = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        cross_k = jnp.pad(cross_k, pad4)
        cross_v = jnp.pad(cross_v, pad4)
        memory_p = jnp.pad(memory, ((0, 0), (0, s_pad - s), (0, 0)))
        padded_mask_p = jnp.pad(
            padded_mask, ((0, 0), (0, s_pad - s)), constant_values=True)
    else:
        memory_p, padded_mask_p = memory, padded_mask
    mem_bias = jnp.where(padded_mask_p, BIG_NEG, 0.0).astype(jnp.float32)

    # samples per grid step: bigger blocks amortize the weight stream and
    # deepen the per-step GEMMs (B*F rows instead of F)
    blk = next(b for b in (2, 1) if n % b == 0)
    nb = n // blk
    packed = pack_decoder_weights(params, dtype)
    t_pad = _round_up(t_max, CHUNK)
    cache_kv = jnp.zeros((n_layers, nb, t_pad, blk * f, 2 * e), dtype)
    query_pos = params["query_pos_table"].astype(dtype)
    x0 = gather_memory_rows(memory_p, anchors).reshape(nb, blk * f, e)
    cross_k = cross_k.reshape(nb, blk, n_layers, s_pad, e)
    cross_v = cross_v.reshape(nb, blk, n_layers, s_pad, e)
    memory_b = memory_p.reshape(nb, blk, s_pad, e)
    mem_bias = mem_bias.reshape(nb, blk, 1, s_pad)

    def cond(state):
        step, _, done = state[0], state[1], state[2]
        if not early_stop:
            return step < t_max - 1
        return jnp.logical_and(step < t_max - 1, jnp.logical_not(jnp.all(done)))

    def body(state):
        step, tokens, done, x, ckv = state
        qpos_t = jax.lax.dynamic_index_in_dim(query_pos, step, 0, keepdims=True)
        x, nxt, ckv = decode_step(
            step, x, qpos_t, packed, cross_k, cross_v, memory_b, mem_bias,
            ckv, num_head=cfg.num_head, num_layers=n_layers,
            interpret=interpret)
        nxt = nxt.reshape(n, f)
        if retire_rows:
            # a row is finished by a face-TYPE token only — the terminator
            # parsing cuts at (reference trainer.py:184,197). PAD must NOT
            # retire a row: the reference keeps PAD-emitting rows decoding
            # (its stop is whole-batch, model_para.py:231-233), and they can
            # still emit a type token later.
            fin = jnp.logical_and(nxt >= tok.face_type_offset,
                                  nxt < tok.length)
            # retired rows write PAD (grid canonicalization; module docstring)
            out_tok = jnp.where(done, tok.PAD, nxt)
            new_done = jnp.logical_or(done, fin)
        else:  # legacy whole-batch stop (ablation; reference semantics:
            # stop when every row emits ANY special token in the same step)
            out_tok, new_done = nxt, nxt < tok.length
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, out_tok, step + 1, 2)
        return step + jnp.int32(1), tokens, new_done, x, ckv

    done0 = jnp.zeros((n, f), bool)
    state = (jnp.int32(0), tokens0, done0, x0, cache_kv)
    state = jax.lax.while_loop(cond, body, state)
    return {"predict": state[1]}


# ---------------------------------------------------------------------------
# parallel (per-edge-anchor) model
# ---------------------------------------------------------------------------


def greedy_decode_parallel(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    precision: str = "fp32",
    mode: str = "reference",
    early_stop: bool = True,
    anchor_mode: str = "reference",
    retire_rows: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Anchor-parallel greedy decode (reference: model_para.py:181-241).

    retire_rows=False restores the legacy whole-batch stop (every step's
    tokens written raw; stop only when ALL rows emit a terminator in the
    same step) — kept as a measured ablation against the retirement scheme
    (tools/bench_serving.py); production paths keep it True.

    Returns predict (N, F, T) with F = num_lines (static; see parallel.py's
    static-shape note)."""
    if mode != "reference" and not cfg.normalize_before:
        # incremental engines implement pre-LN only; see greedy_decode_single
        mode = "reference"
    if mode == "fused" and cfg.activation != "relu":
        # the fused kernel's FFN hard-codes ReLU (ops/decode_step.py); any
        # other activation routes to the equivalent XLA engine, which
        # honors cfg.activation
        mode = "causal_cache"
    dtype = compute_dtype(precision)
    tok = cfg.token
    memory, pos, padded_mask = encode(
        params, cfg, batch["input"], batch["input_mask"], None, dtype)
    n = memory.shape[0]
    f = cfg.num_lines
    t_max = cfg.max_face_length
    query_pos = params["query_pos_table"].astype(dtype)

    # anchors: every edge index; "reference" keeps the raw index with NO +4
    # offset (reference model_para.py:201), "aligned" points each row at its
    # edge's actual memory row. Rows past the sample's real edge count start
    # at the Other/EOS token (model_para.py:204-205).
    num_input = batch["num_input"].astype(jnp.int32)  # (N,)
    anchor_ids = jnp.arange(f, dtype=jnp.int32)[None, :]  # (1, F)
    offset = tok.length if anchor_mode == "aligned" else 0
    # inactive rows seed with the bare Other-type token, mirroring
    # pack_label_parallel's unused-row fill (reference data_para.py:96
    # writes the literal token.len - 1 — the Other token in its 4-token
    # table; semantic form keeps extended token tables aligned)
    other_tok = 2 + tok.face_type_offset  # == packing.face_type_token(2, tok)
    anchors = jnp.where(anchor_ids < num_input[:, None],
                        anchor_ids + offset, other_tok)

    tokens0 = jnp.full((n, f, t_max), tok.PAD, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(anchors)

    mem_b = memory[:, None]  # (N, 1, S, E)
    pos_b = pos[:, None]
    mem_pad_b = padded_mask[:, None]  # (N, 1, S)

    if mode == "reference":
        # prefix buckets: see greedy_decode_single — exact outputs, early
        # steps on shorter static buffers
        def make_body(bucket):
            def body(state):
                step, tokens, _ = state
                tgt = gather_memory_rows(memory, tokens[:, :, :bucket])
                prefix_pad = jnp.arange(bucket)[None, None, :] > step  # (1, 1, b)
                out = L.decoder_forward(
                    params["decoder"], tgt, mem_b, query_pos[None, None, :bucket],
                    pos_b, tgt_mask=None, tgt_key_padding_mask=prefix_pad,
                    memory_key_padding_mask=mem_pad_b, **_decoder_kwargs(cfg))
                out_t = jax.lax.dynamic_index_in_dim(out, step, axis=2, keepdims=False)
                pointer_t = L.linear(params["project"], out_t)  # (N, F, E)
                nxt = masked_argmax(memory, pointer_t, padded_mask)  # (N, F)
                tokens = jax.lax.dynamic_update_index_in_dim(tokens, nxt, step + 1, 2)
                return step + jnp.int32(1), tokens, jnp.all(nxt < tok.length)

            return body

        state = (jnp.int32(0), tokens0, jnp.array(False))
        for bucket in _prefix_buckets(t_max):
            def bucket_cond(state, _last=min(bucket - 2, t_max - 2)):
                step, _, all_special = state
                ok = step <= _last
                if not early_stop:
                    return ok
                return jnp.logical_and(ok, jnp.logical_not(all_special))

            state = jax.lax.while_loop(bucket_cond, make_body(bucket), state)
        return {"predict": state[1]}

    if mode == "fused":
        from faceformer_tpu import ops as _ops

        # honor the Pallas kill switch (FACEFORMER_PALLAS=0 / ops.enable)
        # like every other kernel call site: with kernels off, the
        # equivalent XLA causal_cache engine decodes instead — the
        # documented way to bisect a suspected kernel bug, and the only
        # sane path on CPU (the interpreter is for parity tests, not
        # production decode).
        # Mosaic tiles the packed K|V cache's lane dim at 128: compiled
        # kernels need 2*num_model % 128 == 0 (every shipped config
        # qualifies; tiny test dims run through the interpreter on CPU).
        # Anything smaller falls back to the equivalent XLA engine.
        if _ops.enabled() and (
                (2 * cfg.num_model) % 128 == 0 or _ops.interpret_mode()):
            return _fused_decode_parallel(
                params, cfg, memory, pos, padded_mask, tokens0,
                anchors, dtype, early_stop, retire_rows=retire_rows)
        mode = "causal_cache"

    # causal_cache mode
    head_dim = cfg.num_model // cfg.num_head
    n_layers = cfg.num_decoder_layers
    cross_k, cross_v = _cross_kv(params, memory, pos, cfg.num_head)
    # add the broadcast anchor axis to cross K/V and memory padding
    cross_k, cross_v = cross_k[:, :, None], cross_v[:, :, None]  # (Lyr, N, 1, S, H, hd)
    layer_cache = (n, f, t_max, cfg.num_head, head_dim)
    sk0 = tuple(jnp.zeros(layer_cache, dtype) for _ in range(n_layers))
    sv0 = tuple(jnp.zeros(layer_cache, dtype) for _ in range(n_layers))

    def cache_cond(state):
        step, _, done = state[0], state[1], state[2]
        if not early_stop:
            return step < t_max - 1
        return jnp.logical_and(step < t_max - 1, jnp.logical_not(jnp.all(done)))

    def body(state):
        step, tokens, done, sk, sv = state
        cur = jax.lax.dynamic_index_in_dim(tokens, step, axis=2, keepdims=True)  # (N,F,1)
        x = gather_memory_rows(memory, cur)  # (N, F, 1, E)
        qpos_t = jax.lax.dynamic_index_in_dim(query_pos, step, 0, keepdims=True)
        out, sk, sv = _incremental_decoder_step(
            params, cfg, x, qpos_t, step, sk, sv, cross_k, cross_v,
            mem_pad_b, t_max)
        pointer_t = L.linear(params["project"], out[:, :, 0])  # (N, F, E)
        nxt = masked_argmax(memory, pointer_t, padded_mask)
        if retire_rows:
            # finish on face-TYPE tokens only, never PAD (see the fused
            # engine's body above for the reference-semantics argument)
            fin = jnp.logical_and(nxt >= tok.face_type_offset,
                                  nxt < tok.length)
            # retired rows write PAD (grid canonicalization; module docstring)
            out_tok = jnp.where(done, tok.PAD, nxt)
            new_done = jnp.logical_or(done, fin)
        else:  # legacy whole-batch stop (ablation)
            out_tok, new_done = nxt, nxt < tok.length
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, out_tok, step + 1, 2)
        return step + jnp.int32(1), tokens, new_done, sk, sv

    state = (jnp.int32(0), tokens0, jnp.zeros((n, f), bool), sk0, sv0)
    step, tokens, *_ = jax.lax.while_loop(cache_cond, body, state)
    return {"predict": tokens}
