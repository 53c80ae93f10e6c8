"""Decode-step cost curve: fused-kernel step time vs live-prefix length.

Splits the fused decode step's cost into its prefix-scaling part (KV-cache
chunk DMA + per-chunk score/weight VPU passes, which grow with
ceil(step/CHUNK)) and its fixed part (projections, cross-attn, FFN,
pointer), by timing the SAME kernel at pinned `step` values. The slope and
intercept decide whether shrinking cache bytes (fp8/int8 storage) can pay:
if slope*avg_live_chunks is small against the intercept, the format change
cannot move the MFU needle (VERDICT r2 #6 roofline).

    python tools/bench_decode_step.py --config configs/synthetic-big.yml
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/synthetic-big.yml")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from faceformer_tpu import ops
    from faceformer_tpu.config import load_config
    from faceformer_tpu.models.common import encode
    from faceformer_tpu.models.parallel import SurfaceFormerParallel
    from faceformer_tpu.ops.decode_step import (
        CHUNK, _round_up, decode_step, pack_decoder_weights)
    from faceformer_tpu.decode import _cross_kv
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(args.config).model
    dtype = jnp.bfloat16
    params = SurfaceFormerParallel.init(jax.random.PRNGKey(0), cfg)
    batch = _synthetic_batch(cfg, batch_size=args.batch, seed=11)
    params, batch = jax.device_put((params, batch))

    memory, pos, padded_mask = encode(
        params, cfg, batch["input"], batch["input_mask"], None, dtype)
    n, s, e = memory.shape
    f = cfg.num_lines
    n_layers = cfg.num_decoder_layers
    s_pad = _round_up(s, 8)
    cross_k, cross_v = _cross_kv(params, memory, pos, cfg.num_head)
    cross_k = cross_k.reshape(n_layers, n, s, e).transpose(1, 0, 2, 3)
    cross_v = cross_v.reshape(n_layers, n, s, e).transpose(1, 0, 2, 3)
    if s_pad != s:
        pad4 = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        cross_k, cross_v = jnp.pad(cross_k, pad4), jnp.pad(cross_v, pad4)
        memory = jnp.pad(memory, ((0, 0), (0, s_pad - s), (0, 0)))
        padded_mask = jnp.pad(padded_mask, ((0, 0), (0, s_pad - s)),
                              constant_values=True)
    from faceformer_tpu.ops.decode_step import BIG_NEG

    mem_bias = jnp.where(padded_mask, BIG_NEG, 0.0).astype(jnp.float32)
    blk = 2 if n % 2 == 0 else 1
    nb = n // blk
    packed = pack_decoder_weights(params, dtype)
    t_pad = _round_up(cfg.max_face_length, CHUNK)
    cache = jnp.zeros((n_layers, nb, t_pad, blk * f, 2 * e), dtype)
    qpos = params["query_pos_table"].astype(dtype)[:1]
    x0 = jnp.zeros((nb, blk * f, e), dtype)
    cross_k = cross_k.reshape(nb, blk, n_layers, s_pad, e)
    cross_v = cross_v.reshape(nb, blk, n_layers, s_pad, e)
    memory_b = memory.reshape(nb, blk, s_pad, e)
    mem_bias_b = mem_bias.reshape(nb, blk, 1, s_pad)

    step_fn = lambda st, x, ck: decode_step(
        st, x, qpos, packed, cross_k, cross_v, memory_b, mem_bias_b, ck,
        num_head=cfg.num_head, num_layers=n_layers,
        interpret=ops.interpret_mode())

    results = {}
    gb_per_chunk = (n_layers * nb * CHUNK * blk * f * 2 * e
                    * cache.dtype.itemsize / 1e9)
    t_last = cfg.max_face_length - 1
    steps = sorted({1, *(s for s in (8, 16, 24, 32) if s < t_last), t_last})
    # settle the tunnel/device before any timed loop: the first measured
    # point otherwise absorbs the process's cold streams (measured 92 ms vs
    # 16.6 ms for the same step in one session)
    xw, _, cw = step_fn(jnp.int32(steps[0]), x0, cache)
    for _ in range(8):
        xw, _, cw = step_fn(jnp.int32(steps[0]), xw, cw)
    np.asarray(xw[0, 0, 0])
    for st in steps:
        stv = jnp.int32(st)
        x, _, ck = step_fn(stv, x0, cache)  # compile + warmup
        jax.block_until_ready(x)
        times = []
        xi, cki = x, ck
        for _ in range(args.iters):
            t0 = time.perf_counter()
            xi, _, cki = step_fn(stv, xi, cki)  # data-dep chain, no hoisting
            xi.block_until_ready()
            times.append(time.perf_counter() - t0)
        # tunneled device: block_until_ready can lie; cross-check via the
        # total of a fresh chained run pulled through np.asarray
        t0 = time.perf_counter()
        for _ in range(args.iters):
            xi, _, cki = step_fn(stv, xi, cki)
        np.asarray(xi[0, 0, 0])
        total = (time.perf_counter() - t0) / args.iters
        live = -(-st // CHUNK)
        results[st] = {"ms": round(total * 1e3, 3),
                       "live_chunks": live,
                       "gb_read": round(gb_per_chunk * live, 2)}
        print(f"step={st:>3}: {results[st]['ms']} ms, {live} live chunks, "
              f"~{results[st]['gb_read']} GB cache reads")

    # least-squares ms ~ slope*live_chunks + fixed (endpoint slope is too
    # sensitive to a single slow-phase outlier on the tunneled device)
    xs = np.array([r["live_chunks"] for r in results.values()], np.float64)
    ys = np.array([r["ms"] for r in results.values()], np.float64)
    slope, fixed = np.polyfit(xs, ys, 1)
    print(f"\nfit: ~{slope:.3f} ms per live chunk; fixed ~{fixed:.2f} ms "
          f"(incl. per-call dispatch); chunk DMA at 819GB/s would be "
          f"{gb_per_chunk / 0.819:.3f} ms")
    if args.out:
        with open(args.out, "w") as fo:
            json.dump({str(k): v for k, v in results.items()}, fo, indent=1)


if __name__ == "__main__":
    main()
