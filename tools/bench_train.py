"""Training-step decomposition benchmark (VERDICT r2 #7: the flat backward).

Times, on the real TPU at flagship dims, all in one interleaved window:
  - forward-only loss (no grad)
  - full value_and_grad step (fwd + bwd)
  - encoder-only and decoder-only value_and_grad (isolates where backward
    time lives)
  - remat off / full / dots at the given batch (where HBM permits)
  - dropout 0 vs configured dropout (isolates PRNG+mask cost)

Timing discipline per .claude/skills/verify: reduce outputs to scalars
inside jit, chain iterations through a data dependency (params add a tiny
grad-derived delta) so nothing is hoisted, and sync via np.asarray.

    python tools/bench_train.py --config configs/synthetic-big.yml --batch 32
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fn(fn, args, iters):
    """Best-of-iters wall time; each call feeds the previous scalar back in
    as a perturbation so XLA cannot hoist or cache across calls."""
    carry = np.float32(0.0)
    out = np.asarray(fn(carry, *args))  # compile + warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = np.asarray(fn(out * 1e-30, *args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/synthetic-big.yml")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--out", default=None)
    parser.add_argument("--only", default=None,
                        help="substring filter on variant keys (e.g. "
                             "'drop0.2/fwd_bwd'): skips other variants' "
                             "compiles, for the batch-size sweep")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from faceformer_tpu.config import load_config
    from faceformer_tpu.models.parallel import SurfaceFormerParallel
    from faceformer_tpu.models.common import encode
    from faceformer_tpu.train.loss import pointer_cross_entropy
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(args.config)
    base = cfg.model
    batch = jax.device_put(_synthetic_batch(base, batch_size=args.batch, seed=9))
    params = jax.device_put(
        SurfaceFormerParallel.init(jax.random.PRNGKey(0), base))
    rng = jax.random.key(1, impl="rbg")

    def make_loss(mcfg, dropout=None):
        m = mcfg if dropout is None else dataclasses.replace(mcfg, dropout=dropout)

        def loss_fn(p, b, r):
            out = SurfaceFormerParallel.forward_train(
                p, m, b, rng=r, precision="bf16")
            return pointer_cross_entropy(out, m.token)[0]

        return loss_fn

    results = {}

    def add(name, fn):
        results[name] = round(_time_fn(fn, (params, batch, rng), args.iters) * 1e3, 1)
        print(f"{name:>32}: {results[name]} ms")

    def _probe(tree):
        # fold every grad leaf into the returned scalar: without this XLA
        # dead-code-eliminates the whole backward (first run of this tool
        # measured fwd_bwd == fwd_only and remat_off "fitting" at batch 32)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), tree,
            jnp.float32(0.0)) * 1e-20

    variants = {
        "fwd_only": lambda loss: jax.jit(
            lambda c, p, b, r: loss(jax.tree.map(lambda x: x + c, p), b, r)),
        "fwd_bwd": lambda loss: jax.jit(
            lambda c, p, b, r: (
                lambda vg: vg[0] + _probe(vg[1]))(jax.value_and_grad(loss)(
                    jax.tree.map(lambda x: x + c, p), b, r))),
    }

    for mname, mcfg in (
        ("remat_full", dataclasses.replace(base, remat=True, remat_policy="full")),
        ("remat_off", dataclasses.replace(base, remat=False)),
        ("remat_dots", dataclasses.replace(base, remat=True, remat_policy="dots")),
        ("remat_attn", dataclasses.replace(base, remat=True, remat_policy="attn")),
        ("remat_attn_ffn",
         dataclasses.replace(base, remat=True, remat_policy="attn_ffn")),
    ):
        for dname, dval in (("drop0.2", None), ("drop0", 0.0)):
            loss = make_loss(mcfg, dropout=0.0 if dname == "drop0" else None)
            for vname, wrap in variants.items():
                key = f"{mname}/{dname}/{vname}"
                if args.only and args.only not in key:
                    continue
                try:
                    add(key, wrap(loss))
                except Exception as e:  # OOM variants are expected
                    results[key] = f"failed: {type(e).__name__}"
                    print(f"{key:>32}: {results[key]}")

    # encoder-only backward: isolates encoder vs decoder cost
    def enc_loss(p, b, r):
        memory, _, _ = encode(p, base, b["input"], b["input_mask"], None,
                              jnp.bfloat16)
        return jnp.sum(memory.astype(jnp.float32) ** 2) * 1e-6

    if not args.only or args.only in "encoder_only/fwd_bwd":
        add("encoder_only/fwd_bwd", jax.jit(
            lambda c, p, b, r: (
                lambda vg: vg[0] + _probe(vg[1]))(jax.value_and_grad(enc_loss)(
                    jax.tree.map(lambda x: x + c, p), b, r))))

    if results.get("remat_full/drop0.2/fwd_bwd") and isinstance(
            results["remat_full/drop0.2/fwd_bwd"], float):
        step = results["remat_full/drop0.2/fwd_bwd"]
        print(f"\nsamples/s at batch {args.batch}: {args.batch / step * 1e3:.1f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
