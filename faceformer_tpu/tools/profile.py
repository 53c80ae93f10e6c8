"""Profiling utility: capture a JAX profiler trace of the decode/train hot
paths (the reference's only instrumentation is a wall-clock average at test
time, trainer.py:106-112; this gives per-op XLA traces viewable in
TensorBoard/Perfetto).

    python -m faceformer_tpu.tools.profile --what decode --out /tmp/trace
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--what", choices=["decode", "train"], default="decode")
    parser.add_argument("--config", default="configs/ours.yml")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--out", default="/tmp/faceformer_trace")
    parser.add_argument("--mode", default="causal_cache")
    args = parser.parse_args(argv)

    import jax

    from faceformer_tpu.config import load_config
    from faceformer_tpu.decode import greedy_decode_parallel
    from faceformer_tpu.models.parallel import SurfaceFormerParallel
    from faceformer_tpu.train.loss import pointer_cross_entropy

    import sys, os
    sys.path.insert(0, os.getcwd())
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(args.config)
    params = SurfaceFormerParallel.init(jax.random.PRNGKey(0), cfg.model)
    batch = _synthetic_batch(cfg.model, batch_size=args.batch)

    if args.what == "decode":
        fn = jax.jit(lambda p, b: greedy_decode_parallel(
            p, cfg.model, b, precision="bf16", mode=args.mode,
            early_stop=False)["predict"])

        def run():
            return np.asarray(fn(params, batch))
    else:
        rng = jax.random.PRNGKey(1)

        def loss_fn(p, b, r):
            out = SurfaceFormerParallel.forward_train(
                p, cfg.model, b, rng=r, precision="bf16")
            return pointer_cross_entropy(out, cfg.model.token)[0]

        grad_fn = jax.jit(jax.grad(loss_fn))

        def run():
            return np.asarray(jax.tree.leaves(grad_fn(params, batch, rng))[0])

    run()  # compile
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            run()
    dt = time.perf_counter() - t0
    print(f"{args.what}: {args.iters} iters in {dt:.3f}s "
          f"({dt / args.iters * 1e3:.1f} ms/iter); trace -> {args.out}")


if __name__ == "__main__":
    main()
