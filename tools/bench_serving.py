"""Trained-model serving benchmark: CAD solids decoded per second.

The production shape differs from bench.py's worst-case full-length decode:
early stopping is ON, so a trained model finishes most face rows in a
handful of steps. This tool loads a trained checkpoint, decodes a held-out
synthetic batch with the fused and XLA engines INTERLEAVED (the tunneled
device's throughput swings across a session; only same-window A/Bs are
trustworthy), and reports solids/s for each.

Usage:
    python tools/bench_serving.py \
        [--ckpt logs/SurfaceFormer/synthetic/checkpoints/last] \
        [--config configs/synthetic.yml] [--batch 32] [--iters 6]
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
    parser.add_argument("--ckpt",
                        default="logs/SurfaceFormer/synthetic/checkpoints/last")
    parser.add_argument("--config", default="configs/synthetic.yml")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--out", default=None,
                        help="optional JSON output path")
    args = parser.parse_args(argv)

    import jax

    from faceformer_tpu.config import load_config
    from faceformer_tpu.decode import greedy_decode_parallel
    from faceformer_tpu.train.checkpoint import load_checkpoint
    from faceformer_tpu.train.trainer import Harness
    from __graft_entry__ import _synthetic_batch

    cfg = load_config(args.config)
    harness = Harness(cfg)
    state = harness.load(args.ckpt)
    params = state["params"]

    batch = _synthetic_batch(cfg.model, batch_size=args.batch, seed=77)
    batch = jax.device_put(batch)

    fns = {}
    for mode in ("fused", "causal_cache"):
        fns[mode] = jax.jit(lambda p, b, m=mode: greedy_decode_parallel(
            p, cfg.model, b, precision=cfg.decode.precision, mode=m,
            early_stop=True)["predict"])
        np.asarray(fns[mode](params, batch))  # compile + warmup

    times = {m: [] for m in fns}
    for _ in range(args.iters):
        for mode, fn in fns.items():  # interleaved A/B
            t0 = time.perf_counter()
            np.asarray(fn(params, batch))
            times[mode].append(time.perf_counter() - t0)

    result = {}
    for mode, ts in times.items():
        best = min(ts)
        result[mode] = {
            "solids_per_sec": round(args.batch / best, 1),
            "ms_per_batch": round(best * 1e3, 1),
        }
        print(f"{mode:>12}: {result[mode]['solids_per_sec']} solids/s "
              f"({result[mode]['ms_per_batch']} ms/batch of {args.batch})")
    ratio = (result["fused"]["solids_per_sec"]
             / result["causal_cache"]["solids_per_sec"])
    result["fused_vs_xla"] = round(ratio, 2)
    print(f"fused / XLA: {ratio:.2f}x")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
